package graft
package probes

/** Executes a query and prints the FINAL adaptive plan — the AQE
  * companion to [[PlanDump]], which prints the pre-execution plan and
  * therefore hides runtime join-strategy changes, coalesced reads and
  * exchange/stage reuse (`ReusedExchange` only materializes during
  * execution).
  * Usage: `runMain graft.probes.FinalPlanDump <sfDir> <query>`
  */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.local(Sessions.envCores)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(s"==== $name (final adaptive plan) ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
