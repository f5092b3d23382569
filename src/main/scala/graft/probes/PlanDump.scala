package graft
package probes

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for selected queries to a file —
  * the committed plan-audit evidence (PLANS.md).
  * Usage: `runMain graft.probes.PlanDump <sfDir> <outFile> [query...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val wanted =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(Sessions.envCores)
    val sb = new StringBuilder
    wanted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val df = fn(spark, sfDir)
        sb.append(s"==== $name ====\n")
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        sb.append("\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
