package graft
package probes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Splits h6c's cost into CONSTRUCTION-TIME Catalyst analysis vs
  * execution: builds the same 8-blocks-of-4 round chain WITHOUT any
  * action (every Dataset op analyzes eagerly, so this times pure
  * plan analysis), then runs the real query for the total.
  * Usage: `runMain graft.probes.H6cAnalysisProbe <sfDir> [reps]`
  */
object H6cAnalysisProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val g = RegistryFixtures.pageGraph(spark, sfDir)
    import operators.GraphOps.{InitMicro, TeleportMicro, DampingPct}
    def round(ranks: DataFrame): DataFrame = {
      val inc = g.ewd.join(ranks, g.ewd("src") === ranks("url"))
        .select(g.ewd("dst").as("url"), expr("pr div od").as("c"))
        .groupBy(col("url")).agg(sum(col("c")).as("inc"))
      g.nodes.join(inc, Seq("url"), "left")
        .select(col("url"),
          (lit(TeleportMicro) +
            expr(s"($DampingPct * coalesce(inc, CAST(0 AS BIGINT)))" +
              " div 100")).as("pr"))
    }
    def timed(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[h6ca] $tag min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // analysis only: 8 blocks of 4 chained rounds, no action ever
    timed("analysis-only") {
      var ranks = g.nodes.select(col("url"), lit(InitMicro).as("pr"))
        .localCheckpoint()
      (1 to 8).foreach { _ =>
        var next = ranks
        (1 to 4).foreach(_ => next = round(next))
        // localCheckpoint(false) would plan+persist; stop before it —
        // construction analysis is what we're isolating
        ranks = next.localCheckpoint(false)
      }
    }
    // the real thing
    timed("full-query") {
      operators.GraphOps.pageRankConverged(g, maxIters = 48, k = 20,
          blockIters = 4)._1
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
