package graft
package probes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-host A/B of pageRankConverged harness shapes (round-13):
  * per-round lazy localCheckpoint vs the round-12 block-chained
  * shape. Usage: `runMain graft.probes.H6cProbe <sfDir> [reps]`
  */
object H6cProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val g = RegistryFixtures.pageGraph(spark, sfDir)

    def time(tag: String)(body: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[h6c] $tag min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // block-size sweep (block-chained shape)
    Seq(8, 4, 2).foreach { b =>
      time(s"block$b")(operators.GraphOps.pageRankConverged(
        g, maxIters = 48, k = 20, blockIters = b)._1)
    }

    // RDD-loop shape (round-13 verdict item 4): same semantics, zero
    // per-round Catalyst analysis — blocks only decide probe cadence
    Seq(8, 4).foreach { b =>
      time(s"rdd-block$b")(operators.GraphOps.pageRankConvergedRdd(
        g, maxIters = 48, k = 20, blockIters = b)._1)
    }

    // narrow-shuffle child (round 14 — the serving-width lever that
    // bought n35/n36 ~0.9 s): per-round aggregates shuffle |nodes|
    // rows, so 32 reduce tasks per round are scheduling overhead
    Seq(8, 4).foreach { w =>
      val ss = RegistryFixtures.stChild(spark, w)
      val gN = RegistryFixtures.pageGraph(ss, sfDir)
      time(s"block4-w$w")(operators.GraphOps.pageRankConverged(
        gN, maxIters = 48, k = 20, blockIters = 4)._1)
    }

    // OLD shape: 8 lazily chained rounds, lazy checkpoint at block end
    def oldShape(): DataFrame = {
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
      var ranks = g.nodes.select(col("url"), lit(InitMicro).as("pr"))
        .localCheckpoint()
      var rounds = 0
      var converged = ranks.isEmpty
      while (!converged && rounds < 48) {
        var next = ranks
        (1 to 8).foreach(_ => next = round(next))
        next = next.localCheckpoint(false)
        rounds += 8
        val delta = next
          .join(ranks.withColumnRenamed("pr", "pr0"), Seq("url"))
          .agg(max(abs(col("pr") - col("pr0")))).head
        converged = !delta.isNullAt(0) && delta.getLong(0) == 0L
        ranks = next
      }
      ranks.join(g.indeg, ranks("url") === g.indeg("dst"), "left")
        .select(ranks("url"),
          coalesce(col("n_in"), lit(0L)).as("n_in"), col("pr"))
        .orderBy(col("pr").desc, col("url").asc)
        .limit(20)
    }
    time("blockChained")(oldShape())
    spark.stop()
  }
}
