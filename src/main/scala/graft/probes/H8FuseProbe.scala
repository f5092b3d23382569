package graft
package probes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rep-interleaved A/B of the round-18 h8 HITS rewrite (one join per
  * half-round: zero-score rows dropped between rounds, restored once
  * at the final output join) against the r10–r17 form (per-half-round
  * `nodes LEFT JOIN` + coalesce-0 carry), with a sorted-row equality
  * witness. The LEGACY arm is inlined verbatim below so both arms run
  * in one JVM/window.
  * Usage: runMain graft.probes.H8FuseProbe <sfDir> [reps]
  */
object H8FuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val g = RegistryFixtures.pageGraph(spark, sfDir)
    val iters = 4
    val k = 20

    def legacy(): DataFrame = {
      val e = g.e
      val nodes = g.nodes
      var hubs = nodes.select(col("url"),
        lit(operators.GraphOps.InitMicro).as("h"))
      var auths = nodes.select(col("url"), lit(0L).as("a"))
      def rescale(df: DataFrame, c: String): DataFrame = {
        val folded = df.localCheckpoint(false)
        val mxRow = folded.agg(max(col(c))).head
        val mxVal = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
        folded.select(col("url"),
          (if (mxVal > 0)
            expr(s"($c * ${operators.GraphOps.InitMicro}) div $mxVal")
           else lit(0L)).as(c))
      }
      for (_ <- 1 to iters) {
        val aRaw = e.join(hubs, e("src") === hubs("url"))
          .groupBy(e("dst").as("url")).agg(sum(col("h")).as("a"))
        auths = rescale(nodes.join(aRaw, Seq("url"), "left")
          .select(col("url"), coalesce(col("a"), lit(0L)).as("a")), "a")
        val hRaw = e.join(auths, e("dst") === auths("url"))
          .groupBy(e("src").as("url")).agg(sum(col("a")).as("h"))
        hubs = rescale(nodes.join(hRaw, Seq("url"), "left")
          .select(col("url"), coalesce(col("h"), lit(0L)).as("h")), "h")
      }
      nodes.join(auths, Seq("url")).join(hubs, Seq("url"))
        .select(col("url"), col("a").as("auth"), col("h").as("hub"))
        .orderBy(col("auth").desc, col("hub").desc, col("url").asc)
        .limit(k)
    }

    def fused(): DataFrame = operators.GraphOps.hits(g, iters, k)

    // equality witness (top-k IS totally ordered, but sort anyway)
    val r0 = legacy().collect().map(_.toString).sorted.toSeq
    val r1 = fused().collect().map(_.toString).sorted.toSeq
    println(s"[h8f] equal=${r0 == r1} n=${r0.size}")

    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(legacy()); time(fused())
    val tl = scala.collection.mutable.ArrayBuffer[Double]()
    val tf = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      tl += time(legacy())
      tf += time(fused())
    }
    println(f"[h8f] legacy min=${tl.min}%.3f " +
      s"all=${tl.map(t => f"$t%.3f").mkString(",")}")
    println(f"[h8f] fused  min=${tf.min}%.3f " +
      s"all=${tf.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
