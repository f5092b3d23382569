package graft
package probes

import org.apache.spark.sql.functions._

/** Focused n34b scale probe (ScaleTrend's rotated-replica corpus,
  * n34b only) — re-measuring the ×4/×10 slope after the round-13
  * reverse-neighbor cap. Usage:
  * `runMain graft.probes.ScaleTrendN34b <sfDir> <factor> [reps]`
  */
object ScaleTrendN34b {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val embG = Tables.embeddings(spark, sfDir)
    val bigEmbG = (0 until factor)
      .map(k => embG
        .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        .withColumn("embedding", expr(
          s"concat(slice(embedding, ${k % 64 + 1}, ${64 - k % 64}), " +
            s"slice(embedding, 1, ${k % 64}))")))
      .reduce(_ unionByName _)
      .localCheckpoint()
    val q = () => operators.SimilarityOps.knnGraphBounded(
      bigEmbG, k = 8, stride = 50, nProbe = 2, nndRounds = 2)
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n34b x$factor min=${ts.min}%.3f " +
      s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
