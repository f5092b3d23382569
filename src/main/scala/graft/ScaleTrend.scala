package graft

import org.apache.spark.sql.functions._

/** Scale-trend probe: times corpusPrep (the c1 pipeline) over an
  * in-flight N×-replicated documents table (doc_ids offset per copy so
  * dedup behavior is preserved copy-by-copy). Together with the same
  * replication in DuckDB (tools/duckdb_baseline-style one-off) this
  * separates fixed job latency from data-proportional cost: a ratio
  * that falls as N grows is latency-bound at sf0.1, not plan-bound.
  * Usage: `runMain graft.ScaleTrend <sfDir> <factor> [reps]`
  */
object ScaleTrend {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
    val big = (0 until factor)
      .map(k => docs.withColumn("doc_id",
        col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
    val q = () => operators.AnalyticsOps.corpusPrep(big,
      idCol = "doc_id", textCol = "text", charsCol = "n_chars",
      langCol = "lang", minQuality = 0.55, samplePerMille = 500)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] c1 x$factor min=${times.min}%.3f " +
      s"all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
