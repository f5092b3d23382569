package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming slice over the `events` stream (SURVEY §2.9
  * extension — the reference is batch-only; this is the capability a
  * continuously-ingesting catalog needs).
  *
  * Scale notes: state is bounded by the watermark (late rows beyond
  * `watermarkDelay` are dropped, window state is evicted once the
  * watermark passes); the aggregation is a standard partial/final
  * hash agg per window — the shuffle carries one row per
  * (window, key) per trigger, not per event.
  */
object StreamingOps {

  /** Tumbling-window counts + value sums per event type, with
    * watermarked event time. Works on both a streaming and a batch
    * DataFrame (same plan — the batch run is the oracle for tests).
    */
  def tumblingCounts(events: DataFrame, tsCol: String,
      windowLength: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), windowLength).as("win"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 6).as("total_value"))
      .select(
        col("win.start").as("window_start"),
        col("event_type"), col("cnt"), col("total_value"))

  /** File-source stream over a parquet events directory (one file =
    * one micro-batch when `maxFilesPerTrigger` is 1 — deterministic
    * replay for tests; on a cluster the same code tails a landing
    * directory or Kafka).
    */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Run a streaming aggregation to completion against a memory sink
    * and return the result table. `Complete` output mode (the test
    * harness wants the final totals; `Append` + watermark close is the
    * production sink mode).
    */
  def runToMemorySink(agg: DataFrame, queryName: String,
      spark: SparkSession): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
