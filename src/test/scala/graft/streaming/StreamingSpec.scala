package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("tumbling-window counts: streaming result equals batch result") {
    val batchEvents = Tables.events(spark, sfSmoke).cache()
    // stage the smoke events as several parquet files → several
    // micro-batches (maxFilesPerTrigger=1)
    val stageDir = tmpDir("stream") + "/events"
    batchEvents.repartition(4).write.parquet(stageDir)
    val staged = spark.read.parquet(stageDir)

    val stream = StreamingOps.eventsStream(spark, stageDir, staged.schema)
    val agg = StreamingOps.tumblingCounts(stream, "ts",
      windowLength = "1 hour", watermarkDelay = "10 minutes")
    // watermark must be part of the streaming plan (bounds state)
    assert(agg.queryExecution.analyzed.toString
      .contains("EventTimeWatermark"))
    val streamed = StreamingOps.runToMemorySink(agg, "win_counts", spark)

    val expected = StreamingOps.tumblingCounts(staged, "ts",
      windowLength = "1 hour", watermarkDelay = "10 minutes")

    val got = streamed.orderBy("window_start", "event_type").collect()
    val want = expected.orderBy("window_start", "event_type").collect()
    assert(got.length == want.length)
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    assert(got.map(_.getLong(2)).sum == batchEvents.count())
  }

  test("tumblingCounts on a batch frame degrades to a plain windowed agg") {
    val ev = Tables.events(spark, sfSmoke)
    val agg = StreamingOps.tumblingCounts(ev, "ts", "1 hour", "10 minutes")
    assert(!agg.isStreaming)
    val total = agg.agg(sum("cnt")).head.getLong(0)
    assert(total == ev.count())
  }
}
