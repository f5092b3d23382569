package graft
package probes

import org.apache.spark.sql.functions._

/** Stateful-streaming scale probe (round-13 verdict item 6): st9's
  * dedup stream over an N×-replicated events table — event_id AND
  * user_id offset per copy, so the dedup key space (the state-store
  * row count) grows with N exactly like a longer / denser stream.
  * Batch count stays 3 (the engine's fixed AvailableNow cost is a
  * per-TRIGGER constant — StProfile pins it at ~0.55 s); what must
  * scale linearly is the per-batch stateful work: the key shuffle,
  * the state-store read/commit (width derives from observed volume
  * via stateWidth, the same knob production turns), and the sink
  * write. A super-linear trend here would mean state lookups degrade
  * with store size — the thing to catch before 100 TB/day.
  * Usage: `runMain graft.probes.ScaleTrendSt9 <sfDir> <factor> [reps]`
  */
object ScaleTrendSt9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val ev0 = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val ev = (0 until factor)
      .map(k => ev0
        .withColumn("event_id", col("event_id") + lit(k * 100000000L))
        .withColumn("user_id", col("user_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .localCheckpoint()
    val root = RegistryFixtures.tempTableRoot(s"graft_st9_scale_x$factor")
    // same 3-batch + %7-slice redelivery shape as the st9 registry
    val b0 = ev.filter(col("event_id") % 3 === 0)
    val b1 = ev.filter(col("event_id") % 3 === 1)
    val b2 = ev.filter(col("event_id") % 3 === 2)
    RegistryFixtures.writeInputBatches(Seq(
      b0,
      b1.unionByName(b0.filter(col("event_id") % 7 === 0)),
      b2.unionByName(b1.filter(col("event_id") % 7 === 1))), root)
    RegistryFixtures.writeRowMeta(spark, root, Seq(root + "/in"))
    val width = graft.streaming.StreamingOps.stateWidth(
      RegistryFixtures.rowMeta(root))
    val ss = RegistryFixtures.stChild(spark, width)
    val ts = (1 to reps).map { _ =>
      val run = RegistryFixtures.tempTableRoot("graft_st9_scale_run")
      val stream = ss.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", 1).parquet(root + "/in")
      val t0 = System.nanoTime()
      graft.streaming.StreamingOps.dedupSink(stream, "ts",
        Seq("event_id"), "60 days", run + "/out", run + "/ckpt")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] st9 x$factor width=$width " +
      f"min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
