package graft
package probes

import org.apache.spark.sql.functions._

/** Decomposes st9's wall time into named micro-batch costs
  * (round-12 verdict item 4's ledger alternative):
  *   - `noop stream`: an AvailableNow pass over the SAME 3 input
  *     files with a do-nothing foreachBatch — pure engine overhead
  *     (offset/commit logs, source listing, batch planning);
  *   - `dedup stream`: the real dedupSink run (adds the stateful
  *     dropDuplicatesWithinWatermark shuffle + state-store commits +
  *     per-batch parquet writes);
  *   - `final read`: the batch read + aggregate over the sink output.
  * Usage: `runMain graft.probes.StProfile <sfDir> [reps]`
  */
object StProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val fix = RegistryFixtures.cachedStreamInput(spark, sfDir,
      "stream_dedup") { root =>
      val b0 = ev.filter(col("event_id") % 3 === 0)
      val b1 = ev.filter(col("event_id") % 3 === 1)
      val b2 = ev.filter(col("event_id") % 3 === 2)
      RegistryFixtures.writeInputBatches(Seq(
        b0,
        b1.unionByName(b0.filter(col("event_id") % 7 === 0)),
        b2.unionByName(b1.filter(col("event_id") % 7 === 1))), root)
      RegistryFixtures.writeRowMeta(spark, root, Seq(root + "/in"))
    }
    val ss = RegistryFixtures.stChild(spark,
      streaming.StreamingOps.stateWidth(RegistryFixtures.rowMeta(fix)))

    def timed(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stprof] $tag min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // (a) engine-only pass: same source, no state, no output
    timed("noop-stream") {
      val run = RegistryFixtures.tempTableRoot("graft_stprof_noop")
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(fix + "/in")
      val q = stream.writeStream
        .option("checkpointLocation",
          RegistryFixtures.ckptRoot("graft_stprof_ckpt"))
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // (b) the real dedup sink (rows only — the pre-round-14 shape)
    var lastOut: String = null
    timed("dedup-stream") {
      val run = RegistryFixtures.tempTableRoot("graft_stprof_dedup")
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(fix + "/in")
      streaming.StreamingOps.dedupSink(stream, "ts", Seq("event_id"),
        "60 days", run + "/out",
        RegistryFixtures.ckptRoot("graft_stprof_ckpt"))
      lastOut = run + "/out"
    }

    // (b') rows + per-batch partial rollup (the round-14 st9 shape)
    var lastAgg: String = null
    timed("dedup-stream-partials") {
      val run = RegistryFixtures.tempTableRoot("graft_stprof_dedupp")
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(fix + "/in")
      streaming.StreamingOps.dedupSink(stream, "ts", Seq("event_id"),
        "60 days", run + "/out",
        RegistryFixtures.ckptRoot("graft_stprof_ckpt"),
        partialAgg = Some((
          (b: org.apache.spark.sql.DataFrame) =>
            b.groupBy(col("event_type"), col("user_id"))
              .agg(count(lit(1)).as("n"),
                sum(round(col("value") * 100).cast("long"))
                  .as("cents")),
          run + "/agg")))
      lastAgg = run + "/agg"
    }

    // (c) the final read + aggregate over the FULL row sink
    timed("final-read") {
      ss.read.parquet(lastOut)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          (sum(round(col("value") * 100).cast("long")) / 100.0)
            .as("total_value"))
        .orderBy(col("event_type").asc)
        .write.format("noop").mode("overwrite").save()
    }

    // (c') the final read folding the 3 tiny partial files
    timed("final-read-partials") {
      ss.read.parquet(lastAgg)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          (sum(col("cents")) / 100.0).as("total_value"))
        .orderBy(col("event_type").asc)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
