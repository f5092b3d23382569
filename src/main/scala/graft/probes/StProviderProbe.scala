package graft
package probes

import org.apache.spark.sql.functions._

/** A/B the streaming STATE-STORE PROVIDER on the two stateful
  * streaming queries — st9 (dropDuplicatesWithinWatermark key state)
  * and st10 (stream-stream interval join: 4 stores per partition per
  * side) — plus a per-trigger decomposition from the engine's own
  * StreamingQueryProgress durations (triggerExecution, queryPlanning,
  * getBatch, addBatch, walCommit, commitOffsets), which is where the
  * guide §5 "state lever" question (provider init vs commit vs
  * planning) is answered from.
  *
  * Arms, rep-interleaved (min-of-reps; one arm never gets a window
  * the other didn't see):
  *   - `hdfs`    — HDFSBackedStateStoreProvider (the session default);
  *   - `rocks`   — RocksDBStateStoreProvider;
  *   - `rocksCl` — RocksDB + changelog checkpointing (the production
  *                 low-latency-commit configuration).
  *
  * Equality witness: each arm's first st9/st10 output is collected as
  * a SORTED row-string multiset (the sink output carries no order
  * guarantee) and compared against the hdfs arm.
  *
  * Usage: runMain graft.probes.StProviderProbe <sfDir> [reps]
  */
object StProviderProbe {

  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)

    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val fixDedup = RegistryFixtures.cachedStreamInput(spark, sfDir,
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
    val views = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("view_ts"))
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val fixJoin = RegistryFixtures.cachedStreamInput(spark, sfDir,
      "stream_join") { root =>
      RegistryFixtures.writeInputBatches((0 until 3).map(i =>
        views.filter(col("view_id") % 3 === i)), root + "/v")
      RegistryFixtures.writeInputBatches((0 until 3).map(i =>
        purchases.filter(col("purchase_id") % 3 === i)), root + "/p")
      RegistryFixtures.writeRowMeta(spark, root,
        Seq(root + "/v/in", root + "/p/in"))
    }

    // fresh children per arm (NOT stChild — its cache key has no
    // provider dimension and the probe must not poison it)
    def child(width: Int, provider: Option[String],
        changelog: Boolean): org.apache.spark.sql.SparkSession = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", width.toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")
      provider.foreach(p =>
        ss.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      if (changelog)
        ss.conf.set("spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled", "true")
      ss
    }
    val wDedup = streaming.StreamingOps.stateWidth(
      RegistryFixtures.rowMeta(fixDedup))
    val wJoin = streaming.StreamingOps.stateWidth(
      RegistryFixtures.rowMeta(fixJoin))
    case class Arm(tag: String, provider: Option[String],
        changelog: Boolean)
    val arms = Seq(
      Arm("hdfs", None, changelog = false),
      Arm("rocks", Some(RocksCls), changelog = false),
      Arm("rocksCl", Some(RocksCls), changelog = true))

    var lastProgress: Seq[String] = Nil

    def runDedup(ss: org.apache.spark.sql.SparkSession): String = {
      val run = RegistryFixtures.tempTableRoot("graft_stpp_dedup")
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(fixDedup + "/in")
      val deduped = stream
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(Seq("event_id"))
      val q = deduped.writeStream
        .option("checkpointLocation",
          RegistryFixtures.ckptRoot("graft_stpp_ckpt_d"))
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            batch.write.mode("overwrite")
              .parquet(s"$run/out/batch=$batchId")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lastProgress = q.recentProgress.toSeq.map(p =>
        s"batch=${p.batchId} durationMs=${p.durationMs}")
      run + "/out"
    }

    def runJoin(ss: org.apache.spark.sql.SparkSession): String = {
      val run = RegistryFixtures.tempTableRoot("graft_stpp_join")
      val vS = ss.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1).parquet(fixJoin + "/v/in")
      val pS = ss.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1).parquet(fixJoin + "/p/in")
      val l = vS.withWatermark("view_ts", "60 days")
      val r = pS.withWatermark("p_ts", "60 days")
      val cond = col("v_user") === col("p_user") &&
        col("p_ts") >= col("view_ts") &&
        col("p_ts") < col("view_ts") + expr("INTERVAL 30 minutes")
      val q = l.join(r, cond, "inner").writeStream
        .option("checkpointLocation",
          RegistryFixtures.ckptRoot("graft_stpp_ckpt_j"))
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            batch.write.mode("overwrite")
              .parquet(s"$run/out/batch=$batchId")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lastProgress = q.recentProgress.toSeq.map(p =>
        s"batch=${p.batchId} durationMs=${p.durationMs}")
      run + "/out"
    }

    def sortedRows(out: String): Seq[String] =
      spark.read.parquet(out).collect().map(_.toString).sorted.toSeq

    // equality witness + per-arm progress decomposition (first run)
    var refDedup: Seq[String] = null
    var refJoin: Seq[String] = null
    arms.foreach { a =>
      val sd = child(wDedup, a.provider, a.changelog)
      val outD = runDedup(sd)
      println(s"[stpp] arm=${a.tag} st9 progress:")
      lastProgress.foreach(l => println(s"[stpp]   $l"))
      val rowsD = sortedRows(outD)
      val sj = child(wJoin, a.provider, a.changelog)
      val outJ = runJoin(sj)
      println(s"[stpp] arm=${a.tag} st10 progress:")
      lastProgress.foreach(l => println(s"[stpp]   $l"))
      val rowsJ = sortedRows(outJ)
      if (a.tag == "hdfs") { refDedup = rowsD; refJoin = rowsJ }
      else println(s"[stpp] arm=${a.tag} equal_st9=${rowsD == refDedup}" +
        s" equal_st10=${rowsJ == refJoin}")
    }

    // timed, rep-interleaved
    val tD = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    val tJ = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    (1 to reps).foreach { _ =>
      arms.foreach { a =>
        val sd = child(wDedup, a.provider, a.changelog)
        val t0 = System.nanoTime(); runDedup(sd)
        tD.getOrElseUpdate(a.tag,
          scala.collection.mutable.ArrayBuffer()) +=
          (System.nanoTime() - t0) / 1e9
        val sj = child(wJoin, a.provider, a.changelog)
        val t1 = System.nanoTime(); runJoin(sj)
        tJ.getOrElseUpdate(a.tag,
          scala.collection.mutable.ArrayBuffer()) +=
          (System.nanoTime() - t1) / 1e9
      }
    }
    arms.foreach { a =>
      println(f"[stpp] st9  ${a.tag}%-7s min=${tD(a.tag).min}%.3f " +
        s"all=${tD(a.tag).map(t => f"$t%.3f").mkString(",")}")
      println(f"[stpp] st10 ${a.tag}%-7s min=${tJ(a.tag).min}%.3f " +
        s"all=${tJ(a.tag).map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
