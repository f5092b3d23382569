package graft
package probes

import org.apache.spark.sql.functions._

/** Write-amplification probe for the copy-on-write MERGE path under a
  * hot-key refresh stream (the round-6 verdict's merge-on-read
  * question): a Versioned table is laid out range-partitioned on the
  * merge key, then `nBatches` micro-batches each upsert the SAME
  * small hot-key set (the reference's per-dataset metadata refresh,
  * ethical_crawler.py:416–451, run continuously). Per batch we
  * measure:
  *   - bytes_changed: the batch's own parquet footprint (the source
  *     written alone — what a merge-on-read log would append);
  *   - bytes_written: the data files the CoW commit actually wrote
  *     (the overlapping files rewritten in full).
  * amplification = bytes_written / bytes_changed. This is the number
  * that decides when a delete-vector/MoR log pays for itself: CoW
  * rewrites a whole file per touched file per batch regardless of how
  * few rows changed, while MoR appends ~bytes_changed and defers the
  * rewrite to OPTIMIZE (k15's compaction).
  * Two hot-set shapes: `clustered` (the lowest `hotKeys` ids — all in
  * one range file) and `scattered` (every ⌈N/hotKeys⌉-th id — one or
  * two keys in EVERY range file, the worst case for file-granular
  * CoW: each batch rewrites every file it grazes).
  * `mode=mor` runs the same stream through [[Versioned.mergeUpsertMoR]]
  * (amp should read ~1.0 for BOTH shapes) and folds the log with
  * OPTIMIZE at the end, printing the fold's one-time cost.
  * Usage: `runMain graft.probes.MorProbe [sfDir] [nBatches] [hotKeys] [shape] [mode]`
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val hotKeys = args.lift(2).map(_.toInt).getOrElse(20)
    val shape = args.lift(3).getOrElse("clustered")
    val mode = args.lift(4).getOrElse("cow")
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars", "text")
    val root = java.nio.file.Files.createTempDirectory("morprobe")
      .toString
    val table = s"$root/docs"
    Versioned.init(docs.repartitionByRange(8, col("doc_id")), table)

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists) 0L
      else if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => dirBytes(x.getPath)).sum)
        .getOrElse(0L)
    }

    // the hot batch: same keys every time, payload perturbed per batch
    // so the merge is never a no-op
    val n = docs.count()
    val hot = (if (shape == "scattered")
        docs.filter(col("doc_id") % lit(math.max(1L, n / hotKeys)) === 0)
      else docs.orderBy(col("doc_id").asc).limit(hotKeys)).cache()
    hot.count()
    var totW = 0L; var totC = 0L
    (1 to nBatches).foreach { b =>
      val batch = hot.withColumn("n_chars", col("n_chars") + lit(b.toLong))
      val probe = s"$root/probe_$b"
      batch.coalesce(1).write.parquet(probe) // the MoR-log footprint
      val changed = dirBytes(probe)
      val vBefore = Versioned.currentVersion(spark, table).get
      if (mode == "mor") Versioned.mergeUpsertMoR(batch, table, Seq("doc_id"))
      else Versioned.mergeUpsert(batch, table, Seq("doc_id"))
      val vAfter = Versioned.currentVersion(spark, table).get
      val written = dirBytes(s"$table/v=$vAfter")
      totW += written; totC += changed
      println(f"[mor] batch=$b v=$vBefore->$vAfter " +
        f"bytes_changed=$changed bytes_written=$written " +
        f"amp=${written.toDouble / changed}%.1f")
    }
    val tableBytes = dirBytes(table)
    println(f"[mor] TOTAL mode=$mode shape=$shape batches=$nBatches " +
      f"hot_rows=$hotKeys bytes_changed=$totC bytes_written=$totW " +
      f"amp=${totW.toDouble / totC}%.1f table_bytes=$tableBytes")
    if (mode == "mor") {
      val vPre = Versioned.currentVersion(spark, table).get
      val vFold = Versioned.compact(spark, table)
      val foldBytes = dirBytes(s"$table/v=$vFold")
      println(f"[mor] FOLD v=$vPre->$vFold bytes_written=$foldBytes " +
        "(one-time OPTIMIZE cost amortized over all batches)")
    }
    spark.stop()
  }
}
