package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet tables: snapshot isolation, MERGE upsert and time
  * travel over a plain filesystem — the minimal transactional layer
  * for the reference's refresh/upsert verb (L6, ethical_crawler.py:
  * 939–1005), which round 4 shipped as overwrite-swap only.
  *
  * Layout: `<table>/v=<k>/part-*.parquet` snapshot directories plus a
  * one-line `<table>/_latest` manifest naming the current version.
  * Writers NEVER mutate a published snapshot: a commit writes the new
  * `v=<k+1>` directory completely, then swaps the manifest via
  * write-temp-then-rename (atomic on HDFS and a single local fs) — the
  * same single-pointer commit protocol a transactional table format
  * uses with a log in place of the pointer. Readers resolve the
  * manifest once and then read an immutable directory, so a reader is
  * never torn across a concurrent commit and any historical version
  * stays readable until vacuumed.
  *
  * 100 TB notes: MERGE here rewrites the full table (one anti-join +
  * union — O(|target| + |source|), one shuffle on the key). The
  * production refinement is copy-on-write at FILE granularity (join
  * the source keys against file-level min/max stats to rewrite only
  * matched files) or merge-on-read deltas — both change the write
  * cost, not the semantics or this API. Old snapshots are reclaimed
  * with [[vacuum]], exactly like a format's expire-snapshots job.
  */
object Versioned {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(table: String) = new Path(table, "_latest")

  private def versionDir(table: String, v: Int) = s"$table/v=$v"

  /** Current committed version, None for an uninitialized table. */
  def currentVersion(spark: SparkSession, table: String): Option[Int] = {
    val f = fs(spark, table)
    val m = manifest(table)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        Some(s.toInt)
      } finally in.close()
    }
  }

  /** All committed versions, oldest first (directory listing — cheap:
    * one entry per snapshot, independent of data size).
    */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val f = fs(spark, table)
    val p = new Path(table)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toInt }
      .sorted
  }

  /** Time travel: read snapshot `v` (immutable once committed). */
  def snapshot(spark: SparkSession, table: String, v: Int): DataFrame =
    spark.read.parquet(versionDir(table, v))

  /** Read the current snapshot (manifest resolved once per call). */
  def current(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"uninitialized versioned table: $table"))
    snapshot(spark, table, v)
  }

  private def commit(spark: SparkSession, table: String, v: Int): Int = {
    val f = fs(spark, table)
    val tmp = new Path(table, s"_latest.tmp$v")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // Single-pointer swap: rename is the commit point.
    f.delete(manifest(table), false)
    if (!f.rename(tmp, manifest(table)))
      throw new IllegalStateException(s"commit of $table v$v lost a race")
    v
  }

  private def write(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(dir)
  }

  /** Create version 0 from `df`. Fails if the table already exists.
    * `partitionCols` lays every snapshot out partitioned (pruned
    * reads keep working through time travel).
    */
  def init(df: DataFrame, table: String,
      partitionCols: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    require(currentVersion(spark, table).isEmpty,
      s"versioned table already initialized: $table")
    write(df, versionDir(table, 0), partitionCols)
    commit(spark, table, 0)
  }

  /** MERGE (whole-row upsert): source rows REPLACE target rows that
    * share a key, unmatched target rows carry over, unmatched source
    * rows insert — the reference's refresh semantics
    * (ethical_crawler.py:977–1005). If `deleteFlag` names a boolean
    * source column, flagged rows instead DELETE their target match
    * (and insert nothing). Commits and returns the new version.
    *
    * Cost: one left-anti join of target against the source keys
    * (shuffle on the key, or broadcast when the source is small — the
    * common refresh case, left to AQE) + one column-pruned pass over
    * the source. Snapshot `v` stays readable throughout.
    */
  def mergeUpsert(source: DataFrame, table: String, keys: Seq[String],
      deleteFlag: Option[String] = None,
      partitionCols: Seq[String] = Nil): Int = {
    val spark = source.sparkSession
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"uninitialized versioned table: $table"))
    val tgt = snapshot(spark, table, v)
    val keyCols = keys.map(col)
    val upserts = deleteFlag match {
      case Some(flag) => source.filter(!col(flag)).drop(flag)
      case None => source
    }
    val merged = upserts
      .unionByName(
        tgt.join(source.select(keyCols: _*), keys, "left_anti"))
    write(merged, versionDir(table, v + 1), partitionCols)
    commit(spark, table, v + 1)
  }

  /** Per-version row counts — the table's history report. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versions(spark, table)
      .map(v => (v, snapshot(spark, table, v).count()))
      .toDF("version", "n_rows")
      .orderBy(col("version").asc)
  }

  /** Drop all snapshots older than `keepLast` versions (expire
    * snapshots). The manifest never points at a dropped version.
    */
  def vacuum(spark: SparkSession, table: String, keepLast: Int = 1): Unit = {
    val vs = versions(spark, table)
    val f = fs(spark, table)
    vs.dropRight(math.max(1, keepLast)).foreach { v =>
      f.delete(new Path(versionDir(table, v)), true)
    }
  }
}
