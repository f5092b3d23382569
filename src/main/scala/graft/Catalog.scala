package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table layer (K6/K7/S2 — ethical_crawler.py:817–889, :100–137):
  * existence probe, overwrite/append, partitioned layout. Tables are
  * plain Parquet directories; the reference's secondary indexes
  * (:884–886) map to partition pruning + Parquet min/max stats
  * (SURVEY §4.2), its sequences are dropped (§2.8 F2).
  */
object Catalog {

  /** S2 — table-existence probe (`information_schema.tables`,
    * ethical_crawler.py:127–137) for path-based tables.
    */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** K6 overwrite (`CREATE TABLE AS` / replace, ethical_crawler.py:
    * 115–121).
    */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K4/K6 append (`INSERT INTO ... SELECT`, ethical_crawler.py:123). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** K7 — partitioned table layout. `partitionBy("source_name")`
    * replaces `idx_source_name` (ethical_crawler.py:884): an equality
    * filter on the partition column prunes directories before any IO.
    */
  def overwritePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  def appendPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Atomic-ish table swap: move `tmpPath` over `path` (the
    * write-temp-then-rename pattern for rewrites that read their own
    * target; a transactional table format subsumes this at scale).
    */
  def replace(spark: SparkSession, tmpPath: String, path: String): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmpPath), new Path(path))
  }

  /** Read with schema merge across parquet footers — the companion to
    * [[append]] when a source starts shipping new fields: old files
    * surface the new columns as nulls, nothing is rewritten. (Spark
    * skips footer merging by default because it reads every footer;
    * at 100 TB keep a table-level schema and evolve it explicitly —
    * this per-read merge is the migration-window tool.)
    */
  def loadEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Small-file compaction: rewrite the table into ⌈bytes/target⌉
    * files via write-temp-then-swap. Append-heavy tables (every
    * K4/K5 append adds files) degrade by file COUNT, not bytes —
    * scan tasks, footer reads and scheduling all scale with it; this
    * is the standing maintenance job any 100 TB table needs (or a
    * transactional format's OPTIMIZE). Returns the target file count.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Recursive size: a partitioned layout keeps its bytes in
    // name=value subdirectories where a flat listStatus sees nothing
    // (and would collapse the whole table into one file).
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // Partition columns from the directory layout, so compaction
    // preserves the layout (and its pruning) instead of flattening
    // the partition values into plain columns.
    def partitionCols(dir: Path): List[String] = {
      val subs = fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (subs.isEmpty) Nil
      else {
        val name = subs.head.getPath.getName
        name.substring(0, name.indexOf('=')) ::
          partitionCols(subs.head.getPath)
      }
    }
    val parts = partitionCols(p)
    val tmp = path + "__compact_tmp"
    // Partitioned tables hash-distribute on the partition columns so
    // each partition value is written by exactly one task (one file
    // per value), with parallelism still capped at nFiles.
    val data =
      if (parts.isEmpty) load(spark, path).repartition(nFiles)
      else load(spark, path).repartition(nFiles,
        parts.map(org.apache.spark.sql.functions.col): _*)
    val w = data.write.mode(SaveMode.Overwrite)
    (if (parts.isEmpty) w else w.partitionBy(parts: _*)).parquet(tmp)
    replace(spark, tmp, path)
    nFiles
  }
}
