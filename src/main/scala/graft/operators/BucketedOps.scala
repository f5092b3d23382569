package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-at-rest fact tables: the production layout the join
  * commentary in [[StarSchemaOps]] assumes ("bucketed on the order key
  * at rest"), made concrete. `orders` and `lineitem` are written ONCE
  * per (session, sfDir) bucketed+sorted by their order key; every
  * subsequent join on that key is co-located — zero exchange on either
  * side, at any scale (ExportCatalogSpec proves the plan; the
  * b1_bucketed_revenue oracle entry proves the results).
  *
  * At 100 TB this is the difference between shuffling the fact table
  * on every join and never shuffling it at all: the shuffle is paid
  * once at ingest (the bucketed write) and amortized over every query.
  */
object BucketedOps {

  val Buckets = 8

  private def tableName(base: String, sfDir: String): String =
    f"graft_${base}_bucketed_${sfDir.hashCode & 0x7fffffff}%08x"

  private def tablePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_bucketed/$name"

  /** Write orders+lineitem bucketed by order key for `sfDir` unless
    * the session catalog already has them. Returns (orders, lineitem)
    * table names.
    */
  def ensureBucketed(spark: SparkSession, sfDir: String)
      : (String, String) = {
    val ordName = tableName("orders", sfDir)
    val liName = tableName("lineitem", sfDir)
    if (!spark.catalog.tableExists(ordName)) {
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", tablePath(ordName))
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordName)
    }
    if (!spark.catalog.tableExists(liName)) {
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", tablePath(liName))
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
    }
    (ordName, liName)
  }

  /** The co-located join itself (exposed for plan assertions). */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (ordName, liName) = ensureBucketed(spark, sfDir)
    spark.table(liName).join(spark.table(ordName),
      col("l_orderkey") === col("o_orderkey"))
  }

  /** Revenue per order status over the bucketed tables — the join
    * needs no exchange (both sides pre-hashed on the key at rest);
    * the only shuffle left is the 3-row status aggregate.
    *
    * The sum runs in exact INTEGER money units: b1's groups are the
    * suite's largest (~⅓ of lineitem each), and at sf0.1 a double
    * sum of ~10¹⁰ magnitude carries ~10⁻⁵ association noise —
    * different partial-agg orders flip the 6th decimal (caught by
    * the sf0.1 selfcheck sweep). Inputs are money-grain (within
    * 10⁻⁹ of the cents grid — verified), so price·(1−disc) =
    * cents·(100−pct)/10⁴ with an exact BIGINT numerator: integer
    * addition is associative, any partial order yields the same
    * bits, and the single final division is deterministic. This is
    * also the 100 TB answer — a money sum should never ride on
    * float association in the first place.
    */
  def bucketedRevenue(spark: SparkSession, sfDir: String): DataFrame =
    bucketedJoin(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        (sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus").asc)

  /** Write documents partitioned by `lang` at rest for `sfDir` unless
    * already in the session catalog — the K7 layout (partition
    * directories ≙ the reference's secondary indexes) as a live,
    * oracle-checked table rather than a plan test only.
    */
  def ensurePartitionedDocs(spark: SparkSession, sfDir: String)
      : String = {
    val name = tableName("documents", sfDir)
    if (!spark.catalog.tableExists(name)) {
      Tables.documents(spark, sfDir)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", tablePath(name))
        .partitionBy("lang")
        .saveAsTable(name)
    }
    name
  }

  /** Per-source stats for ONE language over the lang-partitioned
    * documents table: the equality filter prunes to a single partition
    * directory before any IO (`PartitionFilters` in the scan — asserted
    * in ExportCatalogSpec); results are layout-independent so the
    * oracle reads the plain parquet.
    */
  def partitionPrunedStats(spark: SparkSession, sfDir: String,
      lang: String = "en"): DataFrame = {
    val name = ensurePartitionedDocs(spark, sfDir)
    spark.table(name)
      .filter(col("lang") === lang)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source").asc)
  }
}
