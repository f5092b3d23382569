package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each `queries` entry is one operator from the SURVEY §2 inventory (or
  * a north-star extension), run against the testdata tables in the given
  * scale-factor dir. `oracleSql` carries the DuckDB-equivalent SQL for
  * the hash-match gate; column aliases match the Spark output exactly
  * and every query ends in a total order (the reference's own sorts are
  * tie-ambiguous — SURVEY §2.6 ⚠).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `search` verb shape: ILIKE disjunction + equality
    * filter + recency top-k (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    ReferenceOps.search(
      docs,
      query = Some("spark"),
      textCols = Seq("text", "source"),
      equalityFilters = Map("lang" -> "en"),
      orderCol = "doc_id",
      tiebreakers = Seq.empty,
      limit = 20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface (SURVEY §2) over documents/events ----
    "p3_search_ilike" -> ((s, dir) => {
      ReferenceOps.search(
        Tables.documents(s, dir),
        query = Some("window"),
        textCols = Seq("text", "source"),
        equalityFilters = Map.empty,
        orderCol = "doc_id", tiebreakers = Seq.empty, limit = 100)
        .select("doc_id", "source", "lang", "n_chars")
    }),
    "p4_search_filters" -> ((s, dir) => {
      ReferenceOps.search(
        Tables.events(s, dir),
        query = None,
        textCols = Seq.empty,
        equalityFilters = Map("event_type" -> "click"),
        orderCol = "ts", tiebreakers = Seq("event_id"), limit = 50)
        .filter(col("value") > 100.0)
        .select("event_id", "ts", "user_id", "value")
        .orderBy(col("ts").desc, col("event_id").asc)
    }),
    "p6_where_passthrough" -> ((s, dir) => {
      ReferenceOps.whereClause(
        Tables.events(s, dir),
        "event_type = 'purchase' AND value >= 50.0")
        .select("event_id", "user_id", "value")
        .orderBy(col("event_id").asc)
    }),
    "p9_distinct_sources" -> ((s, dir) =>
      ReferenceOps.distinctValues(Tables.documents(s, dir), "source")),
    "a1_source_stats" -> ((s, dir) =>
      ReferenceOps.sourceStats(Tables.documents(s, dir),
        key = "source", distinctCol = "lang", avgCol = "n_chars",
        spanCol = "doc_id")),
    "a2_type_counts" -> ((s, dir) =>
      ReferenceOps.typeCounts(Tables.events(s, dir), "event_type")),
    "a3_two_key_stats" -> ((s, dir) =>
      ReferenceOps.twoKeyStats(Tables.documents(s, dir),
        k1 = "source", k2 = "lang", maxCol = "doc_id")),
    "j1_latest_per_key" -> ((s, dir) =>
      ReferenceOps.latestPerKey(Tables.events(s, dir),
        key = "user_id", orderCol = "ts", tiebreaker = "event_id")
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy(col("user_id").asc)),
    "k5_dedup_append" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source", "lang")
      val existing = docs.filter(col("doc_id") % 2 === 0)
      ReferenceOps.dedupAppend(existing, docs,
        keys = Seq("doc_id"), batchOrder = "doc_id")
        .orderBy(col("doc_id").asc)
    }),
    "l3_popular_tags" -> ((s, dir) =>
      ReferenceOps.popularTags(Tables.documents(s, dir),
        split(col("text"), " "), topK = 50)),
    "l4_temporal_activity" -> ((s, dir) =>
      ReferenceOps.temporalActivity(Tables.events(s, dir), "ts")),
    "l5_license_distribution" -> ((s, dir) =>
      ReferenceOps.licenseDistribution(Tables.documents(s, dir), "lang")),

    // ---- star-schema join/agg extension suite ----
    "q1_pricing_summary" -> ((s, dir) =>
      StarSchemaOps.pricingSummary(s, dir)),
    "q3_top_revenue_orders" -> ((s, dir) =>
      StarSchemaOps.topRevenueOrders(s, dir)),
    "q5_region_revenue" -> ((s, dir) =>
      StarSchemaOps.regionRevenue(s, dir)),
    "o1_top_orders" -> ((s, dir) =>
      StarSchemaOps.topOrdersByPrice(s, dir, 20)),
    "w1_top_orders_per_customer" -> ((s, dir) =>
      StarSchemaOps.topOrdersPerCustomer(s, dir)),
    "q4_priority_counts" -> ((s, dir) =>
      StarSchemaOps.priorityCounts(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "p3_search_ilike" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE (text ILIKE '%window%' OR source ILIKE '%window%')
        |ORDER BY doc_id DESC LIMIT 100""".stripMargin,
    "p4_search_filters" ->
      """SELECT event_id, ts, user_id, value FROM (
        |  SELECT event_id, ts, user_id, value FROM events
        |  WHERE event_type = 'click'
        |  ORDER BY ts DESC, event_id ASC LIMIT 50
        |) WHERE value > 100.0 ORDER BY ts DESC, event_id ASC""".stripMargin,
    "p6_where_passthrough" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value >= 50.0
        |ORDER BY event_id ASC""".stripMargin,
    "p9_distinct_sources" ->
      "SELECT DISTINCT source FROM documents ORDER BY source ASC",
    "a1_source_stats" ->
      """SELECT source, count(*) AS record_count,
        |  count(DISTINCT lang) AS distinct_types,
        |  avg(n_chars) AS avg_size,
        |  min(doc_id) AS first_ingested, max(doc_id) AS last_ingested
        |FROM documents GROUP BY source
        |ORDER BY record_count DESC, source ASC""".stripMargin,
    "a2_type_counts" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type ASC""".stripMargin,
    "a3_two_key_stats" ->
      """SELECT source, lang, count(*) AS cnt, max(doc_id) AS last_seen
        |FROM documents GROUP BY source, lang
        |ORDER BY source ASC, cnt DESC, lang ASC""".stripMargin,
    "j1_latest_per_key" ->
      """SELECT user_id, event_id, event_type, ts FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id ASC""".stripMargin,
    "k5_dedup_append" ->
      """WITH existing AS (
        |  SELECT doc_id, source, lang FROM documents WHERE doc_id % 2 = 0
        |)
        |SELECT doc_id, source, lang FROM existing
        |UNION ALL
        |SELECT d.doc_id, d.source, d.lang FROM documents d
        |ANTI JOIN existing e ON d.doc_id = e.doc_id
        |ORDER BY doc_id ASC""".stripMargin,
    "l3_popular_tags" ->
      """SELECT tag, count(*) AS frequency FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tag FROM documents
        |) WHERE tag <> '' GROUP BY tag
        |ORDER BY frequency DESC, tag ASC LIMIT 50""".stripMargin,
    "l4_temporal_activity" ->
      """SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY day ASC""".stripMargin,
    "l5_license_distribution" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang ASC""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT l_orderkey, o_orderdate,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "o1_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "w1_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC)
        |      AS rank
        |  FROM orders
        |) WHERE rank <= 3 ORDER BY o_custkey ASC, rank ASC""".stripMargin,
    "q4_priority_counts" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
  )
}
