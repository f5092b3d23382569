package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps

/** The reference engine's relational query surface, re-expressed as
  * composable Spark operators.
  *
  * Maps SURVEY.md §2 (ethical_crawler.py:968–1060, 1352–1451) onto the
  * DataFrame API. Each operator is declarative — Catalyst handles
  * predicate pushdown, column pruning and join strategy — so the same
  * code scales from sf0.001 parquet files to a partitioned 100 TB
  * catalog table.
  *
  * Determinism: callers that need oracle-stable output must append a
  * total-order sort; the helpers here take explicit tiebreaker keys
  * (the reference's own sorts are tie-ambiguous, SURVEY §2.6 ⚠).
  */
object ReferenceOps {

  /** P3+P4+P5+O1 — the `search` verb (ethical_crawler.py:968–1004).
    *
    * Dynamic WHERE assembly: only the provided predicates are applied
    * (reference builds the SQL string conditionally; we fold filters —
    * Catalyst prunes and pushes each one down to the scan).
    * `textCols` play the role of title/description/content_summary in
    * the reference's ILIKE disjunction.
    */
  def search(
      df: DataFrame,
      query: Option[String],
      textCols: Seq[String],
      equalityFilters: Map[String, Any],
      orderCol: String,
      tiebreakers: Seq[String],
      limit: Int): DataFrame = {
    val withText = query match {
      case Some(q) =>
        val pat = s"%$q%"
        val disj = textCols.map(c => col(c).ilike(pat)).reduce(_ || _)
        df.filter(disj)
      case None => df
    }
    val filtered = equalityFilters.foldLeft(withText) {
      case (d, (c, v)) => d.filter(col(c) === lit(v))
    }
    // ORDER BY <recency> DESC LIMIT n → planned as TakeOrderedAndProject
    // (no total sort, no shuffle of the full relation).
    filtered
      .orderBy(col(orderCol).desc +: tiebreakers.map(col(_).asc): _*)
      .limit(limit)
  }

  /** P6 — raw predicate passthrough (`--where`, ethical_crawler.py:1078).
    * The reference splices user SQL into the query string; we parse it
    * with `expr` so it stays inside Catalyst (pushdown still applies)
    * and can only be a predicate, not arbitrary SQL.
    */
  def whereClause(df: DataFrame, predicate: String): DataFrame =
    df.filter(expr(predicate))

  /** A1 — per-source stats (ethical_crawler.py:1039–1050): count,
    * distinct types, avg size, first/last ingest. One hash aggregate;
    * Spark plans partial+final so the shuffle carries one row per
    * (partition, key).
    */
  def sourceStats(
      df: DataFrame,
      key: String,
      distinctCol: String,
      avgCol: String,
      spanCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col(distinctCol)).as("distinct_types"),
        avg(col(avgCol)).as("avg_size"),
        min(col(spanCol)).as("first_ingested"),
        max(col(spanCol)).as("last_ingested"))
      .resultSorted(col("record_count").desc, col(key).asc)

  /** A2 — counts by type (ethical_crawler.py:1053–1060). */
  def typeCounts(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .resultSorted(col("cnt").desc, col(key).asc)

  /** A3 — two-key stats (`status`, ethical_crawler.py:1425–1434). */
  def twoKeyStats(df: DataFrame, k1: String, k2: String, maxCol: String)
      : DataFrame =
    df.groupBy(col(k1), col(k2))
      .agg(count(lit(1)).as("cnt"), max(col(maxCol)).as("last_seen"))
      .resultSorted(col(k1).asc, col("cnt").desc, col(k2).asc)

  /** J1 — greatest-n-per-group: latest row per key
    * (ethical_crawler.py:1437–1451, a correlated scalar subquery in the
    * reference; authored directly as the window form Catalyst would
    * decorrelate to). One shuffle on the partition key.
    */
  def latestPerKey(
      df: DataFrame,
      key: String,
      orderCol: String,
      tiebreaker: String): DataFrame = {
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(orderCol).desc, col(tiebreaker).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** J2/K5 — first-write-wins dedup append (`INSERT OR IGNORE` vs
    * UNIQUE(source_name, record_id), ethical_crawler.py:909–936, :843).
    *
    * Batch semantics: existing rows win; within the incoming batch the
    * lowest `batchOrder` row per key wins. The anti-join broadcasts the
    * existing key set when small; at 100 TB the existing side is the big
    * one, so production layout is: partition both sides on the key and
    * let AQE pick shuffled hash join — never collect.
    */
  def dedupAppend(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      batchOrder: String): DataFrame =
    existing.unionByName(newRowsOnly(existing, incoming, keys, batchOrder))

  /** The rows of `incoming` that survive K5 dedup: first-in-batch per
    * key (by `batchOrder`), minus keys already in `existing`. This is
    * the append-set for a physical write path (the table itself is
    * never rewritten — existing rows win by construction).
    */
  def newRowsOnly(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      batchOrder: String): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(batchOrder).asc)
    val dedupedBatch = incoming
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    dedupedBatch.join(existing, keys, "left_anti")
  }

  /** One row per key, LATEST by `orderCol` — the refresh-side twin of
    * [[newRowsOnly]]'s first-write-wins: an upsert wants the newest
    * revision in the batch to win. (The row_number()=1 filter is the
    * shape [[graft.plans.TopKRewrite]] plans as bounded-heap partial
    * top-k — no per-key sort.)
    */
  def lastRowPerKey(df: DataFrame, keys: Seq[String], orderCol: String)
      : DataFrame = {
    // Deterministic tiebreaker: a batch carrying two revisions of a
    // key with EQUAL orderCol must pick the same row on replay
    // (mergeUpsertSink's idempotence guarantee — round-5 advice), so
    // ties break on a content hash of the remaining columns rather
    // than arbitrary partition order.
    val others = df.columns
      .filterNot(c => keys.contains(c) || c == orderCol)
    val tiebreak =
      if (others.isEmpty) lit(0L) else xxhash64(others.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, tiebreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P9 — distinct values (export attribution footer,
    * ethical_crawler.py:1383–1388).
    */
  def distinctValues(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).distinct().resultSorted(col(c).asc)

  /** L3 — popular tags: the reference's only generator-shaped op
    * (stubbed at ethical_crawler.py:1065). `explode` is Spark's built-in
    * Generator; the downstream count is a plain hash agg.
    */
  def popularTags(df: DataFrame, tagsCol: Column, topK: Int): DataFrame =
    df.select(explode(tagsCol).as("tag"))
      .filter(col("tag") =!= "")
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("frequency"))
      .resultSorted(col("frequency").desc, col("tag").asc)
      .limit(topK)

  /** L4 — temporal activity histogram (stub at ethical_crawler.py:1066). */
  def temporalActivity(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .resultSorted(col("day").asc)

  /** L5 — license distribution (stub at ethical_crawler.py:1067). */
  def licenseDistribution(df: DataFrame, licenseCol: String): DataFrame =
    df.groupBy(col(licenseCol))
      .agg(count(lit(1)).as("cnt"))
      .resultSorted(col("cnt").desc, col(licenseCol).asc)

  /** AS-OF join (extension — the classic temporal operator Spark has
    * no built-in for): for each right-stream row, the latest
    * left-stream row of the same key at-or-before its timestamp.
    * Composed from built-ins via the union+window trick — one shuffle
    * on the key, NO range-condition join (a theta join on ts ranges
    * explodes quadratically in hot keys): tag both streams, order by
    * (ts, tiebreaker) per key, carry the left timestamp forward with
    * `last(_, ignoreNulls)`, keep right rows. Deterministic total
    * order within ties via the tiebreaker column.
    */
  def asOfJoin(events: DataFrame, keyCol: String, tsCol: String,
      tiebreaker: String, typeCol: String, leftType: String,
      rightType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tiebreaker).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col(typeCol).isin(leftType, rightType))
      .withColumn("__left_ts",
        when(col(typeCol) === leftType, col(tsCol)))
      .withColumn("asof_ts", last(col("__left_ts"), ignoreNulls = true)
        .over(w))
      .filter(col(typeCol) === rightType)
      .drop("__left_ts")
  }

  /** Hierarchical ROLLUP aggregate (grouping-sets extension beyond the
    * reference's flat GROUP BYs): per (k1,k2), per k1 subtotal, and
    * grand total in one pass — Spark expands the sets in a single
    * Expand + hash aggregate, no multi-scan. Null-marker columns are
    * made explicit via grouping() so the oracle compare is unambiguous.
    */
  def rollupCounts(df: DataFrame, k1: String, k2: String): DataFrame =
    df.rollup(col(k1), col(k2))
      .agg(count(lit(1)).as("cnt"),
        grouping(col(k1)).cast("int").as("g1"),
        grouping(col(k2)).cast("int").as("g2"))
      .select(
        coalesce(col(k1), lit("<all>")).as(k1),
        coalesce(col(k2), lit("<all>")).as(k2),
        col("g1"), col("g2"), col("cnt"))
      .orderBy(col("g1").asc, col("g2").asc, col(k1).asc, col(k2).asc)

  /** F4/F13 — JSON metadata extraction + aggregation (the reference's
    * `json.dumps`/`json.loads` boundary, ethical_crawler.py:928, :1022;
    * NYC `metadata.columns` :394). `get_json_object` stays a pushed
    * column expression — the JSON string column is scanned once, no
    * UDF.
    */
  def jsonExtractStats(df: DataFrame, keyCol: String, jsonCol: String,
      jsonPath: String): DataFrame = {
    val v = get_json_object(col(jsonCol), jsonPath).cast("int")
    df.select(col(keyCol), v.as("v"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("cnt"),
        round(avg(col("v")), 6).as("avg_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .resultSorted(col(keyCol).asc)
  }

  /** P7 — array-contains predicate (README.txt:222 `tags @>`), counted
    * per source. The array is derived (tokenized text) since the
    * testdata has no array column; the predicate shape is the point.
    */
  def arrayContainsCount(df: DataFrame, keyCol: String, textCol: String,
      needle: String): DataFrame =
    df.filter(array_contains(split(col(textCol), " "), needle))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .resultSorted(col(keyCol).asc)

  /** The `status` verb end-to-end (ethical_crawler.py:1416–1529):
    * two-key stats (A3) → per-key rollup (A6, folded into one Spark
    * agg) → join with the latest row per key (J1) — the reference does
    * the rollup in pandas and the join as a dict probe; here both fold
    * into the plan and AQE broadcasts the post-aggregate sides.
    */
  def statusRollup(df: DataFrame, keyCol: String, subCol: String,
      orderCol: String): DataFrame = {
    val rollup = df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_records"),
        countDistinct(col(subCol)).as("n_kinds"),
        max(col(orderCol)).as("last_seen"))
    val latest = latestPerKey(df, keyCol, orderCol, orderCol)
      .select(col(keyCol), col(subCol).as("latest_kind"))
    rollup.join(latest, Seq(keyCol))
      .resultSorted(col("n_records").desc, col(keyCol).asc)
  }

  /** Multimodal plumbing, relational half: treat content as an opaque
    * binary column with typed metadata (byte length, content hash).
    * The binary here is utf-8 encoded text (the container ships no
    * image/audio codecs); the schema/partitioning/aggregation shape is
    * what carries to real media bytes. See MultimodalOps for the
    * feature-extraction half.
    */
  def binaryMeta(df: DataFrame, idCol: String, textCol: String,
      keyCol: String): DataFrame =
    df.select(col(keyCol),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .resultSorted(col(keyCol).asc)
}
