package graft

import graft.ingest.{Adapter, ComplianceCheck, DataRecord, Pipeline}
import graft.operators.{ExportOps, FtsOps, ReferenceOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing client: the reference CLI's five verbs
  * (`setup`/`collect`/`search`/`analytics`/`status`/`export`,
  * ethical_crawler.py:1110–1533) over a catalog directory. A user of
  * the reference switches by pointing this at a table directory; each
  * verb composes the operator layer (ReferenceOps/ExportOps/FtsOps/
  * Pipeline) and returns DataFrames (render with [[Render.table]]).
  */
final class Graft(spark: SparkSession, tableDir: String) {

  private val pipeline = new Pipeline(spark, tableDir)

  def records: DataFrame = Catalog.load(spark, pipeline.recordsPath)

  /** `setup` — persist compliance checks for the given adapters
    * (ethical_crawler.py:1116–1154). Returns the checks run.
    */
  def setup(adapters: Seq[Adapter]): Seq[ComplianceCheck] = {
    val (_, checks) = pipeline.compliantAdapters(adapters)
    import spark.implicits._
    Catalog.append(checks.toDS().toDF(), pipeline.checksPath)
    checks
  }

  /** `collect` — gate, discover, dedup-append
    * (ethical_crawler.py:1157–1203). Returns new-record count.
    */
  def collect(adapters: Seq[Adapter]): Long =
    pipeline.collectAll(adapters)._1

  /** `search` — ILIKE disjunction over title/description/summary +
    * optional source/type equality filters + recency top-k
    * (ethical_crawler.py:1206–1270).
    */
  def search(query: Option[String], source: Option[String] = None,
      dataType: Option[String] = None, limit: Int = 10): DataFrame =
    ReferenceOps.search(records, query,
      textCols = Seq("title", "description", "content_summary"),
      equalityFilters =
        source.map("source_name" -> _).toMap ++
          dataType.map("data_type" -> _).toMap,
      orderCol = "ingested_at", tiebreakers = Seq("record_id"),
      limit = limit)

  private def ftsTable: String =
    f"graft_fts_${tableDir.hashCode & 0x7fffffff}%08x"

  /** Build (or refresh) the persisted FTS index for the records table
    * — pays the corpus scan once; [[searchFts]] then prunes to the
    * queried terms' buckets instead of re-scanning the corpus.
    */
  def indexFts(buckets: Int = 32): Unit =
    FtsOps.writeIndex(
      records.select(col("record_id"),
        concat_ws(" ", col("title"), col("description")).as("text")),
      "record_id", "text", ftsTable, s"$tableDir/fts_index", buckets)

  /** Full-text variant of search over the inverted index (L2 v2):
    * reads the persisted index when [[indexFts]] has built one, else
    * falls back to indexing on the fly.
    */
  def searchFts(terms: Seq[String], limit: Int = 10): DataFrame =
    if (spark.catalog.tableExists(ftsTable))
      FtsOps.searchIndexed(spark, ftsTable, "record_id", terms, limit)
    else FtsOps.searchDocs(
      records.select(col("record_id"),
        concat_ws(" ", col("title"), col("description")).as("text")),
      "record_id", "text", terms, limit)

  /** idf-weighted full-text search (tf·ln(N/df), OR semantics): the
    * ranked variant of [[searchFts]] — a term present in most records
    * carries idf ≈ 0, so rare-term matches outrank stop-token piles.
    * Reads the persisted index when one exists; the corpus count rides
    * in as a one-row relation.
    */
  def searchFtsRanked(terms: Seq[String], limit: Int = 10): DataFrame = {
    val nDocs = records.agg(count(lit(1)).as("n_docs"))
    if (spark.catalog.tableExists(ftsTable))
      FtsOps.searchRankedIndexed(spark, ftsTable, nDocs, "record_id",
        terms, limit)
    else FtsOps.searchRankedDocs(
      records.select(col("record_id"),
        concat_ws(" ", col("title"), col("description")).as("text")),
      "record_id", "text", terms, limit)
  }

  /** Continuous `collect` — the reference's dedup-append verb
    * (ethical_crawler.py:1157–1203) running as a stream: tail a
    * landing directory of DataRecord parquet drops and dedup-append
    * each micro-batch into the records table
    * ([[streaming.StreamingOps.dedupAppendSink]]). First write per
    * (source_name, record_id) wins — within a batch by `ingested_at`
    * — and a replayed batch appends nothing, so at-least-once file
    * delivery becomes exactly-once-per-key in the table.
    */
  def collectStream(landingDir: String, checkpointDir: String): Unit = {
    val schema =
      org.apache.spark.sql.Encoders.product[DataRecord].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(landingDir)
    streaming.StreamingOps.dedupAppendSink(stream, spark,
      pipeline.recordsPath, keys = Seq("source_name", "record_id"),
      batchOrder = "ingested_at", checkpointDir)
  }

  private def versionedPath: String = tableDir + "/records_versioned"

  /** `refresh` with HISTORY — the reference's upsert verb
    * (ethical_crawler.py:977–1005) onto the [[Versioned]] snapshot
    * layer instead of overwrite-swap: refreshed rows replace matched
    * keys, every refresh commits a time-travelable version, and
    * [[refreshHistory]]/[[recordsAsOf]] expose the audit trail the
    * plain table cannot keep. Returns the committed version.
    */
  def refreshVersioned(records: Seq[DataRecord]): Int = {
    import spark.implicits._
    val incoming = records.toDS().toDF()
    if (Versioned.currentVersion(spark, versionedPath).isEmpty)
      Versioned.init(incoming, versionedPath,
        partitionCols = Seq("source_name"))
    else
      Versioned.mergeUpsert(incoming, versionedPath,
        keys = Seq("source_name", "record_id"),
        partitionCols = Seq("source_name"))
  }

  /** Per-version row counts of the versioned records table. */
  def refreshHistory(): DataFrame =
    Versioned.history(spark, versionedPath)

  /** Time travel over refresh commits. */
  def recordsAsOf(version: Int): DataFrame =
    Versioned.snapshot(spark, versionedPath, version)

  /** Change feed between two refresh commits (insert/update/delete
    * rows, rewritten-unchanged suppressed) — what an incremental
    * downstream consumer tails instead of re-reading the table.
    */
  def refreshChanges(fromVersion: Int, toVersion: Int): DataFrame =
    Versioned.changes(spark, versionedPath, fromVersion, toVersion,
      keys = Seq("source_name", "record_id"))

  /** OPTIMIZE — bin-pack the small-file debris refresh commits leave
    * behind; content-identical new version (the maintenance verb every
    * CoW table needs between refreshes). Returns the committed (or
    * unchanged) version.
    */
  def optimizeVersioned(targetFileBytes: Long = 128L << 20): Int =
    Versioned.compact(spark, versionedPath, targetFileBytes,
      partitionCols = Seq("source_name"))

  /** RESTORE — roll the records table back to an earlier refresh
    * commit (bad upstream batch, operator error) as a new
    * metadata-only version; the rolled-back history stays
    * time-travelable. Returns the committed version.
    */
  def restoreVersioned(version: Int): Int =
    Versioned.restore(spark, versionedPath, version)

  /** `analytics` — per-source stats, type counts, and the three
    * reference-stubbed analytics (tags/temporal/license)
    * (ethical_crawler.py:1274–1349).
    */
  def analytics(): Map[String, DataFrame] = Map(
    "source_stats" -> ReferenceOps.sourceStats(records,
      key = "source_name", distinctCol = "data_type",
      avgCol = "size_bytes", spanCol = "ingested_at"),
    "type_counts" -> ReferenceOps.typeCounts(records, "data_type"),
    "popular_tags" -> ReferenceOps.popularTags(records, col("tags"), 20),
    "temporal_activity" ->
      ReferenceOps.temporalActivity(records, "ingested_at"),
    "license_distribution" ->
      ReferenceOps.licenseDistribution(records, "license_info"))

  /** [[analytics]] served from a parquet materialization under
    * `$tableDir/mv/` — rebuilt only when the records table has changed
    * since the last build ([[Mv.readFresh]]); an unchanged catalog
    * costs one file-listing, not a re-scan. The reference recomputes
    * every analytics block per CLI call (ethical_crawler.py:1274).
    */
  def analyticsMaterialized(name: String): DataFrame = {
    require(analytics().contains(name), s"unknown analytics view: $name")
    Mv.readFresh(spark,
      Mv.View(s"$tableDir/mv/$name", Seq(pipeline.recordsPath)),
      _ => analytics()(name))
  }

  /** `status` — two-key stats rolled up per source joined with the
    * latest compliance check (ethical_crawler.py:1416–1529).
    */
  def status(): DataFrame = {
    val stats = records
      .groupBy(col("source_name"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("data_type")).as("n_types"),
        max(col("ingested_at")).as("last_ingested"))
    val latestCheck = ReferenceOps.latestPerKey(
      Catalog.load(spark, pipeline.checksPath),
      key = "source_name", orderCol = "last_check",
      tiebreaker = "last_check")
      .select(col("source_name"), col("robots_txt_compliant"),
        col("api_key_valid"), col("last_check"))
    stats.join(latestCheck, Seq("source_name"), "left")
      .orderBy(col("n_records").desc, col("source_name").asc)
  }

  /** `export` — predicate + format + path, returns the attribution
    * footer frame (ethical_crawler.py:1352–1413).
    */
  def export(whereClause: Option[String], format: String, path: String)
      : DataFrame = {
    ExportOps.export(records, whereClause, format, path)
    ExportOps.attribution(records, "source_name", whereClause)
  }

  // ---- north-star surface over the catalog ----

  /** Exact content dedup of the records table on (title, description)
    * text — keep-first by record_id.
    */
  def dedupedRecords(): DataFrame = {
    val withText = records.withColumn("__content",
      concat_ws(" ", col("title"), col("description")))
    operators.DedupOps
      .exactDedup(withText, "__content", "record_id")
      .drop("__content")
  }

  /** Near-duplicate record pairs by banded MinHash over the
    * title+description text, exact-verified at `minJaccard`.
    */
  def nearDuplicates(minJaccard: Double = 0.8): DataFrame =
    operators.DedupOps.minhashPairs(
      records.withColumn("__content",
        concat_ws(" ", col("title"), col("description"))),
      "record_id", "__content", minJaccard)

  /** Near-dup pairs resolved to canonical clusters: every record in a
    * duplicate cluster labeled with the cluster's minimum record_id —
    * keep rows where doc equals cluster id, drop the rest.
    */
  def duplicateClusters(minJaccard: Double = 0.8): DataFrame =
    operators.DedupOps.dupClusters(nearDuplicates(minJaccard))

  /** Decontaminate the catalog against a benchmark frame
    * (`idCol`, `textCol`): catalog records sharing at least
    * `minShared` word trigrams with a benchmark doc, via the banded
    * scale path ([[operators.DedupOps.crossCorpusOverlapBanded]]).
    */
  def decontaminate(benchmark: DataFrame, idCol: String,
      textCol: String, minShared: Int = 3): DataFrame =
    operators.DedupOps.crossCorpusOverlapBanded(
      benchmark.select(col(idCol).cast("string").as("record_id"),
        col(textCol).as("__content")),
      records.withColumn("__content",
        concat_ws(" ", col("title"), col("description")))
        .select(col("record_id"), col("__content")),
      "record_id", "__content", minShared)

  /** One-row profile of the records table (row/distinct/null counts,
    * size min/max, ingest time span) — the snapshot "describe" a
    * pipeline stores next to every export.
    */
  def profile(): DataFrame =
    operators.AnalyticsOps.profile(records,
      distinctCols = Seq("source_name", "data_type"),
      numericCol = "size_bytes", tsCol = "ingested_at")

  /** Deterministic (reproducible) sample of the records table:
    * md5-hash membership at `ratePerMille`, independent of partition
    * layout and run order.
    */
  def sample(ratePerMille: Int): DataFrame =
    operators.AnalyticsOps.sampledRows(records, "record_id", ratePerMille)

  /** Redaction audit per source: rows whose title+description change
    * under email/digit scrubbing, and distinct scrubbed payloads.
    */
  def redactionAudit(): DataFrame =
    operators.AnalyticsOps.redactionStats(
      records.withColumn("__payload",
        concat_ws(" ", col("title"), col("description"))),
      "source_name", "__payload")

  /** Backfill the `embedding` column the reference declares and never
    * writes (ethical_crawler.py:842): a deterministic 16-dim
    * byte-histogram feature of title+description via the multimodal
    * extractor's decode stand-in ([[operators.MultimodalOps.decodeStub]]
    * — a real text encoder replaces only that function; the
    * mapPartitions batch shape, per-partition init point and
    * write-temp-then-swap rewrite stay). Returns the rows embedded;
    * [[similar]] is live afterwards.
    */
  def backfillEmbeddings(): Long = {
    import spark.implicits._
    val filled = pipeline.records.mapPartitions { it =>
      // per-partition encoder init would go here (model load)
      it.map { r =>
        val payload = (r.title + " " + r.description.getOrElse(""))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        r.copy(embedding =
          Some(operators.MultimodalOps.decodeStub(payload).toSeq))
      }
    }.toDF().cache()
    val n = filled.count() // materialize before touching source files
    val tmp = pipeline.recordsPath + "__embed_tmp"
    Catalog.overwritePartitioned(filled, tmp, Seq("source_name"))
    filled.unpersist()
    Catalog.replace(spark, tmp, pipeline.recordsPath)
    n
  }

  /** Top-k records most similar to `recordId` by embedding cosine
    * (records whose embedding is null are skipped). Empty until
    * [[backfillEmbeddings]] populates the column (the reference
    * declares it and never writes it — ethical_crawler.py:842).
    */
  def similar(recordId: String, k: Int = 10): DataFrame = {
    val emb = records.filter(col("embedding").isNotNull)
      .select(col("record_id"),
        functions.VectorFunctions.toDoubleArray(col("embedding"))
          .as("v"))
    val q = emb.filter(col("record_id") === recordId)
      .select(col("v").as("qv"))
    emb.filter(col("record_id") =!= recordId)
      .crossJoin(broadcast(q))
      .select(col("record_id"),
        round(functions.VectorFunctions.cosine(col("v"), col("qv")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("record_id").asc)
      .limit(k)
  }
}
