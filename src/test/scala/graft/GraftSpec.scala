package graft

import graft.ingest._
import java.time.{Clock, Instant, ZoneOffset}

/** End-to-end verb tests: the reference CLI surface over a fresh
  * catalog dir using offline fixture adapters (SURVEY §5.2(4) golden
  * pipeline shape).
  */
class GraftSpec extends SparkSpec {

  val clock: Clock =
    Clock.fixed(Instant.parse("2026-01-01T00:00:00Z"), ZoneOffset.UTC)

  def nycFixture(items: String*): NycOpenDataAdapter = {
    val base = "https://data.cityofnewyork.us"
    new NycOpenDataAdapter(new FixtureFetcher(Map(
      s"$base/robots.txt" -> (404, ""),
      s"$base/api/views/metadata/v1?limit=5000&offset=0" ->
        (200, items.mkString("[", ",", "]")))), None, clock)
  }

  def item(id: String, name: String, views: Int): String =
    s"""{"id": "$id", "name": "$name", "description": "about $name",
       |"category": "Transport", "tags": ["traffic"],
       |"viewCount": $views, "rowsUpdatedAt": "1718000000"}""".stripMargin

  test("collect → search → analytics → status → export, end to end") {
    val g = new Graft(spark, tmpDir("graft"))
    val ad = nycFixture(
      item("aa-1", "Traffic Volume", 10),
      item("bb-2", "Bike Counts", 20),
      item("aa-1", "Traffic Volume DUP", 30)) // dup key in batch

    // setup: compliance audit persisted
    val checks = g.setup(Seq(ad))
    assert(checks.size == 1 && checks.head.issues.isEmpty)

    // collect: first write wins on the duplicate
    assert(g.collect(Seq(ad)) == 2)
    assert(g.records.count() == 2)

    // search: ilike over title, recency order
    val hits = g.search(Some("traffic"), limit = 10).collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("record_id") == "aa-1")
    assert(hits.head.getAs[String]("title") == "Traffic Volume")
    // empty query = all records
    assert(g.search(None, limit = 10).count() == 2)
    // equality filter narrows
    assert(g.search(None, dataType = Some("dataset")).count() == 2)
    assert(g.search(None, source = Some("nope")).count() == 0)

    // fts search over the records' own text
    val fts = g.searchFts(Seq("bike"), 5).collect()
    assert(fts.length == 1 && fts.head.getString(0) == "bb-2")

    // analytics: all five frames materialize
    val a = g.analytics()
    assert(a("source_stats").count() == 1)
    assert(a("type_counts").head.getLong(1) == 2L)
    assert(a("popular_tags").head.getString(0) == "traffic")
    assert(a("temporal_activity").count() == 1)
    assert(a("license_distribution").count() == 1)

    // status: rollup joined with latest compliance
    val st = g.status().collect()
    assert(st.length == 1)
    assert(st.head.getAs[Long]("n_records") == 2L)
    assert(st.head.getAs[Boolean]("robots_txt_compliant"))

    // export: parquet + attribution footer
    val out = tmpDir("graft") + "/export"
    val att = g.export(Some("data_type = 'dataset'"), "parquet", out)
      .collect()
    assert(att.map(_.getString(0)).toSeq == Seq("NYC Open Data"))
    assert(spark.read.parquet(out).count() == 2)

    // collect again: idempotent
    assert(g.collect(Seq(ad)) == 0)

    // north-star surface: dedup over the catalog's own text
    assert(g.dedupedRecords().count() == 2) // titles differ → no dups
    assert(g.nearDuplicates(0.8).count() == 0)
    // similar(): no embeddings backfilled yet → empty, not an error
    assert(g.similar("aa-1", 5).count() == 0)

    // embedding backfill lights up similar(): both records share the
    // vocabulary ("about ..."), so cosine is high but < 1
    assert(g.backfillEmbeddings() == 2L)
    val sim = g.similar("aa-1", 5).collect()
    assert(sim.length == 1)
    assert(sim.head.getString(0) == "bb-2")
    val score = sim.head.getDouble(1)
    assert(score > 0.5 && score <= 1.0, s"unexpected cosine $score")
    // backfill is idempotent and keeps every row
    assert(g.backfillEmbeddings() == 2L)
    assert(g.records.count() == 2)

    // persisted FTS index returns the same hits as the on-the-fly path
    g.indexFts(buckets = 8)
    val ftsIdx = g.searchFts(Seq("bike"), 5).collect()
    assert(ftsIdx.length == 1 && ftsIdx.head.getString(0) == "bb-2")

    // no dup clusters in a dup-free catalog — empty, not an error
    assert(g.duplicateClusters().count() == 0)

    // decontamination: a benchmark doc duplicating bb-2's text is
    // flagged against the catalog; an unrelated one is not
    import spark.implicits._
    val bench = Seq(
      (1L, "Bike Counts about Bike Counts"),
      (2L, "totally unrelated benchmark prompt here"))
      .toDF("bench_id", "text")
    val contaminated = g.decontaminate(bench, "bench_id", "text")
      .collect()
    assert(contaminated.length == 1)
    assert(contaminated.head.getString(0) == "1")
    assert(contaminated.head.getString(1) == "bb-2")

    // analytics surface: profile / deterministic sample / redaction
    val prof = g.profile().head
    assert(prof.getAs[Long]("n_rows") == 2L)
    assert(prof.getAs[Long]("n_source_name") == 1L)
    assert(g.sample(1000).count() == 2) // full rate keeps everything
    assert(g.sample(0).count() == 0)
    val red = g.redactionAudit().head
    assert(red.getAs[Long]("n_rows") == 2L)
  }

  test("collectStream: continuous dedup-append collect, idempotent replays") {
    import spark.implicits._
    val dir = tmpDir("graftstream")
    val g = new Graft(spark, dir + "/catalog")
    def rec(id: String, title: String, atMillis: Long): DataRecord =
      DataRecord("Streamed Source", id, title, Some(s"about $title"),
        "dataset", s"https://example.org/$id", "{}", None,
        Seq("stream"), None, new java.sql.Timestamp(atMillis),
        None, Some(1L), Some("public"))
    // two landing drops; rec "a" appears in both (and twice in the
    // first — the EARLIER ingested_at copy must win within the batch)
    Seq(rec("a", "First Title", 1000L), rec("a", "Later Copy", 2000L),
        rec("b", "Second", 1500L))
      .toDS.toDF.coalesce(1).write.parquet(dir + "/landing/b0")
    Seq(rec("a", "Replayed Copy", 3000L), rec("c", "Third", 2500L))
      .toDS.toDF.coalesce(1).write.parquet(dir + "/landing/b1")

    g.collectStream(dir + "/landing/*", dir + "/cp0")
    val got = g.records.select("record_id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "First Title", "b" -> "Second",
      "c" -> "Third"), s"first write per key must win, got $got")

    // fresh checkpoint = every batch reprocessed; table must not grow
    g.collectStream(dir + "/landing/*", dir + "/cp1")
    assert(g.records.count() == 3)

    // idf ranking over the streamed catalog: every title shares
    // "title"? no — "about <title>" descriptions share "about", so
    // querying a ubiquitous term + a rare one ranks the rare-term
    // record first regardless of the common term's tf pile
    val ranked = g.searchFtsRanked(Seq("about", "second"), 5).collect()
    assert(ranked.nonEmpty && ranked.head.getString(0) == "b",
      s"rare-term record must rank first, got ${ranked.toSeq}")
  }

  test("refreshVersioned: upsert commits versions, time travel audits") {
    val dir = tmpDir("graftversioned")
    val g = new Graft(spark, dir + "/catalog")
    def rec(id: String, title: String): ingest.DataRecord =
      ingest.DataRecord("Src", id, title, Some(s"about $title"),
        "dataset", s"https://example.org/$id", "{}", None,
        Seq("v"), None, new java.sql.Timestamp(1000L),
        None, Some(1L), Some("public"))
    assert(g.refreshVersioned(Seq(rec("a", "A v1"), rec("b", "B v1"))) == 0)
    assert(g.refreshVersioned(Seq(rec("a", "A v2"), rec("c", "C v1"))) == 1)
    val now = g.recordsAsOf(1).select("record_id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(now == Map("a" -> "A v2", "b" -> "B v1", "c" -> "C v1"))
    // the pre-refresh state stays readable — the audit trail the
    // overwrite-swap upsert cannot keep
    val before = g.recordsAsOf(0).select("record_id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(before == Map("a" -> "A v1", "b" -> "B v1"))
    val hist = g.refreshHistory().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hist == Seq((0, 2L), (1, 3L)))
    // partition layout survives versioning (source_name at rest)
    assert(new java.io.File(dir +
      "/catalog/records_versioned/v=1/source_name=Src").exists())
    // change feed between the refreshes: a updated, c inserted, b
    // carried (suppressed as a physical rewrite at most)
    val feed = g.refreshChanges(0, 1)
      .select("record_id", "change_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(feed == Map("a" -> "update", "c" -> "insert"))
    // OPTIMIZE: content-identical commit, prior versions intact
    val v2 = g.optimizeVersioned()
    assert(v2 >= 1)
    val after = g.recordsAsOf(v2).select("record_id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after == now)
    assert(g.recordsAsOf(0).count() == 2L)
    // RESTORE: roll back the bad refresh; history keeps everything
    val v3 = g.restoreVersioned(0)
    assert(v3 == v2 + 1)
    val cur = g.recordsAsOf(v3).select("record_id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cur == before)
    assert(g.recordsAsOf(1).count() == 3L) // rolled-back v1 travels
  }
}
