package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps
import graft.RegistryFixtures._

/** Query registry — the retrieval tier: full-text search family (l, served from
  * the persisted index), multimodal columns (m), web/graph crawl
  * analytics (h).
  *
  * Split out of SparkEntry (round-10 verdict item 7); entries and
  * oracle twins are verbatim, SparkEntry concatenates the families.
  */
object QueriesSearch {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l3_popular_tags" -> ((s, dir) =>
      ReferenceOps.popularTags(Tables.documents(s, dir),
        split(col("text"), " "), topK = 50)),

    "l4_temporal_activity" -> ((s, dir) =>
      ReferenceOps.temporalActivity(Tables.events(s, dir), "ts")),

    "l5_license_distribution" -> ((s, dir) =>
      ReferenceOps.licenseDistribution(Tables.documents(s, dir), "lang")),

    // h1: HTML→text extraction — each doc rendered as a deterministic
    // page (entity-laden title, nav, heading, body, script with raw
    // </> operators, style, footer), then tag-stripped / entity-
    // decoded back out; title+heading extracted as blocks, body
    // pinned by length/token-count/md5 (c11's manifest convention).
    // All render+extract constants are shared with the oracle builder.
    "h1_html_extract" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val rendered = docs.select(col("doc_id"),
        graft.operators.HtmlOps.renderHtml.as("html"))
      graft.operators.HtmlOps.htmlExtract(rendered, "doc_id", "html")
    }),

    // h2: extraction COMPOSED with the t13 boilerplate pass — the
    // rendered nav/footer/entity-paragraph boilerplate must surface
    // as hot shingles in the extracted text, per source (proves the
    // HTML tier feeds the existing pipeline unchanged).
    "h2_html_boilerplate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ext = docs.select(col("doc_id"), col("source"),
        graft.operators.HtmlOps.htmlToText(
          graft.operators.HtmlOps.renderHtml).as("text"))
      TextOps.boilerplate(ext, "doc_id", "source", "text",
        relDf = 0.003, flagRatio = 0.2)
    }),

    // h3: link harvest — every href extracted in-scan, per-source
    // totals/distinct-targets/min; the crawl-frontier feed (the
    // per-doc self link grows distinct targets with the corpus, the
    // nav targets stay shared).
    "h3_link_harvest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val rendered = docs.select(col("source"),
        graft.operators.HtmlOps.renderHtml.as("html"))
      graft.operators.HtmlOps.linkReport(rendered, "html", "source")
    }),

    // h4: the web-corpus FRONT DOOR as one plan (c12's composition
    // pattern): PII-laden pages → extract → scrub → boilerplate-drop
    // → per-source release report. Composing the stages adds zero
    // exchanges over t13 alone (extract+scrub fuse into the scan).
    "h4_web_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val piiDocs = docs.select(col("doc_id"), col("source"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          when(col("doc_id") % 2 === 0, lit(" call 555-123-4567"))
            .otherwise(lit(""))).as("text"))
      graft.operators.HtmlOps.webPipeline(piiDocs, "doc_id", "source",
        relDf = 0.003, flagRatio = 0.45)
    }),

    // h5: crawl frontier — harvested targets (query/fragment
    // stripped to page identity) anti-joined against the crawled
    // catalog, per-host politeness rollup; closes the crawler loop
    // h3 feeds (the mirror host's frontier grows with the corpus,
    // the nav targets stay the bounded shared set).
    "h5_frontier" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val rendered = docs.select(col("doc_id"),
        graft.operators.HtmlOps.renderHtml.as("html"))
      graft.operators.HtmlOps.frontier(rendered, "doc_id", "html")
    }),

    // h6: crawl PRIORITIZATION — fixed-point PageRank (exact integer
    // micro-grid, so an 8-round iterative double-sum is hash-gateable
    // across engines) over the harvested page graph + the catalog's
    // category tree; ranks feed the h5 frontier's fetch order. Top-20
    // via TakeOrderedAndProject.
    "h6_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(pageGraph(s, dir), iters = 6, k = 20)),

    // h6c: CONVERGENCE-DRIVEN PageRank (round-10 verdict item 5) —
    // the round count is decided by the DATA: iterate in blocks of 8
    // until the integer-grid rank vector reaches a bit-exact fixed
    // point (max per-node delta == 0; the probe is the convergence
    // certificate), capped at 48. Post-fixed-point rounds are the
    // identity, so the early-exited result equals the 48-round
    // unrolled oracle verbatim — a data-derived stopping rule that
    // is still hash-gateable. (Observed: every scale converges at
    // 32 rounds; GraphSpec asserts the certificate.) Block size 4:
    // the per-block cost that matters on this graph is Catalyst's
    // construction-time ANALYSIS of the chained-round tree
    // (superlinear in depth — every Dataset op re-analyzes the
    // accumulated block; measured same-window 5.5 s at depth 16,
    // 2.8 s at 8, 1.9 s at 4; a per-round lazy localCheckpoint was
    // tried and is ~1.7× SLOWER — see pageRankConverged's scaladoc),
    // while the extra convergence probes a shorter block buys are
    // one cheap job each; the result is block-size independent
    // (integer fixed point + idempotent tail, GraphSpec-proven).
    "h6c_pagerank_converged" -> ((s, dir) =>
      GraphOps.pageRankConverged(pageGraph(s, dir), maxIters = 48,
        k = 20, blockIters = 4)._1),

    // h7: FOCUSED-crawl prioritization — personalized PageRank with
    // the teleport mass pinned to three seed pages (a plan-time
    // IN-list, zero extra joins); rank = importance relative to the
    // seeds, so off-topic branches decay to 0 and drop out of the
    // fetch budget. Same integer micro-grid walk as h6.
    "h7_seeded_rank" -> ((s, dir) =>
      GraphOps.personalizedPageRank(pageGraph(s, dir),
        seeds = SeedPages, iters = 6, k = 20)),

    // h8: HITS hubs & authorities — the complementary crawl-value
    // axis (hubs = pages worth harvesting links FROM; authorities =
    // pages worth fetching FIRST). Integer grid, max-rescale per
    // half-round folded in as a 1-row broadcast.
    "h8_hits" -> ((s, dir) =>
      GraphOps.hits(pageGraph(s, dir), iters = 4, k = 20)),

    "m1_binary_meta" -> ((s, dir) =>
      ReferenceOps.binaryMeta(Tables.documents(s, dir),
        "doc_id", "text", "source")),


    // ---- L2 v2: tokenized inverted-index full-text search ----
    // The whole family runs SERVED (round-10 verdict item 3): the
    // corpus is indexed ONCE into persisted bucketBy(token) tables
    // (servedFts fixture — the one-time indexing cost a deployment
    // pays per corpus version) and each query reads only its terms'
    // buckets. The inline rebuild-per-query twins remain in FtsOps
    // (they ARE the oracle semantics) and FtsRenderSpec pins
    // served ≡ inline per member.
    "l2_fts_search" -> ((s, dir) =>
      FtsOps.searchIndexed(s, servedFts(s, dir).postings, "doc_id",
        terms = Seq("spark", "window"), k = 50)),

    // idf ranking: 'batch' appears in ~80% of docs (idf ≈ 0.22) while
    // 'dup' is rare (idf ≈ 3.0) — the ranked result puts rare-term
    // docs first where raw-tf ranking would reward stop-token piles.
    "l6_fts_ranked" -> ((s, dir) =>
      FtsOps.servedRanked(s, servedFts(s, dir), "doc_id",
        terms = Seq("batch", "dup"), k = 50)),

    // l7: BM25 — tf saturation + length normalization on top of l6's
    // idf (the three-tier ranking ladder: raw tf → tf·idf → BM25).
    "l7_fts_bm25" -> ((s, dir) =>
      FtsOps.servedBm25(s, servedFts(s, dir), "doc_id",
        terms = Seq("batch", "dup"), k = 50)),

    // l15: BM25F — field-weighted ranking (title = first 3 tokens,
    // n31's convention; weight 2×): fields fold into ONE weighted
    // pseudo-tf BEFORE saturation (the thing that distinguishes
    // BM25F from summing per-field BM25 scores).
    "l15_bm25f" -> ((s, dir) =>
      FtsOps.servedBm25F(s, servedFts(s, dir), "doc_id",
        terms = Seq("batch", "dup"), k = 50)),


    // l13: QUERY EXPANSION (pseudo-relevance feedback, RM3-lite) —
    // seed tf·idf search → top-10 feedback docs → 3 strongest
    // non-seed/non-stop terms join the query → expanded OR search.
    // A doc with zero seed terms can rank via the expansion — the
    // recall lever ranking alone can't pull.
    "l13_query_expansion" -> ((s, dir) =>
      FtsOps.servedQueryExpansion(s, servedFts(s, dir), "doc_id",
        seedTerms = Seq("merge", "dup"), kFb = 10, nExp = 3,
        k = 50)),

    // l14: "did you mean" — the typo'd query ('wimdow') is corrected
    // against the corpus vocabulary via SymSpell deletion keys
    // (query-side keys are a plan-time IN-list over the persisted
    // spell-key index), then the corrected term searches via a
    // broadcast postings prune.
    "l14_spell_search" -> ((s, dir) =>
      FtsOps.servedSpellSearch(s, servedFts(s, dir), "doc_id",
        query = "wimdow", k = 50)),

    // l11: TWO-STAGE RERANK — BM25 recall set exactly re-scored by
    // dense cosine, restricted to the candidates (dense cost O(n·dim)
    // at any corpus size); the serving path l9's rank fusion doesn't
    // cover.
    "l11_rerank" -> ((s, dir) =>
      FtsOps.rerankDense(Tables.documents(s, dir),
        Tables.embeddings(s, dir), "doc_id", "text",
        terms = Seq("batch", "dup"), queryId = 0L, n = 50, k = 10)),

    // l9: HYBRID retrieval — BM25 lexical candidates fused with dense
    // cosine candidates by reciprocal-rank fusion (rank-based, no
    // cross-tower score calibration needed).
    "l9_hybrid_rrf" -> ((s, dir) =>
      FtsOps.hybridRrf(Tables.documents(s, dir),
        Tables.embeddings(s, dir), "doc_id", "text",
        terms = Seq("batch", "dup"), queryId = 0L, n = 50, k = 10)),

    // l8: BATCH BM25 serving — the FTS analogue of n10's batch IVF:
    // one shared plan answers the whole query set; per-query top-k
    // through the TopKPerKey rank-filter rewrite.
    "l8_fts_batch" -> ((s, dir) =>
      FtsOps.searchBm25Batch(Tables.documents(s, dir), "doc_id",
        "text", BatchFtsQueries, k = 10)),

    // l10: PHRASE search over positional postings — term adjacency via
    // the pruned postings self-join (pos_b = pos_a + 1); the FTS
    // feature the bag-of-words ladder can't express.
    "l10_phrase_search" -> ((s, dir) =>
      FtsOps.phraseSearch(Tables.documents(s, dir), "doc_id", "text",
        first = "fast", second = "merge")),

    // l12: SNIPPET extraction — the ±4-token window around the first
    // occurrence; text never shuffles (hash witness).
    "l12_snippets" -> ((s, dir) =>
      FtsOps.snippets(Tables.documents(s, dir), "doc_id", "text",
        term = "merge", radius = 4)),


    // ---- multimodal decode→extract→rollup (integer-exact) ----
    // m2 runs a REAL codec: image payloads are genuine PNGs (JDK
    // ImageIO encode), the histogram is computed over ImageIO-DECODED
    // pixel samples. Grayscale PNG is lossless, so the char-class
    // oracle still replays the pixel content exactly.
    "m2_media_histogram" -> ((s, dir) => {
      val assets = MultimodalOps.assetsWithPngImages(s,
        Tables.documents(s, dir))
      MultimodalOps.histogramStats(
        MultimodalOps.extractCountsDecoded(assets))
    }),

    // m3 runs the REAL video path (round-9): payloads are genuine
    // RIFF/AVI containers with PNG frames, the sampler walks the
    // container and ImageIO-decodes every kept frame — row-identical
    // to the raw-byte slicer, so the oracle replays the pipeline
    // through the container and codec.
    "m3_frame_sample" -> ((s, dir) => {
      val assets = MultimodalOps.assetsWithPngImages(s,
        Tables.documents(s, dir))
      MultimodalOps.frameStats(
        MultimodalOps.sampleFramesDecoded(assets,
          stride = MultimodalOps.VideoStride))
    }),

    // m5: MULTIMODAL packing — combined text-token + ViT-patch cost
    // through the c5 pack window; payload bytes never leave the scan.
    "m5_mm_pack" -> ((s, dir) =>
      MultimodalOps.multimodalPack(Tables.documents(s, dir),
        idCol = "doc_id", groupCol = "source", textCol = "text",
        patchBytes = 64, budgetTokens = 8192)),

    "m4_asset_dedup" -> ((s, dir) =>
      MultimodalOps.assetDedupReport(
        MultimodalOps.assetsFromDocuments(s, Tables.documents(s, dir)))))

  def oracleSql: Map[String, String] = Map(
    // video kind ⇔ doc_id % 3 = 2 (assetsFromDocuments); stride 100:
    // greatest(1, len // 100) frames, tail bytes beyond the last full
    // frame are dropped unless the doc is shorter than one stride
    // m5: integer ceil for the patch cost, the c5 cum/floor pack.
    "m5_mm_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' '))::BIGINT
        |      + (octet_length(encode(text)) + 63) // 64 AS cost
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, cost,
        |    sum(cost) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, floor((cum - cost) / 8192.0)::BIGINT AS shard_id,
        |  count(*) AS n_examples, sum(cost)::BIGINT AS shard_cost
        |FROM c GROUP BY source, shard_id
        |ORDER BY source ASC, shard_id ASC""".stripMargin,

    "m3_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, greatest(1, len // 100) AS n_frames,
        |    least(len, greatest(1, len // 100) * 100) AS covered
        |  FROM v)
        |SELECT count(*) AS n_videos,
        |  sum(n_frames)::BIGINT AS total_frames,
        |  sum(covered)::BIGINT AS total_frame_bytes
        |FROM f""".stripMargin,

    // m4: kind cycles as in assetsFromDocuments (1-based list index);
    // md5 of the utf-8 payload == Spark's md5 over the binary column.
    "m4_asset_dedup" ->
      """WITH a AS (
        |  SELECT (['image','audio','video'])[(doc_id % 3 + 1)::INT]
        |      AS kind,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT kind, count(*) AS n_assets,
        |  count(DISTINCT h) AS n_distinct,
        |  (count(*) - count(DISTINCT h))::BIGINT AS n_dup
        |FROM a GROUP BY kind ORDER BY kind ASC""".stripMargin,

    // h1/h2: both sides derive from HtmlOps' shared template/pattern
    // constants — the oracle re-renders and re-extracts with the
    // byte-identical regex chain ('g'-flagged for DuckDB).
    "h1_html_extract" ->
      graft.operators.HtmlOps.htmlExtractSql("documents", "doc_id"),

    "h2_html_boilerplate" ->
      graft.operators.HtmlOps.htmlBoilerplateSql("documents", "doc_id"),

    "h3_link_harvest" ->
      graft.operators.HtmlOps.linkReportSql("documents", "doc_id"),

    "h5_frontier" ->
      graft.operators.HtmlOps.frontierSql("documents", "doc_id"),

    "h6_pagerank" -> GraphOps.pageRankSql(
      graft.operators.HtmlOps.pageEdgesSql("documents", "doc_id"),
      iters = 6, k = 20),

    // h6c: the 48-round unroll adjudicates the convergence-driven
    // run — rounds past the fixed point are the identity, so the
    // equality holds wherever the data makes the exit fire.
    "h6c_pagerank_converged" -> GraphOps.pageRankSql(
      graft.operators.HtmlOps.pageEdgesSql("documents", "doc_id"),
      iters = 48, k = 20),

    "h7_seeded_rank" -> GraphOps.personalizedPageRankSql(
      graft.operators.HtmlOps.pageEdgesSql("documents", "doc_id"),
      seeds = SeedPages, iters = 6, k = 20),

    "h8_hits" -> GraphOps.hitsSql(
      graft.operators.HtmlOps.pageEdgesSql("documents", "doc_id"),
      iters = 4, k = 20),

    "h4_web_pipeline" -> graft.operators.HtmlOps.webPipelineSql(
      """SELECT doc_id, source, text || ' contact user' || doc_id ||
        |  '@example.com' ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' call 555-123-4567'
        |       ELSE '' END AS text
        |FROM documents""".stripMargin,
      "doc_id", relDf = 0.003, flagRatio = 0.45),

    // l10: phrase adjacency via DuckDB's aligned multi-unnest of the
    // two shifted slices + a 1-based position range.
    "l10_phrase_search" ->
      graft.operators.FtsOps.phraseSearchSql(
        "documents", "doc_id", "text", "fast", "merge"),

    "m1_binary_meta" ->
      """SELECT source, count(*) AS n_assets,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  min(octet_length(encode(text))) AS min_bytes,
        |  max(octet_length(encode(text))) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin,

    "l2_fts_search" ->
      operators.FtsOps.searchDocsSql("documents", "doc_id", "text",
        Seq("spark", "window"), 50),

    "l6_fts_ranked" ->
      operators.FtsOps.searchRankedDocsSql("documents", "doc_id",
        "text", Seq("batch", "dup"), 50),

    "l15_bm25f" ->
      operators.FtsOps.searchBm25FSql("documents", "doc_id", "text",
        terms = Seq("batch", "dup"), k = 50),

    "l7_fts_bm25" ->
      operators.FtsOps.searchBm25DocsSql("documents", "doc_id",
        "text", Seq("batch", "dup"), 50),

    "l13_query_expansion" ->
      operators.FtsOps.queryExpansionSql("documents", "doc_id",
        "text", seedTerms = Seq("merge", "dup"), kFb = 10, nExp = 3,
        k = 50),

    "l14_spell_search" ->
      operators.FtsOps.spellCorrectedSearchSql("documents", "doc_id",
        "text", query = "wimdow", k = 50),

    "l8_fts_batch" ->
      operators.FtsOps.searchBm25BatchSql("documents", "doc_id",
        "text", BatchFtsQueries, 10),

    // l9: the two towers' own SQL (BM25 CTEs + the n1 cosine CTEs),
    // l11: the BM25 CTE feeding the n1 cosine form restricted to the
    // candidate ids.
    "l11_rerank" ->
      operators.FtsOps.rerankDenseSql("documents", "embeddings",
        "doc_id", "text", terms = Seq("batch", "dup"), queryId = 0L,
        n = 50, k = 10),

    // ranked with the same (score DESC, id ASC) total order, fused
    // by 1/(60+rank) in the same two-term order.
    "l9_hybrid_rrf" ->
      """WITH idx AS (
        |  SELECT token, doc_id, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' '))
        |      AS token
        |    FROM documents)
        |  WHERE token <> '' GROUP BY token, doc_id),
        |lens AS (SELECT doc_id,
        |    len(string_split(lower(text), ' '))::DOUBLE AS len
        |  FROM documents),
        |pl AS (SELECT * FROM idx WHERE token IN ('batch', 'dup')),
        |dfs AS (SELECT token, count(*) AS df FROM pl GROUP BY token),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len) AS avgdl
        |  FROM lens),
        |tscored AS (
        |  SELECT doc_id,
        |    round(sum(ln(n_docs / df) * (tf * (1.2 + 1)) /
        |      (tf + 1.2 * ((1 - 0.75) + 0.75 * len / avgdl))), 6)
        |      AS score
        |  FROM pl JOIN dfs USING (token) JOIN lens USING (doc_id)
        |    CROSS JOIN stats
        |  GROUP BY doc_id),
        |tt AS (
        |  SELECT doc_id, rank_t FROM (
        |    SELECT doc_id, row_number() OVER (
        |      ORDER BY score DESC, doc_id ASC) AS rank_t
        |    FROM tscored) WHERE rank_t <= 50),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |vscored AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_dot_product(v, qv) /
        |      (sqrt(list_dot_product(v, v)) *
        |       sqrt(list_dot_product(qv, qv))), 6) AS score
        |  FROM e, q WHERE vec_id <> 0),
        |vv AS (
        |  SELECT doc_id, rank_v FROM (
        |    SELECT doc_id, row_number() OVER (
        |      ORDER BY score DESC, doc_id ASC) AS rank_v
        |    FROM vscored) WHERE rank_v <= 50)
        |SELECT coalesce(tt.doc_id, vv.doc_id) AS doc_id,
        |  round(coalesce(1.0 / (60 + rank_t), 0.0)
        |      + coalesce(1.0 / (60 + rank_v), 0.0), 6) AS rrf
        |FROM tt FULL OUTER JOIN vv ON tt.doc_id = vv.doc_id
        |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,

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

    // l12: list_position + inclusive list slice.
    "l12_snippets" ->
      operators.FtsOps.snippetsSql("documents", "doc_id", "text",
        term = "merge", radius = 4),

    // text is pure ASCII (verified) → byte bins ≡ char-class counts
    "m2_media_histogram" ->
      """WITH a AS (
        |  SELECT CASE (doc_id % 3) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    text
        |  FROM documents)
        |SELECT kind, count(*) AS n_assets,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  sum(len(regexp_extract_all(text, '[ -/]')))::BIGINT
        |    AS bin_punct,
        |  sum(len(regexp_extract_all(text, '[0-?]')))::BIGINT
        |    AS bin_digit,
        |  sum(len(regexp_extract_all(text, '[`-o]')))::BIGINT
        |    AS bin_alpha_lo,
        |  sum(len(regexp_extract_all(text, '[p-\x7F]')))::BIGINT
        |    AS bin_alpha_hi
        |FROM a GROUP BY kind ORDER BY kind ASC""".stripMargin)
}
