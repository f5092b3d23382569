package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the markup-stripping pass a web-corpus
  * pipeline runs before any dedup / quality-gate / tokenize stage.
  * The reference imports BeautifulSoup and never calls it
  * (ethical_crawler.py:30, the last unrealized dead-import intent);
  * this tier realizes it Spark-first: tag-strip, script/style
  * removal, entity decode, and whitespace collapse are ALL native
  * builtin compositions (`regexp_replace` / `replace` — codegen'd,
  * no UDF), so extraction runs inside the scan stage as a projection
  * and the raw markup never reaches a shuffle. 100 TB-safe by
  * construction: per-row work, zero exchanges added.
  *
  * Ordering is load-bearing and proven by the h1 fixture:
  *   1. strip `<script>`/`<style>` WITH their content (a stray `<`
  *      inside a script would corrupt a naive tag-strip);
  *   2. strip remaining tags to spaces;
  *   3. decode entities LAST (`&lt;i&gt;` must survive as literal
  *      `<i>` text, not get re-eaten by the tag pass), `&amp;`
  *      decoded after the other entities so `&amp;lt;` cannot
  *      double-decode;
  *   4. collapse runs of spaces, trim.
  *
  * Every constant below feeds BOTH the Spark `Column` pipeline and
  * the DuckDB oracle SQL builders (the simhashCtes convention), so
  * the two sides cannot drift on a pattern or template byte.
  */
object HtmlOps {

  /** The deterministic per-document page template (u1's rendered-
    * variant pattern): fixed markup with the three document fields
    * spliced in. Carries one of everything the extractor must
    * handle — entity-laden title, nav boilerplate, heading, body
    * paragraph, an entity-only paragraph, a script with raw `<`/`>`
    * operators, a style block, and a footer.
    */
  private val Template: Seq[Either[String, String]] = Seq(
    Left("<!DOCTYPE html><html><head><title>Doc "),
    Right("doc_id"),
    Left(" &amp; "),
    Right("source"),
    Left("</title><style>body { color: #222; }</style></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/docs\">Docs &amp; " +
      "Guides</a> <a href=\"/d/"),
    Right("doc_id"),
    Left("?b=2&a=1\">Self</a></nav><h1>Entry "),
    Right("doc_id"),
    Left("</h1><p>"),
    Right("text"),
    Left("</p><p>Fish &amp; chips &lt;i&gt; &quot;quoted&quot; " +
      "it&#39;s</p><script>var x = 1 < 2 && y > 0;</script>" +
      "<footer>Example Corp - all rights reserved " +
      "<a href=\"https://mirror.example/d/"),
    Right("doc_id"),
    Left("\">M</a></footer></body></html>"))

  /** Structure strips, in order: script+content, style+content, then
    * every remaining tag. Patterns are shared Java-regex/RE2 syntax
    * (non-greedy, no lookaround) so Spark and DuckDB agree exactly.
    */
  private val StripPatterns = Seq(
    "<script[^>]*>.*?</script>" -> " ",
    "<style[^>]*>.*?</style>" -> " ",
    "<[^>]*>" -> " ")

  /** Entity decode table; `&amp;` LAST (see ordering note above). */
  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&")

  /** Render the template over a row's (doc_id, source, text). */
  def renderHtml: Column =
    concat(Template.map {
      case Left(s)  => lit(s)
      case Right(f) => col(f)
    }: _*)

  /** The same template as a DuckDB `||` chain. */
  def renderHtmlSqlExpr: String =
    Template.map {
      case Left(s)  => "'" + s.replace("'", "''") + "'"
      case Right(f) => f
    }.mkString(" || ")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (x, (ent, ch)) =>
      replace(x, lit(ent), lit(ch))
    }

  private def decodeEntitiesSql(expr: String): String =
    Entities.foldLeft(expr) { case (x, (ent, ch)) =>
      s"replace($x, '$ent', '${ch.replace("'", "''")}')"
    }

  /** Markup → clean text (steps 1–4 above), as one codegen'd
    * projection.
    */
  def htmlToText(html: Column): Column = {
    val stripped = StripPatterns.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    trim(regexp_replace(decodeEntities(stripped), " +", " "))
  }

  /** [[htmlToText]] as a DuckDB expression over `expr` (DuckDB's
    * regexp_replace needs the explicit 'g' flag Spark implies).
    */
  def htmlToTextSqlExpr(expr: String): String = {
    val stripped = StripPatterns.foldLeft(expr) { case (x, (p, r)) =>
      s"regexp_replace($x, '$p', '$r', 'g')"
    }
    s"trim(regexp_replace(${decodeEntitiesSql(stripped)}, ' +', ' ', 'g'))"
  }

  private val TitlePattern = "<title>([^<]*)</title>"
  private val HeadingPattern = "<h1>([^<]*)</h1>"

  /** Block segmentation + extraction report, one row per document:
    * decoded `<title>`, decoded first `<h1>`, and the cleaned body
    * text pinned by length, token count, and an md5 prefix (c11's
    * manifest convention — full content is hash-checked without
    * shipping it through the compare).
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val text = htmlToText(col(htmlCol))
    df.select(col(idCol),
        decodeEntities(regexp_extract(col(htmlCol), TitlePattern, 1))
          .as("title"),
        decodeEntities(regexp_extract(col(htmlCol), HeadingPattern, 1))
          .as("heading"),
        text.as("__t"))
      .select(col(idCol), col("title"), col("heading"),
        length(col("__t")).cast("long").as("n_chars"),
        size(split(col("__t"), " ")).cast("long").as("n_tok"),
        substring(md5(col("__t")), 1, 16).as("text_md5"))
      .orderBy(col(idCol).asc)
  }

  /** Shared render+extract CTE chain — ends with
    * `ext($idCol, source, text)`.
    */
  private def extractCtes(table: String, idCol: String): String =
    s"""raw AS (
       |  SELECT $idCol, source, $renderHtmlSqlExpr AS html
       |  FROM $table),
       |ext AS (
       |  SELECT $idCol, source, html,
       |    ${htmlToTextSqlExpr("html")} AS text
       |  FROM raw)""".stripMargin

  /** h1 oracle: the identical render → extract chain in DuckDB. */
  def htmlExtractSql(table: String, idCol: String): String =
    s"""WITH ${extractCtes(table, idCol)}
       |SELECT $idCol,
       |  ${decodeEntitiesSql(s"regexp_extract(html, '$TitlePattern', 1)")} AS title,
       |  ${decodeEntitiesSql(s"regexp_extract(html, '$HeadingPattern', 1)")} AS heading,
       |  length(text)::BIGINT AS n_chars,
       |  len(string_split(text, ' '))::BIGINT AS n_tok,
       |  substr(md5(text), 1, 16) AS text_md5
       |FROM ext ORDER BY $idCol ASC""".stripMargin

  private val HrefPattern = "href=\"([^\"]*)\""

  /** LINK EXTRACTION (h3) — the crawl-frontier feed: every `href`
    * harvested from the markup (`regexp_extract_all`, codegen,
    * in-scan), exploded, and rolled up per source: total links,
    * distinct targets, and the lexical-min target (pins the VALUES
    * under the oracle hash, u1's convention). The per-doc self link
    * in the template makes the distinct-target count grow with the
    * corpus while the nav targets stay shared — both behaviors in
    * one report. Scale shape: extract+explode in the scan stage
    * (only (source, href) pairs continue), one hash aggregate on the
    * bounded source domain.
    */
  def linkReport(df: DataFrame, htmlCol: String, srcCol: String)
      : DataFrame = {
    import graft.Sorting.ResultSortOps
    df.select(col(srcCol),
        explode(regexp_extract_all(col(htmlCol), lit(HrefPattern),
          lit(1))).as("href"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("href")).as("n_targets"),
        min(col("href")).as("min_href"))
      .resultSorted(col(srcCol).asc)
  }

  /** h3 oracle: the identical harvest in DuckDB. */
  def linkReportSql(table: String, idCol: String): String =
    s"""WITH ${extractCtes(table, idCol)},
       |links AS (
       |  SELECT source,
       |    unnest(regexp_extract_all(html, '$HrefPattern', 1))
       |      AS href
       |  FROM ext)
       |SELECT source, count(*) AS n_links,
       |  count(DISTINCT href) AS n_targets,
       |  min(href) AS min_href
       |FROM links GROUP BY source ORDER BY source ASC""".stripMargin

  /** Query/fragment strip → page identity (the crawl-frontier dedup
    * key; u1's full canonicalizer handles the messier host/port/param
    * cases — here the template emits one self-link variant, so
    * identity = the bare path).
    */
  private val PageIdPattern = "[?#].*$"
  private val HostPattern = "^https?://([^/]+)"

  /** CRAWL FRONTIER (h5) — the step that closes the crawler loop the
    * reference runs by hand (discover → fetch → extract → discover):
    * every harvested link target, reduced to page identity
    * (query/fragment stripped), LEFT-ANTI-joined against the crawled
    * catalog (this corpus's own pages), rolled up per target host —
    * the politeness-budget view a scheduler consumes (one rate
    * limiter per host, [[graft.ingest.RateLimiter]]).
    *
    * Scale shape: extract + strip run in the scan stage (only URL
    * strings continue); `distinct` is one shuffle on the url key; the
    * anti-join is an equi-join on the same key (sort-merge at 100 TB —
    * BOTH sides are corpus-scale, the crawled catalog is every page
    * ever fetched, so no broadcast is assumed); the final aggregate
    * runs on the bounded host domain.
    */
  def frontier(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    import graft.Sorting.ResultSortOps
    val targets = df.select(
        explode(regexp_extract_all(col(htmlCol), lit(HrefPattern),
          lit(1))).as("href"))
      .select(regexp_replace(col("href"), PageIdPattern, "").as("url"))
      .distinct()
    val crawled = df.select(concat(lit("/d/"), col(idCol)).as("url"))
    targets.join(crawled, Seq("url"), "left_anti")
      .select(regexp_extract(col("url"), HostPattern, 1).as("host"),
        col("url"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        min(col("url")).as("min_url"),
        max(col("url")).as("max_url"))
      .resultSorted(col("host").asc)
  }

  /** h5 oracle: the identical frontier in DuckDB (shared href/strip
    * patterns; NOT IN stands in for the anti-join).
    */
  def frontierSql(table: String, idCol: String): String =
    s"""WITH ${extractCtes(table, idCol)},
       |links AS (
       |  SELECT regexp_replace(
       |    unnest(regexp_extract_all(html, '$HrefPattern', 1)),
       |    '$PageIdPattern', '') AS url
       |  FROM raw),
       |targets AS (SELECT DISTINCT url FROM links),
       |crawled AS (SELECT '/d/' || $idCol AS url FROM raw),
       |fresh AS (
       |  SELECT url FROM targets
       |  WHERE url NOT IN (SELECT url FROM crawled))
       |SELECT regexp_extract(url, '$HostPattern', 1) AS host,
       |  count(*) AS n_urls, min(url) AS min_url, max(url) AS max_url
       |FROM fresh GROUP BY host ORDER BY host ASC""".stripMargin

  /** PAGE GRAPH (h6's input) — the edge relation crawl prioritization
    * ranks over: every harvested href reduced to page identity (the
    * h5 key: query/fragment stripped), src = the page it appeared on,
    * UNIONed with the catalog's category-tree edges (each dataset
    * page links up to its parent category page `/d/{id div 2}` — the
    * listing hierarchy a reference catalog exposes but our fixed page
    * template doesn't render). The harvested half is the h3 extract
    * verbatim (in-scan, codegen); the tree half is a pure projection.
    * The tree edges give the graph real depth structure (ranks decay
    * down the tree, the root accumulates) on top of the template's
    * hub links ("/", "/docs") — the two fan-in regimes a web graph
    * actually has.
    */
  def pageEdges(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val harvested = df.select(
        concat(lit("/d/"), col(idCol)).as("src"),
        explode(regexp_extract_all(col(htmlCol), lit(HrefPattern),
          lit(1))).as("href"))
      .select(col("src"),
        regexp_replace(col("href"), PageIdPattern, "").as("dst"))
    val tree = df.filter(col(idCol) >= 1)
      .select(concat(lit("/d/"), col(idCol)).as("src"),
        concat(lit("/d/"), expr(s"$idCol div 2")).as("dst"))
    harvested.unionByName(tree)
  }

  /** [[pageEdges]] as CTE text ending in `edges(src, dst)` — the
    * shape [[GraphOps.pageRankSql]] consumes.
    */
  def pageEdgesSql(table: String, idCol: String): String =
    s"""${extractCtes(table, idCol)},
       |hedges AS (
       |  SELECT '/d/' || $idCol AS src,
       |    regexp_replace(
       |      unnest(regexp_extract_all(html, '$HrefPattern', 1)),
       |      '$PageIdPattern', '') AS dst
       |  FROM raw),
       |tedges AS (
       |  SELECT '/d/' || $idCol AS src,
       |    '/d/' || ($idCol // 2) AS dst
       |  FROM $table WHERE $idCol >= 1),
       |edges AS (
       |  SELECT src, dst FROM hedges
       |  UNION ALL SELECT src, dst FROM tedges)""".stripMargin

  /** THE WEB-CORPUS FRONT DOOR as ONE Catalyst plan (h4, the c12
    * composition pattern applied to ingestion): raw PII-laden pages
    * → markup strip ([[htmlToText]]) → PII scrub
    * ([[TextOps.scrubPii]]) → cross-doc boilerplate ratio
    * ([[TextOps.boilerplateRatios]]) → drop flagged docs → per-source
    * release report (docs in, docs kept, kept tokens, PII hits).
    * Render/extract/scrub fuse into one scan-stage projection; the
    * only shuffles are the shingle-df window and the per-doc fold
    * the boilerplate pass always pays, plus the bounded final agg —
    * composing the stages adds ZERO exchanges over t13 alone.
    */
  def webPipeline(docs: DataFrame, idCol: String, srcCol: String,
      relDf: Double, flagRatio: Double): DataFrame = {
    import graft.Sorting.ResultSortOps
    val scrubbed = docs.select(col(idCol), col(srcCol),
        htmlToText(renderHtml).as("__raw"))
      .select(col(idCol), col(srcCol),
        TextOps.piiMatchCount(col("__raw")).as("__npii"),
        TextOps.scrubPii(col("__raw")).as("text"))
    val ratios =
      TextOps.boilerplateRatios(scrubbed, idCol, "text", relDf)
    // token counts fold into the projection BEFORE the ratio join —
    // the join shuffles only (id, source, npii, ntok), never the
    // text payload (t13's narrow-join rule; the payload's last
    // appearance is the shingle scan)
    val docStats = scrubbed.select(col(idCol), col(srcCol),
      col("__npii"),
      size(split(col("text"), " ")).cast("long").as("__ntok"))
    docStats.join(ratios.select(col(idCol), col("ratio")), Seq(idCol))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ratio") < flagRatio, 1).otherwise(0))
          .cast("long").as("n_kept"),
        sum(when(col("ratio") < flagRatio, col("__ntok"))
          .otherwise(0L)).cast("long").as("kept_tokens"),
        sum(col("__npii")).cast("long").as("n_pii"))
      .resultSorted(col(srcCol).asc)
  }

  /** h4 oracle: the identical chain in DuckDB, every stage derived
    * from the shared builders (template, strip/decode chain, PII
    * patterns, shingle SQL, t13 thresholds).
    */
  def webPipelineSql(docsCte: String, idCol: String, relDf: Double,
      flagRatio: Double): String =
    s"""WITH piidocs AS ($docsCte),
       |${extractCtes("piidocs", idCol)},
       |scr AS (
       |  SELECT $idCol, source,
       |    ${TextOps.piiMatchCountSqlExpr("text")} AS npii,
       |    ${TextOps.scrubPiiSqlExpr("text")} AS text
       |  FROM ext),
       |sh0 AS (
       |${DedupOps.shinglesSql("scr", idCol, "text")}),
       |sh AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |dfx AS (SELECT x, count(*) AS dfc FROM sh GROUP BY 1),
       |th AS (SELECT ceil(count(*) * $relDf)::BIGINT AS min_df
       |       FROM scr),
       |perdoc AS (
       |  SELECT s.$idCol, count(*) AS n_sh,
       |    sum(CASE WHEN d.dfc >= th.min_df THEN 1 ELSE 0 END) AS n_hot
       |  FROM sh s JOIN dfx d USING (x), th GROUP BY 1),
       |rt AS (SELECT $idCol, n_hot * 1.0 / n_sh AS ratio FROM perdoc)
       |SELECT c.source, count(*) AS n_docs,
       |  sum(CASE WHEN rt.ratio < $flagRatio THEN 1 ELSE 0 END)::BIGINT
       |    AS n_kept,
       |  sum(CASE WHEN rt.ratio < $flagRatio
       |      THEN len(string_split(c.text, ' ')) ELSE 0 END)::BIGINT
       |    AS kept_tokens,
       |  sum(c.npii)::BIGINT AS n_pii
       |FROM rt JOIN scr c USING ($idCol)
       |GROUP BY c.source ORDER BY c.source ASC""".stripMargin

  /** h2 oracle: extraction COMPOSED with the t13 boilerplate pass —
    * the t13 oracle chain verbatim (same [[DedupOps.shinglesSql]]
    * builder, same 60-bit md5 keys, same 0.003/0.2 thresholds), fed
    * from the `ext` relation instead of the raw table. Proves the
    * extracted text drops into the existing pipeline unchanged.
    */
  def htmlBoilerplateSql(table: String, idCol: String): String =
    s"""WITH ${extractCtes(table, idCol)},
       |sh0 AS (
       |${DedupOps.shinglesSql("ext", idCol, "text")}),
       |sh AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |dfx AS (SELECT x, count(*) AS dfc FROM sh GROUP BY 1),
       |th AS (SELECT ceil(count(*) * 0.003)::BIGINT AS min_df
       |       FROM ext),
       |perdoc AS (
       |  SELECT s.$idCol, count(*) AS n_sh,
       |    sum(CASE WHEN d.dfc >= th.min_df THEN 1 ELSE 0 END) AS n_hot
       |  FROM sh s JOIN dfx d USING (x), th GROUP BY 1),
       |rt AS (SELECT $idCol, n_hot * 1.0 / n_sh AS ratio FROM perdoc)
       |SELECT e.source, count(*) AS n_docs,
       |  round(avg(rt.ratio), 6) AS avg_boilerplate,
       |  sum(CASE WHEN rt.ratio >= 0.2 THEN 1 ELSE 0 END)::BIGINT
       |    AS flagged_docs
       |FROM rt JOIN ext e USING ($idCol)
       |GROUP BY e.source ORDER BY e.source ASC""".stripMargin
}
