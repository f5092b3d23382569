package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SYMMETRIC bench accounting for the served tiers (round-11 verdict
  * item 3).
  *
  * The round-11 serving conversions (FTS family from the persisted
  * postings index; n9/n11/n24/c18 from the pair/cluster fixture;
  * t24/t25 from the trained merge table) build their artifacts in
  * Bench's warm-up pass while the recorded DuckDB baseline keeps the
  * full RECOMPUTE cost for the same queries — a served numerator
  * against a rebuilt denominator. This object makes the comparison
  * symmetric: [[ServedBake]] exports the SAME artifacts the Spark
  * side serves from as plain parquet, and [[ServedTwins.sql]] carries
  * a DuckDB twin per served query that READS those artifacts instead
  * of recomputing them. `tools/duckdb_bake_served.py` times both
  * forms and the bench line reports the headline ratio alongside the
  * symmetric one (served-vs-served for these entries).
  *
  * The twins mirror the recompute oracles' scoring tails exactly
  * (same constants, same rounding, same ordering); only the corpus
  * tokenize / minhash / merge-induction CTEs are replaced by
  * artifact reads — precisely what the Spark serving conversion did.
  */
object ServedTwins {

  /** Query names with a served twin — keep in sync with [[sql]].
    * The graph-serving queries n35/n36 are included for the same
    * reason as the FTS family: their Spark side walks a PREPARED
    * navigation graph while the recompute oracle re-derives it, so
    * the symmetric twin reads the exported graph. n37 is NOT here:
    * its Spark side recomputes the codebook and both assignments
    * inline (only the base edge list is a fixture), so recompute vs
    * served differ by ~nothing (duck 0.70 vs Spark 0.71 measured) —
    * already symmetric.
    */
  val Names: Seq[String] = Seq(
    "l2_fts_search", "l6_fts_ranked", "l7_fts_bm25", "l15_bm25f",
    "l13_query_expansion", "l14_spell_search",
    "n9_dup_clusters", "n11_cluster_sizes", "n24_keep_best",
    "c18_leakage_audit", "t24_bpe_apply", "t25_bpe_tokens",
    "n35_graph_ann", "n36_graph_ann_batch",
    "n34s_knn_sampled_recall")

  /** Export every artifact the served queries read, as plain parquet
    * under `root` (the bucketed catalog layout is a Spark-side
    * optimization; DuckDB reads the files directly).
    */
  def export(spark: SparkSession, sfDir: String, root: String): Unit = {
    val ix = RegistryFixtures.servedFts(spark, sfDir)
    def dump(table: String, sub: String): Unit =
      spark.table(table).write.mode(SaveMode.Overwrite)
        .parquet(s"$root/$sub")
    dump(ix.postings, "postings")
    dump(ix.lens, "lens")
    dump(ix.stats, "stats")
    dump(ix.fieldPostings, "fpostings")
    dump(ix.spell, "spell")
    val (pairs, clusters) = RegistryFixtures.dupPairsClusters(spark, sfDir)
    pairs.write.mode(SaveMode.Overwrite).parquet(s"$root/dup_pairs")
    clusters.write.mode(SaveMode.Overwrite)
      .parquet(s"$root/dup_clusters")
    val merges = RegistryFixtures.learnedBpeMerges(spark, sfDir, 4)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((pa, pb), i) => (i + 1, pa, pb) }
      .toDF("rank", "pa", "pb")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$root/bpe_merges")
    // the graph fixtures are cached per (session, dir) and the
    // registry closures request them under the serving-width child
    // sessions — export through the SAME children so each fixture is
    // built exactly once per process (round-14 advice)
    RegistryFixtures.annGraphFixture(
        QueriesDedupSim.servingChild(spark), sfDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/nsw_exact")
    RegistryFixtures.boundedNswFixture(
        QueriesDedupSim.servingBatchChild(spark), sfDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/nsw_bounded")
    RegistryFixtures.boundedKnnGraphFixture(spark, sfDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/knn_bounded8")
  }

  /** DuckDB served-twin SQL per query, reading artifacts under
    * `root`. Table references to the raw corpus (`documents`) stay —
    * the Spark serving path reads the corpus for those relations too.
    */
  def sql(root: String): Map[String, String] = {
    def p(sub: String) = s"read_parquet('$root/$sub/*.parquet')"
    val postings = p("postings")
    val stats = p("stats")

    def pl(terms: Seq[String]): String = {
      val in = terms.map(t => s"'$t'").mkString(", ")
      s"pl AS (SELECT token, doc_id, tf FROM $postings\n" +
        s"  WHERE token IN ($in))"
    }

    val l2 =
      s"""WITH ${pl(Seq("spark", "window"))}
         |SELECT doc_id, sum(tf)::BIGINT AS score
         |FROM pl GROUP BY doc_id
         |HAVING count(DISTINCT token) = 2
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin

    val l6 =
      s"""WITH ${pl(Seq("batch", "dup"))},
         |dfs AS (SELECT token, count(*) AS df FROM pl GROUP BY token),
         |n AS (SELECT n_docs FROM $stats)
         |SELECT doc_id,
         |  round(sum(tf * ln(n_docs::DOUBLE / df)), 6) AS score
         |FROM pl JOIN dfs USING (token) CROSS JOIN n
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin

    val l7 =
      s"""WITH ${pl(Seq("batch", "dup"))},
         |dfs AS (SELECT token, count(*) AS df FROM pl GROUP BY token),
         |lens AS (SELECT doc_id, len FROM ${p("lens")}),
         |st AS (SELECT n_docs::DOUBLE AS n_docs, avgdl FROM $stats)
         |SELECT doc_id,
         |  round(sum(ln(n_docs / df) * (tf * (1.2 + 1)) /
         |    (tf + 1.2 * ((1 - 0.75) + 0.75 * len / avgdl))), 6) AS score
         |FROM pl JOIN dfs USING (token) JOIN lens USING (doc_id)
         |  CROSS JOIN st
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin

    val l15 =
      s"""WITH tf AS (SELECT doc_id, fld, token, tf
         |  FROM ${p("fpostings")}
         |  WHERE token IN ('batch', 'dup')),
         |lens AS (SELECT doc_id, lt, lb FROM ${p("lens")}),
         |st AS (SELECT n_docs::DOUBLE AS n_docs, alt, alb FROM $stats),
         |dfs AS (SELECT token, count(DISTINCT doc_id)::DOUBLE AS df
         |  FROM tf GROUP BY 1),
         |tfw AS (
         |  SELECT t.doc_id, t.token,
         |    sum((CASE WHEN t.fld = 't' THEN 2.0 ELSE 1.0 END)
         |        * t.tf /
         |        ((1 - 0.75) + 0.75 * (CASE WHEN t.fld = 't'
         |           THEN l.lt / s.alt ELSE l.lb / s.alb END))) AS tfw
         |  FROM tf t JOIN lens l USING (doc_id) CROSS JOIN st s
         |  GROUP BY 1, 2)
         |SELECT w.doc_id,
         |  round(sum(ln(s.n_docs / d.df) * w.tfw / (1.2 + w.tfw)), 6)
         |    AS score
         |FROM tfw w JOIN dfs d USING (token) CROSS JOIN st s
         |GROUP BY 1
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin

    val l13 = {
      val norm = Seq("merge", "dup")
      val inList = norm.map(t => s"'$t'").mkString(", ")
      val stopList = (Seq("the", "a", "of", "and", "is", "in") ++ norm)
        .map(t => s"'$t'").mkString(", ")
      s"""WITH idx AS (SELECT token, doc_id, tf FROM $postings),
         |nd AS (SELECT n_docs FROM $stats),
         |p1 AS (SELECT * FROM idx WHERE token IN ($inList)),
         |df1 AS (SELECT token, count(*) AS df FROM p1 GROUP BY token),
         |s1 AS (SELECT doc_id,
         |    round(sum(tf * ln(n_docs * 1.0 / df)), 6) AS score
         |  FROM p1 JOIN df1 USING (token), nd GROUP BY doc_id),
         |fb AS (SELECT doc_id FROM s1
         |  ORDER BY score DESC, doc_id ASC LIMIT 10),
         |cand AS (SELECT token, sum(tf) AS fb_tf FROM idx
         |  WHERE doc_id IN (SELECT doc_id FROM fb)
         |    AND token NOT IN ($stopList)
         |  GROUP BY token ORDER BY fb_tf DESC, token ASC LIMIT 3),
         |terms AS (SELECT token FROM cand
         |  UNION SELECT unnest([$inList])),
         |p2 AS (SELECT idx.* FROM idx JOIN terms USING (token)),
         |df2 AS (SELECT token, count(*) AS df FROM p2 GROUP BY token),
         |ew AS (SELECT string_agg(token, ' ' ORDER BY token ASC)
         |  AS expanded_with FROM cand)
         |SELECT p.doc_id,
         |  round(sum(p.tf * ln(nd.n_docs * 1.0 / d.df)), 6) AS score,
         |  ew.expanded_with
         |FROM p2 p JOIN df2 d USING (token), nd, ew
         |GROUP BY p.doc_id, ew.expanded_with
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin
    }

    val l14 = {
      val norm = "wimdow"
      val qKeys = (norm +: norm.indices.map(i =>
        norm.substring(0, i) + norm.substring(i + 1))).distinct
      val inKeys = qKeys.map(q => s"'$q'").mkString(", ")
      s"""WITH cand AS (
         |  SELECT DISTINCT token, ctf,
         |    levenshtein(token, '$norm') AS dist FROM ${p("spell")}
         |  WHERE key IN ($inKeys)
         |    AND levenshtein(token, '$norm') <= 1),
         |corr AS (SELECT token FROM cand
         |  ORDER BY dist ASC, ctf DESC, token ASC LIMIT 1)
         |SELECT i.doc_id, sum(i.tf)::BIGINT AS score,
         |  min(i.token) AS corrected
         |FROM $postings i JOIN corr c USING (token)
         |GROUP BY i.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin
    }

    val n9 =
      s"""SELECT doc_id, cluster_id FROM ${p("dup_clusters")}
         |ORDER BY doc_id ASC""".stripMargin

    val n11 =
      s"""WITH szs AS (SELECT cluster_id, count(*) AS sz
         |  FROM ${p("dup_clusters")} GROUP BY cluster_id)
         |SELECT sz, count(*) AS n_clusters FROM szs
         |GROUP BY sz ORDER BY sz ASC""".stripMargin

    val n24 =
      s"""WITH clusters AS (SELECT doc_id, cluster_id
         |  FROM ${p("dup_clusters")}),
         |ranked AS (SELECT c.cluster_id, c.doc_id, d.n_chars AS q,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
         |  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
         |  max(CASE WHEN rn = 1 THEN q END) AS keep_quality,
         |  count(*) AS n_members,
         |  sum(CASE WHEN rn <> 1 THEN q ELSE 0 END)::BIGINT
         |    AS dropped_quality
         |FROM ranked GROUP BY cluster_id
         |ORDER BY cluster_id ASC""".stripMargin

    val c18 = {
      def gate(x: String): String =
        s"CASE WHEN ('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15))" +
          s"::BIGINT % 1000 < 800 THEN 'train' ELSE 'test' END"
      s"""WITH pairs AS (SELECT id_a, id_b FROM ${p("dup_pairs")}),
         |clusters AS (SELECT doc_id AS id, cluster_id
         |  FROM ${p("dup_clusters")}),
         |grp AS (SELECT d.doc_id AS id,
         |    coalesce(c.cluster_id, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id),
         |asg AS (SELECT id,
         |    ${gate("id")} AS doc_split,
         |    ${gate("grp")} AS grp_split
         |  FROM grp),
         |j AS (SELECT a.doc_split AS da, b.doc_split AS db,
         |    a.grp_split AS ga, b.grp_split AS gb
         |  FROM pairs p
         |  JOIN asg a ON p.id_a = a.id
         |  JOIN asg b ON p.id_b = b.id),
         |t AS (SELECT count(*) AS n_pairs,
         |    coalesce(sum(CASE WHEN da <> db THEN 1 ELSE 0 END), 0)
         |      ::BIGINT AS doc_leaks,
         |    coalesce(sum(CASE WHEN ga <> gb THEN 1 ELSE 0 END), 0)
         |      ::BIGINT AS grp_leaks
         |  FROM j)
         |SELECT 'cluster_hash' AS policy, n_pairs, grp_leaks AS n_leaking
         |FROM t
         |UNION ALL
         |SELECT 'doc_hash', n_pairs, doc_leaks FROM t
         |ORDER BY policy ASC""".stripMargin
    }

    // BPE: the apply chain of bpeEncodeSql with each induction CTE
    // replaced by a rank-keyed read of the trained merge table.
    def bpeServedCtes(iters: Int): String = {
      val ctes = new StringBuilder(
        "WITH d1 AS (SELECT doc_id, ' ' || text || ' ' AS t" +
          " FROM documents)")
      (1 to iters).foreach { i =>
        ctes ++= s""",
           |p$i AS (SELECT pa, pb FROM ${p("bpe_merges")}
           |  WHERE rank = $i),
           |d${i + 1} AS (
           |  SELECT doc_id, replace(replace(t,
           |      ' '||pa||' '||pb||' ', ' '||pa||'_'||pb||' '),
           |      ' '||pa||' '||pb||' ', ' '||pa||'_'||pb||' ') AS t
           |  FROM d$i CROSS JOIN p$i)""".stripMargin
      }
      ctes.toString
    }

    val t24 =
      s"""${bpeServedCtes(4)}
         |SELECT doc_id,
         |  len(string_split(trim(t), ' '))::BIGINT AS n_tok,
         |  len(list_filter(string_split(trim(t), ' '),
         |      x -> contains(x, '_')))::BIGINT AS n_merged
         |FROM d5
         |ORDER BY doc_id ASC""".stripMargin

    val t25 =
      s"""${bpeServedCtes(4)}
         |SELECT doc_id, trim(t) AS encoded
         |FROM d5
         |ORDER BY doc_id ASC""".stripMargin

    // Graph-ANN serving: the walk CTEs verbatim from the recompute
    // oracles (graphBeamSearchSql / graphBeamSearchBatchSql), with
    // the graph-DERIVATION CTEs replaced by a read of the exported
    // navigation graph — exactly what the Spark fixture serves.
    val n35 = {
      val (beam, rounds, k) = (16, 8, 10)
      val roundCtes = (1 to rounds).map { i =>
        s"""b$i AS (SELECT vec_id FROM v${i - 1}
           |  ORDER BY s DESC, vec_id ASC LIMIT $beam),
           |x$i AS (SELECT DISTINCT g.dst AS vec_id
           |  FROM g JOIN b$i ON g.src = b$i.vec_id),
           |v$i AS MATERIALIZED (
           |  SELECT * FROM v${i - 1}
           |  UNION
           |  SELECT sc.vec_id, sc.label, sc.s
           |  FROM sc JOIN x$i USING (vec_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |n AS MATERIALIZED (SELECT vec_id, label, v,
         |  sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |g AS (SELECT src, dst FROM ${p("nsw_exact")}),
         |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
         |sc AS MATERIALIZED (SELECT vec_id, label,
         |    list_dot_product(v, qv) / (nrm * qn) AS s
         |  FROM n, q WHERE vec_id <> 0),
         |${operators.SimilarityOps.hierEntryCtes(50, 4,
             batched = false)},
         |v0 AS (SELECT vec_id, label, s FROM sc
         |  WHERE vec_id = (SELECT vec_id FROM hent)),
         |$roundCtes
         |SELECT vec_id, label, round(s, 6) AS score FROM v$rounds
         |ORDER BY s DESC, vec_id ASC LIMIT $k""".stripMargin
    }

    val n36 = {
      val (queryMod, beam, rounds, k, stride) = (199, 16, 8, 10, 50)
      val roundCtes = (1 to rounds).map { i =>
        s"""b$i AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id, row_number() OVER (
           |        PARTITION BY query_id ORDER BY s DESC, vec_id ASC)
           |      AS rn FROM v${i - 1}) WHERE rn <= $beam),
           |x$i AS (SELECT DISTINCT b.query_id, g.dst AS vec_id
           |  FROM g JOIN b$i b ON g.src = b.vec_id
           |  WHERE g.dst <> b.query_id),
           |v$i AS MATERIALIZED (
           |  SELECT * FROM v${i - 1}
           |  UNION
           |  SELECT sc.query_id, sc.vec_id, sc.label, sc.s
           |  FROM sc JOIN x$i USING (query_id, vec_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, label,
         |    list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |n AS MATERIALIZED (SELECT vec_id, label, v,
         |  sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |g AS (SELECT src, dst FROM ${p("nsw_bounded")}),
         |qrel AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
         |  FROM n WHERE vec_id % $queryMod = 0),
         |sc AS MATERIALIZED (SELECT qrel.query_id, n.vec_id, n.label,
         |    list_dot_product(n.v, qrel.qv) / (n.nrm * qrel.qn) AS s
         |  FROM qrel, n WHERE n.vec_id <> qrel.query_id),
         |${operators.SimilarityOps.hierEntryCtes(stride, 4,
             batched = true)},
         |v0 AS (SELECT sc.query_id, sc.vec_id, sc.label, sc.s
         |  FROM sc JOIN hent ON sc.query_id = hent.query_id
         |    AND sc.vec_id = hent.vec_id),
         |$roundCtes
         |SELECT query_id, vec_id, label, round(s, 6) AS score FROM (
         |  SELECT query_id, vec_id, label, s, row_number() OVER (
         |      PARTITION BY query_id ORDER BY s DESC, vec_id ASC) AS rn
         |  FROM v$rounds) WHERE rn <= $k
         |ORDER BY query_id ASC, s DESC, vec_id ASC""".stripMargin
    }

    // n34s: the sampled exact side recomputes on both engines (the
    // certificate's own work); only the graph under test is served.
    val n34s = operators.SimilarityOps.knnGraphSampledRecallServedSql(
      "embeddings", k = 8, sampleN = 1000, graphRef = p("knn_bounded8"))

    Map(
      "l2_fts_search" -> l2, "l6_fts_ranked" -> l6,
      "l7_fts_bm25" -> l7, "l15_bm25f" -> l15,
      "l13_query_expansion" -> l13, "l14_spell_search" -> l14,
      "n9_dup_clusters" -> n9, "n11_cluster_sizes" -> n11,
      "n24_keep_best" -> n24, "c18_leakage_audit" -> c18,
      "t24_bpe_apply" -> t24, "t25_bpe_tokens" -> t25,
      "n35_graph_ann" -> n35, "n36_graph_ann_batch" -> n36,
      "n34s_knn_sampled_recall" -> n34s)
  }
}

/** `runMain graft.ServedBake <sfDir> <outDir>` — exports the served
  * artifacts to `<outDir>/served/` and the twin SQL to
  * `<outDir>/served_sql.json`; `tools/duckdb_bake_served.py` then
  * times recompute vs served per query.
  */
object ServedBake {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = Sessions.local(Sessions.envCores)
    val root = s"$outDir/served"
    new java.io.File(root).mkdirs()
    ServedTwins.export(spark, sfDir, root)
    def esc(s: String): String = s
      .replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t")
    val json = ServedTwins.sql(root).toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/served_sql.json"),
      json.getBytes("UTF-8"))
    println(s"[served-bake] wrote $root and served_sql.json " +
      s"(${ServedTwins.Names.size} twins)")
    spark.stop()
  }
}
