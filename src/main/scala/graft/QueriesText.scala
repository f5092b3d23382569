package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps
import graft.RegistryFixtures._

/** Query registry — the text-analysis tier (t1–t28): quality gates, language ID,
  * tokenizers, LM scoring, fingerprints, PII scrub.
  *
  * Split out of SparkEntry (round-10 verdict item 7); entries and
  * oracle twins are verbatim, SparkEntry concatenates the families.
  */
object QueriesText {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- north-star: text analysis ----
    "t1_token_stats" -> ((s, dir) =>
      TextOps.tokenStats(Tables.documents(s, dir),
        "lang", "text", "n_chars")),

    "t2_quality_score" -> ((s, dir) =>
      TextOps.qualityScore(Tables.documents(s, dir),
        "doc_id", "text", "n_chars", k = 50)),

    "t3_langid" -> ((s, dir) =>
      TextOps.langId(Tables.documents(s, dir), "lang", "text")),

    "t4_simhash" -> ((s, dir) =>
      DedupOps.simhash(Tables.documents(s, dir), "doc_id", "text")),

    "t5_fingerprints" -> ((s, dir) =>
      TextOps.fingerprints(Tables.documents(s, dir), "doc_id", "text")),

    "t6_regex_token_stats" -> ((s, dir) =>
      TextOps.regexTokenStats(Tables.documents(s, dir), "lang", "text")),

    "t7_rolling_fingerprints" -> ((s, dir) =>
      TextOps.rollingFingerprints(Tables.documents(s, dir),
        "doc_id", "text")),

    "t9_repetition" -> ((s, dir) =>
      TextOps.repetitionScore(Tables.documents(s, dir),
        "doc_id", "text", k = 50)),

    "t10_rare_tokens" -> ((s, dir) =>
      TextOps.rareTokenStats(Tables.documents(s, dir),
        "doc_id", "text", maxFreq = 2, k = 50)),

    // t11: unigram-LM quality score — mean token log-probability per
    // doc under the corpus's own unigram distribution.
    "t11_lm_score" -> ((s, dir) =>
      TextOps.lmScore(Tables.documents(s, dir), "doc_id", "text")),

    // t12: the context-sensitive tier — mean bigram conditional
    // log-probability ln P(w_i | w_{i-1}).
    "t12_bigram_lm" -> ((s, dir) =>
      TextOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")),

    // t13: cross-doc boilerplate — per-source mean hot-shingle ratio
    // (df >= 0.3% of corpus) + docs over the 0.2 drop threshold.
    "t13_boilerplate" -> ((s, dir) =>
      TextOps.boilerplate(Tables.documents(s, dir), "doc_id", "source",
        "text", relDf = 0.003, flagRatio = 0.2)),

    // t14: Gopher-style rule gate — per-source pass/fail report over
    // four structural rules, every ratio bound in exact integer form.
    "t14_gopher_gate" -> ((s, dir) =>
      TextOps.gopherGate(Tables.documents(s, dir), "source", "text",
        "n_chars")),

    // t15: adjacent-pair counts — the BPE vocab-induction merge
    // statistic; top-50 pairs with a total-order tiebreak.
    "t15_pair_counts" -> ((s, dir) =>
      TextOps.pairCounts(Tables.documents(s, dir), "text", 50)),

    // t19: the BPE induction LOOP closed — 3 fixed merge iterations
    // (count pairs, adopt the top merge, rewrite, re-count); the
    // chosen merge table per iteration, oracle-replayed in DuckDB.
    "t19_bpe_loop" -> ((s, dir) =>
      TextOps.bpeMergeLoop(Tables.documents(s, dir), "text", 3)),

    // t20: the tokenizer APPLIED — t19's 3 learned merges encode every
    // document; per-doc token count + merged-token count under the
    // learned vocab (the sequence-length input to the packing tier).
    "t20_bpe_encode" -> ((s, dir) =>
      TextOps.bpeEncode(Tables.documents(s, dir), "doc_id", "text", 3)),

    // t24: vocab-SCALE application — the learned merge list (here 4
    // ranks; 50k in production) collected once, broadcast, and applied
    // per document inside ONE mapPartitions corpus scan. Same greedy
    // semantics as t20's relational form, so the t20-style oracle
    // replays it; the scan count no longer grows with vocab size.
    // The merge table comes from the trained-tokenizer fixture
    // (learnedBpeMerges — trained once per corpus, the production
    // shape); the measured work is the one-scan apply.
    "t24_bpe_apply" -> ((s, dir) =>
      TextOps.bpeApply(Tables.documents(s, dir), "doc_id", "text",
        learnedBpeMerges(s, dir, 4))),

    // t25: the ENCODED CORPUS itself — per-doc merged token sequence
    // (the artifact a tokenization export writes); hash-gated
    // byte-for-byte against the relational rewrite chain's output.
    "t25_bpe_tokens" -> ((s, dir) =>
      TextOps.bpeApplyTokens(Tables.documents(s, dir), "doc_id",
        "text", learnedBpeMerges(s, dir, 4))),

    // t26: the gate-threshold sweep — per score decile, doc count +
    // cumulative at-or-above share: "if the threshold were d/10, how
    // much survives" for every d in one bounded report.
    "t26_threshold_sweep" -> ((s, dir) =>
      TextOps.thresholdSweep(Tables.documents(s, dir),
        "doc_id", "text", "n_chars")),

    // t27: PII scrubbing — emails/phones/IPv4 redacted to typed
    // tokens (C4-style release pass); deterministic PII rendered
    // into the fixture (u1's convention), counts + order-independent
    // scrub seal prove the redacted corpus bit-for-bit.
    "t27_pii_scrub" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val withPii = docs.select(col("source"), concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        when(col("doc_id") % 2 === 0, lit(" call 555-123-4567"))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" from 10.0."), col("doc_id") % 200, lit(".7")))
          .otherwise(lit(""))).as("text"))
      TextOps.piiScrub(withPii, "text", "source")
    }),

    // t16: linear quality-classifier gate — soft-margin scoring over
    // t14's structural features; per-source docs/passes/mean score.
    "t16_classifier_gate" -> ((s, dir) =>
      TextOps.classifierGate(Tables.documents(s, dir), "source",
        "text", "n_chars")),

    // t18: per-source DYNAMIC quality gate — each source gated
    // against its own p75 score quantile (exact interpolated
    // percentile, the e2 convention).
    "t18_quantile_gate" -> ((s, dir) =>
      TextOps.quantileGate(Tables.documents(s, dir), "source",
        "text", "n_chars", p = 0.75)),

    // t17: DSIR importance weights — hashed-unigram log-ratio of the
    // %97 target slice vs the raw corpus, add-one smoothed; the only
    // libm call is per BUCKET, fixed into micro-longs before any
    // data-proportional accumulation.
    "t17_dsir_weights" -> ((s, dir) =>
      TextOps.dsirWeights(Tables.documents(s, dir), "doc_id",
        "source", "text", modulus = 97, nBuckets = 1024)),

    "t8_redaction_stats" -> ((s, dir) =>
      AnalyticsOps.redactionStats(Tables.events(s, dir),
        key = "event_type", payloadCol = "props")),

    // t23: per-class precision/recall/F1 of the t3 language-ID gate
    // against the labels — the model eval layer over the confusion
    // matrix.
    "t23_langid_eval" -> ((s, dir) =>
      TextOps.langIdEval(Tables.documents(s, dir), "lang", "text")),

    // t21: n-gram diversity (type-token ratio per source) — the
    // templated/synthetic-text detector; exact distinct via a
    // composite-key pre-aggregate, never count-distinct state.
    "t21_ngram_diversity" -> ((s, dir) =>
      TextOps.ngramDiversity(Tables.documents(s, dir),
        "source", "text")),

    // t28: Zipf rank-frequency slope per source — the power-law
    // corpus diagnostic (natural ≈ −1; templated text flattens).
    // The top-100 rank filter plans through TopKPerKey.
    "t28_zipf_slope" -> ((s, dir) =>
      TextOps.zipfSlope(Tables.documents(s, dir), "source", "text")),

    // t22: word-blocklist safety gate — a pure scan-stage predicate
    // (arrays_overlap with a broadcast list), no shuffle of text.
    "t22_blocklist_gate" -> ((s, dir) =>
      TextOps.blocklistGate(Tables.documents(s, dir),
        "source", "text", Seq("slow", "big"))))

  def oracleSql: Map[String, String] = Map(
    "t1_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
        |  round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
        |  round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang ASC""".stripMargin,

    "t2_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w, n_chars
        |  FROM documents),
        |c AS (SELECT doc_id, len(w) AS n_tok,
        |    len(list_distinct(w)) * 1.0 / len(w) AS ttr,
        |    len(list_filter(w,
        |      x -> x IN ('the','a','of','and','is','in'))) * 1.0 / len(w)
        |      AS stop_ratio,
        |    (n_chars * 1.0 - (len(w) - 1)) / len(w) AS awl
        |  FROM t)
        |SELECT doc_id, n_tok, round(ttr, 6) AS ttr,
        |  round(stop_ratio, 6) AS stop_ratio,
        |  round(ttr * 0.5 + (1.0 - stop_ratio) * 0.3 +
        |        least(awl / 8.0, 1.0) * 0.2, 6) AS quality
        |FROM c ORDER BY quality DESC, doc_id ASC LIMIT 50""".stripMargin,

    // t26: the t2 quality formula re-bucketed on integer micro-units
    // (float floor(q*10) would split decile boundaries), window
    // cumsum over the 11-row decile relation.
    "t26_threshold_sweep" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w, n_chars
        |  FROM documents),
        |c AS (SELECT
        |    len(list_distinct(w)) * 1.0 / len(w) AS ttr,
        |    len(list_filter(w,
        |      x -> x IN ('the','a','of','and','is','in'))) * 1.0 / len(w)
        |      AS stop_ratio,
        |    (n_chars * 1.0 - (len(w) - 1)) / len(w) AS awl
        |  FROM t),
        |b AS (SELECT CAST(round((ttr * 0.5 + (1.0 - stop_ratio) * 0.3 +
        |      least(awl / 8.0, 1.0) * 0.2) * 1000000) AS BIGINT)
        |      // 100000 AS decile
        |  FROM c),
        |h AS (SELECT decile, count(*) AS n_docs FROM b GROUP BY decile)
        |SELECT decile, n_docs,
        |  sum(n_docs) OVER (ORDER BY decile DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS n_at_or_above,
        |  round((sum(n_docs) OVER (ORDER BY decile DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    * 1.0 / (sum(n_docs) OVER ()), 6) AS share_at_or_above
        |FROM h ORDER BY decile ASC""".stripMargin,

    "t3_langid" -> LangIdMatrixSql,

    // t23: metric layer derived from the same matrix CTEs.
    "t23_langid_eval" -> LangIdEvalSql,

    "t4_simhash" ->
      operators.DedupOps.simhashSql("documents", "doc_id", "text"),

    "t10_rare_tokens" ->
      """WITH tok0 AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |t AS (SELECT doc_id, tok FROM tok0 WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS c FROM t GROUP BY tok)
        |SELECT doc_id, count(*) AS n_tok,
        |  sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare,
        |  round(sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END) * 1.0
        |        / count(*), 6) AS rare_ratio
        |FROM t JOIN freq USING (tok)
        |GROUP BY doc_id
        |ORDER BY rare_ratio DESC, doc_id ASC LIMIT 50""".stripMargin,

    "t11_lm_score" ->
      """WITH tok0 AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |t AS (SELECT doc_id, tok FROM tok0 WHERE tok <> ''),
        |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |doc AS (SELECT doc_id, count(*) AS n_tokens,
        |    avg(ln(c.c::DOUBLE)) AS m
        |  FROM t JOIN c USING (tok) GROUP BY doc_id),
        |tot AS (SELECT doc_id, n_tokens, m,
        |    sum(n_tokens) OVER () AS n FROM doc)
        |SELECT doc_id, n_tokens,
        |  round(m - ln(n::DOUBLE), 6) AS avg_logp
        |FROM tot ORDER BY doc_id ASC""".stripMargin,

    // t13: df is counted over the SAME hashed-shingle relation the
    // Spark side uses (shared generator); the threshold is a scalar
    // subquery mirroring the broadcast 1-row aggregate.
    "t13_boilerplate" ->
      s"""WITH sh0 AS (
        |${operators.DedupOps.shinglesSql("documents", "doc_id", "text")}),
        |sh AS (SELECT doc_id,
        |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
        |dfx AS (SELECT x, count(*) AS dfc FROM sh GROUP BY 1),
        |th AS (SELECT ceil(count(*) * 0.003)::BIGINT AS min_df
        |       FROM documents),
        |perdoc AS (
        |  SELECT s.doc_id, count(*) AS n_sh,
        |    sum(CASE WHEN d.dfc >= th.min_df THEN 1 ELSE 0 END) AS n_hot
        |  FROM sh s JOIN dfx d USING (x), th GROUP BY 1),
        |rt AS (SELECT doc_id, n_hot * 1.0 / n_sh AS ratio FROM perdoc)
        |SELECT doc.source, count(*) AS n_docs,
        |  round(avg(rt.ratio), 6) AS avg_boilerplate,
        |  sum(CASE WHEN rt.ratio >= 0.2 THEN 1 ELSE 0 END)::BIGINT
        |    AS flagged_docs
        |FROM rt JOIN documents doc USING (doc_id)
        |GROUP BY doc.source ORDER BY doc.source ASC""".stripMargin,

    // t14: same integer-arithmetic rule forms as the Spark side —
    // cross-multiplied bounds, so no float boundary exists to flap.
    "t14_gopher_gate" ->
      """WITH t AS (
        |  SELECT source, n_chars, string_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source, n_chars, len(toks) AS n_tok,
        |    len(list_filter(toks,
        |      w -> w IN ('the','a','of','and','is','in'))) AS n_stop,
        |    (SELECT max(cnt) FROM (
        |       SELECT count(*) AS cnt FROM unnest(toks) AS u(tok)
        |       GROUP BY tok)) AS max_cnt
        |  FROM t),
        |r AS (
        |  SELECT source,
        |    (n_tok BETWEEN 20 AND 80) AS r_len,
        |    ((n_chars - n_tok + 1) * 4 >= n_tok * 17
        |      AND n_chars - n_tok + 1 <= n_tok * 10) AS r_wordlen,
        |    (n_stop >= 2) AS r_stop,
        |    (max_cnt * 5 <= n_tok) AS r_rep
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN r_len AND r_wordlen AND r_stop AND r_rep
        |      THEN 1 ELSE 0 END)::BIGINT AS n_pass,
        |  sum(CASE WHEN NOT r_len THEN 1 ELSE 0 END)::BIGINT
        |    AS n_fail_len,
        |  sum(CASE WHEN NOT r_wordlen THEN 1 ELSE 0 END)::BIGINT
        |    AS n_fail_wordlen,
        |  sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END)::BIGINT
        |    AS n_fail_stop,
        |  sum(CASE WHEN NOT r_rep THEN 1 ELSE 0 END)::BIGINT
        |    AS n_fail_rep
        |FROM r GROUP BY source ORDER BY source ASC""".stripMargin,

    // t16: same feature extraction as t14; the score is the identical
    // left-associated double chain, the mean summed in exact
    // micro-units so no accumulation order can flap the hash.
    "t16_classifier_gate" ->
      """WITH t AS (
        |  SELECT source, n_chars, string_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source, n_chars, len(toks) AS n_tok,
        |    len(list_filter(toks,
        |      w -> w IN ('the','a','of','and','is','in'))) AS n_stop,
        |    (SELECT max(cnt) FROM (
        |       SELECT count(*) AS cnt FROM unnest(toks) AS u(tok)
        |       GROUP BY tok)) AS max_cnt
        |  FROM t),
        |s AS (
        |  SELECT source,
        |    round(-3.0 + 0.02 * CAST(n_tok AS DOUBLE)
        |      + 0.35 * ((n_chars - n_tok + 1) / CAST(n_tok AS DOUBLE))
        |      + 4.0 * (n_stop / CAST(n_tok AS DOUBLE))
        |      - 3.0 * (max_cnt / CAST(n_tok AS DOUBLE)), 6) AS score
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_pass,
        |  round(sum(CAST(round(score * 1e6) AS BIGINT)) / 1e6
        |    / count(*), 6) AS avg_score
        |FROM s GROUP BY source ORDER BY source ASC""".stripMargin,

    // t18: t16's score CTE + a per-source quantile_cont threshold.
    "t18_quantile_gate" ->
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    string_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source, n_chars, len(toks) AS n_tok,
        |    len(list_filter(toks,
        |      w -> w IN ('the','a','of','and','is','in'))) AS n_stop,
        |    (SELECT max(cnt) FROM (
        |       SELECT count(*) AS cnt FROM unnest(toks) AS u(tok)
        |       GROUP BY tok)) AS max_cnt
        |  FROM t),
        |s AS (
        |  SELECT doc_id, source,
        |    round(-3.0 + 0.02 * CAST(n_tok AS DOUBLE)
        |      + 0.35 * ((n_chars - n_tok + 1) / CAST(n_tok AS DOUBLE))
        |      + 4.0 * (n_stop / CAST(n_tok AS DOUBLE))
        |      - 3.0 * (max_cnt / CAST(n_tok AS DOUBLE)), 6) AS score
        |  FROM m),
        |th AS (
        |  SELECT source, round(quantile_cont(score, 0.75), 6)
        |    AS threshold
        |  FROM s GROUP BY source)
        |SELECT s.source, count(*) AS n_docs, th.threshold,
        |  sum(CASE WHEN score > threshold THEN 1 ELSE 0 END)::BIGINT
        |    AS n_above
        |FROM s JOIN th USING (source)
        |GROUP BY s.source, th.threshold
        |ORDER BY s.source ASC""".stripMargin,

    // t17: the bucket model in SQL — same hash, same smoothing, same
    // micro-unit fixing; totals from the bounded bucket relation.
    "t17_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    (('0x' || substr(md5(t.tok), 1, 15))::BIGINT) % 1024
        |      AS bucket
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t),
        |tc AS (SELECT bucket, count(*) AS ct FROM tok
        |  WHERE doc_id % 97 = 0 GROUP BY 1),
        |rc AS (SELECT bucket, count(*) AS cr FROM tok
        |  WHERE doc_id % 97 <> 0 GROUP BY 1),
        |j AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
        |    coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
        |  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
        |tot AS (SELECT sum(ct) AS t, sum(cr) AS r FROM j),
        |model AS (SELECT bucket,
        |    CAST(round(round(ln(
        |      CAST((ct + 1) * (r + 1024) AS DOUBLE) /
        |      CAST((cr + 1) * (t + 1024) AS DOUBLE)), 6) * 1e6)
        |      AS BIGINT) AS lmicro
        |  FROM j, tot),
        |dc AS (SELECT doc_id, source, bucket, count(*) AS cnt
        |  FROM tok WHERE doc_id % 97 <> 0 GROUP BY 1, 2, 3),
        |dw AS (SELECT doc_id, source,
        |    sum(cnt * lmicro)::BIGINT AS wmicro
        |  FROM dc JOIN model USING (bucket) GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  round(sum(wmicro) / 1e6 / count(*), 6) AS mean_weight
        |FROM dw GROUP BY source ORDER BY source ASC""".stripMargin,

    // t19: the BPE loop replayed — same fixed iterations, same
    // double-replace greedy rewrite (DuckDB's replace shares the
    // non-overlapping left-to-right scan).
    "t19_bpe_loop" ->
      graft.operators.TextOps.bpeMergeLoopSql("documents", "text", 3),

    // t20: the same CTE chain extended one rewrite step (the last
    // merge IS applied), closing with per-doc token/merged counts.
    "t20_bpe_encode" ->
      graft.operators.TextOps.bpeEncodeSql(
        "documents", "doc_id", "text", 3),

    // t24: DERIVED oracle — learning-then-applying 4 merges in one
    // relational chain is exactly bpeEncodeSql at iters=4 (bpeApply's
    // one-scan encode must land on the same corpus), so the oracle is
    // the t20 twin at the t24 rank count: zero convention drift.
    "t24_bpe_apply" ->
      graft.operators.TextOps.bpeEncodeSql(
        "documents", "doc_id", "text", 4),

    // t25: derived from the same rewrite chain, closing with the
    // encoded string itself — the artifact, not just its counts.
    "t25_bpe_tokens" ->
      graft.operators.TextOps.bpeTokensSql(
        "documents", "doc_id", "text", 4),

    "t27_pii_scrub" -> TextOps.piiScrubSql(
      """SELECT source, text || ' contact user' || doc_id ||
        |  '@example.com' ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' call 555-123-4567'
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN ' from 10.0.' || (doc_id % 200) || '.7'
        |       ELSE '' END AS text
        |FROM documents""".stripMargin),

    // t15: pairs via list_zip of the two offset slices — the same
    // shifted-self zip the Spark side builds with slice + zip_with.
    "t15_pair_counts" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT unnest(list_zip(toks[1:len(toks)-1],
        |                         toks[2:len(toks)])) AS z
        |  FROM t)
        |SELECT z[1] || ' ' || z[2] AS pair, count(*) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair ASC LIMIT 50""".stripMargin,

    "t12_bigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
        |  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
        |cab AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY a, b),
        |ca AS (SELECT a, sum(cab)::BIGINT AS ca FROM cab GROUP BY a)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(ln(cab.cab * 1.0 / ca.ca)), 6) AS avg_logp
        |FROM bg JOIN cab USING (a, b) JOIN ca USING (a)
        |GROUP BY bg.doc_id
        |ORDER BY bg.doc_id ASC""".stripMargin,

    "t5_fingerprints" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |    AS content_md5,
        |  md5(array_to_string(list_slice(
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
        |      ' '), 1, 8), ' ')) AS prefix_md5
        |FROM documents ORDER BY doc_id ASC""".stripMargin,

    "t6_regex_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')))::BIGINT
        |    AS total_tokens,
        |  round(avg(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))), 6)
        |    AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang ASC""".stripMargin,

    "t7_rolling_fingerprints" ->
      operators.TextOps.rollingFingerprintsSql("documents", "doc_id",
        "text"),

    // t21: bigrams via the same positional list comprehension as t9's
    // trigrams; TTR = exact types over occurrences.
    "t28_zipf_slope" ->
      operators.TextOps.zipfSlopeSql("documents", "source", "text"),

    "t21_ngram_diversity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT source,
        |    unnest(CASE WHEN len(w) >= 2
        |      THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |      ELSE [] END) AS bg
        |  FROM t),
        |c AS (SELECT source, bg, count(*) AS c FROM g
        |  GROUP BY source, bg)
        |SELECT source, count(*) AS n_types, sum(c)::BIGINT AS n_bigrams,
        |  round(count(*)::DOUBLE / sum(c), 6) AS ttr
        |FROM c GROUP BY source ORDER BY source ASC""".stripMargin,

    // t22: token-set intersect against the same two-word list.
    "t22_blocklist_gate" ->
      """SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN len(list_intersect(string_split(text, ' '),
        |      ['slow', 'big'])) > 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_flagged,
        |  count(*) - sum(CASE WHEN len(list_intersect(
        |      string_split(text, ' '), ['slow', 'big'])) > 0
        |    THEN 1 ELSE 0 END)::BIGINT AS n_clean
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin,

    "t9_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, w,
        |    CASE WHEN len(w) >= 3
        |      THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |            for i in range(1, len(w) - 1)]
        |      ELSE []::VARCHAR[] END AS grams
        |  FROM t)
        |SELECT doc_id, len(w) AS n_tok,
        |  round(CASE WHEN len(grams) > 0
        |    THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
        |    ELSE 0.0 END, 6) AS trigram_dup_ratio,
        |  round(list_max(list_transform(list_distinct(w),
        |      t -> len(list_filter(w, x -> x = t)))) * 1.0 / len(w), 6)
        |    AS top_token_ratio
        |FROM g ORDER BY trigram_dup_ratio DESC, doc_id ASC
        |LIMIT 50""".stripMargin,

    "t8_redaction_stats" ->
      """WITH r AS (
        |  SELECT event_type, props,
        |    regexp_replace(regexp_replace(props,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'), '[0-9]+', '<NUM>', 'g') AS redacted
        |  FROM events)
        |SELECT event_type, count(*) AS n_rows,
        |  sum(CASE WHEN redacted <> props THEN 1 ELSE 0 END)::BIGINT
        |    AS n_changed,
        |  count(DISTINCT md5(redacted)) AS n_distinct_redacted
        |FROM r GROUP BY event_type ORDER BY event_type ASC""".stripMargin)
}
