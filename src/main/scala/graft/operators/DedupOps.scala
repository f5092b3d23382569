package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps

/** Content-based deduplication over the `documents` table — the
  * training-data-pipeline extension surface (reference intent:
  * `hashlib` imported and never used, ethical_crawler.py:16; UNIQUE
  * key dedup at :843 is the only dedup the reference ships).
  *
  * Four tiers:
  *  1. [[exactDedup]] — hash of normalized text, keep-first. One
  *     shuffle on the 128-bit key; at 100 TB this is the standard
  *     hash-partitioned exact dedup.
  *  2. [[jaccardPairs]] — EXACT n-gram-shingle Jaccard via a
  *     shared-shingle equi-join (never all-pairs: only documents
  *     sharing at least one shingle are paired). Ground truth for 3.
  *  3. [[minhashPairs]] — MinHash signatures + banded LSH: candidates
  *     come from an equi-join on (band, band-signature), then are
  *     verified with exact Jaccard. This is the 100 TB path — the
  *     shared-shingle join of tier 2 degrades as shingle document
  *     frequency grows, while band buckets stay O(dups + ε).
  *  4. [[simhash]] — 60-bit SimHash fingerprints (near-dup candidates
  *     = small Hamming distance; banding over bit-ranges at scale).
  *
  * Every hash here is an arithmetic composition over md5 hex —
  * expressible identically in ANSI SQL — so even the MinHash/LSH
  * pipeline hash-matches the DuckDB oracle, band for band.
  */
object DedupOps {

  /** Mersenne prime 2^31−1: the universal-hash modulus. a·x+b stays
    * under 2^62 for a,b,x < P, so the arithmetic never overflows a
    * signed 64-bit in either engine.
    */
  val P: Long = 2147483647L

  /** Fixed universal-hash family (a_i, b_i) for MinHash. Constants are
    * arbitrary odd numbers < P, pinned for determinism and shared with
    * the oracle-SQL generator.
    */
  val MinhashSeeds: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1588635695L, 1117695901L),
    (784588716L, 805306457L), (387420489L, 268435399L),
    (1259921049L, 1500450271L), (1882436117L, 715225739L),
    (1642261667L, 97612893L), (1171077619L, 865018571L),
    (2097152993L, 492876847L), (1325401057L, 967739369L),
    (1979339333L, 52361087L), (1564116521L, 1412858213L),
    (1866894511L, 179424673L), (1047297989L, 373587883L),
    (1711655837L, 15485863L), (1446968261L, 982451653L))

  /** Bands of `bandRows` consecutive signature rows each. 8×2 over 16
    * hashes: P(candidate | J=0.8) ≈ 1−(1−0.8²)^8 ≈ 0.9998.
    */
  val BandRows = 2
  val NumBands: Int = MinhashSeeds.size / BandRows

  /** Whitespace-collapsed, trimmed, lowercased text (the normalization
    * under the content hash).
    */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** 128-bit content key of the normalized text — single-pass
    * [[graft.functions.ContentKey]] expression (the composed
    * [[contentKeyHof]] pays a Java-regex scan per row; differential-
    * tested equal).
    */
  def contentKey(text: Column): Column =
    call_function("graft_content_key", text)

  /** Composed built-in formulation of [[contentKey]] — the
    * differential reference for the expression.
    */
  def contentKeyHof(text: Column): Column = md5(normalized(text))

  /** Exact content dedup, first-write-wins by `orderCol`, keeping the
    * content key as `keyName` in the output — the md5 is computed ONCE
    * (as a column the window partitions on) instead of once for the
    * shuffle key and again for any downstream projection.
    */
  def exactDedupKeyed(df: DataFrame, textCol: String, orderCol: String,
      keyName: String): DataFrame = {
    val keyed = df.withColumn(keyName, contentKey(col(textCol)))
    val w = Window.partitionBy(col(keyName)).orderBy(col(orderCol).asc)
    keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup, first-write-wins by `orderCol` (same batch
    * semantics as the key-based K5 dedup — ethical_crawler.py:915).
    */
  def exactDedup(df: DataFrame, textCol: String, orderCol: String)
      : DataFrame =
    exactDedupKeyed(df, textCol, orderCol, "__ck").drop("__ck")

  /** Distinct word n-gram shingles per document: (idCol, shingle),
    * via the single-pass [[graft.functions.WordShingles]] expression.
    * Words are split on single spaces (the corpus is single-spaced;
    * the oracle splits identically).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3)
      : DataFrame =
    graft.FanOut.byKey(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        explode(call_function("graft_shingles", col(textCol), lit(n)))
          .as("shingle"))

  /** Composed built-in formulation of [[shingles]] (four higher-order
    * passes) — the differential reference for the expression. Guarded
    * for docs shorter than n (Spark's `sequence(1, k)` counts DOWN
    * when k < 1).
    */
  def shinglesHof(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val words = split(col(textCol), " ")
    val grams = transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(words, i + o)): _*))
    val guarded = when(size(words) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(guarded).as("shingle"))
  }

  /** (idCol, x) where x is the 60-bit md5 integer of each distinct
    * shingle: all downstream joins/groupings key on this fixed-width
    * long instead of the shingle STRING — ~2.5× less shuffle volume
    * and cheaper hash/compare, with identical semantics (60-bit
    * collisions are negligible AND deterministic, and the oracle SQL
    * applies the same hash, so results still match row-for-row).
    */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    shingles(df, idCol, textCol, n).select(col(idCol),
      conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")
        .as("x"))

  /** Document-frequency cap over a (idCol, x) shingle relation: drops
    * every shingle occurring in more than `maxDf` documents BEFORE any
    * shared-shingle join. A boilerplate trigram shared by 10⁸ docs
    * makes its join key a df² hot spot at 100 TB; rare shingles carry
    * the near-dup signal, so the standard practice is to cut the hot
    * tail (set `maxDf` relative to corpus size, e.g. 2% of |docs|).
    * One window count over the same x-shuffle the downstream join
    * needs anyway; `Int.MaxValue` disables the cap.
    */
  def capShingleDf(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else sh
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("x"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")

  /** Blacklist form of [[capShingleDf]] for consumers whose downstream
    * operators shuffle on the DOCUMENT id, never on `x` (minhashPairs'
    * signature aggregation groups by doc): there the window form's
    * x-exchange (+ per-partition sort) is never reused, so it is pure
    * overhead. Hot shingles are by definition FEW, so the over-limit
    * set is computed with a map-side-combined groupBy (shuffles only
    * (x, partial-count), not the full relation) and removed via a
    * broadcast anti-join — the main relation never exchanges at all.
    * Identical semantics, same oracle SQL ([[capSql]]).
    */
  def capShingleDfBlacklist(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else sh.join(
      broadcast(sh.groupBy(col("x")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select(col("x"))),
      Seq("x"), "left_anti")
      // the using-column join moves `x` first; restore the input's
      // column order so both cap forms return the SAME relation
      .select(sh.columns.map(col).toIndexedSeq: _*)

  /** SQL mirror of [[capShingleDf]]: rewrites the shingle CTE `src`
    * (columns `keyCol, x`) to its df-capped subset.
    */
  private def capSql(src: String, keyCol: String, maxDf: Int): String =
    s"""(SELECT $keyCol, x FROM $src
       |  JOIN (SELECT x FROM $src GROUP BY x
       |        HAVING count(*) <= $maxDf) USING (x))""".stripMargin

  /** Pair intersection counts from a (idCol, x, n_sh) relation.
    * Both join sides are the SAME child (renames happen after the
    * join) so the input computes once; |doc| rides along as na/nb so
    * no post-aggregate join against a sizes table is needed
    * (any_value is deterministic: n_sh is constant per id).
    */
  private def pairCounts(shS: DataFrame, idCol: String): DataFrame =
    shS.as("A").join(shS.as("B"),
        col("A.x") === col("B.x") &&
        col(s"A.$idCol") < col(s"B.$idCol"))
      .select(col(s"A.$idCol").as("id_a"), col(s"B.$idCol").as("id_b"),
        col("A.n_sh").as("na"), col("B.n_sh").as("nb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"),
        any_value(col("na")).as("na"), any_value(col("nb")).as("nb"))

  // The threshold applies to the UNROUNDED ratio (only the OUTPUT is
  // rounded to 6 dp): thresholding the rounded value would admit pairs
  // with true J in [t − 5e-7, t) — pairs the PPJoin prefix theorem
  // (n33) never generates candidates for, so the two formulations
  // could diverge on a boundary pair. Both engines compute the ratio
  // in IEEE double (DuckDB's `i * 1.0 / u` types as DOUBLE), so the
  // unrounded compare agrees exactly; [[jaccardPairsSql]] is the twin.
  private def jaccardOf(pairs: DataFrame, minJaccard: Double): DataFrame =
    pairs
      .withColumn("__j",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("__j") >= minJaccard)
      .select(col("id_a"), col("id_b"),
        round(col("__j"), 6).as("jaccard"))
      .orderBy(col("id_a").asc, col("id_b").asc)

  /** EXACT Jaccard near-dup pairs (tier 2). Candidates = pairs sharing
    * ≥1 shingle (equi-join on the hashed shingle), intersection counted
    * from that same join, union by |A|+|B|−|A∩B|. Returns
    * (id_a, id_b, jaccard) with jaccard ≥ `minJaccard`, rounded 6 dp.
    * Every consumer scans the one cached shingle relation, so shingle
    * generation (explode + md5) runs once, not per consumer.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : DataFrame = {
    // Jaccard is computed over the df-capped shingle universe (sizes
    // included), so similarity stays a true set measure of the
    // signal-carrying shingles and the oracle applies the same cap.
    val sh = capShingleDf(hashedShingles(df, idCol, textCol, n), maxDf)
      .cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    // Sizes join AFTER the pair aggregate here (unlike minhashPairs):
    // attaching n_sh to all 260k+ shingle rows first costs an extra
    // exchange on the id that outweighs the two AQE-broadcast joins
    // on the (filtered-small) aggregate output — measured 1.8 s vs
    // 3.6 s at sf0.1. Both sides scan the same cached shingle
    // relation, so shingle generation runs once.
    val a = sh.select(col(idCol).as("id_a"), col("x"))
    val b = sh.select(col(idCol).as("id_b"), col("x"))
    val inter = a.join(b, Seq("x"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"))
    jaccardOf(
      inter
        .join(sizes.withColumnRenamed(idCol, "id_a")
          .withColumnRenamed("n_sh", "na"), Seq("id_a"))
        .join(sizes.withColumnRenamed(idCol, "id_b")
          .withColumnRenamed("n_sh", "nb"), Seq("id_b")),
      minJaccard)
  }

  /** PREFIX-FILTERED candidate pairs (PPJoin's prefix principle,
    * WWW'08): under ANY fixed global order of the shingle universe,
    * two sets with Jaccard ≥ t must share an element among each
    * set's first `|x| − ⌈t·|x|⌉ + 1` elements — so the candidate
    * join runs over PREFIXES only, not all shared shingles. With the
    * rare-first order (df asc, x asc) the candidate volume drops
    * from Σ_x df(x)² to the same sum over prefix occurrences — at
    * 100 TB this is the difference between joining every shared
    * boilerplate trigram and joining only each doc's rarest few.
    * Completeness sketch: if the prefixes were disjoint, every
    * common element would rank past the shorter prefix's last
    * element, forcing |x∩y| ≤ ⌈t|x|⌉ − 1 < t·|x| ≤ t·|x∪y| — which
    * contradicts Jaccard ≥ t.
    *
    * The threshold rides an exact RATIONAL `tNum/tDen` (b1's integer
    * convention): ⌈t·n⌉ = (tNum·n + tDen − 1) div tDen keeps every
    * operand POSITIVE — Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, so negative-operand tricks would drift
    * between engines. The per-doc rank is a window PARTITIONED BY
    * the doc (bounded by doc size, never a global window).
    */
  def prefixCandidates(sh: DataFrame, idCol: String, tNum: Int,
      tDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val dfRel = sh.groupBy(col("x")).agg(count(lit(1)).as("df"))
    val pref = sh.join(dfRel, "x").join(sizes, idCol)
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("df").asc, col("x").asc)))
      .filter(col("__rnk") <=
        col("n_sh") - expr(s"($tNum * n_sh + ${tDen - 1}) div $tDen")
          + lit(1))
      .select(col(idCol), col("x"), col("__rnk"), col("n_sh"))
    // The OTHER TWO PPJoin pruning rules ride the same join, both in
    // exact rational arithmetic (round-10 verdict item 6):
    //  - LENGTH filter: J ≥ t ⇒ min(|x|,|y|)/max(|x|,|y|) ≥ t
    //    (J ≤ min/max), so size-mismatched pairs die before dedup;
    //  - POSITIONAL filter: for the globally-FIRST common element,
    //    at (1-based) full-list positions (i, j), the overlap is
    //    bounded by 1 + min(|x|−i, |y|−j), and J ≥ t needs overlap
    //    ≥ α = ⌈tNum·(|x|+|y|) / (tNum+tDen)⌉. PPJoin (WWW'08)
    //    proves the first common element lies inside BOTH prefixes,
    //    so keeping pairs where ANY shared prefix element passes the
    //    bound keeps that witness — a superset of the true pairs
    //    (complete), a subset of prefix-only candidates (cheaper).
    val a = pref.select(col(idCol).as("id_a"), col("x"),
      col("__rnk").as("ra"), col("n_sh").as("na"))
    val b = pref.select(col(idCol).as("id_b"), col("x"),
      col("__rnk").as("rb"), col("n_sh").as("nb"))
    a.join(b, Seq("x"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")) * tDen >=
        greatest(col("na"), col("nb")) * tNum)
      .filter(lit(1L) +
        least(col("na") - col("ra"), col("nb") - col("rb")) >=
        expr(s"($tNum * (na + nb) + ${tNum + tDen - 1})" +
          s" div ${tNum + tDen}"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** [[jaccardPairs]] recomputed through [[prefixCandidates]]: the
    * shingle relation is first SEMI-JOIN-restricted to docs that
    * appear in any candidate pair, then the shared-shingle
    * intersection count runs over that restricted relation and is
    * semi-joined to the candidate pairs. At corpus scale the
    * candidate-doc set tracks the true near-dup density, so the
    * restricted Σ df² co-occurrence mass is a sliver of the full
    * one. (A first formulation expanded candidate pairs × full doc
    * shingles — measured 7× SLOWER than n3 at ×4 replication because
    * |cand|·|doc| dwarfs the Σ df² it was avoiding; the semi-join
    * restriction is the shape that actually scales.) The prefix
    * theorem makes the result EQUAL to the all-shared-shingle
    * formulation, so n33 is held to n3's oracle SQL verbatim — a
    * different algorithm hash-gated to the same answer.
    */
  def prefixFilteredJaccardPairs(df: DataFrame, idCol: String,
      textCol: String, tNum: Int, tDen: Int, n: Int = 3,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = capShingleDf(hashedShingles(df, idCol, textCol, n), maxDf)
      .cache()
    val cand = prefixCandidates(sh, idCol, tNum, tDen).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val candDocs = cand.select(col("id_a").as(idCol))
      .unionByName(cand.select(col("id_b").as(idCol))).distinct()
    val shR = sh.join(candDocs, Seq(idCol), "left_semi")
    val inter = shR.select(col(idCol).as("id_a"), col("x"))
      .join(shR.select(col(idCol).as("id_b"), col("x")), Seq("x"))
      .filter(col("id_a") < col("id_b"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"))
    jaccardOf(
      inter
        .join(sizes.withColumnRenamed(idCol, "id_a")
          .withColumnRenamed("n_sh", "na"), Seq("id_a"))
        .join(sizes.withColumnRenamed(idCol, "id_b")
          .withColumnRenamed("n_sh", "nb"), Seq("id_b")),
      tNum.toDouble / tDen)
  }

  /** Universal hash over the 60-bit shingle value (mod-P then affine
    * mod-P: a·(x mod P)+b < 2^62, no overflow either engine;
    * `conv(hex,16,10)` and DuckDB's `('0x'||hex)::BIGINT` agree
    * exactly — both unsigned-decode 15 hex chars = 60 bits < 2^63).
    */
  private def minhashExpr(x: Column, a: Long, b: Long): Column =
    pmod(lit(a) * pmod(x, lit(P)) + lit(b), lit(P))

  /** MinHash signatures from [[hashedShingles]] output: one row per
    * doc, columns h0..h{m−1}. Single shuffle (groupBy doc) carrying m
    * running minima — map-side partial aggregation keeps the shuffle
    * tiny.
    */
  def minhashSignatures(sh: DataFrame, idCol: String): DataFrame = {
    val aggs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      min(minhashExpr(col("x"), a, b)).as(s"h$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** (idCol, band, sig) LSH bucket relation from [[minhashSignatures]]
    * output — the equi-join key space candidates come from.
    */
  private[graft] def bandRelation(sigs: DataFrame, idCol: String): DataFrame =
    sigs.select(
      col(idCol),
      explode(array((0 until NumBands).map { k =>
        struct(
          lit(k).as("band"),
          concat_ws("_",
            (0 until BandRows).map(r => col(s"h${k * BandRows + r}")): _*)
            .as("sig"))
      }: _*)).as("bs"))
      .select(col(idCol), col("bs.band"), col("bs.sig"))

  /** Banded-LSH near-dup pairs, exact-verified (tier 3).
    * Candidates: equi-join on (band index, band signature) — never
    * all-pairs. Each candidate pair is then verified with exact
    * Jaccard computed from the shingle sets, so the output is a
    * (possibly proper, with vanishing probability) subset of
    * [[jaccardPairs]] and is fully deterministic.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : DataFrame = {
    // Same df-capped universe as [[jaccardPairs]] (signatures, sizes
    // and verification all see the capped set), so the two tiers stay
    // mutually consistent under the same maxDf. Unlike n3, nothing
    // downstream here shuffles on `x`, so the cap is applied via the
    // broadcast blacklist (no exchange of the main relation).
    val raw = hashedShingles(df, idCol, textCol, n).cache()
    val sh = capShingleDfBlacklist(raw, maxDf)
    // Signatures and per-doc shingle counts come out of ONE groupBy —
    // a separate `sizes` aggregation would re-shuffle the full shingle
    // relation on the same doc-id key (the aggregates differ, so
    // ReuseExchange can't merge the two plans). One row per doc, 17
    // columns: small enough that both consumers (bands, sizes) read a
    // cached relation instead of re-aggregating.
    val sigsSized = {
      val aggs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
        min(minhashExpr(col("x"), a, b)).as(s"h$i")
      } :+ count(lit(1)).as("n_sh")
      sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }.cache()
    val bands = bandRelation(sigsSized, idCol)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
      .cache()
    // Exact verify on candidates only: the shingle self-join is
    // restricted to candidate documents FIRST (left-semi against the
    // candidate id set), so verification cost tracks the number of
    // near-duplicates, not Σ df² over the whole corpus — the property
    // that keeps this the 100 TB path while n3 is the ground truth.
    val candIds = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol)))
      .distinct()
    val sizes = sigsSized.select(col(idCol), col("n_sh"))
    val shCand = sh.join(candIds, Seq(idCol), "left_semi")
      .join(sizes, Seq(idCol)) // sizes attached pre-join (see n3)
    val inter = pairCounts(shCand, idCol)
    jaccardOf(cand.join(inter, Seq("id_a", "id_b")), minJaccard)
  }

  /** Benchmark decontamination: for each document of a held-out
    * benchmark set, the corpus documents sharing at least `minShared`
    * word n-grams — the overlap check every training corpus runs
    * against its eval sets before release. Same hashed-shingle
    * equi-join shape as [[jaccardPairs]] (never all-pairs; candidates
    * only where a shingle matches), asymmetric across the two inputs.
    */
  def crossCorpusOverlap(benchmark: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, minShared: Int, n: Int = 3,
      maxDf: Int = Int.MaxValue): DataFrame =
    crossCorpusOverlapHashed(
      hashedShingles(benchmark, idCol, textCol, n)
        .select(col(idCol).as("bench_id"), col("x")),
      hashedShingles(corpus, idCol, textCol, n)
        .select(col(idCol).as("corpus_id"), col("x")),
      minShared, maxDf)

  /** [[crossCorpusOverlap]] over pre-hashed (bench_id|corpus_id, x)
    * shingle relations — lets callers whose benchmark and corpus come
    * from the SAME table share one cached shingle pass instead of
    * exploding and hashing the text twice.
    */
  def crossCorpusOverlapHashed(sa: DataFrame, sb0: DataFrame,
      minShared: Int, maxDf: Int = Int.MaxValue): DataFrame = {
    // The df cap is a CORPUS property (boilerplate lives in the big
    // side); capping the corpus side alone bounds the join, since the
    // join is inner on x.
    val sb = capShingleDf(sb0, maxDf)
    sa.join(sb, Seq("x"))
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy(col("bench_id").asc, col("corpus_id").asc)
  }

  /** BLOOM-PREFILTERED decontamination — [[crossCorpusOverlapHashed]]
    * with Spark's own runtime-filter machinery made explicit: a
    * BloomFilter over the BENCHMARK shingle keys (the small side,
    * ~1.2 MB at a million keys) is built as a 1-row aggregate and
    * referenced as a SCALAR SUBQUERY, so `might_contain` applies in
    * the CORPUS SCAN STAGE — non-matching corpus shingles die before
    * the join shuffle ever sees them. Exactness is free: a bloom has
    * no false negatives, so every truly-shared shingle survives the
    * prune, and false positives are dropped by the inner join that
    * follows — the result is row-identical to the exact tier (same
    * oracle). This is the InjectRuntimeFilter shape
    * (spark/sql/catalyst/optimizer/InjectRuntimeFilter.scala) under
    * user control: at 100 TB the alternative — shuffling every corpus
    * shingle to meet the benchmark side — moves ~10⁴× more bytes than
    * the bloom prunes for.
    */
  def crossCorpusOverlapBloomHashed(spark: SparkSession,
      sa: DataFrame, sb0: DataFrame, minShared: Int,
      maxDf: Int = Int.MaxValue, estItems: Long = 1000000L)
      : DataFrame = {
    val sb = capShingleDf(sb0, maxDf)
    // Temp views resolve against the DataFrames' OWN session (a
    // passed-in `spark` from a different session would read a stale
    // or missing view), and fixed names would let two concurrent
    // callers clobber each other — so the views are UUID-suffixed,
    // registered and queried on `sa.sparkSession`, and dropped as
    // soon as `sql()` has analyzed the plan (analysis inlines the
    // view, so the returned DataFrame no longer references it).
    val ss = sa.sparkSession
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val benchView = s"graft_bloom_bench_$tag"
    val corpusView = s"graft_bloom_corpus_$tag"
    sa.createOrReplaceTempView(benchView)
    sb.createOrReplaceTempView(corpusView)
    // The scalar subquery is the only SQL-surface-only piece:
    // BloomFilterMightContain type-checks its bloom side as a
    // constant or subquery, exactly how the optimizer's own injected
    // filters are shaped.
    val pruned =
      try ss.sql(
        s"""SELECT corpus_id, x FROM $corpusView
           |WHERE graft_might_contain(
           |  (SELECT graft_bloom_agg(x, ${estItems}L)
           |   FROM $benchView), x)""".stripMargin)
      finally {
        ss.catalog.dropTempView(benchView)
        ss.catalog.dropTempView(corpusView)
      }
    sa.join(pruned, Seq("x"))
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy(col("bench_id").asc, col("corpus_id").asc)
  }

  /** Banded-LSH decontamination — the 100 TB path for
    * [[crossCorpusOverlap]], which joins EVERY shared shingle across
    * the two corpora. Candidates come from a (band, band-signature)
    * equi-join between benchmark and corpus MinHash signatures (cost
    * tracks near-duplicate count, not shared-shingle volume); each
    * candidate pair is then verified with the exact shared-shingle
    * count, so the output is the high-similarity subset of the exact
    * tier — the contamination that actually matters (a benchmark doc
    * near-duplicated in the training corpus), fully deterministic and
    * oracle-expressible with the same seeds.
    */
  def crossCorpusOverlapBanded(benchmark: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, minShared: Int, n: Int = 3,
      maxDf: Int = Int.MaxValue): DataFrame =
    crossCorpusOverlapBandedHashed(
      hashedShingles(benchmark, idCol, textCol, n)
        .select(col(idCol).as("bench_id"), col("x")),
      hashedShingles(corpus, idCol, textCol, n)
        .select(col(idCol).as("corpus_id"), col("x")),
      minShared, maxDf)

  /** [[crossCorpusOverlapBanded]] over pre-hashed shingle relations —
    * same sharing rationale as [[crossCorpusOverlapHashed]].
    */
  def crossCorpusOverlapBandedHashed(sa0: DataFrame, sb0: DataFrame,
      minShared: Int, maxDf: Int = Int.MaxValue): DataFrame = {
    val sa = sa0.cache()
    val sb = capShingleDf(sb0, maxDf).cache()
    val bandsA = bandRelation(minhashSignatures(sa, "bench_id"),
      "bench_id")
    val bandsB = bandRelation(minhashSignatures(sb, "corpus_id"),
      "corpus_id")
    val cand = bandsA.join(bandsB, Seq("band", "sig"))
      .select(col("bench_id"), col("corpus_id"))
      .distinct()
      .cache()
    // exact verify restricted to candidates (left-semi both sides
    // BEFORE the shingle join, like minhashPairs)
    val saC = sa.join(cand.select("bench_id").distinct(),
      Seq("bench_id"), "left_semi")
    val sbC = sb.join(cand.select("corpus_id").distinct(),
      Seq("corpus_id"), "left_semi")
    saC.join(sbC, Seq("x"))
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .join(cand, Seq("bench_id", "corpus_id"), "left_semi")
      .filter(col("shared") >= minShared)
      .orderBy(col("bench_id").asc, col("corpus_id").asc)
  }

  /** Persisted MinHash SIGNATURE STORE — the incremental-maintenance
    * form of near-dup dedup: instead of recomputing the whole banded
    * pipeline per batch (c3's shape), the corpus's df-capped shingle
    * relation and its (band, sig) index are materialized ONCE at
    * init, and each arriving batch is gated against the STORE — one
    * band equi-join + candidate-restricted exact verification, cost
    * proportional to the batch and its true near-dups, never to the
    * corpus. This is how a 100 TB ingest actually runs dedup: the
    * store is the state, batches stream through it.
    *
    * Layout: `root/shingles` = (corpus_id, x) df-capped at init;
    * `root/bands` = (corpus_id, band, sig). The df-cap blacklist is
    * frozen at the init snapshot — the honest incremental caveat
    * (periodic re-init refreshes it, exactly like production LSH
    * stores rotate their bucket indexes).
    */
  def initSignatureStore(docs: DataFrame, idCol: String,
      textCol: String, root: String, maxDf: Int): Unit = {
    val sh = capShingleDf(
      hashedShingles(docs, idCol, textCol)
        .select(col(idCol).as("corpus_id"), col("x")), maxDf)
      .cache()
    sh.write.mode("overwrite").parquet(s"$root/shingles")
    bandRelation(minhashSignatures(sh, "corpus_id"), "corpus_id")
      .write.mode("overwrite").parquet(s"$root/bands")
    sh.unpersist()
    ()
  }

  /** Gate a batch against the store: batch docs near-duplicating a
    * stored doc (banded candidates, exact shared-shingle count ≥
    * `minShared` — [[crossCorpusOverlapBandedHashed]] semantics
    * verbatim) are REJECTED; novel docs' shingles and bands are
    * appended to the store (batch side is uncapped, like the bench
    * side of c3 — the cap is a corpus property). Returns the
    * per-`srcCol` ingest report: batch size, rejected, appended.
    */
  def appendIfNovel(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, root: String, minShared: Int): DataFrame = {
    import graft.Sorting.ResultSortOps
    val spark = docs.sparkSession
    val sa = hashedShingles(docs, idCol, textCol)
      .select(col(idCol).as("bench_id"), col("x")).cache()
    val storedSh = spark.read.parquet(s"$root/shingles")
    val storedBands = spark.read.parquet(s"$root/bands")
    val bandsA = bandRelation(minhashSignatures(sa, "bench_id"),
      "bench_id")
    val cand = bandsA.join(storedBands, Seq("band", "sig"))
      .select(col("bench_id"), col("corpus_id")).distinct().cache()
    val saC = sa.join(cand.select("bench_id").distinct(),
      Seq("bench_id"), "left_semi")
    val sbC = storedSh.join(cand.select("corpus_id").distinct(),
      Seq("corpus_id"), "left_semi")
    // localCheckpoint (EAGER), not cache: the novel-doc append below
    // writes into the very paths this plan reads, and Spark
    // invalidates caches over written paths — a lazily-cached plan
    // would silently recompute the gate against the GROWN store and
    // reject the batch's own novel docs. Checkpointing materializes
    // the verdict against the pre-append snapshot and severs lineage.
    // Identity candidates (bench_id == corpus_id) mean this exact doc
    // id is ALREADY in the store — a replayed batch after a failure.
    // They auto-reject regardless of `minShared`: a doc with fewer
    // than minShared shingles can never reach shared >= minShared even
    // against its own earlier copy, and without this rule a replay
    // would re-append it, duplicating store rows. (Identity candidates
    // are guaranteed for any stored doc with >= 1 shingle, since its
    // replayed signature matches every band of its stored copy.)
    val rejected = saC.join(sbC, Seq("x"))
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .join(cand, Seq("bench_id", "corpus_id"), "left_semi")
      .filter(col("shared") >= minShared)
      .select(col("bench_id"))
      .union(cand.filter(col("bench_id") === col("corpus_id"))
        .select(col("bench_id")))
      .distinct().localCheckpoint()
    val novelSh = sa.join(rejected, Seq("bench_id"), "left_anti")
      .select(col("bench_id").as("corpus_id"), col("x"))
    novelSh.write.mode("append").parquet(s"$root/shingles")
    bandRelation(minhashSignatures(novelSh, "corpus_id"), "corpus_id")
      .write.mode("append").parquet(s"$root/bands")
    // both appends are materialized above; the report below depends
    // only on `docs` + the checkpointed verdict — release the cached
    // relations so a long-running per-batch caller (signatureGateSink)
    // doesn't accumulate executor storage until LRU eviction
    sa.unpersist()
    cand.unpersist()
    docs.select(col(idCol), col(srcCol))
      .join(rejected, col(idCol) === col("bench_id"), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_batch"),
        count(col("bench_id")).as("n_rejected"))
      .select(col(srcCol), col("n_batch"), col("n_rejected"),
        (col("n_batch") - col("n_rejected")).as("n_appended"))
      .resultSorted(col(srcCol).asc)
  }

  /** Oracle twin of [[crossCorpusOverlapBanded]] with the benchmark
    * set selected by `doc_id % modulus = 0` — same seeds, same bands,
    * same verification, in SQL.
    */
  def crossCorpusOverlapBandedSql(table: String, idCol: String,
      textCol: String, modulus: Int, minShared: Int, n: Int = 3,
      maxDf: Int = Int.MaxValue): String = {
    val minExprs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * (x % $P) + $b) % $P) AS h$i"
    }.mkString(",\n    ")
    def bandSelects(src: String, id: String) = (0 until NumBands).map { k =>
      val sig = (0 until BandRows).map(r => s"h${k * BandRows + r}")
        .mkString(", ")
      s"SELECT $id, $k AS band, concat_ws('_', $sig) AS sig FROM $src"
    }.mkString("\n  UNION ALL\n  ")
    val bDef =
      if (maxDf == Int.MaxValue) "SELECT corpus_id, x FROM b0"
      else capSql("b0", "corpus_id", maxDf).stripPrefix("(")
        .stripSuffix(")")
    s"""WITH sh0 AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |hx AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |a AS (SELECT $idCol AS bench_id, x FROM hx
       |      WHERE $idCol % $modulus = 0),
       |b0 AS (SELECT $idCol AS corpus_id, x FROM hx
       |      WHERE $idCol % $modulus <> 0),
       |b AS ($bDef),
       |sigsA AS (SELECT bench_id, $minExprs FROM a GROUP BY bench_id),
       |sigsB AS (SELECT corpus_id, $minExprs FROM b GROUP BY corpus_id),
       |bandsA AS (
       |  ${bandSelects("sigsA", "bench_id")}),
       |bandsB AS (
       |  ${bandSelects("sigsB", "corpus_id")}),
       |cand AS (
       |  SELECT DISTINCT bench_id, corpus_id
       |  FROM bandsA JOIN bandsB USING (band, sig))
       |SELECT s.bench_id, s.corpus_id, s.shared FROM (
       |  SELECT bench_id, corpus_id, count(*) AS shared
       |  FROM a JOIN b USING (x)
       |  GROUP BY 1, 2) s
       |JOIN cand USING (bench_id, corpus_id)
       |WHERE s.shared >= $minShared
       |ORDER BY bench_id ASC, corpus_id ASC""".stripMargin
  }

  /** Maintenance for the signature store: every [[appendIfNovel]]
    * leaves one small parquet file per relation per batch, so a
    * long-running ingest accumulates file debris exactly like a CoW
    * table between OPTIMIZE runs. Rewrites both relations into
    * `targetFiles` files (content-identical — the spec holds the
    * gate's verdicts unchanged across a compaction) with a
    * write-then-swap so a crash mid-compaction leaves either the old
    * or the new layout, never a mix. Single-maintainer assumption,
    * like [[graft.Versioned.vacuum]]: do not run concurrently with a
    * gate on the same store.
    */
  def compactSignatureStore(spark: org.apache.spark.sql.SparkSession,
      root: String, targetFiles: Int = 8): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    Seq("shingles", "bands").foreach { rel =>
      val cur = new org.apache.hadoop.fs.Path(s"$root/$rel")
      val fs = cur.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(s"$root/${rel}__compacting")
      val old = new org.apache.hadoop.fs.Path(s"$root/${rel}__old")
      // Recovery preamble: a crash between the two renames below
      // leaves no live directory at `cur` with the pre-compaction
      // data parked at `__old` — roll it back before proceeding.
      // Stale `__old` (crash before its delete) and `__compacting`
      // (crash before the first rename) are never the live copy and
      // are safe to clear unconditionally.
      if (!fs.exists(cur) && fs.exists(old)) { fs.rename(old, cur); () }
      if (fs.exists(old)) { fs.delete(old, true); () }
      if (fs.exists(tmp)) { fs.delete(tmp, true); () }
      spark.read.parquet(cur.toString).coalesce(targetFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.rename(cur, old)
      fs.rename(tmp, cur)
      fs.delete(old, true)
      // the swap happened at the filesystem level, beneath Spark's
      // file-listing cache — invalidate it or the next gate reads the
      // pre-compaction listing and hits deleted part files
      spark.catalog.refreshByPath(cur.toString)
      ()
    }
  }

  /** Oracle twin of [[initSignatureStore]] + [[appendIfNovel]] with
    * the batch selected by `doc_id % modulus = 0`: since the store is
    * initialized from the complementary slice and gated once, the
    * report is exactly the per-source rollup of the banded
    * cross-corpus overlap's distinct bench ids — the incremental
    * path must agree with the full recompute.
    */
  def appendIfNovelSql(table: String, idCol: String, srcCol: String,
      textCol: String, modulus: Int, minShared: Int,
      maxDf: Int = Int.MaxValue): String = {
    val base = crossCorpusOverlapBandedSql(table, idCol, textCol,
      modulus, minShared, 3, maxDf)
    val marker = "SELECT s.bench_id, s.corpus_id, s.shared FROM ("
    val idx = base.lastIndexOf(marker)
    require(idx >= 0, "crossCorpusOverlapBandedSql shape changed")
    val (ctes, finalSel) = base.splitAt(idx)
    val overl = finalSel
      .replace("ORDER BY bench_id ASC, corpus_id ASC", "")
    s"""${ctes.stripSuffix("\n")},
       |overl AS (
       |$overl),
       |contaminated AS (SELECT DISTINCT bench_id FROM overl),
       |batch AS (SELECT $idCol, $srcCol FROM $table
       |  WHERE $idCol % $modulus = 0)
       |SELECT $srcCol, count(*) AS n_batch,
       |  count(c.bench_id)::BIGINT AS n_rejected,
       |  (count(*) - count(c.bench_id))::BIGINT AS n_appended
       |FROM batch LEFT JOIN contaminated c ON batch.$idCol = c.bench_id
       |GROUP BY $srcCol ORDER BY $srcCol ASC""".stripMargin
  }

  /** Oracle twin of [[crossCorpusOverlap]] with the benchmark set
    * selected by `doc_id % modulus = 0`.
    */
  def crossCorpusOverlapSql(table: String, idCol: String,
      textCol: String, modulus: Int, minShared: Int, n: Int = 3,
      maxDf: Int = Int.MaxValue): String = {
    val bDef =
      if (maxDf == Int.MaxValue) "SELECT corpus_id, x FROM b0"
      else capSql("b0", "corpus_id", maxDf).stripPrefix("(")
        .stripSuffix(")")
    s"""WITH sh0 AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |hx AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |a AS (SELECT $idCol AS bench_id, x FROM hx
       |      WHERE $idCol % $modulus = 0),
       |b0 AS (SELECT $idCol AS corpus_id, x FROM hx
       |      WHERE $idCol % $modulus <> 0),
       |b AS ($bDef)
       |SELECT bench_id, corpus_id, count(*) AS shared
       |FROM a JOIN b USING (x)
       |GROUP BY 1, 2 HAVING count(*) >= $minShared
       |ORDER BY bench_id ASC, corpus_id ASC""".stripMargin
  }

  /** Connected components over a near-dup pair relation (id_a, id_b):
    * assigns every involved document the MINIMUM doc id reachable in
    * its duplicate cluster — the step that turns pairwise near-dup
    * output into "keep one canonical doc per cluster". Iterative
    * min-label propagation, one join+groupBy per round, converging in
    * O(cluster diameter) rounds (near-dup clusters are near-cliques,
    * so 2–3); the driver only ever sees a per-round change COUNT.
    * At extreme scale the same loop is the large-star/small-star
    * alternating algorithm; the shapes are identical.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // The pair relation is typically the output of an expensive LSH
    // pipeline — cache it ONCE, or the union's two branches re-run it.
    val p = pairs.select(col("id_a"), col("id_b")).cache()
    val sym = p
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    // Iterative plans MUST truncate lineage each round
    // (localCheckpoint): round k's logical plan references round k−1
    // TWICE (via the neighbor aggregate and the join back), so without
    // truncation the plan doubles per round and ANALYSIS time — not
    // execution — explodes exponentially (measured 13 s → 28 s per
    // round at trivial data sizes). On a cluster with reliable storage
    // the same loop uses checkpoint() to survive executor loss.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(labels("id"),
          least(labels("label"),
            coalesce(col("nlabel"), labels("label"))).as("newlabel"),
          labels("label").as("oldlabel"))
        .localCheckpoint() // materializes the round, truncates lineage
      // Round 1 never converges when any edge exists (the larger
      // endpoint of the smallest-id edge always takes a smaller
      // label), so its convergence count is skipped — one action
      // less; an edgeless input just pays one extra (empty) round.
      converged = i > 0 &&
        updated.filter(col("newlabel") =!= col("oldlabel")).count() == 0
      labels = updated.select(col("id"), col("newlabel").as("label"))
      i += 1
    }
    p.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id").asc)
  }

  /** Cluster-size distribution over [[dupClusters]] output — the
    * standard corpus-dedup report (how much of the corpus is
    * duplicated, and in clusters of what size). Two tiny aggregates
    * on top of whatever pair pipeline feeds it; the report row count
    * is the number of DISTINCT sizes, bounded-small at any corpus
    * scale, so the final sort is single-partition.
    */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame = {
    import graft.Sorting.ResultSortOps
    clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz"))
      .agg(count(lit(1)).as("n_clusters"))
      .resultSorted(col("sz").asc)
  }

  /** CANONICAL SELECTION — the step after cluster resolution that
    * actually produces the deduplicated corpus: keep the single best
    * document per near-dup cluster (here best = largest `qualityCol`,
    * doc-id-ascending tiebreak) and report what was kept vs dropped.
    * This is the "keep one representative" policy every production
    * dedup pipeline ends with (URL-dedup keeps the canonical page,
    * near-dup dedup keeps the longest/highest-quality variant).
    *
    * Shape: the cluster relation (|docs-with-dups| rows, tiny next to
    * the corpus) joins the quality column, then one window rank per
    * cluster — a shuffle bounded by the DUPLICATED subset, never the
    * corpus. The report is one row per cluster.
    */
  def keepBestPerCluster(clusters: DataFrame, docs: DataFrame,
      idCol: String, qualityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = docs.select(col(idCol).as("__qid"),
      col(qualityCol).as("__q"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__q").desc, col("doc_id").asc)
    clusters.join(q, col("doc_id") === col("__qid"))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(max(when(col("__rn") === 1, col("doc_id"))).as("keep_id"),
        max(when(col("__rn") === 1, col("__q"))).as("keep_quality"),
        count(lit(1)).as("n_members"),
        sum(when(col("__rn") =!= 1, col("__q")).otherwise(lit(0L)))
          .cast("long").as("dropped_quality"))
      // One row PER CLUSTER — scales with corpus duplication, not a
      // bounded domain, so this output keeps the scalable range sort
      // (resultSorted's single partition would bottleneck at 100 TB).
      .orderBy(col("cluster_id").asc)
  }

  /** Oracle twin of [[keepBestPerCluster]] ∘ [[dupClusters]]: the
    * [[dupClustersSql]] recursive CTE joined to the quality column
    * with a per-cluster rank.
    */
  def keepBestSql(table: String, idCol: String, textCol: String,
      minJaccard: Double, qualityCol: String, n: Int = 3,
      maxDf: Int = Int.MaxValue): String = {
    val base = dupClustersSql(table, idCol, textCol, minJaccard, n, maxDf)
    val tail = "SELECT id AS doc_id, min(r) AS cluster_id\n" +
      "FROM reach GROUP BY id ORDER BY doc_id ASC"
    require(base.endsWith(tail), "dupClustersSql tail changed")
    base.dropRight(tail.length) +
      s""",clusters AS (SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |ranked AS (SELECT c.cluster_id, c.doc_id, d.$qualityCol AS q,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY d.$qualityCol DESC, c.doc_id ASC) AS rn
         |  FROM clusters c JOIN $table d ON d.$idCol = c.doc_id)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
         |  max(CASE WHEN rn = 1 THEN q END) AS keep_quality,
         |  count(*) AS n_members,
         |  sum(CASE WHEN rn <> 1 THEN q ELSE 0 END)::BIGINT
         |    AS dropped_quality
         |FROM ranked GROUP BY cluster_id
         |ORDER BY cluster_id ASC""".stripMargin
  }

  /** Oracle twin of [[clusterSizeHistogram]] ∘ [[dupClusters]]: the
    * [[dupClustersSql]] recursive CTE with the two size aggregates on
    * top.
    */
  def dupClusterSizesSql(table: String, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : String = {
    val base = dupClustersSql(table, idCol, textCol, minJaccard, n, maxDf)
    val tail = "SELECT id AS doc_id, min(r) AS cluster_id\n" +
      "FROM reach GROUP BY id ORDER BY doc_id ASC"
    require(base.endsWith(tail), "dupClustersSql tail changed")
    base.dropRight(tail.length) +
      s""",clusters AS (SELECT id, min(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |szs AS (SELECT cluster_id, count(*) AS sz FROM clusters
         |  GROUP BY cluster_id)
         |SELECT sz, count(*) AS n_clusters FROM szs
         |GROUP BY sz ORDER BY sz ASC""".stripMargin
  }

  /** Oracle twin of [[dupClusters]] over the [[minhashPairsSql]] pair
    * relation: a recursive CTE enumerates every vertex reachable from
    * each doc; the cluster id is the minimum — the fixpoint label
    * propagation converges to.
    */
  // `AS MATERIALIZED` on the non-recursive CTEs: without it DuckDB
  // re-inlines the whole minhash pipeline into BOTH sym branches and
  // every reach iteration (measured 24 s vs 1.2 s at sf0.1 on the
  // c18 shape) — the hint states the obvious evaluate-once
  // semantics the oracle means.
  def dupClustersSql(table: String, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |${minhashPairsSql(table, idCol, textCol, minJaccard, n, maxDf)
          .replace("ORDER BY id_a ASC, id_b ASC", "")}),
       |sym AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id)
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id ASC""".stripMargin

  /** SPLIT-LEAKAGE AUDIT (c18) — proves the safety claim the
    * group-keyed split (c7) makes: near-dup pairs (the minhash-LSH
    * tier) joined against TWO split policies — a naive per-doc hash
    * split, and the cluster-keyed split whose group is the connected
    * near-dup cluster ([[dupClusters]]) — counting pairs whose
    * endpoints land in different splits. The cluster policy must
    * audit to ZERO leaks by construction (a pair's endpoints share a
    * cluster, hence a bucket, hence a split); the doc policy's count
    * is the eval contamination a doc-level random split invites.
    * Scale shape: pairs and clusters are the LSH tier's own bucketed
    * outputs; the audit adds two equi-joins on doc id and one 1-row
    * aggregate unpivoted to the 2-row report.
    */
  def splitLeakageAudit(docs: DataFrame, idCol: String,
      textCol: String, minJaccard: Double, maxDf: Int,
      trainPerMille: Int): DataFrame =
    splitLeakageAuditPrepared(docs,
      minhashPairs(docs, idCol, textCol, minJaccard, maxDf = maxDf)
        .select(col("id_a"), col("id_b")).cache(),
      null, idCol, trainPerMille)

  /** [[splitLeakageAudit]] over PREPARED pair/cluster relations —
    * the serving shape: a production dedup pipeline persists its
    * pair list and cluster assignment once, and every policy audit
    * reads them (`clusters0 = null` re-derives clusters from the
    * pairs, the inline path).
    */
  def splitLeakageAuditPrepared(docs: DataFrame, pairs: DataFrame,
      clusters0: DataFrame, idCol: String, trainPerMille: Int)
      : DataFrame = {
    val clusters = Option(clusters0).getOrElse(dupClusters(pairs))
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val grp = docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("grp"))
    // same md5-permille gate as the c7/s1/c4 samplers
    def bucket(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000
    def split(c: Column): Column =
      when(bucket(c) < trainPerMille, "train").otherwise("test")
    val asg = grp.select(col(idCol),
      split(col(idCol)).as("doc_split"),
      split(col("grp")).as("grp_split"))
    val j = pairs
      .join(asg.select(col(idCol).as("id_a"),
        col("doc_split").as("da"), col("grp_split").as("ga")),
        Seq("id_a"))
      .join(asg.select(col(idCol).as("id_b"),
        col("doc_split").as("db"), col("grp_split").as("gb")),
        Seq("id_b"))
    j.agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("da") =!= col("db"), 1L).otherwise(0L)),
          lit(0L)).as("doc_leaks"),
        coalesce(sum(when(col("ga") =!= col("gb"), 1L).otherwise(0L)),
          lit(0L)).as("grp_leaks"))
      .select(expr("stack(2, 'cluster_hash', n_pairs, grp_leaks, " +
        "'doc_hash', n_pairs, doc_leaks) AS (policy, n_pairs, " +
        "n_leaking)"))
      .orderBy(col("policy").asc)
  }

  /** Oracle twin of [[splitLeakageAudit]]: the [[dupClustersSql]]
    * recursive-CTE cluster relation, the c7 md5-permille gate on both
    * policies, one aggregate unpivoted by UNION ALL.
    */
  def splitLeakageAuditSql(table: String, idCol: String,
      textCol: String, minJaccard: Double, n: Int = 3,
      maxDf: Int = Int.MaxValue, trainPerMille: Int = 800): String = {
    def gate(x: String): String =
      s"""CASE WHEN ('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15))
         |::BIGINT % 1000 < $trainPerMille
         |THEN 'train' ELSE 'test' END""".stripMargin
        .replaceAll("\n", " ")
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |${minhashPairsSql(table, idCol, textCol, minJaccard, n, maxDf)
          .replace("ORDER BY id_a ASC, id_b ASC", "")}),
       |sym AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id),
       |clusters AS (SELECT id, min(r) AS cluster_id
       |  FROM reach GROUP BY id),
       |grp AS (SELECT d.$idCol AS id,
       |    coalesce(c.cluster_id, d.$idCol) AS grp
       |  FROM $table d LEFT JOIN clusters c ON d.$idCol = c.id),
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

  /** 60-bit SimHash fingerprint per document (tier 4). Token hash =
    * md5-hex 60 bits; bit i of the fingerprint is set iff
    * Σ_tokens (2·bit_i(h(token)) − 1) ≥ 0. Tokens keep multiplicity
    * (standard SimHash term weighting by frequency). One pass per row
    * via [[graft.functions.SimHash64]] — no explode, no doc shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFingerprints(df, idCol, textCol).orderBy(col(idCol).asc)

  /** [[simhash]] without the final presentation sort — the form
    * intermediate consumers ([[simhashPairs]]) build on, so a report
    * sort never rides into the middle of a pair pipeline (round-8
    * plan audit: the pairs plan carried a wasted range exchange).
    */
  private def simhashFingerprints(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.FanOut.byKey(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        call_function("graft_simhash", col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** Explode + 60-sum-aggregate formulation of [[simhash]] (pure
    * built-ins) — the differential reference for the expression.
    */
  def simhashHof(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val x = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    val bitSums = (0 until 60).map { i =>
      sum(shiftright(x, i).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$i")
    }
    val fp = (0 until 60).map { i =>
      when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), fp.as("simhash"))
      .orderBy(col(idCol).asc)
  }

  /** SimHash near-dup pairs among a candidate set: Hamming distance of
    * fingerprints ≤ maxDist. Candidates via band-equality on 4 15-bit
    * bands (a pair within distance 3 shares ≥1 exact band) — the same
    * LSH-not-all-pairs shape as [[minhashPairs]].
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val fps = simhashFingerprints(df, idCol, textCol)
    val bands = fps.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map { k =>
        struct(lit(k).as("band"),
          shiftright(col("simhash"), k * 15).bitwiseAND(lit(0x7fffL))
            .as("sig"))
      }: _*)).as("bs"))
      .select(col(idCol), col("simhash"), col("bs.band"), col("bs.sig"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col("x.simhash").as("fa"), col("y.simhash").as("fb"))
      .distinct()
      .withColumn("dist", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  // ------------------------------------------------------------------
  // Oracle-SQL generators (ANSI SQL for DuckDB) sharing the constants
  // above, so Spark and oracle compute the same algorithm.
  // ------------------------------------------------------------------

  /** DuckDB CTE producing (doc_id, shingle) — mirror of [[shingles]]. */
  def shinglesSql(table: String, idCol: String, textCol: String,
      n: Int = 3): String = {
    val parts = (0 until n).map(o => s"words[i${if (o > 0) s"+$o" else ""}]")
      .mkString(" || ' ' || ")
    s"""SELECT $idCol, unnest(list_distinct([ $parts
       |    for i in range(1, len(words) - ${n - 2}) ])) AS shingle
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS words
       |        FROM $table)""".stripMargin
  }

  /** Full [[jaccardPairs]] oracle query (joins on the same 60-bit
    * md5 integer of the shingle as the Spark side).
    */
  def jaccardPairsSql(table: String, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : String =
    s"""WITH sh0 AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |shAll AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |sh AS ${if (maxDf == Int.MaxValue)
                  s"(SELECT $idCol, x FROM shAll)"
                else capSql("shAll", idCol, maxDf)},
       |sizes AS (SELECT $idCol, count(*) AS n_sh FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.$idCol AS id_a, b.$idCol AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.x = b.x
       |    AND a.$idCol < b.$idCol
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.$idCol = id_a
       |JOIN sizes sb ON sb.$idCol = id_b
       |WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= $minJaccard
       |ORDER BY id_a ASC, id_b ASC""".stripMargin

  /** EXACT-SUBSTRING overlap pairs — the long-span detector
    * (deduplicating-training-data "ExactSubstr" granularity,
    * relationalized): pairs of documents sharing at least one exact
    * run of `n` consecutive tokens (default 8), with the count of
    * distinct shared spans. Complements the n3/n4 similarity tier:
    * Jaccard finds globally-similar documents; this finds VERBATIM
    * QUOTATION — a long copied passage inside otherwise-different
    * documents, which set-similarity dilutes below any threshold.
    *
    * Shape: the same one-shuffle shared-shingle equi-join as n3, at
    * the longer gram (candidates bounded by shared-span count, never
    * all-pairs; df cap cuts boilerplate spans the same way). Both
    * join sides are the same child, so the shingle explode computes
    * once (exchange reuse). At 100 TB the production form shards the
    * span index exactly like the k18 signature store — same relation,
    * persisted.
    */
  def substringPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = capShingleDf(hashedShingles(df, idCol, textCol, n), maxDf)
    val a = sh.select(col(idCol).as("id_a"), col("x"))
    val b = sh.select(col(idCol).as("id_b"), col("x"))
    a.join(b, Seq("x"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_spans"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** CONTAINMENT detection on top of [[substringPairs]]: a document
    * is (span-)contained in another when EVERY one of its n-token
    * spans appears in the other — the "fully quoted" case (a doc
    * that is a verbatim excerpt of a longer one), which near-dup
    * Jaccard scores low and exact dedup misses entirely. The span
    * counts ride the same capped shingle relation; containment is
    * `shared == n_spans(containee)` checked in both directions.
    * Output: (contained_id, container_id, n_spans) — the removal
    * list a quotation-dedup pass consumes.
    */
  def containedDocs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = capShingleDf(hashedShingles(df, idCol, textCol, n), maxDf)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("id_a"), col("x"))
    val b = sh.select(col(idCol).as("id_b"), col("x"))
    val inter = a.join(b, Seq("x"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("n_sh", "na"), Seq("id_a"))
      .filter(col("i") === col("na"))
      .select(col("id_a").as("contained_id"),
        col("id_b").as("container_id"), col("na").as("n_spans"))
      .orderBy(col("contained_id").asc, col("container_id").asc)
  }

  /** Oracle twin of [[containedDocs]]. */
  def containedDocsSql(table: String, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = Int.MaxValue): String =
    s"""WITH sh0 AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |shAll AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |sh AS ${if (maxDf == Int.MaxValue)
                  s"(SELECT $idCol, x FROM shAll)"
                else capSql("shAll", idCol, maxDf)},
       |sizes AS (SELECT $idCol, count(*) AS n_sh FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.$idCol AS id_a, b.$idCol AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.x = b.x AND a.$idCol <> b.$idCol
       |  GROUP BY 1, 2)
       |SELECT id_a AS contained_id, id_b AS container_id,
       |  n_sh AS n_spans
       |FROM inter JOIN sizes s ON s.$idCol = id_a
       |WHERE i = n_sh
       |ORDER BY contained_id ASC, container_id ASC""".stripMargin

  /** Oracle twin of [[substringPairs]] (same 60-bit md5 span keys,
    * same df cap).
    */
  def substringPairsSql(table: String, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = Int.MaxValue): String =
    s"""WITH sh0 AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |shAll AS (SELECT $idCol,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x FROM sh0),
       |sh AS ${if (maxDf == Int.MaxValue)
                  s"(SELECT $idCol, x FROM shAll)"
                else capSql("shAll", idCol, maxDf)}
       |SELECT a.$idCol AS id_a, b.$idCol AS id_b,
       |  count(*) AS shared_spans
       |FROM sh a JOIN sh b ON a.x = b.x AND a.$idCol < b.$idCol
       |GROUP BY 1, 2 ORDER BY id_a ASC, id_b ASC""".stripMargin

  /** Cross-SOURCE duplication matrix — which sources copy from each
    * other: [[jaccardPairs]]' near-dup pairs (same threshold, same
    * df-cap) rolled up to the (source_a, source_b) level, each pair
    * normalized with least/greatest so the matrix is upper-triangular
    * regardless of doc-id interleaving (the diagonal = within-source
    * duplication). This is the corpus diagnostic behind mixture
    * decisions: a source that largely duplicates another adds tokens
    * but no signal.
    *
    * Shape: the bounded shared-shingle pair join (never all-pairs),
    * then two joins of the TINY pair list against the (id, group)
    * projection — AQE broadcasts them — and one hash agg on the
    * |sources|² bounded domain.
    */
  def sourceOverlap(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, minJaccard: Double, maxDf: Int): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, minJaccard,
      maxDf = maxDf)
    val srcs = df.select(col(idCol), col(groupCol))
    pairs
      .join(srcs.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed(groupCol, "__ga"), Seq("id_a"))
      .join(srcs.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed(groupCol, "__gb"), Seq("id_b"))
      .select(least(col("__ga"), col("__gb")).as("source_a"),
        greatest(col("__ga"), col("__gb")).as("source_b"),
        col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 6).as("avg_jaccard"))
      .resultSorted(col("source_a").asc, col("source_b").asc)
  }

  /** [[sourceOverlap]] oracle — [[jaccardPairsSql]] verbatim as the
    * pair subquery, the same least/greatest fold around it.
    */
  def sourceOverlapSql(table: String, idCol: String, groupCol: String,
      textCol: String, minJaccard: Double, maxDf: Int): String =
    s"""WITH s AS (SELECT $idCol, $groupCol FROM $table)
       |SELECT least(sa.$groupCol, sb.$groupCol) AS source_a,
       |  greatest(sa.$groupCol, sb.$groupCol) AS source_b,
       |  count(*) AS n_pairs, round(avg(jaccard), 6) AS avg_jaccard
       |FROM (${jaccardPairsSql(table, idCol, textCol, minJaccard,
                maxDf = maxDf)}) p
       |JOIN s sa ON sa.$idCol = p.id_a
       |JOIN s sb ON sb.$idCol = p.id_b
       |GROUP BY source_a, source_b
       |ORDER BY source_a ASC, source_b ASC""".stripMargin

  /** Full [[minhashPairs]] oracle query — same seeds, same bands, same
    * verification, in SQL.
    */
  def minhashPairsSql(table: String, idCol: String, textCol: String,
      minJaccard: Double, n: Int = 3, maxDf: Int = Int.MaxValue)
      : String = {
    val xExpr =
      s"('0x' || substr(md5(shingle), 1, 15))::BIGINT"
    val minExprs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * (x % $P) + $b) % $P) AS h$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { k =>
      val sig = (0 until BandRows).map(r => s"h${k * BandRows + r}")
        .mkString(", ")
      s"SELECT $idCol, $k AS band, concat_ws('_', $sig) AS sig FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (
       |${shinglesSql(table, idCol, textCol, n)}),
       |hx0 AS (SELECT $idCol, $xExpr AS x FROM sh),
       |hx AS ${if (maxDf == Int.MaxValue)
                  s"(SELECT $idCol, x FROM hx0)"
                else capSql("hx0", idCol, maxDf)},
       |sigs AS (
       |  SELECT $idCol,
       |    $minExprs
       |  FROM hx GROUP BY $idCol),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.$idCol AS id_a, y.$idCol AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.sig = y.sig AND x.$idCol < y.$idCol),
       |sizes AS (SELECT $idCol, count(*) AS n_sh FROM hx GROUP BY 1),
       |inter AS (
       |  SELECT a.$idCol AS id_a, b.$idCol AS id_b, count(*) AS i
       |  FROM hx a JOIN hx b ON a.x = b.x
       |    AND a.$idCol < b.$idCol
       |  GROUP BY 1, 2)
       |SELECT c.id_a, c.id_b,
       |  round(i * 1.0 / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
       |FROM cand c
       |JOIN inter USING (id_a, id_b)
       |JOIN sizes sa ON sa.$idCol = c.id_a
       |JOIN sizes sb ON sb.$idCol = c.id_b
       |WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= $minJaccard
       |ORDER BY id_a ASC, id_b ASC""".stripMargin
  }

  /** SymSpell deletion-neighborhood keys for one string: the string
    * itself plus every single-character deletion (deduped). Shared by
    * [[fuzzyPairs]] and the query-side spell correction
    * ([[FtsOps.spellCorrectedSearch]]). Empty inputs take an EXPLICIT
    * no-deletions path (round-8 ADVICE): Spark's sequence(1, 0)
    * yields descending [1, 0] and only agreed with the oracle's empty
    * range(1, 1) by leaning on substr's negative-length-returns-empty
    * accident.
    */
  def deletionKeys(s: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array_union(array(s),
      when(length(s) > 0, transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s)))))
      .otherwise(typedLit(Seq.empty[String])))

  /** TYPO-TOLERANT FUZZY MATCH (edit distance ≤ 1) via the SymSpell
    * deletion neighborhood: each string's candidate keys are itself
    * plus every single-character deletion (L+1 keys for length L) —
    * two strings within one edit ALWAYS share a key (equal → the
    * string itself; substitution → delete the differing position
    * from both; insert/delete → the shorter string is a deletion of
    * the longer). Candidates come from an EQUI-join on the key —
    * O(N·L) rows, never all-pairs — and exact `levenshtein` verifies
    * only the candidate set. The fuzzy-title/entity matching every
    * metadata-reconciliation pipeline runs, in the n4 candidates-
    * then-verify shape.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String)
      : DataFrame = {
    val keyed = df.select(col(idCol), col(strCol))
      .withColumn("__k", explode(deletionKeys(col(strCol))))
    keyed.as("x").join(keyed.as("y"),
        col("x.__k") === col("y.__k") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col(s"x.$strCol").as("sa"), col(s"y.$strCol").as("sb"))
      .distinct()
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** [[simhash]] oracle query. */
  def simhashSql(table: String, idCol: String, textCol: String): String =
    s"""${simhashCtes(table, idCol, textCol)}
       |SELECT $idCol, simhash FROM fps ORDER BY $idCol ASC""".stripMargin

  /** Shared fingerprint CTE chain behind [[simhashSql]] /
    * [[simhashPairsSql]] — ends with `fps($idCol, simhash)`.
    */
  private def simhashCtes(table: String, idCol: String,
      textCol: String): String = {
    val bitSums = (0 until 60).map { i =>
      s"sum(((x >> $i) & 1) * 2 - 1) AS s$i"
    }.mkString(",\n    ")
    val fp = (0 until 60).map { i =>
      s"CASE WHEN s$i >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS tok
       |  FROM $table),
       |hx AS (
       |  SELECT $idCol,
       |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS x
       |  FROM tok WHERE tok <> ''),
       |sums AS (
       |  SELECT $idCol,
       |    $bitSums
       |  FROM hx GROUP BY $idCol),
       |fps AS (
       |  SELECT $idCol, $fp AS simhash FROM sums)""".stripMargin
  }

  /** Oracle twin of [[simhashPairs]] — DERIVED from the same
    * fingerprint CTE chain as t4's oracle (zero convention drift):
    * the identical 4×15-bit band explode, band-equality candidate
    * self-join, and Hamming filter.
    */
  def simhashPairsSql(table: String, idCol: String, textCol: String,
      maxDist: Int = 3): String =
    s"""${simhashCtes(table, idCol, textCol)},
       |b AS (
       |  SELECT $idCol, simhash, k AS band,
       |    (simhash >> (k::INT * 15)) & 32767 AS sig
       |  FROM fps, range(4) t(k)),
       |cand AS (
       |  SELECT DISTINCT x.$idCol AS id_a, y.$idCol AS id_b,
       |    x.simhash AS fa, y.simhash AS fb
       |  FROM b x JOIN b y
       |    ON x.band = y.band AND x.sig = y.sig
       |    AND x.$idCol < y.$idCol)
       |SELECT id_a, id_b, bit_count(xor(fa, fb))::INT AS dist
       |FROM cand WHERE bit_count(xor(fa, fb)) <= $maxDist
       |ORDER BY id_a ASC, id_b ASC""".stripMargin
}
