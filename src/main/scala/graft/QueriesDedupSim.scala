package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps
import graft.RegistryFixtures._

/** Query registry — the dedup / similarity-search tier (n1–n33): exact and
  * approximate near-dup, MinHash LSH, ANN (IVF / PQ / LSH), semantic
  * dedup, persisted vector indexes.
  *
  * Split out of SparkEntry (round-10 verdict item 7); entries and
  * oracle twins are verbatim, SparkEntry concatenates the families.
  */
object QueriesDedupSim {

  /** Serving-width child sessions for the graph walks (n35/n36) —
    * the st9 stateWidth argument on the serving path: every walk
    * round shuffles ≤ |Q|·beam·degree rows (n35: 1·16·48; n36:
    * |Q| = N/199 ≈ 11 at sf0.1), so the width DERIVES from the
    * frontier bound. Factored out so ServedTwins.exportArtifacts
    * fetches the graph fixtures through the SAME (session, dir)
    * cache key the registry closures use — the round-14 advice
    * found the parent-session export building (and
    * localCheckpoint'ing) each heavy graph fixture a second time
    * per process.
    */
  private[graft] def servingChild(s: SparkSession): SparkSession =
    // AQE OFF (round-16 N35AqeProbe, rep-interleaved min-of-5 with
    // equality witness: 1.25 vs 1.59 s, −21%): the single-query walk
    // is ~37 driver-barriered jobs whose exchanges are all bounded by
    // beam·degree — AQE's per-exchange stage materialization is pure
    // barrier cost here, with nothing left for it to re-plan.
    stChild(s, graft.streaming.StreamingOps.stateWidth(16L * 48),
      aqe = false)

  /** AQE OFF here too since round 17 (N36AqeProbe, rep-interleaved
    * min-of-5, equality witness true: 1.803 vs 2.059 s, −12%): the
    * round-16 hypothesis that the batch walk's larger per-round
    * relations leave AQE something to re-plan was measured and does
    * not hold — the walk's exchanges are bounded by |Q|·beam·degree
    * and pre-sized by the derived width, so AQE's per-exchange stage
    * barrier is pure cost across the ~60-job walk, exactly as in the
    * single-query tier.
    */
  private[graft] def servingBatchChild(s: SparkSession): SparkSession =
    stChild(s, graft.streaming.StreamingOps.stateWidth(11L * 16 * 48),
      aqe = false)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- north-star: similarity search over embeddings (L1) ----
    "n1_cosine_topk" -> ((s, dir) =>
      SimilarityOps.cosineTopK(Tables.embeddings(s, dir), 0L, 20)),

    // n23: hard-negative mining — per-query top-k most-similar vectors
    // of a DIFFERENT label (the contrastive-training negatives batch);
    // broadcast query set, label filter on the scan side.
    "n23_hard_negatives" -> ((s, dir) =>
      SimilarityOps.hardNegatives(Tables.embeddings(s, dir),
        queryMod = 73, k = 5)),

    "n5_label_top_pairs" -> ((s, dir) =>
      SimilarityOps.labelTopPairs(Tables.embeddings(s, dir), 20)),

    // n6 (random-hyperplane LSH probe) retired from the registry in
    // round 13: it was the suite's last rows-only row; its oracle-
    // gated successors n6x/n6y/n6z carry the LSH tier through the
    // full hash gate, and the randomized probe itself stays covered
    // by DedupSimilaritySpec's overlap-vs-brute-force test.

    // n6x: n6's LSH derandomized through the FULL hash gate (the n29
    // recipe): md5-seeded hyperplanes + fixed-point quantization make
    // projections/buckets/candidates/d² exact integer arithmetic,
    // bit-identical in Spark and the DuckDB twin; multiprobe ±1
    // measured 10/10 recall@10 vs brute force at sf0.01 and sf0.1.
    "n6x_lsh_seeded_topk" -> ((s, dir) =>
      SimilarityOps.seededLshTopK(Tables.embeddings(s, dir), 0L, 10)),

    // n6y: the BATCH serving shape — candidates via an equi-join on
    // the tagged bucket key against the broadcast probe-key set (the
    // 100 TB plan: never all-pairs, one shared plan for the whole
    // query set), same bit-deterministic integer pipeline as n6x.
    "n6y_lsh_batch_topk" -> ((s, dir) =>
      SimilarityOps.seededLshTopKBatch(Tables.embeddings(s, dir),
        queryMod = 73, k = 5)),

    // n6z: recall@k of the LSH tier vs exact brute force — the
    // index-quality metric oracle-gated (n28's pattern for IVF);
    // integer-micro mean recall, flip-proof at any query count.
    "n6z_lsh_recall" -> ((s, dir) =>
      SimilarityOps.seededLshRecall(Tables.embeddings(s, dir),
        queryMod = 73, k = 5)),

    "n7_embedding_neardup" -> ((s, dir) =>
      SimilarityOps.embeddingNearDups(Tables.embeddings(s, dir), 0.4)),

    "n8_ivf_topk" -> ((s, dir) =>
      SimilarityOps.ivfTopK(Tables.embeddings(s, dir), 0L, k = 10,
        stride = 50, nProbe = 3)),

    // n10: the BATCH serving shape — one shared plan answers every
    // query in the set (vec_id % 73 = 0), instead of one job per query.
    "n10_ivf_batch" -> ((s, dir) =>
      SimilarityOps.ivfTopKBatch(Tables.embeddings(s, dir),
        queryMod = 73, k = 5, stride = 50, nProbe = 3)),

    // n28: recall@k of the IVF tier vs exact brute force — the
    // index-quality metric itself through the oracle gate.
    "n28_ivf_recall" -> ((s, dir) =>
      SimilarityOps.ivfRecall(Tables.embeddings(s, dir),
        queryMod = 73, k = 5, stride = 50, nProbe = 3)),

    // n29: scalar (int8-style) quantized ANN — fixed-point components
    // (floor on exactly-widened doubles: bit-deterministic), integer
    // dot-product ranking; the compression tier goes through the full
    // hash gate, unlike LSH's ε-band.
    "n29_quantized_topk" -> ((s, dir) =>
      SimilarityOps.quantizedTopK(Tables.embeddings(s, dir),
        queryMod = 73, k = 5)),

    // n12: the recall dial — near-dup pairs with every vector probing
    // its 2 best clusters, recovering cross-bucket pairs n7 misses.
    "n12_multiprobe_neardup" -> ((s, dir) =>
      SimilarityOps.embeddingNearDupsMultiProbe(
        Tables.embeddings(s, dir), minCosine = 0.4, stride = 50,
        nProbe = 2)),

    // n13: the IVF TRAINING step — one Lloyd refinement of the
    // strided centroids (assign → mean → re-assign), per-cluster
    // size + cohesion report.
    "n13_kmeans_refine" -> ((s, dir) =>
      SimilarityOps.kmeansRefine(Tables.embeddings(s, dir),
        stride = 50)),

    // n16: SemDeDup-style centroid-distance pruning — the 30 vectors
    // least cohesive with their own label's mean (6-dp-rounded
    // centroids, the n13 convention).
    "n16_centroid_outliers" -> ((s, dir) =>
      SimilarityOps.centroidOutliers(Tables.embeddings(s, dir), 30)),

    // n18: FULL SemDeDup — near-dup pairs inside each coarse cluster
    // (cosine ≥ 0.4, the n7 relation) resolved into connected
    // components, one representative kept per component; per-label
    // prune report (seen/kept/pruned).
    "n18_semantic_dedup" -> ((s, dir) =>
      SimilarityOps.semanticDedup(Tables.embeddings(s, dir), 0.4)),

    // n20: the train→serve loop CLOSED — IVF search against n13's
    // one-Lloyd-refined centroids instead of raw strided seeds.
    "n20_trained_ivf" -> ((s, dir) =>
      SimilarityOps.ivfTopKTrained(Tables.embeddings(s, dir), 0L,
        k = 10, stride = 50, nProbe = 3)),

    // n19: hashing-trick text embedding + SPARSE cosine top-k — the
    // deterministic stand-in for the reference's stubbed embedding
    // generation; dot products from the (doc, bucket, weight)
    // inverted index, exact-integer until the final division.
    "n19_hashed_embed" -> ((s, dir) =>
      SimilarityOps.hashedEmbedTopK(Tables.documents(s, dir),
        "doc_id", "text", dim = 64, queryId = 0L, k = 10)),

    // n14: PRODUCT QUANTIZATION — the compressed-domain tier: encode
    // once into nSub codebook ids per vector, answer the query from
    // a broadcast lookup table over the codes (ADC); the scan never
    // touches full-width vectors. Deterministic codebook (strided,
    // as n8) → fully oracle-backed, unlike most PQ implementations.
    "n14_pq_topk" -> ((s, dir) =>
      SimilarityOps.pqTopK(Tables.embeddings(s, dir), 0L, k = 10,
        stride = 50, nSub = 4)),

    // n15: IVF-PQ — the production serving shape: IVF prunes the
    // corpus to the probed clusters, PQ scores the survivors from a
    // broadcast per-query lookup table (ADC); one shared plan answers
    // the whole query batch and never touches a full-width vector
    // after encode.
    "n15_ivfpq_batch" -> ((s, dir) =>
      SimilarityOps.ivfPqTopKBatch(Tables.embeddings(s, dir),
        queryMod = 73, k = 5, stride = 50, nSub = 4, nProbe = 3)),

    // n21: the SAME batch served from the PERSISTED index — the
    // assignment/codes/codebooks are read from Versioned tables, the
    // corpus embeddings are never touched at query time (only the
    // query vectors are). Same oracle as n15: stored-index serving
    // must equal the recompute path bit-for-bit.
    "n21_stored_ivfpq" -> ((s, dir) => {
      val root = vectorIndexRoot(s, dir)
      val qs = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 73 === 0)
        .select(col("vec_id").as("query_id"),
          graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
            .as("qv"))
      VectorIndexOps.servedIvfPqBatch(s, root, qs, k = 5, nProbe = 3)
    }),

    // n22: the INCREMENTAL index gate through the oracle — the index
    // trained on the corpus minus a late batch is the process-cached
    // fixture (training is the offline job; the late slice contains
    // no strided-training vector, so the frozen codebooks equal the
    // full-corpus ones); the TIMED work is the gate itself: quantize
    // the late batch against the STORED codebooks, append, and
    // report the stored inverted file per centroid. The gate is
    // replay-idempotent (already-indexed ids skip), so later bench
    // reps exercise the same join work and the report stays equal to
    // the full-recompute assignment relationally.
    "n22_index_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val late = col("vec_id") % 7 === 3 && col("vec_id") % 50 =!= 0
      val root = partialVectorIndexRoot(s, dir)
      VectorIndexOps.appendVectors(emb.filter(late), root)
      Versioned.current(s, root + "/assign")
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n_members"))
        .resultSorted(col("centroid_id").asc)
    }),

    // n26: index DELETE — the tombstoned slice stops surfacing in the
    // served IVF-PQ results without any rebuild; the oracle recomputes
    // the same serve with the deleted ids excluded from candidates.
    "n26_index_delete" -> ((s, dir) => {
      val root = deletedVectorIndexRoot(s, dir)
      val qs = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 73 === 0)
        .select(col("vec_id").as("query_id"),
          graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
            .as("qv"))
      VectorIndexOps.servedIvfPqBatch(s, root, qs, k = 5, nProbe = 3)
    }),


    // ---- north-star: content dedup over documents ----
    // n31: typo-tolerant fuzzy match (edit distance ≤ 1) — SymSpell
    // deletion-neighborhood keys, equi-join candidates, levenshtein
    // verify on candidates only. Fixture: each doc's 3-token title
    // plus a first-char-dropped typo variant (the u1 render pattern);
    // every (title, typo) pair must surface at distance 1 alongside
    // the distance-0 pairs from duplicated docs.
    "n31_fuzzy_match" -> ((s, dir) => {
      val t0 = Tables.documents(s, dir).select(col("doc_id"),
        substring_index(col("text"), " ", 3).as("title"))
      val variants = t0.select((col("doc_id") * 2).as("id"),
          col("title").as("s"))
        .unionByName(t0.select((col("doc_id") * 2 + 1).as("id"),
          col("title").substr(lit(2), length(col("title"))).as("s")))
      DedupOps.fuzzyPairs(variants, "id", "s")
    }),

    // n30: the SimHash DEDUP tier as a gated query (t4 gates the
    // fingerprints; this gates the PAIRS): banded LSH candidates
    // (4×15-bit bands — a pair within Hamming 3 shares ≥1 exact
    // band), exact Hamming verify on candidates only — never
    // all-pairs, the n4 shape in Hamming space.
    "n30_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashPairs(Tables.documents(s, dir), "doc_id",
        "text", maxDist = 3)),

    "n2_exact_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text", "source")
      val dup = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      DedupOps.exactDedupKeyed(dup, "text", "doc_id", "content_md5")
        .select(col("doc_id"), col("source"), col("content_md5"))
        .orderBy(col("doc_id").asc)
    }),

    // ShingleMaxDf (=100, ~2% of the sf0.1 corpus) bounds the
    // shared-shingle joins: organic max df here is ~25, so results are
    // unchanged, but a boilerplate trigram can never turn a join key
    // into a df² hot spot — the oracle SQL applies the identical cap.
    "n3_ngram_jaccard" -> ((s, dir) =>
      DedupOps.jaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", minJaccard = 0.8, maxDf = ShingleMaxDf)),

    // n33: the SAME pairs via PPJoin prefix filtering — candidates
    // join only each doc's rarest few shingles (|x| − ⌈0.8|x|⌉ + 1
    // under the rare-first global order) instead of every shared
    // shingle; exact verify restricted to candidates. Held to n3's
    // oracle verbatim: a different algorithm, the same answer.
    "n33_prefix_jaccard" -> ((s, dir) =>
      DedupOps.prefixFilteredJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", tNum = 4, tDen = 5, maxDf = ShingleMaxDf)),

    "n4_minhash_lsh" -> ((s, dir) =>
      DedupOps.minhashPairs(Tables.documents(s, dir),
        "doc_id", "text", minJaccard = 0.8, maxDf = ShingleMaxDf)),

    // n17: cross-source duplication matrix — n3's near-dup pairs
    // rolled up to (source_a, source_b); the mixture diagnostic.
    "n17_source_overlap" -> ((s, dir) =>
      DedupOps.sourceOverlap(Tables.documents(s, dir), "doc_id",
        "source", "text", minJaccard = 0.8, maxDf = ShingleMaxDf)),

    // n9/n11/n24/c18 SERVE from the prepared pair/cluster fixture
    // (dupPairsClusters): the dedup pass runs once per corpus
    // version, reports and policies read its persisted output. The
    // final sort re-applies so the served relation's row order is
    // pinned, not inherited.
    "n9_dup_clusters" -> ((s, dir) =>
      dupPairsClusters(s, dir)._2.orderBy(col("doc_id").asc)),

    // n11: the dedup report — cluster-size distribution of n9's
    // clusters (how much of the corpus is duplicated, in clusters of
    // what size).
    "n11_cluster_sizes" -> ((s, dir) =>
      DedupOps.clusterSizeHistogram(dupPairsClusters(s, dir)._2)),

    // n25: EXACT-SUBSTRING overlap — verbatim-quotation pairs (any
    // shared exact 8-token run), the long-span detector set-
    // similarity dilutes away; same one-shuffle equi-join shape as n3.
    "n25_substring_pairs" -> ((s, dir) =>
      DedupOps.substringPairs(Tables.documents(s, dir),
        "doc_id", "text", n = 8, maxDf = ShingleMaxDf)),

    // n27: span-CONTAINMENT — docs that are verbatim excerpts of a
    // longer doc (every 8-token span shared); the removal list a
    // quotation-dedup pass consumes.
    "n27_contained_docs" -> ((s, dir) =>
      DedupOps.containedDocs(Tables.documents(s, dir),
        "doc_id", "text", n = 8, maxDf = ShingleMaxDf)),

    // n24: CANONICAL SELECTION — the dedup pipeline's final policy
    // step: one kept representative per n9 cluster (best = largest
    // n_chars, id-asc tiebreak) plus the kept/dropped accounting.
    "n24_keep_best" -> ((s, dir) =>
      DedupOps.keepBestPerCluster(dupPairsClusters(s, dir)._2,
        Tables.documents(s, dir), "doc_id", "n_chars")),

    // n34 (exact all-pairs graph) and n34r (full-graph recall) left
    // the registry in round 13 (round-12 verdict item 1): both put a
    // quadratic build on the bench's critical path, which is exactly
    // what cannot run at 100×. The exact build stays as ground truth
    // in GraphAnnBoundedSpec (which also adjudicates n34s ≍ n34r);
    // the in-suite recall certificate is now n34s — sampled ground
    // truth, linear at any corpus size.

    // n35: graph-ANN BEAM SEARCH over the prepared NSW graph
    // (n34's directed top-24 edges symmetrized — reverse edges make
    // the graph navigable) — the HNSW-class serving query: o(1)
    // coordinator-held beam state, two bucket-prunable point reads
    // per round, cost independent of corpus size. Deterministic
    // (sequential-fold double scores, (s desc, id asc) selection),
    // so the fixed-round unrolled SQL twin replays it exactly;
    // recall@10 = 10/10 vs n1's exact ground truth at sf0.1
    // (spec-pinned ≥ 8). Round 14: entry is the HIERARCHICAL
    // two-level routing (entryFan = 4 — coarse √-tier over the
    // stride-50 codebook), the documented 100 TB entry rule, now on
    // the oracle-gated serving path (round-13 verdict item 1).
    // Serving-width child session (round 14 — the st9 stateWidth
    // argument applied to the serving path): every walk round
    // shuffles relations bounded by |Q|·beam·degree rows (≤ 16·48
    // here), so the corpus-default 32 reduce tasks per tiny exchange
    // are pure scheduling overhead; the width DERIVES from the
    // frontier bound via the same stateWidth rule production sizes
    // streaming state by. Measured −10% on each walk under the
    // rep-INTERLEAVED GraphWalkWidthProbe (n35 1.49→1.35, n36
    // 2.12→1.90; a first sequential-order probe claimed 45% and was
    // a JIT-warmup artifact — ledgered in BASELINE.md round-14).
    // AQE's coalescePartitions only merges the reduce side — the
    // map-wave task count is what the narrow session removes.
    "n35_graph_ann" -> ((s, dir) => {
      val ss = servingChild(s)
      SimilarityOps.graphBeamSearch(annGraphFixture(ss, dir),
        Tables.embeddings(ss, dir), queryId = 0L, beam = 16,
        rounds = 8, k = 10, entryFan = 4)
    }),

    // n34b: the BOUNDED kNN-graph build — the 100 TB path n34's
    // scaladoc promised (round-11 verdict item 2): candidates from
    // shared IVF cells (n12's multi-probe convention, top-2 cells
    // per vector over the strided codebook), per-src exact top-k
    // over candidates only, then 2 NN-Descent refinement rounds
    // (2-hop expansion + re-rank — per-src work constant, corpus
    // linear). Every stage is an equi-join: no cross join anywhere
    // in the plan. Deterministic → oracle-gated despite being
    // approximate RELATIVE TO the exact graph; n34s pins the
    // recall (sampled ground truth — itself linear at any N).
    "n34b_knn_graph_bounded" -> ((s, dir) =>
      SimilarityOps.knnGraphBounded(Tables.embeddings(s, dir),
        k = 8, stride = 50, nProbe = 2, nndRounds = 2)),

    // n34s: the SAMPLED edge-recall CERTIFICATE for n34b (the
    // n28/n6z convention — approximate tiers carry an in-suite
    // eval), round-13 successor to n34r: the exact side is computed
    // only for the 1000 smallest-md5(vec_id) srcs (fixed |S| as the
    // corpus grows — |S|·N broadcast scoring, never all-pairs), so
    // the recall gate itself survives 100×. At sf ≤ 0.01 the sample
    // covers the corpus and n34s equals n34r exactly; the fixture
    // embeddings are isotropic-random (no neighborhood structure —
    // see GraphAnnBoundedSpec), so this pins the noise-floor number;
    // the spec's clustered corpus shows ≥ 95% where structure
    // exists. Round 14: the graph under test is the PREPARED n34b
    // artifact (a recall monitor certifies the index serving walks,
    // it does not rebuild it), while the oracle stays the full
    // rebuild SQL — the hash gate also certifies fixture ≡ rebuild
    // (the n35 convention); the served duck twin reads the same
    // exported graph.
    "n34s_knn_sampled_recall" -> ((s, dir) =>
      SimilarityOps.knnGraphSampledRecallServed(
        Tables.embeddings(s, dir),
        boundedKnnGraphFixture(s, dir), k = 8, sampleN = 1000)),

    // n36: BATCHED graph-ANN serving over the BOUNDED graph — the
    // full production pairing (bounded build → batched walk), and
    // the batched twin every other serving tier already has
    // (l8/n10/n15 convention): all queries' beams expand in the
    // same two jobs per round, so a batch pays `rounds` round-trips
    // total, not rounds × |queries|. Round 14: entries are
    // HIERARCHICALLY routed per query (entryFan = 4) in ONE
    // declarative plan for the whole batch — zero per-query driver
    // actions on the serving path (round-13 verdict item 1).
    "n36_graph_ann_batch" -> ((s, dir) => {
      val ss = servingBatchChild(s)
      SimilarityOps.graphBeamSearchBatch(boundedNswFixture(ss, dir),
        Tables.embeddings(ss, dir), queryMod = 199, beam = 16,
        rounds = 8, k = 10, entryFan = 4)
    }),

    // n37: INCREMENTAL graph maintenance (k18/n22 convention) —
    // appended vectors (vec_id % 4 == 3) join the prepared base
    // graph through the frozen-codebook bounded path; only touched
    // base neighborhoods re-rank (existing k edges merged with the
    // new co-resident candidates — no base×base pair re-scored).
    // The ORACLE is the full REBUILD's SQL (bounded build over the
    // whole table, codebook still base-frozen): incremental ≡
    // rebuild is the hash gate itself, not a side assertion.
    "n37_graph_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.knnGraphAppend(baseKnnGraphFixture(s, dir),
        emb.filter(col("vec_id") % 4 =!= 3),
        emb.filter(col("vec_id") % 4 === 3),
        k = 8, stride = 50, nProbe = 2)
    }))

  def oracleSql: Map[String, String] = Map(
    // n26: serve-after-delete ≡ serve-with-exclusion.
    "n26_index_delete" -> IndexDeleteOracleSql,

    // n35: the beam walk unrolled — same symmetrized-graph
    // definition, same entry rule, same (s desc, id asc) beam cuts,
    // fixed 8 rounds.
    "n35_graph_ann" ->
      operators.SimilarityOps.graphBeamSearchSql("embeddings",
        queryId = 0L, graphK = 24, beam = 16, rounds = 8, k = 10,
        entryFan = 4),

    "n34b_knn_graph_bounded" ->
      operators.SimilarityOps.knnGraphBoundedSql("embeddings",
        k = 8, stride = 50, nProbe = 2, nndRounds = 2),

    "n34s_knn_sampled_recall" ->
      operators.SimilarityOps.knnGraphSampledRecallSql("embeddings",
        k = 8, stride = 50, nProbe = 2, nndRounds = 2,
        sampleN = 1000),

    "n36_graph_ann_batch" ->
      operators.SimilarityOps.graphBeamSearchBatchSql("embeddings",
        queryMod = 199, graphK = 24, beam = 16, rounds = 8, k = 10,
        stride = 50, nProbe = 2, nndRounds = 2, entryFan = 4),

    "n37_graph_append" ->
      operators.SimilarityOps.knnGraphBoundedSql("embeddings",
        k = 8, stride = 50, nProbe = 2, nndRounds = 0,
        basePred = "vec_id % 4 <> 3"),

    "n1_cosine_topk" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_dot_product(v, qv) /
        |    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
        |    6) AS score
        |FROM e, q WHERE vec_id <> 0
        |ORDER BY score DESC, vec_id ASC LIMIT 20""".stripMargin,

    "n5_label_top_pairs" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY score DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin,

    "n7_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
        |ORDER BY vec_a ASC, vec_b ASC""".stripMargin,

    // n23: per-query top-k with the label-inequality constraint — the
    // window over broadcast-scored candidates, stated directly.
    "n23_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv,
        |    nrm AS qnrm FROM n WHERE vec_id % 73 = 0),
        |s AS (SELECT q.query_id, n.vec_id, n.label,
        |    round(list_dot_product(n.v, q.qv) / (n.nrm * q.qnrm), 6)
        |      AS score
        |  FROM n JOIN q ON n.label <> q.qlabel),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, vec_id ASC) AS rn FROM s)
        |SELECT query_id, vec_id, label, score FROM r WHERE rn <= 5
        |ORDER BY query_id ASC, score DESC, vec_id ASC""".stripMargin,

    "n8_ivf_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id % 50 = 0),
        |assignment AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN cents c) WHERE rn = 1),
        |q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        |probed AS (
        |  SELECT centroid_id FROM cents, q
        |  ORDER BY round(list_dot_product(cv, qv) / (cnrm * qnrm), 6)
        |    DESC, centroid_id ASC
        |  LIMIT 3),
        |members AS (
        |  SELECT vec_id FROM assignment JOIN probed USING (centroid_id))
        |SELECT a.vec_id,
        |  round(list_dot_product(a.v, q.qv) / (a.nrm * q.qnrm), 6)
        |    AS score
        |FROM n a JOIN members USING (vec_id), q
        |WHERE a.vec_id <> 0
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    // n14: PQ encode (per-subspace argmin vs the strided codebook,
    // the constant ||vs||^2 dropped from the argmin on both sides)
    // + ADC scoring from the (subspace, code) lookup table.
    "n14_pq_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |sub(s) AS (VALUES (0), (1), (2), (3)),
        |vs AS (SELECT vec_id, s,
        |    list_slice(v, s*16 + 1, s*16 + 16) AS vs
        |  FROM e, sub),
        |cents AS (SELECT vec_id AS cid, s,
        |    list_slice(v, s*16 + 1, s*16 + 16) AS cs
        |  FROM e, sub WHERE vec_id % 50 = 0),
        |codes AS (
        |  SELECT vec_id, s, cid FROM (
        |    SELECT v.vec_id, v.s, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id, v.s
        |        ORDER BY round(list_dot_product(c.cs, c.cs)
        |          - 2 * list_dot_product(v.vs, c.cs), 6) ASC,
        |          c.cid ASC) AS rn
        |    FROM vs v JOIN cents c USING (s)) WHERE rn = 1),
        |q AS (SELECT s, vs AS qs FROM vs WHERE vec_id = 0),
        |lut AS (SELECT c.s, c.cid,
        |    round(list_dot_product(q.qs, c.cs), 6) AS contrib
        |  FROM cents c JOIN q USING (s))
        |SELECT co.vec_id, round(sum(l.contrib), 6) AS score
        |FROM codes co JOIN lut l USING (s, cid)
        |WHERE co.vec_id <> 0
        |GROUP BY co.vec_id
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    // n15: IVFPQ = n10's coarse probe CTEs + n14's codes/LUT CTEs,
    // with the LUT keyed per query; scores only over IVF candidates.
    "n15_ivfpq_batch" -> IvfPqBatchOracleSql,

    // n21: serving from the persisted index must produce the exact
    // recompute result — the oracle IS n15's (same codebook
    // convention, same batch, same ADC arithmetic).
    "n21_stored_ivfpq" -> IvfPqBatchOracleSql,

    // n22: the incrementally-built inverted file rolled up per
    // centroid must equal the full-recompute assignment — n15's
    // assignment CTE, grouped.
    "n22_index_append" -> IndexAppendOracleSql,

    // n16: label centroids with the same 6-dp-rounded per-dim means
    // as n13, lowest cosine-to-own-centroid first.
    "n16_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |mdim AS (
        |  SELECT label, t.i, round(avg(v[t.i]), 6) AS m
        |  FROM n, unnest(generate_series(1, len(v))) AS t(i)
        |  GROUP BY label, t.i),
        |c1 AS (SELECT label, list(m ORDER BY i) AS cv
        |  FROM mdim GROUP BY label),
        |c1n AS (SELECT label, cv,
        |    sqrt(list_dot_product(cv, cv)) AS cnrm FROM c1)
        |SELECT a.vec_id, a.label,
        |  round(list_dot_product(a.v, c.cv) / (a.nrm * c.cnrm), 6)
        |    AS cscore
        |FROM n a JOIN c1n c USING (label)
        |ORDER BY cscore ASC, vec_id ASC LIMIT 30""".stripMargin,

    // n18: n7's in-bucket pair relation + the n9 recursive-CTE
    // component resolution; non-representatives (cluster_id <> id)
    // are the pruned set.
    "n18_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
        |    >= 0.4),
        |sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.r FROM sym s JOIN reach r ON s.dst = r.id),
        |clusters AS (SELECT id, min(r) AS cluster_id
        |  FROM reach GROUP BY id),
        |pruned AS (SELECT id FROM clusters WHERE cluster_id <> id)
        |SELECT em.label, count(*)::BIGINT AS n_vecs,
        |  (count(*) - count(p.id))::BIGINT AS n_kept,
        |  count(p.id)::BIGINT AS n_pruned
        |FROM embeddings em LEFT JOIN pruned p ON em.vec_id = p.id
        |GROUP BY em.label ORDER BY em.label ASC""".stripMargin,

    // n19: same 60-bit md5 token hash; buckets/signs/sums all exact
    // integers, one division at the end.
    "n19_hashed_embed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS x FROM toks),
        |f0 AS (SELECT doc_id, (x // 2) % 64 AS bucket,
        |    CASE WHEN x % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM h),
        |f AS (SELECT doc_id, bucket, sum(sgn)::BIGINT AS w FROM f0
        |  GROUP BY 1, 2 HAVING sum(sgn) <> 0),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM f
        |  GROUP BY 1),
        |q AS (SELECT bucket, w AS qw FROM f WHERE doc_id = 0),
        |qn AS (SELECT nrm AS qnrm FROM nrm WHERE doc_id = 0),
        |dots AS (SELECT f.doc_id, sum(f.w * q.qw)::BIGINT AS dot
        |  FROM f JOIN q USING (bucket) GROUP BY 1)
        |SELECT d.doc_id, round(d.dot / (n.nrm * qn.qnrm), 6) AS score
        |FROM dots d JOIN nrm n USING (doc_id), qn
        |WHERE d.doc_id <> 0
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "n13_kmeans_refine" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id % 50 = 0),
        |a0 AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN cents c) WHERE rn = 1),
        |mdim AS (
        |  SELECT a0.centroid_id, t.i, round(avg(a.v[t.i]), 6) AS m
        |  FROM a0 JOIN n a USING (vec_id),
        |    unnest(generate_series(1, len(a.v))) AS t(i)
        |  GROUP BY a0.centroid_id, t.i),
        |c1 AS (
        |  SELECT centroid_id, list(m ORDER BY i) AS cv
        |  FROM mdim GROUP BY centroid_id),
        |c1n AS (SELECT centroid_id, cv,
        |    sqrt(list_dot_product(cv, cv)) AS cnrm FROM c1),
        |a1 AS (
        |  SELECT vec_id, centroid_id, cscore FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      round(list_dot_product(a.v, c.cv) / (a.nrm * c.cnrm), 6)
        |        AS cscore,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN c1n c) WHERE rn = 1)
        |SELECT centroid_id, count(*) AS n_members,
        |  floor((2 * sum(CAST(round(cscore * 1000000) AS BIGINT))
        |         + count(*)) / (2.0 * count(*))) / 1000000.0
        |    AS mean_cos
        |FROM a1 GROUP BY centroid_id
        |ORDER BY centroid_id ASC""".stripMargin,

    // n20: n13's refinement CTEs (a1 keeps the trained assignment)
    // extended with n8's probe/members/top-k against c1n.
    "n20_trained_ivf" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id % 50 = 0),
        |a0 AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN cents c) WHERE rn = 1),
        |mdim AS (
        |  SELECT a0.centroid_id, t.i, round(avg(a.v[t.i]), 6) AS m
        |  FROM a0 JOIN n a USING (vec_id),
        |    unnest(generate_series(1, len(a.v))) AS t(i)
        |  GROUP BY a0.centroid_id, t.i),
        |c1 AS (
        |  SELECT centroid_id, list(m ORDER BY i) AS cv
        |  FROM mdim GROUP BY centroid_id),
        |c1n AS (SELECT centroid_id, cv,
        |    sqrt(list_dot_product(cv, cv)) AS cnrm FROM c1),
        |a1 AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN c1n c) WHERE rn = 1),
        |q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        |probed AS (
        |  SELECT centroid_id FROM c1n, q
        |  ORDER BY round(list_dot_product(cv, qv) / (cnrm * qnrm), 6)
        |    DESC, centroid_id ASC
        |  LIMIT 3),
        |members AS (
        |  SELECT vec_id FROM a1 JOIN probed USING (centroid_id))
        |SELECT a.vec_id,
        |  round(list_dot_product(a.v, q.qv) / (a.nrm * q.qnrm), 6)
        |    AS score
        |FROM n a JOIN members USING (vec_id), q
        |WHERE a.vec_id <> 0
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

    "n12_multiprobe_neardup" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |  FROM e),
        |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id % 50 = 0),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT a.vec_id, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY round(list_dot_product(a.v, c.cv) /
        |                       (a.nrm * c.cnrm), 6) DESC,
        |                 c.centroid_id ASC) AS rn
        |    FROM n a CROSS JOIN cents c) WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        |  FROM assign x JOIN assign y USING (centroid_id)
        |  WHERE x.vec_id < y.vec_id),
        |scored AS (
        |  SELECT vec_a, vec_b,
        |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
        |      AS score
        |  FROM cand JOIN n a ON cand.vec_a = a.vec_id
        |    JOIN n b ON cand.vec_b = b.vec_id)
        |SELECT vec_a, vec_b, score FROM scored WHERE score >= 0.4
        |ORDER BY vec_a ASC, vec_b ASC""".stripMargin,

    "n10_ivf_batch" -> IvfBatchOracleSql,

    // n28: the recall@k metric itself through the gate — approx =
    // the n10 chain, exact = the brute-force ranking, both derived
    // from the same CTEs so conventions can't drift.
    "n28_ivf_recall" -> IvfRecallOracleSql,

    "n29_quantized_topk" ->
      graft.operators.SimilarityOps.quantizedTopKSql(
        "embeddings", queryMod = 73, k = 5),

    "n6x_lsh_seeded_topk" ->
      graft.operators.SimilarityOps.seededLshTopKSql(
        "embeddings", queryId = 0L, k = 10),

    "n6y_lsh_batch_topk" ->
      graft.operators.SimilarityOps.seededLshTopKBatchSql(
        "embeddings", queryMod = 73, k = 5),

    "n6z_lsh_recall" ->
      graft.operators.SimilarityOps.seededLshRecallSql(
        "embeddings", queryMod = 73, k = 5),

    "n2_exact_dedup" ->
      """WITH dup AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS content_md5,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id ASC) AS rn
        |  FROM dup)
        |SELECT doc_id, source, content_md5 FROM r WHERE rn = 1
        |ORDER BY doc_id ASC""".stripMargin,

    "n3_ngram_jaccard" ->
      operators.DedupOps.jaccardPairsSql("documents", "doc_id", "text",
        0.8, maxDf = ShingleMaxDf),

    // n33: prefix filtering is candidate PRUNING, not a semantics
    // change — the exact-Jaccard oracle is n3's verbatim.
    "n33_prefix_jaccard" ->
      operators.DedupOps.jaccardPairsSql("documents", "doc_id", "text",
        0.8, maxDf = ShingleMaxDf),

    "n17_source_overlap" ->
      operators.DedupOps.sourceOverlapSql("documents", "doc_id",
        "source", "text", 0.8, maxDf = ShingleMaxDf),

    "n4_minhash_lsh" ->
      operators.DedupOps.minhashPairsSql("documents", "doc_id", "text",
        0.8, maxDf = ShingleMaxDf),

    // n31: the SymSpell pipeline replayed — same deletion keys, same
    // candidate equi-join, same levenshtein verify.
    "n31_fuzzy_match" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:3], ' ') AS title
        |  FROM documents),
        |t AS (
        |  SELECT doc_id*2 AS id, title AS s FROM t0
        |  UNION ALL
        |  SELECT doc_id*2+1, substring(title, 2, length(title))
        |  FROM t0),
        |k AS (
        |  SELECT id, s, unnest(list_distinct(list_append(
        |    [substring(s,1,i-1) || substring(s,i+1,length(s))
        |     for i in range(1, length(s)+1)], s))) AS key
        |  FROM t),
        |cand AS (
        |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
        |    x.s AS sa, y.s AS sb
        |  FROM k x JOIN k y ON x.key = y.key AND x.id < y.id)
        |SELECT id_a, id_b, levenshtein(sa, sb)::INT AS dist
        |FROM cand WHERE levenshtein(sa, sb) <= 1
        |ORDER BY id_a ASC, id_b ASC""".stripMargin,

    // n30: derived from t4's fingerprint CTE chain — same bands,
    // same Hamming filter.
    "n30_simhash_pairs" ->
      operators.DedupOps.simhashPairsSql("documents", "doc_id",
        "text", maxDist = 3),

    "n9_dup_clusters" ->
      operators.DedupOps.dupClustersSql("documents", "doc_id", "text",
        0.8, maxDf = ShingleMaxDf),

    "n11_cluster_sizes" ->
      operators.DedupOps.dupClusterSizesSql("documents", "doc_id",
        "text", 0.8, maxDf = ShingleMaxDf),

    "n24_keep_best" ->
      operators.DedupOps.keepBestSql("documents", "doc_id", "text",
        0.8, "n_chars", maxDf = ShingleMaxDf),

    "n25_substring_pairs" ->
      operators.DedupOps.substringPairsSql("documents", "doc_id",
        "text", n = 8, maxDf = ShingleMaxDf),

    "n27_contained_docs" ->
      operators.DedupOps.containedDocsSql("documents", "doc_id",
        "text", n = 8, maxDf = ShingleMaxDf))
}
