package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the HIERARCHICAL entry tier (round-12 verdict item 5):
  * the graph walk's hop count must stay flat as the corpus grows —
  * the property HNSW buys with its layer hierarchy and this repo
  * buys with a coarse-centroid routing tier over the IVF machinery.
  *
  * Method: two deterministic clustered corpora, ×1 and ×10 the same
  * cluster structure; the NAVIGATION graph is the bounded build's
  * symmetrized edges (the production pairing). "Hops" = the smallest
  * round budget at which the beam walk reaches ≥ 8/10 recall vs the
  * exact scan. The FLAT baseline enters at a fixed node (min id —
  * entry placement carries no information about the query); the
  * HIER walk enters at [[SimilarityOps.hierEntry]]'s two-level
  * routed medoid. The gate: hier's hop need does not grow ×1 → ×10
  * (≤ +1 round), and at ×10 it needs no more rounds than flat.
  */
class GraphAnnHierEntrySpec extends SparkSpec {
  import spark.implicits._

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unif(seed: Long): Double =
    (splitmix(seed) >>> 11).toDouble / (1L << 53).toDouble
  private def gauss(seed: Long): Double = {
    val u1 = math.max(unif(seed), 1e-12)
    val u2 = unif(splitmix(seed) ^ 0x632be59bd9b4e019L)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** GraphAnnBoundedSpec's clustered corpus, parameterized so ×1 and
    * ×10 share the same centers (a true replica scale-up).
    */
  private def clusteredCorpus(n: Int, d: Int, c: Int): DataFrame = {
    val centers = Array.tabulate(c, d)((j, t) => gauss(j * 1000003L + t))
    (0 until n).map { i =>
      val ctr = centers(i % c)
      val v = (0 until d).map(t =>
        (ctr(t) + 0.35 * gauss(i * 7919L + t * 104729L + 17L)).toFloat)
      (i.toLong, v, i % c)
    }.toDF("vec_id", "embedding", "label")
  }

  private def nswOf(emb: DataFrame): DataFrame = {
    val bounded = SimilarityOps.knnGraphBounded(emb, k = 24,
      stride = 50, nProbe = 2, nndRounds = 2)
    bounded.select("src", "dst")
      .unionByName(bounded.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct().localCheckpoint()
  }

  // Entry-tier strides must be COPRIME with the cluster count: labels
  // here are i % c, so a stride divisible by c samples seeds from ONE
  // cluster only (50 % 10 = 0 → every seed in cluster 0) — a
  // degenerate codebook no real corpus has. 47 and 47·3 = 141 are
  // both ≡ nonzero mod 10, so seed labels cycle through all clusters.
  private val EntryStride = 47
  private val EntryFan = 3

  /** Smallest round budget reaching >= `target` of the exact top-10
    * from the given entry; maxR+1 if never reached.
    */
  private def hopsToRecall(nsw: DataFrame, emb: DataFrame, qid: Long,
      entry: Long, target: Int, maxR: Int): Int = {
    val exact = SimilarityOps.cosineTopK(emb, qid, k = 10)
      .select("vec_id").as[Long].collect().toSet
    (1 to maxR).find { r =>
      val walk = SimilarityOps.graphBeamSearch(nsw, emb, qid,
        beam = 16, rounds = r, k = 10, entryOverride = Some(entry))
        .select("vec_id").as[Long].collect().toSet
      (walk & exact).size >= target
    }.getOrElse(maxR + 1)
  }

  test("hier entry holds hop count flat at x10 replica scale where " +
      "a fixed flat entry pays the diameter") {
    // qid 11 → label 1: a cluster that holds a coarse seed at BOTH
    // scales (coarse seeds are 141k → labels k mod 10; x1's 4 coarse
    // seeds cover labels 0–3)
    val d = 32; val c = 10; val qid = 11L; val maxR = 8
    val emb1 = clusteredCorpus(n = 500, d = d, c = c).localCheckpoint()
    val emb10 = clusteredCorpus(n = 5000, d = d, c = c).localCheckpoint()
    val (nsw1, nsw10) = (nswOf(emb1), nswOf(emb10))

    // fixed flat entry: min non-query id — no routing information
    val flat1 = hopsToRecall(nsw1, emb1, qid, entry = 0L,
      target = 8, maxR = maxR)
    val flat10 = hopsToRecall(nsw10, emb10, qid, entry = 0L,
      target = 8, maxR = maxR)
    val h1 = SimilarityOps.hierEntry(emb1, qid,
      stride = EntryStride, fan = EntryFan)
    val h10 = SimilarityOps.hierEntry(emb10, qid,
      stride = EntryStride, fan = EntryFan)
    val hier1 = hopsToRecall(nsw1, emb1, qid, entry = h1,
      target = 8, maxR = maxR)
    val hier10 = hopsToRecall(nsw10, emb10, qid, entry = h10,
      target = 8, maxR = maxR)

    info(s"hops flat x1=$flat1 x10=$flat10 | hier x1=$hier1 x10=$hier10")
    assert(hier1 <= maxR && hier10 <= maxR,
      s"hier entry never reached 8/10 recall (x1=$hier1 x10=$hier10)")
    assert(hier10 <= hier1 + 1,
      s"hier hop count grew x1->x10: $hier1 -> $hier10")
    assert(hier10 <= flat10,
      s"hier needs more hops than flat at x10: $hier10 > $flat10")
  }

  test("hierEntryBatch == per-query hierEntry over a whole query " +
      "set (the batch is a batching, not a new entry rule)") {
    val emb = clusteredCorpus(n = 2000, d = 32, c = 10)
      .localCheckpoint()
    val batch = SimilarityOps.hierEntryBatch(emb,
        col("vec_id") % 163 === 0, stride = EntryStride,
        fan = EntryFan)
      .select("query_id", "entry_id")
      .as[(Long, Long)].collect().toMap
    val qids = (0L until 2000L).filter(_ % 163 == 0)
    assert(batch.keySet == qids.toSet,
      s"batch must route every query: got ${batch.keySet}")
    qids.foreach { qid =>
      val single = SimilarityOps.hierEntry(emb, qid,
        stride = EntryStride, fan = EntryFan)
      assert(batch(qid) == single,
        s"batch entry ${batch(qid)} != single $single for query $qid")
    }
  }

  test("hierEntryBatch plan is BNLJ- and cartesian-free (the " +
      "codebook scans are BroadcastHashJoins on the constant pmod " +
      "key, the n34b convention)") {
    val emb = clusteredCorpus(n = 2000, d = 32, c = 10)
      .localCheckpoint()
    val plan = SimilarityOps.hierEntryBatch(emb,
        col("vec_id") % 163 === 0, stride = EntryStride,
        fan = EntryFan)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "hier entry must not plan a broadcast nested loop join")
    assert(!plan.contains("CartesianProduct"),
      "hier entry must not plan a cartesian product")
    assert(plan.contains("BroadcastHashJoin"),
      "codebook scans should broadcast-hash-join")
  }

  test("hierEntry routes into the query's own cluster (the entry is " +
      "a same-label medoid) and is deterministic") {
    val emb = clusteredCorpus(n = 2000, d = 32, c = 10)
      .localCheckpoint()
    val qid = 7L
    val qLabel = emb.filter(col("vec_id") === qid)
      .select("label").as[Int].head()
    val e1 = SimilarityOps.hierEntry(emb, qid,
      stride = EntryStride, fan = EntryFan)
    val e2 = SimilarityOps.hierEntry(emb, qid,
      stride = EntryStride, fan = EntryFan)
    assert(e1 == e2, "hierEntry must be deterministic")
    val eLabel = emb.filter(col("vec_id") === e1)
      .select("label").as[Int].head()
    assert(eLabel == qLabel,
      s"routed entry $e1 (label $eLabel) not in query cluster $qLabel")
  }
}
