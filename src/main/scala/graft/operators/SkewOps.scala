package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps

/** Skew mitigation: salted two-level aggregation. For hot grouping
  * keys (one key ≫ partition capacity), a direct groupBy funnels the
  * hot key through one reducer. Salting splits each key into
  * `saltBuckets` sub-keys for the partial aggregate, then re-combines
  * — both shuffles are uniform.
  *
  * For algebraic aggregates (count/sum/min/max) the result is
  * IDENTICAL to the direct aggregation — asserted by the
  * r1_salted_counts oracle entry, which shares its oracle SQL shape
  * with the unsalted a2 path.
  *
  * (Spark's AQE skew handling covers JOIN skew at runtime; aggregation
  * skew is already two-phase partial/final for algebraic functions —
  * this operator is the explicit pattern for the cases that aren't,
  * e.g. exact count-distinct per hot key or large grouping state.)
  */
object SkewOps {

  /** Salt derived from the FULL row content (not
    * `monotonically_increasing_id`, which depends on partition layout):
    * two runs over the same data produce identical partial-aggregate
    * shapes, so a skewed partial is reproducible when debugging.
    */
  def contentSalt(df: DataFrame, saltBuckets: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets))

  def saltedCounts(df: DataFrame, keyCol: String, saltBuckets: Int)
      : DataFrame =
    df.withColumn("__salt", contentSalt(df, saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("cnt"))
      .resultSorted(col("cnt").desc, col(keyCol).asc)

  /** Bucketized temporal RANGE join: pair each left row with every
    * right row of the same key whose timestamp falls in
    * [left.ts, left.ts + windowMillis). A naive theta join
    * (`l.ts <= r.ts < l.ts + w`) forces a per-key cross product;
    * bucketizing time into `windowMillis`-wide buckets turns it into
    * an EQUI-join on (key, bucket) — each left row probes exactly two
    * buckets (its own and the next), then the precise range filter
    * runs on the tiny candidate set. Shuffle volume is O(rows·2),
    * never O(rows²).
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, windowMillis: Long): DataFrame = {
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_millis(c) / windowMillis)
    val l = left.select(col(keyCol).as("k"),
        col(tsCol).as("l_ts"), col("*"))
      .withColumn("__b",
        explode(array(bucket(col("l_ts")), bucket(col("l_ts")) + 1)))
    val r = right.select(col(keyCol).as("k2"),
        col(tsCol).as("r_ts"))
      .withColumn("__b2", bucket(col("r_ts")))
    l.join(r, col("k") === col("k2") && col("__b") === col("__b2") &&
        col("r_ts") >= col("l_ts") &&
        unix_millis(col("r_ts")) < unix_millis(col("l_ts")) + windowMillis)
      .drop("k2", "__b", "__b2")
  }

  /** AS-OF join (point-in-time backward join): pair each left row
    * with the single most recent right row of the same key whose
    * timestamp is <= the left row's timestamp — the
    * attribution/feature-lookup join (each purchase attributed to the
    * last prior click; each sample joined to the feature value in
    * effect when it was taken). Spark has no ASOF operator; the naive
    * forms are a per-key theta-join cross product or a
    * collect-per-key loop, both of which die at scale.
    *
    * This is the UNION-MARKER formulation: both sides are tagged and
    * unioned, then ONE window pass per key ordered by (ts, side)
    * carries the latest right payload forward into each left row via
    * `last(_, ignoreNulls)` over an unbounded-preceding frame. Right
    * rows sort BEFORE left rows at equal timestamps, so the match is
    * inclusive (right.ts <= left.ts). Cost: one shuffle on the key +
    * one in-partition sort over |L|+|R| rows — never O(|L|·|R|), no
    * per-key explosion, window state is one row. At 100 TB this is
    * the same plan: the key-hash exchange spreads users across
    * executors and the running-last frame is O(1) memory per
    * partition stream.
    *
    * Ties (several right rows at one (key, ts)) resolve to the max
    * `tiebreakCol` via the window's own ordering — ASOF tie
    * semantics are otherwise engine-dependent, and the oracle gate
    * needs a deterministic winner.
    *
    * Generalizes [[ReferenceOps.asOfJoin]] (the single-stream
    * special case that carries only the matched timestamp): two
    * independent relations, arbitrary right payload columns carried
    * onto the match — i.e. an actual JOIN, servable against any
    * dimension-history table. Its oracle (r3) is the LATERAL top-1
    * per-row form — a structurally different algorithm, so the gate
    * checks semantics, not the same plan twice.
    *
    * Reference: the reference joins each dataset's fetch events to
    * the metadata snapshot in effect at fetch time
    * (ethical_crawler.py:416-451, refresh-then-query) — the as-of
    * lookup done there by refetching is expressed here as one join.
    *
    * @param rightPayload columns of `right` carried onto the match
    *                     (null when no right row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      rightPayload: Seq[String], tiebreakCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftPayload = left.columns.toSeq
    // Payload names may not shadow left columns — both sides would
    // emit the name and downstream resolution turns ambiguous.
    val clash = leftPayload.toSet.intersect(rightPayload.toSet)
    require(clash.isEmpty,
      s"asofJoin: rightPayload collides with left columns: " +
        s"${clash.toSeq.sorted.mkString(", ")} — alias the right side first")
    // Ties fold into the ONE window's ordering instead of a separate
    // (key, ts) pre-reduction exchange: right rows at an equal
    // timestamp sort tiebreak-ASC, so `last` lands on the max —
    // identical winner, one exchange fewer (measured: the pre-reduce
    // variant paid a full extra hashpartitioning(__k, __t) + sort of
    // the right side).
    //
    // The payload travels as ONE struct per right row, not one
    // window per column: a struct literal is non-null for every
    // right row even when individual fields are null, so a single
    // `last(struct, ignoreNulls)` carries the ENTIRE newest matching
    // row atomically. (Per-column windows would backfill a NULL
    // field from an OLDER right row — a composite row that never
    // existed — and make matched-but-NULL indistinguishable from
    // no-match.)
    val r1 = right
      .select(col(keyCol).as("__k"), col(rightTsCol).as("__t"),
        lit(0).as("__side"), col(tiebreakCol).as("__tb"),
        struct(rightPayload.map(col): _*).as("__r_s"))
    val l1 = left
      .select(Seq(col(keyCol).as("__k"), col(leftTsCol).as("__t"),
        lit(1).as("__side"), lit(null).as("__tb"),
        lit(null).as("__r_s")) ++
        leftPayload.map(c => col(c).as(s"__l_$c")): _*)
    // Right-side struct is typed by r1's side of the union; left rows
    // carry a typed null struct (cast by unionByName against r1's
    // schema). Right rows sort BEFORE left at equal __t (side 0 < 1),
    // so the match is inclusive; left rows' relative order among
    // themselves is irrelevant (each frame ends at its own row, and
    // other left rows in between carry null structs the `last` skips).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r1.unionByName(l1, allowMissingColumns = true)
      .select(Seq(col("__side"),
        last(col("__r_s"), ignoreNulls = true).over(w).as("__m")) ++
        leftPayload.map(c => col(s"__l_$c").as(c)): _*)
      .filter(col("__side") === 1)
      .select(leftPayload.map(col) ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** HOT-KEY TWO-LEVEL WINDOW — the running (cumulative) sum per key
    * WITHOUT funneling any key's full timeline through one window
    * partition. A direct `sum(v) OVER (PARTITION BY key ORDER BY
    * ts)` puts each key's whole history in one task — the window
    * analogue of the aggregation skew [[saltedCounts]] covers (r1),
    * and the SCALE.md "genuinely hot key" case: one user with 10⁸
    * events pins a single executor however many there are.
    *
    * Decomposition (the classic parallel prefix-sum, relationally):
    *  1. slice each key's timeline into RANGE buckets on the order
    *     column (fixed time slices — order-MONOTONE, so slice s is
    *     wholly before slice s+1; a hash salt would interleave
    *     orders and break prefix semantics);
    *  2. a window inside each (key, slice) computes the local
    *     prefix sum — partition size is slice-bounded, parallelism
    *     is keys × slices;
    *  3. per-(key, slice) totals (map-side-combined groupBy — a
    *     relation of |keys|·|slices| rows, tiny next to the corpus)
    *     get an EXCLUSIVE prefix over slices from a second window
    *     whose partitions are |slices|-bounded;
    *  4. offsets equi-join back on (key, slice) — same hash keys as
    *     step 2's exchange — and add.
    *
    * Addition is reassociated (slice totals first), so for float
    * measures the result can differ from the sequential window in
    * the last ulps — the r4 gate rounds at 1e-6 against the DIRECT
    * window oracle, and the 2-decimal fixture values keep true sums
    * ≥5e-7 away from any rounding boundary (w2's convention). For
    * integer/decimal measures the equality is exact.
    */
  def twoLevelRunningSum(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, sliceMillis: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sliced = df.select(col(keyCol), col(tieCol), col(tsCol),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__slice",
        floor(unix_millis(col(tsCol)) / sliceMillis))
    val wLocal = Window.partitionBy(col(keyCol), col("__slice"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSlices = Window.partitionBy(col(keyCol))
      .orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col(keyCol), col("__slice"))
      .agg(sum(col("__v")).as("__slice_total"))
      .withColumn("__offset",
        coalesce(sum(col("__slice_total")).over(wSlices),
          lit(0).cast("double")))
      .select(col(keyCol), col("__slice"), col("__offset"))
    sliced
      .withColumn("__local", sum(col("__v")).over(wLocal))
      .join(offsets, Seq(keyCol, "__slice"))
      .select(col(keyCol), col(tieCol), col(tsCol),
        round(col("__local") + col("__offset"), 6)
          .as("running_value"))
      // one row per input row — corpus-scaling, so the scalable
      // range sort (Sorting.scala convention)
      .orderBy(col(keyCol).asc, col(tsCol).asc, col(tieCol).asc)
  }

  /** RELATIONAL COUNT-MIN SKETCH — [[heavyHitters]]' driver-side
    * `stat.countMinSketch` re-expressed as pure algebra with
    * exact-integer registers (the e9-for-HLL treatment applied to
    * CMS), so the estimator itself goes through the oracle gate:
    * d=4 md5-derived hash rows × w=256 counters, estimate = min
    * over rows — never an undercount, overcount bounded by εN.
    * Registers are SUM-mergeable (per-partition counters add), the
    * d·w state is fixed at any cardinality, and the probe is a
    * broadcast join of the candidate set — the streaming/100 TB
    * frequency estimate with its exactness witness riding along.
    */
  def cmsCounts(df: DataFrame, itemCol: String, k: Int, d: Int = 4,
      w: Int = 256): DataFrame = {
    val cands = df.groupBy(col(itemCol))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(itemCol).asc)
      .limit(k)
    cmsProbe(cmsRegisters(df, itemCol, d, w), cands, itemCol, d, w)
  }

  /** The (j, b, c) register relation of [[cmsCounts]] alone — d·w
    * SUM-mergeable exact-integer counters. Split out so the
    * streaming path (st11) merges per-batch registers with the SAME
    * bucket arithmetic the batch estimator probes with.
    */
  def cmsRegisters(df: DataFrame, itemCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    // numPartitions=1: the d-row relation only feeds a broadcast;
    // the default-parallelism range would launch a 32-task job to
    // collect 4 rows (a per-micro-batch tax in the streaming path).
    val js = df.sparkSession.range(0, d, 1, 1)
      .select(col("id").cast("int").as("j"))
    df.select(col(itemCol).cast("string").as("x"))
      .crossJoin(broadcast(js))
      .select(col("j"),
        (conv(substring(md5(concat_ws(":", col("j"), col("x"))),
          1, 15), 16, 10).cast("long") % w).as("b"))
      .groupBy(col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Probe a (j, b, c) register relation for a candidate relation
    * `(itemCol, exact_cnt)`: estimate = min over the d rows. The
    * candidate set is broadcast-joined against the fixed-size
    * register table — the serving read of a stored/streamed sketch.
    */
  def cmsProbe(regs: DataFrame, cands: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame = {
    import graft.Sorting.ResultSortOps
    val js = regs.sparkSession.range(0, d, 1, 1)
      .select(col("id").cast("int").as("j"))
    cands.crossJoin(broadcast(js))
      .select(col(itemCol), col("exact_cnt"), col("j"),
        (conv(substring(md5(concat_ws(":", col("j"),
          col(itemCol).cast("string"))), 1, 15), 16, 10)
          .cast("long") % w).as("b"))
      .join(regs, Seq("j", "b"))
      .groupBy(col(itemCol), col("exact_cnt"))
      .agg(min(col("c")).as("cms_cnt"))
      .resultSorted(col("exact_cnt").desc, col(itemCol).asc)
  }

  /** Sketch-based heavy hitters: Count-Min Sketch over a column
    * (Spark's built-in `stat.countMinSketch`), probed for the given
    * candidate values. Fixed-size state (depth×width counters)
    * regardless of cardinality — the streaming/100 TB alternative to
    * an exact groupBy when only frequent items matter. Estimates
    * overcount by at most ε·N with probability 1−δ.
    */
  def heavyHitters(df: DataFrame, colName: String,
      candidates: Seq[String], eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42)
      : Seq[(String, Long)] = {
    val sketch = df.stat.countMinSketch(colName, eps, confidence, seed)
    candidates.map(v => v -> sketch.estimateCount(v))
  }
}
