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
