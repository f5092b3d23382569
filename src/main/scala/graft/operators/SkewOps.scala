package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def saltedCounts(df: DataFrame, keyCol: String, saltBuckets: Int)
      : DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(keyCol), monotonically_increasing_id()),
          lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
}
