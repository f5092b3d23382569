package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Restores map-side parallelism for compute-heavy operators when the
  * upstream scan under-splits.
  *
  * Spark plans file splits at row-group granularity: a single parquet
  * file with one row group scans as ONE task, serializing every
  * downstream map-side computation (shingling, hashing, signature
  * minima) behind one core — while a multithreaded single-node engine
  * parallelizes the same pipeline across all threads. The testdata
  * tables are exactly that shape, and at 100 TB the same situation
  * appears whenever a compute-heavy stage sits on a source with fewer
  * splits than the cluster has slots (few huge row groups, a handful
  * of gzip files, a small dimension feeding an expensive extraction).
  *
  * `byKey` hash-repartitions on the row's key column ONLY when the
  * plan's scan yields fewer partitions than half the available slots —
  * above that the input is already parallel and this is the identity,
  * so a properly-split cluster-scale table never pays the exchange.
  * Hash partitioning (not round-robin) keeps the exchange REUSABLE:
  * downstream per-key aggregations (signature minima per doc, quality
  * per doc) are already co-located and plan no further shuffle, and it
  * avoids round-robin's determinism sort. The exchanged rows are the
  * operator's NARROW projection (id + payload column), not the full
  * scan row.
  */
object FanOut {
  /** Fan-out width: enough slots to un-serialize the compute without
    * drowning every downstream stage in per-task scheduling overhead —
    * a 32-wide explicit repartition propagates 32-task stages through
    * the whole pipeline (AQE never coalesces a user-specified
    * exchange), and measured at sf0.1 the extra scheduling costs MORE
    * than the recovered parallelism. 8 is the local sweet spot; a
    * properly-split source never reaches this code path at all.
    */
  private def width(slots: Int): Int = math.min(8, math.max(2, slots))

  def byKey(df: DataFrame, key: Column): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    // Split count read from the plan's LEAF SCANS — driver-side split
    // planning only. `df.rdd` here would physically plan (and, under
    // AQE, could eagerly execute) the whole input a second time and
    // then discard it (round-5 advice). Callers pass scan-only
    // projections, where leaf splits == input partitions; an unknown
    // leaf shape conservatively counts as already-parallel so the
    // exchange is never added on a plan this heuristic can't read.
    val splits = df.queryExecution.sparkPlan.collectLeaves().map {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.execute().getNumPartitions
      case s: org.apache.spark.sql.execution.LocalTableScanExec =>
        s.execute().getNumPartitions
      case _ => Int.MaxValue
    }
    val total =
      if (splits.isEmpty) Int.MaxValue
      else splits.map(n => math.min(n, 1 << 20)).sum
    // Identity once the input is at least as wide as the fan-out
    // target: repartitioning an 8-split scan to 8 partitions would be
    // a pure exchange with nothing recovered (Tables' layout repair
    // already re-splits the hot facts; this path remains for sources
    // that genuinely cannot be split).
    if (total >= width(slots)) df
    else df.repartition(width(slots), key)
  }
}
