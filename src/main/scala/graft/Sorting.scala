package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Final-sort helper for queries whose output is BOUNDED-SMALL at any
  * input scale — aggregates over bounded group domains (sources,
  * priorities, nations, languages, brands×types, …).
  *
  * A global `orderBy` plans a range exchange whose partitioner
  * SAMPLES the child first — an extra job per query that buys nothing
  * when the result would fit in one partition regardless of input
  * size. `resultSorted` is one round-robin exchange to a single
  * partition + a local sort: the same total order, no sampling pass —
  * the same reason Spark itself collapses ORDER BY + LIMIT into
  * TakeOrderedAndProject, and what any engine does to present a small
  * final result (measured: ~60–90 ms saved per query at sf0.1).
  *
  * NOT for row-level outputs that grow with the data (per-document
  * scores, pair lists, event streams) — those keep the scalable range
  * sort.
  */
object Sorting {
  implicit final class ResultSortOps(private val df: DataFrame)
      extends AnyVal {
    def resultSorted(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
