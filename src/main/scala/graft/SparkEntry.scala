package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each `queries` entry is one operator from the SURVEY §2 inventory (or
  * a north-star extension), run against the testdata tables in the given
  * scale-factor dir. `oracleSql` carries the DuckDB-equivalent SQL for
  * the hash-match gate; column aliases match the Spark output exactly
  * and every query ends in a total order (the reference's own sorts are
  * tie-ambiguous — SURVEY §2.6 ⚠).
  */
object SparkEntry {
  // Shared constants re-exposed for specs/ScaleTrend (the registry
  // itself lives in the Queries* family files + RegistryFixtures).
  val ShingleMaxDf: Int = RegistryFixtures.ShingleMaxDf
  val BatchFtsQueries: Seq[(Int, Seq[String])] =
    RegistryFixtures.BatchFtsQueries
  val SeedPages: Seq[String] = RegistryFixtures.SeedPages

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `search` verb shape: ILIKE disjunction + equality
    * filter + recency top-k (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    ReferenceOps.search(
      docs,
      query = Some("spark"),
      textCols = Seq("text", "source"),
      equalityFilters = Map("lang" -> "en"),
      orderCol = "doc_id",
      tiebreakers = Seq.empty,
      limit = 20)
  }

  /** The full registry: one entry per operator, concatenated from the
    * family files (QueriesCore/DedupSim/Text/Pipeline/Search/
    * StreamVersioned — round-10 verdict item 7 split; key sets are
    * disjoint by the family prefix routing, so ++ is a pure union).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    // report-tier narrow-session wrap (ReportTier scaladoc): width
    // derived from input bounds, identity for everything unlisted
    rawQueries.map { case (n, fn) => n -> ReportTier.wrap(n, fn) }

  /** The UNWRAPPED registry — closures that execute under whatever
    * session the caller passes, with no ReportTier derivation
    * applied. Arm-based probes (WidthSweepProbe and kin) MUST resolve
    * through this map: via `queries`, every listed closure re-derives
    * its narrow child from the arm session handed in, so all arms
    * measure the same configuration and a future sweep could neither
    * re-validate nor falsify the narrow-session rule (round-15
    * advice). Bench/Verify stay on `queries` — the wrapped closures
    * are the shipped configuration the oracle gate replays.
    */
  def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    disjointUnion("queries", Seq(
      QueriesCore.queries, QueriesDedupSim.queries,
      QueriesText.queries, QueriesPipeline.queries,
      QueriesSearch.queries, QueriesStreamVersioned.queries))

  def oracleSql: Map[String, String] =
    disjointUnion("oracleSql", Seq(
      QueriesCore.oracleSql, QueriesDedupSim.oracleSql,
      QueriesText.oracleSql, QueriesPipeline.oracleSql,
      QueriesSearch.oracleSql, QueriesStreamVersioned.oracleSql))

  /** `++` silently keeps the LAST binding of a duplicated key, so a
    * future name collision across family files would shadow one
    * registration without any gate noticing (the Bench suite-size
    * fingerprint can still match by count). Fail fast instead: the
    * union is only legal when the family key sets are disjoint.
    */
  private def disjointUnion[V](what: String,
      parts: Seq[Map[String, V]]): Map[String, V] = {
    val merged = parts.reduce(_ ++ _)
    if (merged.size != parts.map(_.size).sum) {
      val dups = parts.flatMap(_.keys)
        .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
      throw new IllegalStateException(
        s"duplicate $what keys across family registries: " +
          dups.toSeq.sorted.mkString(", "))
    }
    merged
  }
}
