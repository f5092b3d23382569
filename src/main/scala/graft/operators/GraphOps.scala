package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics — the crawl-PRIORITIZATION step between h5's
  * frontier discovery and the fetch scheduler. The reference crawls
  * catalog pages in discovery order (ethical_crawler.py's per-source
  * loops); at web scale the frontier outgrows the fetch budget and the
  * scheduler needs a global importance order — PageRank over the page
  * graph is the canonical one.
  *
  * Determinism is the hard part of making an ITERATIVE float algorithm
  * hash-gateable across engines: double-sum PageRank accumulates in
  * whatever order the shuffle delivers, so the 6th decimal flaps
  * between runs, let alone engines. This implementation runs the b1
  * convention end-to-end: ranks live on an exact integer MICRO grid
  * (1 rank point = 1e-6), every per-edge contribution is an integer
  * floor-division (`div` here, `//` in the DuckDB twin), and the
  * damping multiply-then-divide is integer too — so the iteration is
  * bit-identical under any partitioning, any aggregation order, and
  * both engines. Headroom: total mass is |V|·1e6 and the damping step
  * peaks at 85× a node's inflow, so 64-bit holds past 10^10 pages.
  *
  * Scale shape per iteration: one equi-join of the rank relation onto
  * the out-degree-annotated edge relation (both hash-partitioned on
  * src — at rest the edge table is bucketed by src so the join is
  * co-located), one hash aggregate on dst (map-side combined), one
  * left join back to the node set. No broadcast is assumed anywhere —
  * ranks and edges are both corpus-scale. Hub pages (every page links
  * "/") concentrate the dst aggregate exactly like r1's hot keys; the
  * map-side combine absorbs it (each task emits ONE partial per hub,
  * so the hot reducer receives |tasks| rows, not |edges|).
  *
  * The iteration count is a FIXED spec constant (not a convergence
  * loop): the plan below chains `iters` rounds into ONE lazily-built
  * job — for bounded small `iters` this beats per-round
  * materialization (no intermediate parquet/memory round-trips), and
  * it is what makes the unrolled-CTE oracle twin possible. A
  * convergence-driven variant would localCheckpoint per round like
  * [[DedupOps.dupClusters]]; production web ranks run 10–30 rounds
  * either way.
  */
object GraphOps {

  /** Initial rank: 1.0 in micro-units. */
  val InitMicro = 1000000L
  /** Teleport term: 0.15 in micro-units; damping 85/100 applied as
    * integer multiply-then-floor-divide.
    */
  val TeleportMicro = 150000L
  val DampingPct = 85L

  /** PageRank over an edge relation `(src, dst)` (multi-edges and
    * self-loops participate as-is; dangling-node mass drains — the
    * standard simplification, deterministic in both engines). Returns
    * the top `k` pages: `(url, n_in, pr_micro)` ordered rank-desc,
    * url-asc — a TakeOrderedAndProject, never a global sort.
    */
  def pageRank(edges: DataFrame, iters: Int, k: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val ewd = e.join(outdeg, "src")
    val nodes = e.select(col("src").as("url"))
      .unionByName(e.select(col("dst").as("url"))).distinct()
    var ranks = nodes.select(col("url"), lit(InitMicro).as("pr"))
    for (_ <- 1 to iters) {
      val inc = ewd.join(ranks, ewd("src") === ranks("url"))
        .select(ewd("dst").as("url"), expr("pr div od").as("c"))
        .groupBy(col("url")).agg(sum(col("c")).as("inc"))
      ranks = nodes.join(inc, Seq("url"), "left")
        .select(col("url"),
          (lit(TeleportMicro) +
            expr(s"($DampingPct * coalesce(inc, CAST(0 AS BIGINT)))" +
              " div 100")).as("pr"))
    }
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("n_in"))
    ranks.join(indeg, ranks("url") === indeg("dst"), "left")
      .select(ranks("url"),
        coalesce(col("n_in"), lit(0L)).as("n_in"), col("pr"))
      .orderBy(col("pr").desc, col("url").asc)
      .limit(k)
  }

  /** The identical unrolled iteration as DuckDB CTE text.
    * `edgesCtes` must end with a relation `edges(src, dst)`; the
    * caller prepends `WITH `. Every constant is the shared field
    * above, so the two sides cannot drift on the arithmetic.
    */
  def pageRankSql(edgesCtes: String, iters: Int, k: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.url,
         |    CAST($TeleportMicro +
         |      ($DampingPct * coalesce(i$i.inc, 0)) // 100 AS BIGINT)
         |      AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT w.dst AS url, sum(w.pr // w.od) AS inc
         |    FROM (SELECT e.src, e.dst, o.od, r.pr
         |          FROM edges e
         |          JOIN outdeg o ON e.src = o.src
         |          JOIN r${i - 1} r ON e.src = r.url) w
         |    GROUP BY 1) i$i ON n.url = i$i.url)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCtes,
       |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
       |nodes AS (
       |  SELECT DISTINCT url FROM (
       |    SELECT src AS url FROM edges
       |    UNION ALL SELECT dst AS url FROM edges)),
       |r0 AS (SELECT url, CAST($InitMicro AS BIGINT) AS pr FROM nodes),
       |$rounds,
       |ind AS (SELECT dst AS url, count(*) AS n_in FROM edges GROUP BY 1)
       |SELECT r.url, coalesce(ind.n_in, 0)::BIGINT AS n_in, r.pr
       |FROM r$iters r LEFT JOIN ind ON r.url = ind.url
       |ORDER BY r.pr DESC, r.url ASC LIMIT $k""".stripMargin
  }
}
