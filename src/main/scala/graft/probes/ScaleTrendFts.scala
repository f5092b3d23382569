package graft
package probes

import org.apache.spark.sql.functions._

/** FTS-ladder scale probe (round-13 verdict item 6): index BUILD
  * time, index SIZE, and served query time (l6 tf·idf, l7 BM25, l13
  * query expansion) over an N×-replicated documents corpus.
  *
  * Replica tokens are suffixed with the replica index (ScaleTrend's
  * n4 convention): each copy is an independent 1× retrieval problem
  * in a disjoint token space, so
  *  - the BUILD should grow ~linearly in N (tokenize + explode +
  *    bucketed write are all data-proportional — no cross-token
  *    term anywhere), and
  *  - a QUERY against replica-0 terms should stay ~FLAT as N grows:
  *    the postings read is bucket-pruned by token, the candidate set
  *    (docs containing the query terms) is constant by construction,
  *    and that is precisely the 100 TB serving claim — corpus size
  *    scales the index, not the per-query work.
  * Usage: `runMain graft.probes.ScaleTrendFts <sfDir> <factor> [reps]`
  */
object ScaleTrendFts {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
    val big = (0 until factor)
      .map(k => docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1" + k.toString)))
      .reduce(_ unionByName _)
      .localCheckpoint()

    def timed(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale] $tag x$factor min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val root = RegistryFixtures.tempTableRoot("graft_fts_scale")
    var ix: operators.FtsOps.ServedFtsIndex = null
    timed("fts-build") {
      ix = operators.FtsOps.buildServedIndex(spark, big,
        "doc_id", "text", tag = s"sc$factor", root = root)
    }
    println(s"[scale] fts-index x$factor postings=" +
      spark.table(ix.postings).count() +
      " fpostings=" + spark.table(ix.fieldPostings).count())

    // replica-0 terms: the same query the registry ladder runs at 1x
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("l6-served")(run(operators.FtsOps.servedRanked(spark, ix,
      "doc_id", Seq("batch0", "dup0"), 50)))
    timed("l7-served")(run(operators.FtsOps.servedBm25(spark, ix,
      "doc_id", Seq("batch0", "dup0"), 50)))
    timed("l13-served")(run(operators.FtsOps.servedQueryExpansion(
      spark, ix, "doc_id", Seq("merge0", "dup0"), kFb = 10, nExp = 3,
      k = 50)))
    spark.stop()
  }
}
