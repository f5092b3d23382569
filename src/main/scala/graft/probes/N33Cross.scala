package graft
package probes

import org.apache.spark.sql.functions._

/** Decide n33's ending (round-11 verdict item 7): WHERE does the
  * PPJoin path (n33) cross the all-shared-shingle path (n3)?
  *
  * The structural answer this probe records: the two paths produce
  * the same pairs from the same capped shingle relation, and under
  * the df-cap the per-replica candidate mass of BOTH is constant —
  * disjoint-shingle replication scales each linearly, so their RATIO
  * is a constant and no fixture-factor crossing exists. The regime
  * where n33 wins is the one the df-cap otherwise amputates: df
  * grows with corpus size (real duplication — the same shingles
  * appear in ever more documents), n3's candidate mass grows ~df²
  * while the prefix/length/positional filters keep n33's near the
  * true-pair mass. The probe measures both: capped factors ×2/×4/×8
  * (expect parallel linear curves), and an UNCAPPED ×f run where the
  * df² regime is real (expect n3 >> n33, the crossing).
  *
  * Usage: runMain graft.probes.N33Cross <sfDir> <factorsCsv> [reps] [uncappedFactor]
  */
object N33Cross {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args(1).split(",").map(_.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val uncappedF = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)

    def disjoint(f: Int) = (0 until f)
      .map(k => docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1" + k.toString)))
      .reduce(_ unionByName _)
    // PLAIN replication: the same text in f× documents — every
    // shingle's df multiplies by f, the df² regime a growing real
    // corpus with real duplication enters.
    def plain(f: Int) = (0 until f)
      .map(k => docs.withColumn("doc_id",
        col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)

    def time(label: String, q: () => org.apache.spark.sql.DataFrame)
        : Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[n33x] $label min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts.min
    }

    factors.foreach { f =>
      val big = disjoint(f).localCheckpoint()
      time(s"n3 capped x$f", () => operators.DedupOps.jaccardPairs(
        big, "doc_id", "text", minJaccard = 0.8,
        maxDf = SparkEntry.ShingleMaxDf))
      time(s"n33 capped x$f",
        () => operators.DedupOps.prefixFilteredJaccardPairs(
          big, "doc_id", "text", tNum = 4, tDen = 5,
          maxDf = SparkEntry.ShingleMaxDf))
    }
    // The uncapped df² regime (cap lifted to 'no cap' via MaxValue):
    // plain replication multiplies every df by f.
    val bigP = plain(uncappedF).localCheckpoint()
    time(s"n3 UNCAPPED x$uncappedF",
      () => operators.DedupOps.jaccardPairs(bigP, "doc_id", "text",
        minJaccard = 0.8, maxDf = Int.MaxValue))
    time(s"n33 UNCAPPED x$uncappedF",
      () => operators.DedupOps.prefixFilteredJaccardPairs(bigP,
        "doc_id", "text", tNum = 4, tDen = 5, maxDf = Int.MaxValue))
    spark.stop()
  }
}
