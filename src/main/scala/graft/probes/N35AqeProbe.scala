package graft
package probes

/** n35's remaining cost is per-job scheduling (JobProfile round-16:
  * 37 jobs, gapSum ≈ 2× jobSum warm) and its serving child keeps AQE
  * on — unmeasured for this query: the width sweep excluded n35
  * (own-session tier), and AQE's stage-by-stage materialization adds
  * one driver barrier per exchange, which a 37-job walk pays ~37
  * times. Arms, rep-interleaved (fixtures per arm session are warmed
  * before measurement):
  *   aqe-on  — the shipped servingChild (stateWidth(16·48) = 4, AQE on)
  *   aqe-off — same width, AQE off
  * Usage: runMain graft.probes.N35AqeProbe <sfDir> [reps]
  */
object N35AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val w = graft.streaming.StreamingOps.stateWidth(16L * 48)
    val arms: Seq[(String, org.apache.spark.sql.SparkSession)] = Seq(
      "aqe-on" -> RegistryFixtures.stChild(spark, w),
      "aqe-off" -> RegistryFixtures.stChild(spark, w, aqe = false))

    def run(ss: org.apache.spark.sql.SparkSession): Double = {
      val t0 = System.nanoTime()
      operators.SimilarityOps.graphBeamSearch(
        RegistryFixtures.annGraphFixture(ss, sfDir),
        Tables.embeddings(ss, sfDir), queryId = 0L, beam = 16,
        rounds = 8, k = 10, entryFan = 4)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, ss) => run(ss); run(ss) } // warm + fixture
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (a, ss) => acc(a) ::= run(ss) }
    }
    // equality witness across arms (AQE is physical-only, but prove it)
    val ref = run _ // avoid unused warning pattern
    val r0 = operators.SimilarityOps.graphBeamSearch(
      RegistryFixtures.annGraphFixture(arms(0)._2, sfDir),
      Tables.embeddings(arms(0)._2, sfDir), 0L, 16, 8, 10, entryFan = 4)
      .collect().map(_.toString).toSeq
    val r1 = operators.SimilarityOps.graphBeamSearch(
      RegistryFixtures.annGraphFixture(arms(1)._2, sfDir),
      Tables.embeddings(arms(1)._2, sfDir), 0L, 16, 8, 10, entryFan = 4)
      .collect().map(_.toString).toSeq
    println(s"[n35aqe] equal=${r0 == r1}")
    arms.foreach { case (a, _) =>
      println(f"[n35aqe] $a min=${acc(a).min}%.3f " +
        acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
