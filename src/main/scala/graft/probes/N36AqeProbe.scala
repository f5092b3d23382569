package graft
package probes

/** Does n36's BATCH walk want AQE? Round 16 kept AQE on the batch
  * serving child by hypothesis ("larger per-round relations are where
  * runtime re-planning could still matter") while measuring AQE off
  * for the single-query walk (−21%, N35AqeProbe). SuiteProfile r17
  * reads n36 at 60 jobs with gapSum ≈ 1.5× jobSum — the same
  * barrier-dominated shape n35 had, so the hypothesis needs its
  * measurement. Arms, rep-interleaved (per-arm fixtures warmed before
  * measurement):
  *   aqe-on  — the shipped servingBatchChild (stateWidth(11·16·48), AQE on)
  *   aqe-off — same width, AQE off
  * Usage: runMain graft.probes.N36AqeProbe <sfDir> [reps]
  */
object N36AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val w = graft.streaming.StreamingOps.stateWidth(11L * 16 * 48)
    val arms: Seq[(String, org.apache.spark.sql.SparkSession)] = Seq(
      "aqe-on" -> RegistryFixtures.stChild(spark, w),
      "aqe-off" -> RegistryFixtures.stChild(spark, w, aqe = false))

    def frame(ss: org.apache.spark.sql.SparkSession) =
      operators.SimilarityOps.graphBeamSearchBatch(
        RegistryFixtures.boundedNswFixture(ss, sfDir),
        Tables.embeddings(ss, sfDir), queryMod = 199, beam = 16,
        rounds = 8, k = 10, entryFan = 4)

    def run(ss: org.apache.spark.sql.SparkSession): Double = {
      val t0 = System.nanoTime()
      frame(ss).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, ss) => run(ss); run(ss) } // warm + fixture
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (a, ss) => acc(a) ::= run(ss) }
    }
    // equality witness across arms (AQE is physical-only, but prove it)
    val r0 = frame(arms(0)._2).collect().map(_.toString).toSeq
    val r1 = frame(arms(1)._2).collect().map(_.toString).toSeq
    println(s"[n36aqe] equal=${r0 == r1}")
    arms.foreach { case (a, _) =>
      println(f"[n36aqe] $a min=${acc(a).min}%.3f " +
        acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
