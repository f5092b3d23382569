package graft
package probes

import org.apache.spark.sql.functions._

/** A/B: the graph-ANN serving walks (n35/n36) at the session default
  * shuffle width (32) vs a narrowed child session — the st9
  * stateWidth argument applied to the serving path: every walk round
  * shuffles relations bounded by |frontier|·degree (a few thousand
  * rows), so 32 reduce tasks per tiny exchange is pure scheduling
  * overhead at fixture scale. AQE's coalescePartitions already
  * merges the reduce side; this probe measures what is left.
  * Usage: `runMain graft.probes.GraphWalkWidthProbe <sfDir> [reps]`
  */
object GraphWalkWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)

    // REP-INTERLEAVED (the Bench round-robin discipline): the first
    // cut of this probe ran main→w8→w4 sequentially in one JVM and
    // "measured" a 45% win that was pure JIT/warmup ordering — the
    // bench interleave showed zero effect. Never trust a sequential
    // same-JVM A/B.
    val variants = Seq(
      ("main", spark), ("w8", RegistryFixtures.stChild(spark, 8)),
      ("w4", RegistryFixtures.stChild(spark, 4)))
    def mk(tag: String, ss: org.apache.spark.sql.SparkSession) = Seq(
      s"n35/$tag" -> (() => operators.SimilarityOps.graphBeamSearch(
        RegistryFixtures.annGraphFixture(ss, sfDir),
        Tables.embeddings(ss, sfDir), queryId = 0L, beam = 16,
        rounds = 8, k = 10, entryFan = 4)),
      s"n36/$tag" -> (() => operators.SimilarityOps.graphBeamSearchBatch(
        RegistryFixtures.boundedNswFixture(ss, sfDir),
        Tables.embeddings(ss, sfDir), queryMod = 199, beam = 16,
        rounds = 8, k = 10, entryFan = 4)))
    val qs = variants.flatMap { case (t, ss) => mk(t, ss) }
    // warm pass (fixtures + codegen), untimed
    qs.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val times = scala.collection.mutable.Map[String, Double]()
    (1 to reps).foreach { _ =>
      qs.foreach { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(tag) = math.min(times.getOrElse(tag, Double.MaxValue), dt)
      }
    }
    qs.foreach { case (tag, _) =>
      println(f"[walkw] $tag min=${times(tag)}%.3f") }
    spark.stop()
  }
}
