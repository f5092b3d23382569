package graft
package probes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Round-fusion A/B for the single-query graph walk (round-15
  * verdict item 3: "the n36 fusion was slower at |Q|=11; the
  * tradeoff may invert at 1"): arms, rep-interleaved on the SAME
  * AQE-off serving child the registry ships —
  *   cur    — shipped graphBeamSearch (one collect barrier per round)
  *   fused2 — two rounds per job: the first round's scored expansion
  *            and the second round's beam selection run IN-PLAN
  *            (visited rides in as a literal relation, next-beam is
  *            an orderBy-limit subtree, second expansion joins it),
  *            so 8 rounds pay 4 driver barriers. Identical semantics:
  *            the in-plan dedup keys on vec_id with max(s) over
  *            bit-identical doubles, and the (s desc, id asc) beam
  *            cut matches the driver-side sort.
  * Usage: runMain graft.probes.N35FuseProbe <sfDir> [reps]
  */
object N35FuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val ss = QueriesDedupSim.servingChild(spark)
    val (queryId, beam, rounds, k, entryFan) = (0L, 16, 8, 10, 4)

    def cur(): DataFrame =
      operators.SimilarityOps.graphBeamSearch(
        RegistryFixtures.annGraphFixture(ss, sfDir),
        Tables.embeddings(ss, sfDir), queryId, beam, rounds, k,
        entryFan = entryFan)

    def fused(): DataFrame = {
      val graph = RegistryFixtures.annGraphFixture(ss, sfDir)
      val embeddings = Tables.embeddings(ss, sfDir)
      val e = embeddings.select(col("vec_id"),
        toDoubleArray(col("embedding")).as("v"))
      val qvLit = typedLit(e.filter(col("vec_id") === queryId)
        .select(col("v")).collect()(0).getSeq[Double](0))
      val r0 = operators.SimilarityOps.hierEntryBatch(embeddings,
        col("vec_id") === queryId, 50, entryFan).collect()(0)
      var visited: Map[Long, Double] = Map(r0.getLong(1) -> r0.getDouble(2))
      import ss.implicits._
      (1 to rounds / 2).foreach { _ =>
        val beamIds = visited.toSeq
          .sortBy { case (id, s) => (-s, id) }.take(beam).map(_._1)
        val exp1 = graph.filter(col("src").isInCollection(beamIds))
          .select(col("dst").as("vec_id")).distinct()
        val sc1 = e.join(broadcast(exp1), Seq("vec_id"))
          .select(col("vec_id"), cosine(col("v"), qvLit).as("s"))
          .filter(col("vec_id") =!= queryId)
        val visDf = visited.toSeq.toDF("vec_id", "s")
        val v1 = visDf.unionByName(sc1)
          .groupBy(col("vec_id")).agg(max(col("s")).as("s"))
        val b2 = v1.orderBy(col("s").desc, col("vec_id").asc)
          .limit(beam).select(col("vec_id").as("src"))
        val exp2 = graph.join(broadcast(b2), Seq("src"))
          .select(col("dst").as("vec_id")).distinct()
        val sc2 = e.join(broadcast(exp2), Seq("vec_id"))
          .select(col("vec_id"), cosine(col("v"), qvLit).as("s"))
          .filter(col("vec_id") =!= queryId)
        val scored = sc1.unionByName(sc2)
          .groupBy(col("vec_id")).agg(max(col("s")).as("s"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1))
        val fresh = scored.filter { case (id, _) => !visited.contains(id) }
        if (fresh.nonEmpty) visited = visited ++ fresh
      }
      val top = visited.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      val topDf = top.toDF("vec_id", "s")
      embeddings.join(broadcast(topDf), Seq("vec_id"))
        .select(col("vec_id"), col("label"), col("s"),
          round(col("s"), 6).as("score"))
        .orderBy(col("s").desc, col("vec_id").asc)
        .drop("s")
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq("cur" -> (() => cur()), "fused2" -> (() => fused()))
    arms.foreach { case (_, f) => run(f); run(f) }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (a, f) => acc(a) ::= run(f) }
    }
    val a0 = cur().collect().map(_.toString).toSeq
    val a1 = fused().collect().map(_.toString).toSeq
    println(s"[n35fuse] equal=${a0 == a1}")
    arms.foreach { case (a, _) =>
      println(f"[n35fuse] $a min=${acc(a).min}%.3f " +
        acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
