package graft
package probes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Settles whether n6z's brute-force ground-truth stage is faster
  * through codegen graft_dot (polarization identity, the round-16
  * rewrite) or the interpreted zip_with/aggregate lambda it replaced
  * — the bench close read ~flat vs pin where JobProfile had pinned
  * 0.35 s on that stage. Arms run ONLY the exact side (the part that
  * changed), rep-interleaved, equality-witnessed.
  * Usage: runMain graft.probes.N6zProbe <sfDir> [reps]
  */
object N6zProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val (queryMod, k, scale) = (73, 5, 64)
    val embeddings = Tables.embeddings(spark, sfDir)
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("vec_id").asc)

    def finish(exact: DataFrame): DataFrame =
      exact.withColumn("__rn", row_number().over(wk))
        .filter(col("__rn") <= k)
        .select("query_id", "vec_id")
        .orderBy(col("query_id").asc, col("vec_id").asc)

    def hofArm(): DataFrame = {
      val quant = (c: Column) =>
        transform(toDoubleArray(c), x => floor(x * scale).cast("long"))
      val v = embeddings.select(col("vec_id"),
        quant(col("embedding")).as("vq"))
      val qVecs = v.filter(col("vec_id") % queryMod === 0)
        .select(col("vec_id").as("query_id"), col("vq").as("qq"))
      finish(v.crossJoin(broadcast(qVecs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          aggregate(zip_with(col("vq"), col("qq"),
              (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2")))
    }

    def dotArm(): DataFrame = {
      val quant = (c: Column) =>
        transform(toDoubleArray(c), x => floor(x * scale).cast("double"))
      val v = embeddings.select(col("vec_id"),
          quant(col("embedding")).as("vq"))
        .withColumn("nn", dot(col("vq"), col("vq")))
      val qVecs = v.filter(col("vec_id") % queryMod === 0)
        .select(col("vec_id").as("query_id"), col("vq").as("qq"),
          col("nn").as("qnn"))
      finish(v.crossJoin(broadcast(qVecs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (col("nn") + col("qnn") -
            lit(2.0) * dot(col("vq"), col("qq"))).as("d2")))
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq("hof" -> (() => hofArm()), "dot" -> (() => dotArm()))
    arms.foreach { case (_, f) => run(f) }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (a, f) => acc(a) ::= run(f) }
    }
    val e0 = hofArm().collect().map(_.toString).toSeq
    val e1 = dotArm().collect().map(_.toString).toSeq
    println(s"[n6z] equal=${e0 == e1}")
    arms.foreach { case (a, _) =>
      println(f"[n6z] $a min=${acc(a).min}%.3f " +
        acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
