package graft
package probes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** t21 (n-gram diversity) is COMPUTE-bound, not scheduling-bound
  * (JobProfile round-16: ONE job, jobSum ≈ 0.8 s of 0.98 wall) — so
  * the lever is the per-row bigram expression, not the session.
  * Arms, rep-interleaved min:
  *   cur    — shipped: transform(sequence) building "a b" strings,
  *            groupBy(src, bg-string);
  *   struct — same positional build but the group key is
  *            struct(a, b): no concat_ws allocation per bigram; the
  *            distinct-type count is identical (tokens are
  *            space-split, so pair→string is injective);
  *   zip    — struct key built from zip_with over two slices instead
  *            of transform over an index sequence.
  * Usage: runMain graft.probes.T21Probe <sfDir> [reps]
  */
object T21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    import graft.Sorting.ResultSortOps

    val w = split(col("text"), " ")

    def finish(pairs: DataFrame): DataFrame =
      pairs
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).cast("long").as("n_bigrams"))
        .select(col("source"), col("n_types"), col("n_bigrams"),
          round(col("n_types").cast("double") /
            col("n_bigrams").cast("double"), 6).as("ttr"))
        .resultSorted(col("source").asc)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur" -> (() =>
        operators.TextOps.ngramDiversity(
          Tables.documents(spark, sfDir), "source", "text")),
      "struct" -> (() => {
        val pairs = when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("a"),
              element_at(w, i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
        finish(Tables.documents(spark, sfDir)
          .select(col("source"), explode(pairs).as("bg"))
          .groupBy(col("source"), col("bg"))
          .agg(count(lit(1)).as("c")))
      }),
      "zip" -> (() => {
        val pairs = when(size(w) >= 2,
          zip_with(slice(w, lit(1), size(w) - 1),
            slice(w, lit(2), size(w) - 1),
            (a, b) => struct(a.as("a"), b.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
        finish(Tables.documents(spark, sfDir)
          .select(col("source"), explode(pairs).as("bg"))
          .groupBy(col("source"), col("bg"))
          .agg(count(lit(1)).as("c")))
      }))

    def run(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all arms (codegen compile out of the measurement)
    arms.foreach { case (_, f) => run(f) }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (a, f) => acc(a) ::= run(f) }
    }
    // equality witness: the two variants must agree cell-for-cell
    val cur = arms(0)._2().collect().map(_.toString).toSeq
    arms.tail.foreach { case (a, f) =>
      val got = f().collect().map(_.toString).toSeq
      println(s"[t21] arm=$a equal=${got == cur}")
    }
    arms.foreach { case (a, _) =>
      println(f"[t21] $a min=${acc(a).min}%.3f " +
        acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
