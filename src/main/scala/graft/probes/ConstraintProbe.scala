package graft
package probes

/** Is Catalyst constraint propagation a real cost on the ITERATIVE
  * tier's chained plans? h6c's ledger (r13, re-read r16) attributes
  * its floor to construction-time ANALYSIS of the chained-round tree
  * (superlinear in depth). `spark.sql.constraintPropagation.enabled`
  * is the one analysis term that is quadratic in predicate count on
  * exactly that tree shape and has never been probed here. Arms,
  * rep-interleaved, closures resolved through rawQueries so each arm
  * measures the session it is handed:
  *   main — the shipped parent session
  *   nocp — same session config, constraintPropagation OFF
  * Equality witness: collected rows must match across arms.
  * Usage: runMain graft.probes.ConstraintProbe <sfDir> <q1,q2,..> [reps]
  */
object ConstraintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val nocp = spark.newSession()
    nocp.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val arms = Seq("main" -> spark, "nocp" -> nocp)

    names.foreach { name =>
      val fn = SparkEntry.rawQueries(name)
      def run(ss: org.apache.spark.sql.SparkSession): Double = {
        val t0 = System.nanoTime()
        fn(ss, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      arms.foreach { case (_, ss) => run(ss); run(ss) } // warm
      val acc = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      (1 to reps).foreach { _ =>
        arms.foreach { case (a, ss) => acc(a) ::= run(ss) }
      }
      // SORTED multiset compare (round-17 ADVICE): the result-order
      // guarantee is per-query, so an ordered compare could print a
      // false equal=false for a query without a total output ordering
      val r0 = fn(arms(0)._2, sfDir).collect().map(_.toString)
        .sorted.toSeq
      val r1 = fn(arms(1)._2, sfDir).collect().map(_.toString)
        .sorted.toSeq
      println(s"[cp] $name equal=${r0 == r1}")
      arms.foreach { case (a, _) =>
        println(f"[cp] $name $a%-5s min=${acc(a).min}%.3f " +
          acc(a).reverse.map(t => f"$t%.3f").mkString(" "))
      }
    }
    spark.stop()
  }
}
