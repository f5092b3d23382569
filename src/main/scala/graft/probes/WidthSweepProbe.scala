package graft
package probes

/** Rep-INTERLEAVED A/B/... for the report-tier narrow-session rule
  * (round-14 verdict item 2): each rep runs every (query, arm) pair
  * before any second rep — the round-14 measurement lesson (a
  * sequential same-JVM A/B "measured" a 45% win that was JIT warm-up
  * ordering). Arms:
  *   - main: the parent session (width = cores, AQE on);
  *   - w4 / w8: stChild narrow widths;
  *   - w4na / w8na: same widths with AQE OFF — a floor-tier query
  *     pays one extra job barrier per exchange under AQE's
  *     stage-by-stage execution, which at 0.1 s scale can dominate.
  * All arms resolve through [[SparkEntry.rawQueries]] so the session
  * handed to the closure IS the configuration measured; the extra
  * `ship` arm runs the wrapped registry entry (the shipped
  * ReportTier derivation) for comparison against the hand-built arms.
  * Usage: `runMain graft.probes.WidthSweepProbe <sfDir> <q1,q2,..> [reps]`
  */
object WidthSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val arms: Seq[(String, org.apache.spark.sql.SparkSession)] = Seq(
      "main" -> spark,
      "w4" -> RegistryFixtures.stChild(spark, 4),
      "w8" -> RegistryFixtures.stChild(spark, 8),
      "w4na" -> RegistryFixtures.stChild(spark, 4, aqe = false),
      "w8na" -> RegistryFixtures.stChild(spark, 8, aqe = false))

    def runOnce(n: String, ss: org.apache.spark.sql.SparkSession)
        : Double = {
      val t0 = System.nanoTime()
      // rawQueries, NOT queries: the wrapped registry re-derives the
      // narrow child from whatever session is passed, which would
      // collapse every arm of this sweep into the same configuration
      // for already-listed queries (round-15 advice) — the probe must
      // measure the arm it was handed.
      SparkEntry.rawQueries(n)(ss, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // the shipped configuration as its own arm: wrapped closure, so
    // ReportTier's derivation (or its identity, for unlisted names)
    // is what runs — measured against the hand-built arms above
    def runShip(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm every (query, arm) once — codegen + fixture builds out of
    // the measurement
    names.foreach { n =>
      arms.foreach { case (_, ss) =>
        try runOnce(n, ss)
        catch { case e: Throwable =>
          println(s"[width] WARM-FAIL $n: ${e.getMessage}") }
      }
      try runShip(n)
      catch { case e: Throwable =>
        println(s"[width] WARM-FAIL $n(ship): ${e.getMessage}") }
    }
    val acc = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        arms.foreach { case (a, ss) =>
          acc((n, a)) ::= (try runOnce(n, ss)
            catch { case _: Throwable => Double.NaN })
        }
        acc((n, "ship")) ::= (try runShip(n)
          catch { case _: Throwable => Double.NaN })
      }
    }
    names.foreach { n =>
      val mins = (arms.map(_._1) :+ "ship")
        .map(a => a -> acc((n, a)).min)
      val base = mins.head._2
      val best = mins.minBy(_._2)
      println(f"[width] $n " + mins.map { case (a, m) =>
        f"$a=$m%.3f" }.mkString(" ") +
        f" best=${best._1}(${(best._2 - base) / base * 100}%+.1f%%)")
    }
    spark.stop()
  }
}
