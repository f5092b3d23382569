package graft
package probes

/** Tests whether the host-sensitive inflation of the window/sort tier
  * (round-16 control run: r4/w5/st3/w1 ~2× over pin on BOTH code
  * states, quiet probes) sits in the window/SMJ buffer handoff:
  * WindowExec buffers each partition's rows in an
  * ExternalAppendOnlyUnsafeRowArray that switches from a plain array
  * to a spill-capable UnsafeExternalSorter after
  * `spark.sql.windowExec.buffer.in.memory.threshold` rows — default
  * 4096, a cluster-guarding value that on a 128 GiB local[32] node
  * moves bounded buffers onto an IO-sensitive path. Arms:
  *   w8na     — the shipped report-tier child (width 8, AQE off)
  *   w8na+mem — same, plus window/SMJ in-memory thresholds raised to
  *              4 M rows (still bounded: the largest per-partition
  *              window group at sf0.1 is ~12 k rows)
  * Closures resolve through rawQueries so each arm's session IS the
  * configuration measured.
  * Usage: runMain graft.probes.WindowSpillProbe <sfDir> <q1,..> [reps]
  */
object WindowSpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val base = RegistryFixtures.stChild(spark, 8, aqe = false)
    val mem = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")
      ss.conf.set("spark.sql.windowExec.buffer.in.memory.threshold",
        "4194304")
      ss.conf.set(
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
        "4194304")
      ss.conf.set(
        "spark.sql.sessionWindow.buffer.in.memory.threshold",
        "4194304")
      ss
    }
    val arms = Seq("w8na" -> base, "w8na+mem" -> mem)
    def runOnce(n: String, ss: org.apache.spark.sql.SparkSession)
        : Double = {
      val t0 = System.nanoTime()
      SparkEntry.rawQueries(n)(ss, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(n => arms.foreach { case (_, ss) =>
      try runOnce(n, ss)
      catch { case e: Throwable =>
        println(s"[wspill] WARM-FAIL $n: ${e.getMessage}") }
    })
    val acc = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        arms.foreach { case (a, ss) =>
          acc((n, a)) ::= (try runOnce(n, ss)
            catch { case _: Throwable => Double.NaN })
        }
      }
    }
    names.foreach { n =>
      val mins = arms.map { case (a, _) => a -> acc((n, a)).min }
      val base0 = mins.head._2
      println(f"[wspill] $n " + mins.map { case (a, m) =>
        f"$a=$m%.3f" }.mkString(" ") +
        f" delta=${(mins(1)._2 - base0) / base0 * 100}%+.1f%%")
    }
    spark.stop()
  }
}
