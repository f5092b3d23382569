package graft
package probes

/** Times individual queries (noop-write action, same as Bench) —
  * the per-query A/B harness for plan experiments.
  * Usage: `runMain graft.probes.TimeQuery <sfDir> <q1,q2,...> [reps]`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    // Same fixed-work load probe as Bench: quiet machine ≈ 0.10–0.15 s.
    val calib = (1 to 3).map { _ =>
      val c0 = System.nanoTime()
      spark.range(4000000L).selectExpr("sum(id) as s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - c0) / 1e9
    }.min
    println(f"[time] calib=$calib%.3f")
    // SPARK_GRAFT_CLEARCACHE=1: drop all cached relations before each
    // rep — measures the COLD-cache warm-JIT time, which is what a
    // query pays inside a large bench suite (earlier queries' cached
    // blocks evict this query's between-rep cache) and on any fresh
    // cluster run. Default keeps the historical warm-cache behavior.
    val clearCache = sys.env.get("SPARK_GRAFT_CLEARCACHE").contains("1")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        if (clearCache) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
