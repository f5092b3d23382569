package graft
package probes

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Warm per-query job-count/gap profile for the WHOLE suite — finds
  * queries paying an outsized scheduling floor (njobs × gap) rather
  * than compute. One warm-up rep, then `reps` measured, best wall
  * kept. Usage: `runMain graft.probes.SuiteProfile <sfDir> [reps]`
  */
object SuiteProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = Sessions.local(Sessions.envCores)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        spans.synchronized {
          spans += ((j.jobId, starts.getOrDefault(j.jobId, j.time), j.time))
        }
    })
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val measured = (1 to reps).map { _ =>
            spans.synchronized(spans.clear())
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(120)
            val sorted = spans.synchronized(spans.sortBy(_._2).toVector)
            val jobSum = sorted.map(s => s._3 - s._2).sum / 1e3
            val gaps = sorted.sliding(2).collect {
              case Vector(a, b) => math.max(0L, b._2 - a._3)
            }.sum / 1e3
            (wall, sorted.size, jobSum, gaps)
          }
          Some((name, measured.minBy(_._1)))
        } catch { case _: Throwable => None }
    }
    rows.sortBy(-_._2._1).foreach { case (n, (w, nj, js, g)) =>
      println(f"[suite] $n%-28s wall=$w%.3f njobs=$nj%2d jobSum=$js%.3f gapSum=$g%.3f")
    }
    val t = rows.map(_._2._1).sum
    val tj = rows.map(_._2._3).sum
    val tg = rows.map(_._2._4).sum
    println(f"[suite] TOTAL wall=$t%.2f jobSum=$tj%.2f gapSum=$tg%.2f njobs=${rows.map(_._2._2).sum}")
    spark.stop()
  }
}
