package graft
package probes

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Prints per-job wall times and inter-job gaps for one query — the
  * diagnostic for "is this query slow because of compute or because of
  * job-count × scheduling floor?".
  * Usage: `runMain graft.probes.JobProfile <sfDir> <q1[,q2,...]> [reps]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val spans =
      scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, j.time)
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val tasks = j.stageInfos.map(_.numTasks).sum
        descs.put(j.jobId,
          s"tasks=$tasks ${d.take(110)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        spans.synchronized {
          spans += ((j.jobId, jobs.getOrDefault(j.jobId, j.time), j.time))
        }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        spans.synchronized(spans.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are posted async; give the bus a moment
        Thread.sleep(300)
        val sorted = spans.synchronized(spans.sortBy(_._2).toVector)
        val jobSum = sorted.map(s => s._3 - s._2).sum / 1e3
        val gaps = sorted.sliding(2).collect {
          case Vector(a, b) => math.max(0L, b._2 - a._3)
        }.sum / 1e3
        println(f"[prof] $name rep=$r wall=$wall%.3f njobs=${sorted.size} jobSum=$jobSum%.3f gapSum=$gaps%.3f")
        if (r == reps) sorted.foreach { case (id, s, e) =>
          println(f"[prof]   job=$id dur_ms=${e - s} ${descs.getOrDefault(id, "")}")
        }
      }
    }
    spark.stop()
  }
}
