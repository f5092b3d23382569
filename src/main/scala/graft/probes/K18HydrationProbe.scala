package graft
package probes

import org.apache.spark.sql.functions._

/** Decomposes k18_signature_store's wall time (VERDICT r17 #4): the
  * registry closure is copyDir(store template → fresh run root)
  * [hard-link hydration] + DedupOps.appendIfNovel [the measured
  * gate]. The r17 SuiteProfile read gap ≈ jobSum for k18 and the
  * open question was whether the gap is hydration IO or driver
  * planning. This times the two phases separately, min-of-reps,
  * and counts the template's files so the hydration cost has a
  * denominator.
  * Usage: runMain graft.probes.K18HydrationProbe <sfDir> [reps]
  */
object K18HydrationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val fix = RegistryFixtures.cachedStreamInput(spark, sfDir,
      "sigstore") { root =>
      operators.DedupOps.initSignatureStore(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        root + "/tmpl", SparkEntry.ShingleMaxDf)
      ()
    }
    val nFiles = {
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      count(new java.io.File(fix + "/tmpl"))
    }
    println(s"[k18h] template files=$nFiles")
    // the registry query runs under the ReportTier child — replicate
    val ss = RegistryFixtures.reportChild(spark, sfDir, "documents")
    val batch = Tables.documents(ss, sfDir)
      .select("doc_id", "source", "text")
      .filter(col("doc_id") % 7 === 0)
    val tHyd = scala.collection.mutable.ArrayBuffer[Double]()
    val tGate = scala.collection.mutable.ArrayBuffer[Double]()
    // warm
    locally {
      val root = RegistryFixtures.tempTableRoot("graft_k18h") + "/store"
      RegistryFixtures.copyDir(fix + "/tmpl", root)
      operators.DedupOps.appendIfNovel(batch, "doc_id", "source",
        "text", root, minShared = 3)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to reps).foreach { _ =>
      val root = RegistryFixtures.tempTableRoot("graft_k18h") + "/store"
      val t0 = System.nanoTime()
      RegistryFixtures.copyDir(fix + "/tmpl", root)
      val t1 = System.nanoTime()
      operators.DedupOps.appendIfNovel(batch, "doc_id", "source",
        "text", root, minShared = 3)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      tHyd += (t1 - t0) / 1e9
      tGate += (t2 - t1) / 1e9
    }
    println(f"[k18h] hydration min=${tHyd.min}%.4f " +
      s"all=${tHyd.map(t => f"$t%.4f").mkString(",")}")
    println(f"[k18h] gate      min=${tGate.min}%.4f " +
      s"all=${tGate.map(t => f"$t%.4f").mkString(",")}")
    spark.stop()
  }
}
