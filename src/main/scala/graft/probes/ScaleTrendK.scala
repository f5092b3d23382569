package graft
package probes

import org.apache.spark.sql.functions._

/** Versioned-table (k-family) scale probe — the last major family
  * with no measured slope (round-14 verdict item 5): commit cost vs
  * TABLE SIZE at ×1/×4/×10, for the three write-path classes the
  * bench's worst duck ratios live in:
  *
  *  - `merge-commit` (k10's operator): a FIXED-size upsert batch
  *    (replica-0's even doc_ids) against an N×-replicated,
  *    range-partitioned table. CoW MERGE rewrites only the files the
  *    batch's key range touches, so the claim under test is: commit
  *    cost ∝ touched-file bytes (constant here), NOT table size.
  *  - `delete-commit` (k24's operator): a replica-0-restricted
  *    predicate delete — one MoR tombstone commit. The predicate
  *    SCAN is honestly data-proportional (every row must be tested);
  *    the commit itself is ∝ matched rows.
  *  - `restore` (k19's operator): metadata-only — one manifest
  *    write re-referencing v0's files; must stay FLAT at any size.
  *  - `current-read`: the merged-snapshot read, reported separately
  *    so the data-proportional read never masquerades as commit cost.
  *
  * Replicas get disjoint doc_id ranges (+k·10M — ScaleTrend's n4
  * convention) and the template is range-partitioned by doc_id into
  * 6·factor files, so replica-0's keys co-locate in a CONSTANT file
  * subset as the table grows — the layout a partitioned production
  * table has. Per rep, the mutable root is hardlink-copied from an
  * immutable template OUTSIDE the timed region (k19 convention): the
  * timed work is the operator, never fixture IO.
  * Usage: `runMain graft.probes.ScaleTrendK <sfDir> <factor> [reps]`
  */
object ScaleTrendK {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars")
    val big = (0 until factor)
      .map(k => docs.withColumn("doc_id",
        col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .localCheckpoint()
    val batch = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + lit(1000L))
      .localCheckpoint()

    val tmplRoot = RegistryFixtures.tempTableRoot("graft_kscale")
    Versioned.init(big.repartitionByRange(6 * factor, col("doc_id")),
      tmplRoot + "/tmpl")
    // a second template with one extra commit, for restore(0)
    RegistryFixtures.copyDir(tmplRoot + "/tmpl", tmplRoot + "/tmpl2")
    Versioned.mergeUpsert(batch, tmplRoot + "/tmpl2", Seq("doc_id"))

    def timedOver(tag: String, tmpl: String)(op: String => Unit)
        : String = {
      var last: String = null
      val ts = (1 to reps).map { i =>
        val root = RegistryFixtures
          .tempTableRoot(s"graft_kscale_${tag}_$i") + "/docs"
        RegistryFixtures.copyDir(tmpl, root)
        val t0 = System.nanoTime()
        op(root)
        last = root
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale] $tag x$factor min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
      last
    }

    timedOver("merge-commit", tmplRoot + "/tmpl") { root =>
      Versioned.mergeUpsert(batch, root, Seq("doc_id")); ()
    }
    val delRoot = timedOver("delete-commit", tmplRoot + "/tmpl") {
      root =>
        Versioned.deleteWhere(spark, root,
          col("doc_id") % 10 === 4 && col("doc_id") < 10000000L,
          Seq("doc_id")); ()
    }
    timedOver("restore", tmplRoot + "/tmpl2") { root =>
      Versioned.restore(spark, root, 0); ()
    }
    // the data-proportional read, named and separated
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Versioned.current(spark, delRoot)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] current-read x$factor min=${ts.min}%.3f " +
      s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
