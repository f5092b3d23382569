package graft
package probes

import org.apache.spark.sql.functions._

/** Scale-trend probe: times corpusPrep (the c1 pipeline) and
  * minhashPairs (the n4 LSH dedup — the designated 100 TB path) over
  * an in-flight N×-replicated documents table (doc_ids offset per
  * copy so dedup behavior is preserved copy-by-copy). Together with
  * the same replication in DuckDB (tools/duckdb_baseline-style
  * one-off) this separates fixed job latency from data-proportional
  * cost: a ratio that falls as N grows is latency-bound at sf0.1, not
  * plan-bound; an n4 time growing ~linearly in N is direct evidence
  * the banded-candidate design has no hidden quadratic term. For n4
  * each replica's TOKENS are suffixed with the replica index —
  * signatures are text-derived, so plain id-offset copies would be
  * genuine cross-replica duplicates and the WORKLOAD itself (real
  * near-dup pairs) would grow as N², measuring the corpus, not the
  * operator. With disjoint shingle spaces the probe is N independent
  * copies of the 1× dedup problem.
  * Usage: `runMain graft.probes.ScaleTrend <sfDir> <factor> [reps]`
  */
object ScaleTrend {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(Sessions.envCores)
    val docs = Tables.documents(spark, sfDir)
    val big = (0 until factor)
      .map(k => docs.withColumn("doc_id",
        col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
    val q = () => operators.AnalyticsOps.corpusPrep(big,
      idCol = "doc_id", textCol = "text", charsCol = "n_chars",
      langCol = "lang", minQuality = 0.55, samplePerMille = 500)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] c1 x$factor min=${times.min}%.3f " +
      s"all=${times.map(t => f"$t%.3f").mkString(",")}")
    val bigDisjoint = (0 until factor)
      .map(k => docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1" + k.toString)))
      .reduce(_ unionByName _)
    val qn4 = () => operators.DedupOps.minhashPairs(bigDisjoint,
      "doc_id", "text", minJaccard = 0.8,
      maxDf = SparkEntry.ShingleMaxDf)
    val n4Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qn4().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n4 x$factor min=${n4Times.min}%.3f " +
      s"all=${n4Times.map(t => f"$t%.3f").mkString(",")}")
    // t13 (boilerplate) over the same disjoint-shingle replicas: the
    // df window + per-doc fold + join-back are all data-proportional,
    // so time should track N with no quadratic term (relDf is held
    // fixed — the threshold scales with corpus size, which empties
    // the hot set at high N; that changes the REPORT, not the cost
    // shape being measured).
    val qt13 = () => operators.TextOps.boilerplate(bigDisjoint,
      "doc_id", "source", "text", relDf = 0.003, flagRatio = 0.2)
    val t13Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qt13().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] t13 x$factor min=${t13Times.min}%.3f " +
      s"all=${t13Times.map(t => f"$t%.3f").mkString(",")}")
    // w1 (top-3 orders per customer) over N×-replicated orders with
    // per-replica custkey offsets: the TopKPerKey pushdown vs Spark's
    // window path (kill switch off) on the SAME input — the shuffle
    // the pushdown saves grows with N, so the gap should widen.
    val orders = Tables.orders(spark, sfDir)
    val bigOrders = (0 until factor)
      .map(k => orders
        .withColumn("o_custkey", col("o_custkey") + lit(k * 10000000L))
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L)))
      .reduce(_ unionByName _)
    val wq = () => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      bigOrders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }
    Seq("true" -> "topk", "false" -> "window").foreach {
      case (flag, label) =>
        spark.conf.set("spark.graft.topkRewrite", flag)
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          wq().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scale] w1/$label x$factor min=${ts.min}%.3f " +
          s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.conf.set("spark.graft.topkRewrite", "true")
    // t24 (vocab-scale BPE APPLY) over the plain N× replicas: the
    // vocab is learned ONCE on the 1× corpus (fixed input artifact —
    // the probe measures the APPLY side), applied to every replica.
    // One mapPartitions scan → time must track N linearly.
    val merges = operators.TextOps.learnedMerges(docs, "text", 4)
    val qt24 = () => operators.TextOps.bpeApply(big, "doc_id",
      "text", merges)
    val t24Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qt24().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] t24 x$factor min=${t24Times.min}%.3f " +
      s"all=${t24Times.map(t => f"$t%.3f").mkString(",")}")
    // r4 (two-level window) over N×-replicated events with per-
    // replica user offsets: two bounded windows + equi-join — time
    // must track N with no per-key blowup (that's the point of the
    // slice decomposition).
    val events = Tables.events(spark, sfDir)
    val bigEvents = (0 until factor)
      .map(k => events
        .withColumn("user_id", col("user_id") + lit(k * 10000000L))
        .withColumn("event_id", col("event_id") + lit(k * 100000000L)))
      .reduce(_ unionByName _)
    val qr4 = () => operators.SkewOps.twoLevelRunningSum(bigEvents,
      "user_id", "ts", "event_id", "value", 24L * 3600 * 1000)
    val r4Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qr4().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] r4 x$factor min=${r4Times.min}%.3f " +
      s"all=${r4Times.map(t => f"$t%.3f").mkString(",")}")
    // h2 (render→extract→boilerplate) over N×-replicated docs: the
    // whole HTML chain is a scan-stage projection, so time must
    // track the t13 shapes underneath it — no markup-size term
    // beyond the linear scan.
    val qh2 = () => {
      val ext = big.select(col("doc_id"), col("source"),
        operators.HtmlOps.htmlToText(
          operators.HtmlOps.renderHtml).as("text"))
      operators.TextOps.boilerplate(ext, "doc_id", "source", "text",
        relDf = 0.003, flagRatio = 0.2)
    }
    val h2Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qh2().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] h2 x$factor min=${h2Times.min}%.3f " +
      s"all=${h2Times.map(t => f"$t%.3f").mkString(",")}")
    // n6y (batch seeded LSH) over N×-replicated embeddings with
    // offset vec_ids: candidate generation is an equi-join on the
    // tagged bucket key — time must track N·(candidates/query), with
    // no all-pairs term (replicas share buckets, so candidate counts
    // grow linearly with N too: the probe-key set is fixed).
    val emb = Tables.embeddings(spark, sfDir)
    val bigEmb = (0 until factor)
      .map(k => emb.withColumn("vec_id",
        col("vec_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
    val qn6y = () => operators.SimilarityOps.seededLshTopKBatch(
      bigEmb, queryMod = 73 * factor, k = 5)
    val n6yTimes = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qn6y().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n6y x$factor min=${n6yTimes.min}%.3f " +
      s"all=${n6yTimes.map(t => f"$t%.3f").mkString(",")}")
    // c16 (bloom decontamination) over the N×-replicated corpus with
    // offset doc_ids: the bench side stays FIXED (replica 0's %11
    // slice), the corpus side grows N× — the asymmetric-decontam
    // shape. Time must track the corpus scan + the (fixed-rate)
    // candidate join, with the bloom prune keeping the join input
    // proportional to true matches, not corpus size.
    val qc16 = () => {
      val hx = operators.DedupOps.hashedShingles(
        big.select(col("doc_id"), col("text")), "doc_id", "text")
      operators.DedupOps.crossCorpusOverlapBloomHashed(spark,
        hx.filter(col("doc_id") % 11 === 0 &&
            col("doc_id") < 10000000L)
          .select(col("doc_id").as("bench_id"), col("x")),
        hx.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id").as("corpus_id"), col("x")),
        minShared = 3, maxDf = SparkEntry.ShingleMaxDf * factor)
    }
    val c16Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qc16().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] c16 x$factor min=${c16Times.min}%.3f " +
      s"all=${c16Times.map(t => f"$t%.3f").mkString(",")}")
    // c3 (banded-LSH decontamination) over the same asymmetric shape:
    // fixed bench side (replica 0's %7 slice), N×-grown corpus side.
    // Time must track the corpus-side signature pass; the probe also
    // PRINTS the banded candidate-pair count (the (band, sig)
    // equi-join's distinct output — the quantity round-12 verdict
    // item 8 asks to see grow ~linearly with the df-cap engaged):
    // replicas occupy disjoint shingle spaces, so cross-corpus
    // collisions stay those of the 1× problem and candidates scale
    // with true near-dups, never with |bench|·|corpus|.
    val qc3parts = () => {
      val hx = operators.DedupOps.hashedShingles(
        bigDisjoint.select(col("doc_id"), col("text")),
        "doc_id", "text").cache()
      val sa = hx.filter(col("doc_id") % 7 === 0 &&
          col("doc_id") < 10000000L)
        .select(col("doc_id").as("bench_id"), col("x"))
      val sb = hx.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("corpus_id"), col("x"))
      (sa, sb)
    }
    val c3Times = (1 to reps).map { _ =>
      val (sa, sb) = qc3parts()
      val t0 = System.nanoTime()
      operators.DedupOps.crossCorpusOverlapBandedHashed(sa, sb,
          minShared = 3, maxDf = SparkEntry.ShingleMaxDf * factor)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] c3 x$factor min=${c3Times.min}%.3f " +
      s"all=${c3Times.map(t => f"$t%.3f").mkString(",")}")
    val (c3sa, c3sb) = qc3parts()
    val c3Cand = operators.DedupOps.bandRelation(
        operators.DedupOps.minhashSignatures(c3sa, "bench_id"),
        "bench_id")
      .join(operators.DedupOps.bandRelation(
        operators.DedupOps.minhashSignatures(
          operators.DedupOps.capShingleDf(c3sb,
            SparkEntry.ShingleMaxDf * factor), "corpus_id"),
        "corpus_id"), Seq("band", "sig"))
      .select("bench_id", "corpus_id").distinct().count()
    println(s"[scale] c3-candidates x$factor n=$c3Cand")
    // n3 vs n33 (exact Jaccard: all-shared-shingle vs prefix-filtered
    // candidates) over the disjoint-shingle replicas — N independent
    // copies of the 1× dedup problem, so BOTH must scale linearly;
    // the probe measures whether the prefix prune's win is a stable
    // constant factor (it removes the bulk of each copy's candidate
    // mass) and prints the candidate-volume gap itself.
    val qn3 = () => operators.DedupOps.jaccardPairs(bigDisjoint,
      "doc_id", "text", minJaccard = 0.8,
      maxDf = SparkEntry.ShingleMaxDf)
    val n3Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qn3().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n3 x$factor min=${n3Times.min}%.3f " +
      s"all=${n3Times.map(t => f"$t%.3f").mkString(",")}")
    val qn33 = () => operators.DedupOps.prefixFilteredJaccardPairs(
      bigDisjoint, "doc_id", "text", tNum = 4, tDen = 5,
      maxDf = SparkEntry.ShingleMaxDf)
    val n33Times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qn33().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n33 x$factor min=${n33Times.min}%.3f " +
      s"all=${n33Times.map(t => f"$t%.3f").mkString(",")}")
    val shCand = operators.DedupOps.capShingleDf(
      operators.DedupOps.hashedShingles(bigDisjoint, "doc_id", "text"),
      SparkEntry.ShingleMaxDf)
    val allCand = shCand.select(col("doc_id").as("id_a"), col("x"))
      .join(shCand.select(col("doc_id").as("id_b"), col("x")), Seq("x"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().count()
    val prefCand = operators.DedupOps
      .prefixCandidates(shCand, "doc_id", 4, 5).count()
    println(s"[scale] n33 candidates x$factor " +
      s"prefix=$prefCand all_shared=$allCand")
    // n34b (bounded kNN-graph build) over id-offset embedding
    // replicas: the codebook is every 50th id of the UNION, so the
    // centroid count grows with N and cell populations stay ~constant
    // — per-src candidate work is flat and total time must track N
    // linearly (the structural claim that replaced n34's quadratic
    // crossJoin). The exact build would be N² here.
    // Each replica's vectors are ROTATED by k dims (a permutation =
    // isometry: per-replica geometry intact, cross-replica cosines
    // scrambled) — plain duplication would tie every copy to the same
    // base cells (6-dp-equal centroid scores break on centroid id)
    // and measure the f² pile-up instead of the linear build.
    val embG = Tables.embeddings(spark, sfDir)
    val bigEmbG = (0 until factor)
      .map(k => embG
        .withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
        .withColumn("embedding", expr(
          s"concat(slice(embedding, ${k % 64 + 1}, ${64 - k % 64}), " +
            s"slice(embedding, 1, ${k % 64}))")))
      .reduce(_ unionByName _)
      .localCheckpoint()
    val qn34b = () => operators.SimilarityOps.knnGraphBounded(
      bigEmbG, k = 8, stride = 50, nProbe = 2, nndRounds = 2)
    val n34bTimes = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      qn34b().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scale] n34b x$factor min=${n34bTimes.min}%.3f " +
      s"all=${n34bTimes.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
