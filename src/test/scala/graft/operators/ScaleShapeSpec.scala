package graft.operators

import graft.SparkSpec

/** Scale-shape regression tests: the join suite must not DEPEND on
  * broadcasting the linearly-scaling tables. With the broadcast
  * threshold forced to −1 (simulating sides too big to broadcast at
  * 100 TB), every query must still run — degraded to shuffled joins —
  * and return identical results. Only the explicitly-hinted
  * constant-size dims (nation 25 rows, region 5 rows) may broadcast.
  */
class ScaleShapeSpec extends SparkSpec {

  private def noBroadcastSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }

  /** Doubles rounded to 4 dp before compare — a different join order
    * changes float summation order (last-ulp diffs), same as the
    * oracle harness's canonicalization.
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.{col, round}
    import org.apache.spark.sql.types.DoubleType
    val cols = df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), 4).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*).collect().map(_.toString).toSeq
  }

  test("q3/q5/q10 return identical results with broadcasts disabled") {
    val s2 = noBroadcastSession()
    val queries = Seq("q3_top_revenue_orders", "q5_region_revenue",
      "q10_returned_revenue", "q18_large_orders", "k5_dedup_append",
      "q13_order_distribution", "q21_waiting_suppliers",
      "q2_min_cost_supplier", "q8_market_share", "q9_nation_profit",
      "q16_supplier_diversity", "f5_ship_latency", "t11_lm_score",
      "t12_bigram_lm", "e4_kmv_distinct", "n14_pq_topk",
      "k14_pruned_scan", "k16_zorder_scan", "n15_ivfpq_batch",
      "c4_mixture_sample", "c5_sequence_pack", "c6_global_pack",
      "t13_boilerplate", "t14_gopher_gate", "t15_pair_counts",
      "n16_centroid_outliers", "n17_source_overlap", "c7_split_assign",
      "st5_stream_pack", "n18_semantic_dedup", "t16_classifier_gate",
      "n19_hashed_embed", "k18_signature_store", "t17_dsir_weights",
      "l8_fts_batch", "n20_trained_ivf", "m4_asset_dedup",
      "k19_restore", "c9_curriculum_pack", "t18_quantile_gate",
      "e5_kmv_union", "l9_hybrid_rrf", "r2_range_join",
      "t19_bpe_loop", "n21_stored_ivfpq", "n22_index_append",
      "k20_mor_upsert", "k21_mor_delete", "e6_quantile_sketch",
      "c10_weighted_sample",
      "t20_bpe_encode", "c11_chunk_split", "l10_phrase_search",
      "e7_heavy_hitters", "n23_hard_negatives",
      "r3_asof_join", "n24_keep_best", "k23_cdc_rollup",
      "t21_ngram_diversity", "t22_blocklist_gate",
      "w5_sessionize", "c12_pipeline_e2e", "st7_stream_asof",
      "n25_substring_pairs", "m5_mm_pack", "l11_rerank",
      "e8_kmv_intersect", "a11_funnel", "e9_hll_exact",
      "n26_index_delete", "w6_cohort_retention", "c13_epoch_shuffle",
      "c14_split_pack", "w7_gapfill", "n27_contained_docs",
      "k24_delete_where", "c15_target_mixture", "l12_snippets",
      "n28_ivf_recall", "st8_stream_hll", "t23_langid_eval",
      "e10_cms_exact", "t24_bpe_apply", "x1_xml_extract",
      "r4_salted_window", "t25_bpe_tokens", "n29_quantized_topk",
      "n30_simhash_pairs", "u1_url_canonical", "n31_fuzzy_match",
      "d2_dataset_card", "d3_card_merge", "t26_threshold_sweep",
      "h1_html_extract", "h2_html_boilerplate", "n6x_lsh_seeded_topk",
      "h3_link_harvest", "n6y_lsh_batch_topk", "t27_pii_scrub",
      "n6z_lsh_recall", "h4_web_pipeline",
      "c16_bloom_decontaminate", "h5_frontier", "st9_stream_dedup",
      "c18_leakage_audit", "c19_domain_cap", "l13_query_expansion",
      "l14_spell_search", "l15_bm25f", "t28_zipf_slope",
      "n33_prefix_jaccard", "d4_k_anonymity", "k25_scd2",
      "h6c_pagerank_converged", "n35_graph_ann",
      "n34b_knn_graph_bounded", "n34s_knn_sampled_recall",
      "n36_graph_ann_batch")
    queries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      assert(canon(fn(spark, sfSmoke)) == canon(fn(s2, sfSmoke)),
        s"$name diverged without broadcasts")
    }
  }

  test("t11 lmScore plans no global window (no single-partition funnel)") {
    // Round-8 verdict item 1: the corpus token total must fold in as a
    // 1-row aggregate broadcast, never a Window.partitionBy() over the
    // corpus-scaling per-doc relation (|docs| rows through ONE task).
    val df = graft.SparkEntry.queries("t11_lm_score")(spark, sfSmoke)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"t11 must not plan a window (global-window funnel):\n$plan")
    // The 1-row corpus-total agg may plan ONE SinglePartition exchange
    // (32 partial rows → 1); the corpus-scaling relations must not.
    val singles = plan.split("SinglePartition").length - 1
    assert(singles <= 1,
      s"t11 planned $singles single-partition exchanges:\n$plan")
  }

  test("pageRank/PPR plan fully partitioned rounds: zero " +
      "single-partition exchanges") {
    // The rank iteration must stay hash-partitioned end to end: one
    // co-located join + one map-side-combined aggregate + one node
    // join per round, top-k via TakeOrderedAndProject — never a
    // global window or a 1-partition funnel. (h8's max-rescales DO
    // fold through 1-row aggregates by design — h6/h7 have none.)
    Seq("h6_pagerank", "h7_seeded_rank").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfSmoke)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name must not plan a window:\n$plan")
      val singles = plan.split("SinglePartition").length - 1
      assert(singles == 0,
        s"$name planned $singles single-partition exchanges:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name top-k must be TakeOrderedAndProject:\n$plan")
    }
  }

  test("t28 zipf slope plans the rank filter through TopKPerKey") {
    // The top-100-per-source filter must hit the partial top-k
    // operator (map-side bounded heaps), not a full window sort of
    // the vocabulary.
    val df = graft.SparkEntry.queries("t28_zipf_slope")(spark, sfSmoke)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"t28 rank filter must plan as TopKPerKey:\n$plan")
  }

  test("d3 card merge plans NO base rescan: increment + stored card only") {
    // Round-8 verdict item 6: the merge must read the persisted base
    // card (bounded, |sources| rows), never re-scan the base corpus.
    val df = graft.SparkEntry.queries("d3_card_merge")(spark, sfSmoke)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.split("FileScan parquet").length - 1
    assert(scans == 2, s"expected increment + card scans, got $scans:\n$plan")
    assert(plan.contains("base_card"), "stored card missing from plan")
    // the one corpus scan is filtered to the increment slice
    assert(plan.contains("(doc_id#") && plan.contains("% 4) = 0"),
      s"increment filter missing:\n$plan")
  }

  test("q5 plan degrades to shuffled joins; only hinted dims broadcast") {
    val s2 = noBroadcastSession()
    val df = StarSchemaOps.regionRevenue(s2, sfSmoke)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = plan.split("BroadcastHashJoin").length - 1
    val shuffledJoins = (plan.split("SortMergeJoin").length - 1) +
      (plan.split("ShuffledHashJoin").length - 1)
    // nation + region carry explicit hints (constant-size); the three
    // fact-side joins must run shuffled when broadcasting is off
    assert(broadcasts <= 2,
      s"only hinted constant dims may broadcast, got $broadcasts:\n$plan")
    assert(shuffledJoins >= 3,
      s"fact joins must degrade to shuffled joins, got $shuffledJoins")
  }

  test("streaming widths DERIVE from observed state volume " +
      "(round-10 verdict item 4: no sf-tuned literals)") {
    import graft.streaming.StreamingOps.stateWidth
    // floor: tiny fixtures keep 4-way parallelism
    assert(stateWidth(1) == 4)
    assert(stateWidth(3000) == 4) // st6's docs-scale refresh volume
    // one 24Ki-row target reproduces every previously-tuned width:
    // st10 (views+purchases ≈ 40k) → 4, st9 (events+redeliveries
    // ≈ 110k) → 8, st8/st11 (events 100k) → 8
    assert(stateWidth(40025) == 4)
    assert(stateWidth(100000) == 8)
    assert(stateWidth(109500) == 8)
    // next power of two, monotone in volume, and scale-responsive:
    // 100× the stream → 100×/2^ceil width, not a saturated literal
    val ws = (1L to 64L).map(k => stateWidth(k * 25000))
    assert(ws == ws.sorted, s"width must be monotone: $ws")
    assert(ws.forall(w => Integer.bitCount(w) == 1),
      s"widths must be powers of two: $ws")
    assert(stateWidth(10000000L) == 512,
      "a 100x stream must widen, not saturate")
  }
}
