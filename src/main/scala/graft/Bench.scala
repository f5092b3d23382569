package graft

import org.apache.spark.sql.DataFrame

/** Benchmark harness (driver contract: print ONE JSON line).
  *
  * Methodology fixes from the round-1 verdict:
  *  - a full warm-up pass first, so session/codegen/classloading cost
  *    is not charged to the first query measured;
  *  - the timed action is a `noop`-format write, which executes the
  *    COMPLETE physical plan (a bare `count()` lets `EliminateSorts`
  *    drop every global sort under the aggregate, silently un-timing
  *    ordered queries);
  *  - min-of-3 per query, reps interleaved ROUND-ROBIN across the
  *    whole suite (rep r runs every query once): a transient GC or
  *    machine-load storm then costs each query at most one rep
  *    instead of sinking all reps of whichever query it straddled;
  *  - a query that throws during measurement is recorded as `null`
  *    in the JSON (+ a "failed" list) and excluded from the total —
  *    a broken query must not pass the 2× gate by timing its own
  *    failure (round-2 advice);
  *  - the DuckDB baseline total (tools/duckdb_baseline.py, recorded in
  *    BASELINE.md) is echoed alongside, with the ratio, so the 2× gate
  *    is tracked instead of guessed.
  */
object Bench {

  /** DuckDB total at sf0.1 (tools/duckdb_baseline.py, 32 threads,
    * warm, min-of-3 runs) — the round-14 bake of all 218 oracle
    * queries (2026-08-16, the suite with n35/n36's hier-entry CTEs;
    * tools/duckdb_bake_r14.json): **45.1192 s** — the PER-QUERY MIN
    * across six same-day single-session bakes, a STRICTER discipline
    * than round-13's lowest-single-bake-total: the six totals ranged
    * 48.31–66.52 on a host that degraded mid-day, and recording any
    * single loaded total would have FLATTERED the Spark ratio by
    * inflating the denominator; the per-query min reconstructs the
    * quiet-window cost of every query (it lands within 1.6% of
    * round-13's 45.85 for a suite whose only SQL change was the
    * entry CTEs — n35 −0.06, n36 +0.12, n34s −0.12 at per-query
    * min, confirming the suite's true cost is unchanged). Valid
    * ONLY for the oracle suite it was measured against:
    * [[RecordedDuckdbQueries]] AND [[RecordedDuckdbSuiteHash]]
    * fingerprint the suite (count + sorted-name hash), and the
    * default is dropped on any mismatch, so a stale baked-in
    * baseline can never silently shape the reported ratio. Ledger:
    * BASELINE.md round-14.
    */
  val RecordedDuckdbSf01: Double = 45.1192
  val RecordedDuckdbQueries: Int = 218

  /** Composition fingerprint of the oracle suite the baseline was
    * baked against — a count alone is too weak (round 13 swapped
    * n34/n34r/n6 for n34s/e3 and the count landed back on 218 by
    * coincidence; the count check alone would have silently kept a
    * stale denominator). Java's String.hashCode is deterministic
    * across JVMs, so the constant is stable.
    */
  val RecordedDuckdbSuiteHash: Int = -1428847673

  def suiteHash(names: Iterable[String]): Int =
    names.toSeq.sorted.mkString(",").hashCode

  /** SYMMETRIC-accounting correction (round-11 verdict item 3): the
    * Spark side SERVES ~12 queries from prepared artifacts (FTS
    * postings, dup pair/cluster fixture, trained BPE merges) whose
    * build cost sits in warm-up, while the recompute baseline above
    * charges DuckDB the full rebuild for the same queries. ServedBake
    * + tools/duckdb_bake_served.py time DuckDB twins that READ the
    * same artifacts (result-identical to the recompute oracles —
    * validated cell-for-cell); this is Σ(recompute − served) over
    * those queries, and `symmetric_ratio` divides by the baseline
    * with the correction applied — duck served where Spark serves.
    * 15 twins (the 12 round-11 serving conversions + the graph
    * walks n35/n36, whose Spark side reads a prepared navigation
    * graph, + n34s since round 14 — its Spark side certifies the
    * prepared k=8 graph artifact, so duck reads the same exported
    * graph; the sampled exact side recomputes on BOTH engines).
    * Round-14 bake 2026-08-16, per-query min of both forms across
    * three same-day bakes (the main-baseline discipline): recompute
    * 13.511, served 3.476 (tools/duckdb_bake_served_r14.json).
    * Ledger: BASELINE.md round-14.
    */
  val RecordedServedDeltaSf01: Double = 10.0343

  /** Twin set the served delta above was baked against. The
    * symmetric pair is emitted only when BOTH (a) the baseline in
    * use is the fingerprint-guarded recorded default (an external
    * SPARK_GRAFT_DUCKDB_TOTAL_SEC for a different sf/suite must not
    * be corrected by an sf0.1 delta — it could even go negative) and
    * (b) the current [[ServedTwins.Names]] still equals this list —
    * so a twin added/removed after the bake drops the stale delta
    * instead of silently mis-correcting.
    */
  val RecordedServedTwins: Seq[String] = Seq(
    "l2_fts_search", "l6_fts_ranked", "l7_fts_bm25", "l15_bm25f",
    "l13_query_expansion", "l14_spell_search",
    "n9_dup_clusters", "n11_cluster_sizes", "n24_keep_best",
    "c18_leakage_audit", "t24_bpe_apply", "t25_bpe_tokens",
    "n35_graph_ann", "n36_graph_ann_batch",
    "n34s_knn_sampled_recall")

  /** Quiet-host calibration floor (seconds for the fixed-work probe):
    * the builder's historic quiet reads 0.029–0.031 across rounds 6–9
    * and the round-9 driver measured 0.0308.
    */
  val QuietCalib: Double = 0.030

  /** Host slowdown factor from the calib probe — PIECEWISE LINEAR
    * through the observed (calib/quiet → measured per-query
    * inflation) pairs in BASELINE.md's calib-vs-ratio table:
    * (1.0, 1.0) by definition; (1.93, 1.15) — the round-10 driver
    * box, calib 0.0594, per-query median inflation 1.15× on
    * unchanged plans; (3.88, 2.25) — the round-10 session-2 box,
    * calib 0.1195, paired-query factor ≈2.25×. The probe
    * over-responds to load relative to full queries (it is pure
    * CPU+scheduler), hence the sub-linear mapping. Extrapolation
    * past the last anchor keeps its slope; a quieter-than-quiet host
    * clamps to 1.
    */
  def hostFactor(calib: Double): Double = {
    val cr = calib / QuietCalib
    val anchors = Seq((1.0, 1.0), (1.93, 1.15), (3.88, 2.25))
    if (cr <= 1.0) 1.0
    else {
      val segs = anchors.zip(anchors.tail)
      segs.collectFirst {
        case ((x0, y0), (x1, y1)) if cr <= x1 =>
          y0 + (y1 - y0) * (cr - x0) / (x1 - x0)
      }.getOrElse {
        val ((x0, y0), (x1, y1)) = segs.last
        y1 + (y1 - y0) * (cr - x1) / (x1 - x0)
      }
    }
  }

  /** Executes the full plan, sorts included, discarding rows. */
  private def runPlan(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def calibProbe(spark: org.apache.spark.sql.SparkSession)
      : Double = {
    val c0 = System.nanoTime()
    runPlan(spark.range(4000000L).selectExpr("sum(id) as s"))
    (System.nanoTime() - c0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.envCores)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

    // QUIET-WINDOW GATE (round-11 verdict item 1): the raw ratio has
    // been breached twice on host noise alone (calib 0.059→0.075 while
    // every plan audit came back clean), so the suite now WAITS for a
    // quiet window instead of timing into a noisy one. The fixed-work
    // probe runs first (after 3 warm shots so codegen/JIT is not
    // measured); while its min-of-2 exceeds the gate (default 0.055 ≈
    // 1.8× the 0.030 quiet floor), sleep 30 s and re-probe, up to a
    // bounded budget. Every attempt is recorded in the JSON so a run
    // that had to settle for a loaded window says so on its face.
    val gate = sys.env.getOrElse("SPARK_GRAFT_CALIB_GATE", "0.055").toDouble
    val maxWaitSec =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_MAX_WAIT_SEC", "600").toInt
    (1 to 3).foreach(_ => calibProbe(spark))
    val attempts = scala.collection.mutable.ArrayBuffer[Double]()
    var waited = 0
    var probe = math.min(calibProbe(spark), calibProbe(spark))
    attempts += probe
    // PLATEAU cutoff: on a VM whose probe floor sits ABOVE the gate
    // (this box reads 0.065+ all day while the historic quiet floor
    // is 0.030 — a noisy-neighbor effect no amount of waiting
    // undoes), waiting the full budget buys nothing and triples the
    // run. Stop early once ≥ 8 probes show no improving trend: the
    // recent 4-probe window's best is no better than 95% of the best
    // of the EARLIER attempts (comparing the window against the
    // global min is vacuous — the window is a subset of it, so the
    // predicate would fire after 8 probes unconditionally; round-12
    // advice). The attempts list still records the whole story.
    def plateaued: Boolean =
      attempts.size >= 8 &&
        attempts.takeRight(4).min > 0.95 * attempts.dropRight(4).min
    while (probe > gate && waited < maxWaitSec && !plateaued) {
      Thread.sleep(30000L); waited += 30
      probe = math.min(calibProbe(spark), calibProbe(spark))
      attempts += probe
    }

    // Warm-up: run everything once (codegen compile, parquet footer
    // cache, JIT). Failures surface during measurement, ignore here.
    SparkEntry.queries.foreach { case (_, fn) =>
      try runPlan(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    val names = SparkEntry.queries.keys.toSeq
    val times = scala.collection.mutable.Map[String, Double]()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // Fixed-work calibration probe per rep: totals on a loaded machine
    // run 1.5–2× a quiet one, so the probe's min is recorded alongside
    // to make run-to-run totals comparable (quiet ≈ 0.10–0.15 s).
    var calib = attempts.min
    (1 to reps).foreach { _ =>
      calib = math.min(calib, calibProbe(spark))
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          runPlan(fn(spark, sfDir))
          val dt = (System.nanoTime() - t0) / 1e9
          times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
        } catch { case _: Throwable => failed += name }
      }
    }
    // EXIT calibration (round-13 verdict item 2): the entry gate
    // bounds only the conditions the run STARTED under — round 13's
    // recorded close entered quiet and degraded mid-run (1.78 raw
    // recorded vs 1.57–1.59 on quiet closes, all plans unchanged).
    // Re-probe after measurement with the same min-of-2; the close is
    // marked `loaded` unless the measurement window itself (the
    // per-rep probes, which fold into `calib`, i.e. the best probe
    // seen across entry attempts AND rep starts) AND the exit probe
    // both sit under the gate — so a storm that arrives mid-run shows
    // on the artifact's face instead of reading as a code regression,
    // while a pre-run load that drained before rep 1 (first measured
    // close: entry attempts 0.056+, rep probes 0.0299, exit 0.0334)
    // does not falsely brand a quiet close.
    val exitCalib = math.min(calibProbe(spark), calibProbe(spark))
    val loaded = calib > gate || exitCalib > gate
    val qs = names.map { k =>
      if (failed(k) || !times.contains(k)) "\"" + k + "\":null"
      else "\"" + k + f"""\":${times(k)}%.4f"""
    }.mkString("{", ",", "}")
    val total = names.collect {
      case k if !failed(k) && times.contains(k) => times(k) }.sum
    // The DuckDB baseline covers the ORACLE-BACKED queries only (the
    // approximate tiers n6/e3 have no SQL twin), so the ratio compares
    // the same query set on both sides; `value` stays the full-suite
    // total.
    val oracleTotal = names.collect {
      case k if !failed(k) && times.contains(k) &&
        SparkEntry.oracleSql.contains(k) => times(k) }.sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // DuckDB oracle total on the same queries/data, measured by
    // tools/duckdb_baseline.py (see BASELINE.md "Measured baseline").
    // The baked-in default applies only when the oracle suite still
    // matches the fingerprint it was measured at; and when any query
    // failed, its time is missing from `total`, so dividing by the
    // full-suite baseline would flatter the ratio — report the
    // baseline but omit the ratio in that case.
    val envBaseline = sys.env.get("SPARK_GRAFT_DUCKDB_TOTAL_SEC").map(_.toDouble)
    val recordedBaselineApplies = sfDir.endsWith("sf0.1") &&
      SparkEntry.oracleSql.size == Bench.RecordedDuckdbQueries &&
      Bench.suiteHash(SparkEntry.oracleSql.keys) ==
        Bench.RecordedDuckdbSuiteHash
    val baseline = envBaseline
      .orElse(if (recordedBaselineApplies) Some(Bench.RecordedDuckdbSf01)
              else None)
    // The served-delta correction is valid only for the recorded
    // default baseline (same sf, same suite) AND only while the twin
    // set it was baked against is unchanged (round-12 advice: an env
    // baseline for another sf corrected by an sf0.1 delta can go
    // negative; a changed twin set makes the delta silently stale).
    val symDeltaApplies = envBaseline.isEmpty && recordedBaselineApplies &&
      ServedTwins.Names == Bench.RecordedServedTwins
    // Machine-readable host normalization (round-10 verdict item 1b):
    // a degraded-host run carries its own discount — `host_factor`
    // from the calib probe via the BASELINE.md calib-vs-ratio table,
    // and `host_normalized_ratio` = ratio / host_factor. The RAW
    // ratio stays the headline; the normalized one bounds what a
    // quiet host would measure.
    val hf = hostFactor(calib)
    // Full attempt trace goes in the LONG line only; the short line
    // keeps just gate + wait so its always-survives-a-tail size
    // guarantee holds (round-12 advice: ~21 attempts add hundreds of
    // bytes).
    val gateJson = f""","calib_gate":$gate,"calib_wait_sec":$waited,"calib_exit_sec":$exitCalib%.4f,"loaded":$loaded"""
    val attemptsJson = attempts.map(a => f"$a%.4f").mkString(
      s"""$gateJson,"calib_attempts":[""", ",", "]")
    val baseJson = baseline.map { b =>
      if (failed.isEmpty) {
        val symJson =
          if (symDeltaApplies) {
            val sym = b - RecordedServedDeltaSf01
            f""","duckdb_symmetric_baseline_sec":$sym%.4f,"symmetric_ratio":${oracleTotal / sym}%.2f"""
          } else ""
        f""","oracle_total_sec":$oracleTotal%.4f,"duckdb_baseline_sec":$b%.4f,"ratio":${oracleTotal / b}%.2f$symJson,"host_factor":$hf%.2f,"host_normalized_ratio":${oracleTotal / b / hf}%.2f"""
      } else f""","duckdb_baseline_sec":$b%.4f"""
    }.getOrElse("")
    println(
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir","calib_sec":$calib%.4f$attemptsJson$failedJson$baseJson}""")
    // Second, SHORT line with the headline numbers only: the full
    // per-query line above can exceed a log tail-capture window, which
    // truncates its head (where "value" lives) and leaves the driver
    // with nothing parseable. This line is ~120 bytes and always
    // survives a tail.
    println(
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","sf":"$sfDir","calib_sec":$calib%.4f$gateJson,"n_queries":${names.size - failed.size}$baseJson}""")
    spark.stop()
  }
}
