package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixtures, caches, and oracle-SQL constants for the query
  * registry families (split out of SparkEntry, round-10 verdict item
  * 7): process-scoped immutable-input caches (streaming landing
  * files, the served FTS index, the prepared page graph, versioned-
  * table templates), the warm streaming child sessions, and the
  * SQL fragments several oracle twins share. Everything here is
  * INPUT preparation or adjudication text — the operators under
  * measurement live in graft.operators.
  */
private[graft] object RegistryFixtures {

  /** Shingle document-frequency cap shared by n3/n4/c2 and their
    * oracle twins (see the comment at n3_ngram_jaccard). At production
    * scale this is set relative to corpus size.
    */
  val ShingleMaxDf = 100

  /** l8's serving batch: three queries with overlapping vocabulary so
    * the shared postings scan is pruned once by the term UNION.
    */
  val BatchFtsQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("batch", "dup"),
    2 -> Seq("window", "stream"),
    3 -> Seq("scan", "join", "hash"))

  /** h7's focused-crawl seed pages — interior category-tree nodes, so
    * the personalized walk has real descendants/ancestors to score.
    * Shared by the Spark query and the oracle twin (one constant, no
    * drift).
    */
  val SeedPages: Seq[String] = Seq("/d/1", "/d/2", "/d/3")

  /** The h6/h7/h8 page-graph edge relation, built in a TUNED child
    * session: a rank iteration runs ~3 exchanges per round over the
    * edge relation (|edges| ≈ 5·|docs| rows of two short strings —
    * far below the corpus rows the session default is sized for), so
    * the child sizes its shuffle width to the graph instead (the st9
    * state-store-sizing convention; at production graph scale this
    * knob goes UP, not down). Results are partitioning-independent —
    * the integer grid guarantees it, GraphSpec proves it.
    */
  /** AQE-off, narrow-shuffle child session for the SMALL-RELATION
    * report tier (a11/e4/e5/q10/w3 — the round-11 perf audit's
    * "2-wave floor" entries): their plans are 3–11 tiny exchanges
    * over relations thousands of times smaller than the session
    * default is sized for, and adaptive execution turns EVERY
    * exchange into its own job (driver re-plan + submit ≈ 50–70 ms —
    * the whole cost of these sub-second queries). The h6c/h8 lesson
    * generalized: size the session to the relation; at production
    * scale the knob flips back on. Results are
    * partitioning-independent (total orders + integer-grid
    * aggregates; ScaleShapeSpec re-checks under a degraded session).
    */
  private[graft] val smallSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      SparkSession]()

  private[graft] def smallSession(s: SparkSession): SparkSession =
    smallSessions.computeIfAbsent(s, _ => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss
    })

  private[graft] val pageGraphs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      GraphOps.PreparedGraph]()

  private[graft] def pageGraph(s: SparkSession, dir: String)
      : GraphOps.PreparedGraph =
    pageGraphs.computeIfAbsent((s, dir), _ => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      // AQE off for the rank iterations: adaptive execution turns
      // EVERY exchange into its own job (a driver re-plan + submit
      // round-trip ≈ 50 ms) — ~100 job boundaries for h6c's 32
      // rounds — while its payoffs (partition coalescing, skew
      // splits) are no-ops on a graph this side of the corpus. At
      // production graph scale the knob flips back on.
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = Tables.documents(ss, dir)
      val rendered = docs.select(col("doc_id"),
        graft.operators.HtmlOps.renderHtml.as("html"))
      // One extraction + one degree/node-set preparation,
      // checkpointed, shared by h6/h6c/h7/h8 — the at-rest analogue
      // is the edge TABLE the h4 pipeline lands (bucketed by src)
      // plus its degree metadata; every rank query re-derives
      // nothing but reads them. The oracles still rebuild edges
      // from `documents` inline — serving shape vs oracle
      // semantics, the l2-family convention.
      GraphOps.prepare(
        graft.operators.HtmlOps.pageEdges(rendered, "doc_id", "html"))
    })

  private[graft] val DatasetCardOracleSql: String =
    """SELECT source, count(*) AS n_docs,
      |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
      |  sum(length(text))::BIGINT AS n_chars,
      |  (sum(('0x' || substr(md5(text), 1, 15))::BIGINT
      |     % 1000000007) % 1000000007)::BIGINT AS content_seal,
      |  (sum(doc_id % 1000000007) % 1000000007)::BIGINT AS id_seal
      |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin

  private[graft] val SessionsOracleSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN ts - lag(ts) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id)
      |        > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, round(sum(value), 6) AS total_value
      |FROM numbered GROUP BY user_id, session_id
      |ORDER BY user_id ASC, session_start ASC""".stripMargin

  /** Fresh temp root per invocation, reclaimed at JVM exit (each
    * bench rep measures a full init+merge+read cycle without leaking
    * a table copy per rep — round-5 advice).
    */
  private[graft] def tempTableRoot(prefix: String): String =
    scratchDir(java.nio.file.Paths.get(
      sys.props("java.io.tmpdir")), prefix)

  private def scratchDir(base: java.nio.file.Path, prefix: String)
      : String = {
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del))
        f.delete(); ()
      }
      del(p.toFile)
    }))
    p.toString
  }

  /** Fresh CHECKPOINT root (offsets/commits/state-store deltas) for a
    * streaming run — on tmpfs (`/dev/shm`) when present, else the
    * regular tmpdir; `SPARK_GRAFT_CKPT_BASE` overrides either way
    * (the A/B lever StProfile measures the substrate with).
    *
    * Why this is a substrate choice and not a semantics change: the
    * AvailableNow floor decomposed to ext4-on-virtio fsyncs under
    * /tmp checkpoints (SCALE.md round-14 — HDFSBackedStateStore +
    * the offset/commit WAL fsync per micro-batch, ~0.55 s/run of
    * pure disk latency at fixture scale). On a cluster the
    * checkpoint lives on HDFS/object storage and the state store
    * keeps its working set on local disk/memory with async upload —
    * a local tmpfs is the closer analogue of that substrate than a
    * virtio-backed ext4 /tmp. Recovery-after-crash durability is a
    * deployment property of the checkpoint VOLUME either way; query
    * semantics, micro-batch boundaries, and every oracle hash are
    * identical (StreamingSpec + the st-family gates run on both).
    */
  /** One process-scoped scratch BASE per resolved substrate path,
    * with a single shutdown hook each; ckptRoot hands out plain
    * subdirectories under it. Before round 16 every invocation
    * created its own temp dir PLUS its own hook thread — a bench run
    * (reps × closes × retries) or a long sweep accumulated
    * state-store deltas in tmpfs RAM and hook threads until process
    * exit (round-15 advice).
    */
  private val ckptBases =
    new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path,
      java.nio.file.Path]()

  /** Last-issued checkpoint dir per prefix: reclaimed eagerly when
    * the NEXT dir for the same prefix is issued. Safe because every
    * streaming op in this repo runs its query to completion
    * (`awaitTermination`) inside the registry closure, prefixes are
    * unique per query, and closures for one query run serially in
    * Bench/Verify/sbt-test — by the time a prefix repeats, its
    * previous checkpoint is dead state from a finished run.
    */
  private val lastCkpt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  private[graft] def ckptRoot(prefix: String): String = {
    // system property first (runtime-flippable — the interleaved
    // substrate A/B in CkptSubstrateProbe needs per-rep switching
    // inside one JVM), env second, tmpfs default.
    val substrate = sys.props.get("graft.ckpt.base")
      .orElse(sys.env.get("SPARK_GRAFT_CKPT_BASE"))
      .map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) Some(shm)
        else None
      }
      .getOrElse(java.nio.file.Paths.get(sys.props("java.io.tmpdir")))
    val base = ckptBases.computeIfAbsent(substrate,
      p => java.nio.file.Paths.get(scratchDir(p, "graft_ckpt_base")))
    val fresh =
      java.nio.file.Files.createTempDirectory(base, prefix).toString
    Option(lastCkpt.put(prefix, fresh))
      .foreach(old => deleteRec(new java.io.File(old)))
    fresh
  }

  /** Process-scoped cache for IMMUTABLE streaming INPUT fixtures —
    * the micro-batch landing files st6–st8 replay, and st6's v0
    * table TEMPLATE. These are input data, not operator state: every
    * invocation still executes the full streaming query against a
    * FRESH checkpoint/output/table root, so results are identical —
    * what stops repeating is only the per-rep fixture-write IO,
    * which is not the operator under measurement (round-7 verdict:
    * the st-tier fixture cost must not scale with family size).
    */
  private[graft] val streamInputs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String,
      String), String]()

  private[graft] def cachedStreamInput(s: SparkSession, dir: String,
      tag: String)(build: String => Unit): String =
    streamInputs.computeIfAbsent((s, dir, tag), _ => {
      val root = tempTableRoot(s"graft_${tag}_in")
      build(root)
      root
    })

  /** WARM streaming child sessions, cached per (parent, width):
    * session-state construction (analyzer/catalog wiring, first-use
    * conf plumbing) is paid once per width instead of once per query
    * run (round-10 verdict item 2). Confs: the width derived from
    * the stream's observed state volume ([[graft.streaming
    * .StreamingOps.stateWidth]] — no literal tuned to one scale
    * factor, round-10 verdict item 4), and no-data finalization
    * micro-batches off (every st-family sink either emits eagerly —
    * dedup, inner interval join — or is a foreachBatch merge; the
    * watermark-advance batch buys no output).
    */
  private[graft] val stChildren =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int,
      Boolean), SparkSession]()

  private[graft] def stChild(s: SparkSession, width: Int,
      aqe: Boolean = true): SparkSession =
    stChildren.computeIfAbsent((s, width, aqe), _ => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", width.toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")
      if (!aqe) ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss
    })

  /** Parquet-footer row count per (dir, table) — a metadata-only
    * aggregate, cached per process; the input-row BOUND the
    * report-tier width derivation reads (round-14 verdict item 2:
    * derive width per family from input bounds, no literals tuned to
    * one scale factor).
    */
  private val tableRowCounts =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.lang.Long]()

  private[graft] def tableRows(s: SparkSession, dir: String,
      table: String): Long =
    tableRowCounts.computeIfAbsent((dir, table), _ =>
      s.read.parquet(s"$dir/$table.parquet").count()).longValue()

  /** REPORT-TIER child session: for a query whose largest exchange is
    * bounded by its input tables' row counts (the ~150-query
    * report/floor tier — grouped aggregates with few groups, window
    * funcs over small tables, top-k), the corpus-default 32 reduce
    * tasks per kilobyte exchange are pure scheduling overhead on a
    * 17 MB local corpus. The width DERIVES from the observed input
    * bound through the SAME stateWidth rule streaming state and the
    * graph walks are sized by: documents(5k)→4, events(100k)→8,
    * lineitem(600k)→32 — i.e. corpus-heavy queries derive the full
    * width and the wrap is a no-op for them, at ANY scale factor.
    * On a real cluster the same derivation sizes reducer counts from
    * table statistics. Returns the parent unchanged when the derived
    * width is not narrower.
    *
    * AQE is OFF in the narrow child (the measured bigger half of the
    * win — WidthSweepProbe round 15: w4na/w8na beat w4/w8 on 20/24
    * floor queries, −20…−50% vs main): on a bounded-input query
    * AQE's runtime re-planning has nothing left to decide — the
    * static planner already broadcasts every dim at this size and
    * the narrow width already fixes the reduce count — while its
    * stage-by-stage execution pays one extra driver job barrier per
    * exchange, which at 0.1 s scale IS the query. At corpus scale
    * the derivation hands back the parent session, where AQE stays
    * on (skew splitting and runtime join planning matter exactly
    * there). Correctness is untouched either way — width and AQE
    * are physical-only; every registry query ends in a total-order
    * sort and the oracle hash gate replays both arms.
    */
  private[graft] def reportChild(s: SparkSession, dir: String,
      tables: String*): SparkSession = {
    val bound = tables.map(t => tableRows(s, dir, t)).max
    val w = graft.streaming.StreamingOps.stateWidth(bound)
    if (w >= s.sparkContext.defaultParallelism) s
    else stChild(s, w, aqe = false)
  }

  /** Fixture metadata: the observed input-row volume, written once at
    * fixture-build time (a parquet-footer count) and read back as the
    * [[graft.streaming.StreamingOps.stateWidth]] input — the
    * derivation the literal widths used to bake.
    */
  private[graft] def writeRowMeta(s: SparkSession, root: String,
      inDirs: Seq[String]): Unit = {
    val rows = inDirs.map(d => s.read.parquet(d).count()).sum
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "state_rows"), rows.toString)
    ()
  }

  private[graft] def rowMeta(root: String): Long =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "state_rows")).trim.toLong

  /** Process-scoped cache for the SERVED full-text index
    * (round-10 verdict item 3): the ranked FTS family (l2/l6/l7/
    * l13/l14/l15) reads persisted bucketBy(token) tables — the
    * production serving shape — instead of re-tokenizing the corpus
    * inside every query. The build is the one-time indexing cost a
    * real deployment pays per corpus version; each query then
    * touches only its terms' buckets. Keyed by (session, dir): the
    * catalog tables live in the session's SharedState, so a fresh
    * session rebuilds.
    */
  private[graft] val ftsIndexes =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      operators.FtsOps.ServedFtsIndex]()

  private[graft] def servedFts(s: SparkSession, dir: String)
      : operators.FtsOps.ServedFtsIndex =
    ftsIndexes.computeIfAbsent((s, dir), _ => {
      val root = tempTableRoot("graft_fts_served")
      operators.FtsOps.buildServedIndex(s, Tables.documents(s, dir),
        "doc_id", "text",
        tag = f"${dir.hashCode & 0x7fffffff}%x", root = root)
    })

  /** Near-dup PAIRS and CLUSTERS prepared once per (session, dir) —
    * the dedup pipeline's persisted artifacts: production runs the
    * MinHash-LSH pass once per corpus version and every report /
    * policy query (n9 clusters, n11 histogram, n24 canonical
    * selection, c18 leakage audit) reads the stored pair list and
    * cluster assignment. n4 (the pair pipeline itself) stays inline —
    * it IS the measured operator. Oracles recompute from `documents`
    * (the l2-family serving-vs-oracle convention).
    */
  private[graft] val dupClusterCaches =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (DataFrame, DataFrame)]()

  private[graft] def dupPairsClusters(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    dupClusterCaches.computeIfAbsent((s, dir), _ => {
      val pairs = operators.DedupOps
        .minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          minJaccard = 0.8, maxDf = ShingleMaxDf)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val clusters = operators.DedupOps.dupClusters(pairs)
        .localCheckpoint()
      (pairs, clusters)
    })

  /** The LEARNED BPE merge table, once per (session, dir, ranks) —
    * the trained-tokenizer artifact: production trains once and
    * every encode pass loads the merge list (vocab-scale metadata).
    * t19/t20 still run the induction loop inline — the loop is what
    * THEY measure; t24/t25 are the apply-at-scale tier and read the
    * trained table.
    */
  private[graft] val bpeMergeCaches =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), Seq[(String, String)]]()

  private[graft] def learnedBpeMerges(s: SparkSession, dir: String,
      ranks: Int): Seq[(String, String)] =
    bpeMergeCaches.computeIfAbsent((s, dir, ranks), _ =>
      operators.TextOps.learnedMerges(Tables.documents(s, dir),
        "text", ranks))

  /** The k-NN NEIGHBOR GRAPH, once per (session, dir) — the offline
    * artifact the graph-ANN serving query (n35) walks; n34 (the
    * build op itself) stays inline. At rest this is a table bucketed
    * by src; the beam search reads ≤ beam neighbor lists per round.
    *
    * HONESTY NOTE (round-14 verdict item 6): this fixture's BUILD is
    * the exact all-pairs `nswGraph` — FIXTURE-SCALE ONLY, kept
    * because n35's oracle pins exact-NSW semantics. It is never a
    * bench-measured path (build cost sits in warm-up and is charged
    * back through the served-twin symmetric accounting); what scales
    * is n35's serving WALK. The production pairing — bounded build +
    * batched walk — is n34b → [[boundedNswFixture]] → n36.
    */
  private[graft] val annGraphCaches =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private[graft] def annGraphFixture(s: SparkSession, dir: String)
      : DataFrame =
    annGraphCaches.computeIfAbsent((s, dir), _ =>
      operators.SimilarityOps
        .nswGraph(Tables.embeddings(s, dir), k = 24)
        .localCheckpoint())

  /** The BOUNDED NSW navigation graph, once per (session, dir) —
    * the end-to-end PRODUCTION pairing: the artifact is built by the
    * bounded path (n34b's IVF-candidate + NN-Descent build at k=24,
    * symmetrized — no all-pairs anywhere in its lineage) and served
    * by the batched walk (n36). The exact-graph fixture above stays
    * for n35 (its oracle pins the exact-NSW semantics).
    */
  private[graft] val boundedNswCaches =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private[graft] def boundedNswFixture(s: SparkSession, dir: String)
      : DataFrame =
    boundedNswCaches.computeIfAbsent((s, dir), _ => {
      val g = operators.SimilarityOps
        .knnGraphBounded(Tables.embeddings(s, dir), k = 24,
          stride = 50, nProbe = 2, nndRounds = 2)
        .select(col("src"), col("dst"))
      g.unionByName(g.select(col("dst").as("src"),
          col("src").as("dst")))
        .distinct().localCheckpoint()
    })

  /** The k=8 BOUNDED kNN graph (n34b's exact build parameters), once
    * per (session, dir) — the index ARTIFACT the sampled recall gate
    * (n34s) certifies: a production recall monitor evaluates the
    * prepared graph serving walks, it does not rebuild the index per
    * evaluation (round-13 verdict item 7). n34b itself stays inline —
    * the build is what IT measures.
    */
  private[graft] val boundedKnnGraphCaches =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private[graft] def boundedKnnGraphFixture(s: SparkSession,
      dir: String): DataFrame =
    boundedKnnGraphCaches.computeIfAbsent((s, dir), _ =>
      operators.SimilarityOps
        .knnGraphBounded(Tables.embeddings(s, dir), k = 8,
          stride = 50, nProbe = 2, nndRounds = 2)
        .localCheckpoint())

  /** The BASE bounded kNN graph (vec_id % 4 != 3, IVF-candidate
    * build, raw scores), once per (session, dir) — the existing
    * index artifact n37's incremental append maintains. Its codebook
    * (the base's strided seeds) is what the append keeps frozen.
    */
  private[graft] val baseKnnGraphCaches =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private[graft] def baseKnnGraphFixture(s: SparkSession, dir: String)
      : DataFrame =
    baseKnnGraphCaches.computeIfAbsent((s, dir), _ => {
      val base = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 4 =!= 3)
      operators.SimilarityOps.knnGraphBoundedRaw(base,
          operators.SimilarityOps.ivfCodebook(base, stride = 50),
          k = 8, nProbe = 2)
        .localCheckpoint()
    })

  /** Lay each batch down as one parquet file under `root/in` — the
    * landing-directory shape a file-source stream tails.
    */
  private[graft] def writeInputBatches(batches: Seq[DataFrame],
      root: String): String = {
    val in = new java.io.File(root + "/in")
    in.mkdirs()
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = s"$root/b$i"
      b.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, s"batch_$i.parquet").toPath)
      ()
    }
    in.toString
  }

  /** Recursive HARD-LINK hydration of a fresh mutable table root from
    * a cached immutable template — metadata-only IO instead of byte
    * copies. Safe because parquet data files are never modified in
    * place by any path here: appends and merges write NEW files,
    * overwrites delete-then-write (deletion just unlinks the link,
    * the template's inode survives). Falls back to a byte copy where
    * linking is unsupported (cross-device).
    */
  private[graft] def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val s0 = Paths.get(src); val d0 = Paths.get(dst)
    Files.createDirectories(d0)
    val st = Files.walk(s0)
    try st.forEach { p: Path =>
      val d = d0.resolve(s0.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(d)
      else
        try Files.createLink(d, p)
        catch { case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException =>
          Files.copy(p, d)
        }
      ()
    } finally st.close()
  }

  /** Process-scoped fixture cache for the READ-path versioned queries
    * (k11 time travel, k12 pruned-merge read): reading a committed
    * table is the steady-state operation, so those queries measure
    * the read, not a fresh init+merge per rep. k10 stays UNCACHED —
    * it is the write-path query and pays the full MERGE cycle (CoW
    * planning included) every invocation.
    */
  private[graft] val versionedFixtures =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String,
      String), String]()

  private[graft] def buildMergedDocs(s: SparkSession, dir: String): String =
    buildMergedDocsAt(s, dir, tempTableRoot("graft_versioned") + "/docs")

  /** A fresh mutable copy of the v0 docs table (init slice only) —
    * the write-path queries' common fixture (k10/k20/k21/k22, round
    * 13): the init parquet write is deterministic INPUT state, built
    * once as an immutable template and hardlink-copied per run, so
    * the timed work is the MERGE/MoR/evolution COMMIT the query
    * exists to measure, not the fixture's v0 write. `range6` lays v0
    * out as 6 range-partitioned files (the file-granular CoW shape);
    * plain keeps init's natural layout.
    */
  private[graft] def copiedDocsV0(s: SparkSession, dir: String,
      range6: Boolean): String = {
    val tag = if (range6) "versk_r6" else "versk_plain"
    val fix = cachedStreamInput(s, dir, tag) { root =>
      val docs = Tables.documents(s, dir)
        .select("doc_id", "source", "n_chars")
        .filter(col("doc_id") % 3 =!= 0)
      Versioned.init(
        if (range6) docs.repartitionByRange(6, col("doc_id")) else docs,
        root + "/tmpl")
      ()
    }
    val run = tempTableRoot(s"graft_${tag}_run") + "/docs"
    copyDir(fix + "/tmpl", run)
    run
  }

  private[graft] def buildMergedDocsAt(s: SparkSession, dir: String,
      root: String): String = {
    val docs = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
    Versioned.init(docs.filter(col("doc_id") % 3 =!= 0), root)
    Versioned.mergeUpsert(
      docs.filter(col("doc_id") % 2 === 0)
        .withColumn("n_chars", col("n_chars") + lit(1000L)),
      root, Seq("doc_id"))
    root
  }

  private[graft] def mergedDocsTableCached(s: SparkSession, dir: String)(
      read: String => DataFrame): DataFrame =
    read(versionedFixtures.computeIfAbsent((s, dir, "merged"),
      _ => buildMergedDocs(s, dir)))

  /** k12 fixture: the FILE-GRANULAR merge path — v0 is laid out as
    * several range-partitioned files on the merge key, the source
    * touches only the low end of the key space, so the copy-on-write
    * planner rewrites the overlapping file(s) and carries the rest
    * into v1 by reference (VersionedSpec asserts the written-file
    * count; this query puts the OUTPUT through the oracle gate).
    */
  private[graft] def prunedMergeRoot(s: SparkSession, dir: String): String =
    versionedFixtures.computeIfAbsent((s, dir, "pruned"), _ => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "source", "n_chars")
      val r = tempTableRoot("graft_versioned_pruned") + "/docs"
      Versioned.init(
        docs.filter(col("doc_id") % 3 =!= 0)
          .repartitionByRange(6, col("doc_id")),
        r)
      Versioned.mergeUpsert(
        docs.filter(col("doc_id") % 2 === 0 && col("doc_id") <= 200)
          .withColumn("n_chars", col("n_chars") + lit(500L)),
        r, Seq("doc_id"))
      r
    })

  private[graft] def prunedMergeTable(s: SparkSession, dir: String): DataFrame =
    Versioned.current(s, prunedMergeRoot(s, dir))

  /** n21 fixture: the TRAINED IVF-PQ index persisted as Versioned
    * tables (n15's codebook convention: stride 50, 4 subspaces).
    * Cached: serving queries from a committed index is the steady
    * state — init is the offline training job (its write path is
    * exercised/timed by VectorIndexSpec and the k10/k18 tier).
    */
  private[graft] def vectorIndexRoot(s: SparkSession, dir: String): String =
    versionedFixtures.computeIfAbsent((s, dir, "vecindex"), _ => {
      val r = tempTableRoot("graft_vecindex") + "/index"
      VectorIndexOps.initVectorIndex(
        Tables.embeddings(s, dir), r, stride = 50, nSub = 4)
      r
    })

  /** n22 fixture: the index trained WITHOUT the late batch — the
    * offline training job whose output the incremental gate extends.
    */
  private[graft] def partialVectorIndexRoot(s: SparkSession, dir: String)
      : String =
    versionedFixtures.computeIfAbsent((s, dir, "vecindex_partial"), _ => {
      val r = tempTableRoot("graft_vecidx_inc") + "/index"
      VectorIndexOps.initVectorIndex(
        Tables.embeddings(s, dir).filter(
          !(col("vec_id") % 7 === 3 && col("vec_id") % 50 =!= 0)),
        r, stride = 50, nSub = 4)
      r
    })

  /** n26 fixture: the full trained index with the `vec_id % 31 = 1`
    * slice tombstoned out (MoR log deletes; codebooks frozen) — the
    * unindex path whose serve results the oracle recomputes by
    * exclusion.
    */
  private[graft] def deletedVectorIndexRoot(s: SparkSession, dir: String)
      : String =
    versionedFixtures.computeIfAbsent((s, dir, "vecindex_del"), _ => {
      val r = tempTableRoot("graft_vecidx_del") + "/index"
      val emb = Tables.embeddings(s, dir)
      VectorIndexOps.initVectorIndex(emb, r, stride = 50, nSub = 4)
      VectorIndexOps.deleteVectors(s,
        emb.filter(col("vec_id") % 31 === 1).select("vec_id"), r)
      r
    })

  /** k17 fixture: the merged-docs table SHALLOW-CLONED (metadata-only
    * manifest referencing the source's files), then diverged by a
    * MERGE into the clone only. The query reads both tables side by
    * side: the clone shows the divergence, the source must not.
    * Cached: reading a cloned table is the steady state.
    */
  private[graft] def cloneFixtureRoot(s: SparkSession, dir: String): String =
    versionedFixtures.computeIfAbsent((s, dir, "clone"), _ => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "source", "n_chars")
      val r = tempTableRoot("graft_versioned_clonefx")
      val src = r + "/src"
      Versioned.init(docs.filter(col("doc_id") % 3 =!= 0), src)
      Versioned.mergeUpsert(
        docs.filter(col("doc_id") % 2 === 0)
          .withColumn("n_chars", col("n_chars") + lit(1000L)),
        src, Seq("doc_id"))
      Versioned.shallowClone(s, src, r + "/clone")
      Versioned.mergeUpsert(
        docs.filter(col("doc_id") % 11 === 0)
          .withColumn("n_chars", col("n_chars") + lit(77L)),
        r + "/clone", Seq("doc_id"))
      r
    })

  /** k15 fixture: a merge chain that strands small files (each CoW
    * commit writes its upserts fresh), then OPTIMIZE packs the
    * debris. The second merge replaces whole rows — a key matching
    * both predicates ends at original+7, which the oracle's CASE
    * mirrors. Cached: reading a compacted table is the steady state.
    */
  private[graft] def compactedDocsRoot(s: SparkSession, dir: String): String =
    versionedFixtures.computeIfAbsent((s, dir, "compacted"), _ => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "source", "n_chars")
      val r = tempTableRoot("graft_versioned_compact") + "/docs"
      Versioned.init(docs.repartitionByRange(4, col("doc_id")), r)
      Versioned.mergeUpsert(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + lit(100L)),
        r, Seq("doc_id"))
      Versioned.mergeUpsert(
        docs.filter(col("doc_id") % 7 === 1)
          .withColumn("n_chars", col("n_chars") + lit(7L)),
        r, Seq("doc_id"))
      Versioned.compact(s, r)
      r
    })

  /** k16 fixture: orders re-laid-out in Z-order over
    * (o_custkey, o_totalprice). Initialized wide (4 unclustered
    * files) so the relayout, not the initial write, provides the
    * pruning. Cached: scanning a clustered table is the steady state.
    */
  private[graft] def zorderOrdersRoot(s: SparkSession, dir: String): String =
    versionedFixtures.computeIfAbsent((s, dir, "zorder"), _ => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val r = tempTableRoot("graft_versioned_zorder") + "/orders"
      Versioned.init(o.repartition(4), r)
      Versioned.clusterBy(s, r, ("o_custkey", "o_totalprice"),
        nFiles = 8)
      r
    })

  /** k10/k11 shared oracle CTEs — the merge's relational definition:
    * updates win, unmatched target rows carry over, unmatched source
    * rows insert.
    */
  /** Shared by r3 (batch as-of) and st7 (streaming as-of) — the
    * streaming sink must equal the batch join exactly, so both hold
    * to the same LATERAL top-1 statement.
    */
  private[graft] val AsofOracleSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, c.click_id,
      |  epoch_us(p.ts) - epoch_us(c.cts) AS gap_us
      |FROM events p
      |LEFT JOIN LATERAL (
      |  SELECT event_id AS click_id, ts AS cts FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |    AND c.ts <= p.ts
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
      |WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id ASC""".stripMargin

  /** Shared by e10 (batch CMS) and st11 (streamed registers) —
    * counter SUM-merge is exact, so the streamed store must equal
    * the one-shot batch sketch verbatim.
    */
  private[graft] val CmsOracleSql: String =
    """WITH items AS (SELECT user_id::VARCHAR AS x FROM events),
      |js(j) AS (VALUES (0), (1), (2), (3)),
      |regs AS (
      |  SELECT j, ('0x' || substr(md5(j || ':' || x), 1, 15))
      |      ::BIGINT % 256 AS b, count(*) AS c
      |  FROM items CROSS JOIN js GROUP BY 1, 2),
      |cands AS (
      |  SELECT user_id, count(*) AS exact_cnt FROM events
      |  GROUP BY user_id
      |  ORDER BY exact_cnt DESC, user_id ASC LIMIT 20),
      |probe AS (
      |  SELECT user_id, exact_cnt, j,
      |    ('0x' || substr(md5(j || ':' || user_id::VARCHAR), 1, 15))
      |      ::BIGINT % 256 AS b
      |  FROM cands CROSS JOIN js)
      |SELECT p.user_id, p.exact_cnt, min(r.c)::BIGINT AS cms_cnt
      |FROM probe p JOIN regs r ON r.j = p.j AND r.b = p.b
      |GROUP BY p.user_id, p.exact_cnt
      |ORDER BY exact_cnt DESC, user_id ASC""".stripMargin

  /** Shared by e9 (batch HLL) and st8 (streamed registers) — the
    * streamed store must equal the batch computation exactly.
    */
  private[graft] val HllOracleSql: String =
    """WITH h AS (
        |  SELECT DISTINCT event_type AS t,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (
        |  SELECT t, h // 4503599627370496 AS bucket,
        |    h % 4503599627370496 AS w
        |  FROM h),
        |regs AS (
        |  SELECT t, bucket,
        |    max(CASE WHEN w = 0 THEN 53
        |             ELSE 53 - length(bin(w)) END) AS rho
        |  FROM r GROUP BY t, bucket),
        |agg AS (
        |  SELECT t, count(*) AS n_present,
        |    sum((2::BIGINT ^ (53 - rho))::BIGINT)::BIGINT
        |      AS sum_present
        |  FROM regs GROUP BY t),
        |est AS (
        |  SELECT t, 256 - n_present AS v,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
        |      * 9007199254740992.0
        |      / (sum_present
        |         + (256 - n_present) * 9007199254740992)::DOUBLE
        |      AS raw
        |  FROM agg),
        |ex AS (
        |  SELECT event_type AS t, count(DISTINCT user_id)
        |    AS exact_distinct
        |  FROM events GROUP BY 1)
        |SELECT ex.t AS event_type, ex.exact_distinct,
        |  round(CASE WHEN raw <= 640.0 AND v > 0
        |    THEN 256.0 * ln(256.0 / v) ELSE raw END)::BIGINT
        |    AS hll_distinct
        |FROM ex JOIN est ON est.t = ex.t
        |ORDER BY event_type ASC""".stripMargin

  /** t3's oracle; t23 derives its metric layer from it. */
  private[graft] val LangIdMatrixSql: String =
    """WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |h AS (SELECT lang,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS hde,
        |    len(list_filter(w, x -> x IN ('le','la','et','est','les'))) AS hfr,
        |    len(list_filter(w, x -> x IN ('el','los','y','es','una'))) AS hes,
        |    len(list_filter(w, x -> x IN ('the','a','of','and','is','in'))) AS hen
        |  FROM t)
        |SELECT lang,
        |  CASE WHEN hde > 0 AND hde >= hfr AND hde >= hes AND hde >= hen THEN 'de'
        |       WHEN hfr > 0 AND hfr >= hes AND hfr >= hen THEN 'fr'
        |       WHEN hes > 0 AND hes >= hen THEN 'es'
        |       WHEN hen > 0 THEN 'en'
        |       ELSE 'und' END AS predicted,
        |  count(*) AS n_docs
        |FROM h GROUP BY 1, 2
        |ORDER BY lang ASC, predicted ASC""".stripMargin

  /** t23's oracle: the t3 confusion matrix + per-class
    * precision/recall/F1 (F1 from the rounded p/r, both engines
    * bit-identical).
    */
  private[graft] val LangIdEvalSql: String = {
    val tail = "ORDER BY lang ASC, predicted ASC"
    require(LangIdMatrixSql.endsWith(tail), "t3 oracle tail changed")
    "WITH m AS (" + LangIdMatrixSql.dropRight(tail.length) + "),\n" +
      """bt AS (SELECT lang AS cls_t, sum(n_docs)::BIGINT AS n_true,
        |    sum(CASE WHEN predicted = lang THEN n_docs ELSE 0 END)
        |      ::BIGINT AS n_correct
        |  FROM m GROUP BY lang),
        |bp AS (SELECT predicted AS cls_p, sum(n_docs)::BIGINT AS n_pred
        |  FROM m GROUP BY predicted),
        |j AS (
        |  SELECT coalesce(cls_t, cls_p) AS class,
        |    coalesce(n_true, 0) AS n_true,
        |    coalesce(n_pred, 0) AS n_pred,
        |    coalesce(n_correct, 0) AS n_correct
        |  FROM bt FULL OUTER JOIN bp ON cls_t = cls_p),
        |pr AS (
        |  SELECT class, n_true, n_pred, n_correct,
        |    CASE WHEN n_pred > 0
        |      THEN round(n_correct::DOUBLE / n_pred, 6) END AS precision,
        |    CASE WHEN n_true > 0
        |      THEN round(n_correct::DOUBLE / n_true, 6) END AS recall
        |  FROM j)
        |SELECT class, n_true, n_pred, n_correct, precision, recall,
        |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
        |        AND precision + recall > 0
        |    THEN round(2.0 * precision * recall / (precision + recall), 6)
        |  END AS f1
        |FROM pr ORDER BY class ASC""".stripMargin
  }

  private[graft] val MergedDocsCtes: String =
    """WITH base AS (
      |  SELECT doc_id, source, n_chars FROM documents
      |  WHERE doc_id % 3 <> 0),
      |upd AS (
      |  SELECT doc_id, source, n_chars + 1000 AS n_chars
      |  FROM documents WHERE doc_id % 2 = 0),
      |merged AS (
      |  SELECT * FROM upd
      |  UNION ALL
      |  SELECT b.* FROM base b LEFT JOIN upd u ON b.doc_id = u.doc_id
      |  WHERE u.doc_id IS NULL)""".stripMargin

  /** Shared by n15 (recompute) and n21 (stored-index serving): the
    * stored index must reproduce the recompute path exactly, so both
    * gates hold against the one SQL.
    */
  /** n10's oracle; n28 derives from it (same CTEs, no drift). */
  private[graft] val IvfBatchOracleSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> x::DOUBLE) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM e),
      |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
      |  FROM n WHERE vec_id % 50 = 0),
      |assignment AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT a.vec_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY round(list_dot_product(a.v, c.cv) /
      |                       (a.nrm * c.cnrm), 6) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM n a CROSS JOIN cents c) WHERE rn = 1),
      |qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
      |  FROM n WHERE vec_id % 73 = 0),
      |probed AS (
      |  SELECT query_id, centroid_id FROM (
      |    SELECT q.query_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_dot_product(c.cv, q.qv) /
      |                       (c.cnrm * q.qnrm), 6) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM qs q CROSS JOIN cents c) WHERE rn <= 3),
      |members AS (
      |  SELECT query_id, vec_id
      |  FROM assignment JOIN probed USING (centroid_id)),
      |scored AS (
      |  SELECT m.query_id, a.vec_id,
      |    round(list_dot_product(a.v, q.qv) / (a.nrm * q.qnrm), 6)
      |      AS score,
      |    row_number() OVER (PARTITION BY m.query_id
      |      ORDER BY round(list_dot_product(a.v, q.qv) /
      |                     (a.nrm * q.qnrm), 6) DESC,
      |               a.vec_id ASC) AS rn
      |  FROM members m JOIN n a USING (vec_id)
      |    JOIN qs q USING (query_id)
      |  WHERE a.vec_id <> m.query_id)
      |SELECT query_id, vec_id, score FROM scored WHERE rn <= 5
      |ORDER BY query_id ASC, score DESC, vec_id ASC""".stripMargin

  /** n28's oracle: n10's chain as the approximate side + the exact
    * brute-force ranking, recall = |∩|/k per query.
    */
  private[graft] val IvfRecallOracleSql: String = {
    val tail = "SELECT query_id, vec_id, score FROM scored WHERE rn <= 5\n" +
      "ORDER BY query_id ASC, score DESC, vec_id ASC"
    require(IvfBatchOracleSql.endsWith(tail),
      "IvfBatchOracleSql tail changed")
    IvfBatchOracleSql.dropRight(tail.length) +
      """,approx AS (SELECT query_id, vec_id FROM scored WHERE rn <= 5),
        |exact AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.query_id, a.vec_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY round(list_dot_product(a.v, q.qv) /
        |                       (a.nrm * q.qnrm), 6) DESC,
        |                 a.vec_id ASC) AS rn
        |    FROM n a CROSS JOIN qs q WHERE a.vec_id <> q.query_id)
        |  WHERE rn <= 5),
        |hits AS (
        |  SELECT e.query_id, count(*) AS n_hits
        |  FROM exact e JOIN approx x ON x.query_id = e.query_id
        |    AND x.vec_id = e.vec_id
        |  GROUP BY e.query_id)
        |SELECT q.query_id, coalesce(h.n_hits, 0) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall
        |FROM qs q LEFT JOIN hits h ON h.query_id = q.query_id
        |ORDER BY q.query_id ASC""".stripMargin
  }

  private[graft] val IvfPqBatchOracleSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> x::DOUBLE) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |  FROM e),
      |cents AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
      |  FROM n WHERE vec_id % 50 = 0),
      |assignment AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT a.vec_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY round(list_dot_product(a.v, c.cv) /
      |                       (a.nrm * c.cnrm), 6) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM n a CROSS JOIN cents c) WHERE rn = 1),
      |qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
      |  FROM n WHERE vec_id % 73 = 0),
      |probed AS (
      |  SELECT query_id, centroid_id FROM (
      |    SELECT q.query_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY round(list_dot_product(c.cv, q.qv) /
      |                       (c.cnrm * q.qnrm), 6) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM qs q CROSS JOIN cents c) WHERE rn <= 3),
      |sub(s) AS (VALUES (0), (1), (2), (3)),
      |vs AS (SELECT vec_id, s,
      |    list_slice(v, s*16 + 1, s*16 + 16) AS vs
      |  FROM e, sub),
      |cb AS (SELECT vec_id AS cid, s,
      |    list_slice(v, s*16 + 1, s*16 + 16) AS cs
      |  FROM e, sub WHERE vec_id % 50 = 0),
      |codes AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT v.vec_id, v.s, c.cid,
      |      row_number() OVER (PARTITION BY v.vec_id, v.s
      |        ORDER BY round(list_dot_product(c.cs, c.cs)
      |          - 2 * list_dot_product(v.vs, c.cs), 6) ASC,
      |          c.cid ASC) AS rn
      |    FROM vs v JOIN cb c USING (s)) WHERE rn = 1),
      |qsl AS (SELECT vec_id AS query_id, s, vs AS qsl
      |  FROM vs WHERE vec_id % 73 = 0),
      |lut AS (SELECT q.query_id, c.s, c.cid,
      |    round(list_dot_product(q.qsl, c.cs), 6) AS contrib
      |  FROM cb c JOIN qsl q USING (s)),
      |cand AS (
      |  SELECT query_id, vec_id
      |  FROM assignment JOIN probed USING (centroid_id)
      |  WHERE vec_id <> query_id),
      |scored AS (
      |  SELECT ca.query_id, ca.vec_id,
      |    round(sum(l.contrib), 6) AS score
      |  FROM cand ca JOIN codes co USING (vec_id)
      |    JOIN lut l ON l.query_id = ca.query_id
      |      AND l.s = co.s AND l.cid = co.cid
      |  GROUP BY ca.query_id, ca.vec_id),
      |r AS (SELECT query_id, vec_id, score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, vec_id ASC) AS rn
      |  FROM scored)
      |SELECT query_id, vec_id, score FROM r WHERE rn <= 5
      |ORDER BY query_id ASC, score DESC, vec_id ASC""".stripMargin

  /** n22's oracle: n15's full-corpus assignment CTEs, rolled up per
    * centroid — derived from [[IvfPqBatchOracleSql]] so the codebook
    * convention can never drift between the two.
    */
  private[graft] val IndexAppendOracleSql: String = {
    val marker = ",\nqs AS"
    val idx = IvfPqBatchOracleSql.indexOf(marker)
    require(idx >= 0, "IvfPqBatchOracleSql shape changed")
    IvfPqBatchOracleSql.substring(0, idx) +
      "\nSELECT centroid_id, count(*) AS n_members" +
      "\nFROM assignment GROUP BY centroid_id ORDER BY centroid_id ASC"
  }

  /** n26's oracle: the n15/n21 serve with the tombstoned slice
    * excluded from candidates — derived from [[IvfPqBatchOracleSql]]
    * so the codebook convention can never drift.
    */
  private[graft] val IndexDeleteOracleSql: String = {
    val marker = "WHERE vec_id <> query_id),"
    require(IvfPqBatchOracleSql.contains(marker),
      "IvfPqBatchOracleSql cand shape changed")
    IvfPqBatchOracleSql.replace(marker,
      "WHERE vec_id <> query_id AND vec_id % 31 <> 1),")
  }

}
