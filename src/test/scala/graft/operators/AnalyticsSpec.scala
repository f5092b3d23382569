package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts/nulls/min-max agree with direct aggregates") {
    val orders = Tables.orders(spark, sfSmoke)
    val row = AnalyticsOps.profile(orders,
      Seq("o_orderstatus", "o_orderpriority"),
      "o_totalprice", "o_orderdate").head
    assert(row.getAs[Long]("n_rows") == orders.count())
    assert(row.getAs[Long]("n_o_orderstatus") ==
      orders.select("o_orderstatus").distinct().count())
    assert(row.getAs[Long]("null_o_orderdate") ==
      orders.filter(col("o_orderdate").isNull).count())
    assert(row.getAs[Double]("min_o_totalprice") <=
      row.getAs[Double]("max_o_totalprice"))
  }

  test("groupPercentiles: known tiny distribution") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("k", "v")
    val rows = AnalyticsOps.groupPercentiles(df, "k", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("a") == 2.5) // interpolated median of 1..4
    assert(rows("b") == 10.0)
  }

  test("stratified hash sampling is deterministic and rate-shaped") {
    val docs = Tables.documents(spark, sfSmoke)
    val counts = AnalyticsOps.stratifiedSampleCounts(docs, "doc_id",
      "lang", Map("en" -> 300), 100)
    val first = counts.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val second = counts.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(first.toSeq == second.toSeq, "hash sampling must be stable")
    first.foreach { case (_, n, s) => assert(s <= n) }
    // the sample filter and the audit count agree exactly
    val sampledEn = AnalyticsOps.sampledRows(
      docs.filter(col("lang") === "en"), "doc_id", 300).count()
    assert(first.find(_._1 == "en").map(_._3).contains(sampledEn))
  }

  test("mixtureSampleCounts: inverse-sqrt rates upweight rare strata") {
    import spark.implicits._
    val df = ((1 to 400).map(i => (s"b$i", "big")) ++
      (1 to 16).map(i => (s"r$i", "rare"))).toDF("id", "src")
    def run() = AnalyticsOps
      .mixtureSampleCounts(df, "id", "src", gainPerMille = 1000.0)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val out = run()
    // floor(1000/sqrt(400)) = 50‰; floor(1000/sqrt(16)) = 250‰ — the
    // rare stratum samples at 5x the dominant one's rate.
    assert(out("big")._1 == 400L && out("big")._2 == 50L)
    assert(out("rare")._1 == 16L && out("rare")._2 == 250L)
    out.values.foreach { case (n, _, sampled) =>
      assert(sampled >= 0L && sampled <= n) }
    // Deterministic: the md5 gate has no seed or order dependence.
    assert(run() == out)
  }

  test("sequencePack: greedy budget cut, start-shard assignment") {
    // Per-group streams: docs ordered by id, shard = floor(before/10).
    val df = Seq(
      ("s1", "d1", "a b c d"),            // 4 tok, before=0  → shard 0
      ("s1", "d2", "e f g h i"),          // 5 tok, before=4  → shard 0
      ("s1", "d3", "j k l"),              // 3 tok, before=9  → shard 0
      ("s1", "d4", "m n"),                // 2 tok, before=12 → shard 1
      ("s2", "d5", "x y z")               // other group restarts at 0
    ).toDF("source", "doc_id", "text")
    val rows = AnalyticsOps
      .sequencePack(df, "doc_id", "source", "text", budgetTokens = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("s1", 0L, 3L, 12L),   // d1..d3 start before the 10-token cut
      ("s1", 1L, 1L, 2L),
      ("s2", 0L, 1L, 3L)))
    // conservation: shard token totals sum to the corpus token total
    val corpus = Tables.documents(spark, sfSmoke)
    val packed = AnalyticsOps.sequencePack(corpus, "doc_id", "source",
      "text", budgetTokens = 8192)
    val shardSum = packed.agg(sum("shard_tokens")).head.getLong(0)
    val tokSum = corpus.select(
      sum(size(TextOps.tokens(col("text")))).cast("long"))
      .head.getLong(0)
    assert(shardSum == tokSum)
    // every full shard (all but each group's last) holds >= 1 doc and
    // starts strictly inside its budget window: shard ids are dense
    val ids = packed.groupBy("source")
      .agg(collect_list(col("shard_id")).as("ids")).collect()
    ids.foreach { r =>
      val s = r.getSeq[Long](1).sorted
      assert(s == (0L until s.length.toLong), s"dense ids per group: $s")
    }
  }

  test("kmvUnion: merged per-group sketch equals the direct sketch") {
    val ev = Tables.events(spark, sfSmoke)
    val row = AnalyticsOps.kmvUnion(ev, "event_type", "user_id").head()
    assert(row.getLong(1) == row.getLong(2),
      "mergeability: union-of-sketches must equal sketch-of-union")
    val exact = row.getLong(0).toDouble
    assert(math.abs(row.getLong(1) - exact) / exact < 0.2,
      s"estimate off: $row")
  }

  test("quantileSketchUnion: merged == direct; estimate tracks exact") {
    import spark.implicits._
    val ev = Tables.events(spark, sfSmoke)
    val row = AnalyticsOps
      .quantileSketchUnion(ev, "event_type", "event_id", "value")
      .head()
    assert(row.getDouble(1) == row.getDouble(2),
      s"mergeability: union-of-sketches must equal sketch-of-union: $row")
    val exact = row.getDouble(0)
    assert(math.abs(row.getDouble(1) - exact) / math.abs(exact) < 0.25,
      s"sample median far from exact: $row")
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) < 0.25)
    // unsaturated case: fewer rows than k -> the sample IS the data,
    // so the sketch median equals the exact median
    val small = (1L to 99L).map(i => (i, "a", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val sm = AnalyticsOps
      .quantileSketchUnion(small, "event_type", "event_id", "value")
      .head()
    assert(sm.getDouble(0) == 50.0 && sm.getDouble(1) == 50.0 &&
      sm.getDouble(2) == 50.0 && sm.getDouble(3) == 0.0, s"$sm")
  }

  test("weightedSample: deterministic; heavy docs oversampled") {
    import spark.implicits._
    // two strata: heavy docs (100 tokens) and light docs (2 tokens) in
    // equal numbers — token-mass weighting must pull mostly heavies
    val heavy = (1L to 50L).map(i =>
      (i, "h", (1 to 100).map(t => s"w$t").mkString(" ")))
    val light = (101L to 150L).map(i => (i, "l", "a b"))
    val df = (heavy ++ light).toDF("doc_id", "source", "text")
    val out = AnalyticsOps
      .weightedSample(df, "doc_id", "source", "text", 20)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out.size == 20)
    assert(out.count(_._2 == "h") >= 15,
      s"50x weight must dominate the draw: $out")
    // ranks ascend; ties broken by id; draw is reproducible
    assert(out.map(_._4) == out.map(_._4).sorted)
    assert(out == AnalyticsOps
      .weightedSample(df, "doc_id", "source", "text", 20)
      .as[(Long, String, Long, Double)].collect().toSeq)
    // real corpus: deterministic across runs
    val corpus = Tables.documents(spark, sfSmoke)
    def run() = AnalyticsOps
      .weightedSample(corpus, "doc_id", "source", "text", 30)
      .collect().toSeq
    assert(run() == run())
  }

  test("curriculumPack: quality-descending shards, conserving") {
    val corpus = Tables.documents(spark, sfSmoke)
    val packed = AnalyticsOps.curriculumPack(corpus, "doc_id",
      "source", "text", "n_chars", budgetTokens = 8192).collect()
    // conservation: same token total as ingestion-order packing
    val shardSum = packed.map(_.getLong(3)).sum
    val tokSum = corpus.select(
      sum(size(TextOps.tokens(col("text")))).cast("long"))
      .head.getLong(0)
    assert(shardSum == tokSum)
    // the curriculum property: within every source, mean shard score
    // never increases as shard_id grows
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byShard = rows.sortBy(_.getLong(1)).map(_.getDouble(4)).toSeq
      byShard.zip(byShard.drop(1)).foreach { case (a, b) =>
        assert(a >= b, s"curriculum violated: $a < $b")
      }
    }
    // deterministic
    val again = AnalyticsOps.curriculumPack(corpus, "doc_id",
      "source", "text", "n_chars", budgetTokens = 8192).collect()
    assert(packed.toSeq == again.toSeq)
  }

  test("sequencePackGlobal: two-pass prefix sum == naive global window") {
    // bucket boundary case: width 2 puts d1,d2 | d3,d4 in different
    // buckets; the offset join must carry d1+d2's total across.
    val df = Seq(
      (1L, "a b c d"), (2L, "e f g"),        // bucket 0: 7 tokens
      (3L, "h i j k l"), (4L, "m n")         // bucket 1: before=7,12
    ).toDF("doc_id", "text")
    val rows = AnalyticsOps
      .sequencePackGlobal(df, "doc_id", "text", budgetTokens = 10,
        bucketWidth = 2L)  // ids 0-1, 2-3, 4-5 ... per bucket
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // before: d1=0, d2=4, d3=7, d4=12 → shards 0,0,0,1
    assert(rows.toSeq == Seq((0L, 3L, 12L), (1L, 1L, 2L)))
    // differential vs the naive single-window form on the real corpus
    val corpus = Tables.documents(spark, sfSmoke)
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      corpus.select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("shard_id",
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / 8192.0)
            .cast("long"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("shard_tokens"))
        .orderBy("shard_id").collect().toSeq
    }
    val twoPassDf = AnalyticsOps.sequencePackGlobal(corpus, "doc_id",
      "text", 8192, 64L)
    val twoPass = twoPassDf.collect().toSeq
    assert(twoPass == naive,
      "two-pass prefix sum must equal the single-window form")
    // the in-bucket window and the offsets branch must share ONE scan
    // + bucket exchange (the symmetric isnotnull keeps the branches
    // canonically equal — see sequencePackGlobal)
    val plan = twoPassDf.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"offsets branch did not reuse the bucket exchange:\n$plan")
  }

  test("splitAssign: group-consistent, conserving, deterministic") {
    val corpus = Tables.documents(spark, sfSmoke)
    val out = AnalyticsOps.splitAssign(corpus, "source", "text",
      trainPerMille = 800, valPerMille = 100)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // conservation: docs and groups partition exactly
    assert(out.values.map(_._2).sum == corpus.count())
    assert(out.values.map(_._1).sum ==
      corpus.select("source").distinct().count())
    // leakage safety: a group's docs all carry the same split — the
    // split of a doc is a function of source alone, so distinct
    // (source, split) pairs == distinct sources
    import org.apache.spark.sql.functions.{conv => fconv}
    val bucket = fconv(substring(md5(col("source")), 1, 15), 16, 10)
      .cast("long") % 1000
    val split = when(bucket < 800, "train")
      .when(bucket < 900, "val").otherwise("test")
    assert(corpus.select(col("source"), split.as("s")).distinct()
      .count() == corpus.select("source").distinct().count())
    // deterministic
    val again = AnalyticsOps.splitAssign(corpus, "source", "text",
      800, 100).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
  }

  test("redactionStats: emails and digit runs are scrubbed") {
    val df = Seq(
      ("a", "contact bob@example.com now"),
      ("a", "order 12345 shipped 2024"),
      ("a", "no pii here"),
      ("b", "alice@test.org and 9 items")).toDF("k", "payload")
    val rows = AnalyticsOps.redactionStats(df, "k", "payload")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("a") == 2) // two payloads changed, one untouched
    assert(rows("b") == 1)
  }

  test("runningTotals: cumulative sums and gaps per key") {
    val t0 = 1700000000000000L // µs
    val df = Seq(
      (1L, 10L, t0, 5.0), (1L, 11L, t0 + 2000000L, 7.0),
      (2L, 12L, t0, 1.0))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val rows = AnalyticsOps.runningTotals(df, "user_id", "ts",
      "event_id", "value").collect()
    assert(rows.map(_.getDouble(3)).toSeq == Seq(5.0, 12.0, 1.0))
    assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 2000000L, 0L))
  }

  test("groupingSetCounts equals the union of the two single-key rollups") {
    val docs = Tables.documents(spark, sfSmoke)
    val gs = AnalyticsOps.groupingSetCounts(docs, "source", "lang")
      .collect()
    val bySource = docs.groupBy("source").count().collect()
      .map(r => (r.getString(0), "<all>", 0, 1, r.getLong(1))).toSet
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => ("<all>", r.getString(0), 1, 0, r.getLong(1))).toSet
    val got = gs.map(r => (r.getString(0), r.getString(1),
      r.getInt(2), r.getInt(3), r.getLong(4))).toSet
    assert(got == (bySource ++ byLang))
  }

  test("subsetAlgebra: intersect and except tags on a tiny frame") {
    val df = Seq((1L, "x y"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "text")
    val rows = AnalyticsOps.subsetAlgebra(df, "id",
      col("text").contains("x"), col("text").contains("y"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "a_only"), (1L, "both")))
  }

  test("corpusPrep: open knobs keep every unique doc; tightening shrinks") {
    val docs = Tables.documents(spark, sfSmoke)
    val open = AnalyticsOps.corpusPrep(docs, "doc_id", "text",
      "n_chars", "lang", minQuality = 0.0, samplePerMille = 1000)
    val total = open.agg(sum("n_docs")).head.getLong(0)
    val uniq = docs.select(DedupOps.contentKey(col("text")))
      .distinct().count()
    assert(total == uniq, "no quality floor + full sample = exact dedup")
    val tight = AnalyticsOps.corpusPrep(docs, "doc_id", "text",
      "n_chars", "lang", minQuality = 0.55, samplePerMille = 500)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)
    assert(tight <= total, "tightening any knob never grows the corpus")
    // deterministic: repeated run identical
    val again = AnalyticsOps.corpusPrep(docs, "doc_id", "text",
      "n_chars", "lang", minQuality = 0.55, samplePerMille = 500)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)
    assert(again == tight)
  }

  test("sketchProfile: approx distinct and p50 within tolerance of exact") {
    val rows = AnalyticsOps.sketchProfileRaw(Tables.events(spark, sfSmoke),
      "event_type", "user_id", "value").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exactD, approxD) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approxD - exactD) <= math.max(2L,
        (exactD * 0.05).toLong),
        s"HLL off by >5%: exact=$exactD approx=$approxD")
      val (exactP, approxP) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(approxP - exactP) <= math.max(1.0, exactP * 0.05),
        s"t-digest p50 off: exact=$exactP approx=$approxP")
    }
  }

  test("sketchProfile: oracle shape carries exact cols + band witnesses") {
    val rows = AnalyticsOps.sketchProfile(Tables.events(spark, sfSmoke),
      "event_type", "user_id", "value")
    assert(rows.columns.toSeq == Seq("event_type", "exact_distinct",
      "exact_p50", "hll_within_15pct", "p50_within_1pct"))
    rows.collect().foreach { r =>
      // the witnesses must actually HOLD (they are what the DuckDB
      // twin asserts as the constant 1) — a failure here means the
      // oracle gate would fail too
      assert(r.getInt(3) == 1, s"HLL witness broken on ${r.get(0)}")
      assert(r.getInt(4) == 1, s"p50 witness broken on ${r.get(0)}")
    }
  }

  test("kmvDistinct: unsaturated is exact; saturated within KMV error") {
    import spark.implicits._
    // 10 distinct ids < k → the sketch IS the exact count
    val small = (1 to 40).map(i => ("t", (i % 10).toLong))
      .toDF("event_type", "user_id")
    val sm = AnalyticsOps.kmvDistinct(small, "event_type", "user_id",
      k = 256).head
    assert(sm.getLong(1) == 10L && sm.getLong(2) == 10L &&
      sm.getDouble(3) == 0.0)
    // saturated on the real table: standard error ~1/sqrt(k-1) ≈ 6%
    // at k=256 — hold every key to 4 sigma
    val rows = AnalyticsOps.kmvDistinct(Tables.events(spark, sfSmoke),
      "event_type", "user_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) <= 0.25,
        s"KMV rel_err ${r.getDouble(3)} for ${r.getString(0)} " +
          s"(exact=${r.getLong(1)} est=${r.getLong(2)})")
    }
    // mergeability argument in miniature: the global k-minima equal
    // the k-minima of the union of per-partition k-minima
    val ev = Tables.events(spark, sfSmoke)
    val repart = AnalyticsOps.kmvDistinct(ev.repartition(7),
      "event_type", "user_id").collect()
    assert(rows.map(_.toString).toSeq == repart.map(_.toString).toSeq)
  }

  test("q12 shape: high+low counts cover every joined row") {
    val res = StarSchemaOps.lineStatusPriorityCounts(spark, sfSmoke)
      .collect()
    val total = res.map(r => r.getLong(1) + r.getLong(2)).sum
    val li = Tables.lineitem(spark, sfSmoke)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.orders(spark, sfSmoke)
    val expected = li.join(ord,
      li("l_orderkey") === ord("o_orderkey")).count()
    assert(total == expected)
  }

  test("q18 shape: every returned order exceeds the quantity threshold") {
    val res = StarSchemaOps.largeQuantityOrders(spark, sfSmoke,
      minQty = 150.0, k = 10).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(r.getAs[Double]("total_qty") > 150.0))
    // sorted by o_totalprice desc
    val prices = res.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sortBy(-_))
  }

  test("q13 shape: zero-order customers survive the outer join") {
    val dist = StarSchemaOps.orderCountDistribution(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // histogram covers every customer exactly once
    assert(dist.values.sum == Tables.customer(spark, sfSmoke).count())
    // customers with no (non-urgent) orders must appear at c_count 0
    val custs = Tables.customer(spark, sfSmoke).select("c_custkey")
    val withOrders = Tables.orders(spark, sfSmoke)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val zero = custs.except(withOrders).count()
    assert(dist.getOrElse(0L, 0L) == zero)
  }

  test("q21 shape: sole-supplier and on-time-peer orders are excluded") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(d + " 00:00:00")
    val dir = tmpDir("q21") + "/sf"
    // order 1: supp A late, supp B on time  -> A waits (counted)
    // order 2: supp A late, supp B late     -> excluded (peer late)
    // order 3: supp A late, sole supplier   -> excluded (no peer)
    // order 4: open status                  -> excluded entirely
    Seq(
      (1L, 10L, ts("2024-06-01")), (1L, 20L, ts("2024-01-05")),
      (2L, 10L, ts("2024-06-01")), (2L, 20L, ts("2024-06-01")),
      (3L, 10L, ts("2024-06-01")),
      (4L, 10L, ts("2024-06-01")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, ts("2024-01-01"), "F"), (2L, ts("2024-01-01"), "F"),
      (3L, ts("2024-01-01"), "F"), (4L, ts("2024-01-01"), "O"))
      .toDF("o_orderkey", "o_orderdate", "o_orderstatus")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "SuppA"), (20L, "SuppB"))
      .toDF("s_suppkey", "s_name")
      .write.parquet(s"$dir/supplier.parquet")
    val out = StarSchemaOps.waitingSuppliers(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("SuppA", 1L)))
  }

  test("q19 shape: disjunctive revenue equals the manually-filtered sum") {
    val got = StarSchemaOps.disjunctiveRevenue(spark, sfSmoke)
      .head.getDouble(0)
    val li = Tables.lineitem(spark, sfSmoke)
    val part = Tables.part(spark, sfSmoke)
    val j = li.join(part, li("l_partkey") === part("p_partkey"))
    def bundle(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    val want = j.filter(
      bundle("Brand#12", 1, 15, 1, 20) ||
      bundle("Brand#23", 10, 30, 10, 30) ||
      bundle("Brand#7", 20, 50, 20, 40))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4)).head.getDouble(0)
    assert(got == want)
  }

  test("heavyHittersTopK: merged bucketized path equals direct top-k") {
    // hand corpus with a known frequency ladder + ties
    val items = Seq.fill(9)("a") ++ Seq.fill(7)("b") ++
      Seq.fill(7)("c") ++ Seq.fill(3)("d") ++ Seq("e", "f")
    val df = items.toDF("item")
    val out = AnalyticsOps.heavyHittersTopK(df, "item", k = 4,
      buckets = 8).as[(String, Long)].collect().toSeq
    // tie at 7 breaks on item asc; d beats the singletons
    assert(out == Seq(("a", 9L), ("b", 7L), ("c", 7L), ("d", 3L)),
      s"$out")
    // real events: the merged path must equal the direct top-k, and
    // must be invariant to the bucket count (the merge is lossless
    // for ANY disjoint partitioning of the item domain)
    val events = Tables.events(spark, sfSmoke)
    val direct = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id").asc).limit(20)
      .as[(Long, Long)].collect().toSeq
    for (b <- Seq(1, 4, 64)) {
      val merged = AnalyticsOps.heavyHittersTopK(events, "user_id",
        k = 20, buckets = b).as[(Long, Long)].collect().toSeq
      assert(merged == direct, s"buckets=$b")
    }
  }

  test("targetMixture: rates capped at 1000; under-budget sources keep all") {
    import spark.implicits._
    // source a: 100 tokens across 10 docs; source b: 20 tokens.
    // share 0.5 → total 120 → target 30/source → a rate 300‰,
    // b rate min(1000, 1500) = 1000‰ (keeps everything)
    val docs = ((1 to 10).map(i =>
        (i.toLong, "a", Seq.fill(10)("w").mkString(" "))) ++
      (11 to 12).map(i =>
        (i.toLong, "b", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = AnalyticsOps.targetMixture(docs, "doc_id", "source",
        "text", share = 0.5)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._2 == 100L && out("a")._3 == 30L &&
      out("a")._4 == 300L)
    assert(out("b")._2 == 20L && out("b")._4 == 1000L &&
      out("b")._5 == 20L) // rate capped → full source kept
    // the md5 gate keeps a deterministic subset ≤ the source total
    assert(out("a")._5 <= 100L && out("a")._5 % 10 == 0L)
  }

  test("splitPack: straddlers split; every non-final shard is exactly full") {
    import spark.implicits._
    // three 5-token docs, budget 8 → [d1(5) d2(3)][d2(2) d3(5)]
    val docs = Seq((1L, "s", "a b c d e"), (2L, "s", "f g h i j"),
      (3L, "s", "k l m n o")).toDF("doc_id", "source", "text")
    val out = AnalyticsOps.splitPack(docs, "doc_id", "source", "text",
        budgetTokens = 8)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("s", 0L, 2L, 8L), ("s", 1L, 2L, 7L)))
    // invariant on real data: every non-final shard carries the budget
    val real = AnalyticsOps.splitPack(
        graft.Tables.documents(spark, sfSmoke),
        "doc_id", "source", "text", budgetTokens = 512)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    real.foreach { case (src, shards) =>
      val last = shards.map(_._2).max
      shards.filter(_._2 != last).foreach { s =>
        assert(s._4 == 512L, s"$src shard ${s._2} not full: $s")
      }
    }
  }

  test("gapFillDaily: missing days appear as zero rows") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val ev = Seq(("a", ts(1), 50.0), ("a", ts(3), 60.0),
        ("b", ts(2), 10.0), ("b", ts(3), 99.0))
      .toDF("event_type", "ts", "value")
    val out = AnalyticsOps.gapFillDaily(ev, "event_type", "ts",
        col("value") > 20.0)
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).toString.take(10), r.getLong(2))).toSeq
    // spine covers days 1–3 for both keys; sparse hits zero-filled
    assert(out == Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 1L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 0L),
      ("b", "2024-01-03", 1L)))
  }

  test("cohortRetention: first-week cohorts, distinct per offset") {
    import spark.implicits._
    import java.sql.Timestamp
    // Mondays: 2024-01-01 and 2024-01-08
    def ts(day: Int, h: Int = 12) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1)), (1L, ts(3)),          // u1 cohort w1, active w0 ×2
      (1L, ts(10)),                      // u1 active w1
      (2L, ts(2)),                       // u2 cohort w1, w0 only
      (3L, ts(8)), (3L, ts(9)))          // u3 cohort w2, w0 ×2
      .toDF("user_id", "ts")
    val out = AnalyticsOps.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("epochShuffle: deterministic, order differs across epochs") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val a = AnalyticsOps.epochShuffle(docs, "doc_id", epochs = 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val b = AnalyticsOps.epochShuffle(docs, "doc_id", epochs = 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(a == b)                         // reproducible
    assert(a.map(_._2).toSet == Set(200L)) // every epoch = full corpus
    assert(a.map(_._3).distinct.size == 3, // every epoch a new order
      s"order_sum collided: $a")
  }

  test("hllDistinct: both branches land within the HLL error band") {
    import spark.implicits._
    // "big" exercises the raw harmonic branch (n » 2.5m = 640),
    // "small" the linear-counting branch
    val rows = (0 until 20000).map(i => ("big", i.toLong)) ++
      (0 until 50).map(i => ("small", i.toLong))
    val out = AnalyticsOps.hllDistinct(rows.toDF("t", "id"), "t", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("big")._1 == 20000L)
    assert(math.abs(out("big")._2 - 20000L) <= 2000L, s"$out")
    assert(out("small")._1 == 50L)
    assert(math.abs(out("small")._2 - 50L) <= 8L, s"$out")
  }

  test("funnel: strict ordering — steps before the anchor don't count") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      // u1 converts fully in order
      (1L, "signup", ts(10)), (1L, "click", ts(20)),
      (1L, "purchase", ts(30)),
      // u2's click precedes signup → stops at step 1
      (2L, "click", ts(5)), (2L, "signup", ts(10)),
      (2L, "purchase", ts(50)),
      // u3 reaches click; purchase precedes the click → stops at 2
      (3L, "signup", ts(10)), (3L, "purchase", ts(15)),
      (3L, "click", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val out = AnalyticsOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "signup", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("kmvIntersect: exact when unsaturated; within the ρ-band when not") {
    import spark.implicits._
    // groups a and b: 2000 ids each, 1000 shared → |A∩B| = 1000
    val rows = (0 until 2000).map(i => ("a", i.toLong)) ++
      (1000 until 3000).map(i => ("b", i.toLong))
    val df = rows.toDF("t", "id")
    // saturated (k=64 « 2000): estimate within 3/sqrt(k) ≈ 37%
    val sat = AnalyticsOps.kmvIntersect(df, "t", "id", k = 64)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(sat._1 == 1000L)
    assert(math.abs(sat._2 - 1000L) <= 375L, s"saturated est: $sat")
    // unsaturated (k = 8192 > |A∪B|): estimate is EXACT
    val unsat = AnalyticsOps.kmvIntersect(df, "t", "id", k = 8192)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(unsat == ((1000L, 1000L)))
  }

  test("sessionize: gap splits, exact durations, per-key isolation") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: events at 0, 10, 50 min (gap 30) → {0,10}, {50}
    // user 2: events at 0, 29, 60 → {0,29}, {60} (29 ≤ 30 stays)
    val ev = Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L),
        (2L, ts(0), 4L), (2L, ts(29), 5L), (2L, ts(60), 6L))
      .toDF("user_id", "ts", "event_id")
    val out = AnalyticsOps.sessionize(ev, "user_id", "ts",
        "event_id", gapMinutes = 30)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // 2 one-event sessions (dur 0), 2 two-event sessions
    // (durs 10 min and 29 min = 600e6 + 1740e6 us)
    assert(out == Seq((1L, 2L, 0L, 0.0),
      (2L, 2L, 2340000000L, 1170000000.0)))
  }

  test("pipelineE2e: gate drops short/repetitive, dedup keeps first, " +
      "pack cuts at the budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "alpha beta gamma delta epsilon zeta"), // 6 tok, kept
      (2L, "s", "too short"),                           // gated: < 5
      (3L, "s", "a a a a a a a a a a"),                 // gated: ratio
      (4L, "s", "alpha beta gamma delta epsilon zeta"), // dup of 1
      (5L, "s", "one two three four five six seven"))   // 7 tok, kept
      .toDF("doc_id", "source", "text")
    val out = AnalyticsOps.pipelineE2e(docs, "doc_id", "source",
        "text", minTokens = 5, budgetTokens = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // survivors: doc 1 (6 tok), doc 5 (7 tok); cum=6 → shard 0,
    // cum=13, start offset 6 → floor(6/10)=0 → both in shard 0
    assert(out == Seq(("s", 0L, 2L, 13L)))
  }

  test("datasetCard: seals are order/partitioning-independent and " +
      "content/membership-sensitive") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    def card(df: org.apache.spark.sql.DataFrame) =
      AnalyticsOps.datasetCard(df, "doc_id", "text", "source")
        .collect().map(_.toString).toSeq
    val base = card(docs)
    // any re-partitioning / row order must produce the SAME card
    assert(card(docs.repartition(7, col("n_chars"))) == base)
    assert(card(docs.orderBy(col("text").desc)) == base)
    // flipping one character changes that source's content seal only
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 1L, concat(col("text"), lit("!")))
        .otherwise(col("text")))
    val diff = card(mutated).zip(base).filter(p => p._1 != p._2)
    assert(diff.size == 1)
    // dropping one doc changes that source's id seal
    val dropped = card(docs.filter(col("doc_id") =!= 1L))
    assert(dropped != base)
  }

  test("kAnonymityAudit: planted rare class is suppressed at its " +
      "level and rescued by generalization") {
    // 12 rows of (n1, segA, band 0) — one k=10-safe class — plus 2
    // rows (n1, segB, band 0): rare at l0 AND l1, absorbed at l2.
    val rows = (1 to 12).map(i => ("n1", "segA", 10.0 * i)) ++
      Seq(("n1", "segB", 50.0), ("n1", "segB", 60.0))
    val df = rows.toDF("nat", "seg", "bal")
    val out = AnalyticsOps.kAnonymityAudit(df, col("nat"), col("seg"),
        floor(col("bal") / 1000).cast("long"), k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // l0: classes (n1,segA,0)=12 ok, (n1,segB,0)=2 suppressed
    assert(out("l0_full_qi") == (2L, 2L, 2L, 12L))
    // l1 drops the band: same two classes, same outcome
    assert(out("l1_drop_band") == (2L, 2L, 2L, 12L))
    // l2: one class of 14 — everything releasable
    assert(out("l2_key_only") == (1L, 14L, 0L, 14L))
  }

  test("scd2Build: no-op updates collapse, intervals chain exactly") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: A, A (no-op), B, B (no-op), A  -> versions A/B/A
    // user 2: single X -> one open version
    val df = Seq(
      (1L, ts(10), 100L, "A"), (1L, ts(20), 101L, "A"),
      (1L, ts(30), 102L, "B"), (1L, ts(40), 103L, "B"),
      (1L, ts(50), 104L, "A"),
      (2L, ts(15), 200L, "X"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = AnalyticsOps.scd2Build(df, "user_id", "ts", "event_id",
      "event_type").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq == Seq("A", "B", "A"))
    // each interval closes at the NEXT CHANGE, skipping the no-op
    assert(u1(0).getTimestamp(4) == ts(30))
    assert(u1(1).getTimestamp(4) == ts(50))
    assert(u1(2).getTimestamp(4) == null && u1(2).getBoolean(5))
    assert(u1.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getBoolean(5))
  }
}
