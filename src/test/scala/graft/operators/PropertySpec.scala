package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based suite (SURVEY §5.2(3)): algebraic laws of the core
  * operators over ScalaCheck-generated data. The scalatest–scalacheck
  * bridge isn't resolvable offline, so sampling is hand-rolled with
  * fixed seeds — deterministic AND property-shaped. Spark jobs per
  * case are expensive; 5 samples per law.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap { i =>
      gen.apply(Gen.Parameters.default.withSize(30), Seed(42L + i))
    }

  private val keyGen = Gen.chooseNum(0L, 12L)
  private val valGen = Gen.alphaNumStr.map(_.take(8))
  private val batchGen = Gen.listOf(Gen.zip(keyGen, valGen))
  private val twoBatches = Gen.zip(batchGen, batchGen)

  test("property: dedupAppend is idempotent — append(append(t,b),b) == append(t,b)") {
    samples(twoBatches).foreach { case (existingRows, batchRows) =>
      val existing = ReferenceOps.dedupAppend(
        Seq.empty[(Long, String)].toDF("k", "v"),
        existingRows.toDF("k", "v"), Seq("k"), "v")
      val batch = batchRows.toDF("k", "v")
      val once = ReferenceOps.dedupAppend(existing, batch, Seq("k"), "v")
      val twice = ReferenceOps.dedupAppend(once, batch, Seq("k"), "v")
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  test("property: dedupAppend keys unique; existing rows never change") {
    samples(twoBatches).foreach { case (existingRows, batchRows) =>
      val existing = ReferenceOps.dedupAppend(
        Seq.empty[(Long, String)].toDF("k", "v"),
        existingRows.toDF("k", "v"), Seq("k"), "v")
      val out = ReferenceOps.dedupAppend(existing,
        batchRows.toDF("k", "v"), Seq("k"), "v")
        .as[(Long, String)].collect()
      assert(out.map(_._1).distinct.length == out.length)
      existing.as[(Long, String)].collect().foreach { case (k, v) =>
        assert(out.toMap.apply(k) == v)
      }
    }
  }

  test("property: search filter monotonicity — more predicates, never more rows") {
    val docGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 100L),
      Gen.oneOf("alpha beta", "gamma delta", "alpha gamma"),
      Gen.oneOf("en", "de")))
    samples(docGen).foreach { rows =>
      val df = rows.toDF("doc_id", "text", "lang")
      val unfiltered = ReferenceOps.search(df, Some("alpha"),
        Seq("text"), Map.empty, "doc_id", Seq.empty, 1000).count()
      val filtered = ReferenceOps.search(df, Some("alpha"),
        Seq("text"), Map("lang" -> "en"), "doc_id", Seq.empty, 1000)
        .count()
      assert(filtered <= unfiltered)
    }
  }

  test("property: jaccard pairs bounded in (0,1], ordered id_a < id_b") {
    val textGen = Gen.listOfN(8,
      Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    val docsGen = Gen.listOfN(8, textGen).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    samples(docsGen).foreach { rows =>
      val pairs = DedupOps.jaccardPairs(rows.toDF("id", "text"),
        "id", "text", minJaccard = 0.1)
        .as[(Long, Long, Double)].collect()
      pairs.foreach { case (a, b, j) =>
        assert(a < b)
        assert(j > 0.0 && j <= 1.0)
      }
    }
  }

  test("property: minhash pairs are always a subset of exact jaccard pairs") {
    // LSH may miss pairs (probabilistically) but must never invent
    // one — verification guarantees precision = 1 by construction
    val textGen = Gen.listOfN(10,
      Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val docsGen = Gen.listOfN(10, textGen).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    samples(docsGen).foreach { rows =>
      val df = rows.toDF("id", "text")
      val exact = DedupOps.jaccardPairs(df, "id", "text", 0.7)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val lsh = DedupOps.minhashPairs(df, "id", "text", 0.7)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact), s"lsh=$lsh exact=$exact")
    }
  }

  test("property: blacklist df-cap equals the window df-cap") {
    // the two physical forms (window count on the x-exchange vs
    // broadcast anti-join of the over-limit set) must keep the SAME
    // capped relation for any data and any cap
    val textGen = Gen.listOfN(10,
      Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val docsGen = Gen.listOfN(10, textGen).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    samples(docsGen).foreach { rows =>
      val sh = DedupOps.hashedShingles(rows.toDF("id", "text"),
        "id", "text")
      Seq(1, 3, Int.MaxValue).foreach { cap =>
        val win = DedupOps.capShingleDf(sh, cap)
          .as[(Long, Long)].collect().sorted.toSeq
        val bl = DedupOps.capShingleDfBlacklist(sh, cap)
          .as[(Long, Long)].collect().sorted.toSeq
        assert(win == bl, s"cap=$cap diverges")
      }
    }
  }

  test("property: exactDedup output has unique content keys, is a subset") {
    samples(batchGen).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }.toDF("id", "text")
      val out = DedupOps.exactDedup(df, "text", "id")
        .as[(Long, String)].collect()
      val norm = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ")
      assert(out.map(r => norm(r._2)).distinct.length == out.length)
      assert(out.toSet.subsetOf(df.as[(Long, String)].collect().toSet))
    }
  }

  test("property: sequence packing conserves tokens; shards cut correctly") {
    // random corpora × random budgets: (1) shard token totals sum to
    // the corpus total; (2) a doc's shard equals floor(before/budget)
    // recomputed from scratch per group; (3) global two-pass == the
    // same law over the single stream.
    val docGen = Gen.listOfN(30, Gen.zip(
      Gen.chooseNum(0L, 500L), Gen.oneOf("g1", "g2", "g3"),
      Gen.chooseNum(1, 12).map(n => Seq.fill(n)("w").mkString(" "))))
      .map(_.distinctBy(_._1))
    val budgetGen = Gen.chooseNum(5, 40)
    samples(Gen.zip(docGen, budgetGen)).foreach { case (rows, budget) =>
      val df = rows.toDF("doc_id", "source", "text")
      val out = AnalyticsOps
        .sequencePack(df, "doc_id", "source", "text", budget)
        .as[(String, Long, Long, Long)].collect()
      val tokens = rows.map(_._3.split(" ").length.toLong)
      assert(out.map(_._4).sum == tokens.sum, "token conservation")
      // recompute shard assignment per group sequentially
      val expected = rows.groupBy(_._2).flatMap { case (g, ds) =>
        var before = 0L
        ds.sortBy(_._1).map { case (_, _, text) =>
          val n = text.split(" ").length.toLong
          val shard = before / budget
          before += n
          (g, shard, n)
        }
      }.groupBy(t => (t._1, t._2))
        .map { case ((g, s), ts) =>
          (g, s, ts.size.toLong, ts.map(_._3).sum) }.toSet
      assert(out.toSet == expected, s"budget=$budget")
      // global variant obeys the same law over the one stream
      val g = AnalyticsOps.sequencePackGlobal(df, "doc_id", "text",
        budget, bucketWidth = 7L)
        .as[(Long, Long, Long)].collect()
      var before = 0L
      val gExpected = rows.sortBy(_._1).map { case (_, _, text) =>
        val n = text.split(" ").length.toLong
        val shard = before / budget; before += n; (shard, n)
      }.groupBy(_._1).map { case (s, ts) =>
        (s, ts.size.toLong, ts.map(_._2).sum) }.toSet
      assert(g.toSet == gExpected, s"global budget=$budget")
    }
  }

  test("property: robots parse — disallowed paths deny (incl. subpaths)") {
    val pathGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map("/" + _.mkString))
      .map(_.distinct)
    samples(pathGen).foreach { paths =>
      val txt = "User-agent: *\n" +
        paths.map(p => s"Disallow: $p").mkString("\n")
      val rules = graft.ingest.RobotsChecker.parse(txt)
      paths.foreach { p =>
        assert(!rules.canFetch("AnyBot", p))
        assert(!rules.canFetch("AnyBot", p + "/sub"))
      }
      // digit-leading path can't prefix-match letter-only rules
      assert(rules.canFetch("AnyBot", "/0"))
    }
  }

  test("property: asofJoin equals the naive per-row latest-at-or-before scan") {
    import java.sql.Timestamp
    val tsGen = Gen.chooseNum(0L, 40L)
    val evGen = Gen.listOf(Gen.zip(keyGen, tsGen))
    samples(Gen.zip(evGen, evGen), n = 6).foreach {
      case (leftRows, rightRows) =>
        val left = leftRows.zipWithIndex.map { case ((k, t), i) =>
          (i.toLong, k, new Timestamp(t * 1000L))
        }
        val right = rightRows.zipWithIndex.map { case ((k, t), i) =>
          (1000L + i, k, new Timestamp(t * 1000L))
        }
        val naive = left.map { case (lid, k, lt) =>
          val cand = right.filter(r => r._2 == k && !r._3.after(lt))
          // max (ts, id) — the oracle's (ts DESC, id DESC LIMIT 1)
          lid -> cand.sortBy(r => (r._3.getTime, r._1)).lastOption
            .map(_._1).getOrElse(-1L)
        }.toMap
        val lDf = left.toDF("lid", "k", "ts")
        val rDf = right.toDF("rid", "k", "ts")
          .select(col("k"), col("ts"), col("rid"))
        val got = SkewOps.asofJoin(lDf, rDf, "k", "ts", "ts",
            rightPayload = Seq("rid"), tiebreakCol = "rid")
          .select("lid", "rid")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
        assert(got == naive,
          s"left=$left right=$right got=$got want=$naive")
    }
  }

  test("property: fuzzyPairs equals brute-force levenshtein ≤ 1 " +
      "over all pairs") {
    val strGen = Gen.listOfN(5,
      Gen.chooseNum(0, 3).map(i => "abcd".charAt(i).toString))
      .map(_.mkString) // small alphabet/length → collisions guaranteed
    val setGen = Gen.listOfN(10, strGen)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(setGen, n = 5).foreach { strs =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val want = (for {
        (sa, a) <- strs.zipWithIndex; (sb, b) <- strs.zipWithIndex
        if a < b && lev(sa, sb) <= 1
      } yield (a.toLong, b.toLong, lev(sa, sb))).toSet
      val got = DedupOps.fuzzyPairs(rows.toDF("id", "s"), "id", "s")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"strs=$strs got=$got want=$want")
    }
  }

  test("property: twoLevelRunningSum equals the direct window for " +
      "random keys/timestamps, slice width included") {
    import java.sql.Timestamp
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{round => sqlRound, sum => sqlSum}
    val rowGen = Gen.listOf(Gen.zip(keyGen,
      Gen.chooseNum(0L, 500000L), Gen.chooseNum(0L, 50L)))
    samples(rowGen, n = 5).foreach { rs =>
      val rows = rs.zipWithIndex.map { case ((k, t, v), i) =>
        (k, new Timestamp(t), i.toLong, v.toDouble) }
      if (rows.nonEmpty) {
        val df = rows.toDF("user_id", "ts", "event_id", "value")
        // 100 s slices → many slice boundaries inside 500 s of data
        val got = SkewOps.twoLevelRunningSum(df, "user_id", "ts",
            "event_id", "value", sliceMillis = 100000L)
          .as[(Long, Long, Timestamp, Double)].collect().toSeq
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val direct = df.select(col("user_id"), col("event_id"),
            col("ts"),
            sqlRound(sqlSum(col("value")).over(w), 6)
              .as("running_value"))
          .orderBy(col("user_id").asc, col("ts").asc,
            col("event_id").asc)
          .as[(Long, Long, Timestamp, Double)].collect().toSeq
        assert(got == direct)
      }
    }
  }

  test("property: bpeApply equals bpeEncode on random corpora for " +
      "learned vocabs") {
    val docGen = Gen.listOfN(8, Gen.chooseNum(0, 2)
      .map(i => "xyz".charAt(i).toString)).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(12, docGen)
    samples(corpusGen, n = 4).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val iters = 3
      val merges = TextOps.learnedMerges(df, "text", iters)
      val applied = TextOps.bpeApply(df, "doc_id", "text", merges)
        .as[(Long, Long, Long)].collect().toSeq
      val relational = TextOps.bpeEncode(df, "doc_id", "text", iters)
        .as[(Long, Long, Long)].collect().toSeq
      assert(applied == relational, s"docs=$docs")
    }
  }

  test("property: fuzzyPairs handles EMPTY strings via the explicit " +
      "deletion path (round-8 advice guard)") {
    // lengths 0–3 over a 2-char alphabet: empty strings and 1-char
    // neighbours of "" are guaranteed in most samples
    val strGen = Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b")).map(_.mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(Gen.listOfN(8, strGen), n = 5).foreach { strs =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val want = (for {
        (sa, a) <- strs.zipWithIndex; (sb, b) <- strs.zipWithIndex
        if a < b && lev(sa, sb) <= 1
      } yield (a.toLong, b.toLong, lev(sa, sb))).toSet
      val got = DedupOps.fuzzyPairs(rows.toDF("id", "s"), "id", "s")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"strs=$strs got=$got want=$want")
    }
  }

  test("property: canonicalizeUrl is idempotent; scheme-aware ports") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
      host <- Gen.oneOf("Example.COM", "a.b.io")
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/p", "/d/9")
      params <- Gen.someOf(
        Seq("b=2", "a=1", "utm_source=x", "utm_c=1")).map(_.toList)
      frag <- Gen.oneOf("", "#frag")
    } yield scheme + "://" + host + port + path +
      (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag
    samples(Gen.listOfN(25, urlGen), n = 4).foreach { urls =>
      val once = urls.toDF("u")
        .select(TextOps.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect().toSeq
      val twice = once.toDF("c")
        .select(TextOps.canonicalizeUrl(col("c")).as("c"))
        .as[String].collect().toSeq
      assert(once == twice, s"not idempotent: $urls")
      urls.zip(once).foreach { case (u, c) =>
        // only the scheme's own default port may be stripped
        if (u.toLowerCase.startsWith("http://") && u.contains(":443"))
          assert(c.contains(":443"), s"$u -> $c dropped a real port")
        if (u.toLowerCase.startsWith("https://") && u.contains(":8080"))
          assert(c.contains(":8080"), s"$u -> $c dropped a real port")
        assert(!c.contains("#") && !c.contains("utm_"), s"$u -> $c")
      }
    }
  }

  test("property: scrubPii leaves zero matches and is idempotent") {
    val word = Gen.oneOf("data", "spark", "rows", "scan")
    val pii = Gen.oneOf("bob@mail.com", "x.y-9@a.io", "555-123-4567",
      "10.0.0.1", "192.168.3.44", "me@sub.domain.org")
    val textGen = Gen.listOfN(8, Gen.frequency(3 -> word, 2 -> pii))
      .map(_.mkString(" "))
    samples(Gen.listOfN(12, textGen), n = 4).foreach { texts =>
      val df = texts.toDF("t")
      val out = df.select(
          TextOps.scrubPii(col("t")).as("s"))
        .select(col("s"),
          TextOps.piiMatchCount(col("s")).as("left"),
          TextOps.scrubPii(col("s")).as("s2"))
        .collect()
      out.foreach { r =>
        assert(r.getLong(1) == 0L, s"PII left in: ${r.getString(0)}")
        assert(r.getString(0) == r.getString(2), "scrub not idempotent")
      }
    }
  }

  // --- round-16 rewrites: the unicode claims the fixes rest on ---

  /** Tokens are whatever space-splitting yields -- including unicode,
    * surrogate pairs, and replacement chars; the round-16 bigram
    * rewrite claims the struct-key zip_with stream counts exactly
    * what the old concat_ws string stream counted.
    */
  private val uniTok = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty),
    Gen.oneOf("\ud83d\ude00" /* U+1F600, supplementary */,
      "\ue000" /* private use, BMP */,
      "\ufffd", "\u4e2d\u6587", "\u00e9", "\u00df"))
  private val uniText =
    Gen.listOf(uniTok).map(_.mkString(" "))
  private val uniDocs = Gen.listOf(Gen.zip(
    Gen.oneOf("s1", "s2"), uniText))

  test("property: ngramDiversity struct-key stream == concat-key stream (unicode incl. surrogates)") {
    import org.apache.spark.sql.functions._
    samples(uniDocs.suchThat(_.nonEmpty)).foreach { docs =>
      val df = docs.toDF("source", "text")
      val got = TextOps.ngramDiversity(df, "source", "text")
        .collect().map(_.toString).toSeq
      // reference: the pre-round-16 concat_ws form
      val w = split(col("text"), " ")
      val pairs = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
        .otherwise(array().cast("array<string>"))
      val ref = df.select(col("source"), explode(pairs).as("bg"))
        .groupBy(col("source"), col("bg"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).cast("long").as("n_bigrams"))
        .select(col("source"), col("n_types"), col("n_bigrams"),
          round(col("n_types").cast("double") /
            col("n_bigrams").cast("double"), 6).as("ttr"))
        .orderBy(col("source").asc)
        .collect().map(_.toString).toSeq
      assert(got == ref)
    }
  }

  test("property: UTF-8 byte sort == Spark sort_array (code-point order)") {
    import org.apache.spark.sql.functions._
    // the l13 fix sorts expansion terms driver-side by UTF-8 bytes,
    // claiming equality with the old in-plan sort_array -- including
    // the supplementary-plane case UTF-16 ordering inverts
    val lists = samples(Gen.listOf(uniTok), n = 8) :+
      List("\ue000", "\ud83d\ude00", "z", "\u4e2d\u6587")
    def utf8Sort(toks: List[String]): List[String] =
      toks.sortWith((x, y) =>
        java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"),
          y.getBytes("UTF-8")) < 0)
    lists.filter(_.nonEmpty).foreach { toks =>
      val sparkOrder = Seq(toks).toDF("a")
        .select(sort_array(col("a")).as("s"))
        .collect()(0).getSeq[String](0).toList
      assert(utf8Sort(toks) == sparkOrder,
        s"utf8=${utf8Sort(toks)} spark=$sparkOrder")
    }
    // explicit witness of the divergence the fix closes: UTF-16
    // code-unit order puts the surrogate pair (0xD83D...) BELOW
    // U+E000; code-point order is the other way around
    val t = List("\ue000", "\ud83d\ude00")
    assert(t.sorted == List("\ud83d\ude00", "\ue000"))
    assert(utf8Sort(t) == List("\ue000", "\ud83d\ude00"))
  }
}
