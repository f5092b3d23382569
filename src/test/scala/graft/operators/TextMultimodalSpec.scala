package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: counts and means per lang") {
    val df = Seq(
      (1L, "a b c", "en", 5L), (2L, "d e", "en", 3L),
      (3L, "x y z w", "de", 7L)).toDF("doc_id", "text", "lang", "n_chars")
    val out = TextOps.tokenStats(df, "lang", "text", "n_chars")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(
      ("de", 1L, 4L, 4.0, 7.0), ("en", 2L, 5L, 2.5, 4.0)))
  }

  test("qualityScore: bounded, diverse text beats repetitive text") {
    val df = Seq(
      (1L, "unique words every single token here", 36L),
      (2L, "the the the the the the", 23L)).toDF("doc_id", "text", "n_chars")
    val out = TextOps.qualityScore(df, "doc_id", "text", "n_chars", 10)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L))
  }

  test("langId: stopword profiles route predictions deterministically") {
    val df = Seq(
      ("en", "the cat sat on a mat"),
      ("de", "der hund und die katze"),
      ("fr", "le chat et la souris"),
      ("zz", "xyzzy plugh")).toDF("lang", "text")
    val preds = TextOps.langId(df, "lang", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(preds("en") == "en")
    assert(preds("de") == "de")
    assert(preds("fr") == "fr")
    assert(preds("zz") == "und")
  }

  test("fingerprints: stable under whitespace/case noise") {
    val df = Seq(
      (1L, "Alpha Beta  Gamma Delta Epsilon Zeta Eta Theta Iota"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val fp = TextOps.fingerprints(df, "doc_id", "text")
      .as[(Long, String, String)].collect()
    assert(fp(0)._2 == fp(1)._2) // content hash identical
    assert(fp(0)._3 == fp(1)._3) // prefix hash identical
  }

  test("regexTokens: splits letter and digit runs, drops punctuation") {
    val df = Seq("Hello, world42! x7").toDF("t")
    val toks = df.select(TextOps.regexTokens(col("t")))
      .head.getSeq[String](0)
    assert(toks == Seq("hello", "world", "42", "x", "7"))
  }

  test("rollingHash: order-sensitive, deterministic, null on empty") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), (4L, "")).toDF("id", "text")
    val fps = TextOps.rollingFingerprints(df, "id", "text").collect()
    assert(fps(0).getLong(1) == fps(1).getLong(1)) // same text
    assert(fps(0).getLong(1) != fps(2).getLong(1)) // reordered words
    assert(fps(3).isNullAt(1)) // empty doc
  }

  test("resizeStub/resizeAssets: byte budget respected, others untouched") {
    val big = ("x" * 500).getBytes("UTF-8")
    val small = "tiny".getBytes("UTF-8")
    assert(MultimodalOps.resizeStub(big, 64).length == 64)
    assert(MultimodalOps.resizeStub(small, 64).toSeq == small.toSeq)
    val docs = Tables.documents(spark, sfSmoke).limit(30)
    val resized = MultimodalOps.resizeAssets(
      MultimodalOps.assetsFromDocuments(spark, docs), 64).collect()
    resized.foreach { a =>
      if (a.kind == "image") {
        assert(a.bytes.length <= 64)
        assert(a.width.contains(64))
      } else assert(a.width.isEmpty)
    }
  }

  test("encodePngGray/decodeImagePixels: real ImageIO codec " +
      "round-trips bytes exactly; payload is a genuine PNG") {
    val data = (0 until 2048).map(i => ((i * 37 + 11) % 256).toByte)
      .toArray
    val png = MultimodalOps.encodePngGray(data)
    // PNG magic: 89 50 4E 47 0D 0A 1A 0A
    assert(png.take(8).toSeq == Seq(0x89, 0x50, 0x4E, 0x47,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    assert(MultimodalOps.decodeImagePixels(png).toSeq == data.toSeq)
    assert(MultimodalOps.encodePngGray(Array.emptyByteArray).isEmpty)
  }

  test("encodeWavPcm/decodeAudioSamples: real javax.sound codec " +
      "round-trips bytes exactly; payload is a genuine WAV") {
    val data = (0 until 3000).map(i => ((i * 53 + 5) % 256).toByte)
      .toArray
    val wav = MultimodalOps.encodeWavPcm(data)
    // RIFF....WAVE container magic
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(MultimodalOps.decodeAudioSamples(wav).toSeq == data.toSeq)
    assert(MultimodalOps.encodeWavPcm(Array.emptyByteArray).isEmpty)
  }

  test("piiScrub: typed redaction counts; seal is order-independent") {
    val rows = Seq(
      ("s1", "mail me at john.doe+x@site.org today"),
      ("s1", "call 555-123-4567 or 555.987.6543 now"),
      ("s2", "host 10.0.0.1 and no pii here"))
    val a = TextOps.piiScrub(rows.toDF("source", "text"),
      "text", "source").collect()
    val s1 = a.find(_.getString(0) == "s1").get
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3),
      s1.getLong(4)) == ((2L, 1L, 2L, 0L)))
    val s2 = a.find(_.getString(0) == "s2").get
    assert((s2.getLong(1), s2.getLong(2), s2.getLong(3),
      s2.getLong(4)) == ((1L, 0L, 0L, 1L)))
    // the mod-p seal must not depend on row arrival order
    val b = TextOps.piiScrub(rows.reverse.toDF("source", "text"),
      "text", "source").collect()
    assert(a.map(_.toString).sorted.toSeq ==
      b.map(_.toString).sorted.toSeq)
    // a scrubbed corpus seals differently from the raw one
    val raw = TextOps.piiScrub(Seq(("s2", "host REDACTED and no pii " +
      "here")).toDF("source", "text"), "text", "source").collect()
    assert(raw.head.getLong(5) != s2.getLong(5))
  }

  test("encodeAviPng/decodeAviFrames: real RIFF/AVI container " +
      "round-trips; frames split on the stride; tail kept partial") {
    val data = (0 until 250).map(i => ((i * 31 + 7) % 256).toByte)
      .toArray
    val avi = MultimodalOps.encodeAviPng(data, stride = 100)
    // RIFF....AVI container magic + the movi frame list
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    assert(new String(avi, "ISO-8859-1").contains("movi"))
    assert(new String(avi, "ISO-8859-1").contains("MPNG"))
    val frames = MultimodalOps.decodeAviFrames(avi)
    assert(frames.map(_.length) == Seq(100, 100, 50))
    // lossless: concatenated frames reproduce the input exactly
    assert(frames.toArray.flatten.toSeq == data.toSeq)
    // each frame chunk is a genuine PNG (decoded via ImageIO)
    assert(frames.head.toSeq == data.take(100).toSeq)
    assert(MultimodalOps.encodeAviPng(Array.emptyByteArray, 100).isEmpty)
    assert(MultimodalOps.decodeAviFrames(Array.emptyByteArray)
      .map(_.length) == Seq(0))
  }

  test("sampleFramesDecoded == sampleFrames over raw bytes " +
      "(container+codec are transparent to the sampler)") {
    val docs = Tables.documents(spark, sfSmoke).limit(60)
    val raw = MultimodalOps.frameStats(MultimodalOps.sampleFrames(
        MultimodalOps.assetsFromDocuments(spark, docs),
        stride = MultimodalOps.VideoStride)).collect().toSeq
    val real = MultimodalOps.frameStats(
      MultimodalOps.sampleFramesDecoded(
        MultimodalOps.assetsWithPngImages(spark, docs),
        stride = MultimodalOps.VideoStride)).collect().toSeq
    assert(raw.map(_.toString) == real.map(_.toString))
  }

  test("short video (below one stride) keeps its single partial frame") {
    val data = (0 until 48).map(_.toByte).toArray
    val avi = MultimodalOps.encodeAviPng(data, stride = 100)
    val frames = MultimodalOps.decodeAviFrames(avi)
    assert(frames.map(_.length) == Seq(48))
  }

  test("extractCountsDecoded over PNG assets equals extractCounts " +
      "over raw assets (codec is lossless)") {
    val docs = Tables.documents(spark, sfSmoke).limit(60)
    val raw = MultimodalOps.extractCounts(
        MultimodalOps.assetsFromDocuments(spark, docs))
      .collect().map(c => c.asset_id ->
        ((c.kind, c.n_bytes, c.bins.toSeq))).toMap
    val dec = MultimodalOps.extractCountsDecoded(
        MultimodalOps.assetsWithPngImages(spark, docs))
      .collect().map(c => c.asset_id ->
        ((c.kind, c.n_bytes, c.bins.toSeq))).toMap
    assert(dec == raw && raw.nonEmpty)
    // and the stored image payloads really are compressed containers,
    // not the raw bytes re-labeled
    val pngAsset = MultimodalOps.assetsWithPngImages(spark, docs)
      .filter(_.kind == "image").head()
    assert(pngAsset.bytes.take(4).toSeq ==
      Seq(0x89.toByte, 0x50.toByte, 0x4E.toByte, 0x47.toByte))
  }

  test("canonicalizeUrl: case, default ports, fragments, utm params, " +
      "param order — all normalized; the rest preserved") {
    val cases = Seq(
      // messy variant -> canonical
      ("HTTPS://ExAmple.COM:443/d/7?utm_source=f&b=2&a=1#x",
        "https://example.com/d/7?a=1&b=2"),
      ("http://Host:80/p", "http://host/p"),
      ("http://host:8080/p", "http://host:8080/p"), // non-default kept
      ("https://h/p?utm_a=1&utm_b=2", "https://h/p"), // all filtered
      ("https://h/Path/Case?z=1", "https://h/Path/Case?z=1"), // path case kept
      ("https://h/p#only-frag", "https://h/p"))
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), s"$got")
  }

  test("decodeStub: deterministic, L1-normalized histogram") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val f1 = MultimodalOps.decodeStub(bytes)
    val f2 = MultimodalOps.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures: one feature row per asset, bytes preserved") {
    val docs = Tables.documents(spark, sfSmoke).limit(50)
    val assets = MultimodalOps.assetsFromDocuments(spark, docs)
    val feats = MultimodalOps.extractFeatures(assets)
    assert(feats.count() == 50)
    val row = feats.filter(_.asset_id == 0L).head()
    val expectedLen = docs.filter(col("doc_id") === 0L)
      .select(octet_length(encode(col("text"), "UTF-8")))
      .head().getInt(0)
    assert(row.n_bytes == expectedLen.toLong)
    assert(row.features.length == 16)
  }

  test("sampleFrames: video assets explode into strided frames") {
    val docs = Tables.documents(spark, sfSmoke).limit(30)
    val assets = MultimodalOps.assetsFromDocuments(spark, docs)
    val frames = MultimodalOps.sampleFrames(assets, stride = 64)
    val videos = assets.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    val expected = videos.map(a => math.max(1, a.bytes.length / 64)).sum
    assert(frames.count() == expected.toLong)
    // frame indices are dense from 0 per asset
    val byAsset = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), min("frame_idx").as("mn"),
        max("frame_idx").as("mx")).collect()
    byAsset.foreach { r =>
      assert(r.getInt(2) == 0 && r.getInt(3) == r.getLong(1) - 1)
    }
  }

  test("frameStats: rollup matches per-video frame arithmetic") {
    val docs = Tables.documents(spark, sfSmoke).limit(30)
    val assets = MultimodalOps.assetsFromDocuments(spark, docs)
    val row = MultimodalOps.frameStats(
      MultimodalOps.sampleFrames(assets, stride = 64)).head
    val videos = assets.filter(_.kind == "video").collect()
    val frames = videos.map(a => math.max(1, a.bytes.length / 64))
    val covered = videos.map(a =>
      math.min(a.bytes.length, math.max(1, a.bytes.length / 64) * 64))
    assert(row.getLong(0) == videos.length.toLong)
    assert(row.getLong(1) == frames.sum.toLong)
    assert(row.getLong(2) == covered.map(_.toLong).sum)
  }

  test("featureStats: typed rollup per kind") {
    val docs = Tables.documents(spark, sfSmoke).limit(30)
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.assetsFromDocuments(spark, docs))
    val stats = MultimodalOps.featureStats(feats).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 30L)
  }

  test("extractCounts/histogramStats: integer bins conserve byte totals") {
    val docs = Tables.documents(spark, sfSmoke).limit(40)
    val counts = MultimodalOps.extractCounts(
      MultimodalOps.assetsFromDocuments(spark, docs))
    // bins partition the byte range: per asset they sum to n_bytes
    counts.collect().foreach { c =>
      assert(c.bins.sum == c.n_bytes, s"bins must partition bytes: $c")
    }
    val stats = MultimodalOps.histogramStats(counts).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val totalBytes = stats.map(_.getLong(2)).sum
    assert(totalBytes == counts.collect().map(_.n_bytes).sum)
  }

  test("repetitionScore: repeated text scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six"),
      (3L, "a b")).toDF("doc_id", "text")
    val rows = TextOps.repetitionScore(df, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1L)._1 > 0.7, "all-identical trigrams → high dup ratio")
    assert(rows(1L)._2 == 1.0, "one token dominates completely")
    assert(rows(2L)._1 == 0.0 && rows(2L)._2 < 0.2)
    assert(rows(3L)._1 == 0.0, "docs shorter than a trigram score 0")
  }

  test("graft_token_mode repetitionScore equals the aggregate twin") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val fast = TextOps.repetitionScore(docs, "doc_id", "text", 1000)
      .collect().map(_.toString).toSeq
    val ref = TextOps.repetitionScoreAgg(docs, "doc_id", "text", 1000)
      .collect().map(_.toString).toSeq
    assert(fast == ref)
  }

  test("crossCorpusOverlap flags a benchmark doc duplicated in the corpus") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contaminated
      (2L, "totally different words here indeed friends"))
      .toDF("doc_id", "text")
    val hits = graft.operators.DedupOps.crossCorpusOverlap(
      bench, corpus, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((100L, 1L, 4L)),
      s"exact duplicate must be flagged with all 4 trigrams: ${hits.toSeq}")

    // banded tier: finds the same duplicate (J=1 → identical
    // signatures → candidate in every band), with the same count
    val banded = graft.operators.DedupOps.crossCorpusOverlapBanded(
      bench, corpus, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(banded.toSeq == Seq((100L, 1L, 4L)))
  }

  test("banded decontamination is a subset of the exact tier (real docs)") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val exact = graft.operators.DedupOps.crossCorpusOverlap(
      bench, corpus, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val banded = graft.operators.DedupOps.crossCorpusOverlapBanded(
      bench, corpus, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(banded.subsetOf(exact),
      s"banded pairs must verify exactly: ${banded -- exact}")
    // high-overlap contamination (the near-dup tier targets it) is kept
    val strong = exact.filter(_._3 >= 10)
    assert(strong.subsetOf(banded),
      s"planted near-dups must survive banding: ${strong -- banded}")
  }

  test("lmScore: hand-computed unigram log-probs; common beats rare") {
    // corpus: a×3, b×2 → N=5; P(a)=3/5, P(b)=2/5
    val df = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.lmScore(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    val lpA = math.log(3.0 / 5.0)
    val lpB = math.log(2.0 / 5.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, 3L, r6((2 * lpA + lpB) / 3)),
      (2L, 2L, r6((lpA + lpB) / 2))))
    // doc of only the most common token scores highest
    val df2 = Seq((1L, "a a"), (2L, "b z"), (3L, "a z")).toDF("doc_id", "text")
    val s = TextOps.lmScore(df2, "doc_id", "text")
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(3L) && s(3L) > s(2L))
  }

  test("bigramLmScore: conditional probs; short docs drop out") {
    // bigrams: doc1 = (a,b), (b,a); doc2 = (a,b); doc3 = none (1 token)
    // c(a,b)=2 c(b,a)=1; prefixes: c(a·)=2, c(b·)=1
    // P(b|a)=1, P(a|b)=1 → all logp 0 except... ln(2/2)=0, ln(1/1)=0
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.0), (2L, 1L, 0.0)))
    // the rare continuation of a shared prefix scores below the
    // common one: c(the,cat)=3, c(the,dog)=1, c(the·)=4
    val df2 = Seq((1L, "the cat sat"), (2L, "the cat sat"),
      (3L, "the cat sat"), (4L, "the dog sat")).toDF("doc_id", "text")
    val s = TextOps.bigramLmScore(df2, "doc_id", "text")
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(s(4L) < s(1L), s"rare continuation must score lower: $s")
  }

  test("boilerplate: template shingles flagged, unique text clean") {
    // 10 docs: 8 share the template "sign up to our newsletter now"
    // (its 3-grams hit df=8 >= ceil(10 * 0.3) = 3); each doc also has
    // a unique tail so no doc is pure template. Docs 9/10 are fully
    // unique -> ratio 0.
    val tmpl = "sign up to our newsletter now"
    val docs = (1 to 8).map(i =>
      (i.toLong, "g1", s"$tmpl unique$i tail$i words$i here$i")) ++
      Seq((9L, "g2", "nine alpha beta gamma delta epsilon"),
        (10L, "g2", "ten zeta eta theta iota kappa"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = TextOps.boilerplate(df, "doc_id", "source", "text",
      relDf = 0.3, flagRatio = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // g1 docs: 10 tokens -> 8 distinct shingles, 4 from the template
    // (df=8) -> ratio 0.5 >= 0.3 flagged; g2: all shingles df=1.
    assert(out("g1")._1 == 8L && out("g2")._1 == 2L)
    assert(out("g1")._2 == 0.5 && out("g1")._3 == 8L)
    assert(out("g2")._2 == 0.0 && out("g2")._3 == 0L)
    // deterministic on real data + ratio bounds
    val corpus = Tables.documents(spark, sfSmoke)
    val a = TextOps.boilerplate(corpus, "doc_id", "source", "text",
      0.003, 0.2).collect()
    a.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) }
    val b = TextOps.boilerplate(corpus, "doc_id", "source", "text",
      0.003, 0.2).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("gopherGate: each rule fires independently; counts conserve") {
    // one doc per failure mode + one clean pass, all in one group.
    val pass = (1 to 30).map(i => s"tok$i").mkString(" ") +
      " the a of and" // 34 tokens, >=2 stopwords, all distinct
    val shortDoc = "the a of and tiny" // 5 tokens -> fails len only...
    val repet = (1 to 30).map(_ => "spam").mkString(" ") +
      " the a of and distinct" // modal share 30/35 -> fails rep
    val thin = (1 to 30).map(i => s"w$i").mkString(" ") +
      " the a of and" // mean word len (2-3 chars) < 4.25 -> wordlen
    val noStop = (1 to 30).map(i => s"token$i").mkString(" ")
    def row(id: Long, t: String) = (id, "g", t, t.length.toLong)
    val df = Seq(row(1, pass), row(2, shortDoc), row(3, repet),
      row(4, thin), row(5, noStop)).toDF(
      "doc_id", "source", "text", "n_chars")
    val r = TextOps.gopherGate(df, "source", "text", "n_chars")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    val (_, nDocs, nPass, fLen, fWord, fStop, fRep) = r
    assert(nDocs == 5L && nPass == 1L)
    assert(fLen == 1L)  // only the 5-token doc
    assert(fWord >= 1L) // the thin-words doc (short doc may too)
    assert(fStop == 1L) // only the no-stopword doc
    assert(fRep == 1L)  // only the spam doc
    // real corpus: failures never exceed docs; pass <= docs - fails
    TextOps.gopherGate(Tables.documents(spark, sfSmoke), "source",
      "text", "n_chars").collect().foreach { row =>
      val d = row.getLong(1)
      (2 to 6).foreach(i => assert(row.getLong(i) <= d))
      assert(row.getLong(2) + (3 to 6).map(row.getLong).max <= d)
    }
  }

  test("mixtureWeights: junk sources get zero mass; weights sum to 1") {
    val clean1 = (1 to 30).map(i => s"tok$i").mkString(" ") +
      " the a of and"
    val clean2 = (1 to 50).map(i => s"item$i").mkString(" ") +
      " the a of and"
    val junk = (1 to 30).map(_ => "spam").mkString(" ")
    def row(id: Long, src: String, t: String) =
      (id, src, t, t.length.toLong)
    val df = Seq(row(1, "gA", clean1), row(2, "gA", junk),
      row(3, "gB", clean2), row(4, "gC", junk)).toDF(
      "doc_id", "source", "text", "n_chars")
    val out = TextOps.mixtureWeights(df, "source", "text", "n_chars")
      .as[(String, Long, Long, Double)].collect().toSeq
    val bySrc = out.map(r => r._1 -> r).toMap
    assert(bySrc("gC")._3 == 0L && bySrc("gC")._4 == 0.0)
    assert(bySrc("gA")._3 == 34L && bySrc("gB")._3 == 54L)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5)
    assert(bySrc("gB")._4 > bySrc("gA")._4) // more clean tokens
    // real corpus: deterministic, weights normalized
    val corpus = Tables.documents(spark, sfSmoke)
    val a = TextOps.mixtureWeights(corpus, "source", "text", "n_chars")
      .collect().toSeq
    assert(a == TextOps.mixtureWeights(corpus, "source", "text",
      "n_chars").collect().toSeq)
    assert(math.abs(a.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("classifierGate: clean text outscores spam; mean is exact") {
    val clean = (1 to 24).map(i => s"wordwordw$i").mkString(" ") +
      " the a of and is in the a of and is in"
    val spam = (1 to 40).map(_ => "buy").mkString(" ")
    def row(id: Long, src: String, t: String) =
      (id, src, t, t.length.toLong)
    val df = Seq(row(1, "gA", clean), row(2, "gB", spam))
      .toDF("doc_id", "source", "text", "n_chars")
    val out = TextOps.classifierGate(df, "source", "text", "n_chars")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("gA")._3 == 1L, s"clean doc must pass: $out")
    assert(out("gB")._3 == 0L, s"spam must fail: $out")
    assert(out("gA")._4 > out("gB")._4)
    // scores are 6-dp quantized (micro-unit exact summation)
    out.values.foreach(r => assert(
      math.abs(r._4 * 1e6 - math.round(r._4 * 1e6)) < 1e-3, r))
    // real corpus: deterministic, passes strictly between 0 and all
    val corpus = Tables.documents(spark, sfSmoke)
    val a = TextOps.classifierGate(corpus, "source", "text", "n_chars")
      .collect().toSeq
    assert(a == TextOps.classifierGate(corpus, "source", "text",
      "n_chars").collect().toSeq)
    val (pass, docs) =
      (a.map(_.getLong(2)).sum, a.map(_.getLong(1)).sum)
    assert(pass > 0L && pass < docs, s"degenerate gate: $pass/$docs")
  }

  test("assetDedupReport: duplicate payloads counted per kind") {
    // ids 0/3/6 -> image (two share bytes); id 1 -> audio, unique
    val df = Seq((0L, "same text"), (3L, "same text"), (6L, "other"),
      (1L, "x")).toDF("doc_id", "text")
    val rep = MultimodalOps
      .assetDedupReport(MultimodalOps.assetsFromDocuments(spark, df))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep("image") == ((3L, 2L, 1L)), s"$rep")
    assert(rep("audio") == ((1L, 1L, 0L)), s"$rep")
  }

  test("quantileGate: per-source p75 cut passes roughly a quarter") {
    val corpus = Tables.documents(spark, sfSmoke)
    def run() = TextOps.quantileGate(corpus, "source", "text",
      "n_chars", 0.75).collect().toSeq
    val out = run()
    assert(out == run() && out.nonEmpty)
    out.foreach { r =>
      val (n, above) = (r.getLong(1), r.getLong(3))
      // strictly-above an interpolated p75: ~25%, ties only shrink it
      assert(above <= math.ceil(n * 0.30).toLong && above >= 1L,
        s"p75 gate out of band: $r")
    }
    // thresholds are per-source, not one global cut
    assert(out.map(_.getDouble(2)).distinct.size > 1)
  }

  test("dsirWeights: target-like docs outweigh off-target ones") {
    val df = Seq(
      (0L, "t", "apple banana cherry apple banana cherry apple banana"),
      (5L, "t", "apple cherry banana apple cherry banana apple cherry"),
      (1L, "gA", "apple banana cherry apple banana apple cherry banana"),
      (2L, "gB", "xylophone quartz vortex jumble kraken nebula zephyr"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.dsirWeights(df, "doc_id", "source", "text",
      modulus = 5, nBuckets = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // target slice (ids 0, 5) is excluded from the scored set
    assert(out.keySet == Set("gA", "gB"))
    assert(out("gA")._3 > out("gB")._3,
      s"target-vocab doc must outweigh: $out")
    assert(out("gB")._3 < 0.0) // off-target mass scores negative
    // real corpus: deterministic
    val corpus = Tables.documents(spark, sfSmoke)
    def run() = TextOps.dsirWeights(corpus, "doc_id", "source",
      "text", 97, 1024).collect().toSeq
    val a = run()
    assert(a == run() && a.nonEmpty)
  }

  test("pairCounts: hand-built corpus; one-token docs drop out") {
    val df = Seq("a b a b c", "a b", "x").toDF("text")
    val out = TextOps.pairCounts(df, "text", 10)
      .as[(String, Long)].collect().toSeq
    // pairs: doc1 -> (a b),(b a),(a b),(b c); doc2 -> (a b); doc3 none
    assert(out == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    // top-k tiebreak is total-ordered -> deterministic on real data
    val corpus = Tables.documents(spark, sfSmoke)
    val a = TextOps.pairCounts(corpus, "text", 50).collect().toSeq
    assert(a == TextOps.pairCounts(corpus, "text", 50).collect().toSeq)
    assert(a.size == 50)
  }

  test("bpeMergeLoop: merges apply greedily; later counts see them") {
    // iter 1: "a b" wins (4 occurrences, incl. back-to-back). After
    // the merge, doc1 = "a_b a_b c", doc2 = "a_b c" -> iter 2 top is
    // ("a_b c", 2): the rewrite happened BEFORE the recount, and the
    // back-to-back occurrences both merged (the double-replace greedy
    // pass). iter 3 then merges "a_b_c x" (1) by the pair tiebreak.
    val df = Seq("a b a b c x", "a b c", "z z").toDF("text")
    val out = TextOps.bpeMergeLoop(df, "text", 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(out(0) == ((1, "a b", 3L)), s"$out")
    assert(out(1) == ((2, "a_b c", 2L)),
      s"rewrite precedes recount; back-to-back 'a b a b' both merge: $out")
    assert(out(2) == ((3, "a_b a_b_c", 1L)), s"tiebreak: $out")
    // overlapping run "z z z": counting sees BOTH adjacent pairs
    // (standard BPE statistics), but the greedy rewrite merges only
    // the leading occurrence
    val runs = Seq("z z z").toDF("text")
    val r = TextOps.bpeMergeLoop(runs, "text", 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(r(0) == ((1, "z z", 2L)), s"$r")
    assert(r(1) == ((2, "z_z z", 1L)), s"greedy, not double-merge: $r")
    // real corpus: deterministic across runs
    val corpus = Tables.documents(spark, sfSmoke)
    def run() = TextOps.bpeMergeLoop(corpus, "text", 3)
      .as[(Int, String, Long)].collect().toSeq
    val first = run()
    assert(first == run() && first.size == 3)
    // each iteration's winning count never increases (a merge can only
    // remove occurrences of other pairs, and the max is the max)
    assert(first.map(_._3) == first.map(_._3).sorted.reverse, s"$first")
  }

  test("bpeEncode: learned merges tokenize every doc; counts exact") {
    // same corpus as the bpeMergeLoop test -> merges are
    // 1:"a b", 2:"a_b c", 3:"a_b a_b_c" (all three APPLIED here)
    val df = Seq((1L, "a b a b c x"), (2L, "a b c"), (3L, "z z"))
      .toDF("doc_id", "text")
    val out = TextOps.bpeEncode(df, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().toSeq
    // doc1: "a b a b c x" -> "a_b a_b c x" -> "a_b a_b_c x"
    //       -> "a_b_a_b_c x": 2 tokens, 1 merged
    // doc2: "a b c" -> "a_b c" -> "a_b_c": 1 token, 1 merged
    // doc3: "z z" untouched: 2 tokens, 0 merged
    assert(out == Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 2L, 0L)), s"$out")
    // real corpus: deterministic; merging can only shrink counts and
    // every doc survives with at least one token
    val corpus = Tables.documents(spark, sfSmoke)
    val enc = TextOps.bpeEncode(corpus, "doc_id", "text", 3)
    val rows = enc.collect().toSeq
    assert(rows == TextOps.bpeEncode(corpus, "doc_id", "text", 3)
      .collect().toSeq)
    assert(rows.size == corpus.count())
    val orig = corpus.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n0"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      val (id, nTok, nMerged) =
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nTok >= 1 && nTok <= orig(id))
      assert(nMerged >= 0 && nMerged <= nTok)
    }
  }

  test("bpeEncode: all-single-token corpus empties the output " +
      "(legacy crossJoin-against-empty contract, pinned)") {
    // No doc has two adjacent tokens, so iteration 1 finds NO pair
    // anywhere and bpeEncode's None branch empties the ENTIRE corpus
    // — parity with the pre-round-17 crossJoin(broadcast(empty top))
    // form, where every doc joined against an empty 1-row relation.
    // Surprising (single-token docs vanish) but INTENTIONAL: this
    // test pins the contract so a refactor can't change it silently
    // (round-17 ADVICE).
    val singles = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    assert(TextOps.bpeEncode(singles, "doc_id", "text", 3)
      .collect().isEmpty)
    // ...and the contract is iteration-1-global: one doc WITH a pair
    // keeps the whole corpus alive (single-token docs included)
    val mixed = Seq((1L, "alpha"), (2L, "x y x y"))
      .toDF("doc_id", "text")
    val out = TextOps.bpeEncode(mixed, "doc_id", "text", 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 0L), (2L, 2L, 2L)), s"$out")
  }

  test("bpeApply: one-scan encode is document-exact vs bpeEncode " +
      "for learned vocabs of several sizes") {
    val corpus = Tables.documents(spark, sfSmoke)
    Seq(1, 3, 5).foreach { iters =>
      val merges = TextOps.learnedMerges(corpus, "text", iters)
      assert(merges.size == iters)
      val applied = TextOps.bpeApply(corpus, "doc_id", "text", merges)
        .as[(Long, Long, Long)].collect().toSeq
      val relational = TextOps
        .bpeEncode(corpus, "doc_id", "text", iters)
        .as[(Long, Long, Long)].collect().toSeq
      assert(applied == relational, s"diverged at iters=$iters")
    }
  }

  test("bpeApply: separator-consuming pass semantics (odd runs) and " +
      "rank-ordered application") {
    // " a a a a a ": replace pass 1 merges pairs (0,1) and (3,4) —
    // the token after a merge cannot OPEN a match — pass 2 takes the
    // stranded middle pair. 5 a's -> [a_a, a_a, a]: 3 tokens.
    val runs = Seq((1L, "a a a a a")).toDF("doc_id", "text")
    val got = TextOps.bpeApply(runs, "doc_id", "text",
        Seq(("a", "a"))).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L)), s"$got")
    // rank order matters: ("a b" then "a_b c") chains; the reverse
    // list finds no "a_b c" adjacency at rank 1
    val doc = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chained = TextOps.bpeApply(doc, "doc_id", "text",
      Seq(("a", "b"), ("a_b", "c"))).as[(Long, Long, Long)].collect()
    assert(chained.toSeq == Seq((1L, 1L, 1L)))
    val reversed = TextOps.bpeApply(doc, "doc_id", "text",
      Seq(("a_b", "c"), ("a", "b"))).as[(Long, Long, Long)].collect()
    assert(reversed.toSeq == Seq((1L, 2L, 1L)))
  }

  test("bpeApplyTokens: the encoded artifact is consistent with " +
      "bpeApply's counts, doc for doc") {
    val corpus = Tables.documents(spark, sfSmoke)
    val merges = TextOps.learnedMerges(corpus, "text", 4)
    val seqs = TextOps.bpeApplyTokens(corpus, "doc_id", "text", merges)
      .as[(Long, String)].collect().toMap
    val counts = TextOps.bpeApply(corpus, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(counts.nonEmpty)
    counts.foreach { case (id, nTok, nMerged) =>
      val toks = seqs(id).split(" ", -1)
      assert(toks.length.toLong == nTok, s"doc $id")
      assert(toks.count(_.contains("_")).toLong == nMerged, s"doc $id")
    }
  }

  test("bpeApply: vocab size changes neither results nor scan count") {
    val corpus = Tables.documents(spark, sfSmoke)
    val learned = TextOps.learnedMerges(corpus, "text", 3)
    // pad the vocab with 5,000 inapplicable merges (realistic: most
    // of a 50k vocab never fires on any one document) — output must
    // be identical, and the job stays ONE corpus scan
    val padded = learned ++ (1 to 5000).map(i => (s"__v$i", s"__w$i"))
    val small = TextOps.bpeApply(corpus, "doc_id", "text", learned)
    val big = TextOps.bpeApply(corpus, "doc_id", "text", padded)
    assert(small.collect().toSeq == big.collect().toSeq)
    // AQE prints the final AND initial plans — count only the final
    val plan = big.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = plan.split("Scan parquet").length - 1
    assert(scans == 1, s"expected one corpus scan, got $scans:\n$plan")
  }

  test("chunkSplit: window arithmetic, overlap conservation, clamping") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val eleven = (1 to 11).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, ten), (2L, eleven), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = TextOps.chunkSplit(df, "doc_id", "text",
      chunkTokens = 4, strideTokens = 3)
      .select("doc_id", "chunk_id", "chunk_tok")
      .as[(Long, Long, Long)].collect().toSeq
    // 10 tokens: ceil((10-4)/3)+1 = 3 full chunks [1..4][4..7][7..10];
    // 11 tokens: 4 chunks, last one short ([10..11] = 2 tokens);
    // 2 tokens <= chunk: one whole-doc chunk
    assert(out == Seq(
      (1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L),
      (2L, 0L, 4L), (2L, 1L, 4L), (2L, 2L, 4L), (2L, 3L, 2L),
      (3L, 0L, 2L)), s"$out")
    // chunk hashes: identical windows hash identically, shifted ones
    // don't ([1..4] of doc1 == [1..4] of doc2; [7..10] differs from
    // doc2's [7..10]? no — same prefix — but doc2's last chunk does)
    val hashes = TextOps.chunkSplit(df, "doc_id", "text", 4, 3)
      .select("doc_id", "chunk_id", "chunk_md5")
      .as[(Long, Long, String)].collect()
      .map { case (d, c, h) => (d, c) -> h }.toMap
    assert(hashes((1L, 0L)) == hashes((2L, 0L)))
    assert(hashes((1L, 2L)) == hashes((2L, 2L)))
    assert(hashes((2L, 3L)) != hashes((2L, 2L)))
    // real corpus: token conservation — sum(chunk_tok) recovers
    // n + (nChunks-1)*(chunk-stride) per doc (every adjacent pair of
    // chunks overlaps by exactly chunk-stride tokens)
    val corpus = Tables.documents(spark, sfSmoke)
    val agg = TextOps.chunkSplit(corpus, "doc_id", "text", 64, 48)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), sum(col("chunk_tok")).as("tot"))
      .join(corpus.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n")),
        Seq("doc_id"))
      .as[(Long, Long, Long, Long)].collect()
    assert(agg.nonEmpty)
    agg.foreach { case (id, nc, tot, n) =>
      assert(tot == n + (nc - 1) * (64 - 48), s"doc $id: $nc $tot $n")
    }
  }

  test("langIdEval: per-class precision/recall from the matrix") {
    val df = Seq(
      (1L, "the cat is of the mat", "en"),   // → en (correct)
      (2L, "der hund ist und das", "en"),    // → de (wrong)
      (3L, "der die das und ist", "de"),     // → de (correct)
      (4L, "zzz qqq www", "de"))             // → und (wrong)
      .toDF("doc_id", "text", "lang")
    val out = TextOps.langIdEval(df, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // de: 2 true, 2 predicted (docs 2,3), 1 correct
    assert(out("de") == ((2L, 2L, 1L)))
    // en: 2 true, 1 predicted (doc 1), 1 correct
    assert(out("en") == ((2L, 1L, 1L)))
    // und: prediction-only class
    assert(out("und") == ((0L, 1L, 0L)))
    val de = TextOps.langIdEval(df, "lang", "text")
      .filter(col("class") === "de")
      .select("precision", "recall", "f1")
      .as[(Double, Double, Double)].head()
    assert(de == ((0.5, 0.5, 0.5)))
  }

  test("multimodalPack: cost = tokens + byte-ceil patches; budget cuts") {
    // text of 3 tokens, 11 bytes → cost 3 + ceil(11/4)=3 → 6
    val df = Seq(
      (1L, "a", "aa bb ccccc"),  // 3 tok + ceil(11/4)=3 → 6
      (2L, "a", "dd ee"),        // 2 tok + ceil(5/4)=2  → 4
      (3L, "a", "f"))            // 1 tok + 1            → 2
      .toDF("doc_id", "source", "text")
    // budget 8: doc1 starts at 0 → shard 0 (cum 6); doc2 starts at 6
    // → shard 0 (cum 10); doc3 starts at 10 → shard 1
    val out = MultimodalOps.multimodalPack(df, "doc_id", "source",
        "text", patchBytes = 4, budgetTokens = 8)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 0L, 2L, 10L), ("a", 1L, 1L, 2L)))
  }

  test("ngramDiversity: exact type-token ratio; 1-token docs drop out") {
    val df = Seq(
      (1L, "a a a a", "rep"),       // bigrams: "a a" ×3 → 1 type / 3
      (2L, "a b a b", "mix"),       // "a b","b a","a b" → 2 types / 3
      (3L, "x", "mix"))             // no bigrams
      .toDF("doc_id", "text", "source")
    val out = TextOps.ngramDiversity(df, "source", "text")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("mix", 2L, 3L, 0.666667),
      ("rep", 1L, 3L, 0.333333)))
  }

  test("blocklistGate: flags any-token intersection only") {
    val df = Seq(
      (1L, "clean text here", "s1"),
      (2L, "contains bad token", "s1"),
      (3L, "badly is not bad-token", "s1"), // substring ≠ token
      (4L, "worse stuff", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.blocklistGate(df, "source", "text",
        Seq("bad", "worse"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("s1", 3L, 1L, 2L), ("s2", 1L, 1L, 0L)))
  }

  test("zipfSlope: a perfect 1/rank law fits slope -1 exactly; " +
      "a flat distribution fits slope 0") {
    // source z: freq(a)=6, freq(b)=3, freq(c)=2 -> ln(freq) =
    // ln 6 - ln(rank) exactly, so the OLS slope is exactly -1 and
    // the intercept ln 6; source f: three equal-frequency tokens ->
    // y is constant -> slope 0 (ties rank token-asc).
    val z = "a a a a a a b b b c c"
    val f = "x y w x y w"
    val df = Seq((1L, z, "z"), (2L, f, "f")).toDF("doc_id", "text",
      "source")
    val out = TextOps.zipfSlope(df, "source", "text")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("z")._2 == 3L && out("z")._3 == -1.0)
    assert(out("z")._4 == math.floor(math.log(6) * 1e6 + 0.5) / 1e6 ||
      math.abs(out("z")._4 - math.log(6)) < 1e-6)
    assert(out("f")._2 == 3L && out("f")._3 == 0.0)
  }
}
