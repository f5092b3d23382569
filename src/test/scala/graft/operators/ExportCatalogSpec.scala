package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ExportCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("export parquet round-trips exactly (K1)") {
    val docs = Tables.documents(spark, sfSmoke)
    val dir = tmpDir("exp") + "/docs_parquet"
    val exported = ExportOps.export(docs,
      Some("lang = 'en'"), "parquet", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == exported.count())
    assert(back.schema == docs.schema)
    assert(back.agg(sum("n_chars")).head.getLong(0) ==
      exported.agg(sum("n_chars")).head.getLong(0))
  }

  test("export csv with header round-trips counts (K2)") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "lang", "source", "n_chars")
    val dir = tmpDir("exp") + "/docs_csv"
    ExportOps.export(docs, None, "csv", dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.columns.toSeq == docs.columns.toSeq)
  }

  test("export json round-trips values (K3)") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "source")
    val dir = tmpDir("exp") + "/docs_json"
    ExportOps.export(docs, Some("doc_id < 10"), "json", dir)
    val back = spark.read.json(dir)
    assert(back.count() == docs.filter("doc_id < 10").count())
  }

  test("export rejects unknown format") {
    val docs = Tables.documents(spark, sfSmoke)
    intercept[IllegalArgumentException] {
      ExportOps.export(docs, None, "xml", tmpDir("exp"))
    }
  }

  test("export where-clause is a predicate, not arbitrary SQL (P6)") {
    val docs = Tables.documents(spark, sfSmoke)
    val n = ExportOps.export(docs, Some("n_chars >= 100 AND lang = 'en'"),
      "parquet", tmpDir("exp") + "/p").count()
    assert(n == docs.filter(col("n_chars") >= 100 &&
      col("lang") === "en").count())
    intercept[Exception] {
      ExportOps.export(docs, Some("1; DROP TABLE documents"),
        "parquet", tmpDir("exp") + "/inj").count()
    }
  }

  test("attribution footer lists distinct sources of the slice (P9)") {
    val docs = Tables.documents(spark, sfSmoke)
    val att = ExportOps.attribution(docs, "source", Some("doc_id < 5"))
      .as[String].collect()
    assert(att.toSeq == att.sorted.toSeq)
    assert(att.length ==
      docs.filter("doc_id < 5").select("source").distinct().count())
  }

  test("catalog: tableExists probe (S2)") {
    val dir = tmpDir("cat") + "/t"
    assert(!Catalog.tableExists(spark, dir))
    Catalog.overwrite(Seq((1, "a")).toDF("k", "v"), dir)
    assert(Catalog.tableExists(spark, dir))
  }

  test("catalog: overwrite replaces, append adds (K6)") {
    val dir = tmpDir("cat") + "/t2"
    Catalog.overwrite(Seq((1, "a")).toDF("k", "v"), dir)
    Catalog.overwrite(Seq((2, "b")).toDF("k", "v"), dir)
    assert(Catalog.load(spark, dir).as[(Int, String)].collect().toSeq ==
      Seq((2, "b")))
    Catalog.append(Seq((3, "c")).toDF("k", "v"), dir)
    assert(Catalog.load(spark, dir).count() == 2)
  }

  test("catalog: partitioned layout prunes on the partition key (K7)") {
    val dir = tmpDir("cat") + "/part"
    val df = Seq(("s1", 1L), ("s1", 2L), ("s2", 3L))
      .toDF("source_name", "id")
    Catalog.overwritePartitioned(df, dir, Seq("source_name"))
    // physical layout: one directory per source
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("source_name=s1", "source_name=s2"))
    val pruned = Catalog.load(spark, dir)
      .filter(col("source_name") === "s1")
    assert(pruned.count() == 2)
    // partition filter must appear as such in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("bucketed tables co-locate the join: zero exchanges in the plan") {
    val ord = Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucketed-at-rest fact tables: b1 join plan has no exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = BucketedOps.bucketedJoin(s2, sfSmoke)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed fact join must not shuffle:\n$plan")
    // and the query over bucketed tables equals the raw-parquet result
    val bucketed = BucketedOps.bucketedRevenue(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val raw = Tables.lineitem(spark, sfSmoke)
      .join(Tables.orders(spark, sfSmoke),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus").asc)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(bucketed.toSeq == raw.toSeq)
  }

  test("partitioned-at-rest documents: b2 scan prunes to one lang") {
    val df = BucketedOps.partitionPrunedStats(spark, sfSmoke, "en")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"lang filter must prune partitions:\n$plan")
    // equality with the raw-parquet computation
    val raw = Tables.documents(spark, sfSmoke)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source").asc)
    assert(df.collect().map(_.toString).toSeq ==
      raw.collect().map(_.toString).toSeq)
  }

  test("statusRollup composes stats + latest (reference status verb)") {
    val df = Seq(
      ("s1", "en", 1L), ("s1", "de", 2L), ("s1", "en", 5L),
      ("s2", "fr", 3L)).toDF("source", "lang", "doc_id")
    val out = ReferenceOps.statusRollup(df, "source", "lang", "doc_id")
      .as[(String, Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq(
      ("s1", 3L, 2L, 5L, "en"), ("s2", 1L, 1L, 3L, "fr")))
  }

  test("asOfJoin: latest at-or-before match per key, nulls before first") {
    import java.sql.Timestamp
    val ev = Seq(
      // user 1: click@10, purchase@20 (→10), click@30, purchase@40 (→30)
      (1L, new Timestamp(10000L), 1L, "click"),
      (2L, new Timestamp(20000L), 1L, "purchase"),
      (3L, new Timestamp(30000L), 1L, "click"),
      (4L, new Timestamp(40000L), 1L, "purchase"),
      // user 2: purchase before any click → null
      (5L, new Timestamp(5000L), 2L, "purchase"),
      (6L, new Timestamp(6000L), 2L, "click"),
      // simultaneous click+purchase: click sorts first (event_id) → match
      (7L, new Timestamp(50000L), 3L, "click"),
      (8L, new Timestamp(50000L), 3L, "purchase"),
      // other event types are ignored entirely
      (9L, new Timestamp(15000L), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = ReferenceOps.asOfJoin(ev, "user_id", "ts", "event_id",
      "event_type", "click", "purchase")
      .select("event_id", "asof_ts").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getTimestamp(1).getTime)).toMap
    assert(out == Map(2L -> 10000L, 4L -> 30000L, 5L -> -1L,
      8L -> 50000L))
  }

  test("search with empty query returns all rows sorted+limited (:978)") {
    val docs = Tables.documents(spark, sfSmoke)
    val out = ReferenceOps.search(docs, None, Seq.empty, Map.empty,
      "doc_id", Seq.empty, 7)
    assert(out.count() == 7)
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.toSeq == ids.sorted.reverse.toSeq)
  }

  test("compact: many small files become few, data unchanged") {
    val path = tmpDir("compact") + "/t"
    val df = Tables.documents(spark, sfSmoke)
    df.repartition(17).write.parquet(path)
    def dataFiles = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles == 17)
    val before = spark.read.parquet(path).collect().toSet

    val n = Catalog.compact(spark, path) // 128 MB target → 1 file
    assert(n == 1)
    assert(dataFiles == 1, "17 small files must compact to 1")
    assert(spark.read.parquet(path).collect().toSet == before)
    // no leftover temp directory
    assert(!new java.io.File(path + "__compact_tmp").exists())
  }

  test("compact preserves a partitioned layout (and its pruning)") {
    val path = tmpDir("compactp") + "/t"
    val df = Seq(("s1", 1L), ("s1", 2L), ("s2", 3L), ("s2", 4L))
      .toDF("source_name", "id")
    Catalog.overwritePartitioned(df.repartition(5), path,
      Seq("source_name"))
    val before = spark.read.parquet(path).collect().toSet

    Catalog.compact(spark, path)
    // partition directories survive compaction
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("source_name=s1", "source_name=s2"))
    assert(spark.read.parquet(path).collect().toSet == before)
    // and pruning on the partition key still works
    val plan = Catalog.load(spark, path)
      .filter(col("source_name") === "s1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("schema evolution: appended frame with a new column merges as nulls") {
    val path = tmpDir("evolve") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(path)
    Seq((3L, "c", 0.9)).toDF("id", "name", "score")
      .write.mode("append").parquet(path)
    val merged = Catalog.loadEvolved(spark, path)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.isNullAt(2)), "old rows → null score")
    assert(rows(2).getDouble(2) == 0.9)
  }
}
