package graft

import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {

  private def docs(ids: Seq[Long], chars: Long => Long) = {
    import spark.implicits._
    ids.map(i => (i, s"src_${i % 3}", chars(i)))
      .toDF("doc_id", "source", "n_chars")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("init creates v0; merge upserts, carries, inserts; commit bumps") {
    val t = tmpDir("versioned") + "/t"
    val base = docs(Seq(1L, 2L, 3L), _ => 100L)
    assert(Versioned.init(base, t) == 0)
    assert(Versioned.currentVersion(spark, t).contains(0))
    // 2 updates (larger n_chars), 4 inserts; 1 and 3 carry over
    val src = docs(Seq(2L, 4L), _ => 999L)
    assert(Versioned.mergeUpsert(src, t, Seq("doc_id")) == 1)
    assert(rows(Versioned.current(spark, t)) == Set(
      (1L, "src_1", 100L), (2L, "src_2", 999L),
      (3L, "src_0", 100L), (4L, "src_1", 999L)))
  }

  test("time travel: v0 is immutable across merges; history lists all") {
    val t = tmpDir("versioned") + "/t"
    Versioned.init(docs(Seq(1L, 2L), _ => 10L), t)
    Versioned.mergeUpsert(docs(Seq(2L, 3L), _ => 20L), t, Seq("doc_id"))
    Versioned.mergeUpsert(docs(Seq(9L), _ => 30L), t, Seq("doc_id"))
    assert(rows(Versioned.snapshot(spark, t, 0)) ==
      Set((1L, "src_1", 10L), (2L, "src_2", 10L)))
    assert(Versioned.versions(spark, t) == Seq(0, 1, 2))
    val h = Versioned.history(spark, t)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h == Seq((0, 2L), (1, 3L), (2, 4L)))
  }

  test("re-merging the same source is idempotent on content") {
    val t = tmpDir("versioned") + "/t"
    Versioned.init(docs(Seq(1L, 2L, 3L), _ => 5L), t)
    val src = docs(Seq(2L, 7L), _ => 50L)
    Versioned.mergeUpsert(src, t, Seq("doc_id"))
    val once = rows(Versioned.current(spark, t))
    Versioned.mergeUpsert(src, t, Seq("doc_id"))
    assert(rows(Versioned.current(spark, t)) == once)
    assert(Versioned.currentVersion(spark, t).contains(2))
  }

  test("deleteFlag removes matches and inserts nothing for them") {
    val t = tmpDir("versioned") + "/t"
    Versioned.init(docs(Seq(1L, 2L, 3L), _ => 5L), t)
    val src = docs(Seq(2L, 3L, 8L), i => i * 10)
      .withColumn("__del", col("doc_id") === 3L)
    Versioned.mergeUpsert(src, t, Seq("doc_id"),
      deleteFlag = Some("__del"))
    assert(rows(Versioned.current(spark, t)) == Set(
      (1L, "src_1", 5L), (2L, "src_2", 20L), (8L, "src_2", 80L)))
  }

  test("vacuum drops old snapshots, keeps the manifest target") {
    val t = tmpDir("versioned") + "/t"
    Versioned.init(docs(Seq(1L), _ => 1L), t)
    Versioned.mergeUpsert(docs(Seq(2L), _ => 2L), t, Seq("doc_id"))
    Versioned.mergeUpsert(docs(Seq(3L), _ => 3L), t, Seq("doc_id"))
    Versioned.vacuum(spark, t, keepLast = 1)
    assert(Versioned.versions(spark, t) == Seq(2))
    assert(Versioned.current(spark, t).count() == 3)
  }

  test("init refuses an existing table; merge refuses uninitialized") {
    val t = tmpDir("versioned") + "/t"
    Versioned.init(docs(Seq(1L), _ => 1L), t)
    intercept[IllegalArgumentException] {
      Versioned.init(docs(Seq(2L), _ => 1L), t)
    }
    intercept[IllegalStateException] {
      Versioned.mergeUpsert(docs(Seq(1L), _ => 1L), t + "_missing",
        Seq("doc_id"))
    }
  }
}
