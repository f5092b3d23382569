package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the higher-order formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val pairs = emb.select(
      VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .crossJoin(emb.limit(3).select(
        VectorFunctions.toDoubleArray(col("embedding")).as("w")))
    val diff = pairs.select(
      (VectorFunctions.dot(col("v"), col("w")) -
        VectorFunctions.dotHof(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d"))))
      .head.getDouble(0)
    assert(diff == 0.0, "codegen and HOF dot products must be identical")
  }

  test("graft_dot: known values, implicit float→double cast, SQL call") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b")))
      .head.getDouble(0) == 32.0)
    df.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT graft_dot(a, b) FROM vecs")
      .head.getDouble(0) == 32.0)
    spark.catalog.dropTempView("vecs")
  }

  test("graft_dot: null array → null result") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b")))
      .head.isNullAt(0))
  }

  test("graft_dot: length mismatch and null elements match HOF (null)") {
    // zip_with pads the shorter side with nulls and null*x poisons the
    // aggregate → the HOF form yields NULL; graft_dot must agree
    // (round-2 advice: it used to truncate to min length).
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0, 3.0),
        Array[java.lang.Double](4.0, 5.0)),
      (Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](4.0, 5.0, 6.0)),
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-ness must match HOF: $r")
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(!rows(2).isNullAt(0) && rows(2).getDouble(0) == 11.0)
  }

  test("graft_rolling_hash equals the composed-HOF formulation exactly") {
    val docs = Tables.documents(spark, sfSmoke)
    val diff = docs.select(
      graft.operators.TextOps.rollingHash(col("text")).as("a"),
      graft.operators.TextOps.rollingHashHof(col("text")).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0L)
    // null/empty handling
    val edge = Seq(("", "e1"), ("  ", "e2"), ("one", "e3"))
      .toDF("text", "tag")
    val rows = edge.select(col("tag"),
      graft.operators.TextOps.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(rows("e1") && rows("e2") && !rows("e3"))
  }

  test("graft_dot participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val q = emb.select(VectorFunctions.dot(
      VectorFunctions.toDoubleArray(col("embedding")),
      VectorFunctions.toDoubleArray(col("embedding"))).as("d"))
    // `*(n)` is the whole-stage-codegen marker in plan text; the
    // projection containing graft_dot must carry it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
