package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def data(n: Int, keys: Int) = {
    // deterministic pseudo-random values, duplicate v per key included
    (0 until n).map(i =>
      (i.toLong, s"k${i % keys}", (i * 2654435761L % 1000) / 7 * 7))
      .toDF("id", "k", "v")
  }

  test("rewrite fires: w1-shaped plan runs through TopKPerKeyExec") {
    val df = windowForm(data(500, 7), 3)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
  }

  test("operator output equals the window form exactly (rank included)") {
    val base = data(3000, 23)
    val fast = windowForm(base, 4)
      .orderBy(col("k"), col("rank"))
      .collect().map(_.toSeq).toSeq
    withRewriteOff {
      val ref = windowForm(base, 4)
        .orderBy(col("k"), col("rank"))
        .collect().map(_.toSeq).toSeq
      assert(fast == ref)
    }
  }

  test("rank = 1 (latest-per-key shape) and rank < n both rewrite") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    val top1 = data(200, 5).withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
    top1.write.format("noop").mode("overwrite").save()
    assert(top1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(top1.count() == 5)
    val lt = data(200, 5).withColumn("r", row_number().over(w))
      .filter(col("r") < 3)
    lt.write.format("noop").mode("overwrite").save()
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(lt.count() == 10)
  }

  test("non-matching shapes keep the window path") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    // rank() is not row_number(); compound predicate; two windows
    val r1 = data(100, 4).withColumn("r", rank().over(w))
      .filter(col("r") <= 2)
    r1.write.format("noop").mode("overwrite").save()
    assert(!r1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val r2 = data(100, 4).withColumn("r", row_number().over(w))
      .filter(col("r") <= 2 && col("v") > 0)
    r2.write.format("noop").mode("overwrite").save()
    assert(!r2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("partial pushdown bounds the exchange: shuffle rows ≤ k·keys·parts") {
    val parts = 4
    val base = data(4000, 3).repartition(parts)
    val df = windowForm(base, 2).select("k", "id")
    // collect() (not a write) so the metrics live on THIS Dataset's
    // query execution — df.write plans and runs a fresh clone
    df.collect()
    // only the exchange FED BY the partial top-k (the repartition
    // above it shuffles all 4000 input rows by design); AQE hides
    // exchanges inside leaf query stages, so descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
      case e: ShuffleExchangeExec => Seq(e)
      case s: QueryStageExec => exchanges(s.plan)
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    }.flatten
    val written = exchanges(df.queryExecution.executedPlan).collect {
      case e if e.child.exists {
            case t: TopKPerKeyExec => t.partial
            case _ => false
          } =>
        e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum
    assert(written > 0 && written <= 2L * 3 * parts,
      s"expected bounded shuffle, wrote $written rows")
  }

  test("partial key cap: overflow passthrough preserves exact output") {
    // cap of 1 tracked key per partition → almost every row passes
    // through untrimmed; the final phase must still produce exactly
    // the window form's answer.
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "1")
    try {
      val base = data(3000, 23).repartition(4)
      val capped = windowForm(base, 4)
        .orderBy(col("k"), col("rank"))
        .collect().map(_.toSeq).toSeq
      val ref = withRewriteOff {
        windowForm(base, 4)
          .orderBy(col("k"), col("rank"))
          .collect().map(_.toSeq).toSeq
      }
      assert(capped == ref)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }

  test("self-join branches canonicalize equal: exchange/stage reused") {
    // n12's shape: one top-k-per-key relation joined to itself. The
    // produced rank attribute must canonicalize positionally or the
    // two branches never compare equal and the expensive subtree runs
    // twice.
    val base = data(2000, 40)
    val topk = windowForm(base, 2).select(col("k"), col("id"))
    val joined = topk.as("a").join(topk.as("b"), "k")
      .filter(col("a.id") < col("b.id"))
    // collect() (not write) so AQE finalizes THIS Dataset's plan
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("Reused"),
      s"self-join did not reuse the top-k branch:\n$plan")
  }

  test("domainCap (c19) plans through TopKPerKeyExec and equals the " +
      "window form") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val capped = graft.operators.TextOps.domainCap(docs, "doc_id",
      "source", "text", "n_chars", k = 20)
    val fast = capped.collect().map(_.toSeq).toSeq
    assert(fast.nonEmpty)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"domain cap must ride the partial top-k operator:\n$plan")
    val ref = withRewriteOff {
      graft.operators.TextOps.domainCap(docs, "doc_id", "source",
        "text", "n_chars", k = 20).collect().map(_.toSeq).toSeq
    }
    assert(fast == ref)
    // quota honored: no source exceeds k rows
    val bySrc = fast.groupBy(_.head).view.mapValues(_.size)
    assert(bySrc.values.forall(_ <= 20))
  }

  private def withRewriteOff[A](body: => A): A = {
    spark.conf.set("spark.graft.topkRewrite", "false")
    try body finally spark.conf.set("spark.graft.topkRewrite", "true")
  }
}
