package graft

import graft.functions.{ContentKey, DotProduct, RollingTokenHash,
  SimHash64, TextQuality, TokenMode, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  ExpressionInfo, Literal}
import org.apache.spark.sql.types.LongType

/** Session extension wiring for the engine's custom expressions
  * (`SparkSessionExtensions` is the sanctioned extension point — no
  * fork, no private API). Registered functions are callable from SQL
  * and via `functions.call_function`, and participate fully in
  * whole-stage codegen.
  *
  * Registry:
  *  - `graft_dot(array<double>, array<double>) → double` — codegen
  *    dot product ([[graft.functions.DotProduct]]); the kernel under
  *    every cosine-similarity operator.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Per-key top-k with partial pushdown: the optimizer rule rewrites
    // the declarative row_number-filter shape into the custom logical
    // node; the strategy plans it as map-side + reduce-side bounded
    // heaps (graft.plans.TopKPerKey). Kill switch:
    // spark.graft.topkRewrite=false.
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProduct.withCasts(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName,
        "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_shingles takes (text, n) arguments")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        WordShingles(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_simhash takes exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_mode"),
      new ExpressionInfo(classOf[TokenMode].getName,
        "graft_token_mode"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_token_mode takes exactly 1 argument")
        TokenMode(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_content_key"),
      new ExpressionInfo(classOf[ContentKey].getName,
        "graft_content_key"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_content_key takes exactly 1 argument")
        ContentKey(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[TextQuality].getName, "graft_quality"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_quality takes (text, n_chars) arguments")
        val chars = children(1) match {
          case e if e.dataType == LongType => e
          case e => Cast(e, LongType)
        }
        TextQuality(children.head, chars)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingTokenHash].getName,
        "graft_rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_rolling_hash takes exactly 1 argument")
        RollingTokenHash(children.head)
      }))
    // Spark's OWN runtime-filter expressions, surfaced as callable
    // functions (they are public classes the optimizer normally
    // injects itself — InjectRuntimeFilter — but never registers):
    // graft_bloom_agg(longCol[, estItems]) builds a BloomFilter binary
    // over a key column; graft_might_contain(bloom, longKey) probes it.
    // Together they give queries an EXPLICIT scan-stage pre-filter —
    // the 100 TB decontamination shape where a ~1 MB bloom of the
    // benchmark keys prunes the corpus before any join shuffle.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, Literal(v, _)) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, v.toString.toLong)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg takes (key[, estimatedItems literal])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_might_contain takes (bloom, key) arguments")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(children.head, children(1))
      }))
  }
}
