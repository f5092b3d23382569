package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic text-quality metrics in ONE pass over the token stream:
  * `graft_quality(text, n_chars)` → struct(n_tok, ttr, stop_ratio,
  * quality).
  *
  * The composed Column form (split + size + array_distinct + a
  * filter(…isInCollection) higher-order function) is CodegenFallback
  * per HOF and walks the token array four times with per-element
  * lambda dispatch — the same interpreted-HOF overhead that made the
  * first t9 formulation 37× slower. Here it is one split, one hash-set
  * insert and one small-set membership test per token.
  *
  * Double arithmetic mirrors the composed form TERM FOR TERM
  * (same casts, same association order), so the struct fields are
  * bit-identical to the composed columns and oracle parity is
  * untouched; `quality` is returned UNROUNDED — callers apply the same
  * `round(_, 6)` they applied before. Differential-tested against the
  * composed form in TextMultimodalSpec.
  */
case class TextQuality(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("ttr", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_quality"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_quality needs (string, bigint) arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(text: Any, nChars: Any): Any = {
    // split on single space, preserving empty fields exactly like
    // Spark's split(text, " ") — the composed form sees the same words
    val words = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val nTok = words.length
    val seen = new java.util.HashSet[String](nTok * 2)
    var stop = 0
    var i = 0
    while (i < nTok) {
      val w = words(i)
      seen.add(w)
      if (TextQuality.Stopwords.contains(w)) stop += 1
      i += 1
    }
    val nt = nTok.toDouble
    val ttr = seen.size.toDouble / nt
    val stopRatio = stop.toDouble / nt
    val awl = (nChars.asInstanceOf[Long].toDouble - (nt - 1.0)) / nt
    val quality = ttr * 0.5 + (1.0 - stopRatio) * 0.3 +
      math.min(awl / 8.0, 1.0) * 0.2
    InternalRow(nTok, ttr, stopRatio, quality)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextQuality =
    copy(left = newLeft, right = newRight)
}

object TextQuality {
  /** Mirrors [[graft.operators.TextOps.EnStopwords]] — kept as a Java
    * set for per-token O(1) membership in the hot loop.
    */
  val Stopwords: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "is", "in").foreach(s.add)
    java.util.Collections.unmodifiableSet(s)
  }
}
