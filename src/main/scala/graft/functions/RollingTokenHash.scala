package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive polynomial rolling hash of a document's token
  * stream, as ONE expression:
  * normalize (lower/trim/collapse spaces) → split on space → drop
  * empties → x_t = first 60 bits of md5(token) mod P → left fold
  * h ← (h·B + x_t) mod P seeded with x_1; null for token-less text.
  *
  * Exactly the semantics of the composed-HOF formulation in
  * `TextOps.rollingHash` (differential-tested) and of the DuckDB
  * oracle (`list_reduce` no-init fold) — but evaluated in a single
  * tight JVM loop instead of four nested interpreted lambda passes
  * (transform/filter/aggregate are CodegenFallback AND allocate
  * per-element). The fold itself is sequential by definition, so
  * per-row eval (CodegenFallback) is the right shape; the win is
  * removing lambda interpretation, not whole-stage codegen.
  */
case class RollingTokenHash(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  private val P = 2147483647L
  private val B = 131L

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"graft_rolling_hash needs a string argument, got " +
            child.dataType.simpleString)

  @transient private lazy val md5 =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** First 15 hex chars of md5 = high 60 bits of the first 8 digest
    * bytes, matching `conv(substring(md5(t),1,15),16,10)`.
    */
  private def tokenBase(token: String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(token.getBytes("UTF-8"))
    var x = 0L
    var i = 0
    while (i < 8) { // 16 hex chars; drop the lowest nibble → 15
      x = (x << 8) | (digest(i) & 0xffL)
      i += 1
    }
    (x >>> 4) % P
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Locale.ROOT: Spark's lower() is locale-independent; the default
    // JVM locale (e.g. Turkish 'I'→'ı') would diverge from the HOF
    // formulation and the DuckDB oracle.
    val s = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ")
    var h = -1L
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val x = tokenBase(s.substring(start, i))
          h = if (h < 0) x else (h * B + x) % P
        }
        start = i + 1
      }
      i += 1
    }
    if (h < 0) null else h
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RollingTokenHash = copy(child = newChild)
}
