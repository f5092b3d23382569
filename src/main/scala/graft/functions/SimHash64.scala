package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a space-separated text in ONE pass: for every
  * token (split on single spaces, empties dropped, multiplicity
  * kept), take the first 60 bits of md5 and add ±1 per bit position;
  * fingerprint bit i is set iff the running sum is ≥ 0.
  *
  * Exactly the semantics of the explode + 60-sum-aggregate
  * formulation in `DedupOps.simhashHof` (differential-tested) and of
  * the DuckDB oracle — but with no explode (no 60× row blow-up), no
  * per-token interpreted `conv(md5)`, and no doc-level shuffle: the
  * whole computation is a per-row map.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"graft_simhash needs a string argument, got " +
            child.dataType.simpleString)

  @transient private lazy val md5 =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  private def tokenBits(token: String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(token.getBytes("UTF-8"))
    var x = 0L
    var i = 0
    while (i < 8) {
      x = (x << 8) | (digest(i) & 0xffL)
      i += 1
    }
    x >>> 4 // first 15 hex chars = high 60 bits
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sums = new Array[Int](60)
    var any = false
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          any = true
          val x = tokenBits(s.substring(start, i))
          var b = 0
          while (b < 60) {
            if (((x >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) return null
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}
