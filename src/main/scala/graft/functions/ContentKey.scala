package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 128-bit content key of whitespace-normalized text in ONE pass:
  * `graft_content_key(text)` ≡
  * `md5(regexp_replace(trim(lower(text)), "\s+", " "))`.
  *
  * The composed form pays a Java-regex `\s+` scan per row — the
  * dominant data-proportional cost of every content-dedup path (Java
  * regex is several times slower than a char loop for this pattern).
  * Semantics are reproduced exactly:
  *  - `lower` via UTF8String.toLowerCase (same call Spark's Lower
  *    makes);
  *  - `trim` strips 0x20 SPACE only (Spark's StringTrim — a leading
  *    tab is NOT trimmed and collapses to a leading space, same as
  *    the composed form);
  *  - runs of Java-regex `\s` = [ \t\n\x0B\f\r] collapse to one space;
  *  - md5 hex via commons-codec, the same digest Spark's Md5 uses.
  * Differential-tested against the composed form (incl. tab/newline
  * edge cases) in DedupSimilaritySpec.
  */
case class ContentKey(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_content_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_content_key needs a string argument, got " +
        child.dataType.simpleString)

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        sb.append(' ')
        while (i + 1 < n && isWs(s.charAt(i + 1))) i += 1
      } else sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ContentKey = copy(child = newChild)
}
