package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native codegen dot product over two `array<double>` columns — the
  * one place the SURVEY (§4.2) budgets a custom Catalyst Expression:
  * the higher-order-function composition
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v)` is
  * CodegenFallback (interpreted lambda per element, boxed doubles),
  * which dominates pairwise similarity workloads. This expression
  * generates a tight primitive loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the higher-order form — left-to-right
  * sequential sum of pairwise products in double, NULL when the two
  * arrays differ in length or any paired element is null (zip_with
  * pads the shorter side with nulls and `null * x` poisons the
  * aggregate) — so oracle hashes are unchanged on every input, not
  * just equal-length non-null vectors. Inputs are implicitly cast
  * (array<float> → exact promotion to array<double> by Cast).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  /** Null even for non-null inputs (length mismatch / null element). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs two array<double> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Builder used by the function registry: float arrays (and other
    * numeric arrays) are promoted to array<double> with an explicit
    * Cast — exact for float inputs — so `graft_dot(embedding, ...)`
    * works directly on the stored `array<float>` column.
    */
  def withCasts(a: Expression, b: Expression): DotProduct = {
    def promote(e: Expression): Expression = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case ArrayType(_, n) => Cast(e, ArrayType(DoubleType, n))
      case _ => e // let checkInputDataTypes report it
    }
    DotProduct(promote(a), promote(b))
  }
}
