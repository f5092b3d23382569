package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count and modal-token multiplicity in ONE pass:
  * `graft_token_mode(text)` → struct(n_tok, max_cnt).
  *
  * The composed formulation (explode → per-(doc,token) count →
  * per-doc max/sum → join back) shuffles every token of the corpus
  * twice and joins the result back to the doc relation — correct and
  * distributed, but all of it exists to compute a per-ROW scalar.
  * Here it is one split and one hash-map count per row; max_cnt/n_tok
  * is the top-token share the repetition quality filter needs.
  * Tokens are split(text, " ") verbatim (empties kept, matching the
  * aggregate twin and the oracle). Differential-tested in
  * TextMultimodalSpec.
  */
case class TokenMode(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("max_cnt", IntegerType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_mode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_token_mode needs a string argument, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int](words.length * 2)
    var max = 0
    var i = 0
    while (i < words.length) {
      val c = counts.merge(words(i), 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    InternalRow(words.length, max)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenMode = copy(child = newChild)
}
