package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays with whole-stage codegen — the
  * hot inner loop of every vector-similarity operator here (cosine kNN,
  * LSH sign bits, near-dup pair scoring).
  *
  * Spark's own higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback: each element evaluation goes through an interpreted
  * lambda with boxing. This expression compiles to one tight primitive
  * loop (`DotProduct.dot`) inside the surrounding WholeStageCodegen span —
  * the preference order the build calls for: native Expression > UDF >
  * anything else. Summation is a strict left-to-right fold, matching the
  * DuckDB oracle's evaluation order.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static entry point shared by interpreted + codegen paths. Nulls inside
    * the arrays are treated as 0 contribution; length mismatch uses the
    * shorter prefix (neither occurs for embedding columns).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n   = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
