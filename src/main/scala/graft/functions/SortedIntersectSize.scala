package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** |A ∩ B| for two SORTED string arrays via a single merge scan — the hot
  * inner loop of exact set-similarity verification (Jaccard over shingle /
  * n-gram sets).
  *
  * `array_intersect` builds a hash set per evaluation (per candidate pair);
  * for pre-sorted distinct arrays the merge scan is O(n+m) with zero
  * allocation, and this expression codegens into the surrounding
  * WholeStageCodegen span. PRECONDITION: both inputs sorted ascending and
  * distinct (sort once per document before the pair join — not once per
  * pair); nulls inside the arrays are skipped.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def prettyName: String = "graft_sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.size(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedIntersectSize.size($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SortedIntersectSize = copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Static entry point shared by interpreted + codegen paths. */
  def size(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i  = 0
    var j  = 0
    var n  = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }
}
