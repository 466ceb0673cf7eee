package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_zorder(x, y)` — Morton/Z-order interleave of the low 16 bits of
  * two dimension values into one 32-bit clustering key.
  *
  * This is the data-LAYOUT operator for multi-dimensional scan pruning at
  * scale (Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting a table by the
  * interleaved key before writing makes parquet row-group min/max stats
  * tight on BOTH dimensions simultaneously, so a predicate on either
  * column (or both) skips most row groups — a plain two-column sort only
  * clusters the leading column. Pure bit arithmetic: deterministic,
  * codegen'd, and reproducible in any engine with shift/and/or.
  *
  * 16 bits per dimension is the declared budget (keys above 2¹⁶ alias by
  * masking); real lakehouse layouts quantize dimensions into bounded bins
  * for exactly this reason.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrderKey.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): ZOrderKey = copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Bit i of x lands at position 2i, bit i of y at 2i+1, for i in 0..15. */
  def interleave(x: Long, y: Long): Long = {
    var out = 0L
    var i   = 0
    while (i < 16) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}
