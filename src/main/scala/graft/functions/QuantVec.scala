package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native quantized-vector distance kernels — the pair-scoring inner loops
  * of the d21 SemDeDup family, the x39/x40 JL distance audit, and the
  * m10 perceptual-hash verify.
  *
  * Each replaces an `aggregate(zip_with(...))` SQL template that Spark
  * evaluates as a CodegenFallback interpreted lambda with per-element
  * boxing (the [[DotProduct]] rationale; measured there and again on the
  * d21 pair gate). The arithmetic is IDENTICAL to the template it
  * replaces — `floor(x·1024)` on doubles is Spark's `Floor`
  * (`math.floor(d).toLong`), differences/products/sums are Java long
  * arithmetic exactly like the SQL bigint lane — so query results are
  * byte-identical and only the evaluation strategy changes.
  *
  * NULL semantics mirror the templates exactly: `zip_with` pads the
  * shorter array with NULL and `aggregate`'s `acc + v` nulls out the
  * whole fold, so the template returns NULL whenever the lengths differ
  * OR any element is NULL — these kernels do the same (hence the boxed
  * return + explicit isNull wiring; embedding columns never hit it).
  */
abstract class QuantVecBinary extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Fully-qualified static kernel, `(ArrayData, ArrayData) => java.lang.Long`. */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        java.lang.Long ${ev.value}_r = $kernel($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.longValue(); }
      """
    )
}

/** `graft_qd2(a, b)` — quantized squared L2 on the floor(x·1024) lattice:
  * `aggregate(zip_with(a, b, (x, y) -> (floor(x*1024) - floor(y*1024)) *
  * (floor(x*1024) - floor(y*1024))), 0L, (acc, v) -> acc + v)`.
  */
case class QuantDist2(left: Expression, right: Expression) extends QuantVecBinary {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "graft_qd2"
  override protected def kernel: String = "graft.functions.QuantVec.qd2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.qd2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): QuantDist2 = copy(left = newLeft, right = newRight)
}

/** `graft_l2sq_long(a, b)` — Σ (a_i − b_i)² over two bigint arrays:
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
  * (acc, v) -> acc + v)`.
  */
case class SqDiffSumLong(left: Expression, right: Expression) extends QuantVecBinary {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def prettyName: String = "graft_l2sq_long"
  override protected def kernel: String = "graft.functions.QuantVec.l2sqLong"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.l2sqLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SqDiffSumLong = copy(left = newLeft, right = newRight)
}

/** `graft_sad_long(a, b)` — Σ |a_i − b_i| over two bigint arrays:
  * `aggregate(zip_with(a, b, (p, q) -> abs(p - q)), 0L, (acc, x) -> acc + x)`
  * — the m10 Hamming verify when the arrays are 0/1 bit lanes.
  */
case class AbsDiffSumLong(left: Expression, right: Expression) extends QuantVecBinary {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def prettyName: String = "graft_sad_long"
  override protected def kernel: String = "graft.functions.QuantVec.sadLong"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.sadLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): AbsDiffSumLong = copy(left = newLeft, right = newRight)
}

/** `graft_qdot_long(a, s)` — quantized dot against an integer (sign)
  * vector: Σ floor(a_i·1024)·s_i, i.e.
  * `aggregate(zip_with(a, s, (x, v) -> cast(floor(x*1024) as bigint) * v),
  * 0L, (acc, v) -> acc + v)` — the x39 JL projection's per-output-dim fold
  * once the md5 sign matrix is folded to a literal (Md5Seed side).
  */
case class QuantSignDot(left: Expression, right: Expression) extends QuantVecBinary {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(LongType))
  override def prettyName: String = "graft_qdot_long"
  override protected def kernel: String = "graft.functions.QuantVec.qdotLong"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.qdotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): QuantSignDot = copy(left = newLeft, right = newRight)
}

object QuantVec {

  /** Shared guard: template-equivalent NULL when lengths differ; element
    * nulls are checked inside each kernel loop.
    */
  @inline private def lenOk(a: ArrayData, b: ArrayData): Boolean =
    a.numElements() == b.numElements()

  def qd2(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (!lenOk(a, b)) return null
    val n   = a.numElements()
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = math.floor(a.getDouble(i) * 1024).toLong - math.floor(b.getDouble(i) * 1024).toLong
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def l2sqLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (!lenOk(a, b)) return null
    val n   = a.numElements()
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def sadLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (!lenOk(a, b)) return null
    val n   = a.numElements()
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += math.abs(a.getLong(i) - b.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def qdotLong(a: ArrayData, s: ArrayData): java.lang.Long = {
    if (!lenOk(a, s)) return null
    val n   = a.numElements()
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || s.isNullAt(i)) return null
      acc += math.floor(a.getDouble(i) * 1024).toLong * s.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
