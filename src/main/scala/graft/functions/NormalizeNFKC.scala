package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native Catalyst expression with whole-stage
  * codegen — the hot-path core of the reference's `normalize_and_clean_text`
  * (reference: utils/data_transformation_helpers.py:28-86, step 2
  * `unicodedata.normalize("NFKC", ...)`), called at 7+ pipeline sites.
  *
  * A native expression keeps the cleaning chain inside WholeStageCodegen
  * (a Scala UDF would break the span and force row serialization); the
  * generated code is a single static call into `java.text.Normalizer`.
  */
case class NormalizeNFKC(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  // Seq is covariant: Seq[DataType] satisfies ExpectsInputTypes'
  // Seq[AbstractDataType] (which is private[sql] in Spark 4).
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_nfkc"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNFKC.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFKC.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFKC =
    copy(child = newChild)
}

object NormalizeNFKC {
  /** Static entry point shared by interpreted + codegen paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFKC is the identity on pure ASCII; skip the normalizer.
    if (isAscii(str)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC)
    )
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }
}
