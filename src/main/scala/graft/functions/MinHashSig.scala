package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash_sig(shingles)` — the FULL 12-component MinHash signature
  * of one document's shingle array, in one pass, zero shuffle.
  *
  * The composed formulation ([[graft.operators.MinHashOps.signatures]]
  * before this expression) was `explode(shingles)` → md5 per row → a
  * 12-column min aggregation keyed by doc_id: correct, map-side
  * combinable — but it materializes one row per (doc, shingle) and pays a
  * doc_id shuffle just to reassemble what was a per-row value all along.
  * This expression keeps the whole computation inside the row's codegen
  * span: per shingle, one md5 → 24-bit x (identical to
  * `conv(substr(md5(s),1,6),16,10)` — the top 3 digest bytes), then the 12
  * Carter–Wegman affine mins updated in place. Signature bits are
  * BIT-IDENTICAL to the composed form (same md5 prefix, same
  * [[graft.operators.MinHashOps]] affine constants, same `% 2^31−1`), so
  * the DuckDB oracle and every downstream band key are unchanged.
  *
  * At 100 TB the explode row-blowup was the dedup family's largest
  * intermediate (shingles ≈ words per doc); this removes it and the
  * groupBy exchange for every signature consumer — batch candidates (d1),
  * verification (d2/d10), incremental ingest (d13), and the streaming
  * `dedupIngest` — in one place.
  *
  * Null/empty: null in → null out; an empty shingle array yields null
  * (the composed form dropped such docs in the explode — no shingles, no
  * signature — and `graft_word_shingles` never returns an empty array).
  */
case class MinHashSig(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(arr: Any): Any =
    MinHashSig.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        ${ev.value} = graft.functions.MinHashSig.compute($a);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    )
    f
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  import graft.operators.{MinHashOps => MH}

  private val NumH = MH.NumHashes
  private val P    = MH.ModP
  private val A    = Array.tabulate(NumH)(MH.affineA)
  private val B    = Array.tabulate(NumH)(MH.affineB)

  /** Static entry point shared by interpreted + codegen paths. Returns
    * null for an empty array (no shingles ⇒ no signature).
    */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](NumH)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i  = 0
    while (i < n) {
      val s      = shingles.getUTF8String(i)
      val digest = md.digest(s.getBytes)
      md.reset()
      // first 6 hex chars of the digest = top 3 bytes, big-endian
      val x = ((digest(0) & 0xffL) << 16) | ((digest(1) & 0xffL) << 8) | (digest(2) & 0xffL)
      var h = 0
      while (h < NumH) {
        val v = (x * A(h) + B(h)) % P
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
