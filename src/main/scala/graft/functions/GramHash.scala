package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-gram hashing + winnowing window minima — the per-gram inner
  * loops of the x24/x25 winnowing fingerprints and c15's content-defined
  * chunk boundaries.
  *
  * The `transform(sequence(...), i -> conv(substr(md5(array_join(slice(ws,
  * i+1, n), ' ')), 1, 6), 16, 10))` chains these replace are CodegenFallback
  * higher-order functions: per GRAM an interpreted lambda builds a slice
  * array, joins it to a fresh string, md5s it through the interpreted
  * expression path, and boxes the result — for every word of every
  * document. These kernels do one byte-walk per row and one MessageDigest
  * per gram (the [[Shingles]]/[[Md5Seed]] pattern), inside the surrounding
  * WholeStageCodegen span. Hash values are bit-identical:
  * `conv(substr(md5(s), 1, 6), 16, 10)` IS [[Md5Seed.prefixLong]] (the
  * contract pinned in that file), and GramHashSpec re-derives every value
  * against the SQL template.
  */

/** `graft_gram_h6(ws, n, salt)` — for every FULL n-word window of `ws`
  * (joined by one space, exactly `array_join(slice(ws, i+1, n), ' ')` —
  * null words skipped like array_join does), the first-6-hex-digit md5
  * prefix of gram+salt as a long. A row with fewer than n words yields an
  * EMPTY array (the x24 full-windows contract).
  */
case class GramHash6(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType, StringType)
  override def prettyName: String = "graft_gram_h6"

  override protected def nullSafeEval(ws: Any, n: Any, salt: Any): Any =
    GramHash.gramH6(
      ws.asInstanceOf[ArrayData],
      n.asInstanceOf[Int],
      salt.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ws, n, salt) => s"graft.functions.GramHash.gramH6($ws, $n, $salt)")

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): GramHash6 = copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_win_min(hs, w)` — winnowing window minima over a long array with
  * x24's edge rule: size ≥ w → array_min of every w-window; 1 ≤ size < w →
  * the single global min; empty → empty. Replaces the
  * `transform(sequence(0, size(hs) - w), j -> array_min(slice(hs, j+1, w)))`
  * interpreted chain.
  */
case class WinMin(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), IntegerType)
  override def prettyName: String = "graft_win_min"

  override protected def nullSafeEval(hs: Any, w: Any): Any =
    GramHash.winMin(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hs, w) => s"graft.functions.GramHash.winMin($hs, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): WinMin = copy(left = newLeft, right = newRight)
}

object GramHash {

  /** One digest instance per evaluation call would be correct but slow;
    * MessageDigest is not thread-safe, so keep one per thread.
    */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 hex digits of `bytes` as a long — byte-identical to
    * `conv(substr(md5(s), 1, 6), 16, 10)` ([[Md5Seed]]'s contract): 6 hex
    * digits = the first 3 digest bytes, big-endian.
    */
  private def h6(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) | (dig(2) & 0xffL)
  }

  def gramH6(ws: ArrayData, n: Int, salt: UTF8String): ArrayData = {
    val nWords = ws.numElements()
    val count  = math.max(nWords - n + 1, 0)
    if (count == 0) return new GenericArrayData(Array.emptyLongArray)
    val words = Array.tabulate(nWords) { i =>
      if (ws.isNullAt(i)) null else ws.getUTF8String(i).getBytes
    }
    val saltBytes = salt.getBytes
    val out       = new Array[Long](count)
    val buf       = new java.io.ByteArrayOutputStream(64)
    var w         = 0
    while (w < count) {
      buf.reset()
      var j     = 0
      var first = true
      while (j < n) {
        val wb = words(w + j)
        if (wb != null) { // array_join skips null elements
          if (!first) buf.write(' ')
          buf.write(wb, 0, wb.length)
          first = false
        }
        j += 1
      }
      buf.write(saltBytes, 0, saltBytes.length)
      out(w) = h6(buf.toByteArray)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** See [[PhashPix]]: row i reads one byte of md5("{src}|px{i div 8}") —
    * substr(hex, (i%8)*4+1, 2) is exactly digest byte (i%8)*2, so the eight
    * row digests are computed once each and each pixel is one array read.
    * `% 256` is a no-op on a single byte but kept in the formula contract.
    */
  def phashPix(src: Long): ArrayData = {
    val out = new Array[Long](64)
    val d   = md5.get()
    var row = 0
    while (row < 8) {
      d.reset()
      val dig =
        d.digest((src.toString + "|px" + row).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 8) {
        out(row * 8 + j) = (dig(j * 2) & 0xffL) % 256
        j += 1
      }
      row += 1
    }
    new GenericArrayData(out)
  }

  def winMin(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < w) {
      var m = hs.getLong(0)
      var i = 1
      while (i < n) { m = math.min(m, hs.getLong(i)); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new Array[Long](n - w + 1)
    var j   = 0
    while (j <= n - w) {
      var m = hs.getLong(j)
      var i = 1
      while (i < w) { m = math.min(m, hs.getLong(j + i)); i += 1 }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_phash_pix(src)` — the m10/m11 deterministic 8×8 "fake decode"
  * pixel stream: pix[i] = conv(substr(md5(src || '|px' || (i div 8)),
  * (i % 8) * 4 + 1, 2), 16, 10) % 256 for i in 0..63 — eight md5 digests
  * per IMAGE instead of sixty-four interpreted md5 lambda evaluations per
  * image (each element of the old `transform(sequence(0, 63), ...)`
  * re-computed its row digest through the interpreted path).
  */
case class PhashPix(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def prettyName: String = "graft_phash_pix"

  override protected def nullSafeEval(src: Any): Any =
    GramHash.phashPix(src.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, src => s"graft.functions.GramHash.phashPix($src)")

  override protected def withNewChildInternal(newChild: Expression): PhashPix =
    copy(child = newChild)
}
