package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle / n-gram generators — the set-construction half of the
  * dedup family (the intersection half is [[SortedIntersectSize]]).
  *
  * The equivalent `transform(sequence(...), …)` higher-order chains are
  * CodegenFallback in Spark AND re-inlined once per referencing expression;
  * these expressions codegen into the surrounding WholeStageCodegen span and
  * build each document's set exactly once. Output is SORTED (UTF8 binary
  * order — the same order `array_sort` uses) and DISTINCT, which is exactly
  * the precondition [[SortedIntersectSize]] needs, so callers skip the
  * separate `array_sort(array_distinct(...))` pass entirely.
  *
  * Reference anchor: the corpus-dedup need implied by the reference's
  * ChromaDB exact-id dedup (utils/chroma_helpers.py:111-124), scaled to
  * MinHash/Jaccard set similarity (SURVEY §2 dedup family).
  */

/** `graft_word_shingles(text, n)` — sorted distinct word n-gram shingles.
  * Word split = every single space (consecutive spaces yield empty words,
  * matching `split(text, " ")`); shingle i = words[i..i+n-1] joined by one
  * space, for i in 0..max(#words-n, 0) — identical to the
  * `transform(sequence(0, greatest(size(w)-n, 0)), i => concat_ws(" ",
  * slice(w, i+1, n)))` formulation it replaces (Dedup.scala r3).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.WordShingles.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): WordShingles = copy(left = newLeft, right = newRight)
}

object WordShingles {

  /** Static entry point shared by interpreted + codegen paths. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // split on the space BYTE: 0x20 never occurs inside a UTF-8 multibyte
    // sequence, so this equals the regex-" " split without the regex engine
    val bytes  = text.getBytes
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nWords = starts.size()
    val last   = math.max(nWords - n, 0)
    val out    = new Array[AnyRef](last + 1)
    var w      = 0
    while (w <= last) {
      // shingle = bytes from start of word w to end of word min(w+n, nWords)-1
      val from = starts.get(w)
      val endW = math.min(w + n, nWords)
      val until =
        if (endW == nWords) bytes.length
        else starts.get(endW) - 1 // drop the trailing separator space
      out(w) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      w += 1
    }
    new GenericArrayData(Shingles.sortDedup(out))
  }
}

/** Shared sort+dedupe for the shingle/n-gram builders: one flat-array sort
  * in UTF8 binary order then adjacent-dedupe — same result as a TreeSet
  * build, without a node allocation per element.
  */
private[functions] object Shingles {
  def sortDedup(arr: Array[AnyRef]): Array[AnyRef] = {
    java.util.Arrays.sort(arr) // UTF8String.compareTo = binary order, same as array_sort
    var n = 0
    var i = 0
    while (i < arr.length) {
      if (n == 0 || arr(n - 1).asInstanceOf[UTF8String].compareTo(arr(i).asInstanceOf[UTF8String]) != 0) {
        arr(n) = arr(i)
        n += 1
      }
      i += 1
    }
    if (n == arr.length) arr else java.util.Arrays.copyOf(arr, n)
  }
}

/** `graft_word_ngrams(text, n)` — word n-grams IN ORDER, WITH duplicates:
  * the multiset counterpart of [[WordShingles]] for occurrence-counting
  * consumers (x8's repetition fractions need per-gram counts, so the
  * dedup'd builders can't serve them). Word split = every single space, as
  * [[WordShingles]]; gram i = words[i..i+n-1] joined by one space for
  * i in 0..#words-n — FULL windows only, so a text with fewer than n words
  * yields an EMPTY array (matching DuckDB's `range(1, len(a))` bigram
  * formulation, where a 1-word doc contributes no rows).
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    WordNgrams.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.WordNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): WordNgrams = copy(left = newLeft, right = newRight)
}

object WordNgrams {

  /** Static entry point shared by interpreted + codegen paths. Same
    * byte-walk word indexing as [[WordShingles.compute]], but keeps
    * duplicates, preserves document order, and emits full windows only.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes  = text.getBytes
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nWords = starts.size()
    val count  = math.max(nWords - n + 1, 0)
    val out    = new Array[AnyRef](count)
    var w      = 0
    while (w < count) {
      val from = starts.get(w)
      val endW = w + n
      val until =
        if (endW == nWords) bytes.length
        else starts.get(endW) - 1 // drop the trailing separator space
      out(w) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_ngrams(text, n)` — sorted distinct character n-grams,
  * counted in CODE POINTS (the unit Spark's `substr` and DuckDB's `substr`
  * agree on): gram i = chars[i..i+n-1] clamped to the end, for i in
  * 0..max(#chars-n, 0) — identical to the
  * `transform(sequence(1, greatest(length(text)-(n-1), 1)), i =>
  * substr(text, i, n))` formulation it replaces (Dedup.scala r3).
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    CharNgrams.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.CharNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): CharNgrams = copy(left = newLeft, right = newRight)
}

object CharNgrams {

  /** Static entry point shared by interpreted + codegen paths. One linear
    * byte walk records every code-point boundary, then each gram is a byte
    * range copy — O(len) boundary work total, never a per-gram re-scan.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets + end sentinel (#code points <= #bytes)
    val offs   = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i      = 0
    while (i < bytes.length) {
      offs(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nChars) = bytes.length
    val last = math.max(nChars - n, 0)
    val out  = new Array[AnyRef](last + 1)
    var c    = 0
    while (c <= last) {
      val from  = offs(c)
      val until = offs(math.min(c + n, nChars))
      out(c) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      c += 1
    }
    new GenericArrayData(Shingles.sortDedup(out))
  }
}
