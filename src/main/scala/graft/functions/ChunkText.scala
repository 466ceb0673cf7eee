package graft.functions

import scala.collection.mutable.ArrayBuffer

/** F3 — recursive character text splitter with overlap, the shape of the
  * reference's `split_text_into_chunks`
  * (reference: utils/data_transformation_helpers.py:161-183, which wraps
  * LangChain's RecursiveCharacterTextSplitter: 2048-token chunks, 512-token
  * overlap, separators ["\n\n", "\n", ". ", "? ", "! ", " ", ""]).
  *
  * Length is measured by a pluggable `measure` function:
  *   - [[chunk]] measures characters (SURVEY §7.5.4's declared default);
  *   - [[chunkBy]] with [[TokenCount.count]] measures tokens — the
  *     reference's unit, via the declared regex-BPE approximation. Piece
  *     lengths are summed across merges exactly as the reference splitter
  *     sums them.
  *
  * Semantics preserved from the reference: recurse down the separator
  * hierarchy until pieces fit, then greedily merge pieces into chunks of at
  * most `chunkSize`, carrying up to `overlap` of trailing context into the
  * next chunk.
  *
  * Pure function of its arguments — safe as a deterministic Spark UDF; runs
  * per-document on executors (embarrassingly parallel, no shuffle).
  */
object ChunkText {

  val DefaultSeparators: List[String] = List("\n\n", "\n", ". ", "? ", "! ", " ", "")

  def chunk(text: String, chunkSize: Int, overlap: Int): Seq[String] =
    chunkBy(text, chunkSize, overlap, DefaultSeparators, _.length)

  def chunk(text: String, chunkSize: Int, overlap: Int, separators: List[String]): Seq[String] =
    chunkBy(text, chunkSize, overlap, separators, _.length)

  def chunkBy(
      text: String,
      chunkSize: Int,
      overlap: Int,
      separators: List[String],
      measure: String => Int
  ): Seq[String] = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    if (text == null || text.isEmpty) Seq.empty
    else
      mergePieces(splitRecursive(text, chunkSize, separators, measure), chunkSize, overlap, measure)
        .filter(_.nonEmpty)
  }

  /** Split `text` into pieces each measuring ≤ chunkSize, using the first
    * separator in the hierarchy that makes progress, recursing on oversized
    * pieces. The hard-cut fallback groups by chunkSize CHARACTERS, which is
    * safe for any measure bounded by character count (both `_.length` and
    * [[TokenCount.count]] are).
    */
  private def splitRecursive(
      text: String,
      chunkSize: Int,
      seps: List[String],
      measure: String => Int
  ): Seq[String] =
    if (measure(text) <= chunkSize) Seq(text)
    else seps match {
      case Nil => // unsplittable run: hard-cut
        text.grouped(chunkSize).toSeq
      case "" :: _ =>
        text.grouped(chunkSize).toSeq
      case sep :: rest =>
        val parts = splitKeepingSeparator(text, sep)
        if (parts.length <= 1) splitRecursive(text, chunkSize, rest, measure)
        else parts.flatMap { p =>
          if (measure(p) <= chunkSize) Seq(p)
          else splitRecursive(p, chunkSize, rest, measure)
        }
    }

  /** Split on `sep`, keeping the separator attached to the preceding piece so
    * concatenating the pieces reproduces the input exactly.
    */
  private def splitKeepingSeparator(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(sep, start)
    while (idx >= 0) {
      out += text.substring(start, idx + sep.length)
      start = idx + sep.length
      idx = text.indexOf(sep, start)
    }
    if (start < text.length) out += text.substring(start)
    out.toSeq
  }

  /** Greedy merge of pieces into chunks measuring ≤ chunkSize, with each next
    * chunk seeded by the trailing pieces of the previous one up to `overlap`.
    *
    * After emitting a chunk, retained pieces are evicted from the front until
    * BOTH the overlap bound holds and the incoming piece fits — the
    * reference's splitter pops front pieces while
    * `total > overlap || (total + len > chunkSize && total > 0)`, so an
    * emitted chunk can never exceed chunkSize (every piece measures
    * ≤ chunkSize by construction of [[splitRecursive]]). Each piece is
    * measured exactly once.
    */
  private def mergePieces(
      pieces: Seq[String],
      chunkSize: Int,
      overlap: Int,
      measure: String => Int
  ): Seq[String] = {
    val chunks = ArrayBuffer.empty[String]
    val cur    = ArrayBuffer.empty[String]
    val lens   = ArrayBuffer.empty[Int]
    var curLen = 0

    pieces.foreach { p =>
      val pl = measure(p)
      if (curLen + pl > chunkSize && curLen > 0) {
        chunks += cur.mkString.trim
        while (curLen > overlap || (curLen + pl > chunkSize && curLen > 0)) {
          curLen -= lens.head
          cur.remove(0)
          lens.remove(0)
        }
      }
      cur += p; lens += pl; curLen += pl
    }
    if (curLen > 0) chunks += cur.mkString.trim
    chunks.toSeq
  }
}
