package graft.functions

import scala.collection.mutable.ArrayBuffer

/** F4 — Wikipedia plaintext section parser
  * (reference: utils/wikipedia_helpers.py:111-152): split on `== Header ==`
  * lines, emit (section, content) pairs in document order, default the
  * leading unlabelled block to "Introduction", STOP at the first excluded
  * header (References / External links / See also — reference exclusion list:
  * defs/assets/extract_artists_articles.py:35-39), and drop sections whose
  * trimmed content is shorter than `minLen`
  * (MIN_CONTENT_LENGTH=30, reference settings.py:128).
  *
  * Per-document stateful scan (the stop-at-exclusion makes it inherently
  * ordered), so it lives in a UDF: Generator/UDTF semantics via
  * `explode(parse(...))` with zero cross-row state.
  */
object ParseSections {

  val DefaultExclusions: Set[String] = Set("References", "External links", "See also")

  private val HeaderRe = "(?m)^\\s*={2,}\\s*(.+?)\\s*={2,}\\s*$".r

  /** Returns (section, content) pairs; content trimmed. Exclusion-header
    * comparison is case-insensitive, matching the reference's
    * `ex.lower() == header_clean.lower()` (wikipedia_helpers.py:146).
    */
  def parse(text: String, minLen: Int, exclusions: Set[String]): Seq[(String, String)] = {
    if (text == null || text.isEmpty) return Seq.empty
    val exLower = exclusions.map(_.toLowerCase)
    val out = ArrayBuffer.empty[(String, String)]
    var sectionName = "Introduction"
    var lastEnd = 0
    var stopped = false

    val it = HeaderRe.findAllMatchIn(text)
    while (!stopped && it.hasNext) {
      val m = it.next()
      val content = text.substring(lastEnd, m.start).trim
      if (content.length >= minLen) out += ((sectionName, content))
      val header = m.group(1).trim
      if (exLower.contains(header.toLowerCase)) stopped = true
      else { sectionName = header; lastEnd = m.end }
    }
    if (!stopped) {
      val content = text.substring(lastEnd).trim
      if (content.length >= minLen) out += ((sectionName, content))
    }
    out.toSeq
  }

  def parse(text: String, minLen: Int): Seq[(String, String)] =
    parse(text, minLen, DefaultExclusions)
}
