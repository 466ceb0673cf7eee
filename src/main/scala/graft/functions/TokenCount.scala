package graft.functions

/** Deterministic token-count estimator — the declared stand-in for the
  * reference's HuggingFace tokenizer length function
  * (reference: utils/data_transformation_helpers.py:161-183 measures chunk
  * length in Nomic-tokenizer tokens; no tokenizer ships in this offline
  * environment, SURVEY §7.5.4).
  *
  * Model (regex-BPE approximation, shared by engine and oracle):
  *   - an ASCII-alphanumeric run of length L counts ceil(L/4) tokens
  *     (BPE splits long words into ~4-char subword pieces);
  *   - every other non-whitespace character counts 1 token;
  *   - whitespace separates and is uncounted.
  *
  * Each character contributes at most one token, so count(s) <= s.length —
  * the bound [[ChunkText]]'s hard-cut path relies on.
  */
object TokenCount {

  def count(s: String): Int = {
    var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (isAlnum(c)) {
        var j = i + 1
        while (j < s.length && isAlnum(s.charAt(j))) j += 1
        n += (j - i + 3) / 4
        i = j
      } else {
        n += 1
        i += 1
      }
    }
    n
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
}
