package graft.operators

/** The 126-bit / k = 2 Bloom-filter bit math shared by the batch
  * data-skipping census (IOQueries s33) and the streaming manifest
  * maintenance (StreamOps.bloomManifest) — one definition, the MinHashOps
  * discipline, so a manifest built incrementally by a stream and one
  * rebuilt in batch are bit-identical BY CONSTRUCTION, not by test luck.
  *
  * Geometry: two 63-bit long words (bit 63 of a 64-bit word would
  * overflow DuckDB's checked BIGINT shift where Spark wraps — engine
  * parity picks the filter size), k = 2 positions per key from
  * '#1'/'#2'-salted md5. Everything here is an expression STRING so both
  * the DataFrame API and the DuckDB oracle mirror the same arithmetic;
  * each builder takes its input column names as parameters so the SQL
  * resolves against exactly the columns the caller passes, never against
  * a same-named bystander.
  *
  * Why the streaming face is trivial-by-algebra: bit_or is commutative,
  * associative, and idempotent, so the running streaming aggregate over
  * any micro-batch arrival order — including replays after a crash —
  * equals the batch Bloom of everything seen. A manifest op whose merge
  * is a semilattice join needs no reconciliation logic at all; that is
  * WHY lakehouse formats ship Blooms and not, say, counting filters for
  * this job (a counter merge is not idempotent under replay).
  */
object BloomOps {

  /** Total filter bits (two 63-bit words). */
  val Bits = 126

  /** Bit position of hash j ∈ {1, 2} for the string column named `key`. */
  def posExpr(key: String, j: Int): String =
    s"cast(conv(substring(md5(concat($key, '#$j')), 1, 6), 16, 10) as bigint) % $Bits"

  /** Bit position of hash j for the conventional key column `w`. */
  def posExpr(j: Int): String = posExpr("w", j)

  /** OR-aggregate of 63-bit word `word` (0 or 1) over the position column
    * named `pos`.
    */
  def orAgg(word: Int, pos: String): String =
    s"bit_or(CASE WHEN $pos div 63 = $word THEN shiftleft(1L, cast($pos % 63 as int)) ELSE 0L END)"

  /** OR-aggregate of word `word` over the conventional position column `p`. */
  def orAgg(word: Int): String = orAgg(word, "p")

  /** Membership predicate — both salted positions set — over the named
    * manifest-word columns (`bits0`/`bits1`) and position columns
    * (`p1`/`p2`).
    */
  def hitExpr(bits0: String, bits1: String, p1: String, p2: String): String =
    s"""((CASE WHEN $p1 div 63 = 0 THEN shiftright($bits0, cast($p1 % 63 as int))
              ELSE shiftright($bits1, cast($p1 % 63 as int)) END) & 1) = 1
       AND ((CASE WHEN $p2 div 63 = 0 THEN shiftright($bits0, cast($p2 % 63 as int))
                  ELSE shiftright($bits1, cast($p2 % 63 as int)) END) & 1) = 1"""

  /** Membership predicate over the conventional (bits0, bits1, p1, p2). */
  def hitExpr: String = hitExpr("bits0", "bits1", "p1", "p2")
}
