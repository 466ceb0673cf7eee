package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The MinHash/LSH signature machinery behind the dedup family
  * ([[graft.queries.Dedup]]) and the streaming dedup-aware ingest
  * ([[graft.streaming.StreamOps.dedupIngest]]) — factored out so batch
  * queries and the stream surface share ONE signature definition (a batch
  * corpus build and its incremental ingest must agree bit-for-bit or the
  * index is useless).
  *
  * All hashes are md5-derived: the DuckDB oracle regenerates every
  * signature exactly (the Dedup module's standing contract), and the only
  * randomness is the seed strings.
  *
  * Scale: signature computation is a narrow codegen'd projection (one md5
  * per (doc, shingle) row, map-side partial mins); band keys shuffle
  * (doc_id, key) pairs only. Candidate joins are equi-joins on the band
  * key — cost ∝ Σ bucket², never all-pairs.
  */
object MinHashOps {

  val ShingleN  = 3
  val NumHashes = 12
  val BandR     = 3 // rows per band → 4 bands
  val NumBands: Int = NumHashes / BandR
  val ModP = 2147483647L // 2^31-1, the classic Carter-Wegman prime

  /** Sorted distinct word n-gram shingles (native codegen'd builder; sorted
    * output is the `graft_sorted_intersect_size` precondition).
    */
  def shingles(c: Column): Column =
    call_function("graft_word_shingles", c, lit(ShingleN))

  /** One 24-bit integer hash per shingle string. */
  def hash24(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("long")

  /** Deterministic affine-family constants, md5-seeded so an oracle can
    * regenerate them (a forced odd, both < 2^24 ⇒ a·x < 2^48, no overflow).
    */
  def affineA(i: Int): Long = graft.functions.Md5Seed.prefixLong(s"a$i", 6) | 1L
  def affineB(i: Int): Long = graft.functions.Md5Seed.prefixLong(s"b$i", 6)

  /** (doc_id, sh) — each document's sorted shingle set. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles(col("text")).as("sh"))

  /** (doc_id, m0..m11) — the full MinHash signature table. One narrow
    * codegen'd projection per document ([[graft.functions.MinHashSig]]):
    * no explode row-blowup, no doc_id exchange. Bit-identical to the
    * composed explode → md5 → 12-way min-aggregate formulation it
    * replaced (same md5 prefix, affine constants, and modulus), so the
    * DuckDB oracle and every downstream band key are unchanged.
    */
  def signatures(docs: DataFrame): DataFrame = {
    val sig = call_function("graft_minhash_sig", shingles(col("text")))
    docs
      .select(col("doc_id"), sig.as("sig"))
      // the composed form had no row for a null-text/shingle-less doc (its
      // explode emitted nothing); keep that contract
      .where(col("sig").isNotNull)
      .select(
        col("doc_id") +:
          (0 until NumHashes).map(h => element_at(col("sig"), h + 1).as(s"m$h")): _*
      )
  }

  /** Band keys from an (already materialized) signature table — a narrow
    * projection, so callers holding a truncated `sig` pay no second
    * signature build.
    */
  def bandKeysFromSig(sig: DataFrame): DataFrame = {
    val keys = (0 until NumBands).map { b =>
      concat_ws("|", (0 until BandR).map(r => col(s"m${b * BandR + r}").cast("string")): _*)
    }
    sig
      .select(col("doc_id"), posexplode(array(keys: _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
  }

  /** (doc_id, band, band_key) — NumBands rows per document. */
  def bandKeys(docs: DataFrame): DataFrame = bandKeysFromSig(signatures(docs))

  /** Exact Jaccard between two sorted shingle-set columns (`s1`, `s2`) via
    * the native merge-scan intersect.
    */
  def jaccard(s1: Column, s2: Column): Column = {
    val inter = call_function("graft_sorted_intersect_size", s1, s2).cast("double")
    inter / (size(s1) + size(s2) - inter)
  }
}
