package graft.operators

/** The 4×1024 count-min sketch bit math shared by the batch heavy-hitter
  * probe (TextAnalysis x38) and the streaming register maintenance
  * (StreamOps.cmSketchSink) — one definition, the BloomOps discipline, so
  * a sketch folded incrementally from a stream and one rebuilt in batch
  * are cell-identical BY CONSTRUCTION.
  *
  * Geometry: depth 4 (independent '|cm0'..'|cm3'-salted md5 rows — x12's
  * hash scheme), width 1024 buckets from the 24-bit md5 prefix. Everything
  * is an expression STRING parameterized on the input column name so the
  * SQL resolves against exactly the column the caller passes (the BloomOps
  * column-contract rule), and so the DuckDB oracle mirrors the identical
  * arithmetic.
  *
  * Why the streaming face needs MORE than algebra: cell counts merge by
  * ADDITION, which is commutative and associative but NOT idempotent — a
  * replayed micro-batch double-counts (the exact reason BloomOps' scaladoc
  * says lakehouse manifests ship Blooms, not counters). So unlike
  * bloomManifest, a streaming count-min sink cannot lean on the merge
  * algebra alone; it must make each batch's fold transactional. The
  * canonical foreachBatch discipline: persist the last-folded batch id
  * INSIDE the sketch table and commit both through one atomic swap —
  * a replay sees its own id already committed and skips.
  */
object CmOps {

  /** Hash rows. */
  val Depth = 4

  /** Buckets per row. */
  val Width = 1024L

  /** Bucket of hash row `j` ∈ [0, Depth) for the string column named `key`. */
  def bucketExpr(key: String, j: Int): String =
    s"cast(conv(substr(md5(concat($key, '|cm$j')), 1, 6), 16, 10) as bigint) % $Width"
}
