package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector operators over `ArrayType(FloatType)` embedding columns — the
  * Spark-native form of the reference's ChromaDB cosine search
  * (reference: utils/chroma_helpers.py:83-108, scripts/query_embeddings.py:39-93,
  * cosine top-k with normalized Nomic vectors).
  *
  * Everything here is pure `functions._` composition (`zip_with` +
  * `aggregate`), so the whole scoring pipeline stays inside WholeStageCodegen:
  * no UDF, no serialization break, and Catalyst prunes the embedding column
  * scan to exactly what the score needs. All arithmetic is forced to DOUBLE
  * before summing so results are engine-portable (float32 partial sums drift
  * past a 1e-4 rounding gate; float64 does not).
  *
  * Scale notes (100 TB): brute-force scoring is a single narrow scan — the
  * only shuffle in a top-k query is the O(k)-per-partition
  * `TakeOrderedAndProject`. The LSH path ([[signBits]]) prunes candidates
  * with an equi-join on a compact bucket key, the standard
  * random-hyperplane scheme; planes are derived from md5 so any engine
  * (and the DuckDB oracle) regenerates them bit-identically.
  */
object VectorFunctions {

  /** Dot product in double precision: `Σ a_i * b_i`, a strict left fold
    * (deterministic summation order) through the native codegen'd
    * [[DotProduct]] expression — `zip_with`+`aggregate` compute the same
    * value but are CodegenFallback (interpreted lambda per element).
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))

  /** Euclidean norm in double precision. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (no normalization assumption). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic pseudo-random value in [-0.5, 0.5) from a seed string:
    * first 6 md5 hex digits scaled by 2^24. Any engine with md5 reproduces
    * it exactly (DuckDB: `('0x' || substr(md5(s),1,6))::BIGINT / 16777216.0 - 0.5`).
    */
  def hashUnit(seed: String): Double =
    Md5Seed.prefixLong(seed, 6) / 16777216.0 - 0.5

  /** `nPlanes` random hyperplanes of dimension `dim`, seeded `"{p}_{j}"`. */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(nPlanes)(p => Seq.tabulate(dim)(j => hashUnit(s"${p}_${j}")))

  /** Random-hyperplane LSH bucket key: one sign bit per plane, concatenated
    * to a compact string key ("1011…"). Vectors with small angular distance
    * land in the same bucket with high probability — the 100 TB candidate
    * pruning path (an equi-join on this key replaces the all-pairs scan).
    */
  def signBits(emb: Column, planeSeq: Seq[Seq[Double]]): Column =
    concat(planeSeq.map { pl =>
      when(dot(emb, typedlit(pl)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** SQL fragment regenerating [[planes]]' plane `p` in DuckDB (for oracles). */
  def duckdbPlaneSql(p: Int, dim: Int): String =
    s"""list_transform(generate_series(0, ${dim - 1}),
        j -> (('0x' || substr(md5('${p}_' || CAST(j AS VARCHAR)), 1, 6))::BIGINT) / 16777216.0 - 0.5)"""
}
