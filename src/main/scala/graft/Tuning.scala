package graft

import org.apache.spark.sql.SparkSession

/** Scoped execution-profile helpers.
  *
  * Spark's default machinery — whole-stage codegen, adaptive query
  * execution, a per-core shuffle partition count — is sized for data that
  * scales with the input. A few operators in this engine run on
  * DIMENSION-BOUNDED graphs instead: the nation-harness community ladders
  * (g8c/g8d/g8e) iterate over a 25-vertex graph that is 25 vertices at
  * every TPC-H scale factor, including the 100 TB target. For those, the
  * per-pass cost is pure fixed overhead, and the dominant term is CODEGEN
  * COMPILATION: every pass's plan hangs off a fresh checkpoint leaf, so
  * each of its ~15 stages Janino-compiles anew (~40 ms/stage, measured —
  * ProfileG8d: refineWithin 2.9 s → 1.6 s with interpreted execution).
  */
object Tuning {

  private val ProfileConfs = Seq(
    "spark.sql.adaptive.enabled"       -> "false",
    "spark.sql.shuffle.partitions"     -> "1",
    "spark.sql.codegen.wholeStage"     -> "false",
    "spark.sql.codegen.factoryMode"    -> "NO_CODEGEN"
  )

  /** Run `f` with interpreted (no-codegen), non-adaptive, single-partition
    * execution — correct ONLY for computations whose every frame is bounded
    * by a fixed dimension table. Results are identical (the flags change
    * evaluation strategy, never semantics); the profile is restored in a
    * finally block, and any lazy tail planned after restore just uses the
    * normal confs.
    *
    * Do NOT wrap scale-bearing work: a billion-edge graph needs AQE and
    * codegen. Callers are the nation-harness ladders (25 vertices at any
    * scale factor); the SF-scaled graph queries (g8b's co-supply fixed
    * point, g9's supplies PageRank) deliberately stay on the default
    * profile and are soak-covered at 32×.
    *
    * Session-global conf: a concurrent query on another thread during `f`
    * would plan under the profile too — slower, never wrong. The harness
    * runs queries sequentially; g8d's two-graph overlap wraps OUTSIDE its
    * futures.
    */
  def dimensionGraphProfile[T](spark: SparkSession)(f: => T): T = {
    val conf  = spark.conf
    val saved = ProfileConfs.map { case (k, _) => k -> conf.getOption(k) }
    ProfileConfs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
