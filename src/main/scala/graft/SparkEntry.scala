package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2 against
  * the harness tables; [[oracleSql]] holds the DuckDB-equivalent statement
  * (same column aliases — the harness sorts columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Aggregations,
    JoinsSetOps,
    WindowsFiltersSorts,
    TextOps,
    Vectors,
    Dedup,
    TextAnalysis,
    GraphQueries,
    Nested,
    IOQueries,
    Multimodal,
    PipelineQueries,
    Events,
    TemporalQueries,
    Curation
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Direct method reference (not a string-key lookup) so a rename is a
    * compile error, not a runtime NoSuchElementException.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.a7_grouped_topk_freq(spark, "/root/testdata/sf0.001")

  /** Guard against silent last-wins collisions: `flatMap(...).toMap` keeps
    * only the final entry for a duplicated key, turning an accidental copy
    * of a query name (within or across modules) into dead code with no
    * warning. Fail loudly instead.
    */
  private def uniqueToMap[V](pairs: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate $what keys: ${dups.mkString(", ")}")
    pairs.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniqueToMap(modules.flatMap(_.queries), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    uniqueToMap(modules.flatMap(_.oracles), "oracle")

  /** Cross-query Memo-shared substrate builders, for the benchmark's
    * visible substrate phase (see [[QueryModule.substrates]]). Not part of
    * the correctness surface — Verify never runs these; a cold consumer
    * still builds its substrate on demand.
    */
  def substrates: Seq[(String, (SparkSession, String) => DataFrame)] = {
    val all = modules.flatMap(_.substrates)
    uniqueToMap(all, "substrate") // loud duplicate check
    all
  }
}
