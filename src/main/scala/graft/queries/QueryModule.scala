package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries from SURVEY.md §2's operator inventory, each with
  * (where SQL-expressible) an equivalent DuckDB oracle statement over the same
  * parquet tables. Column names/aliases MUST match between the Spark result
  * and the oracle — the harness sorts columns by name before hashing.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Named builders for the module's cross-query Memo-shared substrates
    * (the family-sweep ladder, the supplier→part bipartite edge list, the
    * d2 candidate-pair frame, …). Benchmarks force these in a visible,
    * separately-timed "substrate" phase at the start of each pass so the
    * build cost is attributed to a `_sub_*` line instead of whichever
    * consumer query happens to run first alphabetically (r16 verdict #4:
    * g4b was billed ~7 s of familySweep ladder its siblings read for
    * free). Purely an ATTRIBUTION device: totals are unchanged, Verify
    * and the correctness gate never call these, and a cold consumer still
    * builds its substrate on demand exactly as before.
    */
  def substrates: Seq[(String, (SparkSession, String) => DataFrame)] = Nil
}
