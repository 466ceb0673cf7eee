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
}
