package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's five asset checks (defs/checks.py:14-159) as a single
  * assertion report: one row per check with its measured value and verdict —
  * the post-materialization gate the orchestrator runs after each write.
  *
  * Scale notes: each check is one aggregate over the frame; the dup check
  * reuses the hash-prepass shape from a3 (12-byte shuffle key, never the
  * full row).
  */
object Checks {

  /** Quality report over an artist-index-shaped frame
    * `(artist_uri, name, start_date)`.
    */
  def artistIndexReport(index: DataFrame): DataFrame = {
    val cols  = index.columns.map(col).toSeq
    val total = count(lit(1)).cast("double")

    val counts = index.agg(
      total.as("row_count"),
      sum(when(col("artist_uri").isNull, 1).otherwise(0)).cast("double").as("null_uris"),
      sum(when(col("name").isNull, 1).otherwise(0)).cast("double").as("null_names"),
      countDistinct(col("artist_uri")).cast("double").as("distinct_uris"),
      sum(when(col("start_date").isNotNull, 1).otherwise(0)).cast("double")
        .as("dated_rows")
    )
    val dups = index
      .groupBy(xxhash64(cols: _*).as("h1"), hash(cols: _*).as("h2"))
      .count()
      .filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L)).cast("double").as("dup_rows"))

    val j = counts.crossJoin(dups)
    def row(name: String, value: org.apache.spark.sql.Column,
            passed: org.apache.spark.sql.Column): DataFrame =
      j.select(lit(name).as("check"), round(value, 6).as("value"), passed.as("passed"))

    row("row_count", col("row_count"), col("row_count") > 0)
      .unionByName(row("null_ids", col("null_uris") + col("null_names"),
        col("null_uris") + col("null_names") === 0))
      .unionByName(row("dup_rows", col("dup_rows"), col("dup_rows") === 0))
      .unionByName(row("unique_uri_ratio", col("distinct_uris") / col("row_count"),
        col("distinct_uris") === col("row_count")))
      .unionByName(row("date_completeness", col("dated_rows") / col("row_count"),
        col("dated_rows") / col("row_count") >= 0.95))
  }
}
