package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by Verify/Bench/tests.
  *
  * Tuned for the harness's single-JVM `local[N]` run but configured the way a
  * real cluster job would be: AQE on (runtime partition coalescing + skew-join
  * splitting), shuffle partition count sized to the executor core count rather
  * than the 200 default, UTC session time zone for oracle parity.
  */
object Engine {

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def builder(cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      // Shuffle partitions default to the core count (right for the sf0.1
      // harness; AQE coalesces below it), but MUST scale with data volume:
      // at a 256x soak replica, 28 partitions put ~130M rows in one
      // hash-aggregate task and OOM it (measured: g6's wedge aggregate,
      // AGGREGATE_OUT_OF_MEMORY at 48g). SPARK_GRAFT_SHUFFLE_PARTITIONS is
      // the deep-soak override — the same sizing a cluster job does by
      // data, with AQE coalescing the cheap stages back down.
      .config(
        "spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
      )
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // MEASURED AND REJECTED (r20): spark.sql.join.preferSortMergeJoin=
      // false (the tuning guide's batch-ETL baseline) was A/B'd with two
      // full back-to-back sf0.1 suite invocations — total 311.2 s → 318.7 s
      // (+2.4%). The d-family pair joins improved slightly but the
      // iterative graph family regressed hard (g8b +1.6 s, g2c +1.0 s,
      // g2/g16/g17/g21 +0.5-0.7 s each): per-pass hash-table builds on
      // small checkpoint-leaf partitions cost more than the sorts they
      // replace, and each pass re-pays it. Spark's sort-merge default
      // stays; revisit only with a per-query hint if a single join ever
      // dominates.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Reliable-checkpoint mode (Lineage): let the ContextCleaner delete
      // checkpoint files once their RDD is GC'd — iterative ops checkpoint
      // every pass, and without this the files accumulate for the session
      // lifetime. Must be set at context build time; a no-op in the default
      // localCheckpoint mode.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as epoch-nanos long and convert explicitly
      // (Events module owns the conversion).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Load one of the harness tables (`region nation customer supplier part
    * orders lineitem events documents embeddings`) from a scale-factor dir.
    *
    * `events.ts` has shipped as both TIMESTAMP(NANOS) (read as epoch-nanos
    * long under `nanosAsLong`) and plain TIMESTAMP(MICROS) (read as a
    * timestamp) across testdata generations. Downstream event-time code is
    * written against epoch-nanos longs, so normalize here — the ONE place
    * the table enters the engine — rather than branching in every query:
    * long passes through; timestamp/timestamp_ntz becomes
    * `unix_micros(ts) * 1000` (session TZ is UTC, so the cast is
    * deterministic). Pure projection — pushdown/pruning are unaffected.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Rewrite a timestamp-typed `ts` column to epoch-nanos long; leave a
    * long-typed `ts` (old NANOS testdata under nanosAsLong) untouched.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
          Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn(
          "ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000L"))
      case _ => df
    }
}
