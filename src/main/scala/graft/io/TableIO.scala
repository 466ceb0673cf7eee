package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Library-level sinks/scans — SURVEY.md §2.1 S1–S5 (+S16 overwrite
  * semantics), the Spark-native form of the reference's I/O managers.
  *
  * Reference semantics (citations into /root/reference):
  *   - S1 Parquet sink with atomic commit + row-count metadata:
  *     defs/io_managers.py:84-120 (temp file + rename; Spark's
  *     FileOutputCommitter provides the same atomicity per job)
  *   - S2 Parquet scan with empty-relation fallback: defs/io_managers.py:122-140
  *   - S3 sparse JSONL sink (None fields dropped): defs/io_managers.py:151-212
  *     (Spark's JSON writer has ignoreNullFields=true by default; set
  *     explicitly here as declared behavior)
  *   - S4 schema'd JSONL scan: defs/io_managers.py:214-232 (explicit schema —
  *     never sampling inference, which is nondeterministic at scale)
  *   - S5 partition-path routing: defs/io_managers.py:48-73 (decade files →
  *     Hive `col=value/` layout here, giving Catalyst partition pruning)
  *   - S16 graph reset: utils/neo4j_helpers.py:103-189 → mode("overwrite")
  *
  * Scale notes: every writer goes through Spark's commit protocol (task
  * attempts + job commit → readers never see partial output — the moral
  * equivalent of the reference's temp-file+rename, but correct under
  * distributed retries). Row counts come from a post-commit metadata-only
  * scan (parquet footer count pushdown — no data read).
  */
object TableIO {

  /** S1 — atomic overwrite Parquet sink; returns the committed row count
    * (metadata-only count, as the reference records row_count metadata).
    */
  def writeParquet(df: DataFrame, path: String): Long = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  /** S2 — Parquet scan with declared-schema empty fallback when missing.
    * Existence goes through the Hadoop FileSystem for the path's scheme —
    * `java.io.File` would report false for every hdfs://, s3a://, … URI and
    * silently turn real data into an empty frame.
    */
  def readParquet(spark: SparkSession, schema: StructType, paths: String*): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val existing = paths.filter { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).exists(hp)
    }
    if (existing.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(existing: _*)
  }

  /** S3 — sparse JSONL sink: null fields are omitted per record. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("ignoreNullFields", "true").json(path)

  /** S4 — JSONL scan with explicit schema (no sampling inference). */
  def readJsonl(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 — partition-path convention: `base/asset/part=<pk>` or `base/asset`. */
  def partitionPath(base: String, asset: String, partCol: String, pk: Option[String]): String =
    pk.fold(s"$base/$asset")(v => s"$base/$asset/$partCol=$v")

  /** S5 — Hive-layout partitioned Parquet write (pruning-friendly). */
  def writePartitioned(df: DataFrame, base: String, asset: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(s"$base/$asset")

  /** U2 — multi-path union read of selected partitions; `basePath` keeps the
    * partition column in the schema.
    */
  def readPartitions(spark: SparkSession, base: String, asset: String, paths: Seq[String]): DataFrame =
    spark.read.option("basePath", s"$base/$asset").parquet(paths: _*)
}
