package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Engine.table
import graft.io.TableIO

/** SURVEY.md §2.1 S1/S3/S4/S5 + §2.7 U2 exercised end-to-end: each query
  * writes through the graft.io sink, reads back through the matching scan,
  * and returns data whose oracle is the *source* table — so a pass proves
  * the write+read pair is lossless, not just that two reads agree.
  *
  * Temp output lands under java.io.tmpdir/graft_io (the harness is the only
  * writer; mode=overwrite keeps reruns idempotent — S16 reset semantics).
  */
object IOQueries extends QueryModule {

  private def ioDir(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_io/$name"

  /** S1 — Parquet sink→scan roundtrip (atomic overwrite commit). */
  private def s1_parquet_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s1_orders")
    val src = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    TableIO.writeParquet(src, out)
    s.read.parquet(out)
  }

  /** S3+S4 — sparse JSONL sink → schema'd scan roundtrip: the nullable
    * `segment` column is dropped from odd records on disk (sparse JSON) and
    * must come back as null under the declared schema.
    */
  private def s3_jsonl_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s3_customer")
    val src = table(s, d, "customer").select(
      col("c_custkey"),
      col("c_name"),
      when(col("c_custkey") % 2 === 0, concat(lit("seg"), col("c_nationkey").cast("string")))
        .as("segment")
    )
    TableIO.writeJsonl(src, out)
    val schema = StructType(
      Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("segment", StringType)
      )
    )
    TableIO.readJsonl(s, schema, out)
  }

  /** S5+U2 — Hive-partitioned write, then a multi-path union read of two
    * selected partitions (with basePath so the partition column survives).
    */
  private def u2_partition_union(s: SparkSession, d: String): DataFrame = {
    val base  = ioDir("u2")
    val asset = "orders_by_priority"
    val src = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    TableIO.writePartitioned(src, base, asset, "o_orderpriority")
    val wanted = Seq("1-URGENT", "2-HIGH")
    val paths =
      wanted.map(p => TableIO.partitionPath(base, asset, "o_orderpriority", Some(p)))
    TableIO
      .readPartitions(s, base, asset, paths)
      .groupBy(col("o_orderpriority").cast("string").as("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        // max, not sum: float sums depend on partition merge order, so a
        // rounded sum can flap at a rounding boundary between runs
        max(col("o_totalprice")).as("max_price")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_parquet_roundtrip" -> (s1_parquet_roundtrip _),
    "s3_jsonl_roundtrip" -> (s3_jsonl_roundtrip _),
    "u2_partition_union" -> (u2_partition_union _)
  )

  val oracles: Map[String, String] = Map(
    "s1_parquet_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "s3_jsonl_roundtrip" ->
      """SELECT c_custkey, c_name,
                CASE WHEN c_custkey % 2 = 0
                     THEN 'seg' || CAST(c_nationkey AS VARCHAR) END AS segment
         FROM customer""",
    "u2_partition_union" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                max(o_totalprice) AS max_price
         FROM orders
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY o_orderpriority"""
  )
}
