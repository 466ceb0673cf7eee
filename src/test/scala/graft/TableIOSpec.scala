package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TableIO

/** Roundtrip tests for the I/O layer in a fresh temp dir per suite run. */
class TableIOSpec extends AnyFunSuite with SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft_io_spec").toString

  test("parquet sink returns the committed row count and roundtrips") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val n  = TableIO.writeParquet(df, s"$tmp/p1")
    assert(n == 3)
    val back = spark.read.parquet(s"$tmp/p1").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("overwrite replaces prior contents (reset semantics)") {
    import spark.implicits._
    TableIO.writeParquet(Seq((1L, "old")).toDF("id", "v"), s"$tmp/p2")
    val n = TableIO.writeParquet(Seq((9L, "new")).toDF("id", "v"), s"$tmp/p2")
    assert(n == 1)
    assert(spark.read.parquet(s"$tmp/p2").head.getLong(0) == 9L)
  }

  test("sparse JSONL drops null fields on disk but schema'd read restores them") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "opt")
    TableIO.writeJsonl(df, s"$tmp/j1")
    val raw = spark.read.text(s"$tmp/j1").collect().map(_.getString(0)).sorted
    assert(raw.exists(_.contains("\"opt\"")) && raw.exists(!_.contains("\"opt\"")))
    val schema =
      StructType(Seq(StructField("id", LongType), StructField("opt", StringType)))
    val back = TableIO.readJsonl(spark, schema, s"$tmp/j1")
    assert(back.count() == 2)
    assert(back.filter("opt IS NULL").count() == 1)
  }

  test("missing parquet path falls back to an empty frame with the declared schema") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val df     = TableIO.readParquet(spark, schema, s"$tmp/does_not_exist")
    assert(df.schema == schema && df.count() == 0)
  }

  test("partially-missing multi-path read drops quietly by default, throws in strict mode") {
    import spark.implicits._
    val schema =
      StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    TableIO.writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$tmp/p3")
    // default: the existing path's data comes back, the missing one is logged
    val loose = TableIO.readParquet(spark, schema, s"$tmp/p3", s"$tmp/absent")
    assert(loose.count() == 2)
    // strict: a typo'd path is an error, not silent partial data
    intercept[java.io.FileNotFoundException] {
      TableIO.readParquetStrictly(spark, schema, strict = true, s"$tmp/p3", s"$tmp/absent")
    }
  }

  test("compact merges a fragmented table without changing its contents") {
    import spark.implicits._
    val frag = (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v").repartition(50)
    frag.write.mode("overwrite").parquet(s"$tmp/frag")
    val (before, after, rows) = TableIO.compact(spark, s"$tmp/frag", targetRowsPerFile = 100)
    assert(before == 50 && after == 5 && rows == 500)
    val back = spark.read.parquet(s"$tmp/frag")
    assert(back.count() == 500)
    assert(back.select("id").as[Long].collect().sorted.sameElements(0L until 500L))
  }

  test("partition routing convention and partitioned write/read") {
    import spark.implicits._
    assert(
      TableIO.partitionPath("/b", "asset", "decade", Some("1990s")) == "/b/asset/decade=1990s"
    )
    assert(TableIO.partitionPath("/b", "asset", "decade", None) == "/b/asset")
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "part")
    TableIO.writePartitioned(df, tmp, "pt", "part")
    val back = TableIO.readPartitions(
      spark, tmp, "pt", Seq(TableIO.partitionPath(tmp, "pt", "part", Some("x"))))
    assert(back.count() == 2)
    assert(back.columns.contains("part"))
  }
}
