package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass signature ([[graft.functions.MinHashSig]]) must be
  * BIT-IDENTICAL to the composed explode → md5 → 12-way min-aggregate
  * formulation it replaced: every band key, candidate pair, and oracle row
  * in the dedup family depends on that equality.
  */
class MinHashSigSpec extends AnyFunSuite with SparkTestBase {

  import graft.operators.{MinHashOps => MH}

  test("native signature equals the composed explode+groupBy formulation bit for bit") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

    val native = MH.signatures(docs)

    val shx = docs
      .select(col("doc_id"), explode(MH.shingles(col("text"))).as("shingle"))
      .select(col("doc_id"), MH.hash24(col("shingle")).as("x"))
    val aggs = (0 until MH.NumHashes).map(h =>
      min((col("x") * MH.affineA(h) + MH.affineB(h)) % MH.ModP).as(s"m$h")
    )
    val composed = shx.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)

    assert(native.unionAll(composed).distinct().count() == native.count())
    assert(native.count() == docs.count())
  }

  test("null text yields a null signature row, empty array yields null") {
    import spark.implicits._
    val df = Seq((1L, "three words here"), (2L, null: String))
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        call_function("graft_minhash_sig", MH.shingles(col("text"))).as("sig")
      )
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!rows(1L) && rows(2L))
  }
}
