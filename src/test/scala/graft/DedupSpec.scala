package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the dedup-consistent split (d14) that the DuckDB oracle's
  * value equality can't articulate on its own: the split is exhaustive
  * (every corpus doc lands in exactly one split) and leak-free BY THE
  * QUERY'S OWN MEASUREMENT (the leak_pairs audit column, not an external
  * recount).
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("d14: split is exhaustive over the corpus and has zero cross-split near-dup pairs") {
    val rows = SparkEntry.queries("d14_cluster_safe_split")(spark, sf).collect()
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "test")) && splits.nonEmpty)
    // the dedup corpus is documents plus its perturbed copy: 2x the table
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count() * 2
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // every cluster is wholly on one side, so per-split clusters <= docs
    rows.foreach(r => assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs")))
    rows.foreach(r => assert(r.getAs[Long]("leak_pairs") == 0L))
  }
}
