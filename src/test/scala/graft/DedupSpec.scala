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

  test("d19: planted cased contaminants are 13-gram-caught and raw-5-gram-blind") {
    val rows = SparkEntry
      .queries("d19_normalized_decontamination")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("bid") -> r)
      .toMap
    for (bid <- 0L to 5L) {
      // Every uppercased/re-punctuated copy flags under the normalized
      // 13-gram rule and is invisible to d6's raw 5-gram rule — the whole
      // point of normalizing before matching.
      assert(rows(bid).getAs[Long]("n_norm13_planted") == 1L, s"bid $bid planted miss")
      assert(rows(bid).getAs[Long]("n_raw5_planted") == 0L, s"bid $bid raw-5 should be blind")
    }
    assert(rows.size == 11) // census covers every benchmark doc, hit or not
  }
}
