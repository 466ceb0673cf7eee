package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-14 additions — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round14QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("x31: applying the trained merges strictly drops tokens-per-word in every language") {
    val rows = SparkEntry.queries("x31_bpe_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val before = r.getAs[Long]("tpw_char_pm")
      val after  = r.getAs[Long]("tpw_bpe_pm")
      assert(
        after < before,
        s"lang=${r.getAs[String]("lang")}: BPE fertility $after did not drop below $before"
      )
      // merges only ever collapse symbols — totals must agree directionally too
      assert(r.getAs[Long]("symbols_bpe") < r.getAs[Long]("symbols_char"))
      assert(r.getAs[Long]("n_words") > 0)
    }
  }

  test("s19i: exact re-ranking never loses recall vs raw ADC; refine stays bounded at R") {
    val rows = SparkEntry.queries("s19i_ivfadc_rerank")(spark, sf).collect()
    assert(rows.length == 8)
    val rr = rows.head.getAs[Long]("recall_rerank_pm")
    val ra = rows.head.getAs[Long]("recall_adc_pm")
    assert(rr >= ra, s"re-ranked recall $rr fell below raw ADC recall $ra")
    // the refine join is bounded at R = 4k candidates
    assert(rows.head.getAs[Long]("n_reranked") <= 32)
    // output is the exact-rank top-k, ranks dense from 1
    assert(rows.map(_.getAs[Long]("exact_rank")).sorted.sameElements(1L to 8L))
    rows.foreach(r => assert(r.getAs[Long]("adc_rank") >= 1 && r.getAs[Long]("adc_rank") <= 32))
  }

  test("x32: expansion list is 5 deterministic non-query terms and movement flags are consistent") {
    val rows = SparkEntry.queries("x32_prf_expansion")(spark, sf).collect()
    assert(rows.length == 20)
    val terms = rows.head.getAs[String]("expansion_terms").split(",")
    assert(terms.length == 5)
    assert(terms.toSet.intersect(Set("spark", "vector", "hash")).isEmpty)
    // all rows carry the same expansion list (a query-level constant)
    assert(rows.map(_.getAs[String]("expansion_terms")).distinct.length == 1)
    rows.foreach { r =>
      val old     = r.getAs[Long]("rank_old")
      val entered = r.getAs[Long]("entered")
      assert((old == 0L) == (entered == 1L), "entered flag disagrees with rank_old")
      assert(old >= 0L && old <= 20L)
    }
    val ranks = rows.map(_.getAs[Long]("rank_new")).sorted
    assert(ranks.sameElements(1L to 20L))
  }

  test("s32: per-action census equals the planted strata; post-merge count balances") {
    val byFacet = SparkEntry
      .queries("s32_merge_into")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("facet") -> r)
      .toMap
    assert(byFacet.keySet == Set("insert", "update", "delete", "noop", "post_table"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def stratum(m: Int): Long = docs.filter(s"doc_id % 10 = $m").count()
    assert(byFacet("update").getAs[Long]("n_rows") == stratum(0))
    assert(byFacet("delete").getAs[Long]("n_rows") == stratum(1))
    assert(byFacet("noop").getAs[Long]("n_rows") == stratum(2))
    assert(byFacet("insert").getAs[Long]("n_rows") == stratum(3))
    // read-back row count balances: snapshot + inserts - deletes
    assert(
      byFacet("post_table").getAs[Long]("n_rows") ==
        docs.count() + stratum(3) - stratum(1)
    )
    // inserted keys are the collision-proof negated ids: key checksum < 0
    assert(byFacet("insert").getAs[Long]("key_sum") < 0L)
    // tombstones carry no payload
    assert(byFacet("delete").getAs[Long]("len_sum") == 0L)
  }
}
