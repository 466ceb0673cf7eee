package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-13 retrieval additions (x26/s19h/x27) — the
  * properties the row-hash oracle proves equal but can't explain.
  */
class Round13QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s19h: RRF rewards presence in BOTH lists over leading one list") {
    val rows = SparkEntry.queries("s19h_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 10)
    // Every fused row's score is exactly the RRF identity over its ranks.
    rows.foreach { r =>
      val dr = r.getAs[Long]("dense_rank")
      val sr = r.getAs[Long]("sparse_rank")
      val expect =
        (if (dr > 0) 1000000L / (60 + dr) else 0L) +
          (if (sr > 0) 1000000L / (60 + sr) else 0L)
      assert(r.getAs[Long]("rrf_q") == expect)
      assert(dr > 0 || sr > 0)
    }
    // A document on both lists beats a single-list #1 whenever both its
    // ranks clear the RRF crossover — and the single-list-#1 score is the
    // fixed 10^6/61 ceiling, so any both-lists row above it proves the
    // fusion actually fused (k=60 makes rank 9+30 > rank 1+absent).
    val singleListCeiling = 1000000L / 61
    val bothListWinners = rows.filter(r =>
      r.getAs[Long]("dense_rank") > 0 && r.getAs[Long]("sparse_rank") > 0 &&
        r.getAs[Long]("rrf_q") > singleListCeiling
    )
    assert(bothListWinners.nonEmpty, "no both-lists doc outranked a single-list #1")
  }

  test("x26: every returned doc contains a query term and scores are ranked") {
    val rows = SparkEntry.queries("x26_bm25_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Long]("score_q"))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    rows.foreach(r => assert(r.getAs[Long]("n_terms_hit") >= 1))
  }
}
