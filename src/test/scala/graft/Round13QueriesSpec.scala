package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-13 additions (x26/s19h/x27, o10/a29/e19) — the
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

  test("x29: weighted TextRank differentiates and respects the damping floor") {
    val rows  = SparkEntry.queries("x29_textrank")(spark, sf).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Long]("rank_q"))
    assert(ranks.sameElements(ranks.sorted(Ordering[Long].reverse)))
    // every rank carries at least the 0.15 teleport floor on the 10^6 lattice
    ranks.foreach(r => assert(r >= 150000L))
    // the weights must actually differentiate (an unweighted walk on this
    // near-regular synthetic graph collapses to ~uniform ranks)
    assert(ranks.max > ranks.min, "weighted ranks collapsed to uniform")
  }

  test("d20: b-bit agreement dominates full agreement; planted clones stay perfect") {
    val rows = SparkEntry.queries("d20_bbit_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // dropping bits can only CREATE collisions: a full-component match is
      // always a 2-bit match
      assert(r.getAs[Long]("agree_b2") >= r.getAs[Long]("agree_full"))
      assert(r.getAs[Long]("j_b2_pm") >= 0L && r.getAs[Long]("j_b2_pm") <= 1000L)
    }
    // the planted near-dup pairs (negated ids, GRADED similarity by design)
    // stay highly ranked under 32x compression: most keep >=11/12 2-bit
    // agreement, and the top grade survives at exactly J_b2 = 1
    val planted = rows.filter(r => r.getAs[Long]("doc1") == -r.getAs[Long]("doc2") - 1)
    assert(planted.nonEmpty)
    assert(planted.count(_.getAs[Long]("agree_b2") >= 11L) * 2 > planted.length)
    assert(planted.exists(r =>
      r.getAs[Long]("agree_b2") == 12L && r.getAs[Long]("j_b2_pm") == 1000L
    ))
  }

  test("x30: Good-Turing discounts singletons and reserves unseen mass") {
    val rows = SparkEntry.queries("x30_good_turing")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byR = rows.map(r => r.getAs[Long]("r") -> r).toMap
    // the FoF head decays: singletons are the largest class
    assert(byR(1L).getAs[Long]("n_r") == rows.map(_.getAs[Long]("n_r")).max)
    // GT discounts singletons below their raw count (r*_1 < 1.0 per-mille)
    assert(byR(1L).getAs[Long]("r_star_pm") < 1000L)
    // the unseen-mass estimate is a constant probability in (0, 1)
    val p0s = rows.map(_.getAs[Long]("p0_pm")).distinct
    assert(p0s.length == 1 && p0s.head > 0L && p0s.head < 1000L)
  }

  test("o10: HRW growth moves ONLY docs won by the new shard; mod-N moves most") {
    val rows = SparkEntry.queries("o10_rendezvous_shards")(spark, sf).collect()
    // The structural guarantee: shards 0-7 lose nothing, shard 8's docs are
    // exactly the moved set.
    rows.foreach { r =>
      val shard = r.getAs[Long]("shard")
      val moved = r.getAs[Long]("hrw_moved")
      if (shard < 8) assert(moved == 0L, s"shard $shard lost docs under HRW")
      else assert(moved == r.getAs[Long]("hrw_n"), "shard 8 must be all-moved")
    }
    val hrwMoved = rows.map(_.getAs[Long]("hrw_moved")).sum
    val modMoved = rows.map(_.getAs[Long]("mod_moved")).sum
    val total    = rows.map(_.getAs[Long]("hrw_n")).sum
    assert(hrwMoved * 3 < total, "HRW moved fraction should be ~1/9")
    assert(modMoved * 2 > total, "mod-N moved fraction should be ~8/9")
  }

  test("a29: replicate means bracket the exact point estimate") {
    val rows  = SparkEntry.queries("a29_poisson_bootstrap")(spark, sf).collect()
    assert(rows.length == 33)
    val point = rows.find(_.getAs[Long]("b") == -1L).get.getAs[Long]("mean_q")
    val reps  = rows.filter(_.getAs[Long]("b") >= 0L).map(_.getAs[Long]("mean_q"))
    assert(reps.min <= point && point <= reps.max,
      "point estimate outside the replicate envelope")
    // Poisson(1) weights resample to ~n rows: every replicate's effective n
    // stays within a wide CLT bar of the corpus size.
    val n = rows.find(_.getAs[Long]("b") == -1L).get.getAs[Long]("n_eff")
    rows.filter(_.getAs[Long]("b") >= 0L).foreach { r =>
      val ne = r.getAs[Long]("n_eff")
      assert(ne * 10 > n * 7 && ne * 10 < n * 13, s"replicate n_eff $ne far from $n")
    }
  }

  test("e19: the planted drift alarms, the statistic is non-negative") {
    val rows = SparkEntry.queries("e19_cusum_drift")(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("cusum") >= 0L))
    val ptype = rows.map(_.getAs[String]("event_type")).min
    val dmax  = rows.map(_.getAs[Long]("day")).max
    val planted =
      rows.filter(r => r.getAs[String]("event_type") == ptype && r.getAs[Long]("day") >= dmax - 2)
    assert(planted.nonEmpty)
    planted.foreach(r => assert(r.getAs[Long]("alarm") == 1L, s"planted day ${r} silent"))
    assert(rows.exists(_.getAs[Long]("alarm") == 0L), "no quiet rows at all")
  }
}
