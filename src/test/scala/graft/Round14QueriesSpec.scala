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

  test("c29: importance weights recover the planted domain exactly") {
    val rows = SparkEntry.queries("c29_dsir_importance")(spark, sf).collect()
    val byStratum = rows.map(r => r.getAs[String]("stratum") -> r).toMap
    assert(byStratum.keySet == Set("natural", "planted_domain"))
    val planted = byStratum("planted_domain")
    val natural = byStratum("natural")
    assert(planted.getAs[Long]("n_docs") == 20L)
    // every planted in-domain doc selects; naturals (a disjoint planted
    // vocabulary) do not outscore them
    assert(planted.getAs[Long]("sel_pm") == 1000L)
    assert(planted.getAs[Long]("sel_pm") > natural.getAs[Long]("sel_pm"))
    assert(planted.getAs[Long]("min_score_q") > natural.getAs[Long]("max_score_q"))
  }

  test("a30: Neyman shares are a proper allocation and differ from proportional") {
    val rows = SparkEntry.queries("a30_neyman_allocation")(spark, sf).collect()
    assert(rows.length >= 2)
    val neyman = rows.map(_.getAs[Long]("neyman_pm"))
    val prop   = rows.map(_.getAs[Long]("prop_pm"))
    // floor-quantized shares: each sums to at most 10^6 and within one
    // per-mille-of-a-million per stratum of it
    assert(neyman.sum <= 1000000L && neyman.sum > 1000000L - 1000L * rows.length)
    assert(prop.sum <= 1000000L && prop.sum > 1000000L - 1000L * rows.length)
    // the variance signal must actually move the budget somewhere
    assert(
      rows.exists(r => r.getAs[Long]("neyman_pm") != r.getAs[Long]("prop_pm")),
      "Neyman allocation collapsed to proportional - variance signal lost"
    )
    rows.foreach(r => assert(r.getAs[Long]("sd_q") >= 0L && r.getAs[Long]("n_alloc") >= 0L))
  }

  test("g21: hubs are suppliers, authorities are parts, and the lattice is normalized") {
    val rows = SparkEntry.queries("g21_hits")(spark, sf).collect()
    val hubs  = rows.filter(_.getAs[String]("facet") == "hub")
    val auths = rows.filter(_.getAs[String]("facet") == "auth")
    assert(hubs.length == 10 && auths.length == 10)
    hubs.foreach(r => assert(r.getAs[String]("node_id").startsWith("s:")))
    auths.foreach(r => assert(r.getAs[String]("node_id").startsWith("p:")))
    // L-infinity normalization: every score in (0, scale], the top of each
    // facet exactly at the lattice ceiling
    (hubs ++ auths).foreach { r =>
      val sc = r.getAs[Long]("score_q")
      assert(sc > 0L && sc <= 1000000L)
    }
    assert(hubs.map(_.getAs[Long]("score_q")).max == 1000000L)
    assert(auths.map(_.getAs[Long]("score_q")).max == 1000000L)
  }

  test("o11: growing the ring 8→9 moves keys ONLY to the new shard, about 1/9 of them") {
    val rows = SparkEntry.queries("o11_consistent_ring")(spark, sf).collect()
    assert(rows.length == 9)
    val byShard = rows.map(r => r.getAs[Long]("shard") -> r).toMap
    // stability: every moved key moved TO shard 8 — structural in the ring
    (0L to 7L).foreach { sh =>
      assert(byShard(sh).getAs[Long]("ring_moved") == 0L, s"shard $sh moved keys")
    }
    val n     = rows.map(_.getAs[Long]("ring_n")).sum
    val moved = byShard(8L).getAs[Long]("ring_moved")
    // shard 8 owns exactly what it stole (it didn't exist before)
    assert(moved == byShard(8L).getAs[Long]("ring_n"))
    // expected share = 64/576 = 1/9; allow generous vnode variance
    assert(moved * 100 / n >= 4 && moved * 100 / n <= 22, s"moved $moved of $n")
  }
}
