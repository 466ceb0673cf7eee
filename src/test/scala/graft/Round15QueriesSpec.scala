package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-15 additions — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round15QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("d21: every dup group captures exactly one planted copy; keeper is a group member") {
    val rows = SparkEntry.queries("d21_semdedup")(spark, sf).collect()
    assert(rows.length == 20, s"expected the 20 planted groups, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2, "a dup group must have at least 2 members")
      assert(r.getAs[Long]("n_planted") == 1, "each planted copy pairs with its source")
    }
    // all 20 planted ids (-1 .. -20) recovered across the groups
    assert(rows.map(_.getAs[Long]("n_planted")).sum == 20)
    // the SemDeDup keep rule sometimes keeps the planted copy (farther from
    // centroid) and sometimes the natural source — both must occur, or the
    // rule degenerated into keep-min-id
    val keptPlanted = rows.count(_.getAs[Long]("kept_vec") < 0)
    assert(keptPlanted > 0 && keptPlanted < 20, s"keep rule degenerate: $keptPlanted/20 planted keepers")
  }

  test("g22: one walk per vertex, every step follows a real edge, hash choice is reproducible") {
    val rows = SparkEntry.queries("g22_deepwalk_corpus")(spark, sf).collect()
    assert(rows.nonEmpty)
    // one completed length-4 walk per co-supply vertex (no dead ends on a
    // symmetrized graph: deg >= 1 everywhere)
    assert(rows.map(_.getAs[Long]("start")).distinct.length == rows.length)
    // rebuild the ungated co-supply edge set independently and check every
    // step of every walk is a real edge
    val sp = spark.read
      .parquet(s"$sf/lineitem.parquet")
      .filter("l_linenumber = 1")
      .select("l_suppkey", "l_partkey")
      .distinct()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byPart = sp.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val edges = byPart.values
      .flatMap(ss => for (a <- ss; b <- ss if a != b) yield a -> b)
      .toSet
    rows.foreach { r =>
      val toks = r.getAs[String]("path").split(">").map(_.stripPrefix("s").toLong)
      assert(toks.length == 5, s"walk ${r.getAs[String]("path")} is not length 4")
      assert(toks.head == r.getAs[Long]("start"))
      toks.sliding(2).foreach {
        case Array(u, v) => assert(edges.contains(u -> v), s"walk step $u->$v is not an edge")
        case _           => ()
      }
      val nUnique = r.getAs[Long]("n_unique")
      assert(nUnique == toks.distinct.length.toLong)
      assert(nUnique >= 2 && nUnique <= 5)
    }
    // walk locality: on the near-clique co-supply graph at least one walk
    // must revisit a vertex (n_unique < 5) — the signal DeepWalk's window reads
    assert(rows.exists(_.getAs[Long]("n_unique") < 5))
  }

  test("x33: planted junk is strictly separated into the tail bucket") {
    val rows  = SparkEntry.queries("x33_stupid_backoff")(spark, sf).collect()
    val junk  = rows.filter(_.getAs[String]("src") == "planted_junk")
    val nat   = rows.filter(_.getAs[String]("src") == "natural")
    assert(junk.nonEmpty && nat.nonEmpty)
    // every junk doc backed off to OOV on every bigram -> tail bucket only
    assert(junk.forall(_.getAs[Long]("bucket") == 2L), "junk escaped the tail bucket")
    val junkMin = junk.map(_.getAs[Long]("min_ppl_q")).min
    val natMax  = nat.map(_.getAs[Long]("max_ppl_q")).max
    assert(junkMin > natMax, s"junk ppl $junkMin not strictly above natural max $natMax")
    // buckets are terciles of the scored population: head <= middle <= tail boundaries
    val natByBucket = nat.sortBy(_.getAs[Long]("bucket"))
    natByBucket.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_ppl_q") < b.getAs[Long]("min_ppl_q"))
      case _ => ()
    }
  }

  test("a31: the trained classifier dominates the length baseline; U2 is tie-exact") {
    val rows = SparkEntry.queries("a31_classifier_auc")(spark, sf).collect()
    assert(rows.length == 2)
    val byScorer = rows.map(r => r.getAs[String]("scorer") -> r).toMap
    assert(byScorer.keySet == Set("c26_wsum", "len_words"))
    val model = byScorer("c26_wsum")
    val base  = byScorer("len_words")
    // c26's spec pins strict score separation -> the exact AUC must be 1
    assert(model.getAs[Long]("auc_bp") == 10000L)
    assert(base.getAs[Long]("auc_bp") < model.getAs[Long]("auc_bp"))
    rows.foreach { r =>
      val u2   = r.getAs[Long]("u2")
      val nPos = r.getAs[Long]("n_pos")
      val nNeg = r.getAs[Long]("n_neg")
      assert(u2 >= 0 && u2 <= 2 * nPos * nNeg, "U2 outside its exact range")
      assert(nPos == 10, "positives are c26's 10 planted junk docs")
    }
  }

  test("d22: multi-probe recall dominates exact-bucket recall; perfect at grade 0; costed ~7x") {
    val rows = SparkEntry.queries("d22_multiprobe_lsh")(spark, sf).collect()
    assert(rows.length == 8, "one row per perturbation grade 0..7")
    rows.foreach { r =>
      assert(r.getAs[Long]("caught_mp") >= r.getAs[Long]("caught_exact"),
        s"grade ${r.getAs[Long]("grade")}: multi-probe lost a pair exact-bucket caught")
      assert(r.getAs[Long]("recall_mp_pm") >= r.getAs[Long]("recall_exact_pm"))
      // probing 7 keys can return at most 7 buckets' worth of candidates,
      // and always at least the exact bucket's
      assert(r.getAs[Long]("cand_per_q_mp") >= r.getAs[Long]("cand_per_q_exact"))
    }
    val g0 = rows.find(_.getAs[Long]("grade") == 0L).get
    assert(g0.getAs[Long]("recall_exact_pm") == 1000L, "identical copies must share the bucket")
    assert(g0.getAs[Long]("recall_mp_pm") == 1000L)
    // the paper's point: summed over the sweep, multi-probe strictly wins
    assert(rows.map(_.getAs[Long]("caught_mp")).sum > rows.map(_.getAs[Long]("caught_exact")).sum)
  }

  test("x34: every anchor gets a triplet with a strictly positive margin") {
    val rows = SparkEntry.queries("x34_hard_negatives")(spark, sf).collect()
    assert(rows.length == 20, "one triplet per anchor")
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      assert(r.getAs[Long]("pos_id") == -a - 1, "positive is the planted copy")
      assert(r.getAs[Long]("neg_id") != -a - 1 && r.getAs[Long]("neg_id") != a)
      assert(r.getAs[Long]("margin") > 0,
        s"anchor $a: hard negative overlaps ($r) as much as the true positive — batch poison")
      assert(r.getAs[Long]("margin") ==
        r.getAs[Long]("pos_overlap") - r.getAs[Long]("neg_overlap"))
      assert(r.getAs[Long]("neg_overlap") >= 1, "a mined negative must actually be confusable")
      // the DPR false-negative gate: the kept negative sits strictly below
      // 90% of the positive's overlap
      assert(r.getAs[Long]("neg_overlap") * 10 < r.getAs[Long]("pos_overlap") * 9)
      assert(r.getAs[Long]("n_excluded") >= 0)
    }
    // the gate fired somewhere: at sf0.001 at least one anchor has an
    // organic near-full-overlap neighbor that must NOT become a negative
    assert(rows.map(_.getAs[Long]("n_excluded")).sum >= 1)
  }

  test("s34: CDC census separates inserts from updates; keys vs rows multiplicity is honest") {
    val rows = SparkEntry.queries("s34_incremental_scan")(spark, sf).collect()
    val byAction = rows.map(r => r.getAs[String]("action") -> r).toMap
    assert(byAction.keySet == Set("insert", "update"))
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val nUpd = sup.filter("s_suppkey % 10 = 0 OR s_suppkey % 7 = 0").count()
    val nIns = sup.filter("s_suppkey % 5 = 0").count()
    assert(byAction("update").getAs[Long]("n_keys") == nUpd)
    assert(byAction("insert").getAs[Long]("n_keys") == nIns)
    // a key rewritten by BOTH delta generations yields two CDC rows but one key
    val dupRows = sup.filter("s_suppkey % 70 = 0").count()
    assert(
      byAction("update").getAs[Long]("n_rows_scanned") ==
        byAction("update").getAs[Long]("n_keys") + dupRows
    )
    assert(byAction("insert").getAs[Long]("n_rows_scanned") == nIns)
  }

  test("s35: counting Bloom forgets purged keys; surviving keys are never forgotten") {
    val rows = SparkEntry.queries("s35_counting_bloom")(spark, sf).collect()
    assert(rows.length == 40)
    val junk = rows.filter(_.getAs[Long]("probe_id") < 0)
    val nat  = rows.filter(_.getAs[Long]("probe_id") >= 0)
    assert(junk.length == 20 && nat.length == 20)
    // every purged-doc word was present before the purge (structural)
    assert(junk.forall(_.getAs[Long]("present_before") == 1L))
    // the filter actually forgets: at least one purged key tests absent
    // (residual positives are honest cell collisions, censused not hidden)
    assert(junk.exists(_.getAs[Long]("present_after") == 0L))
    // a SURVIVING key is never forgotten — the anti-join delete discipline:
    // decrements only touch keys whose last holder left
    nat.foreach { r =>
      assert(r.getAs[Long]("present_before") == 1L && r.getAs[Long]("present_after") == 1L)
      assert(r.getAs[Long]("min_count_after") >= 1L)
      assert(r.getAs[Long]("stale_fp") == 0L)
    }
    // stale_fp is exactly the before-and-not-after set on every row
    rows.foreach { r =>
      val expect =
        if (r.getAs[Long]("present_before") == 1L && r.getAs[Long]("present_after") == 0L) 1L
        else 0L
      assert(r.getAs[Long]("stale_fp") == expect)
      // membership and residual counts agree
      assert((r.getAs[Long]("present_after") == 1L) == (r.getAs[Long]("min_count_after") > 0L))
    }
  }

  test("s33: Bloom skipping has zero false negatives; absent probes never match truth") {
    val rows = SparkEntry.queries("s33_bloom_skipping")(spark, sf).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") >= r.getAs[Long]("n_true"), "Bloom false negative")
      assert(r.getAs[Long]("n_fp") == r.getAs[Long]("n_hit") - r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_fp") >= 0 && r.getAs[Long]("n_skipped") >= 0)
    }
    val absent  = rows.filter(_.getAs[Long]("probe_id") < 0)
    val present = rows.filter(_.getAs[Long]("probe_id") >= 0)
    assert(absent.length == 20 && present.length == 20)
    assert(absent.forall(_.getAs[Long]("n_true") == 0))
    assert(present.forall(_.getAs[Long]("n_true") >= 1))
  }
}
