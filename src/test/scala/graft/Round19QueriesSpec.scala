package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-19 changes — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round19QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s19m: inserting a delta batch preserves the degree invariant, attaches every node, makes inserts findable, and ties the full rebuild's recall") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry
      .queries("s19m_graph_insert")(spark, sf)
      .collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 8L), "ranks 1..8")
    val sims = rows.map(_.getAs[Long]("sim_q")).toSeq
    assert(sims == sims.sorted.reverse, "beam sorted by sim desc")
    val hits = rows.map(_.getAs[Long]("in_exact_topk")).sum
    assert(rows.forall(_.getAs[Long]("recall_pm") == 1000L * hits / 8L), "census = 1000·hits/8")
    val head = rows.head
    // the 1-in-16 md5 slice is a real batch on every test SF
    assert(head.getAs[Long]("n_inserted") > 0L, "empty insert batch — the census proves nothing")
    // degree invariant survives insertion: ≤ M directed links per inserted
    // node, ≤ 2·M·Δn after symmetrization
    assert(
      head.getAs[Long]("n_new_edges") <= 16L * head.getAs[Long]("n_inserted"),
      "insert may add at most 2·M edges per inserted node")
    // every inserted node found ≥1 link through the band probe (an
    // unattached insert is unreachable — data loss in a vector store)
    assert(head.getAs[Long]("attach_pm") == 1000L, "every inserted node must attach")
    // the self-recall beam must retrieve the inserted vector itself
    assert(head.getAs[Long]("self_found") == 1L, "inserted node must be findable by search")
    // incremental maintenance must not lose recall vs the full rebuild
    val flat = SparkEntry
      .queries("s19j_graph_beam")(spark, sf)
      .collect()
      .map(_.getAs[Long]("in_exact_topk"))
      .sum
    assert(hits >= flat, s"insert-maintained recall must tie the rebuild: $hits vs $flat")
    // and the top-1 must be the exact best (the query vector itself is in
    // the base slice on every test SF — md5('0') % 16 = 0)
    assert(head.getAs[Long]("in_exact_topk") == 1L, "beam top-1 must be an exact-topk member")
  }

  test("s19m: the base graph substrate excludes the delta slice — the index state the insert starts from is honestly partial") {
    import org.apache.spark.sql.functions._
    val base = SparkEntry.substrates.collectFirst {
      case (n, fn) if n == "_sub_vector_knn_graph_base" => fn(spark, sf)
    }.get
    val deltaIds = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .filter(expr("conv(substr(md5(cast(vec_id as string)), 1, 6), 16, 10) % 16 = 3"))
      .select(col("vec_id"))
    val leaked = base
      .join(deltaIds.select(col("vec_id").as("u")), Seq("u"), "left_semi")
      .count() +
      base.join(deltaIds.select(col("vec_id").as("v")), Seq("v"), "left_semi").count()
    assert(leaked == 0L, s"base graph must not contain delta nodes: $leaked edge endpoints")
  }

  test("s19n: the operating curve prices the knobs — recall weakly monotone in beam width, cost strictly monotone in width and passes") {
    val rows = SparkEntry
      .queries("s19n_operating_curve")(spark, sf)
      .collect()
      .map(r =>
        (r.getAs[Long]("beam_w"), r.getAs[Long]("n_passes")) ->
          (r.getAs[Long]("n_scored"), r.getAs[Long]("recall_pm")))
      .toMap
    assert(rows.keySet == Set(4L, 8L, 16L).flatMap(w => Set(w -> 3L, w -> 5L)))
    for (p <- Seq(3L, 5L); Seq(w1, w2) <- Seq(4L, 8L, 16L).sliding(2)) {
      // a wider beam is a superset search policy: it must never lose
      // recall at fixed depth (measured at every SF; the property an
      // efSearch-style knob is priced on)
      assert(rows(w1 -> p)._2 <= rows(w2 -> p)._2,
        s"recall regressed widening $w1->$w2 at $p passes")
      assert(rows(w1 -> p)._1 < rows(w2 -> p)._1,
        s"candidate cost must strictly grow with beam width ($w1->$w2 at $p passes)")
    }
    for (w <- Seq(4L, 8L, 16L)) {
      assert(rows(w -> 3L)._1 < rows(w -> 5L)._1,
        s"candidate cost must strictly grow with passes (beam $w)")
      assert(rows(w -> 3L)._2 <= rows(w -> 5L)._2,
        s"beam quality is monotone in passes — the beam is always a candidate (beam $w)")
    }
    // the sweep must show real separation (beam 4 under-converges, the
    // wide end converges) or the audit prices nothing
    assert(rows(4L -> 5L)._2 < rows(16L -> 5L)._2, "the curve must separate its endpoints")
  }

  test("s19o: the second entry buys the 8th hit the single-entry beam never finds, and fusion never loses recall vs s19j") {
    val rows = SparkEntry.queries("s19o_multi_entry")(spark, sf).collect()
    assert(rows.length == 8)
    val hits = rows.map(_.getAs[Long]("in_exact_topk")).sum
    val flat = SparkEntry
      .queries("s19j_graph_beam")(spark, sf)
      .collect()
      .map(_.getAs[Long]("in_exact_topk"))
      .sum
    assert(hits >= flat, s"fusion is a superset policy — it must not lose recall: $hits vs $flat")
    // the motivating measurement: at the small SFs the antipodal entry
    // finds the member s19j's entry never reaches (875 -> 1000 pm)
    assert(hits == 8L, s"two entries must reach full recall on this corpus: $hits/8")
    assert(rows.forall(_.getAs[Long]("recall_pm") == 1000L))
    // provenance flags are meaningful: every row came from at least one
    // beam, and BOTH beams contributed somewhere (else the fusion is moot)
    rows.foreach(r =>
      assert(r.getAs[Long]("from_a") + r.getAs[Long]("from_b") >= 1L, "unsourced fused row"))
    assert(rows.exists(_.getAs[Long]("from_b") == 1L),
      "entry B must contribute — otherwise the multi-entry story is dead weight")
  }

  test("a35: the Brier partition shows skill — beats climatology, resolution dominates reliability, and the within-bin residual is honest") {
    val r = SparkEntry.queries("a35_brier_decomposition")(spark, sf).collect()
    assert(r.length == 1)
    val row   = r.head
    val brier = row.getAs[Long]("brier_pm2")
    val rel   = row.getAs[Long]("rel_pm2")
    val res   = row.getAs[Long]("res_pm2")
    val unc   = row.getAs[Long]("unc_pm2")
    val resid = row.getAs[Long]("resid_pm2")
    assert(brier > 0L && brier < 1000000L)
    // SKILL: the classifier must beat the no-skill climatology forecast
    assert(brier < unc, s"Brier $brier must undercut climatology $unc")
    // skilled-but-miscalibrated — the a31+a34 story in one partition
    assert(res > rel, s"resolution $res must dominate reliability $rel")
    assert(rel > 0L, "a34 measured real miscalibration; REL must see it too")
    // the binned identity does NOT close (p varies within bins) — the
    // residual is the honest within-bin variance term, not an error
    assert(resid > 0L, s"within-bin residual must be positive here: $resid")
    assert(brier == rel - res + unc + resid, "partition must reassemble exactly")
  }

  test("a34: clean mass sits near-calibrated, every junk bin is underconfident, and the ECE rollup is a real nonzero weighted sum") {
    val rows = SparkEntry.queries("a34_calibration_ece")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ece = rows.head.getAs[Long]("ece_pm")
    assert(rows.forall(_.getAs[Long]("ece_pm") == ece), "census constant across rows")
    assert(ece > 0L && ece < 100L,
      s"junk is rare, so the weighted ECE must be small but nonzero: $ece")
    val byBin = rows.map(r => r.getAs[Long]("bin") -> r).toMap
    assert(byBin.contains(0L), "the clean mass must occupy the low-probability bin")
    assert(byBin(0L).getAs[Long]("n_junk") == 0L, "no junk may look confidently clean")
    assert(byBin(0L).getAs[Long]("gap_pm") < 100L, "bin 0 is nearly calibrated")
    val junkBins = rows.filter(_.getAs[Long]("n_junk") > 0L)
    assert(junkBins.nonEmpty, "the planted junk must land somewhere")
    junkBins.foreach { r =>
      // the expected miscalibration direction: observed junk rate exceeds
      // the predicted probability — the squash UNDER-calls junk certainty
      assert(r.getAs[Long]("junk_rate_pm") == 1000L, "junk bins hold only junk on this corpus")
      assert(r.getAs[Long]("mean_p_pm") < r.getAs[Long]("junk_rate_pm"),
        s"junk bin ${r.getAs[Long]("bin")} must be underconfident")
      assert(r.getAs[Long]("bin") >= 2L, "junk must land in the predicted-junk half")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_pm") ==
        math.abs(r.getAs[Long]("junk_rate_pm") - r.getAs[Long]("mean_p_pm")))
      assert(r.getAs[Long]("mean_p_pm") >= 0L && r.getAs[Long]("mean_p_pm") <= 1000L)
    }
  }
}
