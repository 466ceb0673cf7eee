package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-18 changes — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round18QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s19j: the kNN-graph substrate is degree-bounded, symmetric, and self-loop-free") {
    import org.apache.spark.sql.functions._
    val g = SparkEntry.substrates.collectFirst {
      case (n, fn) if n == "_sub_vector_knn_graph" => fn(spark, sf)
    }.get
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // degree bound: ≤ M out-edges kept per node, ≤ 2M after symmetrization
    val maxDeg = g.groupBy(col("u")).count().agg(max(col("count"))).head.getLong(0)
    assert(maxDeg <= 16L, s"symmetrized degree bound 2M=16 violated: $maxDeg")
    assert(g.count() <= 16L * n, "|E| must stay under 2·M·n")
    // symmetric: every (u,v) has its (v,u) twin with the same exact sim
    val asym = g
      .join(
        g.select(col("v").as("u"), col("u").as("v"), col("sim_uv").as("sim_rev")),
        Seq("u", "v"),
        "left_anti")
      .count()
    assert(asym == 0L, s"$asym directed-only edges after symmetrization")
    assert(g.filter(col("u") === col("v")).count() == 0L, "self-loops")
  }

  test("s19j: beam output is a valid ranked top-8, the census is consistent, and the beam's best is the graph-reachable optimum") {
    val rows = SparkEntry
      .queries("s19j_graph_beam")(spark, sf)
      .collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 8L), "ranks 1..8")
    val sims = rows.map(_.getAs[Long]("sim_q")).toSeq
    assert(sims == sims.sorted.reverse, "beam sorted by sim desc")
    val hits = rows.map(_.getAs[Long]("in_exact_topk")).sum
    assert(rows.forall(_.getAs[Long]("recall_pm") == 1000L * hits / 8L), "census = 1000·hits/8")
    // the query vector itself is a stored vector reachable through the
    // symmetrized graph — a converged beam must have found it (sim to
    // itself is the global maximum on the integer lattice)
    assert(rows.head.getAs[Long]("in_exact_topk") == 1L, "beam top-1 must be an exact-topk member")
    assert(hits >= 5L, s"measured recall floor (7/8 at sf0.01/0.1, ≥5 pinned): $hits")
  }

  test("x43: pruning never removes a single-char piece (feasibility), shares sum to ~1e6, and every piece carries positive expected mass") {
    val rows = SparkEntry.queries("x43_unigram_em_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    val chars = rows.filter(_.getAs[Long]("is_char") == 1L)
    assert(chars.nonEmpty, "character alphabet must be in the inventory")
    assert(chars.forall(_.getAs[Long]("kept") == 1L),
      "FEASIBILITY: a single-char piece must never be pruned")
    // every inventory piece occurs in some segmentation (chars make all
    // words segmentable, so forward/backward counts are >= 1)
    assert(rows.forall(_.getAs[Long]("ec_q") > 0L), "zero expected mass on an inventory piece")
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum > 990000L && shareSum <= 1000000L,
      s"shares must sum to ~1e6 ppm (floor-div slack only): $shareSum")
    // the prune must actually prune something on real data, and keep the
    // bulk of the mass
    val pruned = rows.filter(_.getAs[Long]("kept") == 0L)
    assert(pruned.forall(r => r.getAs[Long]("share_ppm") < 100L && r.getAs[Long]("is_char") == 0L))
    val keptMass = rows.filter(_.getAs[Long]("kept") == 1L).map(_.getAs[Long]("share_ppm")).sum
    assert(keptMass > 900000L, s"kept pieces must hold the bulk of expected mass: $keptMass")
  }

  test("s19k: the exact control row pins the metric arithmetic, and every metric stays in range") {
    val rows = SparkEntry.queries("s19k_retrieval_metrics")(spark, sf)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("1_exact", "2_lsh", "3_ivf", "4_graph", "5_fused"))
    val ex = rows("1_exact")
    assert(ex.getAs[Long]("hits") == 8L && ex.getAs[Long]("recall_pm") == 1000L &&
      ex.getAs[Long]("mrr_q") == 1000000L && ex.getAs[Long]("p_at_4_pm") == 1000L,
      "the exact method scored against itself must be perfect — else the harness is wrong")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_returned") <= 8L)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_returned"))
      assert(r.getAs[Long]("recall_pm") <= 1000L && r.getAs[Long]("p_at_4_pm") <= 1000L)
      assert(r.getAs[Long]("mrr_q") <= 1000000L)
    }
    // the graph-routed index exists to beat the one-probe routes at recall
    // (875 vs 250/125 per-mille on the test embeddings — data-backed, and
    // the property the ladder's story rests on)
    assert(rows("4_graph").getAs[Long]("recall_pm") > rows("3_ivf").getAs[Long]("recall_pm"),
      "graph-beam must out-recall single-probe IVF here")
    assert(rows("5_fused").getAs[Long]("recall_pm") >= rows("4_graph").getAs[Long]("recall_pm"),
      "multi-entry fusion is a superset policy over the graph beam")
  }

  test("x44: the planted diverse source scores exactly 0 self-BLEU, natural sources score high — the gate separates") {
    val rows = SparkEntry.queries("x44_self_bleu")(spark, sf).collect()
    val (planted, natural) = rows.partition(_.getAs[String]("source") == "planted_diverse")
    assert(planted.length == 2, "one row per n-gram order for the planted source")
    planted.foreach { r =>
      assert(r.getAs[Long]("mean_p_pm") == 0L && r.getAs[Long]("max_p_pm") == 0L,
        "md5-unique grams can never reappear in another doc")
    }
    // the low-entropy natural corpus must sit clearly above the plant at
    // bigram order — that distance IS the gate
    val nat2 = natural.filter(_.getAs[Long]("n") == 2L)
    assert(nat2.nonEmpty && nat2.forall(_.getAs[Long]("mean_p_pm") > 500L),
      "natural sources share bigrams heavily on this corpus")
    rows.foreach(r => assert(r.getAs[Long]("mean_p_pm") <= 1000L &&
      r.getAs[Long]("max_p_pm") <= 1000L))
  }

  test("o12: z-order bounds BOTH dimensions' per-bucket spans while the linear layout is blind on the second — the reason OPTIMIZE ZORDER exists") {
    val rows = SparkEntry.queries("o12_zorder_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("linear_x", "zorder"))
    val lin = rows("linear_x"); val z = rows("zorder")
    assert(lin.getAs[Long]("n_rows") == z.getAs[Long]("n_rows"), "both layouts cover every row")
    assert(lin.getAs[Long]("span_x_pm") < z.getAs[Long]("span_x_pm"),
      "linear is (near-)perfect on its own sort column")
    assert(lin.getAs[Long]("span_y_pm") > 900L, "linear is blind on the other dimension")
    assert(z.getAs[Long]("worst_span_pm") < lin.getAs[Long]("worst_span_pm"),
      "z-order must win on the worst dimension — the whole point")
  }

  test("s19l: the hierarchical search matches the flat beam's recall with fewer full-graph passes, and the coarse layer is the declared 1-in-8 sample") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("s19l_hnsw_layers")(spark, sf).collect()
    assert(rows.length == 8)
    val hits  = rows.map(_.getAs[Long]("in_exact_topk")).sum
    val flat  = SparkEntry.queries("s19j_graph_beam")(spark, sf)
      .collect().map(_.getAs[Long]("in_exact_topk")).sum
    assert(hits >= flat, s"the hierarchy must not LOSE recall vs flat NSW: $hits vs $flat")
    val n  = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val l1 = rows.head.getAs[Long]("n_layer1")
    // 1-in-8 md5 sample: binomial around n/8 — wide band, structural check
    assert(l1 > n / 16 && l1 < n / 4, s"layer-1 size $l1 should be ~n/8 of $n")
    // and the coarse layer must genuinely be a subset graph, not a copy
    val g1 = SparkEntry.substrates.collectFirst {
      case (nm, fn) if nm == "_sub_vector_knn_graph_l1" => fn(spark, sf)
    }.get
    val offLayer = g1.filter(
      expr("conv(substr(md5(cast(u as string)), 1, 6), 16, 10) % 8 != 0")).count()
    assert(offLayer == 0L, "every coarse-graph endpoint must be a layer-1 member")
  }

  test("a33: an empty match table (no cross-policy preference pairs) returns an empty frame, not an NPE") {
    import spark.implicits._
    // every doc in the same policy class (doc_id % 8 == 0) → all pairs
    // same-policy → zero matches; pre-r18 the collected max NPE'd
    val dir = java.nio.file.Files.createTempDirectory("a33empty").toString
    (0 until 6)
      .map(i => (i * 8L, s"word$i text with some more words here to score differently $i"))
      .toDF("doc_id", "text")
      .write
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("a33_bradley_terry")(spark, dir).collect()
    assert(out.isEmpty, s"expected empty ratings, got ${out.length} rows")
  }
}
