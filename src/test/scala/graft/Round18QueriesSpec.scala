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
