package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan sweep: EVERY registered query's compile-time physical
  * plan is checked for the two join shapes that mean "a join lost its key"
  * (CartesianProduct, BroadcastNestedLoopJoin) and for unpartitioned
  * windows, so a new query or a refactor can't reintroduce a scale
  * anti-pattern without either fixing it or EXPLICITLY registering the
  * exception here with its boundedness argument. PlanShapeSpec pins
  * specific queries' best plans; this spec pins the floor for all of them.
  */
class PlanSweepSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to contain a BroadcastNestedLoopJoin: every entry is a
    * broadcast of a ≤-constant-row frame (single-row scalar aggregates or a
    * bounded spine), so the "nested loop" is one pass over the fact side —
    * the scan cost, not a quadratic join.
    */
  private val bnljBounded: Set[String] = Set(
    "s19_knn_cosine",       // single-row query-vector broadcast
    "s19c_knn_ivf",         // single-row query-vector broadcast
    "s19d_knn_filtered",    // single-row query-vector broadcast
    "c5_bloom_prune",       // single-row Bloom register map broadcast
    "c8_mixture_rebalance", // single-row min-count broadcast
    "c9_importance_weights", // single-row totals broadcast
    "g7_modularity",        // single-row m / sum_d2 scalar broadcasts
    "g8_refined_modularity", // single-row before/after numerator broadcasts
    "pl4_check_report",     // ≤8-row check-report spine
    "x9_tfidf_topk",        // single-row n_docs broadcast
    "x10_hll_registers",    // single-row harmonic-sum broadcast
    "x12_cmsketch_registers", // single-row totals broadcast
    "x13_hll_union",        // 64-bucket spine × ~20-source frame
    "x14_term_coverage"     // single-row total-mass broadcast over 20 rows
  )

  /** Queries allowed an unpartitioned Window: the window input is bounded
    * by construction (limit/distinct/bucket-count) BEFORE the window runs.
    */
  private val globalWindowBounded: Set[String] = Set.empty

  test("no query plans a CartesianProduct, an unexpected BNLJ, or an unbounded global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf).queryExecution.explainString(FormattedMode)
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljBounded(name)
      // FormattedMode spells an unpartitioned window's spec with an empty
      // partition list in the Arguments line: "Arguments: [...], [x ASC...]"
      val gwin = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("Arguments:")
      ) && p.contains("SinglePartition") && !globalWindowBounded(name)
      val tags = Seq(
        if (cart) Some("CartesianProduct") else None,
        if (bnlj) Some("BNLJ") else None,
        if (gwin) Some("global-window") else None
      ).flatten
      if (tags.isEmpty) None else Some(s"$name: ${tags.mkString(", ")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
