package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan sweep: EVERY registered query's compile-time physical
  * plan (pre-AQE `sparkPlan`, walked as a tree — not text-matched) is
  * checked for the join shapes that mean "a join lost its key"
  * (CartesianProduct, BroadcastNestedLoopJoin) and for windows with an
  * EMPTY partition spec (the single-partition bottleneck), so a new query
  * or a refactor can't reintroduce a scale anti-pattern without either
  * fixing it or EXPLICITLY registering the exception here with its
  * boundedness argument. PlanShapeSpec pins specific queries' best plans;
  * this spec pins the floor for all of them.
  */
class PlanSweepSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin: every entry broadcasts a
    * ≤-constant-row frame (single-row scalar aggregates or a bounded
    * spine), so the "nested loop" is one pass over the fact side — scan
    * cost, not a quadratic join.
    */
  private val bnljBounded: Set[String] = Set(
    "s19_knn_cosine",        // single-row query-vector broadcast
    "s19c_knn_ivf",          // single-row query-vector broadcast
    "s19d_knn_filtered",     // single-row query-vector broadcast
    "c5_bloom_prune",        // single-row Bloom register map broadcast
    "c8_mixture_rebalance",  // single-row min-count broadcast
    "c9_importance_weights", // single-row totals broadcast
    "c11_outlier_gate",      // single-row sufficient-statistics broadcast
    "c14_embargo_split",     // single-row time-span (min/max) broadcast
    "e16_time_decay",        // single-row min-day + single-row grand-total broadcasts
    "g7_modularity",         // single-row m / sum_d2 scalar broadcasts
    "g8_refined_modularity", // single-row before/after numerator broadcasts
    "g8b_refined_fixed_point", // single-row LPA/pass1/fixed-point numerator broadcasts
    "pl4_check_report",      // ≤8-row check-report spine
    "x9_tfidf_topk",         // single-row n_docs broadcast
    "x10_hll_registers",     // single-row harmonic-sum broadcast
    "x12_cmsketch_registers", // single-row totals broadcast
    "x13_hll_union",         // 64-bucket spine × ~20-source frame
    "x14_term_coverage",     // single-row total-mass broadcast over 20 rows
    "x15_source_divergence", // single-row grand-total broadcast over the ≤(sources×64) frame
    "d14_cluster_safe_split", // single-row leak-count broadcast onto the ≤2-row split summary
    "x17_source_overlap_matrix", // ≤-sources-row signature broadcast (20 rows × 12 ints)
    "x20_gram_novelty_decay", // single-row max-doc-id broadcast onto the gram-first table
    "o8_range_partition_audit", // ≤7-row quantile spine + single-row boundary-array broadcasts
    "pl9_corpus_funnel", // four single-row stage-census broadcasts into the 4-row summary
    "x22_term_burstiness" // single-row n_docs broadcast over the top-32 rows
  )

  /** Queries allowed a window with an empty partition spec: the window
    * input is bounded by construction BEFORE the window runs.
    */
  private val globalWindowBounded: Set[String] = Set(
    "o2_stable_sort",     // declared bounded demo: limit upstream of the rank
    "o5_sorted_distinct", // distinct of a low-cardinality column (≤ ~500)
    "o7_global_ids",      // level-2 rank over the ≤-bucket-count offset rows
    "e12_global_disorder", // level-2 prefix max over the ≤-bucket-count spine rows
    "e13_watermark_audit", // same spine decomposition as e12, frame ends at -1
    "e14_retraction_census", // same spine decomposition as e13
    "o8_range_partition_audit", // cumulative window over value-domain-bounded histogram bins
    "p8_offset_slice",    // bounded serial stage, limit upstream
    "x14_term_coverage",  // cumulative share over the top-20 rows only
    "x18_zipf_audit",     // rank + running max over the top-32 rows only
    "x20_gram_novelty_decay" // cumulative windows over the ≤10-row decile spine
  )

  test("no query plans a CartesianProduct, an unexpected BNLJ, or an unbounded global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val cart = plan.collect { case p: CartesianProductExec => p }.nonEmpty
      val bnlj =
        plan.collect { case p: BroadcastNestedLoopJoinExec => p }.nonEmpty && !bnljBounded(name)
      val gwin =
        plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty &&
          !globalWindowBounded(name)
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
