package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale properties the scaladocs claim
  * are asserted here against the actual executed-plan text, so a Spark
  * upgrade or refactor that silently loses a broadcast, un-pushes a filter,
  * or degrades an equi-join to a nested loop fails the build instead of
  * only showing up as a 100×-scale regression.
  *
  * Runs against sf0.001 (plan shape is scale-invariant; AQE may still
  * re-plan at runtime — these inspect the compile-time plan, which is what
  * the query declares).
  */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Count shuffle Exchange NODES in a FormattedMode plan. The node's
    * detail header is "(n) Exchange"; the partitioning argument is on a
    * separate line, so matching "Exchange hashpartitioning" matches
    * nothing (it silently made earlier count assertions vacuous) and
    * BroadcastExchange must not be counted.
    */
  private def shuffleExchanges(p: String): Int =
    raw"\(\d+\) Exchange\b".r.findAllIn(p).size

  test("b2's point lookup opens exactly one of eight bucket files") {
    val p = plan("b2_bucket_pruned_lookup")
    assert(p.contains("SelectedBucketsCount: 1 out of 8"), p.linesIterator.take(30).mkString("\n"))
    assert(shuffleExchanges(p) == 0)
  }

  test("j6 dims are broadcast (two BroadcastHashJoins, no SortMergeJoin)") {
    val p = plan("j6_broadcast_dims")
    // FormattedMode prints each node in the tree AND the detail section:
    // two joins appear as 4 mentions
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j13's binned interval join is an equi-join, never a nested loop") {
    val p = plan("j13_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s19 brute-force kNN is TakeOrderedAndProject (O(k) per partition, no full sort)") {
    val p = plan("s19_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("p4's regex filter is pushed to the parquet scan") {
    val p = plan("p4_regex_filter")
    // StartsWith pushes as a parquet filter; the scan must not be bare
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("x1 scan is column-pruned to (doc_id, text)") {
    val p = plan("x1_lang_id")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), p)
    assert(!readSchema.contains("lang") && !readSchema.contains("source"), p)
  }

  test("j12's as-of join is one Exchange on the key (no per-row subquery re-join)") {
    val p = plan("j12_asof_join")
    // signup pre-agg (2: partial+final share one Exchange) + the asof union
    // window (1) — anything above 3 means the formulation regressed
    val exchanges = shuffleExchanges(p)
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j14's forward as-of join keeps j12's one-Exchange plan class") {
    val p = plan("j14_asof_forward")
    val exchanges = shuffleExchanges(p)
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j13b's half-open interval join stays an equi-join") {
    val p = plan("j13b_range_join_exclusive")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g6 triangles: every join leg is keyed (degree orientation adds no nested loop)") {
    val p = plan("g6_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("o6's layout sort is TakeOrderedAndProject (O(k) per partition, no full sort)") {
    val p = plan("o6_zorder_layout")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x10's register build carries no join wider than the 64-bucket frame") {
    val p = plan("x10_hll_registers")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p) // 64-row sides must stay broadcast
  }

  test("enrichWithStatic plans a broadcast join in batch form") {
    import spark.implicits._
    val facts = Seq((1L, "a")).toDF("k", "v")
    val dim   = Seq((1L, "gold")).toDF("k", "tier")
    val p     = planOf(graft.streaming.StreamOps.enrichWithStatic(facts, dim, "k"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("w3 grouped top-k carries a WindowGroupLimit (rank pushed map-side)") {
    val p = plan("w3_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("g11's top-20 is TakeOrderedAndProject and every join is keyed") {
    val p = plan("g11_neighbor_jaccard")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x11's per-stratum sample carries a WindowGroupLimit (k pushed map-side)") {
    val p = plan("x11_reservoir_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("e8 sliding windows are one hash-agg chain (no self-join)") {
    val p = plan("e8_sliding_window")
    assert(!p.contains("Join"), p)
    // the 2-windows-per-event expansion is a narrow Expand/projection;
    // partial + final agg share ONE Exchange on (window, type)
    val exchanges = shuffleExchanges(p)
    assert(exchanges <= 1, s"$exchanges exchanges:\n$p")
  }

  test("j15's null-safe equality plans as a keyed join, not a nested loop") {
    val p = plan("j15_nullsafe_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a18's histogram median shuffles on the group key, never globally") {
    val p = plan("a18_hist_median")
    // "Exchange SinglePartition" never occurs contiguously in FormattedMode
    // (same trap as shuffleExchanges) — match the bare argument
    assert(!p.contains("SinglePartition"), p)
  }

  test("o7's global ids rank the big table keyed; only bucket counts go single-partition") {
    val p = plan("o7_global_ids")
    // level-1 rank: the full table shuffles on the bucket key (FormattedMode
    // prints the partitioning in the node's detail section)
    assert(p.contains("hashpartitioning(bucket"), p)
    // offsets come back via broadcast, not a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("g13's personalized PageRank passes stay keyed joins") {
    val p = plan("g13_personalized_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("g13b's frontier truncation keeps the same keyed-join shape with the filter applied") {
    val p = plan("g13b_ppr_truncated")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the per-pass integer threshold must survive into the physical plan
    assert(p.contains(">= 1000"), p)
  }

  test("e9's native session windows are one keyed shuffle, no join") {
    val p = plan("e9_session_window_native")
    assert(!p.contains("Join"), p)
    val exchanges = shuffleExchanges(p)
    assert(exchanges <= 1, s"$exchanges exchanges:\n$p")
  }

  test("c1's packing cumsum is a PARTITIONED window, never a global single-partition sort") {
    val p = plan("c1_sequence_pack")
    assert(p.contains("hashpartitioning(lang"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("c5's Bloom probe keeps the fact side narrow: broadcasts only, no SortMergeJoin") {
    val p = plan("c5_bloom_prune")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // register map + member dim both arrive by broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    // three shuffles total, none over the fact table: the ≤4-row
    // confusion-matrix aggregate plus TWO on the ≤128-row register side
    // (bit_or by word, then the collapse to the single broadcast row)
    val exchanges = shuffleExchanges(p)
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("c4's weighted sample rank is per-stratum (window keyed by lang)") {
    val p = plan("c4_weighted_sample")
    assert(p.contains("hashpartitioning(lang"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("a selective dim filter injects a runtime Bloom filter into the fact side of a shuffle join") {
    import org.apache.spark.sql.functions.{col, sum}
    // The row-level sibling of the DPP pin below: when a shuffle join's
    // build side is selectively filtered, Catalyst should pre-filter the
    // fact side with a Bloom filter (might_contain) so most rows die at the
    // scan instead of crossing the Exchange — at 100 TB that IS the join
    // cost. The thresholds exist for tiny-input protection, so lower them
    // to the test scale in a cloned session; the PIN is that the rule still
    // fires for our plan shape.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
    val lineitem = s2.read.parquet(s"$sf/lineitem.parquet")
    val part     = s2.read.parquet(s"$sf/part.parquet").filter(col("p_name").startsWith("a"))
    val p = planOf(
      lineitem
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_name"))
        .agg(sum("l_quantity"))
    )
    assert(p.contains("might_contain"), p)
  }

  test("a join on a Hive partition column injects dynamic partition pruning into the scan") {
    import org.apache.spark.sql.functions.{col, lit, substring}
    // At 100 TB the fact table is partition-laid-out (S5/m5); a join against
    // a filtered dim on the partition key must prune partitions at RUNTIME,
    // not scan everything — pin that Catalyst actually injects the DPP
    // subquery for our layout so a config/upgrade regression is caught here.
    val dir  = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val base = spark.read.parquet(s"$sf/orders.parquet")
    base.write.mode("overwrite").partitionBy("o_orderpriority").parquet(s"$dir/fact")
    base
      .select(col("o_orderpriority")).distinct()
      // NOTE: the dim filter must be a BinaryComparison — a bare boolean
      // column fails Catalyst's isLikelySelective gate and DPP is skipped
      .withColumn("tier", substring(col("o_orderpriority"), 1, 1))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim  = spark.read.parquet(s"$dir/dim").filter(col("tier") === lit("1"))
    val p = planOf(
      fact
        .join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
    )
    assert(p.contains("dynamicpruningexpression"), p)
  }
}
