package graft

/** Diagnostic main: prints the formatted physical plan of the named queries
  * (all side-effect-free ones with no args) so plan regressions — a lost
  * broadcast, a filter that stopped reaching the scan, a WholeStageCodegen
  * break — are reviewable per round. Usage:
  *   sbt "runMain graft.PlanAudit s19_knn_cosine d1_minhash_candidates"
  *
  * Roundtrip queries (sink+scan) and iterative-algorithm queries execute
  * work at construction time and their final plan is just the read-back
  * scan, so the no-args sweep skips them; name one explicitly to audit it
  * anyway.
  */
object PlanAudit {

  /** Queries whose construction runs jobs (writes or driver iterations). */
  private val sideEffecting = Set(
    "s1_parquet_roundtrip", "s3_jsonl_roundtrip", "u2_partition_union",
    "s14_graph_roundtrip", "s17_vector_upsert", "b1_bucketed_join",
    "d1_minhash_candidates", "d2_verified_pairs",
    "g2_connected_components", "g2b_label_propagation",
    "g2c_community_hierarchy", "g4_summary_stub", "g5_prompt_construction",
    "g7_modularity", "g8_refined_modularity", "g9_pagerank",
    "pl7_article_merge", "pl8_vector_ingest", "m5_modality_partitioned",
    "s4b_corrupt_capture", "s21_csv_roundtrip"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(sideEffecting)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
