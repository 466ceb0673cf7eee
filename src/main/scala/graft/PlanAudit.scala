package graft

/** Diagnostic main: prints the formatted physical plan of the named queries
  * (all of them with no args) so plan regressions — a lost broadcast, a
  * filter that stopped reaching the scan, a WholeStageCodegen break — are
  * reviewable per round. Usage:
  *   sbt "runMain graft.PlanAudit s19_knn_cosine d1_minhash_candidates"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
