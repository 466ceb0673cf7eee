package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Lineage}
import graft.graph.GraphOps

/** Dev diagnostic: wall time and Spark job/stage/task counts for each
  * stage of the g8d nation-harness ladder (not part of any query path).
  * This is the measurement behind [[graft.Tuning.dimensionGraphProfile]]:
  * it showed the ladder's per-pass cost is ~15 stages × ~40 ms of
  * driver/stage overhead dominated by codegen compilation (every pass
  * plans off a fresh checkpoint leaf), which interpreted, non-adaptive,
  * single-partition execution roughly halves on 25-vertex graphs.
  *
  * Usage: `sbt "runMain graft.tools.ProfileG8d"` (SPARK_GRAFT_SF_DIR
  * overrides the dataset; two rounds are printed — read the second,
  * JIT-warm one).
  */
object ProfileG8d {
  def main(args: Array[String]): Unit = {
    val d     = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs   = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks  = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); ()
      }
    })
    val n = Engine.table(spark, d, "nation")
    def t[A](name: String)(f: => A): A = {
      val j0 = jobs.get; val s0 = stages.get; val k0 = tasks.get
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(50) // let listener events drain
      println(
        f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
          s"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}"
      ); r
    }
    // dumbbell (no ballast) — same construction as GraphQueries.dumbbellUnd
    val k = n.filter(col("n_nationkey") <= 3).select(col("n_nationkey").as("k"), lit(0).as("g"))
    val k4 = k
      .select(col("k").as("a"), col("g"))
      .join(k.select(col("k").as("b"), col("g")), "g")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    val tail = n
      .filter(col("n_nationkey") === 8 || col("n_nationkey") === 9)
      .select(
        when(col("n_nationkey") === 8, col("n_nationkey") - 5)
          .otherwise(col("n_nationkey") - 1)
          .as("a"),
        col("n_nationkey").as("b")
      )
    val verts = n.select(col("n_nationkey").as("id"))
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val und = t("truncate(und)")(Lineage.truncate(k4.unionByName(tail)))
      val lpa = t("lpa x3")(
        Lineage.truncate(
          GraphOps.labelPropagation(verts, und.select(col("a").as("src"), col("b").as("dst")), 3)
        )
      )
      val fixed = t("mergeFixedPoint(4)")(
        Lineage.truncate(GraphOps.refineMergeFixedPoint(und, lpa, maxPasses = 4))
      )
      val refined = t("refineWithin(6)")(GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6))
      t("refineWithin(6) dim-profile") {
        graft.Tuning.dimensionGraphProfile(spark)(
          GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6).collect()
        )
      }
      t("score fixed")(GraphOps.modularityComponents(und, fixed).collect())
      t("score refined")(GraphOps.modularityComponents(und, refined).collect())
    }
    spark.stop()
  }
}
