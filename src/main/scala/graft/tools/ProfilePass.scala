package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Lineage}
import graft.graph.GraphOps

/** Dev diagnostic: isolates ONE batched merge pass on the 25-vertex
  * harness graph and splits its wall time into Spark-job execution vs
  * driver-side planning (analysis/optimization/physical planning), using
  * the listener for the former. Run under the dimension profile like the
  * family sweep does.
  *
  * Usage: `sbt "runMain graft.tools.ProfilePass"`.
  */
object ProfilePass {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobT0.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobT0.remove(j.jobId)).foreach(t0 => jobMs.addAndGet((System.nanoTime() - t0) / 1000000))
      }
    })
    import spark.implicits._
    // 25-vertex two-clique dumbbell, as a plain in-memory frame
    val edges = (for { a <- 0 to 11; b <- (a + 1) to 12 } yield (a.toLong, b.toLong)) ++
      (for { a <- 13 to 23; b <- (a + 1) to 24 } yield (a.toLong, b.toLong)) :+ (12L, 13L)
    val und   = edges.toDF("a", "b").withColumn("gm", lit(edges.size.toLong))
    val lbls  = (0L to 24L).map(i => (i, i % 5)).toDF("id", "lbl")
    graft.Tuning.dimensionGraphProfile(spark) {
      val u = Lineage.truncate(und)
      val l = Lineage.truncate(lbls)
      (1 to 3).foreach { round =>
        jobMs.set(0)
        val t0 = System.nanoTime()
        (1 to 8).foreach { _ =>
          GraphOps
            .refineMergeFixedPointBatched(u, l, 1, 1L, 1L, preMaterialized = true, probe = false)
            .count()
          ()
        }
        Thread.sleep(100)
        val wall = (System.nanoTime() - t0) / 1e6
        println(f"[prof-pass] round $round: 8 single-pass calls wall=${wall}%.0f ms  jobExec=${jobMs.get} ms  driverGap=${wall - jobMs.get}%.0f ms")
      }
    }
    spark.stop()
  }
}
