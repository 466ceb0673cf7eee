package graft.tools

import graft.{Engine, SparkEntry}

/** Dev diagnostic: wall time and Spark job/stage/task counts for the
  * memoized familySweep chain, measured through its memo payer
  * (`g4_summary_stub`). Two rounds are printed; read the second, JIT-warm
  * one (the memo is cleared between rounds so both pay the full chain).
  *
  * Usage: `sbt "runMain graft.tools.ProfileSweep"` (SPARK_GRAFT_SF_DIR
  * overrides the dataset, default /root/testdata/sf0.1).
  */
object ProfileSweep {
  def main(args: Array[String]): Unit = {
    val d     = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs   = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks  = new java.util.concurrent.atomic.AtomicInteger
    val perJob = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val jobT0  = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        jobT0.put(j.jobId, (System.nanoTime(), j.stageInfos.size))
        if (sys.env.contains("GRAFT_STAGE_NAMES") && j.stageInfos.size >= 14) {
          println(s"[prof-sweep] job ${j.jobId} (${j.stageInfos.size} stages):")
          j.stageInfos.sortBy(_.stageId).foreach(s => println(s"  stage ${s.stageId}: ${s.name}"))
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobT0.remove(j.jobId)).foreach { case (t0, n) =>
          perJob.add((n, (System.nanoTime() - t0) / 1000000)); ()
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); ()
      }
    })
    // GRAFT_WARMUP=1: one untimed tiny-graph pass through the SAME code
    // paths (LPA loop machinery on sf0.001) before the timed rounds —
    // measures how much of the cold-round tax is shared JIT/planning
    // infrastructure a generic warmup can absorb (r18 verdict #4).
    if (sys.env.contains("GRAFT_WARMUP")) {
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries("g4_summary_stub")(spark, "/root/testdata/sf0.001").collect().length
      graft.Memo.clearAll()
      println(f"[prof-sweep] warmup (sf0.001): ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    (1 to 2).foreach { round =>
      graft.Memo.clearAll()
      val j0 = jobs.get; val s0 = stages.get; val k0 = tasks.get
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries("g4_summary_stub")(spark, d).collect().length
      Thread.sleep(100)
      println(
        f"[prof-sweep] round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n " +
          s"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}"
      )
      if (round == 2) {
        import scala.jdk.CollectionConverters._
        val js = perJob.asScala.toSeq
        val hist = js.groupBy(_._1).toSeq.sortBy(_._1)
        hist.foreach { case (nst, g) =>
          println(f"[prof-sweep] stages/job=$nst%3d  n=${g.size}%3d  tot=${g.map(_._2).sum}%5d ms  avg=${g.map(_._2).sum / g.size}%4d ms")
        }
      }
      perJob.clear()
    }
    spark.stop()
  }
}
