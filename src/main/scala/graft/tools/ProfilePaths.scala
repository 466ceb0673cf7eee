package graft.tools

import graft.{Engine, Memo, SparkEntry}

/** Dev diagnostic for [[graft.graph.GraphOps.seededPaths]]' pinned-state
  * memory window (r16 verdict #5): runs g23 (the pivot-path payer) on an
  * N× key-offset replica with a block-update listener that tracks
  *
  *   - `high-water` — the max TOTAL MemoryStore bytes live at any instant
  *     (what the bounded two-generation window actually holds), and
  *   - `sum-of-generations` — the total bytes ever cached across distinct
  *     cached RDDs (what the pre-r17 code pinned simultaneously, since
  *     nothing was released before the Memo boundary).
  *
  * Usage: `sbt "runMain graft.tools.ProfilePaths [n]"` (default 64;
  * SPARK_GRAFT_SOAK_DIR reuses a prebuilt replica, as graft.Soak).
  */
object ProfilePaths {
  def main(args: Array[String]): Unit = {
    val n   = args.headOption.map(_.toInt).getOrElse(64)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = sys.env.get("SPARK_GRAFT_SOAK_DIR") match {
      case Some(d) => d
      case None =>
        val d = java.nio.file.Files.createTempDirectory("graft_paths").toString
        println(s"[prof-paths] building ${n}x replica of $src at $d")
        graft.Soak.buildScaled(spark, src, d, n)
        d
    }

    // Block-level storage tracking: live bytes per block id, the running
    // total, its max, and the per-RDD max footprint (a generation = one
    // cached RDD; the old code held every generation at once).
    val live    = new java.util.concurrent.ConcurrentHashMap[String, Long]
    val rddMax  = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    val total   = new java.util.concurrent.atomic.AtomicLong
    val hiWater = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onBlockUpdated(e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
        val b    = e.blockUpdatedInfo
        val id   = b.blockId.name
        val next = b.memSize // 0 when dropped/disk-only
        val prev = Option(if (next <= 0L) live.remove(id) else live.put(id, next)).getOrElse(0L)
        val t    = total.addAndGet(next - prev)
        hiWater.accumulateAndGet(t, math.max)
        b.blockId.asRDDId.foreach { r =>
          if (next > 0L) {
            val rid = r.rddId
            var s   = 0L
            live.forEach((k, v) => if (k.startsWith(s"rdd_${rid}_")) s += v)
            rddMax.merge(rid, s, (a, b2) => math.max(a, b2))
          }
        }
      }
    })

    (1 to 2).foreach { round =>
      Memo.clearAll()
      live.clear(); total.set(0L); hiWater.set(0L); rddMax.clear()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries("g23_sampled_betweenness")(spark, out).collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val gens = {
        import scala.jdk.CollectionConverters._
        rddMax.values().asScala.toSeq.sorted.reverse
      }
      println(
        f"[prof-paths] round $round (${n}x): ${secs}%.1f s rows=$cnt " +
          f"high-water=${hiWater.get / 1048576.0}%.0f MiB " +
          f"sum-of-generations=${gens.sum / 1048576.0}%.0f MiB " +
          s"(per-RDD MiB: ${gens.take(8).map(v => (v / 1048576.0).round).mkString(", ")})"
      )
    }
    spark.stop()
  }
}
