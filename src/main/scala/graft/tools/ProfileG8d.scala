package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Lineage}
import graft.graph.GraphOps

/** Scratch profiler for the g8d ladder's per-stage wall time (not shipped
  * in any query path; dev diagnostics only).
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
    def counts(): String = s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}"
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
      t("refineWithin(6) AQE-off") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6).collect()
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      t("refineWithin(6) tiny-profile") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6).collect()
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", Engine.defaultCpus)
        }
      }
      t("refineWithin(6) nocodegen") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        try GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6).collect()
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", Engine.defaultCpus)
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
      }
      t("refineWithin(6) aqe+nocodegen") {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        try GraphOps.refineWithinFixedPoint(und, fixed, maxPasses = 6).collect()
        finally {
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
      }
      t("full ladder tiny-profile") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try {
          val und2 = Lineage.truncate(k4.unionByName(tail))
          val lpa2 = Lineage.truncate(
            GraphOps
              .labelPropagation(verts, und2.select(col("a").as("src"), col("b").as("dst")), 3)
          )
          val fixed2 =
            Lineage.truncate(GraphOps.refineMergeFixedPoint(und2, lpa2, maxPasses = 4))
          GraphOps.refineWithinFixedPoint(und2, fixed2, maxPasses = 6).collect()
        } finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.set("spark.sql.shuffle.partitions", Engine.defaultCpus)
        }
      }
      t("score fixed")(GraphOps.modularityComponents(und, fixed).collect())
      t("score refined")(GraphOps.modularityComponents(und, refined).collect())
      t("countDistinct x2") {
        fixed.agg(countDistinct(col("lbl"))).collect()
        refined.agg(countDistinct(col("lbl"))).collect()
      }
    }
    // one refine pass, job-counted step by step
    locally {
      println("--- single refine pass breakdown ---")
      val und   = Lineage.truncate(k4.unionByName(tail))
      val lpa = Lineage.truncate(
        GraphOps.labelPropagation(verts, und.select(col("a").as("src"), col("b").as("dst")), 3)
      )
      val fixed = Lineage.truncate(GraphOps.refineMergeFixedPoint(und, lpa, maxPasses = 4))
      val u     = Lineage.truncate(und.select(col("a"), col("b")))
      val deg = Lineage.truncate(
        u.select(col("a").as("id"))
          .unionAll(u.select(col("b").as("id")))
          .groupBy("id")
          .agg(count(lit(1)).as("deg"))
      )
      val m    = u.count()
      val par  = Lineage.truncate(fixed.select(col("id"), col("lbl").as("parent")))
      val psz  = Lineage.truncate(par.groupBy("parent").agg(count(lit(1)).as("psz")))
      val cur  = Lineage.truncate(par.select(col("id"), col("id").as("lbl"), col("parent")))
      val xa   = cur.select(col("id").as("a"), col("lbl").as("ca"), col("parent").as("pa"))
      val xb   = cur.select(col("id").as("b"), col("lbl").as("cb"), col("parent").as("pb"))
      val within = u
        .join(xa, "a")
        .join(xb, "b")
        .filter(col("pa") === col("pb") && col("ca") =!= col("cb"))
      val half = within
        .groupBy(
          least(col("ca"), col("cb")).as("cx"),
          greatest(col("ca"), col("cb")).as("cy"),
          col("pa").as("parent")
        )
        .agg(count(lit(1)).as("e12"))
      val inter = half
        .select(col("cx").as("c1"), col("cy").as("c2"), col("parent"), col("e12"))
        .unionAll(half.select(col("cy").as("c1"), col("cx").as("c2"), col("parent"), col("e12")))
      val stats = cur
        .join(deg, "id")
        .groupBy(col("lbl"), col("parent"))
        .agg(count(lit(1)).as("sz"), sum(col("deg")).as("d"))
      val cut = inter.groupBy(col("c1")).agg(sum(col("e12")).as("cut"))
      val elig = stats
        .join(cut.select(col("c1").as("lbl"), col("cut")), Seq("lbl"), "left")
        .join(psz, "parent")
        .select(
          col("lbl"),
          col("d"),
          (lit(6L) * coalesce(col("cut"), lit(0L)) >=
            lit(1L) * col("sz") * (col("psz") - col("sz"))).as("open")
        )
      val gains = inter
        .join(elig.select(col("lbl").as("c1"), col("d").as("d1"), col("open").as("o1")), "c1")
        .join(elig.select(col("lbl").as("c2"), col("d").as("d2"), col("open").as("o2")), "c2")
        .filter(col("o1") && col("o2"))
        .withColumn("gain", lit(2 * m) * col("e12") - col("d1") * col("d2"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c1")).orderBy(col("gain").desc, col("c2").asc)
      val picks = gains
        .filter(col("gain") > 0)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c1").as("src"), col("c2").as("dst"))
      val mutual = picks
        .groupBy(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") === 2)
      val relabel = mutual.select(col("dst").as("lbl"), col("src").as("new_lbl"))
      val nextPlan = cur
        .join(relabel, Seq("lbl"), "left")
        .select(
          col("id"),
          coalesce(col("new_lbl"), col("lbl")).as("lbl"),
          col("parent"),
          col("new_lbl").isNotNull.as("chg")
        )
      val next = t("pass: truncateFresh(next)")(Lineage.truncateFresh(nextPlan))
      t("pass: chg probe")(next.filter(col("chg")).isEmpty)
      println(nextPlan.queryExecution.executedPlan.toString().take(12000))
    }
    spark.stop()
  }
}
