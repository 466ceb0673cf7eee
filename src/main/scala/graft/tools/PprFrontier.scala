package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine

/** Dev utility: measures g13/g13b's per-pass FRONTIER (rank-frame row
  * count) with and without the ε-truncation, answering "does the
  * truncation threshold actually bound the frontier at scale, or is
  * ε = 1000 a no-op at this graph's density?" — the soak-watchlist
  * question for g13b. Prints one line per (ε, pass): frontier rows,
  * rows pruned by the threshold that pass, and the supplier/part split.
  *
  * Usage: `sbt "runMain graft.tools.PprFrontier [sfDir]"`.
  */
object PprFrontier {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Engine
      .table(spark, dir, "lineitem")
      .select(
        concat(lit("s:"), col("l_suppkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst")
      )
      .distinct()
    val edges =
      base.unionByName(base.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Engine
      .table(spark, dir, "supplier")
      .filter(col("s_nationkey") === 0)
      .select(concat(lit("s:"), col("s_suppkey")).as("id"))

    val ed     = graft.Lineage.truncate(edges.select(col("src"), col("dst")))
    val outDeg = ed.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val e      = graft.Lineage.truncate(ed.join(outDeg, "src").repartition(col("src")))
    val scale  = 1000000L
    val tp     = graft.Lineage.truncate(seeds.select(col("id"), lit(15L * scale / 100).as("tp")))
    val nVerts = ed.select("src").distinct().count()
    println(s"[ppr] dir=$dir vertices=$nVerts edges=${ed.count()} seeds=${tp.count()}")

    Seq(0L, 1000L).foreach { epsilon =>
      var r = tp.select(col("id"), lit(scale).as("r"))
      (1 to 3).foreach { i =>
        val contrib = e
          .join(r, e("src") === r("id"))
          .select(e("dst").as("id"), expr("r div od").as("c"))
          .groupBy("id")
          .agg(sum(col("c")).as("s"))
        val merged = tp
          .join(contrib, Seq("id"), "full_outer")
          .select(
            col("id"),
            (coalesce(col("tp"), lit(0L)) +
              expr("(85 * coalesce(s, 0)) div 100")).as("r")
          )
        val next   = if (epsilon > 0L) merged.filter(col("r") >= epsilon) else merged
        val total  = merged.count()
        val kept   = next.count()
        val nSupp  = next.filter(col("id").startsWith("s:")).count()
        println(
          s"[ppr] eps=$epsilon pass=$i reached=$total kept=$kept pruned=${total - kept} " +
            s"(suppliers=$nSupp parts=${kept - nSupp}) coverage=${"%.1f".format(100.0 * kept / nVerts)}%"
        )
        r = next
      }
    }
    spark.stop()
  }
}
