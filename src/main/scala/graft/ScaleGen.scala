package graft

/** Materialize an N× key-offset replica of a scale-factor dir (Soak's
  * scaling model — per-replica key offsets grow KEY CARDINALITY like a
  * larger scale factor, not per-key row counts) to a persistent path, so
  * Bench can run against a bigger scale point than the driver ships
  * (e.g. a ~sf1 surrogate from sf0.1 × 10).
  *
  * Usage: `sbt "runMain graft.ScaleGen <outDir> [n]"`; env
  * SPARK_GRAFT_SF_DIR overrides the source (default /root/testdata/sf0.1).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(sys.error("usage: ScaleGen <outDir> [n]"))
    val n   = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[scalegen] building ${n}x replica of $src at $out")
    Soak.buildScaled(spark, src, out, n)
    println(s"[scalegen] done: $out")
    spark.stop()
  }
}
