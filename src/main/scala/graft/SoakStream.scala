package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-ingest soak (the stream counterpart of [[Soak]]): the batch
  * soak proves query plans hold at N× data; the two CROSS-BATCH-STATEFUL
  * streaming operators need a different proof — that per-batch cost stays
  * FLAT as their persistent state grows:
  *
  *   - `dedupIngest` carries an on-disk signature index that grows with
  *     every accepted document; the claim is probe cost ∝ batch ×
  *     bucket occupancy, independent of corpus size;
  *   - `sequencePacker` carries one pack-offset cursor per language in
  *     the state store; the claim is per-batch cost ∝ batch size with
  *     state bounded by language cardinality.
  *
  * Method: drive each operator through `batches` micro-batches of
  * `perBatch` documents drawn from the sf documents table (16× the
  * StreamOpsSpec batch size by default), timing each micro-batch; report
  * the per-batch series and the late/early MEDIAN ratio (medians damp
  * scheduler noise; a growing trend means state leaked into per-batch
  * cost). Appends a "## Streaming" section to SOAK.md.
  *
  * Usage: `sbt "runMain graft.SoakStream [batches] [perBatch]"`, env
  * SPARK_GRAFT_SF_DIR overrides the source (default /root/testdata/sf0.1).
  */
object SoakStream {

  def main(args: Array[String]): Unit = {
    val batches  = args.headOption.map(_.toInt).getOrElse(20)
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val src      = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark    = Engine.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deterministic batch slices of the documents table, keyed by doc_id
    // order; collected per batch (bounded: perBatch rows each)
    val docs = Engine
      .table(spark, src, "documents")
      .select(col("doc_id"), col("text"), coalesce(col("lang"), lit("und")).as("lang"))
      .orderBy(col("doc_id"))
      .limit(batches * perBatch)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    require(
      docs.length >= batches * perBatch,
      s"need ${batches * perBatch} docs, ${docs.length} available — lower [batches]×[perBatch]"
    )

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def trend(times: Seq[Double]): (Double, Double, Double) = {
      val early = median(times.slice(2, math.max(3, times.size / 3)))
      val late  = median(times.takeRight(math.max(3, times.size / 3)))
      (early, late, late / early)
    }

    // --- dedupIngest: index grows by ~perBatch docs per batch -------------
    val ingestDir = java.nio.file.Files.createTempDirectory("graft_soak_ingest").toString
    val inDocs    = MemoryStream[(Long, String)]
    val qIngest = graft.streaming.StreamOps.dedupIngest(
      inDocs.toDF().toDF("doc_id", "text"),
      s"$ingestDir/index",
      s"$ingestDir/out",
      s"$ingestDir/ckpt"
    )
    val ingestTimes =
      try {
        (0 until batches).map { b =>
          val slice = docs.slice(b * perBatch, (b + 1) * perBatch).map(d => (d._1, d._2))
          inDocs.addData(slice: _*)
          val t0 = System.nanoTime()
          qIngest.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally qIngest.stop()
    val outRows  = spark.read.parquet(s"$ingestDir/out").count()
    val idxRows  = spark.read.parquet(s"$ingestDir/index/shingles").count()

    // --- sequencePacker: one cursor per language, state never grows -------
    import graft.streaming.StreamOps.PackIn
    val packDir = java.nio.file.Files.createTempDirectory("graft_soak_pack").toString
    val inPack  = MemoryStream[PackIn]
    val qPack = graft.streaming.StreamOps
      .sequencePacker(inPack.toDS())
      .writeStream
      .option("checkpointLocation", s"$packDir/ckpt")
      .format("parquet")
      .option("path", s"$packDir/out")
      .outputMode("append")
      .start()
    val packTimes =
      try {
        (0 until batches).map { b =>
          val slice = docs
            .slice(b * perBatch, (b + 1) * perBatch)
            .map(d => PackIn(d._3, d._1, math.max(1L, d._2.length / 4L)))
          inPack.addData(slice: _*)
          val t0 = System.nanoTime()
          qPack.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally qPack.stop()
    val packRows = spark.read.parquet(s"$packDir/out").count()

    val (ie, il, ir) = trend(ingestTimes)
    val (pe, pl, pr) = trend(packTimes)
    val bar = 3.0 // flat bar: late median within 3× early (state must not leak)
    def series(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(" ")
    val md = new StringBuilder
    md.append(s"\n## Streaming soak — $batches micro-batches × $perBatch docs ($src)\n\n")
    md.append("Per-batch wall seconds; bar = late-window median within 3× early-window median\n")
    md.append("(cross-batch state — the on-disk signature index / per-language cursors — must\n")
    md.append("not leak into per-batch cost).\n\n")
    md.append("| operator | per-batch series (s) | early med | late med | ratio | verdict |\n")
    md.append("|---|---|---|---|---|---|\n")
    md.append(
      f"| dedupIngest | ${series(ingestTimes)} | $ie%.2f | $il%.2f | $ir%.2f | ${if (ir <= bar) "pass" else "FAIL"} |%n"
    )
    md.append(
      f"| sequencePacker | ${series(packTimes)} | $pe%.2f | $pl%.2f | $pr%.2f | ${if (pr <= bar) "pass" else "FAIL"} |%n"
    )
    md.append(
      s"\ndedupIngest: $outRows rows out, index grew to $idxRows shingle rows; " +
        s"sequencePacker: $packRows rows out, state = one cursor per language.\n"
    )
    print(md)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SOAK.md"),
      md.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND
    )

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ingestDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(packDir))
    spark.stop()
    if (ir > bar || pr > bar) {
      System.err.println(f"[soak-stream] FAILED: ingest ratio $ir%.2f, packer ratio $pr%.2f")
      sys.exit(1)
    }
  }
}
