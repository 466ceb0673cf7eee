package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the text-analysis sketches that the row-hash
  * oracle can't express directly (it proves engine agreement; these prove
  * the numbers mean what they claim).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  test("x15: a skewed source diverges positively; corpus-mix sources stay near zero") {
    import spark.implicits._
    // three sources drawing the same diverse mix, one source stuck on a
    // single token — the stuck source must carry the largest, positive
    // divergence; the mix sources sit near zero (the < 2-bit surrogate
    // noise band)
    val mix = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", mix),
      (2L, "srcB", mix),
      (3L, "srcC", mix),
      (4L, "srcSkew", Seq.fill(40)("loop").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("x15spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("x15_source_divergence")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("divergence_q"))
      .toMap
    assert(out("srcSkew") > 0, s"skewed source must diverge positively, got ${out("srcSkew")}")
    Seq("srcA", "srcB", "srcC").foreach { src =>
      assert(out(src) < out("srcSkew"), s"$src (${out(src)}) should diverge less than srcSkew")
      // identical-mix sources are each 1/3 of the corpus word mass in every
      // bucket they hit: the surrogate can wobble by the floor-log2 bit, so
      // just pin "near zero" as within ±2 bits per word
      assert(math.abs(out(src)) <= 2 * 40, s"$src divergence ${out(src)} outside the noise band")
    }
  }
}
