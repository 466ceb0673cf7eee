package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the label-aggregation family that the row-hash oracle
  * proves equal across engines but can't explain — these pin WHY the
  * answers are right (the Dawid–Skene convergence story).
  */
class AggregationSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("a28: second DS half-step prices the spammer down and flips shrink") {
    import spark.implicits._
    // The vote table is derived from doc_id alone, so a bare documents
    // spine is the whole fixture: 500 items, annotators 0-1 true-label,
    // 2-3 md5 noise, 4 the constant-label-0 spammer (built inside a28).
    val docs = (0L until 500L).toDF("doc_id")
    val dir  = tmp("a28spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("a28_ds_second_step")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("w1_bp"), r.getAs[Long]("w2_bp"),
         r.getAs[Long]("flips_12"), r.getAs[Long]("flips_23")))
      .toMap
    // Round 3 re-estimates the spammer against labels CLEANED of the very
    // ties the spammer stole in round 1, so their weight strictly drops...
    val (spamW1, spamW2, f12, f23) = out(4L)
    assert(spamW2 < spamW1, s"spammer weight must fall: $spamW1 -> $spamW2")
    // ...while the reliable pair (who vote the true label) only gains.
    for (k <- Seq(0L, 1L)) {
      val (w1, w2, _, _) = out(k)
      assert(w2 >= w1, s"reliable annotator $k must not lose weight: $w1 -> $w2")
      assert(w2 > spamW2, s"reliable $k must outrank the spammer in round 2")
    }
    // The convergence census: round 2→3 changes strictly fewer labels than
    // round 1→2 — the fixed point approaching, the argument for stopping.
    assert(f12 > 0L, "round 2 must actually flip stolen labels")
    assert(f23 < f12, s"flip count must shrink: $f12 -> $f23")
  }
}
