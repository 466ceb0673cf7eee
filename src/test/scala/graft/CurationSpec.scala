package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level invariants for the Curation module — properties the
  * DuckDB oracle can't express directly (it only proves both engines agree;
  * these prove the SEMANTICS are the intended ones).
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("c1: packing is gap-free per language stream and pack ids are cumsum-consistent") {
    val rows = run("c1_sequence_pack")
      .orderBy("lang", "doc_id")
      .collect()
      .groupBy(_.getAs[String]("lang"))
    rows.foreach { case (lang, docs) =>
      var expectedStart = 0L
      docs.foreach { r =>
        val start = r.getAs[Long]("start_off")
        val n     = r.getAs[Long]("n_tokens")
        assert(start == expectedStart, s"$lang doc ${r.getAs[Long]("doc_id")}: gap at $start")
        assert(r.getAs[Long]("pack_id") == start / 4096)
        // straddle flag ⇔ the doc's first and last token land in different packs
        val straddles = r.getAs[Int]("straddles") == 1
        assert(straddles == (start / 4096 != (start + n - 1) / 4096))
        expectedStart = start + n
      }
    }
  }

  test("c2: span cleaning preserves original word order among survivors") {
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    run("c2_span_clean").collect().foreach { r =>
      val clean = r.getAs[String]("clean_text")
      if (clean.nonEmpty) {
        // every kept span is a contiguous block of the original, in order:
        // the cleaned text must be a subsequence of the original words with
        // kept 10-word blocks intact
        val orig  = docs(r.getAs[Long]("doc_id")).split(" ")
        val spans = orig.grouped(10).toSeq
        val expected = spans
          .filter(sp => sp.distinct.length >= 5 && !sp.contains("slow"))
          .flatten
          .mkString(" ")
        assert(clean == expected)
      }
    }
  }

  test("c16: a span shared across documents is dropped wherever it sits; order preserved") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val u1     = (1 to 10).map(i => s"a$i").mkString(" ")
    val u2     = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared $u1"), // shared span at the head
      (2L, s"$u2 $shared"), // shared span at the tail
      (3L, (1 to 10).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("c16spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("c16_line_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Long]("n_spans") == 2)
    assert(out(1L).getAs[Long]("dropped_spans") == 1)
    assert(out(1L).getAs[String]("clean_text") == u1)
    assert(out(2L).getAs[Long]("dropped_spans") == 1)
    assert(out(2L).getAs[String]("clean_text") == u2)
    assert(out(3L).getAs[Long]("dropped_spans") == 0)
  }

  test("c3: a planted cross-document 5-gram is counted in both documents") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared five six seven eight nine"),
      (3L, "ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("c3spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("c3_substring_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Long]("dup_windows") == 1)
    assert(out(2L).getAs[Long]("dup_windows") == 1)
    assert(out(3L).getAs[Long]("dup_windows") == 0)
    assert(out(1L).getAs[Long]("dup_grams") == 1)
  }

  test("c4: exactly 10 seats per stratum and longer docs win more seats than uniform") {
    val out    = run("c4_weighted_sample").collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) => assert(rows.length <= 10) }
    // weighting sanity: mean n_chars of winners exceeds the corpus mean
    // (priority = hash DIV n_chars makes long docs win proportionally)
    val winnersMean =
      out.map(_.getAs[Long]("n_chars").toDouble).sum / out.length
    val corpusMean = spark.read
      .parquet(s"$sf/documents.parquet")
      .agg(avg("n_chars"))
      .head()
      .getDouble(0)
    assert(winnersMean > corpusMean, s"winners $winnersMean vs corpus $corpusMean")
  }

  test("c5: the Bloom filter produces zero false negatives") {
    val rows = run("c5_bloom_prune").collect()
    // no row with exact_member=1 and bloom_pass=0 may exist
    assert(
      !rows.exists(r => r.getAs[Int]("exact_member") == 1 && r.getAs[Int]("bloom_pass") == 0),
      rows.mkString("\n")
    )
    // and members exist and pass
    assert(rows.exists(r => r.getAs[Int]("exact_member") == 1 && r.getAs[Int]("bloom_pass") == 1))
  }

  test("c7: a document repeating a 5-gram is charged occurrences beyond the first") {
    import spark.implicits._
    val rep = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$rep zero $rep"), // the repeated gram occurs twice → self_dup 1
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("c7spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("c7_self_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Long]("self_dup") == 1)
    assert(out(1L).getAs[Long]("n_windows") == 7) // 11 words → 7 windows
    assert(out(2L).getAs[Long]("self_dup") == 0)
  }

  test("c8: rates are inversely proportional to source size and kept counts respect them") {
    val rows = run("c8_mixture_rebalance").collect()
    rows.foreach { r =>
      val rate = r.getAs[Long]("rate_q")
      assert(rate >= 1 && rate <= 10000)
      // the hash gate can't keep more than the corpus offers, and the
      // expected kept count is n_docs * rate / 10000 — allow wide slack at
      // sf0.001 sizes, but the bound must hold
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // the smallest source keeps everything
    val minRow = rows.minBy(_.getAs[Long]("n_docs"))
    assert(minRow.getAs[Long]("rate_q") == 10000)
  }

  test("c9: target-language documents score higher on average than the rest") {
    val scores = run("c9_importance_weights")
      .join(
        spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "lang"),
        "doc_id"
      )
      .collect()
    val (en, rest) = scores.partition(_.getAs[String]("lang") == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("score_q").toDouble).sum / rs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest), s"en ${mean(en)} vs rest ${mean(rest)}")
  }

  test("c10: every bucket is the tightest power of two and waste is consistent") {
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .collect()
      .map(_.getLong(0))
    val expected = docs
      .groupBy(n => if (n <= 1) 1L else java.lang.Long.highestOneBit(n - 1) << 1)
    run("c10_batch_padding").collect().foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val ns     = expected(bucket)
      assert(r.getAs[Long]("n_docs") == ns.length.toLong)
      assert(r.getAs[Long]("sum_tokens") == ns.sum)
      // tightest: every member fits and would not fit the next bucket down
      assert(ns.forall(n => n <= bucket && (bucket == 1 || n > bucket / 2)))
    }
  }

  test("c11: the integer inequality agrees with the float three-sigma rule") {
    val lens = spark.read
      .parquet(s"$sf/documents.parquet")
      .select("n_chars")
      .collect()
      .map(_.getLong(0).toDouble)
    val n    = lens.length.toDouble
    val mean = lens.sum / n
    val sd   = math.sqrt(lens.map(x => (x - mean) * (x - mean)).sum / n)
    run("c11_outlier_gate").collect().foreach { r =>
      val x        = r.getAs[Long]("n_chars").toDouble
      val expected = math.abs(x - mean) > 3 * sd
      assert((r.getAs[Int]("is_outlier") == 1) == expected, s"x=$x mean=$mean sd=$sd")
    }
  }

  test("c6: reject_reason names the first failing gate and keep matches the gates") {
    run("c6_gopher_gates").collect().foreach { r =>
      val gates = Seq("g_len" -> "len", "g_mwl" -> "mwl", "g_stop" -> "stop", "g_distinct" -> "distinct")
      val firstFail =
        gates.collectFirst { case (g, name) if r.getAs[Int](g) == 0 => name }.getOrElse("pass")
      assert(r.getAs[String]("reject_reason") == firstFail)
      assert((r.getAs[Int]("keep") == 1) == (firstFail == "pass"))
    }
  }

  test("c26: planted junk scores strictly below planted clean and is gated out") {
    val rows = run("c26_quality_classifier")
      .collect()
      .map(r => r.getAs[String]("source") -> r)
      .toMap
    val junk  = rows("planted_junk")
    val clean = rows("planted_clean")
    // The trained log-odds separate the classes with a wide margin — every
    // junk doc sits strictly below every clean doc.
    assert(junk.getAs[Long]("max_score_q") < clean.getAs[Long]("min_score_q"))
    // The wsum > 0 gate keeps all clean text and rejects the junk majority.
    assert(clean.getAs[Long]("keep_pm") == 1000L)
    assert(junk.getAs[Long]("keep_pm") < 500L)
    // Natural held-out sources score in the clean regime, not the junk one.
    rows.collect { case (s, r) if s.startsWith("src") => r }.foreach { r =>
      assert(r.getAs[Long]("min_score_q") > junk.getAs[Long]("max_score_q"))
    }
  }

  test("c28: planted clones recover their maximal repeated span at exactly 30 tokens") {
    val rows = run("c28_repeated_spans").collect()
    val planted = rows.filter(_.getAs[Boolean]("planted"))
    assert(planted.nonEmpty)
    planted.foreach { r =>
      // The clone copies exactly the source's first 30 tokens; its tail 10
      // tokens are salted unique, so the MAXIMAL repeated span is exactly 30
      // tokens (5-gram windows 1..26 shared, window 27 touches a salt).
      assert(r.getAs[Long]("max_span_tokens") == 30L, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_tokens") == 40L)
      assert(r.getAs[Long]("dup_tokens") >= 30L)
      // dup fraction covers at least the cloned prefix: 30/40 = 750 permille
      assert(r.getAs[Long]("dup_frac_pm") >= 750L)
    }
    // Interval-union discipline: duplicated tokens never exceed the doc.
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("n_tokens"))
      // every source doc of a planted clone shares its 30-token prefix back,
      // so it must itself report a span of >= 30 tokens
      if (r.getAs[Long]("doc_id") >= 0 && planted.exists(p => p.getAs[Long]("doc_id") == -r.getAs[Long]("doc_id") - 1))
        assert(r.getAs[Long]("max_span_tokens") >= 30L, s"source doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
