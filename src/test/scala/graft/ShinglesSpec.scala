package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native shingle/n-gram expressions must agree, as sorted sets, with
  * the higher-order-function formulations they replaced (r3 Dedup.scala) on
  * messy inputs: consecutive/leading/trailing spaces, short texts, empty
  * text, and non-ASCII including supplementary code points.
  */
class ShinglesSpec extends AnyFunSuite with SparkTestBase {

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two",
    "solo",
    "",
    "  leading and  double  spaces ",
    "trailing space ",
    "ümlaut ünïcode wörds étude",
    "emoji 😀 and 🐍 snake mix",
    "a b c d e f g"
  )

  test("graft_word_shingles equals the transform/sequence formulation (sorted distinct)") {
    import spark.implicits._
    val df = samples.toDF("text")
    val w  = split(col("text"), " ")
    val legacy = array_sort(
      array_distinct(
        transform(
          sequence(lit(0), greatest(size(w) - 3, lit(0))),
          i => concat_ws(" ", slice(w, i + 1, lit(3)))
        )
      )
    )
    val rows = df
      .select(
        call_function("graft_word_shingles", col("text"), lit(3)).as("nat"),
        legacy.as("leg")
      )
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("graft_char_ngrams equals the substr/sequence formulation (sorted distinct)") {
    import spark.implicits._
    val df = samples.toDF("text")
    val legacy = array_sort(
      array_distinct(
        transform(
          sequence(lit(1), greatest(length(col("text")) - 3, lit(1))),
          i => col("text").substr(i, lit(4))
        )
      )
    )
    val rows = df
      .select(
        call_function("graft_char_ngrams", col("text"), lit(4)).as("nat"),
        legacy.as("leg")
      )
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("graft_word_ngrams keeps duplicates in document order, full windows only") {
    import spark.implicits._
    val rows = Seq(
      "a b a b a",   // repeated bigrams must NOT dedup
      "one two",
      "solo",        // fewer words than n → empty
      "",
      "x  y"         // consecutive spaces yield an empty middle word
    ).toDF("text")
      .select(call_function("graft_word_ngrams", col("text"), lit(2)).as("g"))
      .collect()
      .map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b", "b a", "a b", "b a"))
    assert(rows(1) == Seq("one two"))
    assert(rows(2) == Seq.empty)
    assert(rows(3) == Seq.empty)
    assert(rows(4) == Seq("x ", " y"))
  }

  test("graft_word_ngrams matches the x8 transform/sequence bigram chain on multi-word text") {
    import spark.implicits._
    val multi = samples.filter(_.split(" ", -1).length >= 2)
    val w = split(col("text"), " ")
    val legacy = transform(
      sequence(lit(1), size(w) - 1),
      i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))
    )
    val rows = multi.toDF("text")
      .select(
        call_function("graft_word_ngrams", col("text"), lit(2)).as("nat"),
        legacy.as("leg")
      )
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("outputs are sorted — the SortedIntersectSize precondition") {
    import spark.implicits._
    val rows = samples.toDF("text")
      .select(
        call_function("graft_word_shingles", col("text"), lit(3)).as("sh"),
        call_function("graft_char_ngrams", col("text"), lit(4)).as("gr")
      )
      .collect()
    rows.foreach { r =>
      val sh = r.getSeq[String](0)
      val gr = r.getSeq[String](1)
      assert(sh == sh.distinct && gr == gr.distinct)
    }
    // self-intersection through the native merge scan = set size
    val self = samples.toDF("text")
      .select(
        size(call_function("graft_word_shingles", col("text"), lit(3))).as("n"),
        call_function(
          "graft_sorted_intersect_size",
          call_function("graft_word_shingles", col("text"), lit(3)),
          call_function("graft_word_shingles", col("text"), lit(3))
        ).as("i")
      )
      .collect()
    self.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
