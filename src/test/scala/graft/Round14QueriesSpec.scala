package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-14 additions — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round14QueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("x31: applying the trained merges strictly drops tokens-per-word in every language") {
    val rows = SparkEntry.queries("x31_bpe_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val before = r.getAs[Long]("tpw_char_pm")
      val after  = r.getAs[Long]("tpw_bpe_pm")
      assert(
        after < before,
        s"lang=${r.getAs[String]("lang")}: BPE fertility $after did not drop below $before"
      )
      // merges only ever collapse symbols — totals must agree directionally too
      assert(r.getAs[Long]("symbols_bpe") < r.getAs[Long]("symbols_char"))
      assert(r.getAs[Long]("n_words") > 0)
    }
  }
}
