package graft

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** The QuantVec native kernels (graft_qd2 / graft_l2sq_long /
  * graft_sad_long / graft_qdot_long) must be RESULT-IDENTICAL to the
  * interpreted `aggregate(zip_with(...))` SQL templates they replaced in
  * the d21 / x39 / m10 hot paths — including the templates' NULL
  * semantics (length mismatch or any NULL element nulls the whole fold,
  * because zip_with pads with NULL and `acc + NULL` is NULL). Each test
  * evaluates kernel and template side by side on the same frame and
  * asserts row-for-row equality, so any drift in arithmetic or null
  * handling fails loudly here before it can desynchronize an oracle.
  */
class QuantVecSpec extends AnyFunSuite with SparkTestBase {

  private val qd2Tpl =
    "aggregate(zip_with(%s, %s, (x, y) -> (floor(x * 1024) - floor(y * 1024)) " +
      "* (floor(x * 1024) - floor(y * 1024))), 0L, (acc, v) -> acc + v)"

  private def assertPairwiseEqual(rows: Array[org.apache.spark.sql.Row]): Unit = {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      var i = 0
      while (i < r.length) {
        assert(r.isNullAt(i) == r.isNullAt(i + 1), s"null flags differ at $i: $r")
        if (!r.isNullAt(i)) assert(r.getLong(i) == r.getLong(i + 1), s"values differ at $i: $r")
        i += 2
      }
    }
  }

  test("graft_qd2 equals the quantized-L2 aggregate(zip_with) template") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = Seq
      .tabulate(50) { _ =>
        val n = 1 + rnd.nextInt(64)
        (Seq.fill(n)(rnd.nextDouble() * 4 - 2), Seq.fill(n)(rnd.nextDouble() * 4 - 2))
      }
      .toDF("a", "b")
    assertPairwiseEqual(
      df.select(
        expr("graft_qd2(a, b)"),
        expr(qd2Tpl.format("a", "b"))
      ).collect())
    // the template's edge shapes: length mismatch, NULL element, floor on
    // negatives straddling a lattice step, empty arrays
    assertPairwiseEqual(
      spark.sql(
        s"""SELECT graft_qd2(a, b), ${qd2Tpl.format("a", "b")} FROM VALUES
             (array(1.0D, 2.0D),                 array(1.0D)),
             (array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)),
             (array(-1.0009765625D, 0.0D),       array(-1.0D, -0.0009765625D)),
             (CAST(array() AS ARRAY<DOUBLE>),    CAST(array() AS ARRAY<DOUBLE>))
           AS t(a, b)""").collect())
  }

  test("graft_l2sq_long and graft_sad_long equal their long-array templates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq
      .tabulate(50) { _ =>
        val n = 1 + rnd.nextInt(64)
        (Seq.fill(n)(rnd.nextInt(2000) - 1000L), Seq.fill(n)(rnd.nextInt(2000) - 1000L))
      }
      .toDF("a", "b")
    val l2sqTpl = "aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    val sadTpl  = "aggregate(zip_with(%s, %s, (p, q) -> abs(p - q)), 0L, (acc, x) -> acc + x)"
    assertPairwiseEqual(
      df.select(
        expr("graft_l2sq_long(a, b)"),
        expr(l2sqTpl.format("a", "b")),
        expr("graft_sad_long(a, b)"),
        expr(sadTpl.format("a", "b"))
      ).collect())
    assertPairwiseEqual(
      spark.sql(
        s"""SELECT graft_l2sq_long(a, b), ${l2sqTpl.format("a", "b")},
                   graft_sad_long(a, b),  ${sadTpl.format("a", "b")} FROM VALUES
             (array(1L, 2L),                  array(1L)),
             (array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)),
             (CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))
           AS t(a, b)""").collect())
  }

  test("graft_qdot_long equals the quantized sign-dot template, and the " +
    "folded JL sign matrix equals its md5 derivation") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq
      .tabulate(20)(_ => Tuple1(Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("a")
    (0 until 16).foreach { i =>
      val folded = Seq.tabulate(64) { p =>
        2L * (graft.functions.Md5Seed.prefixLong(s"jl$i#$p", 6) % 2L) - 1L
      }
      // the x39 jlExpr fold must match the SQL md5 derivation cell-for-cell
      val sqlRow = spark
        .sql(s"""SELECT transform(sequence(0, 63), p ->
                   2 * (cast(conv(substr(md5(concat('jl', $i, '#', p)), 1, 6), 16, 10) as bigint) % 2) - 1)""")
        .head.getSeq[Long](0)
      assert(sqlRow == folded, s"JL sign row $i differs between SQL md5 and Md5Seed fold")
      val lits = folded.mkString("array(", "L, ", "L)")
      assertPairwiseEqual(
        df.select(
          expr(s"graft_qdot_long(a, $lits)"),
          expr(
            s"""aggregate(zip_with(a, $lits, (x, v) ->
                 cast(floor(x * 1024) as bigint) * v), 0L, (acc, v) -> acc + v)""")
        ).collect())
    }
  }
}
