package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Column-level tests for the vector operators against hand-computed
  * values, plus determinism/range laws for the md5-seeded plane family.
  */
class VectorFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def eval1(c: org.apache.spark.sql.Column, a: Seq[Float], b: Seq[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(c).head.getDouble(0)
  }

  test("dot computes the inner product in double precision") {
    import org.apache.spark.sql.functions.col
    val got = eval1(VectorFunctions.dot(col("a"), col("b")),
      Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
    assert(math.abs(got - 32.0) < 1e-12)
  }

  test("cosine of a vector with itself is 1; orthogonal vectors give 0") {
    import org.apache.spark.sql.functions.col
    val self = eval1(VectorFunctions.cosine(col("a"), col("b")),
      Seq(3f, 4f), Seq(3f, 4f))
    assert(math.abs(self - 1.0) < 1e-12)
    val orth = eval1(VectorFunctions.cosine(col("a"), col("b")),
      Seq(1f, 0f), Seq(0f, 5f))
    assert(math.abs(orth) < 1e-12)
  }

  test("hashUnit is deterministic and in [-0.5, 0.5)") {
    (0 until 200).foreach { i =>
      val v = VectorFunctions.hashUnit(s"seed$i")
      assert(v >= -0.5 && v < 0.5)
      assert(v == VectorFunctions.hashUnit(s"seed$i"))
    }
  }

  test("planes regenerate identically and signBits yields one bit per plane") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pls = VectorFunctions.planes(4, 8)
    assert(pls == VectorFunctions.planes(4, 8))
    assert(pls.length == 4 && pls.forall(_.length == 8))
    val bits = Seq(Tuple1(Seq(1f, -1f, 2f, 0.5f, -3f, 1f, 0f, 2f)))
      .toDF("a")
      .select(VectorFunctions.signBits(col("a"), pls))
      .head
      .getString(0)
    assert(bits.length == 4 && bits.forall(c => c == '0' || c == '1'))
  }
}
