package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectSize

/** Law check for the merge-scan intersection: on sorted distinct arrays it
  * must equal the set-intersection size, for any inputs.
  */
class SortedIntersectSizeSpec extends AnyFunSuite {

  private def arr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val setGen: Gen[Seq[String]] =
    Gen.listOf(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)))
      .map(_.distinct.sorted)

  test("equals set-intersection cardinality on sorted distinct arrays") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(setGen, setGen) { (a, b) =>
        SortedIntersectSize.size(arr(a), arr(b)) == a.toSet.intersect(b.toSet).size
      }
    )
    assert(res.passed, res.status.toString)
  }

  test("handles empty and disjoint inputs") {
    assert(SortedIntersectSize.size(arr(Nil), arr(Seq("a"))) == 0)
    assert(SortedIntersectSize.size(arr(Seq("a", "b")), arr(Seq("c", "d"))) == 0)
    assert(SortedIntersectSize.size(arr(Seq("a", "b", "c")), arr(Seq("a", "b", "c"))) == 3)
  }
}
