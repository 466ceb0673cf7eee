package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KSmallestLong

/** Aggregator laws for the bounded top-k buffer: the fold over any
  * partitioning and merge order must equal `sorted.take(k)` — exactly what
  * Spark's partial-aggregation execution requires of an Aggregator.
  */
class KSmallestLongSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val kGen     = Gen.choose(1, 20)
  private val dataGen  = Gen.listOf(Gen.choose(-1000L, 1000L))

  test("reduce over all elements equals sorted.take(k)") {
    checkProp(Prop.forAll(kGen, dataGen) { (k, xs) =>
      val agg = KSmallestLong(k)
      xs.foldLeft(agg.zero)(agg.reduce) == xs.sorted.take(k)
    })
  }

  test("merge of split buffers equals single-pass result (partition invariance)") {
    checkProp(Prop.forAll(kGen, dataGen, Gen.choose(0, 100)) { (k, xs, cut) =>
      val agg      = KSmallestLong(k)
      val (l, r)   = xs.splitAt(cut % (xs.length + 1))
      val bufL     = l.foldLeft(agg.zero)(agg.reduce)
      val bufR     = r.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(bufL, bufR)) == xs.sorted.take(k)
    })
  }

  test("merge is commutative up to the final value") {
    checkProp(Prop.forAll(kGen, dataGen, dataGen) { (k, a, b) =>
      val agg  = KSmallestLong(k)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(bufA, bufB) == agg.merge(bufB, bufA)
    })
  }

  test("buffer never exceeds k elements at any intermediate step") {
    checkProp(Prop.forAll(kGen, dataGen) { (k, xs) =>
      val agg = KSmallestLong(k)
      xs.scanLeft(agg.zero)(agg.reduce).forall(_.length <= k)
    })
  }
}
