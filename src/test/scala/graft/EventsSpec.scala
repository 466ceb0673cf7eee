package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the event-time batch queries that the row-hash oracle
  * can't express directly.
  */
class EventsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("e10: spine endpoints are measured, and every interpolated value lies between its neighbors") {
    val rows = SparkEntry
      .queries("e10_interpolate")(spark, sf)
      .orderBy("event_type", "hr")
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { case (_, series) =>
      assert(series.head.getAs[Int]("interpolated") == 0)
      assert(series.last.getAs[Int]("interpolated") == 0)
      // hour spine is dense
      val hrs = series.map(_.getAs[Long]("hr"))
      assert(hrs.zip(hrs.tail).forall { case (a, b) => b == a + 1 })
      // every gap value is within [min, max] of the surrounding measured values
      val measured = series.zipWithIndex.filter(_._1.getAs[Int]("interpolated") == 0)
      series.zipWithIndex.filter(_._1.getAs[Int]("interpolated") == 1).foreach { case (r, i) =>
        val prev = measured.takeWhile(_._2 < i).last._1.getAs[Long]("v_q")
        val next = measured.dropWhile(_._2 < i).head._1.getAs[Long]("v_q")
        val v    = r.getAs[Long]("v_q")
        assert(v >= math.min(prev, next) && v <= math.max(prev, next), s"$v not in [$prev,$next]")
      }
    }
  }
}
