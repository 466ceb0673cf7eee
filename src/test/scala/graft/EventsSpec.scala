package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the event-time batch queries that the row-hash oracle
  * can't express directly.
  */
class EventsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("e11: planted out-of-order events land in the right power-of-two lateness buckets") {
    import spark.implicits._
    // ts in raw nanos (the nanosAsLong read shape); user 1 arrives in event-time
    // order, user 2's third event is 5 ms late, fourth is exactly 1 µs late
    val ns = 1000L
    val events = Seq(
      (1L, 1L, "click", 1000000L * ns),
      (1L, 2L, "click", 2000000L * ns),
      (2L, 3L, "click", 9000000L * ns),
      (2L, 4L, "click", 14000000L * ns),
      (2L, 5L, "click", 9000000L * ns),  // 5_000_000 µs late → bucket 2^23
      (2L, 6L, "click", 13999999L * ns)  // 1 µs late → bucket 1
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("e11spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("e11_disorder_census")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("late_bucket_us") -> r)
      .toMap
    assert(out(0L).getAs[Long]("n_events") == 4) // both in-order users
    assert(out(1L).getAs[Long]("n_events") == 1)
    assert(out(1L).getAs[Long]("max_late_us") == 1L)
    val bigBucket = out.keys.max
    assert(bigBucket == (1L << 23), s"expected 2^23 bucket, got $bigBucket")
    assert(out(bigBucket).getAs[Long]("max_late_us") == 5000000L)
  }

  test("e12: global lateness sees across bucket boundaries (the spine path)") {
    import spark.implicits._
    // event 2500 lives in range-bucket 2 but is 1 s earlier than bucket 0's
    // max — its lateness must come from the broadcast spine, not the
    // bucket-local running max
    val ns = 1000L
    val events = Seq(
      (1L, 1L, "click", 10000000L * ns),
      (2L, 2L, "click", 20000000L * ns), // global event-time max so far
      (3L, 2500L, "click", 19000000L * ns), // 1_000_000 µs late vs bucket 0
      (4L, 2501L, "click", 30000000L * ns)
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("e12spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("e12_global_disorder")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("late_bucket_us") -> r)
      .toMap
    assert(out(0L).getAs[Long]("n_events") == 3)
    assert(out(1L << 20).getAs[Long]("n_events") == 1)
    assert(out(1L << 20).getAs[Long]("max_late_us") == 1000000L)
  }

  test("e13: an event later than the allowance is dropped, within it admitted, ahead on time") {
    import spark.implicits._
    val ns = 1000L
    val events = Seq(
      (1L, 1L, "click", 10000000L * ns),
      (2L, 2L, "click", 30000000L * ns), // running max 30 s
      (3L, 3L, "click", 27000000L * ns), // 3 s late -> admitted (allowance 5 s)
      (4L, 4L, "click", 20000000L * ns), // 10 s late -> dropped
      (5L, 5L, "click", 31000000L * ns)  // ahead -> on_time
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("e13spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("e13_watermark_audit")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n_events"))
      .toMap
    assert(out("on_time") == 3) // first event (no watermark yet) + max + ahead
    assert(out("late_admitted") == 1)
    assert(out("dropped") == 1)
  }

  test("e14: an arrival after its window's end has passed marks the window dirty") {
    import spark.implicits._
    val ns = 1000L
    val events = Seq(
      (1L, 1L, "click", 10000000L * ns),  // window 0 (0-60 s)
      (2L, 2L, "click", 70000000L * ns),  // window 1 -> running max passes 60 s
      (3L, 3L, "click", 20000000L * ns),  // window 0 again: late update (wm 70 s >= 60 s)
      (4L, 4L, "click", 80000000L * ns)   // window 1, wm 70 s < 120 s: clean
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("e14spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("e14_retraction_census")(spark, dir).collect().head
    assert(r.getAs[Long]("n_events") == 4)
    assert(r.getAs[Long]("n_late_updates") == 1)
    assert(r.getAs[Long]("n_dirty_windows") == 1)
    assert(r.getAs[Long]("n_windows") == 2)
  }

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
