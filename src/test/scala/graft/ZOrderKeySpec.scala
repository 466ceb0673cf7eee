package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderKey

/** Bit-level checks of the Morton interleave plus the locality property
  * that makes it a layout key at all.
  */
class ZOrderKeySpec extends AnyFunSuite with SparkTestBase {

  test("interleave: known bit patterns") {
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    assert(ZOrderKey.interleave(1L, 0L) == 1L)      // x bit 0 → position 0
    assert(ZOrderKey.interleave(0L, 1L) == 2L)      // y bit 0 → position 1
    assert(ZOrderKey.interleave(3L, 0L) == 5L)      // 0b11 → 0b101
    assert(ZOrderKey.interleave(0L, 3L) == 10L)     // 0b11 → 0b1010
    assert(ZOrderKey.interleave(0xffffL, 0xffffL) == 0xffffffffL)
    // bits above 15 are masked by construction
    assert(ZOrderKey.interleave(0x10000L, 0L) == 0L)
  }

  test("interleave is monotone within a row/column (the pruning property)") {
    // along either axis with the other fixed, the key strictly increases —
    // so axis-aligned ranges map to bounded key ranges
    val fixedY = (0L until 64L).map(x => ZOrderKey.interleave(x, 7L))
    assert(fixedY == fixedY.sorted && fixedY.distinct.size == 64)
    val fixedX = (0L until 64L).map(y => ZOrderKey.interleave(7L, y))
    assert(fixedX == fixedX.sorted && fixedX.distinct.size == 64)
  }

  test("the registered SQL function agrees with the static method") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((3L, 5L), (100L, 200L), (65535L, 1L))
      .toDF("x", "y")
      .select(call_function("graft_zorder", col("x"), col("y")))
      .collect()
      .map(_.getLong(0))
    assert(rows.toSeq == Seq(
      ZOrderKey.interleave(3L, 5L),
      ZOrderKey.interleave(100L, 200L),
      ZOrderKey.interleave(65535L, 1L)
    ))
  }
}
