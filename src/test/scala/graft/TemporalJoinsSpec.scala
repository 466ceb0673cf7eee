package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** Edge semantics of the temporal join operators on tiny in-memory frames:
  * the at-or-before tie rule, the no-prior-match null, and the
  * exactly-once pairing guarantee of the binned interval join (a pair must
  * meet in the point's single bin — never zero times, never twice).
  */
class TemporalJoinsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ---- randomized equivalence vs a brute-force reference ---------------
  // The union+running-window formulation must equal the obvious per-left-row
  // "latest right at-or-before" definition on ANY input — including ties,
  // empty sides, and keys present on only one side. Spark round-trips are
  // slow, so the case count is modest; each case is a fresh random frame.

  private val rnd = new scala.util.Random(4242)

  private def randomAsofCase(): Unit = {
    val keys = 1 + rnd.nextInt(3)
    val left = (0 until rnd.nextInt(12)).map { i =>
      (1L + rnd.nextInt(keys), rnd.nextInt(10).toLong, 100L + i)
    }
    val right = (0 until rnd.nextInt(12)).map { i =>
      (1L + rnd.nextInt(keys), rnd.nextInt(10).toLong, 1000L + i)
    }
    // right unique per (key, ts): keep max payload (asofLast's precondition)
    val rightU = right.groupBy(r => (r._1, r._2)).map { case ((k, t), rs) =>
      (k, t, rs.map(_._3).max)
    }.toSeq
    val got = TemporalJoins
      .asofLast(
        left.toDF("k", "t", "lid"),
        rightU.toDF("k", "t", "p"),
        key = "k", ts = "t", leftId = "lid", payload = Seq("p")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._3)
    val want = left.sortBy(_._3).map { case (k, t, lid) =>
      val cand = rightU.filter(r => r._1 == k && r._2 <= t)
      (k, t, lid, if (cand.isEmpty) None else Some(cand.maxBy(r => (r._2, r._3))._3))
    }
    assert(got.toSeq == want, s"left=$left rightU=$rightU")
  }

  test("asofLast equals the brute-force latest-at-or-before on random inputs") {
    (1 to 12).foreach(_ => randomAsofCase())
  }

  private def randomRangeCase(endExclusive: Boolean): Unit = {
    val points = (0 until rnd.nextInt(12)).map(i => (rnd.nextInt(40).toLong, 100L + i))
    val ivals = (0 until rnd.nextInt(8)).map { i =>
      val s = rnd.nextInt(40).toLong
      (s, s + rnd.nextInt(15).toLong, 1000L + i)
    }
    val got = TemporalJoins
      .rangeJoinBinned(
        points.toDF("t", "pid"),
        ivals.toDF("s", "e", "iid"),
        pointTs = "t", start = "s", end = "e", binWidth = 7L,
        endExclusive = endExclusive
      )
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val want = (for {
      (t, pid) <- points
      (s, e, iid) <- ivals
      if t >= s && (if (endExclusive) t < e else t <= e)
    } yield (pid, iid)).sorted
    assert(got.toSeq == want, s"points=$points ivals=$ivals excl=$endExclusive")
  }

  test("rangeJoinBinned equals the brute-force range filter on random inputs (both end rules)") {
    (1 to 8).foreach(_ => randomRangeCase(endExclusive = false))
    (1 to 8).foreach(_ => randomRangeCase(endExclusive = true))
  }

  test("asofLast: equal timestamps match (at-or-before), later rights do not") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 6L, "c"))
      .toDF("k", "t", "p")
    val out = TemporalJoins
      .asofLast(left, right, key = "k", ts = "t", leftId = "lid", payload = Seq("p"))
      .collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[String]("p")))
      .toMap
    assert(out(100L) == "a") // right at t=10 matches left at t=10 (>=)
    assert(out(101L) == "b") // most recent of {a@10, b@15} at t=20
    assert(out(102L) == null) // right@6 is after left@5: no match
  }

  test("asofLast: output keeps every left row exactly once") {
    val left  = (1 to 50).map(i => (i.toLong % 3, i.toLong, i.toLong)).toDF("k", "t", "lid")
    val right = Seq((0L, 10L, "x")).toDF("k", "t", "p")
    val out   = TemporalJoins.asofLast(left, right, "k", "t", "lid", Seq("p"))
    assert(out.count() == 50)
    assert(out.select("lid").distinct().count() == 50)
  }

  test("asofFirst: equal timestamps match (at-or-after), earlier rights do not") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 4L, "c"))
      .toDF("k", "t", "p")
    val out = TemporalJoins
      .asofFirst(left, right, key = "k", ts = "t", leftId = "lid", payload = Seq("p"))
      .collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[String]("p")))
      .toMap
    assert(out(100L) == "a") // right at t=10 matches left at t=10 (>=)
    assert(out(101L) == null) // nothing at-or-after t=20
    assert(out(102L) == null) // right@4 is before left@5: no match
  }

  test("asofFirst: picks the NEAREST following right, keeps every left row once") {
    val left  = Seq((1L, 0L, 1L), (1L, 12L, 2L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "near"), (1L, 50L, "far")).toDF("k", "t", "p")
    val out = TemporalJoins
      .asofFirst(left, right, "k", "t", "lid", Seq("p"))
      .collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[String]("p")))
      .toMap
    assert(out == Map(1L -> "near", 2L -> "far"))
  }

  test("rangeJoinBinned endExclusive: a point exactly at `end` falls out") {
    val points    = Seq((1L, 100L), (2L, 250L), (3L, 249L)).toDF("pid", "t")
    val intervals = Seq(("w1", 100L, 250L)).toDF("wid", "ws", "we")
    def run(excl: Boolean) = TemporalJoins
      .rangeJoinBinned(points, intervals, "t", "ws", "we", binWidth = 100L, endExclusive = excl)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(run(false) == Seq(1L, 2L, 3L)) // closed: 250 included
    assert(run(true) == Seq(1L, 3L))      // half-open: 250 excluded
    // degenerate empty interval [s, s) matches nothing
    val empty = TemporalJoins
      .rangeJoinBinned(points, Seq(("e", 100L, 100L)).toDF("wid", "ws", "we"),
        "t", "ws", "we", binWidth = 100L, endExclusive = true)
    assert(empty.count() == 0)
  }

  test("rangeJoinBinned: boundary-inclusive, exactly-once, bin-straddling intervals") {
    val points = Seq((1L, 0L), (2L, 100L), (3L, 150L), (4L, 251L))
      .toDF("pid", "t")
    // [100, 250] straddles bins of width 100 (bins 1..2); [0, 0] is a
    // single-instant interval.
    val intervals = Seq(("w1", 100L, 250L), ("w2", 0L, 0L))
      .toDF("wid", "ws", "we")
    val got = TemporalJoins
      .rangeJoinBinned(points, intervals, "t", "ws", "we", binWidth = 100L)
      .select("wid", "pid")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sorted
    assert(got.toSeq == Seq(("w1", 2L), ("w1", 3L), ("w2", 1L)))
  }

  /** j16's union-length sweep on planted interval shapes: the formula
    * Σ max(0, end − max(start, running-max-end-of-preceding)) must count
    * every covered point exactly once for disjoint, touching, overlapping,
    * nested, and duplicate intervals. Fixture events are raw-nanos ts
    * (Engine.table long passthrough) with 5-minute (3·10¹¹ ns) widths.
    */
  test("j16: interval-union coverage counts overlap/nesting/duplicates once") {
    val nsPerUs = 1000L
    val w       = 300000000L // interval width in µs
    // one event_type, one day; starts in µs chosen to exercise each shape
    // (sorted: 0, w, 2w+100, 2w+150, 2w+150, 2w+200):
    //   0            : base                               → + w
    //   w            : touching (no overlap, no gap)      → + w
    //   2*w + 100    : disjoint (gap of 100)              → + w
    //   2*w + 150    : overlapping by w-50                → + 50
    //   2*w + 150    : exact duplicate                    → + 0
    //   2*w + 200    : overlapping the previous max end   → + 50
    val starts = Seq(0L, w, 2 * w + 100, 2 * w + 150, 2 * w + 200, 2 * w + 150)
    val events = starts.zipWithIndex
      .map { case (us, i) => (i.toLong, i.toLong, "click", us * nsPerUs, 0.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("j16spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("j16_interval_coverage")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_events") == 6)
    // union = [0, 2w) ∪ [2w+100, 3w+200) = 2w + (w + 100)
    assert(row.getAs[Long]("covered_us") == 3 * w + 100)
    assert(row.getAs[Long]("naive_us") == 6 * w)
  }
}
