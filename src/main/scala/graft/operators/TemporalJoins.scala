package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for — as-of join and
  * interval (range) join — expressed as compositions of shuffles Spark
  * already plans well, NOT as per-row subqueries or nested-loop joins.
  *
  * These extend the SURVEY.md §2.3 join family with the two shapes a
  * training-data / event pipeline hits constantly (attach the most recent
  * dimension state to a fact; find all events inside incident windows).
  *
  * Scale design:
  *   - [[asofLast]] is the union+running-window formulation: tag right rows,
  *     union both sides on the key, one shuffle on the key, one ordered pass
  *     per key partition carrying the last-seen right payload forward. Cost
  *     is sort-shuffle of |L|+|R| — the same plan class as a SQL MERGE-join,
  *     and strictly better than the naive per-left-row max-subquery (which
  *     Spark plans as an aggregate + re-join) or a windowed self-join.
  *     1000-executor behavior: one Exchange on the key, AQE handles skew.
  *   - [[rangeJoinBinned]] is the bucketed interval join: quantize the axis
  *     into fixed bins, explode each interval to the bins it covers, tag each
  *     point with its single bin, equi-join on the bin, re-check the exact
  *     range as a residual predicate. Each (point, interval) pair meets in
  *     EXACTLY one bin (the point's), so no post-join dedup is needed. Cost
  *     ∝ |points| + Σ interval spans/bin — never the |P|·|I| cartesian a
  *     BroadcastNestedLoopJoin would pay once the interval side outgrows a
  *     broadcast.
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the payload of the LAST right row
    * with the same key and `rightTs <= leftTs` (at-or-before; equal
    * timestamps match). Left rows with no prior right row keep null payload.
    *
    * Preconditions: `right` must be unique per (key, ts) — pre-aggregate if
    * not (ties would make "the" last row ambiguous). `leftId` breaks ordering
    * ties among left rows sharing a timestamp, keeping output deterministic.
    */
  def asofLast(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      leftId: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val nulled   = payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))
    // side 0 = right, 1 = left: at equal ts the right row sorts first, which
    // is exactly the at-or-before (>=) match semantic.
    val taggedR = right.select(
      Seq(col(key), col(ts), lit(0).as("graft_side"), lit(null).cast("long").as("graft_lid")) ++
        payload.map(col) ++ leftCols.filterNot(Set(key, ts)).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val taggedL = left.select(
      Seq(col(key), col(ts), lit(1).as("graft_side"), col(leftId).cast("long").as("graft_lid")) ++
        nulled ++ leftCols.filterNot(Set(key, ts)).map(col): _*
    )
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts), col("graft_side"), col("graft_lid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedR.unionByName(taggedL)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("graft_side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Forward as-of join: for each left row, attach the payload of the FIRST
    * right row with the same key and `rightTs >= leftTs` (at-or-after; equal
    * timestamps match) — the mirror of [[asofLast]], and the shape users
    * reach for next ("attach the next state change / next action after this
    * fact"). Left rows with no following right row keep null payload.
    *
    * Same plan class as [[asofLast]]: union both sides on the key, ONE
    * shuffle, one ordered pass per key partition — here the window frame
    * looks FORWARD (currentRow..unboundedFollowing, `first` ignoring nulls).
    * Same preconditions: `right` unique per (key, ts); `leftId` breaks
    * ordering ties among left rows sharing a timestamp.
    */
  def asofFirst(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      leftId: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val nulled   = payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))
    // side 0 = left, 1 = right: at equal ts the LEFT row sorts first, so the
    // forward frame starting at currentRow still contains the same-ts right
    // row — the at-or-after (>=) match semantic.
    val taggedR = right.select(
      Seq(col(key), col(ts), lit(1).as("graft_side"), lit(null).cast("long").as("graft_lid")) ++
        payload.map(col) ++ leftCols.filterNot(Set(key, ts)).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val taggedL = left.select(
      Seq(col(key), col(ts), lit(0).as("graft_side"), col(leftId).cast("long").as("graft_lid")) ++
        nulled ++ leftCols.filterNot(Set(key, ts)).map(col): _*
    )
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts), col("graft_side"), col("graft_lid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(taggedL.unionByName(taggedR)) { (df, p) =>
      df.withColumn(p, first(col(p), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("graft_side") === 0)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Interval join: all (interval, point) pairs with `start <= pointTs <=
    * end` (or `< end` with `endExclusive` — the half-open convention
    * windowing systems use, so back-to-back windows never double-count a
    * boundary point), via bin-key equi-join + residual predicate.
    * `binWidth` is in the ts unit; pick it near the typical interval length
    * so each interval expands to O(1) bins.
    */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      start: String,
      end: String,
      binWidth: Long,
      endExclusive: Boolean = false
  ): DataFrame = {
    val expanded = intervals.withColumn(
      "graft_bin",
      // an exclusive end that lands exactly on a bin boundary contributes
      // nothing to that bin — skip expanding the interval into it. greatest
      // keeps the sequence ascending for degenerate empty intervals
      // [s, s) (the residual predicate drops their rows regardless).
      explode(
        sequence(
          expr(s"$start div $binWidth"),
          if (endExclusive) expr(s"greatest($start div $binWidth, ($end - 1) div $binWidth)")
          else expr(s"$end div $binWidth")
        )
      )
    )
    val endPred =
      if (endExclusive) col(pointTs) < col(end) else col(pointTs) <= col(end)
    points
      .withColumn("graft_bin", expr(s"$pointTs div $binWidth"))
      .join(expanded, "graft_bin")
      .filter(col(pointTs) >= col(start) && endPred)
      .drop("graft_bin")
  }
}
