package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.TemporalJoins

/** J12/J13 — the temporal join family over the `events` table (beyond the
  * reference's §2.3 inventory; the shapes an event/training pipeline needs).
  *
  *   - j12: as-of join — every non-signup event is annotated with the most
  *     recent signup at-or-before it for the same user (the "attach current
  *     dimension state to a fact" pattern). Oracle: DuckDB's native
  *     ASOF LEFT JOIN, an independent formulation of the same semantics.
  *   - j13: interval join — all events falling inside 10-minute incident
  *     windows opened by high-value error events, any user. Oracle: DuckDB's
  *     range join (IEJoin). The Spark side uses the binned equi-join
  *     ([[TemporalJoins.rangeJoinBinned]]) — at scale the interval side
  *     outgrows a broadcast and a raw range predicate would plan as a
  *     BroadcastNestedLoopJoin; the bin key keeps it a hash join.
  *
  * `events.ts` arrives as epoch-nanos longs whatever the parquet stored
  * (Engine.table normalizes both testdata generations); `us` is
  * epoch-micros, matching DuckDB epoch_us.
  */
object TemporalQueries extends QueryModule {

  private def us = expr("ts div 1000")

  private val WindowUs = 600L * 1000000L // 10-minute incident windows

  private def j12_asof_join(s: SparkSession, d: String): DataFrame = {
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"), col("value"))
    // right side: signups, made unique per (user, ts) — keep the max
    // event_id's row, so "the most recent signup" is well-defined
    val signups = e
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("us"))
      .agg(
        max(col("event_id")).as("ref_event_id"),
        expr("max_by(value, event_id)").as("ref_val")
      )
    val facts = e
      .filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    TemporalJoins
      .asofLast(facts, signups, key = "user_id", ts = "us", leftId = "event_id",
        payload = Seq("ref_event_id", "ref_val"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        col("ref_event_id"),
        round(col("ref_val") * 100, 0).cast("long").as("ref_value_cents")
      )
  }

  private def j13_range_join(s: SparkSession, d: String): DataFrame = {
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"), col("value"))
    val incidents = e
      .filter(col("event_type") === "error" && col("value") > 198)
      .select(
        col("event_id").as("incident_id"),
        col("us").as("ws"),
        (col("us") + lit(WindowUs)).as("we")
      )
    TemporalJoins
      .rangeJoinBinned(
        e.select(col("event_id"), col("user_id"), col("us")),
        incidents,
        pointTs = "us", start = "ws", end = "we", binWidth = WindowUs
      )
      .filter(col("event_id") =!= col("incident_id"))
      .select(
        col("incident_id"),
        col("event_id"),
        col("user_id"),
        expr("(us - ws) div 1000000").as("offset_sec")
      )
  }

  /** J14 — forward as-of join, the mirror of j12: every non-signup event is
    * annotated with the NEXT signup at-or-after it for the same user (the
    * "time to next conversion / next state change" pattern). Oracle:
    * DuckDB's native ASOF LEFT JOIN with `<=`, its forward form — again an
    * independent formulation of the same semantics.
    */
  private def j14_asof_forward(s: SparkSession, d: String): DataFrame = {
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"), col("value"))
    // right side unique per (user, ts): at equal ts keep the MIN event_id's
    // row so "the first following signup" is well-defined
    val signups = e
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("us"))
      .agg(
        min(col("event_id")).as("next_event_id"),
        expr("min_by(value, event_id)").as("next_val")
      )
    val facts = e
      .filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    TemporalJoins
      .asofFirst(facts, signups, key = "user_id", ts = "us", leftId = "event_id",
        payload = Seq("next_event_id", "next_val"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        col("next_event_id"),
        round(col("next_val") * 100, 0).cast("long").as("next_value_cents")
      )
  }

  /** J13b — j13's interval join with the HALF-OPEN window convention
    * ([ws, we)): boundary events at exactly `we` fall out, so back-to-back
    * incident windows can never double-count a point. Oracle: the same
    * IEJoin with a strict upper bound.
    */
  private def j13b_range_join_exclusive(s: SparkSession, d: String): DataFrame = {
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"), col("value"))
    val incidents = e
      .filter(col("event_type") === "error" && col("value") > 198)
      .select(
        col("event_id").as("incident_id"),
        col("us").as("ws"),
        (col("us") + lit(WindowUs)).as("we")
      )
    TemporalJoins
      .rangeJoinBinned(
        e.select(col("event_id"), col("user_id"), col("us")),
        incidents,
        pointTs = "us", start = "ws", end = "we", binWidth = WindowUs,
        endExclusive = true
      )
      .filter(col("event_id") =!= col("incident_id"))
      .select(
        col("incident_id"),
        col("event_id"),
        col("user_id"),
        expr("(us - ws) div 1000000").as("offset_sec")
      )
  }

  /** H1 — SCD2 history build: compress each customer's order-priority
    * timeline into validity intervals (state, valid_from, valid_to-open).
    * Change detection (lag) and interval close (lead over the survivors)
    * are two window passes over the SAME user partitioning — one shuffle
    * total. Ties on the date break by order key, so the history is
    * deterministic. The classic warehouse dimension-history operator.
    */
  private def h1_scd2_history(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("dt"), col("o_orderkey"))
    val changes = table(s, d, "orders")
      .select(
        col("o_custkey"),
        col("o_orderpriority").as("state"),
        col("o_orderdate").as("dt"),
        col("o_orderkey")
      )
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
    changes
      .withColumn("vto", lead(col("dt"), 1).over(w))
      .select(
        col("o_custkey"),
        col("state"),
        date_format(col("dt"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("vto"), "yyyy-MM-dd").as("valid_to")
      )
  }

  /** H2 — CDC snapshot compaction: apply a keyed changelog (upserts +
    * deletes, ordered by a sequence) and materialize the final state — the
    * other half of the warehouse temporal pair (h1 keeps the history, h2
    * compacts to "now"). Orders act as the changelog per customer: each
    * order upserts the priority state, '5-LOW' orders are deletes; the
    * last change wins (date, then order key), and a key whose last change
    * is a delete is ABSENT from the snapshot. One window over one shuffle
    * — the same plan class as keep-last dedup, plus the delete filter.
    */
  private def h2_cdc_snapshot(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    table(s, d, "orders")
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        when(col("o_orderpriority") === "5-LOW", lit("D")).otherwise(lit("U")).as("op"),
        col("o_orderpriority").as("state")
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(
        col("o_custkey"),
        col("state"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("applied_at")
      )
  }

  /** J16 — interval-union coverage: each event opens a 5-minute activity
    * interval; per (event_type, start-day), the UNION length of those
    * intervals — the coverage/uptime aggregate (what fraction of the day
    * was "active") that naive sum-of-durations overstates wherever
    * intervals overlap. One window, no segment materialization: with
    * pm = running max of interval-end over STRICTLY PRECEDING rows
    * (ordered by start), each row's novel contribution is
    * max(0, end − max(start, pm)) — summing those is exactly the union
    * length (every covered point is counted by the first interval that
    * covers it). Ties on start are harmless: equal starts imply equal
    * ends (fixed width), so the later row contributes 0 either way —
    * fully deterministic with no tiebreak column.
    *
    * Scale shape: partitioned by (type, day) — time-bucketed groups, the
    * standard way an interval sweep shards at 100 TB; all arithmetic is
    * integer micros.
    */
  private def j16_interval_coverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = 300L * 1000000L // 5-minute activity intervals
    val base = table(s, d, "events")
      .select(us.as("us"), col("event_type"))
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("e", col("us") + lit(width))
    val w = Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("us"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("pm", max(col("e")).over(w))
      .withColumn(
        "novel",
        // null pm (first row of a group) → 0: epoch-micros starts are
        // always positive, so greatest(us, 0) = us
        greatest(lit(0L), col("e") - greatest(col("us"), coalesce(col("pm"), lit(0L))))
      )
      .groupBy(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("novel")).as("covered_us"),
        (count(lit(1)) * width).as("naive_us")
      )
      .select(
        col("event_type"),
        col("day"),
        col("n_events"),
        col("covered_us"),
        col("naive_us")
      )
  }

  /** J17 — interval ANTI-join (gap detection): signups with NO error event
    * by the same user within the hour after — the "clean conversion" / SLA
    * gap face of the range-join family (j13 finds what's inside a window;
    * j17 proves nothing is). Spark plans this as a LEFT ANTI join on the
    * user-id EQUI key with the time bounds as a residual predicate — a
    * keyed hash/sort-merge anti join, never a nested loop: at 100 TB both
    * sides shuffle once on user_id and each key's candidate set is that
    * user's events only. Oracle: DuckDB NOT EXISTS — an independent
    * formulation of the same semantics.
    */
  private def j17_interval_anti_join(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("us").as("eus"))
    signups
      .join(
        errors,
        col("user_id") === col("eu") &&
          col("eus") > col("us") && col("eus") <= col("us") + lit(hourUs),
        "left_anti"
      )
      .select(col("event_id"), col("user_id"), col("us"))
  }

  /** J18 — as-of join with a STALENESS TOLERANCE (the point-in-time-correct
    * feature-store shape: attach the most recent signup state to each fact,
    * but only if it is at most 24 h old — older state is treated as expired
    * and the fact keeps null feature columns rather than silently training
    * on stale data). Same single-shuffle union+running-window plan as j12:
    * the most-recent-at-or-before match is the ONLY candidate inside any
    * trailing window ending at the fact, so tolerance is a post-filter on
    * the matched timestamp, not a different join. Oracle: DuckDB range
    * LEFT JOIN + keep-latest row_number — an independent formulation.
    */
  private def j18_asof_tolerance(s: SparkSession, d: String): DataFrame = {
    val tolUs = 24L * 3600L * 1000000L
    val e = table(s, d, "events")
      .select(col("event_id"), col("user_id"), us.as("us"), col("event_type"), col("value"))
    val signups = e
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("us"))
      .agg(
        max(col("event_id")).as("ref_event_id"),
        expr("max_by(value, event_id)").as("ref_val")
      )
      // carry the match timestamp as payload so staleness is checkable
      .withColumn("ref_us", col("us"))
    val facts = e
      .filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    val fresh = col("ref_us").isNotNull && col("us") - col("ref_us") <= tolUs
    TemporalJoins
      .asofLast(facts, signups, key = "user_id", ts = "us", leftId = "event_id",
        payload = Seq("ref_event_id", "ref_val", "ref_us"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        when(fresh, col("ref_event_id")).as("ref_event_id"),
        when(fresh, round(col("ref_val") * 100, 0).cast("long")).as("ref_value_cents"),
        when(fresh, (col("us") - col("ref_us")) / lit(1000000L)).cast("long").as("staleness_sec")
      )
  }

  /** J19 — followed-by pair mining: for every ordered event-type pair
    * (A, B), how often B follows A for the SAME user within 10 minutes,
    * and across how many distinct users — the co-occurrence census behind
    * "users who do A then do B" funnels, WITHOUT e18's adjacency
    * restriction (an intervening C doesn't break the A→B pair) and
    * without e5's fixed two-step shape.
    *
    * Plan: self-join on the user EQUI key with the time bounds as a
    * residual predicate (j17's plan class — keyed hash join, never a
    * nested loop), then one hash aggregate over |types|² groups. Per-key
    * pair fan-out is bounded by each user's event density inside the 10 min
    * horizon — the τ bound is what keeps sequence mining sub-quadratic on
    * a stream where any one user's rate is bounded, and the horizon is the
    * knob a 100 TB run tunes against its densest users (a hot user's cost
    * is rate·τ per event, measurable up front from e6's inter-arrival
    * histogram).
    */
  private def j19_followed_by(s: SparkSession, d: String): DataFrame = {
    val tauUs = 600L * 1000000L
    val e = table(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"), col("event_type"))
    val a = e.select(
      col("user_id"), col("us").as("aus"), col("event_type").as("from_type"))
    val b = e.select(
      col("user_id").as("u2"), col("us").as("bus"), col("event_type").as("to_type"))
    a.join(
        b,
        col("user_id") === col("u2") &&
          col("bus") > col("aus") && col("bus") <= col("aus") + lit(tauUs)
      )
      .groupBy(col("from_type"), col("to_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j19_followed_by" -> (j19_followed_by _),
    "j18_asof_tolerance" -> (j18_asof_tolerance _),
    "j16_interval_coverage" -> (j16_interval_coverage _),
    "j17_interval_anti_join" -> (j17_interval_anti_join _),
    "j12_asof_join" -> (j12_asof_join _),
    "j13_range_join" -> (j13_range_join _),
    "j13b_range_join_exclusive" -> (j13b_range_join_exclusive _),
    "j14_asof_forward" -> (j14_asof_forward _),
    "h1_scd2_history" -> (h1_scd2_history _),
    "h2_cdc_snapshot" -> (h2_cdc_snapshot _)
  )

  val oracles: Map[String, String] = Map(
    "j19_followed_by" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
                    FROM events)
         SELECT a.event_type AS from_type, b.event_type AS to_type,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
         FROM e a JOIN e b
           ON a.user_id = b.user_id
          AND b.us > a.us AND b.us <= a.us + 600000000
         GROUP BY 1, 2""",
    "j18_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
                           value
                    FROM events),
         s AS (SELECT user_id, us AS ref_us,
                      max(event_id) AS ref_event_id,
                      max_by(value, event_id) AS ref_val
               FROM e WHERE event_type = 'signup' GROUP BY 1, 2),
         f AS (SELECT event_id, user_id, us FROM e
               WHERE event_type <> 'signup'),
         j AS (SELECT f.event_id, f.user_id, f.us,
                      s.ref_us, s.ref_event_id, s.ref_val
               FROM f LEFT JOIN s
                 ON f.user_id = s.user_id
                AND s.ref_us <= f.us
                AND s.ref_us >= f.us - 86400000000),
         r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                           ORDER BY ref_us DESC NULLS LAST) AS rn
               FROM j)
         SELECT event_id, user_id, us,
                ref_event_id,
                CAST(round(ref_val * 100, 0) AS BIGINT) AS ref_value_cents,
                CAST((us - ref_us) // 1000000 AS BIGINT) AS staleness_sec
         FROM r WHERE rn = 1""",
    "j17_interval_anti_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
         s AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'signup'),
         x AS (SELECT user_id, us FROM e WHERE event_type = 'error')
         SELECT s.event_id, s.user_id, s.us
         FROM s
         WHERE NOT EXISTS (
           SELECT 1 FROM x
           WHERE x.user_id = s.user_id
             AND x.us > s.us AND x.us <= s.us + 3600000000)""",
    "j16_interval_coverage" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
         i AS (SELECT event_type, us // 86400000000 AS day, us,
                      us + 300000000 AS e
               FROM e),
         s AS (SELECT event_type, day, us, e,
                      max(e) OVER (PARTITION BY event_type, day ORDER BY us
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pm
               FROM i)
         SELECT event_type, CAST(day AS BIGINT) AS day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(greatest(0, e - greatest(us, coalesce(pm, 0))))
                     AS BIGINT) AS covered_us,
                CAST(count(*) * 300000000 AS BIGINT) AS naive_us
         FROM s GROUP BY 1, 2""",
    "j12_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
         q AS (SELECT user_id, us, max(event_id) AS ref_event_id,
                      arg_max(value, event_id) AS ref_val
               FROM e WHERE event_type = 'signup' GROUP BY 1, 2),
         t AS (SELECT event_id, user_id, us FROM e WHERE event_type <> 'signup')
         SELECT t.event_id, t.user_id, t.us, q.ref_event_id,
                CAST(round(q.ref_val * 100, 0) AS BIGINT) AS ref_value_cents
         FROM t ASOF LEFT JOIN q ON t.user_id = q.user_id AND t.us >= q.us""",
    "j13_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
         w AS (SELECT event_id AS incident_id, us AS ws, us + 600000000 AS we
               FROM e WHERE event_type = 'error' AND value > 198)
         SELECT w.incident_id, e.event_id, e.user_id,
                CAST((e.us - w.ws) // 1000000 AS BIGINT) AS offset_sec
         FROM w JOIN e ON e.us >= w.ws AND e.us <= w.we AND e.event_id <> w.incident_id""",
    "j14_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
         q AS (SELECT user_id, us, min(event_id) AS next_event_id,
                      arg_min(value, event_id) AS next_val
               FROM e WHERE event_type = 'signup' GROUP BY 1, 2),
         t AS (SELECT event_id, user_id, us FROM e WHERE event_type <> 'signup')
         SELECT t.event_id, t.user_id, t.us, q.next_event_id,
                CAST(round(q.next_val * 100, 0) AS BIGINT) AS next_value_cents
         FROM t ASOF LEFT JOIN q ON t.user_id = q.user_id AND t.us <= q.us""",
    "j13b_range_join_exclusive" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
         w AS (SELECT event_id AS incident_id, us AS ws, us + 600000000 AS we
               FROM e WHERE event_type = 'error' AND value > 198)
         SELECT w.incident_id, e.event_id, e.user_id,
                CAST((e.us - w.ws) // 1000000 AS BIGINT) AS offset_sec
         FROM w JOIN e ON e.us >= w.ws AND e.us < w.we AND e.event_id <> w.incident_id""",
    "h2_cdc_snapshot" ->
      """WITH log AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CASE WHEN o_orderpriority = '5-LOW' THEN 'D' ELSE 'U' END AS op,
                  o_orderpriority AS state,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders)
         SELECT o_custkey, state, strftime(o_orderdate, '%Y-%m-%d') AS applied_at
         FROM log WHERE rn = 1 AND op <> 'D'""",
    "h1_scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderpriority AS state, o_orderdate AS dt, o_orderkey,
                           lag(o_orderpriority) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev
                    FROM orders),
         ch AS (SELECT o_custkey, state, dt, o_orderkey FROM o
                WHERE prev IS NULL OR prev <> state),
         v AS (SELECT o_custkey, state, dt,
                      lead(dt) OVER (PARTITION BY o_custkey ORDER BY dt, o_orderkey) AS vto
               FROM ch)
         SELECT o_custkey, state,
                strftime(dt, '%Y-%m-%d') AS valid_from,
                strftime(vto, '%Y-%m-%d') AS valid_to
         FROM v"""
  )
}
