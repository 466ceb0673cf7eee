package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.streaming.StreamOps

/** Event-time operators over the `events` table — the batch face of the
  * [[graft.streaming.StreamOps]] transforms (the reference itself is pure
  * batch, SURVEY §2.11; the engine still provides the event-time surface).
  *
  * `events.ts` arrives as epoch-nanos longs regardless of how the parquet
  * stored it — TIMESTAMP(NANOS) testdata reads as long under
  * Engine.builder's nanosAsLong, TIMESTAMP(MICROS) testdata is normalized
  * to nanos by Engine.table — so this module's `ts div 1000` micros idiom
  * is generation-independent.
  *
  * Scale notes: e1 is one hash aggregate on (window, type) — window binning
  * is a codegen'd projection, not a shuffle per window. e2 is classic
  * two-window sessionization: one shuffle on user_id, lag + running sum
  * within partitions, then a grouped aggregate on the same key (no second
  * shuffle — the partitioning is reused).
  */
object Events extends QueryModule {

  private def us: org.apache.spark.sql.Column = expr("ts div 1000")

  /** E1 — tumbling 1-day event-time window counts per type, through the
    * shared batch/streaming transform.
    */
  private def e1_event_window(s: SparkSession, d: String): DataFrame =
    StreamOps.windowedCounts(
      table(s, d, "events").withColumn("t", timestamp_micros(us))
    )

  /** E2 — gap-based sessionization (30-minute gap) in its batch SQL form:
    * lag detects gaps, a running sum assigns session ids, one aggregate
    * summarizes each session.
    */
  private def e2_sessionize(s: SparkSession, d: String): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"))
      .withColumn(
        "flag",
        when(col("us") - lag(col("us"), 1).over(w) > 30L * 60 * 1000000, 1).otherwise(0)
      )
      .withColumn("sid", sum(col("flag")).over(ws))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000).cast("long").as("duration_sec")
      )
      .select(
        col("user_id"),
        col("sid").cast("long").as("session_idx"),
        col("n_events"),
        col("duration_sec")
      )
  }

  /** E3 — per-key debounce: keep the FIRST event per (user, minute bucket),
    * deterministic tiebreak by (us, event_id) — the batch face of
    * [[graft.streaming.StreamOps.dedupWithinWatermark]] (whose streaming
    * state-eviction behavior is covered in StreamOpsSpec; the batch form is
    * a keep-first window so the kept row is well-defined for the oracle).
    * One shuffle on the group key, rank pushed map-side by
    * WindowGroupLimit.
    */
  private def e3_debounce(s: SparkSession, d: String): DataFrame = {
    val base = table(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"), col("event_type"))
      .withColumn("bucket", expr("us div 60000000"))
    val w = Window
      .partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("us"), col("event_id"))
    base
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("bucket"), col("event_id").as("first_event_id"), col("event_type"))
  }

  /** E4 — per-user rolling 1-hour aggregate (event-time RANGE frame): for
    * every event, the count and cent-sum of that user's events in the
    * preceding hour. The range frame is resolved inside the per-user sort —
    * one shuffle on user_id, no self-join (the naive formulation is an
    * O(n²/user) interval self-join). Cents (integer) rather than a float
    * sum, so the running total is merge-order-independent.
    */
  private def e4_rolling_window(s: SparkSession, d: String): DataFrame = {
    val HourUs = 3600L * 1000000L
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-HourUs, 0)
    table(s, d, "events")
      .select(
        col("event_id"),
        col("user_id"),
        us.as("us"),
        round(col("value") * 100, 0).cast("long").as("cents")
      )
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_cents_1h", sum(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), col("us"), col("n_1h"), col("sum_cents_1h"))
  }

  /** E5 — conversion funnel: per user, first signup → first purchase
    * at-or-after it, converted = within 7 days. Two keyed aggregates and
    * one join, all hash-partitioned on user_id (AQE reuses the
    * partitioning) — no per-user event-list collection, no window over the
    * full event stream. The left join keeps never-converting users visible
    * (silently dropping them would bias any funnel metric downstream).
    */
  private def e5_funnel(s: SparkSession, d: String): DataFrame = {
    val WeekUs = 7L * 24 * 3600 * 1000000L
    val e = table(s, d, "events").select(col("user_id"), us.as("us"), col("event_type"))
    val signups = e
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("s_us"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .join(signups, "user_id")
      .filter(col("us") >= col("s_us"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("p_us"))
    signups
      .join(purchases, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("s_us"),
        col("p_us"),
        coalesce(col("p_us") - col("s_us") <= WeekUs, lit(false)).as("converted")
      )
  }

  /** E20 — RETENTION COHORT MATRIX (the day-N retention table every
    * product/engagement dashboard is built on, and the one classic
    * event-analytics output the family still lacked next to e5's funnel
    * and e18's transitions): cohort = a user's first-active day; cell
    * (cohort, n) = how many of that cohort's users were active again n
    * days later, as a per-mille of cohort size. Day 0 is the cohort size
    * itself by construction (retention_pm = 1000 — the spec pins it);
    * n is capped at 14 (the day-14 retention window) so the matrix is
    * value-domain-bounded regardless of the stream's time span.
    *
    * Scale shape: ONE distinct over (user, day) — the only corpus-sized
    * shuffle — then a user-keyed min aggregate, a user-keyed join back,
    * and a (cohort, n) count-distinct over ≤ cohorts×15 cells. No windows,
    * no per-user event-list collection; every step is hash-partitioned on
    * its key and AQE reuses the user_id partitioning across the join.
    */
  /** The per-user COHORT STATE — (user_id, c_day, mask) with c_day = the
    * user's first-active day and mask = the 15-bit day-0..14 activity
    * bitmap — from a distinct (user_id, day) activity frame. This is the
    * batch form of the state [[graft.streaming.StreamOps.retentionCohorts]]
    * folds incrementally (min/bit_or are a semilattice, so the stream fold
    * and this batch build land on identical rows); one row per user,
    * value-domain-bounded columns.
    */
  private[graft] def cohortState(act: DataFrame): DataFrame = {
    val cohort = act.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
    act
      .join(cohort, "user_id")
      .filter(col("day") - col("c_day") <= 14)
      .groupBy(col("user_id"), col("c_day"))
      .agg(
        expr("bit_or(shiftleft(1L, cast(day - c_day as int)))").as("mask")
      )
  }

  /** The retention matrix from the cohort state: one row per (cohort, n)
    * with a set day-n bit, as per-mille of cohort size — the exact output
    * shape e20 always had (day 0 is the cohort size by construction).
    */
  private[graft] def cohortMatrix(state: DataFrame): DataFrame = {
    val sizes = state.groupBy(col("c_day")).agg(count(lit(1)).as("cohort_users"))
    state
      .select(
        col("c_day"),
        explode(expr("filter(sequence(0, 14), n -> (shiftright(mask, n) & 1) = 1)")).as("day_n")
      )
      .groupBy(col("c_day"), col("day_n"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "c_day")
      .select(
        col("c_day").cast("long").as("cohort_day"),
        col("day_n").cast("long").as("day_n"),
        col("active_users").cast("long").as("active_users"),
        col("cohort_users").cast("long").as("cohort_users"),
        expr("1000 * active_users div cohort_users").as("retention_pm")
      )
  }

  private def e20_retention_cohorts(s: SparkSession, d: String): DataFrame = {
    // `act` feeds multiple consumers, but all inside ONE plan tree, so the
    // distinct's exchange is computed once and re-read via ReusedExchange
    // — unlike x40's jlDistances, whose consumers run as SEPARATE actions
    // and need the cachePin. MEASURED (r17, the r16 ADVICE's alternative):
    // pinning act ran 0.84 s vs 0.77 s unpinned at sf0.1 (solo A/B, min
    // of two) — the InMemoryRelation fill plus non-codegen cache scans
    // cost more than the exchange reuse they replace — so the single-plan
    // shape deliberately stays unpinned. The matrix derivation is shared
    // with the streaming face through [[cohortState]]/[[cohortMatrix]]:
    // per-user 15-bit activity masks, identical output rows (a user's
    // distinct active day within the window = a set bit = one count).
    val act = table(s, d, "events")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    cohortMatrix(cohortState(act))
  }

  /** E6 — inter-arrival-time histogram: per-user deltas between consecutive
    * events (lag over one user_id shuffle), bucketed to minutes and counted
    * — the distribution that drives session-gap and rate-limit tuning.
    * Minute bucketing is integer floor division, so the histogram is exact
    * cross-engine; both window and final count are map-side-combinable.
    */
  private def e6_interarrival(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    table(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr("(us - prev) div 60000000").as("gap_min"))
      .groupBy(col("gap_min"))
      .agg(count(lit(1)).as("n"))
  }

  /** E7 — calendar-spine gap filling: daily order counts DENSIFIED over the
    * full min→max date range, missing days present with zero counts. Time
    * series consumers (trend models, anomaly detectors) need the dense
    * form; the naive groupBy silently omits empty days. The spine comes
    * from one broadcast single-row min/max aggregate exploded through
    * `sequence` — no driver round-trip, and the left join against the
    * (already aggregated, small) daily counts broadcasts. Counting to the
    * spine, not filtering to the data, is the point.
    */
  private def e7_gap_fill(s: SparkSession, d: String): DataFrame = {
    val daily = table(s, d, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val bounds = table(s, d, "orders")
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine
      .join(daily, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders")
      )
  }

  /** E10 — linear interpolation over hourly gaps: hourly mean value (integer
    * cents) per event type, a dense hour spine per type (min..max — endpoints
    * always present, so every gap has both neighbors), and missing hours
    * filled with the integer-exact weighted average
    * (pv·(nh−hr) + nv·(hr−ph)) DIV (nh−ph) — numerator built non-negative so
    * truncating integer division is unambiguous and both engines agree
    * bit-for-bit. Each row carries an `interpolated` audit flag.
    *
    * Scale: the spine is generated from a per-type (min, max) aggregate —
    * never a driver loop; the fill is one window partitioned by type (the
    * e2/e4 shuffle class, reused partitioning, no self-join per gap).
    */
  private def e10_interpolate(s: SparkSession, d: String): DataFrame = {
    val hourly = table(s, d, "events")
      .select(
        col("event_type"),
        expr("ts div 3600000000000").as("hr"),
        round(col("value") * 100, 0).cast("long").as("cents")
      )
      .groupBy("event_type", "hr")
      .agg(expr("sum(cents) div count(1)").as("v"))
    val spans = hourly.groupBy("event_type").agg(min("hr").as("h0"), max("hr").as("h1"))
    val grid =
      spans.select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w  = Window.partitionBy("event_type").orderBy("hr")
    val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid
      .join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
      .withColumn("ph", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
      .withColumn("nh", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wF))
      .select(
        col("event_type"),
        col("hr"),
        when(col("v").isNotNull, col("v"))
          .otherwise(expr("(pv * (nh - hr) + nv * (hr - ph)) DIV (nh - ph)"))
          .as("v_q"),
        col("v").isNull.cast("int").as("interpolated")
      )
  }

  /** E8 — SLIDING event-time windows (10-minute length, 5-minute slide):
    * per (window, type) counts and cent-sums, the overlapping-window
    * counterpart of e1's tumbling windows. Spark's `window()` expands each
    * event into exactly length/slide = 2 window rows inside a codegen'd
    * projection (no self-join, no shuffle per window) and the aggregate is
    * one map-side-combinable hash agg on (window_start, type) — the shape
    * that holds at any event volume. The oracle materializes the same two
    * epoch-aligned starts per event explicitly. Window starts reported as
    * epoch seconds; cents so the sum is merge-order-exact.
    */
  private def e8_sliding_window(s: SparkSession, d: String): DataFrame =
    StreamOps.slidingCounts(
      table(s, d, "events").withColumn("t", timestamp_micros(us))
    )

  /** E9 — NATIVE gap-based session windows (`session_window`, 30-minute
    * gap): the built-in operator form of e2's manual lag+running-sum
    * islands — one shuffle on the session key, merge logic inside the
    * aggregation operator, and the same construct drives streaming
    * session state. Boundary semantic pinned by the oracle: Spark closes
    * a session when the next event is AT OR BEYOND gap (windows merge
    * only while t₂ < t₁+gap), so the oracle's new-session flag is `>=` —
    * e2's manual form uses `>` and the two legitimately differ on an
    * exactly-gap-apart pair. Window bounds are [first event, last event
    * + gap), reported in floor-seconds.
    */
  private def e9_session_window_native(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .select(timestamp_micros(us).as("t"), col("user_id"))
      .groupBy(session_window(col("t"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("w.start").cast("long").as("session_start_s"),
        col("w.end").cast("long").as("session_end_s"),
        col("n_events")
      )

  /** E11 — out-of-orderness census, the watermark-sizing measurement: per
    * keyed stream (user_id — the key a stateful operator partitions its
    * watermark state by), each event's lateness = running max of event
    * time along the ingest order (event_id, the arrival sequence) minus
    * the event's own time, then a power-of-two lateness histogram per
    * event type. The histogram answers the operational question the
    * streaming surface's `withWatermark` delay hardcodes: what delay keeps
    * which fraction of events inside the state window
    * (dedupWithinWatermark / Sessionizer's eviction knob).
    *
    * Per-key because keyed stateful operators evict per key; a global-
    * arrival variant would need o7's two-level bounded-prefix pattern
    * (a global running max is a single-partition window — banned).
    *
    * Scale: one shuffle (the per-user window), then a tiny
    * (type × bucket) aggregate. The power-of-two bucketing is c10's
    * integer idiom — no float quantiles, and histograms merge across
    * shards by addition.
    */
  private def e11_disorder_census(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("us"))
      .withColumn("late_us", max("us").over(w) - col("us"))
      .select(
        col("event_type"),
        when(col("late_us") === 0, 0L)
          .when(col("late_us") === 1, 1L)
          .otherwise(
            expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(late_us - 1)) AS INT))")
          )
          .as("late_bucket_us"),
        col("late_us")
      )
      .groupBy("event_type", "late_bucket_us")
      .agg(count(lit(1)).as("n_events"), max("late_us").as("max_late_us"))
  }

  /** E12 — GLOBAL out-of-orderness census: e11's lateness histogram
    * against the running event-time max over the WHOLE ingest order, not
    * per key — the measurement a source-global watermark needs. A global
    * running max is a single-partition window, so this runs o7's two-level
    * decomposition instead: (1) range-bucket the arrival keys
    * (`event_id div 1000`), (2) per-bucket running max under a PARTITIONED
    * window, (3) a bucket-max spine (one row per bucket) gets the
    * cross-bucket prefix max under a bounded global window and broadcasts
    * back, (4) global running max = greatest(local running max, previous
    * buckets' spine max). The distributed prefix-scan shape: only the
    * spine — rows = arrival-key span ÷ 1000, the o7 boundedness argument —
    * ever sees a global order.
    */
  private def e12_global_disorder(s: SparkSession, d: String): DataFrame = {
    val ev = table(s, d, "events")
      .select(col("event_id"), col("event_type"), us.as("us"))
      .withColumn("bucket", expr("event_id div 1000"))
    val wIn = Window
      .partitionBy("bucket")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ev.withColumn("lmax", max("us").over(wIn))
    val wOff  = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val spine = ev
      .groupBy("bucket")
      .agg(max("us").as("bmax"))
      .withColumn("pmax", max("bmax").over(wOff))
      .select(col("bucket"), col("pmax"))
    local
      .join(broadcast(spine), "bucket")
      .withColumn(
        "late_us",
        when(col("pmax").isNull, col("lmax")).otherwise(greatest(col("lmax"), col("pmax")))
          - col("us")
      )
      .select(
        col("event_type"),
        when(col("late_us") === 0, 0L)
          .when(col("late_us") === 1, 1L)
          .otherwise(
            expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(late_us - 1)) AS INT))")
          )
          .as("late_bucket_us"),
        col("late_us")
      )
      .groupBy("event_type", "late_bucket_us")
      .agg(count(lit(1)).as("n_events"), max("late_us").as("max_late_us"))
  }

  /** E13 — watermark-eviction audit: e11/e12 MEASURE disorder; this query
    * APPLIES the admission policy and reports its cost. Each event is
    * classified against the global watermark a streaming engine would hold
    * at its arrival — running event-time max over all STRICTLY EARLIER
    * arrivals minus the allowed lateness (5 s here, the knob
    * dedupWithinWatermark/Sessionizer hardcode): `on_time` (at or above
    * the running max), `late_admitted` (behind it but within the
    * allowance), `dropped` (behind by more than the allowance — the rows a
    * `withWatermark("5 seconds")` pipeline silently evicts). The per-type
    * verdict counts are the data-loss budget a delay choice commits to,
    * measured on the actual stream instead of assumed.
    *
    * Same two-level spine as e12 (the global prefix max decomposed into
    * per-bucket partitioned windows plus a ≤-bucket-count spine), except
    * the in-bucket frame ends at -1: the watermark that judges an event
    * excludes the event itself.
    */
  private def e13_watermark_audit(s: SparkSession, d: String): DataFrame = {
    val allowedUs = 5000000L
    val ev = table(s, d, "events")
      .select(col("event_id"), col("event_type"), us.as("us"))
      .withColumn("bucket", expr("event_id div 1000"))
    val wIn = Window
      .partitionBy("bucket")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ev.withColumn("lmax", max("us").over(wIn))
    val wOff  = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val spine = ev
      .groupBy("bucket")
      .agg(max("us").as("bmax"))
      .withColumn("pmax", max("bmax").over(wOff))
      .select(col("bucket"), col("pmax"))
    local
      .join(broadcast(spine), "bucket")
      .withColumn(
        "late_us",
        when(col("lmax").isNull && col("pmax").isNull, lit(null).cast("long"))
          .when(col("lmax").isNull, col("pmax") - col("us"))
          .when(col("pmax").isNull, col("lmax") - col("us"))
          .otherwise(greatest(col("lmax"), col("pmax")) - col("us"))
      )
      .select(
        col("event_type"),
        when(col("late_us").isNull || col("late_us") <= 0, "on_time")
          .when(col("late_us") <= allowedUs, "late_admitted")
          .otherwise("dropped")
          .as("verdict"),
        when(col("late_us") > 0, col("late_us")).otherwise(0L).as("pos_late")
      )
      .groupBy("event_type", "verdict")
      .agg(count(lit(1)).as("n_events"), max("pos_late").as("max_late_us"))
  }

  /** E14 — retraction census, the UPDATE-MODE cost measurement: e13 prices
    * a delay by what it DROPS; e14 prices the alternative — admit
    * everything and re-emit. An event is a `late update` to its 1-minute
    * tumbling window when, at its arrival, the global running event-time
    * max (strictly earlier arrivals — e13's watermark base, allowance 0)
    * has already passed the window's END: a zero-lateness emitter would
    * have finalized that window, so this arrival forces a downstream
    * retraction/re-emit. Per type: events, late updates, dirty windows
    * (re-emitted at least once), total windows — the retraction amplification
    * a sink (and everything downstream of it) must absorb if the pipeline
    * chooses update mode over dropping. Same two-level spine as e12/e13.
    */
  private def e14_retraction_census(s: SparkSession, d: String): DataFrame = {
    val winUs = 60000000L // 1-minute tumbling windows
    val ev = table(s, d, "events")
      .select(col("event_id"), col("event_type"), us.as("us"))
      .withColumn("bucket", expr("event_id div 1000"))
    val wIn = Window
      .partitionBy("bucket")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ev.withColumn("lmax", max("us").over(wIn))
    val wOff  = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val spine = ev
      .groupBy("bucket")
      .agg(max("us").as("bmax"))
      .withColumn("pmax", max("bmax").over(wOff))
      .select(col("bucket"), col("pmax"))
    local
      .join(broadcast(spine), "bucket")
      .withColumn(
        "wm",
        when(col("lmax").isNull && col("pmax").isNull, lit(null).cast("long"))
          .when(col("lmax").isNull, col("pmax"))
          .when(col("pmax").isNull, col("lmax"))
          .otherwise(greatest(col("lmax"), col("pmax")))
      )
      .withColumn("wstart", expr(s"us div $winUs"))
      .withColumn(
        "late_update",
        col("wm").isNotNull && col("wm") >= (col("wstart") + 1) * lit(winUs)
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_update"), 1L).otherwise(0L)).as("n_late_updates"),
        countDistinct(when(col("late_update"), col("wstart"))).as("n_dirty_windows"),
        countDistinct(col("wstart")).as("n_windows")
      )
  }

  /** E15 — per-window distinct-user SKETCH next to truth: x10's all-integer
    * HLL registers keyed by the 1-hour tumbling window, with the exact
    * per-window distinct count as the audit column — the sketch-inside-
    * window composition a streaming dashboard actually runs (per-window
    * cardinality state = 64 registers, mergeable across shards by
    * register max, instead of a per-window distinct-user set that grows
    * with traffic). The exact column exists because the test corpus can
    * afford truth; at 100 TB only the registers survive and d10/x13's
    * estimate-vs-truth discipline is what this row calibrates.
    *
    * Scale: both aggregations key by window (map-side combinable), the
    * join is window-keyed — nothing global, state O(windows × 64).
    */
  private def e15_window_distinct_sketch(s: SparkSession, d: String): DataFrame = {
    val ev = table(s, d, "events")
      .select(us.as("us"), col("user_id"))
      .withColumn("win", expr("us div 3600000000"))
    val counts = ev
      .groupBy("win")
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users_exact"))
    val est = ev
      .select(
        col("win"),
        expr("conv(substr(md5(CAST(user_id AS STRING)), 1, 6), 16, 10)").cast("long").as("h24")
      )
      .select(
        col("win"),
        expr("h24 div 262144").as("bucket"),
        when(expr("h24 % 262144") === 0, 19L)
          .otherwise(lit(19L) - length(expr("bin(h24 % 262144)")))
          .as("rho")
      )
      .groupBy("win", "bucket")
      .agg(max("rho").as("register"))
      .groupBy("win")
      .agg(
        sum(expr("cast(shiftleft(1, cast(19 - register as int)) as long)")).as("sp"),
        count(lit(1)).as("np")
      )
      .select(col("win"), (col("sp") + (lit(64L) - col("np")) * lit(524288L)).as("sreg"))
      .select(
        col("win"),
        expr(s"${709L * 4096L * 524288L} div (sreg * 1000)").as("n_users_est_q")
      )
    counts
      .join(est, "win")
      .select(
        (col("win") * 3600).as("win_start_s"),
        col("n_events"),
        col("n_users_exact"),
        col("n_users_est_q")
      )
  }

  /** E16 — exponential time-decay (half-life = 1 day) recency weighting per
    * event type: the freshness prior a corpus-mixing loop applies when
    * deciding how much of each stream to admit (yesterday's crawl counts
    * double tomorrow's). Weight = 2^(day − min_day), so the NEWEST day
    * carries the largest power of two and every day older halves it —
    * equivalent to 2^(−age) up to one shared scale factor, which the
    * per-mille share divides back out. All integer: the weight is a bigint
    * shift (capped at 2^62 for spans the harness never reaches), the share
    * is positive-operand integer division, so no float crosses the engine
    * boundary and the sum is order-independent.
    *
    * Scale: one hash aggregate on event_type (map-side combinable); the
    * day span and the grand total are single-row broadcasts (the two BNLJs
    * the sweep allowlists). At 100 TB the decayed sums stay bounded by the
    * 62-bit cap only if the day span is ≤ ~30; a production run would
    * bucket ages at a coarser grain (weeks) or renormalize per window —
    * the per-mille output is invariant to that shared rescale.
    */
  private def e16_time_decay(s: SparkSession, d: String): DataFrame = {
    val ev = table(s, d, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
    val span = ev.agg(min(col("day")).as("d0"))
    val perType = ev
      .crossJoin(broadcast(span))
      .select(
        col("event_type"),
        expr("cast(shiftleft(cast(1 as bigint), cast(least(day - d0, 62L) as int)) as long)")
          .as("wt")
      )
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("decayed"))
    val total = perType.agg(sum(col("decayed")).as("total"))
    perType
      .crossJoin(broadcast(total))
      .select(
        col("event_type"),
        col("n_events"),
        col("decayed"),
        expr("(1000 * decayed) div total").as("decayed_pm")
      )
  }

  /** E17 — per-window HEAVY HITTERS: top-3 event types per 6-hour tumbling
    * window by count, deterministic tiebreak — the windowed drill-down a
    * monitoring/trending surface serves ("what dominated each window"),
    * and the batch face of the streaming top-k pattern. Two-level shape:
    * a hash aggregate on (window, type) — map-side combinable, the only
    * full shuffle — then the rank window runs per-window over at most
    * |event types| rows, so the sort input is bounded by the type
    * cardinality, never by event volume.
    */
  private def e17_window_topk(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = table(s, d, "events")
      .select(expr("ts div 1000 div 21600000000").as("win"), col("event_type"))
      .groupBy(col("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("win")).orderBy(col("n").desc, col("event_type").asc)
    counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("win"), col("event_type"), col("n"), col("rnk"))
  }

  /** E18 — event-type transition matrix (the first-order Markov census a
    * journey/funnel analysis starts from): per user, order events by time,
    * pair each with its predecessor's type, count (from, to) transitions
    * globally, and derive the per-from transition probability in basis
    * points (integer, hash-stable across engines).
    *
    * Scale shape: ONE shuffle on user_id for the lag window (the same
    * partitioning e2/e6 use), then a hash aggregate whose output is
    * |types|² rows — the per-from normalization window runs on that
    * type-cardinality-bounded frame, never on the event stream.
    */
  private def e18_transition_matrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = table(s, d, "events")
      .select(col("user_id"), col("event_id"), us.as("us"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("prob_bp", expr("n * 10000 div sum(n) OVER (PARTITION BY from_type)"))
      .select(col("from_type"), col("to_type"), col("n"), col("prob_bp"))
  }

  /** E19 — CUSUM drift detection over the daily event-rate series (Page
    * 1954, the sequential change-point test a data-quality monitor runs on
    * every ingest stream: "did this source's volume shift?"): per type,
    * daily counts x_d, reference k = mu + mu/4 (mu = the type's integer
    * mean daily rate, the quarter-mu slack absorbing normal fluctuation),
    * and the one-sided cumulative statistic CUSUM+_d = max(0, CUSUM+_{d-1}
    * + x_d - k) — computed NOT as a per-row recursion but via the exact
    * prefix identity CUSUM+_d = S_d - min(0, min_{i<=d} S_i) with
    * S = cumsum(x - k), so two windows over the daily spine replace the
    * sequential loop (the same running-extreme decomposition e11/j16 use).
    * Alarm when CUSUM+ > 2·mu. A drift is PLANTED arithmetically on the
    * spine — the alphabetically-first type gains 4·mu/day over the final 3
    * days (engine and oracle apply the identical integer plant, the d18/m11
    * planted-recall discipline) — so the output proves the alarm fires on
    * the planted window and stays quiet elsewhere.
    *
    * Scale shape: the raw event stream collapses to the (type, day) spine
    * in ONE map-side-combinable hash aggregate; every window after runs on
    * that |types|·|days|-bounded frame, never on events. The global
    * (dmax, planted-type) row is a single-row broadcast; mu joins back on
    * the type key. Missing zero-event days would shorten the prefix sums
    * identically in both engines (a production monitor would gap-fill via
    * e7's calendar spine first). All arithmetic is integer, so no float
    * crosses the engine boundary.
    */
  private def e19_cusum_drift(s: SparkSession, d: String): DataFrame = {
    val daily = table(s, d, "events")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val glob = daily.agg(max(col("day")).as("dmax"), min(col("event_type")).as("ptype"))
    val mu   = daily.groupBy(col("event_type")).agg(expr("sum(x) div count(1)").as("mu"))
    val w    = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .crossJoin(broadcast(glob))
      .join(mu, "event_type")
      .select(
        col("event_type"),
        col("day"),
        col("mu"),
        (col("x") + when(
          col("event_type") === col("ptype") && col("day") >= col("dmax") - 2,
          lit(4L) * col("mu")
        ).otherwise(lit(0L))).as("xp")
      )
      .withColumn("ss", sum(col("xp") - col("mu") - expr("mu div 4")).over(w))
      .withColumn("cusum", col("ss") - least(min(col("ss")).over(w), lit(0L)))
      .select(
        col("event_type"),
        col("day"),
        col("xp").as("n_events"),
        col("cusum"),
        when(col("cusum") > lit(2L) * col("mu"), 1L).otherwise(0L).as("alarm")
      )
  }

  /** CUSUM+ statistic and alarm over a (event_type, day, x) daily spine —
    * the read side of the STREAMING face
    * ([[graft.streaming.StreamOps.cusumDailySink]] maintains the spine,
    * this derives the live alarms; no plant — real rates, unlike e19's
    * demo which rides an arithmetic drift plant on top of the unplanted
    * reference mu): per type, mu = integer mean daily rate, reference
    * k = mu + mu/4, CUSUM+_d via the prefix identity
    * S_d − min(0, min_{i≤d} S_i), alarm when CUSUM+ > 2·mu. All windows
    * run on the |types|·|days|-bounded spine.
    */
  private[graft] def cusumOverDaily(daily: DataFrame): DataFrame = {
    val mu = daily.groupBy(col("event_type")).agg(expr("sum(x) div count(1)").as("mu"))
    val w  = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .join(mu, "event_type")
      .withColumn("ss", sum(col("x") - col("mu") - expr("mu div 4")).over(w))
      .withColumn("cusum", col("ss") - least(min(col("ss")).over(w), lit(0L)))
      .select(
        col("event_type"),
        col("day"),
        col("x").as("n_events"),
        col("cusum"),
        when(col("cusum") > lit(2L) * col("mu"), 1L).otherwise(0L).as("alarm")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e20_retention_cohorts" -> (e20_retention_cohorts _),
    "e19_cusum_drift" -> (e19_cusum_drift _),
    "e18_transition_matrix" -> (e18_transition_matrix _),
    "e17_window_topk" -> (e17_window_topk _),
    "e16_time_decay" -> (e16_time_decay _),
    "e12_global_disorder" -> (e12_global_disorder _),
    "e13_watermark_audit" -> (e13_watermark_audit _),
    "e14_retraction_census" -> (e14_retraction_census _),
    "e15_window_distinct_sketch" -> (e15_window_distinct_sketch _),
    "e11_disorder_census" -> (e11_disorder_census _),
    "e9_session_window_native" -> (e9_session_window_native _),
    "e8_sliding_window" -> (e8_sliding_window _),
    "e7_gap_fill" -> (e7_gap_fill _),
    "e10_interpolate" -> (e10_interpolate _),
    "e1_event_window" -> (e1_event_window _),
    "e2_sessionize" -> (e2_sessionize _),
    "e3_debounce" -> (e3_debounce _),
    "e4_rolling_window" -> (e4_rolling_window _),
    "e5_funnel" -> (e5_funnel _),
    "e6_interarrival" -> (e6_interarrival _)
  )

  val oracles: Map[String, String] = Map(
    "e20_retention_cohorts" ->
      """WITH act AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         cohort AS (SELECT user_id, min(day) AS c_day FROM act GROUP BY 1),
         sizes AS (SELECT c_day, count(DISTINCT user_id) AS cohort_users
                   FROM cohort GROUP BY 1),
         ret AS (
           SELECT c.c_day, a.day - c.c_day AS day_n,
                  count(DISTINCT a.user_id) AS active_users
           FROM act a JOIN cohort c ON a.user_id = c.user_id
           WHERE a.day - c.c_day <= 14
           GROUP BY 1, 2)
         SELECT CAST(r.c_day AS BIGINT) AS cohort_day,
                CAST(r.day_n AS BIGINT) AS day_n,
                CAST(r.active_users AS BIGINT) AS active_users,
                CAST(s.cohort_users AS BIGINT) AS cohort_users,
                CAST(1000 * r.active_users // s.cohort_users AS BIGINT) AS retention_pm
         FROM ret r JOIN sizes s ON r.c_day = s.c_day""",
    "e19_cusum_drift" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                               count(*) AS x
                        FROM events GROUP BY 1, 2),
         g AS (SELECT max(day) AS dmax, min(event_type) AS ptype FROM daily),
         m AS (SELECT event_type, sum(x) // count(*) AS mu FROM daily GROUP BY 1),
         p AS (SELECT d.event_type, d.day, m.mu,
                      d.x + CASE WHEN d.event_type = g.ptype
                                  AND d.day >= g.dmax - 2
                                 THEN 4 * m.mu ELSE 0 END AS xp
               FROM daily d CROSS JOIN g
               JOIN m ON d.event_type = m.event_type),
         sdev AS (SELECT event_type, day, xp, mu,
                         sum(xp - mu - mu // 4)
                           OVER (PARTITION BY event_type ORDER BY day) AS ss
                  FROM p),
         c AS (SELECT event_type, day, xp, mu,
                      ss - least(min(ss) OVER (PARTITION BY event_type
                                               ORDER BY day), 0) AS cusum
               FROM sdev)
         SELECT event_type, CAST(day AS BIGINT) AS day,
                CAST(xp AS BIGINT) AS n_events,
                CAST(cusum AS BIGINT) AS cusum,
                CAST(CASE WHEN cusum > 2 * mu THEN 1 ELSE 0 END AS BIGINT)
                  AS alarm
         FROM c""",
    "e18_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
                    FROM events),
         p AS (SELECT event_type AS to_type,
                      lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY us, event_id) AS from_type
               FROM e),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
                CAST(n * 10000 // sum(n) OVER (PARTITION BY from_type)
                     AS BIGINT) AS prob_bp
         FROM c""",
    "e17_window_topk" ->
      """WITH c AS (
           SELECT epoch_us(ts) // 21600000000 AS win, event_type,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY win
                       ORDER BY n DESC, event_type) AS rnk
           FROM c)
         SELECT CAST(win AS BIGINT) AS win, event_type,
                CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= 3""",
    "e16_time_decay" ->
      """WITH e AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day FROM events),
         span AS (SELECT min(day) AS d0 FROM e),
         w AS (SELECT event_type,
                      1::BIGINT << CAST(least(day - d0, 62) AS INTEGER) AS wt
               FROM e, span),
         t AS (SELECT event_type, count(*) AS n_events, sum(wt) AS decayed
               FROM w GROUP BY 1),
         g AS (SELECT sum(decayed) AS total FROM t)
         SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
                CAST(decayed AS BIGINT) AS decayed,
                CAST((1000 * decayed) // total AS BIGINT) AS decayed_pm
         FROM t, g""",
    "e15_window_distinct_sketch" ->
      s"""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS win, user_id FROM events),
         c AS (SELECT win, count(*) AS n_events,
                      count(DISTINCT user_id) AS n_users_exact
               FROM e GROUP BY 1),
         h AS (SELECT win,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT AS h24
               FROM e),
         r AS (SELECT win, h24 // 262144 AS bucket,
                      CASE WHEN h24 % 262144 = 0 THEN 19
                           ELSE 19 - length(bin(h24 % 262144)) END AS rho
               FROM h),
         regs AS (SELECT win, bucket, max(rho) AS register FROM r GROUP BY 1, 2),
         est AS (SELECT win,
                        sum(1 << (19 - register)) + (64 - count(*)) * 524288 AS sreg
                 FROM regs GROUP BY 1)
         SELECT CAST(c.win * 3600 AS BIGINT) AS win_start_s,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(n_users_exact AS BIGINT) AS n_users_exact,
                CAST(${709L * 4096L * 524288L} // (sreg * 1000) AS BIGINT) AS n_users_est_q
         FROM c JOIN est ON est.win = c.win""",
    "e14_retraction_census" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
         l AS (SELECT event_type, us,
                      max(us) OVER (ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
               FROM e),
         c AS (SELECT event_type, us // 60000000 AS wstart,
                      (wm IS NOT NULL AND wm >= (us // 60000000 + 1) * 60000000) AS late_update
               FROM l)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN late_update THEN 1 ELSE 0 END) AS BIGINT) AS n_late_updates,
                CAST(count(DISTINCT CASE WHEN late_update THEN wstart END) AS BIGINT)
                  AS n_dirty_windows,
                CAST(count(DISTINCT wstart) AS BIGINT) AS n_windows
         FROM c GROUP BY 1""",
    "e13_watermark_audit" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
         l AS (SELECT event_type, us,
                      max(us) OVER (ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
               FROM e),
         c AS (SELECT event_type, wm - us AS late_us FROM l),
         v AS (SELECT event_type,
                      CASE WHEN late_us IS NULL OR late_us <= 0 THEN 'on_time'
                           WHEN late_us <= 5000000 THEN 'late_admitted'
                           ELSE 'dropped' END AS verdict,
                      CASE WHEN late_us > 0 THEN late_us ELSE 0 END AS pos_late
               FROM c)
         SELECT event_type, verdict,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(pos_late) AS BIGINT) AS max_late_us
         FROM v GROUP BY 1, 2""",
    "e12_global_disorder" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
         l AS (SELECT event_type,
                      max(us) OVER (ORDER BY event_id
                                    ROWS UNBOUNDED PRECEDING) - us AS late_us
               FROM e),
         b AS (SELECT event_type, late_us,
                      CASE WHEN late_us = 0 THEN 0
                           WHEN late_us = 1 THEN 1
                           ELSE (CAST(1 AS BIGINT) << CAST(length(bin(late_us - 1)) AS INT))
                      END AS late_bucket_us
               FROM l)
         SELECT event_type, CAST(late_bucket_us AS BIGINT) AS late_bucket_us,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(late_us) AS BIGINT) AS max_late_us
         FROM b GROUP BY 1, 2""",
    "e11_disorder_census" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         l AS (SELECT event_type,
                      max(us) OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS UNBOUNDED PRECEDING) - us AS late_us
               FROM e),
         b AS (SELECT event_type, late_us,
                      CASE WHEN late_us = 0 THEN 0
                           WHEN late_us = 1 THEN 1
                           ELSE (CAST(1 AS BIGINT) << CAST(length(bin(late_us - 1)) AS INT))
                      END AS late_bucket_us
               FROM l)
         SELECT event_type, CAST(late_bucket_us AS BIGINT) AS late_bucket_us,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(late_us) AS BIGINT) AS max_late_us
         FROM b GROUP BY 1, 2""",
    "e10_interpolate" ->
      """WITH hourly AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
                sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS v
         FROM events GROUP BY 1, 2),
         sp AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1),
         grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hr FROM sp),
         j AS (SELECT g.event_type, g.hr, h.v
               FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr),
         f AS (SELECT event_type, hr, v,
                last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
               FROM j)
         SELECT event_type, CAST(hr AS BIGINT) AS hr,
                CAST(CASE WHEN v IS NOT NULL THEN v
                          ELSE (pv * (nh - hr) + nv * (hr - ph)) // (nh - ph) END AS BIGINT) AS v_q,
                CAST(v IS NULL AS INT) AS interpolated
         FROM f""",
    "e1_event_window" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS wday, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
         FROM events GROUP BY 1, 2""",
    "e2_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) > 1800000000
                              THEN 1 ELSE 0 END AS flag FROM e),
         s AS (SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
         FROM s GROUP BY 1, 2""",
    "e3_debounce" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
         b AS (SELECT *, us // 60000000 AS bucket FROM e),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket
                         ORDER BY us, event_id) AS rn FROM b)
         SELECT user_id, bucket, event_id AS first_event_id, event_type
         FROM r WHERE rn = 1""",
    "e4_rolling_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events)
         SELECT event_id, user_id, us,
                CAST(count(*) OVER w AS BIGINT) AS n_1h,
                CAST(sum(cents) OVER w AS BIGINT) AS sum_cents_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "e7_gap_fill" ->
      """WITH b AS (SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders),
         spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM b),
         daily AS (SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS n
                   FROM orders GROUP BY 1)
         SELECT strftime(spine.day, '%Y-%m-%d') AS day,
                coalesce(daily.n, 0) AS n_orders
         FROM spine LEFT JOIN daily ON spine.day = daily.day""",
    "e9_session_window_native" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) >= 1800000000
                              THEN 1 ELSE 0 END AS flag FROM e),
         s AS (SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id,
                CAST(min(us) // 1000000 AS BIGINT) AS session_start_s,
                CAST((max(us) + 1800000000) // 1000000 AS BIGINT) AS session_end_s,
                CAST(count(*) AS BIGINT) AS n_events
         FROM s GROUP BY user_id, sid""",
    // e8: size 10 min / slide 5 min ⇒ every event lands in EXACTLY two
    // epoch-aligned windows: [s, s+600) with s = us div 300e6 · 300, and
    // [s−300, s+300). The UNION ALL materializes both memberships.
    "e8_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events),
         m AS (SELECT (us // 300000000) * 300 AS ws, event_type, cents FROM e
               UNION ALL
               SELECT (us // 300000000) * 300 - 300 AS ws, event_type, cents FROM e)
         SELECT CAST(ws AS BIGINT) AS ws, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cents) AS BIGINT) AS total_cents
         FROM m GROUP BY 1, 2""",
    "e6_interarrival" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         g AS (SELECT us - lag(us) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS gap FROM e)
         SELECT CAST(gap // 60000000 AS BIGINT) AS gap_min,
                CAST(count(*) AS BIGINT) AS n
         FROM g WHERE gap IS NOT NULL GROUP BY 1""",
    "e5_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
         s AS (SELECT user_id, min(us) AS s_us FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         p AS (SELECT e.user_id, min(e.us) AS p_us
               FROM e JOIN s ON e.user_id = s.user_id
               WHERE e.event_type = 'purchase' AND e.us >= s.s_us GROUP BY 1)
         SELECT s.user_id, s.s_us, p.p_us,
                coalesce(p.p_us - s.s_us <= 604800000000, false) AS converted
         FROM s LEFT JOIN p ON s.user_id = p.user_id"""
  )
}
