package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Engine.table

/** SURVEY.md §2.4 aggregation operators (A1–A11), exercised against the
  * harness's TPC-H-ish tables.
  *
  * Reference semantics (citations into /root/reference):
  *   - A1 count(*): defs/checks.py:29
  *   - A2 null-count aggregate: defs/checks.py:26-30
  *   - A3 duplicate detection via group-by-all-columns: defs/checks.py:33-41
  *   - A4 distinct count: defs/checks.py:100-103
  *   - A5 conditional-sum completeness ratio: defs/checks.py:68-86
  *   - A6 ordered list aggregation: defs/assets/ingest_graph_db.py:103-107
  *   - A7 grouped top-N frequency: defs/assets/detect_communities.py:100-135
  *   - A8 grouped member stats: defs/assets/detect_communities.py:307-328
  *   - A9 group-size stats: utils/neo4j_helpers.py:271-290
  *   - A10 distinct subset: defs/assets/extract_countries.py:47
  *   - A11 dedup-by-priority: utils/data_transformation_helpers.py:89-120
  *
  * Scale notes: every aggregation here is a single hash-aggregate with
  * map-side partial aggregation; the window-based ones (A7, A11) shuffle once
  * on their partition keys. Nothing collects to the driver.
  */
object Aggregations extends QueryModule {

  private def a1_count(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem").agg(count(lit(1)).as("cnt"))

  private def a2_null_counts(s: SparkSession, d: String): DataFrame = {
    val o = table(s, d, "orders")
    o.agg(
      sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("long").as("null_custkey"),
      sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).cast("long").as("null_status"),
      sum(when(col("o_totalprice").isNull, 1).otherwise(0)).cast("long").as("null_price")
    )
  }

  /** A3 — duplicate-row detection via hash prepass: aggregate on two
    * independent 64/32-bit row hashes (12-byte shuffle key) instead of the
    * full 11-column row — at 100 TB the group-by-all form ships every byte of
    * the table through the shuffle; this ships ~12 bytes/row. Collision odds
    * across the pair of independent hash families are ~2^-96 per pair —
    * vanishing at any row count; the answer is identical to group-by-all.
    */
  private def a3_dup_rows(s: SparkSession, d: String): DataFrame = {
    val li   = table(s, d, "lineitem")
    val cols = li.columns.map(col).toSeq
    li.groupBy(xxhash64(cols: _*).as("h1"), hash(cols: _*).as("h2"))
      .count()
      .filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L)).cast("long").as("dup_rows"))
  }

  private def a4_distinct_count(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders").agg(countDistinct(col("o_custkey")).as("n_cust"))

  private def a5_conditional_ratio(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem").agg(
      round(
        sum(when(col("l_discount") > 0.0, 1).otherwise(0)).cast("double") /
          count(lit(1)),
        6
      ).as("discounted_ratio")
    )

  private def a6_ordered_list(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(sort_array(collect_list(col("l_linenumber"))), _.cast("string")),
          ","
        ).as("lines")
      )

  def a7_grouped_topk_freq(s: SparkSession, d: String): DataFrame = {
    val counts = table(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_partkey").asc)
    counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  /** A8 — member count + member-id list, bounded to the 50 smallest ids per
    * group (the reference itself truncates member_ids to 50,
    * settings.py:144-145). Uses [[graft.functions.KSmallestLong]] so state is
    * O(k) per group at every aggregation stage — no unbounded collect_list.
    */
  private def a8_member_stats(s: SparkSession, d: String): DataFrame = {
    val kSmallest = udaf(graft.functions.KSmallestLong(50), org.apache.spark.sql.Encoders.scalaLong)
    table(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("member_count"),
        array_join(
          transform(kSmallest(col("o_orderkey")), _.cast("string")),
          ","
        ).as("member_ids")
      )
  }

  private def a9_group_size_stats(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("n_groups"),
        max(col("c")).as("largest"),
        min(col("c")).as("smallest"),
        round(avg(col("c")), 6).as("mean_size")
      )

  private def a10_distinct_subset(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders").select("o_orderstatus", "o_orderpriority").distinct()

  /** A11 — dedup-by-priority: sort by a date, then keep-first sequentially on
    * two different keys (reference dedups by artist_uri then by name). Spark
    * form: two chained row_number windows with a deterministic tiebreak.
    */
  private def a11_dedup_priority(s: SparkSession, d: String): DataFrame = {
    val o = table(s, d, "orders")
    val byDate = Seq(col("o_orderdate").asc, col("o_orderkey").asc)
    val w1 = Window.partitionBy(col("o_custkey")).orderBy(byDate: _*)
    val w2 = Window.partitionBy(col("o_orderpriority")).orderBy(byDate: _*)
    o.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
  }

  /** A12 — grouped exact percentiles by POSITION, not interpolation: the
    * p-th percentile of each group is the value at sorted rank
    * `ceil(p·n)` (the lower / `quantile_disc` convention). Interpolated
    * percentiles mix floats from two rows — engines disagree in the last
    * ulp and a rounded hash flaps; rank selection is pure integer
    * arithmetic, so both engines pick the identical row. One shuffle on
    * the group key; the rank window and the count ride the same
    * partitioning.
    */
  private def a12_percentiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w  = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wg = Window.partitionBy(col("l_returnflag"))
    table(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wg))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("l_quantity")))
          .cast("long").as("p50_qty"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("l_quantity")))
          .cast("long").as("p90_qty")
      )
  }

  /** A15 — NTILE bucketing: customers quartiled by account balance within
    * their nation (the "tier your entities per segment" operator). NTILE's
    * assignment is purely positional, so with the order fully determined
    * (balance desc, key asc tiebreak) both engines bucket identically —
    * no float compare anywhere. One shuffle on the nation key.
    */
  private def a15_ntile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select(col("c_custkey"), col("c_nationkey"), col("quartile"))
  }

  /** A13 — ROLLUP with grouping id: per-(flag, status) stats plus the
    * per-flag and grand-total superaggregates in ONE pass (Spark expands
    * grouping sets inside a single Exchange — three separate groupBys would
    * shuffle three times). `gid` bit i set = column i rolled up; the oracle
    * derives the same id from the output NULLs, valid because neither
    * column is nullable in the data. sum_qty is integral doubles — exact in
    * fp64, cast to long.
    */
  private def a13_rollup(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty")
      )

  /** A17 — correlation COMPONENTS in exact integers: n, Σx, Σy, Σxy, Σx²,
    * Σy² between quantity and price-cents per return flag. Pearson's r is
    * a pure function of these six sums, and over integer inputs the sums
    * are exact int64 — so the statistic is bit-reproducible across
    * engines, partitionings, and retries, where a float `corr()` drifts
    * with aggregation order. Map-side combinable like any sum. The sums
    * accumulate in decimal(38,0) — Spark's 128-bit exact accumulator —
    * because Σy² grows as n·y²: with y ~ 10⁷ cents it passes int64's
    * 9.2·10¹⁸ at only ~10⁵ rows per group (the sf1 scale point aborted on
    * exactly this in round 8), and 38 digits carries the same shape to
    * 10¹² rows and beyond. The sums are EMITTED as decimal-digit strings:
    * Σy² ≈ 7.4·10¹⁷ already exceeds double's 2⁵³ exact-integer range, so
    * any comparison path that canonicalizes numerics through float loses
    * exactness — a string of digits survives any hasher bit-for-bit.
    */
  private def a17_corr_components(s: SparkSession, d: String): DataFrame = {
    val d38 = "decimal(38,0)"
    table(s, d, "lineitem")
      .select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("y")
      )
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).cast("string").as("sum_x"),
        sum(col("y").cast(d38)).cast("string").as("sum_y"),
        sum((col("x") * col("y")).cast(d38)).cast("string").as("sum_xy"),
        sum((col("x") * col("x")).cast(d38)).cast("string").as("sum_x2"),
        // per-row products still fit long comfortably (y² ≤ 10¹⁴); only
        // the ACCUMULATION needs 128 bits, so cast after the multiply.
        sum((col("y") * col("y")).cast(d38)).cast("string").as("sum_y2")
      )
  }

  /** A16 — CUBE over (returnflag, linestatus): all four grouping sets —
    * the cross-dimension superaggregates ROLLUP's hierarchy omits (the
    * per-status-across-flags marginals) — in ONE Exchange, like a13.
    * Same grouping-id convention and the same NULL-derivation oracle
    * trick (valid because neither column is nullable in the data).
    */
  private def a16_cube(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty")
      )

  /** A14 (pivot) — event counts per user cohort pivoted to one column per
    * event type. The value list is EXPLICIT: without it Spark runs an extra
    * distinct-collect job to discover values, and the output schema becomes
    * data-dependent — both wrong at scale. Absent combinations are
    * coalesced to 0 so the frame is dense like the oracle's conditional
    * aggregation.
    */
  private def a14_pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    table(s, d, "events")
      .select((col("user_id") % 10).as("cohort"), col("event_type"))
      .groupBy(col("cohort"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(
        col("cohort") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*
      )
  }

  /** A20 — unpivot (melt): the inverse relational operator of a14's pivot —
    * wide per-status count columns back to long (priority, status, n) rows.
    * Round-trip property: unpivot(pivot(T)) recovers the plain two-key
    * aggregate, which is exactly what the oracle states (the DuckDB side is
    * the long-form GROUP BY — no UNPIVOT needed to describe the semantics).
    * Absent (priority, status) combinations surface as null cells in the
    * wide form and are dropped on the way back, matching the long form's
    * no-row representation.
    */
  private def a20_unpivot(s: SparkSession, d: String): DataFrame = {
    val statuses = Seq("F", "O", "P")
    val wide = table(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
    wide
      .unpivot(
        Array(col("o_orderpriority")),
        statuses.map(col).toArray,
        "o_orderstatus",
        "n"
      )
      .filter(col("n").isNotNull)
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n"))
  }

  /** A18 — histogram-sketch median: per-priority order totals bucketed
    * into fixed $10k-wide cent bins, then the median approximated as the
    * first bucket whose cumulative count reaches half. This is the
    * mergeable-sketch form of a quantile — two key-partitioned shuffles
    * (bucket counts, then a per-priority cumulative window over at most
    * #buckets rows) regardless of row count, where a12's exact rank-based
    * percentile sorts EVERY row inside its partition. The bucket index is
    * integer floor division, so the answer is bit-identical cross-engine —
    * the trade the t-digest/HDR-histogram family makes, with the error
    * bounded by the bucket width.
    */
  /** A21 — quantile-sketch calibration (d10's discipline applied to a18):
    * for each group, the EXACT lower median (rank ⌈n/2⌉ of the sorted cent
    * totals — one window) next to the histogram-sketch median bucket a18
    * reports, plus the bucket the exact median falls in. `bucket_err` is
    * the observable sketch error in bucket units — the QA row a pipeline
    * reads when sizing histogram bins, instead of trusting the bound.
    *
    * Two keyed shuffles (rank window + bucket histogram), both on the
    * group key; the join of the two medians is ≤-groups-sized.
    */
  private def a21_median_calibration(s: SparkSession, d: String): DataFrame = {
    val cents = table(s, d, "orders").select(
      col("o_orderpriority"),
      expr("CAST(round(o_totalprice * 100, 0) AS LONG)").as("c")
    )
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("c"))
    val exact = cents
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("o_orderpriority"), col("c").as("exact_median_cents"))
    val hist = a18_hist_median(s, d)
      .select(col("o_orderpriority"), col("median_bucket"), col("n_orders"))
    exact
      .join(hist, "o_orderpriority")
      .select(
        col("o_orderpriority"),
        col("n_orders"),
        col("exact_median_cents"),
        expr("exact_median_cents DIV 1000000").as("exact_bucket"),
        col("median_bucket"),
        expr("abs(exact_median_cents DIV 1000000 - median_bucket)").as("bucket_err")
      )
  }

  private def a18_hist_median(s: SparkSession, d: String): DataFrame = {
    val bcnt = table(s, d, "orders")
      .select(
        col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100, 0) AS LONG) div 1000000").as("bucket")
      )
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
    val wCum = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("o_orderpriority"))
    bcnt
      .withColumn("cum", sum(col("bn")).over(wCum))
      .withColumn("total", sum(col("bn")).over(wTot))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("o_orderpriority"))
      .agg(min(col("bucket")).as("median_bucket"), min(col("total")).as("n_orders"))
  }

  /** The bucket-histogram median used by a18/a19: for each group, the
    * first bucket whose cumulative count reaches half. One keyed shuffle
    * + a per-group window over at most #buckets rows.
    */
  private def histMedian(buckets: DataFrame): DataFrame = {
    val bcnt = buckets.groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("bn"))
    val wCum = Window
      .partitionBy(col("g"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("g"))
    bcnt
      .withColumn("cum", sum(col("bn")).over(wCum))
      .withColumn("total", sum(col("bn")).over(wTot))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("g"))
      .agg(min(col("bucket")).as("med"), min(col("total")).as("n"))
  }

  /** A19 — MAD (median absolute deviation) in bucket units: the
    * histogram-median machinery applied twice — once for the center, once
    * over each row's absolute bucket distance from it. MAD is the robust
    * dispersion measure outlier policies want where stddev is dragged by
    * the very outliers it should flag; in bucket units it is exact
    * integers cross-engine (the a18 trade: error bounded by bucket
    * width). The center table is #groups rows → broadcast back onto the
    * row stream; two keyed shuffles total, independent of row count.
    */
  private def a19_mad(s: SparkSession, d: String): DataFrame = {
    val b = table(s, d, "orders")
      .select(
        col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100, 0) AS LONG) div 1000000").as("bucket")
      )
    val med = histMedian(b)
    val dev = b
      .join(broadcast(med.select(col("g"), col("med"))), "g")
      .select(col("g"), abs(col("bucket") - col("med")).as("bucket"))
    val mad = histMedian(dev).select(col("g"), col("med").as("mad_bucket"))
    med
      .select(col("g"), col("med").as("median_bucket"), col("n").as("n_orders"))
      .join(mad, "g")
      .select(
        col("g").as("o_orderpriority"),
        col("median_bucket"),
        col("mad_bucket"),
        col("n_orders")
      )
  }

  /** A22 — incremental partial-aggregate MERGE (materialized-view
    * maintenance): the documents table is split into a simulated existing
    * partition (doc_id % 10 != 0) and a delta batch (doc_id % 10 == 0),
    * each reduced to per-source PARTIAL states — count/sum/min/max plus
    * x10's 64 HLL registers — and the partials are then merged with the
    * combine algebra alone (+, +, min, max, elementwise register max),
    * never re-touching rows. The oracle computes the same stats DIRECTLY
    * over the whole table, so the green row proves the merge path is
    * byte-equal to recompute — the property that lets a 100 TB nightly
    * stats job fold a day's delta into yesterday's aggregates in
    * O(|delta| + |states|) instead of O(|corpus|).
    *
    * The HLL sum skips the bucket spine entirely: absent buckets
    * contribute exactly (64 − present) · 2^19 to the harmonic sum, so the
    * estimate needs no 64-row scaffold join (tighter than x10/x13's
    * broadcast-spine form).
    */
  private def a22_incremental_merge(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents").select(
      col("source"),
      col("doc_id"),
      col("n_chars"),
      expr("conv(substr(md5(text), 1, 6), 16, 10)").cast("long").as("h24")
    )
    def partials(pred: Column): (DataFrame, DataFrame) = {
      val part = docs.filter(pred)
      val scalar = part
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars")
        )
      val regs = part
        .select(
          col("source"),
          expr("h24 div 262144").as("bucket"),
          when(expr("h24 % 262144") === 0, 19L)
            .otherwise(lit(19L) - length(expr("bin(h24 % 262144)")))
            .as("rho")
        )
        .groupBy("source", "bucket")
        .agg(max("rho").as("register"))
      (scalar, regs)
    }
    val (baseS, baseR)   = partials(expr("doc_id % 10 != 0"))
    val (deltaS, deltaR) = partials(expr("doc_id % 10 = 0"))
    val scalars = baseS
      .unionByName(deltaS)
      .groupBy("source")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("sum_chars").as("sum_chars"),
        min("min_chars").as("min_chars"),
        max("max_chars").as("max_chars")
      )
    val est = baseR
      .unionByName(deltaR)
      .groupBy("source", "bucket")
      .agg(max("register").as("register"))
      .groupBy("source")
      .agg(
        sum(expr("cast(shiftleft(1, cast(19 - register as int)) as long)")).as("sp"),
        count(lit(1)).as("np")
      )
      .select(
        col("source"),
        (col("sp") + (lit(64L) - col("np")) * lit(524288L)).as("sreg")
      )
      .select(
        col("source"),
        expr(s"${709L * 4096L * 524288L} div (sreg * 1000)").as("distinct_est_q")
      )
    scalars.join(est, "source")
  }

  /** A23 — weighted median: per return flag, the extended-price point
    * (cents) below which HALF THE SHIPPED QUANTITY sits — the
    * quantity-weighted analog of a18's count median, and the robust
    * "typical price of a shipped unit" statistic (an unweighted median
    * over line items would let many tiny lines outvote a few bulk ones).
    * Exact, not histogram: collapse to (group, value) with summed weight
    * first — the value domain is what bounds the window, and it grows far
    * slower than rows — then one per-group cumulative-weight window picks
    * the first value reaching half the total. One keyed shuffle + one
    * window over the collapsed frame.
    */
  private def a23_weighted_median(s: SparkSession, d: String): DataFrame = {
    val vw = table(s, d, "lineitem")
      .select(
        col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS LONG)").as("cents"),
        expr("CAST(l_quantity AS LONG)").as("w")
      )
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(sum(col("w")).as("wv"))
    val wCum = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("l_returnflag"))
    vw
      .withColumn("cum", sum(col("wv")).over(wCum))
      .withColumn("total", sum(col("wv")).over(wTot))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("cents")).as("wmedian_cents"),
        min(col("total")).as("total_qty")
      )
  }

  /** A24 — annotator LABEL AGGREGATION: the majority-vote + agreement
    * consolidation every human-labeled training set runs before labels
    * enter a corpus (the Dawid–Skene family's zeroth rung, kept
    * deterministic). Five synthetic annotators vote per document — vote k
    * = md5(doc_id | k) mod 4, biased toward a per-document true label so
    * agreement varies (the harness stand-in for real annotation tables,
    * x5's hash-split discipline). Per item: the majority label (ties →
    * smallest label — deterministic), its vote count, agreement in basis
    * points, and the low-agreement review flag (< 60%).
    *
    * Scale shape: explode 5 votes (narrow, no shuffle) → ONE (item,
    * label) count aggregate → ONE item-keyed max_by — two keyed
    * shuffles, both on the item id; no window, no self-join. At 100 TB
    * with real annotator tables the explode disappears and the same two
    * aggregates run straight off the votes table.
    */
  private def a24_label_aggregation(s: SparkSession, d: String): DataFrame = {
    val votes = table(s, d, "documents")
      .select(col("doc_id"), explode(expr("sequence(0, 4)")).as("k"))
      .select(
        col("doc_id"),
        // annotators 0-2 vote the "true" label (doc_id mod 4); 3-4 vote
        // hash noise — so agreement spans 60%-100% deterministically
        when(
          col("k") <= 2,
          col("doc_id") % 4
        ).otherwise(
          expr(
            "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 6), 16, 10) as bigint) % 4"
          )
        ).as("label")
      )
    votes
      .groupBy(col("doc_id"), col("label"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        expr("max_by(struct(label, n), struct(n, -label))").as("mj"),
        sum(col("n")).as("n_votes")
      )
      .select(
        col("doc_id"),
        col("mj.label").as("majority_label"),
        col("mj.n").as("majority_votes"),
        col("n_votes"),
        expr("10000 * mj.n div n_votes").as("agreement_bp"),
        (expr("10000 * mj.n div n_votes") < 6000).as("needs_review")
      )
  }

  /** A25 — reliability-WEIGHTED label aggregation: one Dawid–Skene
    * iteration on top of a24's majority vote (Dawid & Skene 1979 — the
    * EM estimator's first half-step, kept integer and deterministic; the
    * r11 verdict's #6). Round 1: plain majority per item (a24's
    * max_by with the smallest-label tiebreak). Round 2: each annotator's
    * reliability = basis-point agreement of their votes with the round-1
    * majorities (ONE keyed aggregate over the voter id — 5 rows); votes
    * re-weighted by their annotator's reliability and re-aggregated, the
    * weighted argmax with the same tiebreak. Two extra keyed shuffles
    * (weights, weighted scores), NO EM loop.
    *
    * Planted truth: annotator 4 is a SPAMMER who always votes label 0 —
    * when one noise annotator happens to agree, label 0 ties the two
    * reliable annotators' true label and the smallest-label tiebreak
    * steals the majority. Round 2 prices the spammer down (their round-1
    * agreement is only the fraction of items whose majority IS 0), so
    * the reliable pair outweighs spammer+noise and those stolen labels
    * FLIP back — the `flipped` column marks them (measured: 130 of 500
    * items at sf0.01).
    *
    * Scale shape: the votes frame is materialized once and re-read by
    * both rounds; the 5-row weight table broadcasts into the re-score;
    * everything else is item-keyed aggregation. With real annotator
    * tables (thousands of annotators, billions of votes) the same plan
    * holds: the weight aggregate is |annotators|-sized and the two
    * argmax aggregates stay keyed on the item id.
    */
  private def a25_weighted_labels(s: SparkSession, d: String): DataFrame = {
    val votes = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(col("doc_id"), explode(expr("sequence(0, 4)")).as("k"))
        .select(
          col("doc_id"),
          col("k"),
          // annotators 0-1 vote the true label (doc_id mod 4), 2-3 vote
          // hash noise, 4 is the planted spammer (constant label 0)
          when(col("k") <= 1, col("doc_id") % 4)
            .when(col("k") === 4, lit(0L))
            .otherwise(
              expr(
                "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 6), 16, 10) as bigint) % 4"
              )
            )
            .as("label")
        )
    )
    val mj = votes
      .groupBy(col("doc_id"), col("label"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(expr("max_by(label, struct(n, -label))").as("majority_label"))
    val mjT = graft.Lineage.truncate(mj)
    val weights = votes
      .join(mjT, "doc_id")
      .groupBy(col("k"))
      .agg(
        expr("10000 * sum(CASE WHEN label = majority_label THEN 1 ELSE 0 END) div count(1)")
          .as("w_bp")
      )
    val weighted = votes
      .join(broadcast(weights), "k")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("w_bp")).as("score"))
      .groupBy(col("doc_id"))
      .agg(
        expr("max_by(struct(label, score), struct(score, -label))").as("wj")
      )
    mjT
      .join(weighted, "doc_id")
      .select(
        col("doc_id"),
        col("majority_label").cast("long").as("majority_label"),
        col("wj.label").cast("long").as("weighted_label"),
        col("wj.score").cast("long").as("weighted_score_bp"),
        (col("majority_label") =!= col("wj.label")).as("flipped")
      )
  }

  /** A26 — FLEISS' KAPPA: the corpus-level chance-corrected
    * inter-annotator agreement statistic (Fleiss 1971) over a24's vote
    * table — the one number a labeling campaign reports before anyone
    * trusts the labels a24/a25 consolidate. κ = (P̄o − P̄e)/(1 − P̄e) with
    *   P̄o = Σ_i Σ_c n_ic(n_ic−1) / (N·n·(n−1))   (observed agreement)
    *   P̄e = Σ_c T_c² / (N·n)²                    (chance agreement),
    * kept EXACT: with n = 5 annotators the whole expression reduces to
    * κ·bp = 10000·(5N·PoNum − 4·PeNum) div (4·(25N² − PeNum)) — one
    * integral divide over DECIMAL(38,0) sufficient statistics (x23's
    * overflow discipline: T_c² sums would overflow a long once N·n
    * passes ~3×10⁹; products here stay ≤ ~100N², inside 38 digits to
    * N ≈ 10¹⁸).
    *
    * Scale shape: one (item, label) count aggregate (shared shape with
    * a24), then two branches — a single-row item aggregate for PoNum/N
    * and a |labels|-row aggregate for the label masses — joined by one
    * broadcast. Never a pairwise annotator join (the naive κ computes
    * C(n,2) agreements per item; the n_ic(n_ic−1) identity removes it).
    * Measured (sf0.01, the a24 vote table: 3 aligned annotators + 2
    * noise): P̄o 4798 bp, P̄e 2500 bp, κ 3063 bp — "fair agreement", the
    * honest verdict on a 60%-reliable panel.
    */
  private def a26_fleiss_kappa(s: SparkSession, d: String): DataFrame = {
    val votes = table(s, d, "documents")
      .select(col("doc_id"), explode(expr("sequence(0, 4)")).as("k"))
      .select(
        col("doc_id"),
        when(
          col("k") <= 2,
          col("doc_id") % 4
        ).otherwise(
          expr(
            "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 6), 16, 10) as bigint) % 4"
          )
        ).as("label")
      )
    val cnt = graft.Lineage.truncate(
      votes.groupBy(col("doc_id"), col("label")).agg(count(lit(1)).as("n"))
    )
    val po = cnt.agg(
      countDistinct(col("doc_id")).as("n_items"),
      sum(col("n") * (col("n") - 1)).as("po_num")
    )
    val pe = cnt
      .groupBy(col("label"))
      .agg(sum(col("n")).as("t"))
      .agg(
        sum(expr("cast(t as decimal(38,0)) * cast(t as decimal(38,0))")).as("pe_num")
      )
    po
      .crossJoin(broadcast(pe))
      .select(
        col("n_items").cast("long").as("n_items"),
        lit(5L).as("n_annotators"),
        expr("cast(10000 as decimal(38,0)) * po_num div (cast(20 as decimal(38,0)) * n_items)")
          .cast("long")
          .as("po_bp"),
        expr(
          """cast(10000 as decimal(38,0)) * pe_num div
             (cast(25 as decimal(38,0)) * n_items * n_items)"""
        ).cast("long").as("pe_bp"),
        expr(
          """(cast(10000 as decimal(38,0)) *
              (cast(5 as decimal(38,0)) * n_items * po_num - cast(4 as decimal(38,0)) * pe_num))
             div
             (cast(4 as decimal(38,0)) *
              (cast(25 as decimal(38,0)) * n_items * n_items - pe_num))"""
        ).cast("long").as("kappa_bp")
      )
  }

  /** A27 — KRIPPENDORFF'S ALPHA (nominal): the chance-corrected agreement
    * statistic that, unlike a26's Fleiss κ, tolerates MISSING RATINGS —
    * the real labeling-campaign regime, where annotators skip items
    * (Krippendorff 2004). α = 1 − Do/De over the coincidence matrix;
    * items with fewer than two ratings drop out (the standard rule).
    *
    * Kept EXACT via two identities: within an item,
    * Σ_{c≠k} n_ic·n_ik = m_i² − Σ_c n_ic², so the observed disagreement
    * needs only per-item (m, Σn²) — never a label-pair join; and the
    * coincidence row marginal collapses to n_c = Σ_i n_ic (the 1/(m_i−1)
    * weights cancel), so De needs only per-label totals. The per-item
    * 1/(m_i−1) weights are cleared by the lcm: with ≤5 annotators,
    * (m_i−1) ∈ {1,2,3,4} all divide 12, so do12 = Σ_i 12(m_i²−Σn²)/(m_i−1)
    * is integral and α·bp = 10000·(12·(n²−Σn_c²) − (n−1)·do12) div
    * (12·(n²−Σn_c²)) — DECIMAL(38,0) for the n² products (x23's overflow
    * discipline).
    *
    * Scale shape: one (item, label) count aggregate, one item aggregate
    * (+ m≥2 filter), one label aggregate over the kept items (semi join),
    * two single-row frames joined by one broadcast. Missingness is
    * planted deterministically (each annotator skips ~25% of items by an
    * md5 rule), so m_i varies across 2..5 and the lcm path is exercised.
    */
  private def a27_krippendorff_alpha(s: SparkSession, d: String): DataFrame = {
    val votes = table(s, d, "documents")
      .select(col("doc_id"), explode(expr("sequence(0, 4)")).as("k"))
      .filter(
        expr(
          "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string), '|p')), 1, 6), 16, 10) as bigint) % 4 != 0"
        )
      )
      .select(
        col("doc_id"),
        when(
          col("k") <= 2,
          col("doc_id") % 4
        ).otherwise(
          expr(
            "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 6), 16, 10) as bigint) % 4"
          )
        ).as("label")
      )
    val cnt = graft.Lineage.truncate(
      votes.groupBy(col("doc_id"), col("label")).agg(count(lit(1)).as("n"))
    )
    val item = cnt
      .groupBy("doc_id")
      .agg(sum(col("n")).as("m"), sum(col("n") * col("n")).as("ss"))
      .filter(col("m") >= 2)
    val obs = item.agg(
      count(lit(1)).as("n_items"),
      sum(col("m")).as("nr"),
      sum(expr("(12 * (m * m - ss)) div (m - 1)")).as("do12")
    )
    val marg = cnt
      .join(item.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("label")
      .agg(sum(col("n")).as("t"))
      .agg(sum(expr("cast(t as decimal(38,0)) * cast(t as decimal(38,0))")).as("mg"))
    obs
      .crossJoin(broadcast(marg))
      .select(
        col("n_items").cast("long").as("n_items"),
        col("nr").cast("long").as("n_ratings"),
        expr("(cast(10000 as decimal(38,0)) * do12) div (cast(12 as decimal(38,0)) * nr)")
          .cast("long")
          .as("do_bp"),
        expr(
          """(cast(10000 as decimal(38,0)) * (cast(nr as decimal(38,0)) * nr - mg))
             div (cast(nr as decimal(38,0)) * (nr - 1))"""
        ).cast("long").as("de_bp"),
        expr(
          """(cast(10000 as decimal(38,0)) *
              (cast(12 as decimal(38,0)) * (cast(nr as decimal(38,0)) * nr - mg)
               - (cast(nr as decimal(38,0)) - 1) * do12))
             div
             (cast(12 as decimal(38,0)) * (cast(nr as decimal(38,0)) * nr - mg))"""
        ).cast("long").as("alpha_bp")
      )
  }

  /** A28 — the SECOND Dawid–Skene half-step (Dawid & Skene 1979; r12
    * verdict #7): a25 stops after one reliability re-weighting; this runs
    * one more iteration — annotator reliabilities are RE-estimated against
    * the round-2 WEIGHTED labels (not the round-1 majorities), and the
    * votes re-aggregated under the new weights into round-3 labels — plus
    * a convergence census (label flips round 1→2 and round 2→3) showing
    * the EM fixed point approaching WITHOUT an open-ended EM loop (two
    * deterministic half-steps, each one keyed aggregate + one broadcast).
    *
    * Planted truth (a25's vote table): annotators 0–1 vote the true label,
    * 2–3 vote hash noise, 4 is a constant-label-0 SPAMMER. Round 2 prices
    * the spammer by their agreement with round-1 majorities — but those
    * majorities still contain the ~26% of items the spammer+noise tie
    * STOLE, so the spammer's round-1 weight is inflated by their own
    * corruption. Once round 2 flips the stolen labels back, the round-3
    * re-estimate scores the spammer against CLEANER labels: w2 < w1
    * strictly for the spammer (measured sf0.01: 4911 → 2980 bp, while the
    * reliable pair rises 8482 → 9820), and the flip count shrinks
    * monotonically (130 → 19) — the fixed point approaching, which is the
    * convergence argument for stopping after two steps. AggregationSpec
    * pins both inequalities.
    *
    * Scale shape: identical to a25 with one more (|annotators|-row
    * aggregate → broadcast → item-keyed argmax) round — at billions of
    * votes every frame is either item-keyed or |annotators|-sized; the two
    * census scalars are single-row broadcasts.
    */
  private def a28_ds_second_step(s: SparkSession, d: String): DataFrame = {
    val votes = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(col("doc_id"), explode(expr("sequence(0, 4)")).as("k"))
        .select(
          col("doc_id"),
          col("k"),
          when(col("k") <= 1, col("doc_id") % 4)
            .when(col("k") === 4, lit(0L))
            .otherwise(
              expr(
                "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(k as string))), 1, 6), 16, 10) as bigint) % 4"
              )
            )
            .as("label")
        )
    )
    val mj1 = graft.Lineage.truncate(
      votes
        .groupBy(col("doc_id"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(expr("max_by(label, struct(n, -label))").as("l1"))
    )
    val w1 = graft.Lineage.truncate(
      votes
        .join(mj1, "doc_id")
        .groupBy(col("k"))
        .agg(
          expr("10000 * sum(CASE WHEN label = l1 THEN 1 ELSE 0 END) div count(1)").as("w1_bp")
        )
    )
    val wj2 = graft.Lineage.truncate(
      votes
        .join(broadcast(w1), "k")
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("w1_bp")).as("score"))
        .groupBy(col("doc_id"))
        .agg(expr("max_by(label, struct(score, -label))").as("l2"))
    )
    val w2 = graft.Lineage.truncate(
      votes
        .join(wj2, "doc_id")
        .groupBy(col("k"))
        .agg(
          expr("10000 * sum(CASE WHEN label = l2 THEN 1 ELSE 0 END) div count(1)").as("w2_bp")
        )
    )
    val wj3 = votes
      .join(broadcast(w2), "k")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("w2_bp")).as("score"))
      .groupBy(col("doc_id"))
      .agg(expr("max_by(label, struct(score, -label))").as("l3"))
    val f12 = mj1
      .join(wj2, "doc_id")
      .agg(sum(when(col("l1") =!= col("l2"), 1L).otherwise(0L)).as("flips_12"))
    val f23 = wj2
      .join(wj3, "doc_id")
      .agg(sum(when(col("l2") =!= col("l3"), 1L).otherwise(0L)).as("flips_23"))
    w1
      .join(w2, "k")
      .crossJoin(broadcast(f12))
      .crossJoin(broadcast(f23))
      .select(
        col("k").cast("long").as("k"),
        col("w1_bp").cast("long").as("w1_bp"),
        col("w2_bp").cast("long").as("w2_bp"),
        col("flips_12").cast("long").as("flips_12"),
        col("flips_23").cast("long").as("flips_23")
      )
  }

  /** A29 — Poisson-bootstrap confidence replicates for a corpus statistic
    * (Chamandy–Muralidharan–Najmi–Naidu, "Estimating Uncertainty for
    * Massive Data Streams", 2012 — THE web-scale bootstrap: resampling
    * n rows with replacement is impossible in one pass, but each row's
    * appearance count in a resample is asymptotically Poisson(1), so B
    * replicate estimates come from ONE scan by giving every (row, b) a
    * deterministic Poisson weight). Here B = 32 replicates of the mean
    * document length: u = 24-bit md5(doc_id|b) uniform, weight = the
    * Poisson(1) inverse-CDF step function on the integer lattice
    * (floor(2^24·P(X≤k)) thresholds precomputed as shared constants, cap
    * 7), replicate mean = 10^6·Σw·n_chars div Σw in decimal(38,0) so the
    * products can't overflow (the a26/a27 discipline). Row b = −1 is the
    * unresampled point estimate; the spread of the 32 replicate means IS
    * the standard error a 100 TB census report puts next to every number —
    * with zero extra passes over the data.
    *
    * Scale shape: one 32-way explode of the scanned rows into ONE
    * map-side-combinable 32-group hash aggregate (the expansion happens
    * inside the combiner's input, never shuffled raw), unioned with the
    * plain point-estimate aggregate. No joins, no windows, no broadcast.
    */
  private def a29_poisson_bootstrap(s: SparkSession, d: String): DataFrame = {
    // floor(2^24 * P(Poisson(1) <= k)), k = 0..6; P(>=7) lands on weight 7
    val th = Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L, 16767247L, 16775819L)
    val wExpr = th.map(t => s"(CASE WHEN u >= ${t}L THEN 1L ELSE 0L END)").mkString(" + ")
    val docs  = table(s, d, "documents").select(col("doc_id"), col("n_chars"))
    val rep = docs
      .select(col("doc_id"), col("n_chars"), explode(expr("sequence(0, 31)")).as("b"))
      .withColumn(
        "u",
        expr(
          "cast(conv(substr(md5(concat(cast(doc_id as string), '|', cast(b as string))), 1, 6), 16, 10) as bigint)"
        )
      )
      .withColumn("w", expr(wExpr))
      .groupBy(col("b").cast("long").as("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("n_chars")).as("wsum"))
    val point = docs.agg(count(lit(1)).as("n_eff"), sum(col("n_chars")).as("wsum"))
      .select(lit(-1L).as("b"), col("n_eff"), col("wsum"))
    rep
      .unionByName(point)
      .select(
        col("b"),
        col("n_eff").cast("long").as("n_eff"),
        col("wsum").cast("long").as("wsum"),
        expr("cast((cast(1000000 as decimal(38,0)) * wsum) div n_eff as bigint)").as("mean_q")
      )
  }

  /** A30 — Neyman-OPTIMAL stratified sampling allocation (Neyman 1934,
    * the survey-sampling standard a corpus eval/labeling budget should
    * follow instead of proportional draws: allocate n_h ∝ N_h·S_h, so
    * high-variance strata get more of the budget and the estimator
    * variance is minimized at fixed cost): per language, the stratum
    * size, mean document length, the integer standard deviation
    * S_q = floor(sqrt((N·Σx² − (Σx)²) div (N·(N−1)))) (c27's exact
    * isqrt lane — IEEE-754 sqrt is correctly rounded in both engines, so
    * the floor agrees bit-for-bit; the sufficient statistics and every
    * product ride decimal(38,0) / HUGEINT (the a26/a27 discipline, r15),
    * so the variance numerator is exact to 10³⁸ instead of silently
    * wrapping at 2⁶³ in Spark while DuckDB errors — the VARIANCE itself is
    * ≤ max-doc-length² < 2⁵², inside the correctly-rounded sqrt window at
    * any corpus size), and the three allocation
    * columns a sampling design compares: neyman_pm = 10⁶·N_h·S_h div
    * Σ(N_h·S_h), prop_pm = 10⁶·N_h div N, and the per-stratum draw count
    * n_alloc for a fixed 1000-sample budget.
    *
    * Scale shape: ONE language-keyed aggregate (count + two sums,
    * map-side combinable) and a single-row totals broadcast — the c27
    * shape with a variance numerator. Strata of one document pin S_q = 0
    * rather than divide by zero; a degenerate corpus where EVERY stratum
    * has zero variance (wsum = 0) yields NULL allocation columns in both
    * engines via nullif, not a Spark-null/DuckDB-error divergence.
    */
  private def a30_neyman_allocation(s: SparkSession, d: String): DataFrame = {
    val st = table(s, d, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_h"),
        sum(col("n_chars")).as("sx"),
        sum(expr("cast(n_chars as decimal(38,0)) * n_chars")).as("sxx")
      )
      .select(
        col("lang"),
        col("n_h"),
        col("sx"),
        floor(
          sqrt(
            when(
              col("n_h") > 1,
              expr(
                "(cast(n_h as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)" +
                  " div (cast(n_h as decimal(38,0)) * (n_h - 1))"
              )
            ).otherwise(lit(0L))
          )
        ).cast("long").as("sd_q")
      )
    val tot = st.agg(
      sum(expr("cast(n_h as decimal(38,0)) * sd_q")).as("wsum"),
      sum(col("n_h")).as("n_total")
    )
    st.crossJoin(broadcast(tot))
      .select(
        col("lang"),
        col("n_h").cast("long").as("n_h"),
        expr("sx div n_h").cast("long").as("mean_chars"),
        col("sd_q"),
        expr("1000000 * (cast(n_h as decimal(38,0)) * sd_q) div nullif(wsum, 0)").as("neyman_pm"),
        expr("1000000 * cast(n_h as decimal(38,0)) div n_total").as("prop_pm"),
        expr("1000 * (cast(n_h as decimal(38,0)) * sd_q) div nullif(wsum, 0)").as("n_alloc")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a30_neyman_allocation" -> (a30_neyman_allocation _),
    "a29_poisson_bootstrap" -> (a29_poisson_bootstrap _),
    "a28_ds_second_step" -> (a28_ds_second_step _),
    "a27_krippendorff_alpha" -> (a27_krippendorff_alpha _),
    "a26_fleiss_kappa" -> (a26_fleiss_kappa _),
    "a25_weighted_labels" -> (a25_weighted_labels _),
    "a24_label_aggregation" -> (a24_label_aggregation _),
    "a23_weighted_median" -> (a23_weighted_median _),
    "a22_incremental_merge" -> (a22_incremental_merge _),
    "a20_unpivot" -> (a20_unpivot _),
    "a19_mad" -> (a19_mad _),
    "a18_hist_median" -> (a18_hist_median _),
    "a21_median_calibration" -> (a21_median_calibration _),
    "a12_percentiles" -> (a12_percentiles _),
    "a15_ntile" -> (a15_ntile _),
    "a13_rollup" -> (a13_rollup _),
    "a14_pivot" -> (a14_pivot _),
    "a16_cube" -> (a16_cube _),
    "a17_corr_components" -> (a17_corr_components _),
    "a1_count" -> (a1_count _),
    "a2_null_counts" -> (a2_null_counts _),
    "a3_dup_rows" -> (a3_dup_rows _),
    "a4_distinct_count" -> (a4_distinct_count _),
    "a5_conditional_ratio" -> (a5_conditional_ratio _),
    "a6_ordered_list" -> (a6_ordered_list _),
    "a7_grouped_topk_freq" -> (a7_grouped_topk_freq _),
    "a8_member_stats" -> (a8_member_stats _),
    "a9_group_size_stats" -> (a9_group_size_stats _),
    "a10_distinct_subset" -> (a10_distinct_subset _),
    "a11_dedup_priority" -> (a11_dedup_priority _)
  )

  val oracles: Map[String, String] = Map(
    "a30_neyman_allocation" ->
      """WITH st AS (SELECT lang, count(*) AS n_h, sum(n_chars) AS sx,
                            sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
                     FROM documents GROUP BY 1),
         sd AS (SELECT lang, n_h, sx,
                       CAST(floor(sqrt(CASE WHEN n_h > 1
                            THEN (CAST(n_h AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                                 // (CAST(n_h AS HUGEINT) * (n_h - 1))
                            ELSE 0 END)) AS BIGINT) AS sd_q
                FROM st),
         tot AS (SELECT sum(CAST(n_h AS HUGEINT) * sd_q) AS wsum, sum(n_h) AS n_total FROM sd)
         SELECT lang, CAST(n_h AS BIGINT) AS n_h,
                CAST(sx // n_h AS BIGINT) AS mean_chars, sd_q,
                CAST(1000000 * (CAST(n_h AS HUGEINT) * sd_q) // nullif(wsum, 0) AS BIGINT) AS neyman_pm,
                CAST(1000000 * CAST(n_h AS HUGEINT) // n_total AS BIGINT) AS prop_pm,
                CAST(1000 * (CAST(n_h AS HUGEINT) * sd_q) // nullif(wsum, 0) AS BIGINT) AS n_alloc
         FROM sd CROSS JOIN tot""",
    "a29_poisson_bootstrap" ->
      """WITH r AS (SELECT doc_id, n_chars, unnest(range(0, 32)) AS b
                    FROM documents),
         u AS (SELECT b, n_chars,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
                                          CAST(b AS VARCHAR)), 1, 6))::BIGINT AS u
               FROM r),
         w AS (SELECT b, n_chars,
                      (CASE WHEN u >= 6171992 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 12343985 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 15429982 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 16458647 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 16715813 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 16767247 THEN 1 ELSE 0 END) +
                      (CASE WHEN u >= 16775819 THEN 1 ELSE 0 END) AS w
               FROM u),
         rep AS (SELECT CAST(b AS BIGINT) AS b, sum(w) AS n_eff,
                        sum(w * n_chars) AS wsum
                 FROM w GROUP BY 1),
         pt AS (SELECT CAST(-1 AS BIGINT) AS b, count(*) AS n_eff,
                       sum(n_chars) AS wsum
                FROM documents),
         a AS (SELECT * FROM rep UNION ALL SELECT * FROM pt)
         SELECT b, CAST(n_eff AS BIGINT) AS n_eff, CAST(wsum AS BIGINT) AS wsum,
                CAST((1000000 * wsum) // n_eff AS BIGINT) AS mean_q
         FROM a""",
    "a28_ds_second_step" ->
      """WITH v AS (
           SELECT doc_id, k,
                  CASE WHEN k <= 1 THEN doc_id % 4
                       WHEN k = 4 THEN CAST(0 AS BIGINT)
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % 4
                  END AS label
           FROM documents, unnest(generate_series(0, 4)) AS t(k)),
         cnt AS (SELECT doc_id, label, count(*) AS n FROM v GROUP BY 1, 2),
         mj AS (SELECT doc_id, label AS l1 FROM (
                  SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY n DESC, label ASC) AS rn FROM cnt)
                WHERE rn = 1),
         w1 AS (SELECT k,
                       10000 * sum(CASE WHEN v.label = mj.l1 THEN 1 ELSE 0 END)
                         // count(*) AS w1_bp
                FROM v JOIN mj USING (doc_id) GROUP BY k),
         sc2 AS (SELECT doc_id, label, sum(w1_bp) AS score
                 FROM v JOIN w1 USING (k) GROUP BY 1, 2),
         wj2 AS (SELECT doc_id, label AS l2 FROM (
                   SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, label ASC) AS rn FROM sc2)
                 WHERE rn = 1),
         w2 AS (SELECT k,
                       10000 * sum(CASE WHEN v.label = wj2.l2 THEN 1 ELSE 0 END)
                         // count(*) AS w2_bp
                FROM v JOIN wj2 USING (doc_id) GROUP BY k),
         sc3 AS (SELECT doc_id, label, sum(w2_bp) AS score
                 FROM v JOIN w2 USING (k) GROUP BY 1, 2),
         wj3 AS (SELECT doc_id, label AS l3 FROM (
                   SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, label ASC) AS rn FROM sc3)
                 WHERE rn = 1),
         f12 AS (SELECT sum(CASE WHEN mj.l1 <> wj2.l2 THEN 1 ELSE 0 END) AS flips_12
                 FROM mj JOIN wj2 USING (doc_id)),
         f23 AS (SELECT sum(CASE WHEN wj2.l2 <> wj3.l3 THEN 1 ELSE 0 END) AS flips_23
                 FROM wj2 JOIN wj3 USING (doc_id))
         SELECT CAST(w1.k AS BIGINT) AS k,
                CAST(w1_bp AS BIGINT) AS w1_bp,
                CAST(w2_bp AS BIGINT) AS w2_bp,
                CAST(flips_12 AS BIGINT) AS flips_12,
                CAST(flips_23 AS BIGINT) AS flips_23
         FROM w1 JOIN w2 USING (k), f12, f23""",
    "a27_krippendorff_alpha" ->
      """WITH v AS (
           SELECT doc_id, k,
                  CASE WHEN k <= 2 THEN doc_id % 4
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % 4
                  END AS label
           FROM documents, unnest(generate_series(0, 4)) AS t(k)
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR) || '|p'), 1, 6))::BIGINT % 4 != 0),
         cnt AS (SELECT doc_id, label, count(*) AS n FROM v GROUP BY 1, 2),
         itm AS (SELECT doc_id, sum(n) AS m, sum(n * n) AS ss
                 FROM cnt GROUP BY 1 HAVING sum(n) >= 2),
         obs AS (SELECT count(*) AS n_items, sum(m) AS nr,
                        sum((12 * (m * m - ss)) // (m - 1)) AS do12
                 FROM itm),
         mg AS (SELECT sum(t * t) AS mg FROM (
                  SELECT label, sum(n) AS t
                  FROM cnt JOIN itm USING (doc_id) GROUP BY 1))
         SELECT CAST(n_items AS BIGINT) AS n_items,
                CAST(nr AS BIGINT) AS n_ratings,
                CAST((10000 * do12) // (12 * nr) AS BIGINT) AS do_bp,
                CAST((10000 * (nr * nr - mg)) // (nr * (nr - 1)) AS BIGINT) AS de_bp,
                CAST((10000 * (12 * (nr * nr - mg) - (nr - 1) * do12))
                     // (12 * (nr * nr - mg)) AS BIGINT) AS alpha_bp
         FROM obs, mg""",
    "a26_fleiss_kappa" ->
      """WITH v AS (
           SELECT doc_id, k,
                  CASE WHEN k <= 2 THEN doc_id % 4
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % 4
                  END AS label
           FROM documents, unnest(generate_series(0, 4)) AS t(k)),
         cnt AS (SELECT doc_id, label, count(*) AS n FROM v GROUP BY 1, 2),
         po AS (SELECT count(DISTINCT doc_id) AS n_items,
                       sum(n * (n - 1)) AS po_num
                FROM cnt),
         tc AS (SELECT label, sum(n) AS t FROM cnt GROUP BY 1),
         pe AS (SELECT sum(t * t) AS pe_num FROM tc)
         SELECT CAST(n_items AS BIGINT) AS n_items,
                CAST(5 AS BIGINT) AS n_annotators,
                CAST(10000 * po_num // (20 * n_items) AS BIGINT) AS po_bp,
                CAST(10000 * pe_num // (25 * n_items * n_items) AS BIGINT) AS pe_bp,
                CAST((10000 * (5 * n_items * po_num - 4 * pe_num))
                     // (4 * (25 * n_items * n_items - pe_num)) AS BIGINT) AS kappa_bp
         FROM po, pe""",
    "a25_weighted_labels" ->
      """WITH v AS (
           SELECT doc_id, k,
                  CASE WHEN k <= 1 THEN doc_id % 4
                       WHEN k = 4 THEN CAST(0 AS BIGINT)
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % 4
                  END AS label
           FROM documents, unnest(generate_series(0, 4)) AS t(k)),
         cnt AS (SELECT doc_id, label, count(*) AS n FROM v GROUP BY 1, 2),
         mj AS (SELECT doc_id, label AS majority_label FROM (
                  SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY n DESC, label ASC) AS rn FROM cnt)
                WHERE rn = 1),
         w AS (SELECT k,
                      10000 * sum(CASE WHEN v.label = mj.majority_label THEN 1 ELSE 0 END)
                        // count(*) AS w_bp
               FROM v JOIN mj USING (doc_id) GROUP BY k),
         sc AS (SELECT doc_id, label, sum(w_bp) AS score
                FROM v JOIN w USING (k) GROUP BY 1, 2),
         wj AS (SELECT doc_id, label AS weighted_label, score FROM (
                  SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, label ASC) AS rn FROM sc)
                WHERE rn = 1)
         SELECT m.doc_id,
                CAST(m.majority_label AS BIGINT) AS majority_label,
                CAST(j.weighted_label AS BIGINT) AS weighted_label,
                CAST(j.score AS BIGINT) AS weighted_score_bp,
                m.majority_label <> j.weighted_label AS flipped
         FROM mj m JOIN wj j USING (doc_id)""",
    "a24_label_aggregation" ->
      """WITH v AS (
           SELECT doc_id, k,
                  CASE WHEN k <= 2 THEN doc_id % 4
                       ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 6))::BIGINT % 4
                  END AS label
           FROM documents, unnest(generate_series(0, 4)) AS t(k)),
         cnt AS (SELECT doc_id, label, count(*) AS n FROM v GROUP BY 1, 2),
         mj AS (SELECT doc_id, label AS majority_label, n AS majority_votes FROM (
                  SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY n DESC, label ASC) AS rn FROM cnt)
                WHERE rn = 1),
         tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_votes FROM cnt GROUP BY 1)
         SELECT m.doc_id,
                CAST(m.majority_label AS BIGINT) AS majority_label,
                CAST(m.majority_votes AS BIGINT) AS majority_votes,
                t.n_votes,
                CAST(10000 * m.majority_votes // t.n_votes AS BIGINT) AS agreement_bp,
                10000 * m.majority_votes // t.n_votes < 6000 AS needs_review
         FROM mj m JOIN tot t ON t.doc_id = m.doc_id""",
    "a23_weighted_median" ->
      """WITH vw AS (SELECT l_returnflag,
                            CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
                            sum(CAST(l_quantity AS BIGINT)) AS wv
                     FROM lineitem GROUP BY 1, 2),
         c AS (SELECT l_returnflag, cents,
                      sum(wv) OVER (PARTITION BY l_returnflag ORDER BY cents
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(wv) OVER (PARTITION BY l_returnflag) AS total
               FROM vw)
         SELECT l_returnflag,
                CAST(min(cents) AS BIGINT) AS wmedian_cents,
                CAST(min(total) AS BIGINT) AS total_qty
         FROM c WHERE cum * 2 >= total GROUP BY 1""",
    // direct whole-table recompute: a green row proves the engine's
    // partial-merge path equals recompute (mergeability, not just math)
    "a22_incremental_merge" ->
      s"""WITH h AS (SELECT source, n_chars,
                            ('0x' || substr(md5(text), 1, 6))::BIGINT AS h24
                     FROM documents),
          r AS (SELECT source, h24 // 262144 AS bucket,
                       CASE WHEN h24 % 262144 = 0 THEN 19
                            ELSE 19 - length(bin(h24 % 262144)) END AS rho
                FROM h),
          regs AS (SELECT source, bucket, max(rho) AS register FROM r GROUP BY 1, 2),
          est AS (SELECT source,
                         sum(1 << (19 - register)) + (64 - count(*)) * 524288 AS sreg
                  FROM regs GROUP BY 1),
          sc AS (SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
                        min(n_chars) AS min_chars, max(n_chars) AS max_chars
                 FROM h GROUP BY 1)
          SELECT sc.source,
                 CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(sum_chars AS BIGINT) AS sum_chars,
                 CAST(min_chars AS BIGINT) AS min_chars,
                 CAST(max_chars AS BIGINT) AS max_chars,
                 CAST(${709L * 4096L * 524288L} // (sreg * 1000) AS BIGINT) AS distinct_est_q
          FROM sc JOIN est ON est.source = sc.source""",
    "a20_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1, 2""",
    "a19_mad" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) // 1000000 AS bucket
           FROM orders),
         c1 AS (
           SELECT g, bucket, count(*) AS bn,
                  sum(count(*)) OVER (PARTITION BY g ORDER BY bucket
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(count(*)) OVER (PARTITION BY g) AS total
           FROM b GROUP BY g, bucket),
         med AS (SELECT g, min(bucket) AS med, min(total) AS n
                 FROM c1 WHERE cum * 2 >= total GROUP BY g),
         dev AS (SELECT b.g, abs(b.bucket - med.med) AS bucket
                 FROM b JOIN med ON med.g = b.g),
         c2 AS (
           SELECT g, bucket, count(*) AS bn,
                  sum(count(*)) OVER (PARTITION BY g ORDER BY bucket
                                      ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(count(*)) OVER (PARTITION BY g) AS total
           FROM dev GROUP BY g, bucket),
         mad AS (SELECT g, min(bucket) AS mad FROM c2 WHERE cum * 2 >= total GROUP BY g)
         SELECT med.g AS o_orderpriority,
                CAST(med.med AS BIGINT) AS median_bucket,
                CAST(mad.mad AS BIGINT) AS mad_bucket,
                CAST(med.n AS BIGINT) AS n_orders
         FROM med JOIN mad ON mad.g = med.g""",
    "a21_median_calibration" ->
      """WITH cents AS (SELECT o_orderpriority,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
         FROM orders),
         r AS (SELECT o_orderpriority, c,
                      row_number() OVER (PARTITION BY o_orderpriority ORDER BY c) AS rn,
                      count(*) OVER (PARTITION BY o_orderpriority) AS n
               FROM cents),
         ex AS (SELECT o_orderpriority, c AS exact_median_cents
                FROM r WHERE rn = (n + 1) // 2),
         b AS (SELECT o_orderpriority, c // 1000000 AS bucket, count(*) AS bn
               FROM cents GROUP BY 1, 2),
         cb AS (SELECT o_orderpriority, bucket, bn,
                       sum(bn) OVER (PARTITION BY o_orderpriority ORDER BY bucket
                                     ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(bn) OVER (PARTITION BY o_orderpriority) AS total
                FROM b),
         h AS (SELECT o_orderpriority,
                      CAST(min(bucket) AS BIGINT) AS median_bucket,
                      CAST(min(total) AS BIGINT) AS n_orders
               FROM cb WHERE cum * 2 >= total GROUP BY 1)
         SELECT ex.o_orderpriority, n_orders, exact_median_cents,
                CAST(exact_median_cents // 1000000 AS BIGINT) AS exact_bucket,
                median_bucket,
                CAST(abs(exact_median_cents // 1000000 - median_bucket) AS BIGINT) AS bucket_err
         FROM ex JOIN h ON ex.o_orderpriority = h.o_orderpriority""",
    "a18_hist_median" ->
      """WITH b AS (
           SELECT o_orderpriority,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) // 1000000 AS bucket,
                  count(*) AS bn
           FROM orders GROUP BY 1, 2),
         c AS (
           SELECT o_orderpriority, bucket, bn,
                  sum(bn) OVER (PARTITION BY o_orderpriority ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(bn) OVER (PARTITION BY o_orderpriority) AS total
           FROM b)
         SELECT o_orderpriority,
                CAST(min(bucket) AS BIGINT) AS median_bucket,
                CAST(min(total) AS BIGINT) AS n_orders
         FROM c WHERE cum * 2 >= total GROUP BY 1""",
    "a12_percentiles" ->
      """WITH r AS (
           SELECT l_returnflag, l_quantity,
                  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
                CAST(max(CASE WHEN rn = (n + 1) // 2 THEN l_quantity END) AS BIGINT) AS p50_qty,
                CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN l_quantity END) AS BIGINT) AS p90_qty
         FROM r GROUP BY l_returnflag""",
    "a15_ntile" ->
      """SELECT c_custkey, c_nationkey,
                CAST(ntile(4) OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
         FROM customer""",
    "a13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END
                   + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "a17_corr_components" ->
      """WITH t AS (SELECT l_returnflag,
                          CAST(l_quantity AS BIGINT) AS x,
                          CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
                   FROM lineitem)
         SELECT l_returnflag,
                CAST(count(*) AS BIGINT) AS n,
                CAST(CAST(sum(x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_x,
                CAST(CAST(sum(y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_y,
                CAST(CAST(sum(x * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xy,
                CAST(CAST(sum(x * x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_x2,
                CAST(CAST(sum(y * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_y2
         FROM t GROUP BY l_returnflag""",
    "a16_cube" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END
                   + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "a14_pivot" ->
      """SELECT user_id % 10 AS cohort,
                CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
                CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
                CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
                CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
                CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
         FROM events GROUP BY 1""",
    "a1_count" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem",
    "a2_null_counts" ->
      """SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status,
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price
         FROM orders""",
    "a3_dup_rows" ->
      """SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS dup_rows FROM (
           SELECT count(*) AS c FROM lineitem
           GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                    l_extendedprice, l_discount, l_tax, l_returnflag,
                    l_linestatus, l_shipdate
           HAVING count(*) > 1)""",
    "a4_distinct_count" ->
      "SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust FROM orders",
    "a5_conditional_ratio" ->
      """SELECT round(CAST(sum(CASE WHEN l_discount > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
                / count(*), 6) AS discounted_ratio FROM lineitem""",
    "a6_ordered_list" ->
      """SELECT l_orderkey,
                string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
         FROM lineitem GROUP BY l_orderkey""",
    "a7_grouped_topk_freq" ->
      """SELECT l_returnflag, l_partkey, cnt, rnk FROM (
           SELECT l_returnflag, l_partkey, cnt,
                  CAST(row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY cnt DESC, l_partkey) AS BIGINT) AS rnk
           FROM (SELECT l_returnflag, l_partkey, CAST(count(*) AS BIGINT) AS cnt
                 FROM lineitem GROUP BY 1, 2))
         WHERE rnk <= 3""",
    "a8_member_stats" ->
      """WITH ranked AS (
           SELECT o_orderpriority, o_orderkey,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_orderkey) AS rn
           FROM orders)
         SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS member_count,
                string_agg(CASE WHEN rn <= 50 THEN CAST(o_orderkey AS VARCHAR) END,
                           ',' ORDER BY o_orderkey) AS member_ids
         FROM ranked GROUP BY o_orderpriority""",
    "a9_group_size_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(max(c) AS BIGINT) AS largest,
                CAST(min(c) AS BIGINT) AS smallest, round(avg(c), 6) AS mean_size
         FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)""",
    "a10_distinct_subset" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "a11_dedup_priority" ->
      """WITH s1 AS (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS rn FROM orders),
         s2 AS (
           SELECT o_orderkey, o_custkey, o_orderpriority, o_orderdate
           FROM s1 WHERE rn = 1),
         s3 AS (
           SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_orderdate, o_orderkey) AS rn FROM s2)
         SELECT o_orderkey, o_custkey, o_orderpriority FROM s3 WHERE rn = 1"""
  )
}
