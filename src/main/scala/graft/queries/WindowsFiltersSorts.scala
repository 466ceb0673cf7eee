package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Engine.table

/** SURVEY.md §2.5 windows (W1–W3), §2.6 sorts/limits/top-k (O1–O4), and
  * §2.2 filter/predicate operators (P2, P4, P6, P8, P9).
  *
  * Reference semantics (citations into /root/reference):
  *   - W1 ordinal rank per partition + label: defs/assets/ingest_graph_db.py:90-102
  *   - W2 keep-first dedup window: utils/data_transformation_helpers.py:113-120
  *   - W3 grouped top-k by connectivity: defs/assets/detect_communities.py:138-165
  *   - O1 global sort: utils/data_transformation_helpers.py:115
  *   - O3 argmin by composite priority key: utils/musicbrainz_helpers.py:280-308
  *   - P2/P6 not-null / validation predicates: defs/assets/extract_artists.py:66-97
  *   - P4 regex predicate: defs/assets/extract_artists.py:42-63
  *   - P8 offset/limit slice: defs/assets/extract_artists.py:298-303
  *   - P9 min-length content filter: utils/wikipedia_helpers.py:151-152
  *
  * Scale notes: all windows partition by a key (one shuffle, parallel within
  * partitions). The only global-ordering ops are O1 and P8, both planned as
  * TakeOrderedAndProject (per-partition top-k then k-way merge — never a full
  * sort); P8's unpartitioned window runs after a limit, so its serial stage
  * is O(offset+n) whatever the input size.
  */
object WindowsFiltersSorts extends QueryModule {

  /** W1 + F8 — ordinal position within a group, rendered "{pos}. {title}".
    * The harness lineitem table has duplicate (orderkey, linenumber) pairs, so
    * the ordering carries a full deterministic tiebreak — SURVEY §7.5 hard
    * point 1 (Polars maintain_order has no free Spark equivalent).
    */
  private def w1_rank_label(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_orderkey"))
      .orderBy(
        col("l_linenumber").asc,
        col("l_partkey").asc,
        col("l_suppkey").asc,
        col("l_extendedprice").asc
      )
    table(s, d, "lineitem")
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(
        col("l_orderkey"),
        col("pos"),
        concat(col("pos").cast("string"), lit(". "), col("l_partkey").cast("string"))
          .as("entry")
      )
  }

  /** W2 — keep-first dedup: earliest shipment wins per part. */
  private def w2_keep_first(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    table(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_partkey", "l_orderkey", "l_linenumber")
  }

  /** W3 — per-group top-5 by "connectivity" (order count per customer). */
  private def w3_topk_per_group(s: SparkSession, d: String): DataFrame = {
    val conn = table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("connectivity"))
    val cust = table(s, d, "customer")
      .join(conn, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        coalesce(col("connectivity"), lit(0L)).as("connectivity")
      )
    val w = Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("connectivity").desc, col("c_custkey").asc)
    cust
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
  }

  /** O1 — global ordered top-100 (planned as TakeOrderedAndProject). */
  private def o1_global_sort_limit(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_totalprice")

  /** O3 — argmin by composite key: preferred status first, then oldest. */
  private def o3_argmin_composite(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(
        when(col("o_orderstatus") === "F", 0).otherwise(1).asc,
        col("o_orderdate").asc,
        col("o_orderkey").asc
      )
    table(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("best_orderkey"), col("o_orderstatus"))
  }

  /** P2 + P6 — multi-condition validation gate. */
  private def p6_validation_gate(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .filter(
        col("o_orderstatus").isNotNull &&
          col("o_orderpriority").isNotNull &&
          col("o_orderstatus") === "O" &&
          col("o_totalprice") > 5000.0
      )
      .select("o_orderkey", "o_totalprice")

  /** P4 — regex predicate gate (reference: Latin-script name filter). */
  private def p4_regex_filter(s: SparkSession, d: String): DataFrame =
    table(s, d, "part")
      .filter(col("p_name").rlike("^(red|blue) [a-z]+$"))
      .select("p_partkey", "p_name")

  /** P8 — explicit offset/limit slice (rows 101..200 of a total order).
    * Scale-safe plan: `orderBy().limit(offset+n)` is planned as
    * TakeOrderedAndProject (per-partition top-k, then a k-way merge — never a
    * full global sort), and only the 200 surviving rows flow through the
    * unpartitioned row_number window, so the serial stage is O(offset+n)
    * regardless of input size.
    */
  private def p8_offset_slice(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(s, d, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(200)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") > 100)
      .select("rn", "o_orderkey", "o_totalprice")
  }

  /** P3 — drop_nulls after explode (reference extract_genres.py:52-57:
    * exploded genre ids can be null; the null rows are dropped).
    */
  private def p3_explode_drop_nulls(s: SparkSession, d: String): DataFrame = {
    val arr = array(
      when(col("o_orderkey") % 2 === 0, lit("even")),
      lit("all"),
      when(col("o_orderkey") % 3 === 0, lit("third"))
    )
    table(s, d, "orders")
      .select(col("o_orderkey"), explode(arr).as("tag"))
      .na
      .drop(Seq("tag"))
  }

  /** P10 — empty/None row skip (reference ingest_vector_db.py:113-114:
    * rows whose article is empty or missing never reach the sink).
    */
  private def p10_empty_skip(s: SparkSession, d: String): DataFrame = {
    val article = when(col("c_custkey") % 7 === 0, lit(""))
      .when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
      .otherwise(col("c_name"))
    table(s, d, "customer")
      .select(col("c_custkey"), article.as("article"))
      .filter(col("article").isNotNull && col("article") =!= "")
  }

  /** O2 — source-level stable sort (reference build_artist_index.py:66,84:
    * ORDER BY start_date, artist for pagination stability) made observable
    * via the global rank, truncated to the first 500 so the single-partition
    * window stage is O(500) at any scale.
    */
  private def o2_stable_sort(s: SparkSession, d: String): DataFrame = {
    val ord = Seq(col("o_orderdate").asc, col("o_orderkey").asc)
    table(s, d, "orders")
      .orderBy(ord: _*)
      .limit(500)
      .withColumn("rn", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("o_orderkey"), col("rn"))
  }

  /** O5 — sorted distinct keys (reference detect_communities.py:296:
    * `unique().sort()` over community ids), rank made observable; the
    * distinct-key set is tiny by construction so the single-partition
    * window is O(keys).
    */
  private def o5_sorted_distinct(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .select(col("o_orderpriority"))
      .distinct()
      .withColumn(
        "rnk",
        row_number().over(Window.orderBy(col("o_orderpriority"))).cast("long")
      )

  /** W5 — percent_rank, INTEGER-QUANTIZED: pr_q = ((rank−1)·10⁶) div (n−1)
    * over a fully-determined order, so the relative standing is exact
    * cross-engine (stock percent_rank returns a float division both
    * engines round differently at the ulp). The per-entity percentile
    * standing feeds tiering and outlier policies downstream.
    */
  private def w5_percent_rank_q(s: SparkSession, d: String): DataFrame = {
    val w  = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val wg = Window.partitionBy(col("c_nationkey"))
    table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wg))
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        // rk is row_number's Int; the multiply must widen FIRST — in Int it
        // overflows once a nation holds >2148 customers (caught by the sf1
        // scale point, round 8).
        expr("((CAST(rk AS BIGINT) - 1) * 1000000) div (n - 1)").as("pr_q")
      )
  }

  /** W6 — grouped top-k WITH TIES (`rank`, not `row_number`): every row
    * tied with the k-th survives, so the cut never silently drops peers —
    * the semantics audits and leaderboards want. The contrast with w3's
    * exact-k row_number form is the point: both are one WindowGroupLimit
    * pass, the difference is only which boundary rule the consumer needs.
    */
  private def w6_topk_with_ties(s: SparkSession, d: String): DataFrame = {
    val conn = table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("connectivity"))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("connectivity").desc)
    table(s, d, "customer")
      .join(conn, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_nationkey"),
        coalesce(col("connectivity"), lit(0L)).as("connectivity")
      )
      .withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  /** O6 — Z-order layout key (`graft_zorder`, a native codegen'd Morton
    * interleave): the clustering sort a lakehouse runs before writing so
    * parquet min/max stats stay tight on BOTH dimensions (here: nation ×
    * balance-bucket over customers). The query materializes the first 100
    * rows of the layout order — at scale this ordering feeds the writer,
    * and predicates on either dimension then skip most row groups.
    */
  private def o6_zorder_layout(s: SparkSession, d: String): DataFrame = {
    // trunc-toward-zero then normalized mod: matches the oracle's
    // CAST(trunc(...)) — DuckDB's decimal→int CAST rounds, Spark's truncates
    val zkey = call_function(
      "graft_zorder",
      col("c_nationkey").cast("long"),
      (col("c_acctbal").cast("long") % 65536 + 65536) % 65536
    )
    table(s, d, "customer")
      .select(col("c_custkey"), zkey.as("zkey"))
      .orderBy(col("zkey").asc, col("c_custkey").asc)
      .limit(100)
  }

  /** P9 — min-length content filter. */
  private def p9_min_length(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .filter(length(col("text")) >= 200)
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))

  /** O7 — SCALABLE global row-id assignment (two-level rank): the
    * operation o2/p8 deliberately bound to ≤500 rows, done for the FULL
    * table without ever moving it to one partition. Level 1 ranks within
    * key-range buckets (one keyed shuffle, parallel); level 2 turns the
    * per-bucket counts — #buckets rows, data-independent of row count —
    * into exclusive prefix offsets with a bounded single-partition window
    * (the o2/o5 discipline), broadcast back, gid = offset + local rank.
    * Equal to `row_number() OVER (ORDER BY key)` because bucket id is
    * monotone in the key. The pattern every 100 TB pipeline needs for
    * stable dense ids (file-concat line numbers, contiguous sample ids)
    * where a naive global window serializes the entire table.
    */
  private def o7_global_ids(s: SparkSession, d: String): DataFrame = {
    val o      = table(s, d, "orders").select(col("o_orderkey"))
    val b      = o.withColumn("bucket", expr("o_orderkey div 100000"))
    val wIn    = Window.partitionBy(col("bucket")).orderBy(col("o_orderkey"))
    val ranked = b.withColumn("rn", row_number().over(wIn).cast("long"))
    val wOff = Window
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select(col("bucket"), col("off"))
    ranked
      .join(broadcast(offsets), "bucket")
      .select(col("o_orderkey"), (col("off") + col("rn")).as("gid"))
  }

  /** O8 — range-partitioner balance audit: the global-sort scale story,
    * made measurable. A total ordering at 100 TB is only as good as its
    * range boundaries, so this query derives 8-way split points the way a
    * distributed engine must — from a FIXED-WIDTH INTEGER HISTOGRAM
    * (map-side combinable, bounded by the value domain, never a sort):
    * cumulative counts over the $1000-wide price bins pick the smallest
    * bin where cum·8 ≥ q·n for each q, and every row is then assigned to
    * its range partition by counting boundaries at or below its value.
    * The output is the per-partition row census with its share in
    * per-mille of the ideal 125‰ — the skew a RangePartitioner built from
    * this histogram would actually exhibit, boundary-quantization error
    * included (a18/a21's calibration discipline applied to partitioning).
    *
    * Scale: the only non-linear state is the histogram (≤ value-range ÷
    * bin-width rows — the bounded global window) and two ≤8-row broadcast
    * spines; rows are touched twice, shuffled zero times beyond the
    * histogram's map-side combine.
    */
  private def o8_range_partition_audit(s: SparkSession, d: String): DataFrame = {
    val binW   = 100000L // $1000.00 bins over price cents
    val nParts = 8
    val v    = table(s, d, "orders").select((col("o_totalprice") * 100).cast("long").as("v"))
    val hist = v.groupBy(expr(s"v div $binW").as("bk")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum  = hist.withColumn("cc", sum("c").over(wCum))
    val nRow = broadcast(v.agg(count(lit(1)).as("n")))
    val qs   = s.range(1, nParts).select(col("id").as("q"))
    val bnd = cum
      .crossJoin(nRow)
      .join(broadcast(qs), col("cc") * nParts >= col("q") * col("n"))
      .groupBy("q")
      .agg(min("bk").as("bbk"))
      .agg(sort_array(collect_list((col("bbk") + 1) * binW)).as("bs"))
    v.crossJoin(broadcast(bnd.crossJoin(nRow)))
      .select(
        size(filter(col("bs"), x => col("v") >= x)).cast("long").as("bin"),
        col("n")
      )
      .groupBy("bin", "n")
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col("bin"),
        col("n_rows"),
        expr(s"1000 * n_rows * $nParts DIV n").as("share_pm")
      )
  }

  /** O9 — deterministic training-order shuffle: every epoch of LLM training
    * needs a reproducible global permutation of the corpus, sharded for the
    * data loader. Order = md5(epoch-salt | doc_id) — a pure column function,
    * so the permutation is identical across runs/engines with no RNG state;
    * shard = first hash byte mod 8 (hash-uniform), position-within-shard =
    * rank along the same hash order. At 100 TB the shard assignment is a
    * scan-parallel projection and each shard's ordering is one
    * range-partitioned sort WITHIN the shard key — never a global
    * single-partition sort (the per-shard window keeps the sort sharded;
    * compare o7's explicit two-phase global-id build).
    */
  private def o9_epoch_shuffle(s: SparkSession, d: String): DataFrame = {
    val nShards = 8
    val h       = md5(concat(lit("epoch-7|"), col("doc_id").cast("string")))
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    table(s, d, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", (conv(substring(col("h"), 1, 2), 16, 10).cast("long") % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** O10 — rendezvous-hash elastic-resharding audit (Thaler–Ravishankar
    * HRW 1998, the consistent-hashing discipline every elastic storage /
    * shuffle layer rests on): each doc's shard under n shards is the
    * argmax over s ∈ 0..n−1 of md5(doc_id#s), so growing 8 → 9 shards
    * moves EXACTLY the docs the new shard wins — an expected 1/9 of the
    * corpus, every one of them moving TO shard 8 — while mod-N hashing
    * (shard = h mod n) remaps an expected 8/9 of all docs across every
    * shard pair. The output is the 9-shard census with both schemes'
    * moved counts side by side: hrw_moved is 0 on shards 0–7 and equals
    * hrw_n on shard 8 (the structural guarantee, visible in the data),
    * mod_moved is ~8/9 of every shard. THE number a 100 TB reshard reads
    * before choosing its placement function — at petabyte scale the
    * difference is rewriting 11% vs 89% of the estate.
    *
    * Scale shape: the double assignment is a pure scan-parallel
    * projection (a 9-element array max per row, no shuffle, no state);
    * the census is two 9-row hash aggregates full-outer-joined on the
    * shard id. Struct array_max compares (h, s) lexicographically on the
    * lowercase md5 hex in both engines; ties are md5 collisions, i.e.
    * never.
    */
  private def o10_rendezvous_shards(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
      .select(col("doc_id"))
      .withColumn(
        "cand",
        expr(
          "transform(sequence(0, 8), s -> struct(md5(concat(cast(doc_id as string), '#', cast(s as string))) as h, cast(s as bigint) as s))"
        )
      )
      .withColumn("hrw9", expr("array_max(cand).s"))
      .withColumn("hrw8", expr("array_max(slice(cand, 1, 8)).s"))
      .withColumn(
        "u",
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint)")
      )
      .withColumn("mod8", col("u") % 8)
      .withColumn("mod9", col("u") % 9)
    val hrw = docs
      .groupBy(col("hrw9").as("shard"))
      .agg(
        count(lit(1)).as("hrw_n"),
        sum(when(col("hrw8") =!= col("hrw9"), 1L).otherwise(0L)).as("hrw_moved")
      )
    val md = docs
      .groupBy(col("mod9").as("shard"))
      .agg(
        count(lit(1)).as("mod_n"),
        sum(when(col("mod8") =!= col("mod9"), 1L).otherwise(0L)).as("mod_moved")
      )
    hrw
      .join(md, Seq("shard"), "full_outer")
      .select(
        col("shard").cast("long").as("shard"),
        coalesce(col("hrw_n"), lit(0L)).cast("long").as("hrw_n"),
        coalesce(col("hrw_moved"), lit(0L)).cast("long").as("hrw_moved"),
        coalesce(col("mod_n"), lit(0L)).cast("long").as("mod_n"),
        coalesce(col("mod_moved"), lit(0L)).cast("long").as("mod_moved")
      )
  }

  /** O11 — CONSISTENT-HASH RING reshard audit (Karger et al. 1997, the
    * other production placement function next to o10's HRW — memcached/
    * Dynamo-style): 9 shards × 64 virtual nodes hash onto the md5 ring,
    * a key's owner is its SUCCESSOR vnode (first ring position ≥ the
    * key's hash, wrapping to the ring minimum), and growing 8 → 9 shards
    * inserts only shard 8's vnodes — so every moved key moves TO shard 8
    * (ring_moved = 0 on shards 0–7 is STRUCTURAL in the output, the same
    * stability property o10 proves for HRW) and the expected moved share
    * is vnodes_new/vnodes_total = 64/576 = 1/9.
    *
    * Scale shape: the ring is data-independent — 576 (pos, shard) structs
    * collapse to ONE sorted-array row that broadcasts onto the document
    * scan (never a docs×vnodes row amplification); the successor lookup
    * is a per-row array filter over 576 elements (the relational stand-in
    * for the binary search a server does), and both the 9-shard and
    * 8-shard rings ride the same broadcast row. One hash aggregate
    * censuses the result. md5-hex string order IS ring order in both
    * engines (binary collation).
    */
  private def o11_consistent_ring(s: SparkSession, d: String): DataFrame = {
    val ring = s
      .range(576)
      .select(
        expr("id div 64").cast("long").as("s"),
        expr("md5(concat(cast(id div 64 as string), '@', cast(id % 64 as string)))").as("p")
      )
    val ringRow = ring
      .agg(array_sort(collect_list(struct(col("p"), col("s")))).as("ring9"))
      .select(col("ring9"), expr("filter(ring9, x -> x.s != 8)").as("ring8"))
    def owner(ringCol: String): Column =
      coalesce(
        // try_: a key past the last vnode filters to an EMPTY array and
        // wraps to the ring minimum (ANSI element_at throws on empty)
        expr(s"try_element_at(filter($ringCol, x -> x.p >= h), 1)"),
        expr(s"element_at($ringCol, 1)")
      ).getField("s")
    table(s, d, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .crossJoin(broadcast(ringRow))
      .select(owner("ring9").as("own9"), owner("ring8").as("own8"))
      .groupBy(col("own9").as("shard"))
      .agg(
        count(lit(1)).as("ring_n"),
        sum(when(col("own8") =!= col("own9"), 1L).otherwise(0L)).as("ring_moved")
      )
      .select(
        col("shard").cast("long").as("shard"),
        col("ring_n").cast("long").as("ring_n"),
        col("ring_moved").cast("long").as("ring_moved")
      )
  }

  /** O12 — Z-ORDER layout audit (Morton-curve multi-dimensional
    * clustering — the lakehouse `OPTIMIZE ZORDER BY` primitive
    * Delta/Iceberg/Hudi run on exactly this 100 TB layout problem, after
    * Orenstein–Merrett 1984: a file sorted on ONE column skips perfectly
    * on that column and not at all on any other; interleaving the bits of
    * two quantized columns bounds BOTH per-file value ranges, so min/max
    * file statistics prune on either predicate): each lineitem row
    * quantizes (l_partkey, l_suppkey) to 6-bit lattice ranks via the
    * broadcast min/max bounds, the Morton code interleaves the bits, and
    * rows bucket into 64 "files" by z-prefix vs the LINEAR layout's
    * qx-prefix. The audit is the data-skipping effectiveness census a
    * table-optimizer reports: per layout, the mean per-bucket span of
    * each dimension in ‰ of its 64-value domain — linear is ~perfect on x
    * and ~blind (≈1000‰) on y; z-order pays a little x to bound both (the
    * reason OPTIMIZE ZORDER exists; the spec pins the worst-dimension
    * win).
    *
    * Scale shape: ONE narrow scan (two int columns), a single-row
    * min/max bounds broadcast, two 64-bucket hash aggregates, a 2-row
    * output. The z-value rides o6's native codegen'd `graft_zorder`
    * Morton expression — this audit is the effectiveness half of the
    * layout primitive o6 writes, exactly what a real OPTIMIZE job reports
    * after its range-repartition write.
    */
  private def o12_zorder_audit(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
      .select(col("l_partkey").cast("long").as("x"), col("l_suppkey").cast("long").as("y"))
    val bounds = li.agg(
      min(col("x")).as("minx"), max(col("x")).as("maxx"),
      min(col("y")).as("miny"), max(col("y")).as("maxy"))
    val q = li
      .crossJoin(broadcast(bounds))
      .select(
        expr("((x - minx) * 64) div (maxx - minx + 1)").as("qx"),
        expr("((y - miny) * 64) div (maxy - miny + 1)").as("qy"))
      .select(
        col("qx"),
        col("qy"),
        shiftright(call_function("graft_zorder", col("qx"), col("qy")), 6).as("zb"))
    def census(tag: String, bucket: Column) =
      q.groupBy(bucket.as("bkt"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("qx")) - min(col("qx")) + 1).as("sx"),
          (max(col("qy")) - min(col("qy")) + 1).as("sy"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(col("n")).as("n_rows"),
          expr("1000 * sum(sx) div (count(1) * 64)").as("span_x_pm"),
          expr("1000 * sum(sy) div (count(1) * 64)").as("span_y_pm"))
        .select(
          lit(tag).as("layout"),
          col("n_buckets").cast("long").as("n_buckets"),
          col("n_rows").cast("long").as("n_rows"),
          col("span_x_pm").cast("long").as("span_x_pm"),
          col("span_y_pm").cast("long").as("span_y_pm"),
          greatest(col("span_x_pm"), col("span_y_pm")).cast("long").as("worst_span_pm"))
    census("linear_x", col("qx")).unionByName(census("zorder", col("zb")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o12_zorder_audit" -> (o12_zorder_audit _),
    "o11_consistent_ring" -> (o11_consistent_ring _),
    "o10_rendezvous_shards" -> (o10_rendezvous_shards _),
    "o9_epoch_shuffle" -> (o9_epoch_shuffle _),
    "o8_range_partition_audit" -> (o8_range_partition_audit _),
    "o7_global_ids" -> (o7_global_ids _),
    "w1_rank_label" -> (w1_rank_label _),
    "w2_keep_first" -> (w2_keep_first _),
    "w3_topk_per_group" -> (w3_topk_per_group _),
    "o1_global_sort_limit" -> (o1_global_sort_limit _),
    "o2_stable_sort" -> (o2_stable_sort _),
    "o3_argmin_composite" -> (o3_argmin_composite _),
    "o5_sorted_distinct" -> (o5_sorted_distinct _),
    "p3_explode_drop_nulls" -> (p3_explode_drop_nulls _),
    "p10_empty_skip" -> (p10_empty_skip _),
    "p6_validation_gate" -> (p6_validation_gate _),
    "p4_regex_filter" -> (p4_regex_filter _),
    "p8_offset_slice" -> (p8_offset_slice _),
    "p9_min_length" -> (p9_min_length _),
    "o6_zorder_layout" -> (o6_zorder_layout _),
    "w5_percent_rank_q" -> (w5_percent_rank_q _),
    "w6_topk_with_ties" -> (w6_topk_with_ties _)
  )

  /** The Morton interleave as a closed-form bit chain (ZOrderKey's SQL twin). */
  private val zorderBitsSql: String = (0 until 16)
    .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
    .mkString(" + ")

  /** 6-bit Morton interleave over the quantized ranks (graft_zorder's
    * convention: first arg at even bit positions) for the o12 oracle.
    */
  private val zb6Sql: String = (0 until 6)
    .map(i => s"(((qx >> $i) & 1) << ${2 * i}) + (((qy >> $i) & 1) << ${2 * i + 1})")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "o12_zorder_audit" ->
      s"""WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS x,
                             CAST(l_suppkey AS BIGINT) AS y FROM lineitem),
          b AS (SELECT min(x) AS minx, max(x) AS maxx,
                       min(y) AS miny, max(y) AS maxy FROM li),
          q AS MATERIALIZED (
            SELECT ((li.x - minx) * 64) // (maxx - minx + 1) AS qx,
                   ((li.y - miny) * 64) // (maxy - miny + 1) AS qy
            FROM li, b),
          zq AS MATERIALIZED (SELECT qx, qy, ($zb6Sql) >> 6 AS zb FROM q),
          lb AS (SELECT qx AS bkt, count(*) AS n,
                        max(qx) - min(qx) + 1 AS sx, max(qy) - min(qy) + 1 AS sy
                 FROM zq GROUP BY 1),
          zbk AS (SELECT zb AS bkt, count(*) AS n,
                         max(qx) - min(qx) + 1 AS sx, max(qy) - min(qy) + 1 AS sy
                  FROM zq GROUP BY 1)
          SELECT 'linear_x' AS layout,
                 CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(n) AS BIGINT) AS n_rows,
                 CAST(1000 * sum(sx) // (count(*) * 64) AS BIGINT) AS span_x_pm,
                 CAST(1000 * sum(sy) // (count(*) * 64) AS BIGINT) AS span_y_pm,
                 CAST(greatest(1000 * sum(sx) // (count(*) * 64),
                               1000 * sum(sy) // (count(*) * 64)) AS BIGINT) AS worst_span_pm
          FROM lb
          UNION ALL
          SELECT 'zorder',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(n) AS BIGINT),
                 CAST(1000 * sum(sx) // (count(*) * 64) AS BIGINT),
                 CAST(1000 * sum(sy) // (count(*) * 64) AS BIGINT),
                 CAST(greatest(1000 * sum(sx) // (count(*) * 64),
                               1000 * sum(sy) // (count(*) * 64)) AS BIGINT)
          FROM zbk""",
    "o11_consistent_ring" ->
      """WITH ring AS (
           SELECT i // 64 AS s,
                  md5(CAST(i // 64 AS VARCHAR) || '@' || CAST(i % 64 AS VARCHAR)) AS p
           FROM (SELECT unnest(range(0, 576)) AS i)),
         d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         succ9 AS (SELECT doc_id, min(p) AS mp FROM d JOIN ring ON ring.p >= d.h
                   GROUP BY 1),
         succ8 AS (SELECT doc_id, min(p) AS mp FROM d JOIN ring ON ring.p >= d.h
                   WHERE ring.s <> 8 GROUP BY 1),
         wrap AS (SELECT min(p) AS w9,
                         min(CASE WHEN s <> 8 THEN p END) AS w8 FROM ring),
         own AS (SELECT d.doc_id,
                        r9.s AS own9, r8.s AS own8
                 FROM d LEFT JOIN succ9 USING (doc_id)
                        LEFT JOIN succ8 USING (doc_id)
                        CROSS JOIN wrap
                 JOIN ring r9 ON r9.p = coalesce(succ9.mp, wrap.w9)
                 JOIN ring r8 ON r8.p = coalesce(succ8.mp, wrap.w8))
         SELECT CAST(own9 AS BIGINT) AS shard,
                CAST(count(*) AS BIGINT) AS ring_n,
                CAST(sum(CASE WHEN own8 <> own9 THEN 1 ELSE 0 END) AS BIGINT)
                  AS ring_moved
         FROM own GROUP BY 1""",
    "o10_rendezvous_shards" ->
      """WITH c AS (SELECT doc_id,
                           list_transform(range(0, 9),
                             s -> {'h': md5(CAST(doc_id AS VARCHAR) || '#' ||
                                            CAST(s AS VARCHAR)),
                                   's': s}) AS cand,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS u
                    FROM documents),
         a AS (SELECT struct_extract(list_max(cand), 's') AS hrw9,
                      struct_extract(list_max(cand[1:8]), 's') AS hrw8,
                      u % 8 AS mod8, u % 9 AS mod9
               FROM c),
         h AS (SELECT hrw9 AS shard, count(*) AS hrw_n,
                      sum(CASE WHEN hrw8 <> hrw9 THEN 1 ELSE 0 END) AS hrw_moved
               FROM a GROUP BY 1),
         m AS (SELECT mod9 AS shard, count(*) AS mod_n,
                      sum(CASE WHEN mod8 <> mod9 THEN 1 ELSE 0 END) AS mod_moved
               FROM a GROUP BY 1)
         SELECT CAST(COALESCE(h.shard, m.shard) AS BIGINT) AS shard,
                CAST(COALESCE(hrw_n, 0) AS BIGINT) AS hrw_n,
                CAST(COALESCE(hrw_moved, 0) AS BIGINT) AS hrw_moved,
                CAST(COALESCE(mod_n, 0) AS BIGINT) AS mod_n,
                CAST(COALESCE(mod_moved, 0) AS BIGINT) AS mod_moved
         FROM h FULL JOIN m ON h.shard = m.shard""",
    "o9_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
                           md5('epoch-7|' || CAST(doc_id AS VARCHAR)) AS h
                    FROM documents),
         sh AS (SELECT doc_id, h,
                       CAST(CAST('0x' || substring(h, 1, 2) AS INTEGER) % 8
                            AS BIGINT) AS shard
                FROM h)
         SELECT doc_id, shard,
                CAST(row_number() OVER (PARTITION BY shard
                       ORDER BY h, doc_id) AS BIGINT) AS pos
         FROM sh""",
    "o8_range_partition_audit" ->
      """WITH v AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS v FROM orders),
         h AS (SELECT v // 100000 AS bk, count(*) AS c FROM v GROUP BY 1),
         cum AS (SELECT bk, sum(c) OVER (ORDER BY bk ROWS UNBOUNDED PRECEDING) AS cc FROM h),
         n AS (SELECT count(*) AS n FROM v),
         q AS (SELECT unnest(range(1, 8)) AS q),
         bnd AS (SELECT q, min(bk) AS bbk FROM cum, n, q WHERE cc * 8 >= q * n GROUP BY 1),
         bs AS (SELECT list_sort(list((bbk + 1) * 100000)) AS bs FROM bnd),
         a AS (SELECT len(list_filter(bs.bs, x -> v.v >= x)) AS bin FROM v, bs)
         SELECT CAST(bin AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(1000 * count(*) * 8 // max(n.n) AS BIGINT) AS share_pm
         FROM a, n GROUP BY 1""",
    "o7_global_ids" ->
      """SELECT o_orderkey,
                CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS gid
         FROM orders""",
    "w5_percent_rank_q" ->
      """WITH r AS (
           SELECT c_custkey, c_nationkey,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal, c_custkey) AS rk,
                  count(*) OVER (PARTITION BY c_nationkey) AS n
           FROM customer)
         SELECT c_custkey, c_nationkey,
                CAST(((rk - 1) * 1000000) // (n - 1) AS BIGINT) AS pr_q
         FROM r""",
    "w6_topk_with_ties" ->
      """WITH conn AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS connectivity
                      FROM orders GROUP BY 1),
         c AS (SELECT c_custkey, c_nationkey,
                      coalesce(conn.connectivity, 0) AS connectivity
               FROM customer LEFT JOIN conn ON c_custkey = o_custkey),
         r AS (SELECT *, rank() OVER (PARTITION BY c_nationkey
                                      ORDER BY connectivity DESC) AS rk FROM c)
         SELECT c_custkey, c_nationkey, connectivity, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 3""",
    "o6_zorder_layout" ->
      s"""WITH c AS (SELECT c_custkey,
                            CAST(c_nationkey AS BIGINT) AS x,
                            ((CAST(trunc(c_acctbal) AS BIGINT) % 65536) + 65536) % 65536 AS y
                     FROM customer)
          SELECT c_custkey, CAST($zorderBitsSql AS BIGINT) AS zkey
          FROM c ORDER BY zkey, c_custkey LIMIT 100""",
    "w1_rank_label" ->
      """SELECT l_orderkey,
                CAST(row_number() OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS BIGINT) AS pos,
                CAST(row_number() OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS VARCHAR)
                  || '. ' || CAST(l_partkey AS VARCHAR) AS entry
         FROM lineitem""",
    "w2_keep_first" ->
      """SELECT l_partkey, l_orderkey, l_linenumber FROM (
           SELECT l_partkey, l_orderkey, l_linenumber,
                  row_number() OVER (PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn = 1""",
    "w3_topk_per_group" ->
      """WITH conn AS (
           SELECT o_custkey, count(*) AS connectivity FROM orders GROUP BY o_custkey),
         cust AS (
           SELECT c_custkey, c_nationkey,
                  CAST(coalesce(connectivity, 0) AS BIGINT) AS connectivity
           FROM customer LEFT JOIN conn ON c_custkey = o_custkey)
         SELECT c_custkey, c_nationkey, connectivity, rnk FROM (
           SELECT *, CAST(row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY connectivity DESC, c_custkey) AS BIGINT) AS rnk
           FROM cust) WHERE rnk <= 5""",
    "o1_global_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "o3_argmin_composite" ->
      """SELECT o_custkey, o_orderkey AS best_orderkey, o_orderstatus FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
                  ORDER BY CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END,
                           o_orderdate, o_orderkey) AS rn
           FROM orders) WHERE rn = 1""",
    "p6_validation_gate" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
           AND o_orderstatus = 'O' AND o_totalprice > 5000.0""",
    "p4_regex_filter" ->
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '^(red|blue) [a-z]+$')""",
    "o2_stable_sort" ->
      """SELECT o_orderkey, rn FROM (
           SELECT o_orderkey,
                  CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
           FROM orders) WHERE rn <= 500""",
    "o5_sorted_distinct" ->
      """SELECT o_orderpriority,
                CAST(row_number() OVER (ORDER BY o_orderpriority) AS BIGINT) AS rnk
         FROM (SELECT DISTINCT o_orderpriority FROM orders)""",
    "p3_explode_drop_nulls" ->
      """SELECT o_orderkey, tag FROM (
           SELECT o_orderkey,
                  unnest([CASE WHEN o_orderkey % 2 = 0 THEN 'even' END,
                          'all',
                          CASE WHEN o_orderkey % 3 = 0 THEN 'third' END]) AS tag
           FROM orders) WHERE tag IS NOT NULL""",
    "p10_empty_skip" ->
      """SELECT c_custkey, article FROM (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 7 = 0 THEN ''
                       WHEN c_custkey % 11 = 0 THEN NULL
                       ELSE c_name END AS article
           FROM customer) WHERE article IS NOT NULL AND article <> ''""",
    "p8_offset_slice" ->
      """SELECT rn, o_orderkey, o_totalprice FROM (
           SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
                  o_orderkey, o_totalprice
           FROM orders) WHERE rn > 100 AND rn <= 200""",
    "p9_min_length" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
         FROM documents WHERE length(text) >= 200"""
  )
}
