package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Engine.table
import graft.io.TableIO

/** SURVEY.md §2.1 S1/S3/S4/S5 + §2.7 U2 exercised end-to-end: each query
  * writes through the graft.io sink, reads back through the matching scan,
  * and returns data whose oracle is the *source* table — so a pass proves
  * the write+read pair is lossless, not just that two reads agree.
  *
  * Temp output lands under java.io.tmpdir/graft_io (the harness is the only
  * writer; mode=overwrite keeps reruns idempotent — S16 reset semantics).
  */
object IOQueries extends QueryModule {

  private def ioDir(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_io/$name"

  /** S29 — snapshot (time-travel) read over generation-stamped commits:
    * three generations of the supplier table land as `gen=N` partitions
    * (gen 1 = the base load, gen 2 upserts every 10th key, gen 3 every
    * 7th), then the table is read AS OF generation 2 — gen 3's files are
    * partition-pruned away at planning time (TableIOSpec asserts the
    * PartitionFilters) — and per-key conflicts resolve keep-last by max gen.
    * The oracle recomputes the as-of-2 state directly from the source
    * table, so a green row proves write→prune→resolve reproduces the
    * committed history, not merely that two reads agree.
    *
    * Scale: the snapshot scan reads only `gen<=asOf` partitions; the
    * keep-last window keys on s_suppkey (one shuffle), and the final
    * aggregate is map-side combinable. Values are pure integer functions
    * of the key, so no float crosses the engine boundary. At 100 TB the
    * per-key window is the standard MOR (merge-on-read) price; compact
    * (this module's maintenance pass) is what folds old generations down
    * when the history no longer needs to stay addressable.
    */
  private def s29_time_travel(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s29_supplier")
    val src = table(s, d, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), (col("s_suppkey") * 10).as("v"))
    TableIO.writeGeneration(src, base, 1)
    TableIO.writeGeneration(
      src.filter(col("s_suppkey") % 10 === 0).withColumn("v", col("s_suppkey") * 10 + 1),
      base,
      2
    )
    TableIO.writeGeneration(
      src.filter(col("s_suppkey") % 7 === 0).withColumn("v", col("s_suppkey") * 10 + 2),
      base,
      3
    )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_suppkey"))
      .orderBy(col("gen").desc)
    TableIO
      .readSnapshot(s, base, asOf = 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("v")).as("sum_v"))
      .select(col("s_nationkey"), col("n_suppliers"), col("sum_v").cast("long").as("sum_v"))
  }

  /** S1 — Parquet sink→scan roundtrip (atomic overwrite commit). */
  private def s1_parquet_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s1_orders")
    val src = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    TableIO.writeParquet(src, out)
    s.read.parquet(out)
  }

  /** S3+S4 — sparse JSONL sink → schema'd scan roundtrip: the nullable
    * `segment` column is dropped from odd records on disk (sparse JSON) and
    * must come back as null under the declared schema.
    */
  private def s3_jsonl_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s3_customer")
    val src = table(s, d, "customer").select(
      col("c_custkey"),
      col("c_name"),
      when(col("c_custkey") % 2 === 0, concat(lit("seg"), col("c_nationkey").cast("string")))
        .as("segment")
    )
    TableIO.writeJsonl(src, out)
    val schema = StructType(
      Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("segment", StringType)
      )
    )
    TableIO.readJsonl(s, schema, out)
  }

  /** S21 — CSV sink + schema'd scan roundtrip: header on, explicit quote/
    * escape handling exercised by a field that CONTAINS the delimiter and
    * quotes (part names with an injected `, "q"` suffix), explicit schema
    * on read (inference samples the data — nondeterministic at scale and
    * an extra pass). CSV is the interchange format that still carries half
    * of real ingest; the dangerous part is quoting, so the roundtrip
    * plants the dangerous case.
    */
  private def s21_csv_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s21_csv")
    val src = table(s, d, "part").select(
      col("p_partkey"),
      concat(col("p_name"), lit(", \"q\"")).as("tricky_name"),
      col("p_retailprice")
    )
    src.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(
      Seq(
        StructField("p_partkey", LongType),
        StructField("tricky_name", StringType),
        StructField("p_retailprice", org.apache.spark.sql.types.DoubleType)
      )
    )
    s.read
      .schema(schema)
      .option("header", "true")
      .csv(out)
      .select(
        col("p_partkey"),
        col("tricky_name"),
        // integral-cents long: float-safe compare (the s3/u2 stance)
        round(col("p_retailprice") * 100, 0).cast("long").as("price_cents")
      )
  }

  /** S22 — ORC sink→scan roundtrip: the second columnar format a
    * Spark-native engine gets for free (predicate pushdown, column
    * pruning, and vectorized read all apply to ORC scans exactly as to
    * parquet), exercised end-to-end with an explicit declared schema on
    * read — the warehouse-interchange path for stacks standardized on
    * ORC/Hive rather than parquet. Balances are reported as integral
    * cents, the float-safe compare (the s3/s21 stance); the oracle reads
    * the parquet source directly since the roundtrip is the identity.
    */
  private def s22_orc_roundtrip(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s22_orc")
    table(s, d, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .write
      .mode("overwrite")
      .orc(out)
    s.read
      .orc(out)
      .select(
        col("s_suppkey"),
        col("s_name"),
        round(col("s_acctbal") * 100, 0).cast("long").as("acctbal_cents")
      )
  }

  /** S23 — schema-evolution merge scan: two parquet batches written at
    * different pipeline epochs — the old schema (key, name) and the new
    * one with an added `p_retailprice` column — read back through ONE
    * `mergeSchema` scan that unions the schemas and nulls the column where
    * a file predates it. Schema drift across ingest epochs is a certainty
    * in a long-lived 100 TB lake; the merge-scan is the read-side
    * contract that additive evolution never breaks old files or loses new
    * columns. (Footer merging costs one pass over file metadata, not
    * data — why Spark gates it behind an option; a production lake pins
    * the merged schema in a catalog instead of re-deriving it per scan.)
    */
  private def s23_schema_merge(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s23_evolution")
    val part = table(s, d, "part")
    part
      .filter(col("p_partkey") % 2 === 0)
      .select(col("p_partkey"), col("p_name"))
      .write
      .mode("overwrite")
      .parquet(s"$out/epoch1")
    part
      .filter(col("p_partkey") % 2 === 1)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .write
      .mode("overwrite")
      .parquet(s"$out/epoch2")
    s.read
      .option("mergeSchema", "true")
      .parquet(s"$out/epoch1", s"$out/epoch2")
      .select(
        col("p_partkey"),
        col("p_name"),
        round(col("p_retailprice") * 100, 0).cast("long").as("price_cents")
      )
  }

  /** S4b — corrupt-record capture on a schema'd JSONL scan: every 7th line
    * of the written file is truncated mid-record, and the PERMISSIVE read
    * routes each bad line into `_corrupt_record` instead of failing the job
    * or silently dropping it. The single-row accounting (good count, bad
    * count, checksum over the good rows) is what a 100 TB ingest MUST
    * emit per batch: FAILFAST dies on one bad byte among billions, and
    * DROPMALFORMED loses rows without a trace — capture-and-count is the
    * only mode that scales operationally.
    */
  private def s4b_corrupt_capture(s: SparkSession, d: String): DataFrame = {
    val out = ioDir("s4b_jsonl")
    val lines = table(s, d, "documents")
      .select(
        col("doc_id"),
        to_json(struct(col("doc_id"), length(col("text")).as("text_len"))).as("line")
      )
      .select(
        when(col("doc_id") % 7 === 0, substring(col("line"), 1, 9)) // truncated mid-record
          .otherwise(col("line"))
          .as("value")
      )
    lines.write.mode("overwrite").text(out)
    val schema = StructType(
      Seq(
        StructField("doc_id", LongType),
        StructField("text_len", LongType),
        StructField("_corrupt_record", StringType)
      )
    )
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        count(col("_corrupt_record")).as("n_bad"),
        sum(when(col("_corrupt_record").isNull, col("text_len"))).as("good_len_sum")
      )
  }

  /** S5+U2 — Hive-partitioned write, then a multi-path union read of two
    * selected partitions (with basePath so the partition column survives).
    */
  private def u2_partition_union(s: SparkSession, d: String): DataFrame = {
    val base  = ioDir("u2")
    val asset = "orders_by_priority"
    val src = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    TableIO.writePartitioned(src, base, asset, "o_orderpriority")
    val wanted = Seq("1-URGENT", "2-HIGH")
    val paths =
      wanted.map(p => TableIO.partitionPath(base, asset, "o_orderpriority", Some(p)))
    TableIO
      .readPartitions(s, base, asset, paths)
      .groupBy(col("o_orderpriority").cast("string").as("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        // max, not sum: float sums depend on partition merge order, so a
        // rounded sum can flap at a rounding boundary between runs
        max(col("o_totalprice")).as("max_price")
      )
  }

  /** S13 — MusicBrainz release flatten (reference
    * utils/musicbrainz_helpers.py:158-225): `media[].tracks[].recording`
    * nested arrays-of-structs, flattened by a double explode. The nested
    * shape is synthesized from lineitem (media = per-order linestatus
    * groups, tracks = lines within each).
    */
  private def s13_track_flatten(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem").filter(col("l_orderkey") % 7 === 0)
    val nested = li
      .groupBy(col("l_orderkey"), col("l_linestatus"))
      .agg(
        sort_array(
          collect_list(
            struct(
              col("l_linenumber").as("position"),
              col("l_partkey").as("recording_id"),
              col("l_suppkey").as("artist_credit")
            )
          )
        ).as("tracks")
      )
      .groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(struct(col("l_linestatus").as("format"), col("tracks"))))
          .as("media")
      )
    nested
      .select(col("l_orderkey"), explode(col("media")).as("m"))
      .select(col("l_orderkey"), col("m.format").as("format"), explode(col("m.tracks")).as("t"))
      .select(
        col("l_orderkey"),
        col("format"),
        col("t.position").as("position"),
        col("t.recording_id").as("recording_id"),
        col("t.artist_credit").as("artist_credit")
      )
  }

  /** B1 — bucketed co-located join: both sides written bucketed on the join
    * key with matching bucket counts, so the join plans with ZERO shuffle
    * exchanges (each task reads matching bucket files from both sides) —
    * the pre-partitioning story for repeated joins at 100 TB: pay the
    * layout cost once at write time, skip the shuffle on every later join.
    */
  private def b1_bucketed_join(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("b1_buckets")
    s.sql("DROP TABLE IF EXISTS graft_orders_b")
    s.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    table(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").saveAsTable("graft_orders_b")
    table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").saveAsTable("graft_lineitem_b")
    // merge hint: at test scale Catalyst would broadcast the small side and
    // never touch the bucket layout; the hint forces the sort-merge path
    // that the bucketing exists for (zero Exchange on either join side)
    s.table("graft_lineitem_b")
      .hint("merge")
      .join(s.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty") // integral doubles: exact in fp64
      )
  }

  /** S25 — order-independent table digest: one 56-bit md5 per row over the
    * canonically-ordered, null-sentineled column values, SUMMED (addition
    * commutes, so partitioning/ordering can't change the digest) next to
    * the row count — the cheap cross-environment equality check a
    * migration runs on both sides before cutting over (the engine-level
    * form of this harness's own oracle hashing). Over `documents`: every
    * column is an exact type, so both engines render identical strings
    * (float columns would need quantization first — the standing
    * cross-engine float rule). 32-bit row hashes keep the ANSI long sum
    * overflow-free to ~2×10⁹ rows; beyond that, digest per shard and
    * compare shard-wise (the manifest form).
    *
    * Scale: one narrow scan + a scalar aggregate with map-side partial
    * sums; no shuffle wider than one row per partition.
    */
  private def s25_table_digest(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val rowStr = concat_ws(
      "|",
      docs.columns.sorted.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*
    )
    docs
      .select(conv(substring(md5(rowStr), 1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum("h").as("digest"))
  }

  /** S26 — zone-map manifest: per-partition (order year) min/max/count/NDV
    * stats — the footer statistics a 100 TB lakehouse layout keeps per file
    * so scans can SKIP whole partitions on a key or price predicate without
    * opening them (the engine-side half of the partition-pruning story m5
    * exercises from the read side).
    *
    * One narrow scan; min/max/count are map-side combinable so the only
    * full-width shuffle is the exact `countDistinct` — which at real scale
    * is the one column you'd swap for the HLL register sketch (x10/x13's
    * machinery) to make the whole manifest a single streaming pass. Price
    * is integer-quantized cents (the standing cross-engine float rule).
    */
  private def s26_zonemap_manifest(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .select(
        year(col("o_orderdate")).cast("long").as("part_year"),
        col("o_orderkey"),
        col("o_custkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS LONG)").as("price_c")
      )
      .groupBy("part_year")
      .agg(
        count(lit(1)).as("n_rows"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"),
        min("price_c").as("min_price_c"),
        max("price_c").as("max_price_c"),
        countDistinct(col("o_custkey")).as("ndv_cust")
      )

  /** S14+S15 — graph sink/source roundtrip: node+edge tables written as the
    * graph store, read back, summarized by type (the reference's node-count
    * reconciliation, ingest_graph_db.py:336-363).
    */
  private def s14_graph_roundtrip(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s14_graph")
    val nodes = table(s, d, "supplier")
      .select(concat(lit("s:"), col("s_suppkey")).as("node_id"), lit("Supplier").as("node_type"))
      .unionByName(
        table(s, d, "nation")
          .select(concat(lit("n:"), col("n_nationkey")).as("node_id"), lit("Nation").as("node_type"))
      )
    val edges = table(s, d, "supplier")
      .select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"),
        lit("FROM_NATION").as("rel")
      )
    TableIO.writeParquet(nodes, s"$base/nodes")
    TableIO.writeParquet(edges, s"$base/edges")
    val n = s.read.parquet(s"$base/nodes").groupBy(col("node_type").as("kind")).agg(count(lit(1)).as("n"))
    val e = s.read.parquet(s"$base/edges").groupBy(col("rel").as("kind")).agg(count(lit(1)).as("n"))
    n.unionByName(e)
  }

  /** S28 — manifest-PRUNED scan, the zone-map loop closed end-to-end: s26
    * computes footer stats as a result; this query USES them to skip
    * files. Events land day-partitioned (event_id arrives time-ordered, so
    * per-day [min,max] id ranges are disjoint — the clustering that makes
    * zone maps bite on a NON-partition column); the per-partition min/max
    * manifest is collected driver-side (≤ one row per partition — the
    * listing-scale metadata a lakehouse reads from footers for free; the
    * build pass here stands in for that), and the id-range predicate
    * [25%, 35%] of the max id is answered by reading ONLY the partitions
    * whose manifest interval intersects it. Scanned-but-empty partitions
    * stay visible with n_hits = 0 — the zone map's false-positive cost,
    * measured — alongside the scanned/total partition census.
    *
    * Scale: the pruning decision is O(|partitions|) driver metadata (the
    * same budget `TableIO.compact` spends); the data path reads only
    * matching directories, so scan cost tracks the predicate's
    * selectivity, not the table size — the point of keeping zone maps.
    */
  private def s28_manifest_pruned_scan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = ioDir("s28_events")
    table(s, d, "events")
      .select(
        col("event_id"),
        col("event_type"),
        expr("ts div 86400000000000").cast("long").as("day_n")
      )
      .write
      .mode("overwrite")
      .partitionBy("day_n")
      .parquet(base)
    val manifest = s.read
      .parquet(base)
      .groupBy(col("day_n").cast("long").as("day_n"))
      .agg(min("event_id").as("mn"), max("event_id").as("mx"))
      .collect()
    val maxId    = manifest.map(_.getAs[Long]("mx")).max
    val lo       = maxId * 25 / 100
    val hi       = maxId * 35 / 100
    val scanned  = manifest.collect {
      case r if r.getAs[Long]("mn") <= hi && r.getAs[Long]("mx") >= lo => r.getAs[Long]("day_n")
    }.sorted
    val nTotal   = manifest.length.toLong
    val nScanned = scanned.length.toLong
    val hits = s.read
      .option("basePath", base)
      .parquet(scanned.map(dayN => s"$base/day_n=$dayN"): _*)
      .filter(col("event_id").between(lo, hi))
      .groupBy(col("day_n").cast("long").as("day_n"))
      .agg(count(lit(1)).as("n_hits"))
    scanned.toSeq
      .toDF("day_n")
      .join(hits, Seq("day_n"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(
        col("day_n"),
        col("n_hits"),
        lit(nScanned).as("n_parts_scanned"),
        lit(nTotal).as("n_parts_total")
      )
  }

  /** B2 — bucket-PRUNED point lookup: the read-side payoff of b1's bucket
    * layout. A point predicate on the bucketing key hashes to exactly one
    * bucket, so the scan opens 1 of 8 bucket files instead of the table —
    * the O(table/buckets) point-lookup a bucketed layout buys without any
    * index structure (PlanShapeSpec pins `SelectedBucketsCount: 1 out of
    * 8` so a layout regression can't silently fall back to a full scan).
    * The probe key is the table's minimum order key — data-derived, so the
    * lookup hits at every scale factor.
    */
  private def b2_bucket_pruned_lookup(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("b2_buckets")
    s.sql("DROP TABLE IF EXISTS graft_orders_b2")
    table(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").saveAsTable("graft_orders_b2")
    val k = table(s, d, "orders").agg(min("o_orderkey")).head().getLong(0)
    // aggregate ON the bucketing key: the planner keeps the bucketed scan
    // (auto-bucketed-scan drops the layout — and with it the pruning —
    // when no operator consumes the bucket clustering), and the bucketing
    // satisfies the aggregation's distribution, so the plan has zero
    // Exchanges AND opens one bucket file
    s.table("graft_orders_b2")
      .filter(col("o_orderkey") === k)
      .groupBy(col("o_orderkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("o_custkey"),
        min(col("o_orderpriority")).as("o_orderpriority")
      )
  }

  /** S31 — DYNAMIC partition overwrite: the incremental re-process
    * semantics a partitioned lake table needs — re-running one stratum
    * must replace ONLY that stratum's partitions, never truncate the
    * table (static overwrite mode would). Full load partitioned by lang,
    * then the `en` slice re-lands with a ` v2` suffix under
    * `partitionOverwriteMode=dynamic`; the read-back census proves `en`
    * was replaced in place (every text carries the marker) and every
    * other language survived byte-for-byte from the first load. At 100 TB
    * this is the difference between rewriting one day/language directory
    * and rewriting the corpus.
    */
  private def s31_dynamic_partition_overwrite(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s31_docs")
    val docs = table(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(base)
    docs
      .filter(col("lang") === "en")
      .withColumn("text", concat(col("text"), lit(" v2")))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang")
      .parquet(base)
    s.read
      .parquet(base)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("sum_len"),
        sum(when(col("text").endsWith(" v2"), 1L).otherwise(0L)).as("n_v2")
      )
  }

  /** S32 — batch MERGE INTO census: the three-way lakehouse merge h2
    * (CDC compaction) and s31 (partition overwrite) don't cover — a keyed
    * source batch lands on a keyed snapshot and each batch row classifies
    * as INSERT (key absent), UPDATE (key present, values CHANGED — value
    * comparison is real, not assumed from the batch's intent), DELETE
    * (tombstone for a present key), or NOOP (values identical, or a
    * tombstone for an absent key). Survivors are exactly the rows with
    * `NOT coalesce(is_delete, FALSE)` after the full-outer join — batch
    * values win where the batch has the key — and the merged table lands
    * through [[graft.io.TableIO.writeParquet]]'s staged atomic swap OVER
    * the snapshot path, then is READ BACK for the post_table digest
    * (count + length sum + key checksum), so the output proves the swap
    * committed, not just that the plan was right. The batch is derived
    * deterministically from `documents` by doc_id mod 10 (0 → changed
    * text, 1 → tombstone, 2 → identical resend, 3 → insert at the
    * collision-proof −doc_id−1 key).
    *
    * Scale shape: ONE keyed full-outer join (both sides shuffle on the
    * key — the minimum a merge can do), per-action census as one hash
    * aggregate over the classification frame; no window, no driver loop.
    * At 100 TB the snapshot side would be bucketed on the key so the
    * merge co-locates; the census and digest are aggregate-only.
    */
  private def s32_merge_into(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s32_merge")
    val docs = table(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    graft.io.TableIO.writeParquet(docs, s"$base/t")
    val batch = docs
      .filter(col("doc_id") % 10 === 0)
      .select(
        col("doc_id"),
        col("lang").as("b_lang"),
        concat(col("text"), lit(" v2")).as("b_text"),
        lit(false).as("is_delete")
      )
      .unionByName(
        docs
          .filter(col("doc_id") % 10 === 1)
          .select(
            col("doc_id"),
            col("lang").as("b_lang"),
            lit(null).cast("string").as("b_text"),
            lit(true).as("is_delete")
          )
      )
      .unionByName(
        docs
          .filter(col("doc_id") % 10 === 2)
          .select(
            col("doc_id"),
            col("lang").as("b_lang"),
            col("text").as("b_text"),
            lit(false).as("is_delete")
          )
      )
      .unionByName(
        docs
          .filter(col("doc_id") % 10 === 3)
          .select(
            (-col("doc_id") - 1).as("doc_id"),
            col("lang").as("b_lang"),
            concat(lit("new "), col("text")).as("b_text"),
            lit(false).as("is_delete")
          )
      )
    val snap = s.read
      .parquet(s"$base/t")
      .select(
        col("doc_id"),
        col("lang").as("s_lang"),
        col("text").as("s_text"),
        lit(1).as("in_s")
      )
    // Materialized BEFORE the merge lands: the census below must read the
    // classification against the PRE-merge snapshot, and cls's lazy plan
    // reads the snapshot path the staged swap is about to replace.
    val cls = graft.Lineage.truncate(
      snap
        .join(batch.withColumn("in_b", lit(1)), Seq("doc_id"), "full_outer")
        .withColumn(
          "facet",
          when(col("in_b").isNull, "keep")
            .when(col("in_s").isNull && !col("is_delete"), "insert")
            .when(col("in_s").isNull, "noop")
            .when(col("is_delete"), "delete")
            .when(col("b_text") === col("s_text") && col("b_lang") === col("s_lang"), "noop")
            .otherwise("update")
        )
    )
    val merged = cls
      .filter(!coalesce(col("is_delete"), lit(false)))
      .select(
        col("doc_id"),
        when(col("in_b").isNotNull, col("b_lang")).otherwise(col("s_lang")).as("lang"),
        when(col("in_b").isNotNull, col("b_text")).otherwise(col("s_text")).as("text")
      )
    graft.io.TableIO.writeParquet(merged, s"$base/t")
    val census = cls
      .filter(col("in_b").isNotNull)
      .groupBy(col("facet"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(length(col("b_text"))), lit(0L)).cast("long").as("len_sum"),
        sum(col("doc_id")).cast("long").as("key_sum")
      )
    val post = s.read
      .parquet(s"$base/t")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(length(col("text"))).cast("long").as("len_sum"),
        sum(col("doc_id")).cast("long").as("key_sum")
      )
      .select(lit("post_table").as("facet"), col("n_rows"), col("len_sum"), col("key_sum"))
    census.unionByName(post)
  }

  /** S33 — per-partition BLOOM-FILTER data skipping (Bloom 1970; the
    * point-lookup complement to s26's zone maps — zone maps skip on
    * RANGES, Blooms skip on set membership, which is why every lakehouse
    * file format carries both: Parquet column Blooms, Delta/Iceberg file
    * stats): each `lang` partition publishes a 126-bit Bloom over its
    * DISTINCT words (k = 2 md5-salted positions; 126 bits = two 63-bit
    * long words, because a 64-bit shift of bit 63 overflows DuckDB's
    * BIGINT shift where Spark wraps — the engine-parity constraint picks
    * the filter geometry). A probe scans a partition only when BOTH its
    * bit positions are set.
    *
    * The probe set is 20 present words (first word of docs 0–19) and 20
    * structurally absent ones ('zzabsent·i'); per probe the census reads
    * n_true (partitions actually containing it), n_hit (partitions the
    * Bloom says to scan), n_fp = hit − true (the Bloom's only error
    * mode — n_hit ≥ n_true, NO false negatives, is structural and
    * Round15QueriesSpec pins it) and n_skipped (partitions a scan never
    * opens — the I/O the filter saves).
    *
    * Scale shape: the only corpus-sized work is the distinct (lang, word)
    * vocabulary aggregate; bit_or is map-side combinable, so each
    * partition's Bloom reduces locally to ONE row — the manifest a 100 TB
    * table keeps per file. Probing is probe-set × manifest rows against a
    * broadcast — the driver-side file-pruning step, never a data scan.
    *
    * The bit math lives in [[graft.operators.BloomOps]], shared with the
    * STREAMING manifest maintenance
    * ([[graft.streaming.StreamOps.bloomManifest]]): bit_or is a
    * semilattice join, so the incrementally-maintained manifest equals
    * this batch rebuild bit-for-bit (StreamOpsSpec pins it).
    */
  private def s33_bloom_skipping(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BloomOps
    val docs = table(s, d, "documents")
    val vocab = graft.Lineage.truncate(
      docs.select(col("lang"), explode(split(col("text"), " ")).as("w")).distinct()
    )
    val bits = vocab
      .select(col("lang"), expr(BloomOps.posExpr(1)).as("p"))
      .unionAll(vocab.select(col("lang"), expr(BloomOps.posExpr(2)).as("p")))
    val blooms = bits
      .groupBy(col("lang"))
      .agg(expr(BloomOps.orAgg(0)).as("bits0"), expr(BloomOps.orAgg(1)).as("bits1"))
    val probes = docs
      .filter(col("doc_id") < 20)
      .select(col("doc_id").as("probe_id"), split(col("text"), " ")(0).as("w"))
      .unionByName(
        s.range(20).select((-col("id") - 1000).as("probe_id"), concat(lit("zzabsent"), col("id")).as("w"))
      )
      .withColumn("p1", expr(BloomOps.posExpr(1)))
      .withColumn("p2", expr(BloomOps.posExpr(2)))
    val tested = probes
      .crossJoin(broadcast(blooms))
      .withColumn("hit", expr(s"CASE WHEN ${BloomOps.hitExpr} THEN 1L ELSE 0L END"))
      .join(
        vocab.select(col("lang"), col("w"), lit(1L).as("tru")),
        Seq("lang", "w"),
        "left"
      )
    tested
      .groupBy(col("probe_id"), col("w"))
      .agg(
        sum(coalesce(col("tru"), lit(0L))).as("n_true"),
        sum(col("hit")).as("n_hit"),
        count(lit(1)).as("n_parts")
      )
      .select(
        col("probe_id").cast("long").as("probe_id"),
        col("w").as("word"),
        col("n_true").cast("long").as("n_true"),
        col("n_hit").cast("long").as("n_hit"),
        (col("n_hit") - col("n_true")).cast("long").as("n_fp"),
        (col("n_parts") - col("n_hit")).cast("long").as("n_skipped")
      )
  }

  /** S34 — INCREMENTAL snapshot scan (the lakehouse CDC read: Iceberg's
    * incremental scan / Delta's table-version change feed, at s29's
    * generation granularity): a downstream pipeline that ran at
    * generation 1 consumes ONLY what generations (1, 3] committed —
    * [[graft.io.TableIO.readIncremental]] turns both bounds into
    * PARTITION filters, so the scan opens exactly the delta files and the
    * cost of catching up is O(delta), never O(table) (TableIOSpec pins
    * the pruned-partition claim; at 100 TB this is the difference between
    * an hourly downstream job and a nightly full rebuild).
    *
    * The generational fixture: gen 1 = every supplier, gen 2 re-writes
    * the mod-10 keys, gen 3 re-writes the mod-7 keys AND inserts brand-new
    * keys at −k−1 for the mod-5 stratum. The consumer's reconciliation —
    * keep-last WITHIN the delta (a mod-70 key appears in both gens, gen 3
    * wins), then insert-vs-update classification against the gen-1
    * snapshot KEYS — is one window over the delta plus one keyed left
    * join. Output: per-action key counts, raw delta row counts (CDC rows
    * ≠ keys — the multiplicity census), and the keep-last value sum the
    * downstream job would fold in.
    */
  private def s34_incremental_scan(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s34_supplier")
    val src = table(s, d, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), (col("s_suppkey") * 10).as("v"))
    TableIO.writeGeneration(src, base, 1)
    TableIO.writeGeneration(
      src.filter(col("s_suppkey") % 10 === 0).withColumn("v", col("s_suppkey") * 10 + 1),
      base,
      2
    )
    TableIO.writeGeneration(
      src
        .filter(col("s_suppkey") % 7 === 0)
        .withColumn("v", col("s_suppkey") * 10 + 2)
        .unionByName(
          src
            .filter(col("s_suppkey") % 5 === 0)
            .select(
              (-col("s_suppkey") - 1).as("s_suppkey"),
              col("s_nationkey"),
              (col("s_suppkey") * 10 + 3).as("v")
            )
        ),
      base,
      3
    )
    val delta = TableIO.readIncremental(s, base, fromExclusive = 1, toInclusive = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_suppkey"))
      .orderBy(col("gen").desc)
    val snap1Keys = TableIO
      .readSnapshot(s, base, asOf = 1)
      .select(col("s_suppkey"))
      .distinct()
      .withColumn("existed", lit(1L))
    delta
      .withColumn("rn", row_number().over(w))
      .join(snap1Keys, Seq("s_suppkey"), "left")
      .withColumn("action", when(col("existed").isNotNull, lit("update")).otherwise(lit("insert")))
      .groupBy(col("action"))
      .agg(
        countDistinct(col("s_suppkey")).as("n_keys"),
        count(lit(1)).as("n_rows_scanned"),
        sum(when(col("rn") === 1, col("v")).otherwise(lit(0L))).as("sum_v_latest")
      )
      .select(
        col("action"),
        col("n_keys").cast("long").as("n_keys"),
        col("n_rows_scanned").cast("long").as("n_rows_scanned"),
        col("sum_v_latest").cast("long").as("sum_v_latest")
      )
  }

  /** S36 — SCHEMA EVOLUTION through the generation path (the two
    * always-safe lakehouse evolutions, Iceberg/Delta's rule: ADD a
    * column, WIDEN a primitive): generation 1 lands `documents` on the
    * original narrow schema with an INT doc_id; generation 2 lands a
    * refresh with doc_id WIDENED to long, the text revised, and a new
    * `quality` column the old generation never carried. The union comes
    * back through [[graft.io.TableIO.readSnapshotEvolved]] — per-
    * generation file schemas, explicit widest-type casts (parquet
    * `mergeSchema` refuses int-vs-long, so widening must be a cast), and
    * `unionByName(allowMissingColumns)` backfilling nulls — and the query
    * CENSUSES the nulls-for-old-rows per generation instead of hiding
    * them: (gen, rows, null_quality, Σ doc_id, Σ quality, Σ text length),
    * each column exercising a different leg of the evolution (widened
    * key, added column, revised payload). The oracle reconstructs the
    * same census from the source table's two logical generations, so a
    * green row proves the write→evolve→read path preserved VALUES, not
    * just that a schema merged. TableIOSpec pins the read-side contracts:
    * as-of-1 never lists gen 2 (no `quality` column, doc_id still int),
    * and an incompatible evolution (string vs long) throws rather than
    * coercing.
    *
    * Scale: per-generation reads stay partition-scoped (directory-level
    * as-of pruning — a snapshot never opens a newer footer); the census
    * is one hash aggregate keyed by generation. At 100 TB, add+widen
    * evolutions land as metadata; this path prices the read-side
    * reconciliation they imply.
    */
  private def s36_schema_evolution(s: SparkSession, d: String): DataFrame = {
    val base = ioDir("s36_docs")
    val docs = table(s, d, "documents")
    TableIO.writeGeneration(
      docs.select(col("doc_id").cast("int").as("doc_id"), col("lang"), col("text")),
      base,
      1
    )
    TableIO.writeGeneration(
      docs
        .filter(col("doc_id") % 3 === 0)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("lang"),
          concat(col("text"), lit(" v2")).as("text"),
          length(col("text")).cast("long").as("quality")
        ),
      base,
      2
    )
    TableIO
      .readSnapshotEvolved(s, base, asOf = 2)
      .groupBy(col("gen"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("quality").isNull, 1L).otherwise(0L)).as("null_quality"),
        sum(col("doc_id")).as("sum_doc_id"),
        sum(coalesce(col("quality"), lit(0L))).as("sum_quality"),
        sum(length(col("text"))).as("sum_text_len")
      )
      .select(
        col("gen").cast("long").as("gen"),
        col("n_rows").cast("long").as("n_rows"),
        col("null_quality").cast("long").as("null_quality"),
        col("sum_doc_id").cast("long").as("sum_doc_id"),
        col("sum_quality").cast("long").as("sum_quality"),
        col("sum_text_len").cast("long").as("sum_text_len")
      )
  }

  /** S35 — COUNTING-Bloom delete maintenance (Fan–Cao–Almeida–Broder 2000
    * "Summary Cache", the counting filter that made Bloom summaries
    * deletable): s33's Bloom and its streaming face are MONOTONE — bits
    * only turn on — so after a retention purge (GDPR delete, license
    * takedown) the skipping manifest keeps steering scans into partitions
    * that no longer contain the key, forever. The counting variant keeps
    * a per-cell insert COUNT instead of a bit; a key whose last document
    * leaves decrements its cells, and membership (all k cells > 0) goes
    * false — the filter forgets.
    *
    * Set semantics done right: cells count DISTINCT (lang, word) inserts,
    * and the delete set is the purged docs' vocabulary ANTI-JOINED against
    * the surviving corpus — a counting filter only deletes a key whose
    * LAST holder left (decrementing a still-present key corrupts the
    * summary; the anti-join is the discipline, same shape as s7's
    * fetch-missing). The purge fixture is c26's junk generator at −id−1
    * (ids < 20): 320 hex words unique to the purged docs by construction.
    *
    * Output per probe (20 purged-doc words + 20 surviving natural words):
    * membership before and after the purge, the residual min cell count,
    * and stale_fp = present-before ∧ absent-after — exactly the rows a
    * monotone Bloom would keep claiming forever (spec pins: every natural
    * probe survives, no purged probe's absence is missed — residual
    * positives are honest cell collisions, censused not hidden).
    *
    * Scale shape: distinct-(lang, word) vocab aggregate + two ≤
    * |langs|·126-cell count aggregates (map-side combinable sums) + the
    * vocab-keyed anti-join; probing joins the bounded cell table. Deletes
    * are O(purged vocabulary), never a rebuild — the incremental-manifest
    * property that matters when purges are daily and the table is 100 TB.
    */
  private def s35_counting_bloom(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BloomOps
    def junk(c: org.apache.spark.sql.Column) =
      array_join(
        transform(sequence(lit(0), lit(15)), i => md5(concat(c, i.cast("string")))),
        " "
      )
    val docs = table(s, d, "documents")
    val planted = docs
      .filter(col("doc_id") < 20)
      .select((-col("doc_id") - 1).as("doc_id"), col("lang"), junk(col("text")).as("text"))
    def vocabOf(df: DataFrame): DataFrame =
      df.select(col("lang"), explode(split(col("text"), " ")).as("w")).distinct()
    val natVocab  = graft.Lineage.truncate(vocabOf(docs))
    val plantedVocab = vocabOf(planted)
    val allVocab  = natVocab.unionByName(plantedVocab).distinct()
    // the delete set: purged-doc words whose LAST holder left
    val delVocab = plantedVocab.join(natVocab, Seq("lang", "w"), "left_anti")
    def cells(v: DataFrame): DataFrame =
      v.select(col("lang"), expr(BloomOps.posExpr(1)).as("p"))
        .unionAll(v.select(col("lang"), expr(BloomOps.posExpr(2)).as("p")))
    val before = cells(allVocab).groupBy(col("lang"), col("p")).agg(count(lit(1)).as("cb"))
    val dels   = cells(delVocab).groupBy(col("lang"), col("p")).agg(count(lit(1)).as("cd"))
    val counts = graft.Lineage.truncate(
      before
        .join(dels, Seq("lang", "p"), "left")
        .select(
          col("lang"),
          col("p"),
          col("cb"),
          (col("cb") - coalesce(col("cd"), lit(0L))).as("ca")
        )
    )
    val probes = docs
      .filter(col("doc_id") < 20)
      .select(col("doc_id").as("probe_id"), col("lang"), split(col("text"), " ")(0).as("w"))
      .unionByName(
        planted.select(col("doc_id").as("probe_id"), col("lang"), split(col("text"), " ")(0).as("w"))
      )
      .withColumn("p1", expr(BloomOps.posExpr(1)))
      .withColumn("p2", expr(BloomOps.posExpr(2)))
    probes
      .join(
        counts.select(col("lang"), col("p").as("p1"), col("cb").as("b1"), col("ca").as("a1")),
        Seq("lang", "p1"),
        "left"
      )
      .join(
        counts.select(col("lang"), col("p").as("p2"), col("cb").as("b2"), col("ca").as("a2")),
        Seq("lang", "p2"),
        "left"
      )
      .select(
        col("probe_id").cast("long").as("probe_id"),
        col("w").as("word"),
        when(coalesce(col("b1"), lit(0L)) > 0 && coalesce(col("b2"), lit(0L)) > 0, 1L)
          .otherwise(0L)
          .as("present_before"),
        when(coalesce(col("a1"), lit(0L)) > 0 && coalesce(col("a2"), lit(0L)) > 0, 1L)
          .otherwise(0L)
          .as("present_after"),
        least(coalesce(col("a1"), lit(0L)), coalesce(col("a2"), lit(0L))).as("min_count_after"),
        when(
          coalesce(col("b1"), lit(0L)) > 0 && coalesce(col("b2"), lit(0L)) > 0 &&
            !(coalesce(col("a1"), lit(0L)) > 0 && coalesce(col("a2"), lit(0L)) > 0),
          1L
        ).otherwise(0L).as("stale_fp")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s36_schema_evolution" -> (s36_schema_evolution _),
    "s35_counting_bloom" -> (s35_counting_bloom _),
    "s34_incremental_scan" -> (s34_incremental_scan _),
    "s33_bloom_skipping" -> (s33_bloom_skipping _),
    "s32_merge_into" -> (s32_merge_into _),
    "s31_dynamic_partition_overwrite" -> (s31_dynamic_partition_overwrite _),
    "s28_manifest_pruned_scan" -> (s28_manifest_pruned_scan _),
    "b2_bucket_pruned_lookup" -> (b2_bucket_pruned_lookup _),
    "s1_parquet_roundtrip" -> (s1_parquet_roundtrip _),
    "s29_time_travel" -> (s29_time_travel _),
    "s22_orc_roundtrip" -> (s22_orc_roundtrip _),
    "s23_schema_merge" -> (s23_schema_merge _),
    "s3_jsonl_roundtrip" -> (s3_jsonl_roundtrip _),
    "s4b_corrupt_capture" -> (s4b_corrupt_capture _),
    "s21_csv_roundtrip" -> (s21_csv_roundtrip _),
    "s13_track_flatten" -> (s13_track_flatten _),
    "s14_graph_roundtrip" -> (s14_graph_roundtrip _),
    "s25_table_digest" -> (s25_table_digest _),
    "s26_zonemap_manifest" -> (s26_zonemap_manifest _),
    "b1_bucketed_join" -> (b1_bucketed_join _),
    "u2_partition_union" -> (u2_partition_union _)
  )

  val oracles: Map[String, String] = Map(
    "s36_schema_evolution" ->
      """WITH g1 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(NULL AS BIGINT) AS quality,
                  CAST(length(text) AS BIGINT) AS tl, 1 AS gen
           FROM documents),
         g2 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(length(text) AS BIGINT) AS quality,
                  CAST(length(text) + 3 AS BIGINT) AS tl, 2 AS gen
           FROM documents WHERE doc_id % 3 = 0),
         u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
         SELECT CAST(gen AS BIGINT) AS gen,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS null_quality,
                CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                CAST(sum(coalesce(quality, 0)) AS BIGINT) AS sum_quality,
                CAST(sum(tl) AS BIGINT) AS sum_text_len
         FROM u GROUP BY 1""",
    "s35_counting_bloom" ->
      """WITH jt AS (
           SELECT -doc_id - 1 AS doc_id, lang,
                  array_to_string(list_transform(generate_series(0, 15),
                    i -> md5(text || CAST(i AS VARCHAR))), ' ') AS text
           FROM documents WHERE doc_id < 20),
         natv AS (SELECT DISTINCT lang, w FROM (
                    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)),
         plv AS (SELECT DISTINCT lang, w FROM (
                   SELECT lang, unnest(string_split(text, ' ')) AS w FROM jt)),
         allv AS (SELECT lang, w FROM natv UNION SELECT lang, w FROM plv),
         delv AS (SELECT lang, w FROM plv EXCEPT SELECT lang, w FROM natv),
         cb AS (SELECT lang, p, count(*) AS cb FROM (
                  SELECT lang, ('0x' || substr(md5(w || '#1'), 1, 6))::BIGINT % 126 AS p FROM allv
                  UNION ALL
                  SELECT lang, ('0x' || substr(md5(w || '#2'), 1, 6))::BIGINT % 126 FROM allv)
                GROUP BY 1, 2),
         cd AS (SELECT lang, p, count(*) AS cd FROM (
                  SELECT lang, ('0x' || substr(md5(w || '#1'), 1, 6))::BIGINT % 126 AS p FROM delv
                  UNION ALL
                  SELECT lang, ('0x' || substr(md5(w || '#2'), 1, 6))::BIGINT % 126 FROM delv)
                GROUP BY 1, 2),
         ct AS (SELECT lang, p, cb.cb AS cb, cb.cb - coalesce(cd.cd, 0) AS ca
                FROM cb LEFT JOIN cd USING (lang, p)),
         pr AS (SELECT doc_id AS probe_id, lang, string_split(text, ' ')[1] AS w
                FROM documents WHERE doc_id < 20
                UNION ALL
                SELECT doc_id, lang, string_split(text, ' ')[1] FROM jt),
         pp AS (SELECT probe_id, lang, w,
                       ('0x' || substr(md5(w || '#1'), 1, 6))::BIGINT % 126 AS p1,
                       ('0x' || substr(md5(w || '#2'), 1, 6))::BIGINT % 126 AS p2
                FROM pr)
         SELECT CAST(probe_id AS BIGINT) AS probe_id, w AS word,
                CAST(CASE WHEN coalesce(c1.cb, 0) > 0 AND coalesce(c2.cb, 0) > 0
                          THEN 1 ELSE 0 END AS BIGINT) AS present_before,
                CAST(CASE WHEN coalesce(c1.ca, 0) > 0 AND coalesce(c2.ca, 0) > 0
                          THEN 1 ELSE 0 END AS BIGINT) AS present_after,
                CAST(least(coalesce(c1.ca, 0), coalesce(c2.ca, 0)) AS BIGINT) AS min_count_after,
                CAST(CASE WHEN coalesce(c1.cb, 0) > 0 AND coalesce(c2.cb, 0) > 0
                           AND NOT (coalesce(c1.ca, 0) > 0 AND coalesce(c2.ca, 0) > 0)
                          THEN 1 ELSE 0 END AS BIGINT) AS stale_fp
         FROM pp
         LEFT JOIN ct c1 ON c1.lang = pp.lang AND c1.p = pp.p1
         LEFT JOIN ct c2 ON c2.lang = pp.lang AND c2.p = pp.p2""",
    // closed-form reconstruction of the generational fixture: updates are
    // the mod-10 ∪ mod-7 keys (gen 3 wins where both wrote), inserts the
    // planted −k−1 keys from the mod-5 stratum
    "s34_incremental_scan" ->
      """WITH upd AS (
           SELECT s_suppkey AS k,
                  CASE WHEN s_suppkey % 7 = 0 THEN s_suppkey * 10 + 2
                       ELSE s_suppkey * 10 + 1 END AS v_latest,
                  (CASE WHEN s_suppkey % 10 = 0 THEN 1 ELSE 0 END) +
                  (CASE WHEN s_suppkey % 7 = 0 THEN 1 ELSE 0 END) AS n_rows
           FROM supplier WHERE s_suppkey % 10 = 0 OR s_suppkey % 7 = 0),
         ins AS (
           SELECT -s_suppkey - 1 AS k, s_suppkey * 10 + 3 AS v_latest, 1 AS n_rows
           FROM supplier WHERE s_suppkey % 5 = 0)
         SELECT 'update' AS action, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n_rows) AS BIGINT) AS n_rows_scanned,
                CAST(sum(v_latest) AS BIGINT) AS sum_v_latest
         FROM upd
         UNION ALL
         SELECT 'insert', CAST(count(*) AS BIGINT),
                CAST(sum(n_rows) AS BIGINT),
                CAST(sum(v_latest) AS BIGINT)
         FROM ins""",
    "s33_bloom_skipping" ->
      """WITH vocab AS (
           SELECT DISTINCT lang, w FROM (
             SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)),
         vp AS (
           SELECT lang, ('0x' || substr(md5(w || '#1'), 1, 6))::BIGINT % 126 AS p FROM vocab
           UNION ALL
           SELECT lang, ('0x' || substr(md5(w || '#2'), 1, 6))::BIGINT % 126 AS p FROM vocab),
         bl AS (
           SELECT lang,
                  bit_or(CASE WHEN p // 63 = 0 THEN 1::BIGINT << CAST(p % 63 AS INT) ELSE 0 END) AS bits0,
                  bit_or(CASE WHEN p // 63 = 1 THEN 1::BIGINT << CAST(p % 63 AS INT) ELSE 0 END) AS bits1
           FROM vp GROUP BY 1),
         pr AS (
           SELECT doc_id AS probe_id, string_split(text, ' ')[1] AS w
           FROM documents WHERE doc_id < 20
           UNION ALL
           SELECT -i - 1000, 'zzabsent' || CAST(i AS VARCHAR)
           FROM (SELECT unnest(generate_series(0, 19)) AS i)),
         pp AS (
           SELECT probe_id, w,
                  ('0x' || substr(md5(w || '#1'), 1, 6))::BIGINT % 126 AS p1,
                  ('0x' || substr(md5(w || '#2'), 1, 6))::BIGINT % 126 AS p2
           FROM pr),
         hits AS (
           SELECT probe_id, pp.w,
                  CASE WHEN ((CASE WHEN p1 // 63 = 0 THEN bits0 >> CAST(p1 % 63 AS INT)
                                   ELSE bits1 >> CAST(p1 % 63 AS INT) END) & 1) = 1
                        AND ((CASE WHEN p2 // 63 = 0 THEN bits0 >> CAST(p2 % 63 AS INT)
                                   ELSE bits1 >> CAST(p2 % 63 AS INT) END) & 1) = 1
                       THEN 1 ELSE 0 END AS hit,
                  CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END AS tru
           FROM pp CROSS JOIN bl
           LEFT JOIN vocab v ON v.lang = bl.lang AND v.w = pp.w)
         SELECT CAST(probe_id AS BIGINT) AS probe_id, w AS word,
                CAST(sum(tru) AS BIGINT) AS n_true,
                CAST(sum(hit) AS BIGINT) AS n_hit,
                CAST(sum(hit) - sum(tru) AS BIGINT) AS n_fp,
                CAST(count(*) - sum(hit) AS BIGINT) AS n_skipped
         FROM hits GROUP BY 1, 2""",
    // the full-outer reconstruction of the merge: batch from documents by
    // doc_id mod 10, classification and survivors exactly as the engine
    "s32_merge_into" ->
      """WITH docs AS (SELECT doc_id, lang, text FROM documents),
         batch AS (
           SELECT doc_id, lang AS b_lang, text || ' v2' AS b_text,
                  FALSE AS is_delete FROM docs WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id, lang, NULL, TRUE FROM docs WHERE doc_id % 10 = 1
           UNION ALL
           SELECT doc_id, lang, text, FALSE FROM docs WHERE doc_id % 10 = 2
           UNION ALL
           SELECT -doc_id - 1, lang, 'new ' || text, FALSE
           FROM docs WHERE doc_id % 10 = 3),
         j AS (
           SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
                  s.lang AS s_lang, s.text AS s_text,
                  b.b_lang, b.b_text, b.is_delete,
                  s.doc_id IS NOT NULL AS in_s,
                  b.doc_id IS NOT NULL AS in_b
           FROM docs s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id),
         cls AS (
           SELECT *, CASE WHEN NOT in_b THEN 'keep'
                          WHEN NOT in_s AND NOT is_delete THEN 'insert'
                          WHEN NOT in_s THEN 'noop'
                          WHEN is_delete THEN 'delete'
                          WHEN b_text = s_text AND b_lang = s_lang THEN 'noop'
                          ELSE 'update' END AS facet
           FROM j),
         census AS (
           SELECT facet, CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(coalesce(sum(length(b_text)), 0) AS BIGINT) AS len_sum,
                  CAST(sum(doc_id) AS BIGINT) AS key_sum
           FROM cls WHERE in_b GROUP BY 1),
         post AS (
           SELECT 'post_table' AS facet, CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(length(CASE WHEN in_b THEN b_text ELSE s_text END))
                       AS BIGINT) AS len_sum,
                  CAST(sum(doc_id) AS BIGINT) AS key_sum
           FROM cls WHERE NOT coalesce(is_delete, FALSE))
         SELECT * FROM census UNION ALL SELECT * FROM post""",
    // final state = non-en originals + en with the 3-char " v2" suffix
    "s31_dynamic_partition_overwrite" ->
      """SELECT lang,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(length(text) + CASE WHEN lang = 'en' THEN 3 ELSE 0 END)
                     AS BIGINT) AS sum_len,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_v2
         FROM documents GROUP BY 1""",
    "b2_bucket_pruned_lookup" ->
      """SELECT o_orderkey,
                CAST(count(*) AS BIGINT) AS n_rows,
                min(o_custkey) AS o_custkey,
                min(o_orderpriority) AS o_orderpriority
         FROM orders
         WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)
         GROUP BY 1""",
    "s28_manifest_pruned_scan" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) // 86400000000 AS day_n FROM events),
         mf AS (SELECT day_n, min(event_id) AS mn, max(event_id) AS mx FROM e GROUP BY 1),
         m AS (SELECT max(mx) AS m FROM mf),
         b AS (SELECT m * 25 // 100 AS lo, m * 35 // 100 AS hi FROM m),
         sc AS (SELECT day_n FROM mf, b WHERE mn <= hi AND mx >= lo),
         ns AS (SELECT count(*) AS n_parts_scanned FROM sc),
         tot AS (SELECT count(*) AS n_parts_total FROM mf),
         h AS (SELECT e.day_n,
                      sum(CASE WHEN e.event_id BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END) AS n_hits
               FROM e JOIN sc USING (day_n), b
               GROUP BY 1)
         SELECT CAST(h.day_n AS BIGINT) AS day_n,
                CAST(n_hits AS BIGINT) AS n_hits,
                CAST(n_parts_scanned AS BIGINT) AS n_parts_scanned,
                CAST(n_parts_total AS BIGINT) AS n_parts_total
         FROM h, ns, tot""",
    "s26_zonemap_manifest" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS part_year,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(min(o_orderkey) AS BIGINT) AS min_key,
                CAST(max(o_orderkey) AS BIGINT) AS max_key,
                CAST(min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS min_price_c,
                CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS max_price_c,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_cust
         FROM orders GROUP BY 1""",
    "s25_table_digest" ->
      """WITH h AS (SELECT ('0x' || substr(md5(
              coalesce(CAST(doc_id AS VARCHAR), chr(0)) || '|' ||
              coalesce(lang, chr(0)) || '|' ||
              coalesce(CAST(n_chars AS VARCHAR), chr(0)) || '|' ||
              coalesce(source, chr(0)) || '|' ||
              coalesce(text, chr(0))), 1, 8))::BIGINT AS h
         FROM documents)
         SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(h) AS BIGINT) AS digest FROM h""",
    "s1_parquet_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    // s29: the as-of-2 state is a closed-form function of the source keys
    // (gen 2 overrode every 10th key; gen 3 is beyond the as-of point)
    "s29_time_travel" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
                CAST(sum(CASE WHEN s_suppkey % 10 = 0 THEN s_suppkey * 10 + 1
                              ELSE s_suppkey * 10 END) AS BIGINT) AS sum_v
         FROM supplier GROUP BY 1""",
    "s3_jsonl_roundtrip" ->
      """SELECT c_custkey, c_name,
                CASE WHEN c_custkey % 2 = 0
                     THEN 'seg' || CAST(c_nationkey AS VARCHAR) END AS segment
         FROM customer""",
    // s21: the roundtrip is the identity, so the oracle derives from source
    // s22: the roundtrip is the identity, so the oracle derives from source
    "s22_orc_roundtrip" ->
      """SELECT s_suppkey, s_name,
                CAST(round(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
         FROM supplier""",
    // s23: old-epoch files (even keys) predate the price column, so the
    // merged scan yields NULL there — derivable in closed form from source
    "s23_schema_merge" ->
      """SELECT p_partkey, p_name,
                CASE WHEN p_partkey % 2 = 1
                     THEN CAST(round(p_retailprice * 100, 0) AS BIGINT)
                END AS price_cents
         FROM part""",
    "s21_csv_roundtrip" ->
      """SELECT p_partkey,
                p_name || ', "q"' AS tricky_name,
                CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents
         FROM part""",
    // s4b: the corrupt set is doc_id % 7 = 0 by construction, so the
    // accounting derives in closed form from the source table
    "s4b_corrupt_capture" ->
      """SELECT CAST(count(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS BIGINT) AS n_good,
                CAST(count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_bad,
                CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN length(text) END) AS BIGINT)
                  AS good_len_sum
         FROM documents""",
    "s13_track_flatten" ->
      """SELECT l_orderkey, l_linestatus AS format,
                l_linenumber AS position, l_partkey AS recording_id,
                l_suppkey AS artist_credit
         FROM lineitem WHERE l_orderkey % 7 = 0""",
    "b1_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
                sum(l_quantity) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "s14_graph_roundtrip" ->
      """SELECT 'Supplier' AS kind, CAST(count(*) AS BIGINT) AS n FROM supplier
         UNION ALL
         SELECT 'Nation', CAST(count(*) AS BIGINT) FROM nation
         UNION ALL
         SELECT 'FROM_NATION', CAST(count(*) AS BIGINT) FROM supplier""",
    "u2_partition_union" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                max(o_totalprice) AS max_price
         FROM orders
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY o_orderpriority"""
  )
}
