package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, Session}

/** Structured Streaming tests: the shared windowed transform running as a
  * real stream from a MemoryStream source, and the stateful sessionizer
  * carrying an open session across micro-batches.
  */
class StreamOpsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("windowTopK: append mode emits only watermark-completed windows; rank = batch face") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in     = MemoryStream[(Timestamp, String, Double)]
    val counts = StreamOps.windowTypeCounts(in.toDF().toDF("t", "event_type", "value"), "1 hour")
    val q = counts.writeStream
      .format("memory")
      .queryName("wtk")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def at(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // hour-10 window: click×3, view×2, error×1 (top-2 = click, view)
      in.addData(
        (at(10, 1), "click", 1.0), (at(10, 2), "click", 1.0), (at(10, 3), "click", 1.0),
        (at(10, 4), "view", 1.0), (at(10, 5), "view", 1.0), (at(10, 6), "error", 1.0)
      )
      q.processAllAvailable()
      // watermark hasn't passed 11:00 — nothing is final, nothing emitted
      assert(spark.table("wtk").count() == 0)
      // an event at 13:00 pushes the watermark to 12:00 > the window end
      in.addData((at(13, 0), "click", 1.0))
      q.processAllAvailable()
      val completed = spark.table("wtk")
      assert(completed.count() == 3) // the hour-10 window's three type rows
      val got = StreamOps
        .topKPerWindow(completed, 2)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch face over the SAME events, restricted to the completed window
      val batch = StreamOps.windowTypeCounts(
        Seq(
          (at(10, 1), "click", 1.0), (at(10, 2), "click", 1.0), (at(10, 3), "click", 1.0),
          (at(10, 4), "view", 1.0), (at(10, 5), "view", 1.0), (at(10, 6), "error", 1.0),
          (at(13, 0), "click", 1.0)
        ).toDF("t", "event_type", "value"),
        "1 hour"
      )
      val wstart = completed.select("wstart_s").head().getLong(0)
      val want = StreamOps
        .topKPerWindow(batch.filter(col("wstart_s") === wstart), 2)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want)
      assert(got.map(t => (t._2, t._4)) == Set(("click", 1L), ("view", 2L)))
    } finally q.stop()
  }

  test("topKPerWindow: bounded buffer survives many types and breaks ties by name") {
    import spark.implicits._
    // 100 types in one window with counts 1..100 plus a tie at the top
    val counts = ((1 to 100).map(i => (1000L, f"t$i%03d", i.toLong)) :+ (1000L, "t000", 100L))
      .toDF("wstart_s", "event_type", "n")
    val got = StreamOps
      .topKPerWindow(counts, 3)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sortBy(_._3)
    // tie at n=100: t000 before t100 (name asc); then t099
    assert(got == Seq(("t000", 100L, 1L), ("t100", 100L, 2L), ("t099", 99L, 3L)))
  }

  test("windowedCounts aggregates a stream by event-time day windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val counts = StreamOps.windowedCounts(
      in.toDF().toDF("t", "event_type", "value")
    )
    val q = counts.writeStream
      .format("memory")
      .queryName("wc")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      in.addData((ts(1, 1), "click", 1.0), (ts(1, 2), "click", 2.0), (ts(2, 1), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows == Set(("2024-01-01", "click", 2L, 300L), ("2024-01-02", "view", 1L, 500L)))

      in.addData((ts(1, 5), "click", 4.0)) // same day-1 window, second batch
      q.processAllAvailable()
      val updated = spark.table("wc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(updated.contains(("2024-01-01", "click", 3L, 700L)))
    } finally q.stop()
  }

  test("bloomManifest: running OR-merge is monotone across batches and equals the batch Bloom") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamOps
      .bloomManifest(in.toDF().toDF("lang", "text"))
      .writeStream
      .format("memory")
      .queryName("bloom_manifest")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      def snap(): Map[String, (Long, Long)] =
        spark
          .table("bloom_manifest")
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      val b1 = Seq("en" -> "alpha beta gamma", "de" -> "delta epsilon")
      val b2 = Seq("en" -> "beta zeta", "de" -> "eta theta iota", "fr" -> "kappa")
      in.addData(b1: _*)
      q.processAllAvailable()
      val s1 = snap()
      assert(s1.keySet == Set("en", "de"))
      in.addData(b2: _*)
      q.processAllAvailable()
      val s2 = snap()
      assert(s2.keySet == Set("en", "de", "fr"))
      // monotone: every batch-1 bit survives batch 2 (bits only turn on)
      s1.foreach { case (lang, (b0, b1bits)) =>
        assert((s2(lang)._1 & b0) == b0, s"$lang lost a bits0 bit across batches")
        assert((s2(lang)._2 & b1bits) == b1bits, s"$lang lost a bits1 bit across batches")
      }
      // stream == batch: the incrementally-maintained manifest equals a
      // batch rebuild over the union of all rows (the semilattice claim)
      val batch = StreamOps
        .bloomManifest((b1 ++ b2).toDF("lang", "text"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(batch == s2, "incremental manifest diverged from the batch rebuild")
      // no false negatives: every ingested word tests positive in its lang
      import graft.operators.BloomOps
      val allWords = (b1 ++ b2).flatMap { case (l, t) => t.split(" ").map(l -> _) }
      val probe = allWords
        .toDF("lang", "w")
        .withColumn("p1", org.apache.spark.sql.functions.expr(BloomOps.posExpr(1)))
        .withColumn("p2", org.apache.spark.sql.functions.expr(BloomOps.posExpr(2)))
        .join(spark.table("bloom_manifest"), "lang")
        .withColumn("hit", org.apache.spark.sql.functions.expr(s"CASE WHEN ${BloomOps.hitExpr} THEN 1L ELSE 0L END"))
        .collect()
      assert(probe.nonEmpty && probe.forall(_.getAs[Long]("hit") == 1L))
    } finally q.stop()
  }

  test("slidingCounts lands every event in exactly two overlapping windows, stream = batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10-min windows sliding by 5: an event at :07 belongs to [:00,:10)
    // and [:05,:15) — counted twice, once per window.
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:07:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:12:00"), "click", 2.0)
    )
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
    val want = StreamOps
      .slidingCounts(events.toDF("t", "event_type", "value"))
      .collect()
      .map(key)
      .toSet
    // :07 → starts 10:00 & 10:05; :12 → starts 10:05 & 10:10; the shared
    // 10:05 window holds both events
    val s0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(
      want == Set(
        (s0, "click", 1L, 100L),
        (s0 + 300, "click", 2L, 300L),
        (s0 + 600, "click", 1L, 200L)
      )
    )
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps
      .slidingCounts(in.toDF().toDF("t", "event_type", "value"))
      .writeStream
      .format("memory")
      .queryName("slide")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("slide").collect().map(key).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("windowedCounts also runs the identical transform in batch") {
    import spark.implicits._
    val batch = Seq(
      (ts(1, 1), "click", 1.0),
      (ts(1, 2), "click", 2.0)
    ).toDF("t", "event_type", "value")
    val got = StreamOps.windowedCounts(batch).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("2024-01-01", "click", 2L, 300L)))
  }

  test("Sessionizer emits closed sessions and carries open state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000000
    val base   = 100 * hourUs // away from epoch 0 = the initial watermark
    val in     = MemoryStream[Event]
    val q = StreamOps.Sessionizer(in.toDS(), gapUs = hourUs).writeStream
      .format("memory")
      .queryName("sess")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events 10 minutes apart — one OPEN session, nothing emitted
      in.addData(Event(7L, base), Event(7L, base + 600L * 1000000))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0)

      // batch 2: an event 5 hours later closes the session (2 events, 600s)
      in.addData(Event(7L, base + 5 * hourUs))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect().toSeq
      assert(sessions == Seq(Session(7L, 2L, 600L * 1000000)))
    } finally q.stop()
  }

  test("gateAndQuarantine routes every row exactly once and agrees with the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in   = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val q = StreamOps.gateAndQuarantine(
      in.toDF().toDF("doc_id", "text"),
      s"$base/keep",
      s"$base/quarantine",
      s"$base/ckpt"
    )
    try {
      val passDoc = // 20+ words, mean length in range, stopwords, diverse
        (1L, "the quick brown fox jumps over a lazy dog while the keen red cat naps of and to in is table")
      val failShort = (2L, "tiny doc of nothing much here") // < 20 words
      val failStop  = (3L, Seq.fill(4)("alpha beta gamma delta epsilon").mkString(" ")) // no stopwords
      in.addData(passDoc, failShort, failStop)
      q.processAllAvailable()
      in.addData((4L, "second batch doc with few words")) // < 20 words → quarantine
      q.processAllAvailable()

      val keep = spark.read.parquet(s"$base/keep")
      val quar = spark.read.parquet(s"$base/quarantine")
      assert(keep.select("doc_id").as[Long].collect().toSet == Set(1L))
      assert(quar.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 4L))
      // verdicts equal the batch transform run over the same rows
      val all = Seq(passDoc, failShort, failStop, (4L, "second batch doc with few words"))
      val batch = graft.queries.Curation
        .gateBattery(all.toDF("doc_id", "text"))
        .select("doc_id", "keep", "reject_reason")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
      val streamed = keep
        .unionByName(quar)
        .select("doc_id", "keep", "reject_reason")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dedupIngest flags cross-batch duplicates against the on-disk index and grows it with representatives only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in   = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val q = StreamOps.dedupIngest(
      in.toDF().toDF("doc_id", "text"),
      s"$base/index",
      s"$base/out",
      s"$base/ckpt"
    )
    try {
      val a    = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val bTxt = "one two three four five six seven eight nine ten"
      in.addData((1L, a))
      q.processAllAvailable() // batch 1: index is empty → doc 1 is new
      in.addData((2L, a), (3L, bTxt))
      q.processAllAvailable() // batch 2: doc 2 duplicates INDEXED doc 1
      val out = spark.read
        .parquet(s"$base/out")
        .select("doc_id", "verdict")
        .as[(Long, String)]
        .collect()
        .toMap
      assert(out == Map(1L -> "new", 2L -> "dup", 3L -> "new"))
      val idx =
        spark.read.parquet(s"$base/index/shingles").select("doc_id").as[Long].collect().toSet
      assert(idx == Set(1L, 3L)) // the duplicate never entered the index
    } finally q.stop()
  }

  test("streaming funnel: gate, dedup ingest, and packer chain via durable handoffs") {
    import org.apache.spark.sql.functions.{col, size, split}
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val in   = MemoryStream[(Long, String, String)]

    val tEn1 = "the quick brown fox jumps over a lazy dog while the keen red cat naps of and to in is table"
    val tDe1 = "the slow green bird flies under a heavy cloud while the warm blue lake rests of and to in is chair"
    val tEn3 = tEn1 // duplicate of doc 1 — every band collides, verdict must be 'dup'
    val tEn4 = "a big old ship sails past the tall white tower when a cold dark wave hits of and to in is stone"

    // stage 1: gate router (payload carried through)
    val q1 = StreamOps.gateAndQuarantine(
      in.toDF().toDF("doc_id", "lang", "text"),
      s"$base/keep",
      s"$base/quar",
      s"$base/ck1"
    )
    in.addData((1L, "en", tEn1), (2L, "de", tDe1), (5L, "en", "tiny doc of nothing much"))
    q1.processAllAvailable()

    // stage 2: dedup-aware ingest over the keep dir (file-source handoff)
    val keepSchema = new StructType()
      .add("doc_id", LongType)
      .add("lang", StringType)
      .add("text", StringType)
    val q2 = StreamOps.dedupIngest(
      spark.readStream.schema(keepSchema).parquet(s"$base/keep"),
      s"$base/index",
      s"$base/out",
      s"$base/ck2"
    )
    q2.processAllAvailable()

    // stage 3: packer over the ingest's 'new' docs (second file handoff)
    val outSchema = keepSchema.add("verdict", StringType)
    val q3 = StreamOps
      .sequencePacker(
        spark.readStream
          .schema(outSchema)
          .parquet(s"$base/out")
          .filter(col("verdict") === "new")
          .select(
            col("lang"),
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")
          )
          .as[StreamOps.PackIn]
      )
      .writeStream
      .format("parquet")
      .option("path", s"$base/packed")
      .option("checkpointLocation", s"$base/ck3")
      .outputMode(OutputMode.Append())
      .start()
    q3.processAllAvailable()

    try {
      // batch 2: a near-dup of doc 1, a fresh pass doc, a gate failure
      in.addData((3L, "en", tEn3), (4L, "en", tEn4), (6L, "en", "another small doc with scant words"))
      q1.processAllAvailable()
      q2.processAllAvailable()
      q3.processAllAvailable()

      val quar = spark.read.parquet(s"$base/quar").select("doc_id").as[Long].collect().toSet
      assert(quar == Set(5L, 6L))
      val verdicts = spark.read
        .parquet(s"$base/out")
        .select("doc_id", "verdict")
        .as[(Long, String)]
        .collect()
        .toMap
      assert(verdicts == Map(1L -> "new", 2L -> "new", 3L -> "dup", 4L -> "new"))

      val packed = spark.read
        .parquet(s"$base/packed")
        .as[StreamOps.PackOut]
        .collect()
        .map(p => p.doc_id -> p)
        .toMap
      val en1Tokens = tEn1.split(" ").length.toLong
      assert(packed.keySet == Set(1L, 2L, 4L))
      assert(packed(1L).start_off == 0L && packed(1L).n_tokens == en1Tokens)
      assert(packed(2L).start_off == 0L) // de stream packs independently
      assert(packed(4L).start_off == en1Tokens) // en offset continues past batch 1
    } finally { q3.stop(); q2.stop(); q1.stop() }
  }

  test("TableIO.compact between micro-batches leaves funnel verdicts and pack offsets intact") {
    import org.apache.spark.sql.functions.{col, size, split}
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_funnel_compact").toString
    val in   = MemoryStream[(Long, String, String)]

    val tEn1 = "the quick brown fox jumps over a lazy dog while the keen red cat naps of and to in is table"
    val tEn2 = "a big old ship sails past the tall white tower when a cold dark wave hits of and to in is stone"
    val tEn4 = "nine tall grey wolves run down the long cold ridge as one pale moon rises of and to in is cliff"

    val q1 = StreamOps.gateAndQuarantine(
      in.toDF().toDF("doc_id", "lang", "text"),
      s"$base/keep", s"$base/quar", s"$base/ck1")
    in.addData((1L, "en", tEn1))
    q1.processAllAvailable()
    val keepSchema = new StructType()
      .add("doc_id", LongType).add("lang", StringType).add("text", StringType)
    val q2 = StreamOps.dedupIngest(
      spark.readStream.schema(keepSchema).parquet(s"$base/keep"),
      s"$base/index", s"$base/out", s"$base/ck2")
    q2.processAllAvailable()
    val outSchema = keepSchema.add("verdict", StringType)
    val q3 = StreamOps
      .sequencePacker(
        spark.readStream.schema(outSchema).parquet(s"$base/out")
          .filter(col("verdict") === "new")
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .as[StreamOps.PackIn])
      .writeStream.format("parquet")
      .option("path", s"$base/packed")
      .option("checkpointLocation", s"$base/ck3")
      .outputMode(OutputMode.Append()).start()
    q3.processAllAvailable()

    try {
      // batch 2 grows the index to multiple per-batch appends
      in.addData((2L, "en", tEn2))
      q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()

      // idle window between micro-batches: compact the cross-batch index.
      // Rows must survive exactly; the rewrite must genuinely coalesce
      // (two per-batch appends → one file) or the test is vacuous.
      val shBefore = spark.read.parquet(s"$base/index/shingles").count()
      val (fb, fa, rows) = graft.io.TableIO.compact(spark, s"$base/index/shingles", shBefore)
      assert(rows == shBefore && fb > fa, s"compact: $fb→$fa files, $rows/$shBefore rows")
      val (bb, ba, brows) = {
        val n = spark.read.parquet(s"$base/index/bands").count()
        val r = graft.io.TableIO.compact(spark, s"$base/index/bands", n)
        (r._1, r._2, r._3)
      }
      assert(bb > ba && brows > 0)

      // batch 3 AFTER compaction: the duplicate must still be caught
      // against the compacted index, and the packer's en offset must
      // continue exactly where batch 2 left it
      in.addData((3L, "en", tEn1), (4L, "en", tEn4))
      q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()

      val verdicts = spark.read.parquet(s"$base/out")
        .select("doc_id", "verdict").as[(Long, String)].collect().toMap
      assert(verdicts == Map(1L -> "new", 2L -> "new", 3L -> "dup", 4L -> "new"))
      val packed = spark.read.parquet(s"$base/packed")
        .as[StreamOps.PackOut].collect().map(p => p.doc_id -> p).toMap
      val t1 = tEn1.split(" ").length.toLong
      val t2 = tEn2.split(" ").length.toLong
      assert(packed.keySet == Set(1L, 2L, 4L))
      assert(packed(1L).start_off == 0L)
      assert(packed(2L).start_off == t1)
      assert(packed(4L).start_off == t1 + t2) // offsets unbroken across the compaction
    } finally { q3.stop(); q2.stop(); q1.stop() }
  }

  test("sequencePacker continues each language's pack offsets across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.PackIn]
    val q = StreamOps
      .sequencePacker(in.toDS(), packTokens = 10L)
      .writeStream
      .format("memory")
      .queryName("packer")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(StreamOps.PackIn("en", 1L, 4L), StreamOps.PackIn("en", 2L, 7L))
      q.processAllAvailable()
      in.addData(StreamOps.PackIn("en", 3L, 5L), StreamOps.PackIn("de", 4L, 3L))
      q.processAllAvailable()
      val rows = spark
        .table("packer")
        .as[StreamOps.PackOut]
        .collect()
        .map(p => p.doc_id -> p)
        .toMap
      // en stream: 4 then 7 then 5 tokens → offsets 0, 4, 11
      assert(rows(1L).start_off == 0L && rows(1L).pack_id == 0L && rows(1L).straddles == 0)
      assert(rows(2L).start_off == 4L && rows(2L).straddles == 1) // spans 10-boundary
      assert(rows(3L).start_off == 11L && rows(3L).pack_id == 1L) // batch 2 continues
      // de stream is independent
      assert(rows(4L).start_off == 0L)
    } finally q.stop()
  }

  test("sequencePacker pack offsets survive a checkpointed query restart (crash replay)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pack_ckpt").toString
    val in   = MemoryStream[StreamOps.PackIn]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[StreamOps.PackOut]()
    // memory sink can't recover from a checkpoint; foreachBatch can
    def start() = StreamOps
      .sequencePacker(in.toDS(), packTokens = 10L)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PackOut], _: Long) =>
        b.collect().foreach(emitted.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // run 1: two en docs (offsets 0, 4) and one de doc, then STOP — the
    // per-language cursors live only in the checkpointed state store now
    val q1 = start()
    try {
      in.addData(StreamOps.PackIn("en", 1L, 4L), StreamOps.PackIn("en", 2L, 7L))
      in.addData(StreamOps.PackIn("de", 3L, 9L))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: NEW query from the same checkpoint — offsets must continue
    // EXACTLY (en at 11, de at 9), proving flatMapGroupsWithState state
    // recovery, not a rebuild from reprocessed input
    val q2 = start()
    try {
      in.addData(StreamOps.PackIn("en", 4L, 5L), StreamOps.PackIn("de", 5L, 2L))
      q2.processAllAvailable()
      val rows = emitted.toArray(Array.empty[StreamOps.PackOut]).map(p => p.doc_id -> p).toMap
      assert(rows(4L).start_off == 11L && rows(4L).pack_id == 1L, s"en cursor lost: ${rows(4L)}")
      assert(rows(5L).start_off == 9L && rows(5L).straddles == 1, s"de cursor lost: ${rows(5L)}")
    } finally q2.stop()
  }

  test("transitionPairs last-seen state survives a checkpointed query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{TransIn, TransPair}
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_trans_ckpt").toString
    val in      = MemoryStream[TransIn]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[TransPair]()
    def start() = StreamOps
      .transitionPairs(in.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TransPair], _: Long) =>
        b.collect().foreach(emitted.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // run 1: user 9 ends on type "B", then STOP — the last-seen triple
    // lives only in the checkpointed state store now
    val q1 = start()
    try {
      in.addData(TransIn(9L, 1000L, 1L, "A"), TransIn(9L, 2000L, 2L, "B"))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: NEW query from the same checkpoint — the first new event must
    // pair with the RECOVERED "B", not start fresh
    val q2 = start()
    try {
      in.addData(TransIn(9L, 3000L, 3L, "C"))
      q2.processAllAvailable()
      val pairs = emitted.toArray(Array.empty[TransPair])
        .map(p => (p.from_type, p.to_type)).toSeq.sorted
      assert(pairs == Seq(("A", "B"), ("B", "C")), s"state lost: $pairs")
    } finally q2.stop()
  }

  test("dedupIngest flags near-duplicates arriving in the SAME micro-batch (intra-batch probe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in   = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_ib").toString
    val q = StreamOps.dedupIngest(
      in.toDF().toDF("doc_id", "text"),
      s"$base/index",
      s"$base/out",
      s"$base/ckpt"
    )
    try {
      val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val b = "one two three four five six seven eight nine ten"
      // doc 1 and doc 2 are near-duplicates IN THE SAME batch: the lower
      // doc_id is the representative, the higher one must verdict 'dup'
      // and stay out of the index
      in.addData((2L, a), (1L, a), (3L, b))
      q.processAllAvailable()
      val out = spark.read
        .parquet(s"$base/out")
        .select("doc_id", "verdict")
        .as[(Long, String)]
        .collect()
        .toMap
      assert(out == Map(1L -> "new", 2L -> "dup", 3L -> "new"), s"got $out")
      val idx =
        spark.read.parquet(s"$base/index/shingles").select("doc_id").as[Long].collect().toSet
      assert(idx == Set(1L, 3L))
    } finally q.stop()
  }

  test("gateAndQuarantine routes null-gate rows to quarantine, never dropping them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in   = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_gate_null").toString
    val q = StreamOps.gateAndQuarantine(
      in.toDF().toDF("doc_id", "text"),
      s"$base/keep",
      s"$base/quarantine",
      s"$base/ckpt"
    )
    try {
      // a NULL text makes every gate column null: keep === 1 and keep === 0
      // both evaluate to null — the row must still land in quarantine
      in.addData((1L, "a plain healthy document with enough ordinary words to pass the battery of gates easily and cleanly today"), (2L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/keep").select("doc_id").as[Long].collect().toSet
      val quar = spark.read.parquet(s"$base/quarantine").select("doc_id").as[Long].collect().toSet
      assert((kept ++ quar) == Set(1L, 2L), s"row lost: kept=$kept quarantine=$quar")
      assert(quar.contains(2L), "null-gate row must be quarantined")
    } finally q.stop()
  }

  test("streaming soak: dedupIngest per-batch wall time stays flat as the index grows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in   = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_soak").toString
    val q = StreamOps.dedupIngest(
      in.toDF().toDF("doc_id", "text"),
      s"$base/index",
      s"$base/out",
      s"$base/ckpt"
    )
    try {
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
      def doc(i: Long): String =
        (0 until 12).map(k => words(((i * 31 + k * 7) % 16).toInt) + (i % 97)).mkString(" ")
      val perBatch = 16
      val times = (0 until 20).map { b =>
        val docs = (0 until perBatch).map(k => (b * 1000L + k, doc(b * 1000L + k)))
        in.addData(docs: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      // the index grows 20× over the run; probe cost is ∝ batch × bucket
      // occupancy, so per-batch time must stay FLAT — compare medians of
      // the early and late windows (medians damp scheduler noise)
      def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val early = median(times.slice(2, 8))
      val late  = median(times.slice(14, 20))
      assert(
        late <= early * 3.0,
        s"per-batch time grew with index size: early=$early late=$late (${times.mkString(", ")})"
      )
      // state is on disk, not in the executor store: out has every row
      assert(spark.read.parquet(s"$base/out").count() == 20L * perBatch)
    } finally q.stop()
  }

  test("Sessionizer state survives a checkpointed query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000000
    val base   = 100 * hourUs
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in   = MemoryStream[Event]
    // memory sink can't recover from a checkpoint; foreachBatch can
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Session]()
    def start() = StreamOps.Sessionizer(in.toDS(), gapUs = hourUs).writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], _: Long) =>
        b.collect().foreach(emitted.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    // run 1: open a session for user 7, then STOP — state lives only in
    // the checkpoint now
    val q1 = start()
    try {
      in.addData(Event(7L, base), Event(7L, base + 600L * 1000000))
      q1.processAllAvailable()
      assert(emitted.isEmpty) // still open
    } finally q1.stop()

    // run 2: NEW query from the same checkpoint; a late third event must
    // fold into the RECOVERED session, then a far-future event closes it —
    // 3 events, 1200s span proves pre-restart state was not lost
    val q2 = start()
    try {
      in.addData(Event(7L, base + 1200L * 1000000))
      in.addData(Event(7L, base + 10 * hourUs))
      q2.processAllAvailable()
      assert(emitted.toArray.toSeq == Seq(Session(7L, 3L, 1200L * 1000000)))
    } finally q2.stop()
  }

  test("Sessionizer evicts idle sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000000
    val base   = 100 * hourUs // away from epoch 0 = the initial watermark
    val in     = MemoryStream[Event]
    val q = StreamOps.Sessionizer(in.toDS(), gapUs = hourUs).writeStream
      .format("memory")
      .queryName("sess_to")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 7's session opens (2 events, 600s span)
      in.addData(Event(7L, base), Event(7L, base + 600L * 1000000))
      q.processAllAvailable()
      assert(spark.table("sess_to").count() == 0)

      // batch 2: a different user far in the future advances the watermark
      // past user 7's (last + gap) timeout stamp
      in.addData(Event(8L, base + 10 * hourUs))
      q.processAllAvailable()
      // batch 3: any further data triggers the timeout sweep — user 7's
      // open session is emitted as closed and its state removed
      in.addData(Event(8L, base + 10 * hourUs + 1))
      q.processAllAvailable()
      val sessions = spark.table("sess_to").as[Session].collect().toSet
      assert(sessions.contains(Session(7L, 2L, 600L * 1000000)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeats of a key and evicts expired state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = StreamOps
      .dedupWithinWatermark(in.toDF().toDF("t", "k"), Seq("k"), "1 hour")
      .writeStream
      .format("memory")
      .queryName("dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: k=1 twice, k=2 once → two rows survive
      in.addData((ts(1, 1), 1L), (ts(1, 1), 1L), (ts(1, 2), 2L))
      q.processAllAvailable()
      assert(spark.table("dedup").select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

      // batch 2: k=1 repeats within the horizon → suppressed; k=3 is new
      in.addData((ts(1, 2), 1L), (ts(1, 3), 3L))
      q.processAllAvailable()
      assert(
        spark.table("dedup").select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L)
      )

      // batch 3: far future — watermark passes, k=1's state expires, so a
      // late re-arrival of k=1 is emitted again (bounded state, by design)
      in.addData((ts(5, 1), 9L))
      q.processAllAvailable()
      in.addData((ts(5, 2), 1L))
      q.processAllAvailable()
      val ks = spark.table("dedup").select("k").as[Long].collect().sorted.toSeq
      assert(ks == Seq(1L, 1L, 2L, 3L, 9L))
    } finally q.stop()
  }

  test("enrichWithStatic broadcast-joins each micro-batch; unmatched facts keep nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val in  = MemoryStream[(Timestamp, Long)]
    val q = StreamOps
      .enrichWithStatic(in.toDF().toDF("t", "k"), dim, "k")
      .writeStream
      .format("memory")
      .queryName("enriched")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((ts(1, 1), 1L), (ts(1, 2), 3L))
      q.processAllAvailable()
      val rows = spark.table("enriched").select("k", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "gold"), (3L, null)))
      in.addData((ts(1, 3), 2L))
      q.processAllAvailable()
      assert(spark.table("enriched").count() == 3)
    } finally q.stop()
  }

  test("upsertSink: batch beats existing, version breaks within-batch ties, replay converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = s"${sys.props("java.io.tmpdir")}/graft_io/stream_upsert_spec"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)

    val in = MemoryStream[(Long, Long, String)]
    val q = in.toDF().toDF("k", "version", "payload").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.upsertSink(b, path, key = "k", version = "version")
      }
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: k=1 appears twice — highest version wins within the batch
      in.addData((1L, 1L, "v1"), (1L, 2L, "v2"), (2L, 1L, "a"))
      q.processAllAvailable()
      val s1 = spark.read.parquet(path).select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(s1 == Set((1L, "v2"), (2L, "a")))

      // batch 2: k=1 re-arrives with a LOWER version — batch still beats
      // existing (keep-last stream semantics), k=3 is new
      in.addData((1L, 1L, "v1-replay"), (3L, 1L, "c"))
      q.processAllAvailable()
      val s2 = spark.read.parquet(path).select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(s2 == Set((1L, "v1-replay"), (2L, "a"), (3L, "c")))

      // replaying the same batch again converges to the same state
      StreamOps.upsertSink(
        Seq((1L, 1L, "v1-replay"), (3L, 1L, "c")).toDF("k", "version", "payload"),
        path, key = "k", version = "version")
      val s3 = spark.read.parquet(path).select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(s3 == s2)
    } finally q.stop()
  }

  test("cmSketchSink: stream-folded registers equal the batch sketch, a replayed batch id is a committed no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CmOps
    val path = s"${sys.props("java.io.tmpdir")}/graft_io/stream_cmsketch_spec"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)

    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getAs[Long]("j"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    def batchSketch(words: Seq[String]): Map[(Long, Long), Long] = {
      val cells = (0 until CmOps.Depth).map(j =>
        org.apache.spark.sql.functions.expr(CmOps.bucketExpr("w", j)))
      cellsOf(
        words.toDF("w")
          .select(org.apache.spark.sql.functions.posexplode(
            org.apache.spark.sql.functions.array(cells: _*)))
          .selectExpr("cast(pos as long) as j", "col as b")
          .groupBy("j", "b").count().withColumnRenamed("count", "c"))
    }

    val in = MemoryStream[String]
    val q = in.toDF().toDF("w").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.cmSketchSink(b, id, path)
      }
      .outputMode(OutputMode.Append())
      .start()
    try {
      val b1 = Seq("alpha", "beta", "alpha", "gamma")
      val b2 = Seq("beta", "beta", "delta")
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      val folded = spark.read.parquet(path)
      val lastId = folded.agg(org.apache.spark.sql.functions.max("last_batch")).head.getLong(0)
      assert(lastId >= 1L, "two micro-batches must advance the committed id")
      // stream ≡ batch on the registers
      assert(cellsOf(folded.select("j", "b", "c")) == batchSketch(b1 ++ b2))
      // REPLAY: re-folding an already-committed batch id changes nothing —
      // addition is not idempotent, so this is the transactional guard at work
      StreamOps.cmSketchSink(b2.toDF("w"), lastId, path)
      val replayed = spark.read.parquet(path)
      assert(cellsOf(replayed.select("j", "b", "c")) == batchSketch(b1 ++ b2),
        "a replayed batch id must not double-count")
      assert(replayed.agg(org.apache.spark.sql.functions.max("last_batch")).head.getLong(0) == lastId)
      // a FRESH id folds: the estimate for beta (min over its 4 cells) grows
      def estBeta(m: Map[(Long, Long), Long]): Long =
        (0 until CmOps.Depth).map { j =>
          val b = Seq("beta").toDF("w")
            .selectExpr(CmOps.bucketExpr("w", j)).head.getLong(0)
          m.getOrElse((j.toLong, b), 0L)
        }.min
      val before = estBeta(cellsOf(replayed.select("j", "b", "c")))
      StreamOps.cmSketchSink(Seq("beta").toDF("w"), lastId + 1, path)
      val after = estBeta(cellsOf(spark.read.parquet(path).select("j", "b", "c")))
      assert(after == before + 1, s"fresh fold must count: $before -> $after")
      assert(before >= 3L, "CM estimate is one-sided: beta arrived 3 times")
    } finally q.stop()
  }

  test("cmSketchSink: a checkpointed restart never double-counts — the committed batch id guards the replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CmOps
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/stream_cmsketch_restart_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"

    def total(): Long =
      spark.read.parquet(path)
        .filter(org.apache.spark.sql.functions.col("j") === 0L)
        .agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0)

    val in = MemoryStream[String]
    def start() = in.toDF().toDF("w").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.cmSketchSink(b, id, path)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    val q = start()
    try {
      in.addData("alpha", "beta", "alpha")
      q.processAllAvailable()
      // row 0 of the sketch counts every token exactly once
      assert(total() == 3L)
    } finally q.stop()

    // restart from the checkpoint: Structured Streaming may re-offer the
    // last batch under ITS ORIGINAL ID; addition is not idempotent, so only
    // the committed-id guard keeps row-0 mass exact. New data still folds.
    val q2 = start()
    try {
      in.addData("gamma")
      q2.processAllAvailable()
      assert(total() == 4L, "restart must not double-count the pre-restart batch")
      assert(CmOps.Depth == 4 && CmOps.Width == 1024L, "spec pins the shared geometry")
    } finally q2.stop()
  }

  test("cmSketchSink: a crash between the park and promote renames is healed — the parked accumulator is recovered, not deleted") {
    import spark.implicits._
    import graft.operators.CmOps
    val path = s"${sys.props("java.io.tmpdir")}/graft_io/stream_cmsketch_heal_spec"
    val hp   = new org.apache.hadoop.fs.Path(path)
    val fs   = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    fs.delete(new org.apache.hadoop.fs.Path(path + "._old"), true)

    StreamOps.cmSketchSink(Seq("alpha", "beta", "alpha").toDF("w"), 0L, path)
    def row0(): Long =
      spark.read.parquet(path)
        .filter(org.apache.spark.sql.functions.col("j") === 0L)
        .agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0)
    assert(row0() == 3L)

    // Simulate the writeParquet swap crashing AFTER parking the previous
    // table and BEFORE promoting the staging dir: the park is the only
    // copy of the accumulated registers and the committed batch id.
    assert(fs.rename(hp, new org.apache.hadoop.fs.Path(path + "._old")))
    assert(!fs.exists(hp))

    // The r16 ADVICE failure mode: the next fold saw no table (last = -1),
    // refolded a REPLAYED batch into an empty sketch, and the swap deleted
    // the park as a "leftover" — silent total loss. Healed, the replay is
    // a committed no-op and the registers are intact.
    StreamOps.cmSketchSink(Seq("alpha", "beta", "alpha").toDF("w"), 0L, path)
    assert(row0() == 3L, "replayed batch against the healed table must be a no-op")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "._old")), "the park is consumed by the heal")

    // and a genuinely new batch folds on top of the recovered mass
    StreamOps.cmSketchSink(Seq("gamma").toDF("w"), 1L, path)
    assert(row0() == 4L, "fresh fold counts on top of the recovered accumulator")
    assert(CmOps.Depth == 4, "geometry unchanged")
  }

  test("retentionCohorts: stream-folded cohort matrix equals the batch build across a checkpointed restart, including an out-of-order re-base") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Events
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/stream_retention_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val path = s"$base/state"
    val ckpt = s"$base/ckpt"

    // (user, day) activity; user 3's FIRST event arrives LAST (day 100 in
    // batch 1, day 98 in batch 2 → the stream must re-base its cohort and
    // shift the day-2 bit into place); user 1's day-20 row falls outside
    // the 14-day window; duplicate rows appear within and across batches.
    val b1 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 100L), (1L, 10L))
    val b2 = Seq((1L, 17L), (1L, 20L), (2L, 10L), (3L, 98L), (4L, 12L))

    val in = MemoryStream[(Long, Long)]
    def start() = in.toDF().toDF("user_id", "day").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.retentionCohorts(b, path)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    val q = start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()
    // checkpointed restart: the sink may see the last batch AGAIN — the
    // min/bit_or semilattice makes the replay a no-op without any batch-id
    // guard (bloomManifest's idempotence class)
    val q2 = start()
    try {
      in.addData(b2: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

    val streamMatrix = rows(Events.cohortMatrix(spark.read.parquet(path)))
    val batchMatrix = rows(
      Events.cohortMatrix(Events.cohortState((b1 ++ b2).toDF("user_id", "day").distinct()))
    )
    assert(streamMatrix == batchMatrix, s"stream $streamMatrix != batch $batchMatrix")

    // the re-based user landed where the batch build puts it: cohort day
    // 98 with bits 0 (day 98) and 2 (day 100) set
    val u3 = spark.read.parquet(path).filter($"user_id" === 3L).collect().head
    assert(u3.getAs[Long]("c_day") == 98L)
    assert(u3.getAs[Long]("mask") == 5L, "bits 0 and 2")
    // and an explicit replay of batch 2 converges (idempotent fold)
    StreamOps.retentionCohorts(b2.toDF("user_id", "day"), path)
    assert(rows(Events.cohortMatrix(spark.read.parquet(path))) == batchMatrix)
  }

  test("mergeSink: tombstones delete mid-funnel, replay converges, stream equals batch, restart keeps deletes gone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/stream_merge_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val path      = s"$base/t"
    val batchPath = s"$base/t_batch"
    val ckpt      = s"$base/ckpt"

    def tableSet(p: String): Set[(Long, String)] =
      spark.read.parquet(p).select("k", "payload").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    val b1 = Seq((1L, 1L, "one", false), (2L, 1L, "two", false), (3L, 1L, "three", false))
    // mid-funnel batch: tombstone k=2, update k=1, insert k=4, tombstone
    // for an ABSENT key (9) — must be a noop, not a resurrection or error
    val b2 = Seq((2L, 2L, null.asInstanceOf[String], true), (1L, 2L, "one-v2", false),
      (4L, 1L, "four", false), (9L, 1L, null.asInstanceOf[String], true))
    val b3 = Seq((3L, 2L, null.asInstanceOf[String], true))

    val in = MemoryStream[(Long, Long, String, Boolean)]
    def start() = in.toDF().toDF("k", "version", "payload", "is_delete").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.mergeSink(b, path, key = "k", version = "version")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    val q = start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(tableSet(path) == Set((1L, "one"), (2L, "two"), (3L, "three")))
      in.addData(b2: _*); q.processAllAvailable()
      val afterB2 = Set((1L, "one-v2"), (3L, "three"), (4L, "four"))
      assert(tableSet(path) == afterB2, "tombstone k=2 must be gone, absent-key tombstone a noop")

      // replaying the same micro-batch converges to the same state
      StreamOps.mergeSink(b2.toDF("k", "version", "payload", "is_delete"), path, "k", "version")
      assert(tableSet(path) == afterB2)

      // stream ≡ batch: applying the same batches in order through the
      // batch-callable face lands the identical table
      StreamOps.mergeSink(b1.toDF("k", "version", "payload", "is_delete"), batchPath, "k", "version")
      StreamOps.mergeSink(b2.toDF("k", "version", "payload", "is_delete"), batchPath, "k", "version")
      assert(tableSet(batchPath) == afterB2)
    } finally q.stop()

    // checkpointed restart: the new query resumes from the checkpoint;
    // earlier deletes stay gone and a post-restart tombstone still deletes
    val q2 = start()
    try {
      in.addData(b3: _*); q2.processAllAvailable()
      assert(tableSet(path) == Set((1L, "one-v2"), (4L, "four")))
    } finally q2.stop()
  }

  test("joinStreamsWithinBand: matches inside the band in streaming, same as batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L // epoch-0 collides with the initial watermark
    def toTs(c: String) = timestamp_seconds(col(c))
    // impressions (k, it) and clicks (ck, ct): click joins an impression of
    // the same key within ±60s
    val imps   = Seq((1L, base + 0L), (1L, base + 500L), (2L, base + 100L))
    val clicks = Seq((1L, base + 30L), (1L, base + 400L), (2L, base + 90L), (3L, base + 10L))
    val expected = Set((1L, base + 0L, base + 30L), (2L, base + 100L, base + 90L))

    def joined(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      StreamOps.joinStreamsWithinBand(
        l.select(col("k"), toTs("its").as("it")),
        r.select(col("ck"), toTs("cts").as("ct")),
        leftKey = "k", rightKey = "ck", leftTs = "it", rightTs = "ct",
        bandSeconds = 60L, delay = "10 seconds"
      )

    // batch form: watermark is a no-op, same transform
    val batchGot = joined(
      imps.toDF("k", "its"), clicks.toDF("ck", "cts")
    ).collect().map(r => (r.getAs[Long]("k"),
      r.getAs[java.sql.Timestamp]("it").getTime / 1000,
      r.getAs[java.sql.Timestamp]("ct").getTime / 1000)).toSet
    assert(batchGot == expected)

    // streaming form over MemoryStreams
    val li = MemoryStream[(Long, Long)]
    val ri = MemoryStream[(Long, Long)]
    val q = joined(li.toDF().toDF("k", "its"), ri.toDF().toDF("ck", "cts"))
      .writeStream.format("memory").queryName("ssjoin").outputMode(OutputMode.Append())
      .start()
    try {
      li.addData(imps: _*)
      ri.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("ssjoin").collect().map(r => (r.getAs[Long]("k"),
        r.getAs[java.sql.Timestamp]("it").getTime / 1000,
        r.getAs[java.sql.Timestamp]("ct").getTime / 1000)).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("joinStreamsWithinBand left_outer: unmatched facts emit with nulls after the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    val li = MemoryStream[(Long, Long)]
    val ri = MemoryStream[(Long, Long)]
    val joined = StreamOps.joinStreamsWithinBand(
      li.toDF().toDF("k", "its").select(col("k"), timestamp_seconds(col("its")).as("it")),
      ri.toDF().toDF("ck", "cts").select(col("ck"), timestamp_seconds(col("cts")).as("ct")),
      leftKey = "k", rightKey = "ck", leftTs = "it", rightTs = "ct",
      bandSeconds = 60L, delay = "10 seconds", joinType = "left_outer"
    )
    val q = joined.writeStream.format("memory").queryName("ssleft")
      .outputMode(OutputMode.Append()).start()
    try {
      // k=1 gets a match; k=2 never does
      li.addData((1L, base + 0L), (2L, base + 5L))
      ri.addData((1L, base + 30L))
      q.processAllAvailable()
      // advance the watermark far past k=2's band end so its timeout fires
      li.addData((9L, base + 10000L))
      ri.addData((9L, base + 10000L))
      q.processAllAvailable()
      val got = spark.table("ssleft").collect()
        .map(r => (r.getAs[Long]("k"), Option(r.getAs[java.sql.Timestamp]("ct")).isDefined))
        .toSet
      assert(got.contains((1L, true)), s"matched row missing: ${got.mkString(",")}")
      assert(got.contains((2L, false)), s"timed-out row with nulls missing: ${got.mkString(",")}")
    } finally q.stop()
  }

  test("upsertSinkPartitioned: merges touched partitions, untouched files byte-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path  = s"${sys.props("java.io.tmpdir")}/graft_io/stream_upsert_part_spec"
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs    = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hpath, true)

    def fileBytes(sub: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(p)) Map.empty
      else
        fs.listStatus(p)
          .filter(_.isFile)
          .map(st => st.getPath.getName -> st.getModificationTime)
          .toMap
    }

    // seed two partitions (pt is a pure function of k: k mod 2)
    val in = MemoryStream[(Long, Long, Long, String)]
    val q = in.toDF().toDF("k", "pt", "version", "payload").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamOps.upsertSinkPartitioned(b, path, key = "k", version = "version", partCol = "pt")
      }
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, 1L, 1L, "a"), (2L, 0L, 1L, "b"))
      q.processAllAvailable()
      val pt0Before = fileBytes("pt=0")
      assert(pt0Before.nonEmpty && fileBytes("pt=1").nonEmpty)

      // batch 2 touches ONLY pt=1: upsert k=1, add k=3
      in.addData((1L, 1L, 2L, "a2"), (3L, 1L, 1L, "c"))
      q.processAllAvailable()
      // untouched partition: exact same files, untouched timestamps
      assert(fileBytes("pt=0") == pt0Before)
      def readAll() = spark.read
        .schema("k LONG, version LONG, payload STRING, pt LONG")
        .option("basePath", path)
        .parquet(s"$path/pt=0", s"$path/pt=1")
        .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(readAll() == Set((1L, "a2"), (2L, "b"), (3L, "c")))

      // replaying batch 2 converges and still leaves pt=0 alone
      StreamOps.upsertSinkPartitioned(
        Seq((1L, 1L, 2L, "a2"), (3L, 1L, 1L, "c")).toDF("k", "pt", "version", "payload"),
        path, key = "k", version = "version", partCol = "pt")
      assert(fileBytes("pt=0") == pt0Before)
      assert(readAll() == Set((1L, "a2"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("windowedCounts over a parquet file-source stream matches the batch result") {
    import org.apache.spark.sql.functions._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/stream_file_src"
    val batchDf = Engine
      .table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .select("t", "event_type", "value")
    batchDf.write.mode("overwrite").parquet(dir)
    val q = StreamOps
      .windowedCounts(spark.readStream.schema(batchDf.schema).parquet(dir))
      .writeStream
      .format("memory")
      .queryName("fsrc")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      val got  = spark.table("fsrc").collect().map(key).toSet
      val want = StreamOps.windowedCounts(batchDf).collect().map(key).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("transitionPairs emits the boundary transition once and matches the batch matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{TransIn, TransPair}
    val in = MemoryStream[TransIn]
    val q = StreamOps.transitionPairs(in.toDS()).writeStream
      .format("memory")
      .queryName("trans")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 A→B; user 2 lone A (no pair yet)
      in.addData(TransIn(1L, 1000L, 1L, "A"), TransIn(1L, 2000L, 2L, "B"), TransIn(2L, 1000L, 3L, "A"))
      q.processAllAvailable()
      // batch 2: user 1 B→A straddles the boundary; user 2 A→A
      in.addData(TransIn(1L, 3000L, 4L, "A"), TransIn(2L, 2000L, 5L, "A"))
      q.processAllAvailable()
      val got = spark.table("trans").as[TransPair].collect().toSeq
        .groupBy(p => (p.from_type, p.to_type)).view.mapValues(_.size).toMap
      // the batch lag-window census over the SAME history (e18's shape)
      val batch = Seq(
        (1L, 1000L, 1L, "A"), (1L, 2000L, 2L, "B"), (1L, 3000L, 4L, "A"),
        (2L, 1000L, 3L, "A"), (2L, 2000L, 5L, "A")
      ).toDF("user_id", "us", "event_id", "event_type")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(org.apache.spark.sql.functions.col("user_id"))
        .orderBy(org.apache.spark.sql.functions.col("us"), org.apache.spark.sql.functions.col("event_id"))
      val want = batch
        .withColumn("from_type", org.apache.spark.sql.functions.lag(org.apache.spark.sql.functions.col("event_type"), 1).over(w))
        .filter(org.apache.spark.sql.functions.col("from_type").isNotNull)
        .groupBy("from_type", "event_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt)
        .toMap
      assert(got == want)
      assert(got == Map(("A", "B") -> 1, ("B", "A") -> 1, ("A", "A") -> 1))
    } finally q.stop()
  }

  test("Sessionizer folds out-of-order events without shrinking durations") {
    import spark.implicits._
    val gapUs = 3600L * 1000000
    // batch mode: one group pass; events deliberately unsorted in input —
    // within-pass sorting plus min/max guards keep bounds monotone
    val base = 100 * gapUs
    val events = Seq(
      Event(1L, base + 500L * 1000000),
      Event(1L, base),
      Event(1L, base + 3 * gapUs) // closes the first session
    ).toDS()
    val out = StreamOps.Sessionizer(events, gapUs).collect().toSeq
    assert(out == Seq(Session(1L, 2L, 500L * 1000000)))
  }

  test("cusumDailySink: stream ≡ batch on alarm days across a checkpointed restart, and the batch-id guard blocks replay double-counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/stream_cusum_spec"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"

    // a quiet source at ~2/day and a drifting source that jumps to 8/day
    // from day 6 on — the shift the monitor exists to catch
    def day(t: String, d: Long, n: Int): Seq[(String, Long)] =
      Seq.fill(n)((t, d))
    val batch1 = (0L to 5L).flatMap(d => day("quiet", d, 2) ++ day("drift", d, 2))
    val batch2 = (6L to 9L).flatMap(d => day("quiet", d, 2) ++ day("drift", d, 8))

    val in = MemoryStream[(String, Long)]
    def start() = in.toDF().toDF("event_type", "day").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.cusumDailySink(b, id, path)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    val q = start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
    } finally q.stop()

    // restart from the checkpoint: the last batch may be re-offered under
    // its original id; daily counts are ADDITIVE (not a semilattice), so
    // only the committed-id guard keeps the spine exact
    val q2 = start()
    try {
      in.addData(batch2: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val spine = spark.read.parquet(path)
    // stream-folded spine == batch aggregation of the same history
    val want = (batch1 ++ batch2).toDF("event_type", "day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = spine.select("event_type", "day", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "restart/replay must not double-count the daily spine")

    // explicit replay of an already-committed id: a detected no-op
    val lastId = spine.agg(max("last_batch")).head.getLong(0)
    StreamOps.cusumDailySink(batch2.toDF("event_type", "day"), lastId, path)
    val replayed = spark.read.parquet(path).select("event_type", "day", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(replayed == got, "a replayed batch id must not refold")

    // the live monitor (read side) equals the batch CUSUM on the same
    // history: alarm fires on the drifting source's shifted window only
    val live = graft.queries.Events
      .cusumOverDaily(spark.read.parquet(path).select("event_type", "day", "x"))
      .collect()
    val batchCusum = graft.queries.Events
      .cusumOverDaily(
        (batch1 ++ batch2).toDF("event_type", "day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("x")))
      .collect()
    def alarmDays(rows: Array[org.apache.spark.sql.Row]): Set[(String, Long)] =
      rows.filter(_.getAs[Long]("alarm") == 1L)
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"))).toSet
    assert(alarmDays(live) == alarmDays(batchCusum), "stream ≡ batch on alarm days")
    assert(alarmDays(live).nonEmpty && alarmDays(live).forall(_._1 == "drift"),
      s"the alarm must fire on the drifting source only: ${alarmDays(live)}")
    assert(live.filter(_.getAs[String]("event_type") == "quiet").forall(_.getAs[Long]("alarm") == 0L))
  }

  test("knnGraphIngest: batch 1 builds exactly the batch graph, the index survives a checkpointed restart, and stream-maintained recall ties the batch insert (s19m)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{KnnGraphOps => KG}
    val sf  = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val deltaPred = expr("conv(substr(md5(cast(vec_id as string)), 1, 6), 16, 10) % 16 = 3")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      df.select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq
    val baseRows  = rows(emb.filter(!deltaPred))
    val deltaRows = rows(emb.filter(deltaPred))
    val dir  = java.nio.file.Files.createTempDirectory("graft_knn_ingest").toString
    val in   = MemoryStream[(Long, Seq[Double])]
    def start() = StreamOps.knnGraphIngest(
      in.toDF().toDF("vec_id", "embedding"), s"$dir/index", s"$dir/ckpt")

    // run 1: the base corpus as one micro-batch, then STOP
    val q1 = start()
    try { in.addData(baseRows); q1.processAllAvailable() } finally q1.stop()
    val streamedBase = spark.read.parquet(s"$dir/index/edges")
    val batchBase = KG.graphFromCapped(KG.bandCapped(
      emb.filter(!deltaPred)
        .select(col("vec_id"), col("embedding"), KG.quantArr(col("embedding")).as("qa"))))
    assert(streamedBase.exceptAll(batchBase).isEmpty && batchBase.exceptAll(streamedBase).isEmpty,
      "first streamed batch must equal the batch construction bit-for-bit")

    // run 2: NEW query from the same checkpoint inserts the delta batch —
    // the on-disk index (not the query's memory) is the durable state
    val q2 = start()
    try { in.addData(deltaRows); q2.processAllAvailable() } finally q2.stop()
    val edges = spark.read.parquet(s"$dir/index/edges")
    // every inserted node attached (s19m's attach census, here as a set check)
    val deltaIds    = deltaRows.map(_._1).toSet
    val attachedIds = edges.select(col("u")).as[Long].collect().toSet
    assert(deltaIds.subsetOf(attachedIds), "every inserted node must carry an edge")
    // degree invariant across the stream's lifetime
    val n = baseRows.size + deltaRows.size
    assert(edges.count() <= 16L * n, "|E| <= 2·M·n must survive incremental ingest")
    // stream-maintained recall ties the batch insert: the same 7-pass beam
    // over the streamed edges finds the same number of exact-top-8 members
    // as s19m reports (intra-batch delta links may only ADD reachability)
    val beam  = KG.beamTopK(emb, edges, queryVecId = 0L, k = 8, passes = 7)
    val exact = SparkEntry.queries("s19_knn_cosine")(spark, sf).select(col("vec_id")).as[Long].collect().toSet
    val hits  = beam.select(col("vec_id")).as[Long].collect().count(exact)
    val s19mRecall = SparkEntry.queries("s19m_graph_insert")(spark, sf)
      .select(col("recall_pm")).head.getLong(0)
    assert(1000L * hits / 8L >= s19mRecall,
      s"stream-maintained recall ($hits/8) must tie or beat the batch insert ($s19mRecall pm)")
    // replay guard: re-processing the same batch id must not double-append
    val before = edges.count()
    val q3 = start()
    try { q3.processAllAvailable() } finally q3.stop()
    assert(spark.read.parquet(s"$dir/index/edges").count() == before,
      "a replayed/empty trigger must not grow the index")
  }

  test("streaming soak: knnGraphIngest per-batch wall time stays flat as the index grows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Md5Seed
    val in  = MemoryStream[(Long, Seq[Double])]
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_soak").toString
    val q = StreamOps.knnGraphIngest(
      in.toDF().toDF("vec_id", "embedding"), s"$dir/index", s"$dir/ckpt")
    try {
      // md5-derived 64-d vectors, the g3 stub's recipe — deterministic
      def vec(i: Long): Seq[Double] =
        (0 until 64).map(j => Md5Seed.prefixLong(s"soak_${i}_$j", 6) / 16777216.0 - 0.5)
      val perBatch = 16
      val times = (0 until 12).map { b =>
        val vs = (0 until perBatch).map(k => (b * 1000L + k, vec(b * 1000L + k)))
        in.addData(vs: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      // the index grows 12× over the run; probe cost is ∝ batch × bucket
      // occupancy (capped), so per-batch time must stay FLAT
      def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val early = median(times.slice(1, 6))
      val late  = median(times.slice(6, 12))
      assert(
        late <= early * 3.0,
        s"per-batch time grew with index size: early=$early late=$late (${times.mkString(", ")})"
      )
      // every vector entered the bucket index exactly once per band view
      val buckets = spark.read.parquet(s"$dir/index/buckets")
      assert(buckets.count() == 12L * perBatch * graft.operators.KnnGraphOps.Bands)
      // and the degree invariant holds across the whole run
      assert(spark.read.parquet(s"$dir/index/edges").count() <=
        16L * 12L * perBatch, "|E| <= 2·M·n across incremental growth")
    } finally q.stop()
  }
}
