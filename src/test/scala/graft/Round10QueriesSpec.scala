package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-10 additions (e18/j18/x21/o9/a23/c20/d16/g17)
  * on planted micro-corpora — semantics the row-hash oracle proves equal
  * across engines but can't explain; these pin WHY each answer is right.
  */
class Round10QueriesSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val ns = 1000L // micros → raw nanos longs (the nanosAsLong shape)

  test("e18: transition counts and per-from probabilities") {
    import spark.implicits._
    val events = Seq(
      // user 1: A → B → A ; user 2: A → A
      (1L, 1L, "A", 1000000L * ns),
      (1L, 2L, "B", 2000000L * ns),
      (1L, 3L, "A", 3000000L * ns),
      (2L, 4L, "A", 1000000L * ns),
      (2L, 5L, "A", 2000000L * ns)
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = tmp("e18spec")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("e18_transition_matrix")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("prob_bp")))
      .toMap
    assert(out(("A", "B")) == (1L, 5000L)) // A fans out to B and A equally
    assert(out(("A", "A")) == (1L, 5000L))
    assert(out(("B", "A")) == (1L, 10000L)) // B always goes back to A
    assert(out.size == 3)
  }

  test("j18: stale state (>24h) yields null features, fresh state carries staleness") {
    import spark.implicits._
    val h = 3600L * 1000000L
    val events = Seq(
      (1L, 1L, "signup", 0L * ns, 2.5),
      (1L, 2L, "purchase", 1L * h * ns, 0.0), // 1 h after signup: fresh
      (1L, 3L, "purchase", 25L * h * ns, 0.0), // 25 h after: stale → nulls
      (2L, 4L, "purchase", 1L * h * ns, 0.0) // no signup at all → nulls
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val dir = tmp("j18spec")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("j18_asof_tolerance")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r)
      .toMap
    assert(out(2L).getAs[Long]("ref_event_id") == 1L)
    assert(out(2L).getAs[Long]("ref_value_cents") == 250L)
    assert(out(2L).getAs[Long]("staleness_sec") == 3600L)
    for (id <- Seq(3L, 4L)) {
      assert(out(id).isNullAt(out(id).fieldIndex("ref_event_id")))
      assert(out(id).isNullAt(out(id).fieldIndex("staleness_sec")))
    }
  }

  test("x21: entropy 0 for one class, 1 bit for two equal, 2 bits for four equal") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"), // all letters
      (2L, "ab12"), // letters/digits 50:50
      (3L, "a1 .") // one char per class
    ).toDF("doc_id", "text")
    val dir = tmp("x21spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("x21_char_class_entropy")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("class_entropy_bits"), r.getAs[Double]("dominant_frac")))
      .toMap
    assert(out(1L) == (0.0, 1.0))
    assert(out(2L) == (1.0, 0.5))
    assert(out(3L) == (2.0, 0.25))
  }

  test("o9: shards partition the corpus, positions are dense per shard, order is reproducible") {
    import spark.implicits._
    val docs = (0L until 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = tmp("o9spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = SparkEntry
      .queries("o9_epoch_shuffle")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .sortBy(_._1)
    val a = run()
    assert(a.length == 64)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    // dense ranks: within each shard, positions are exactly 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong))
    }
    // the permutation is a pure function of doc_id — identical on rerun
    assert(run().toSeq == a.toSeq)
    // shard matches an independent md5 computation for a spot-checked doc
    val d0 = java.security.MessageDigest.getInstance("MD5")
      .digest("epoch-7|0".getBytes("UTF-8"))
    val expectedShard = (d0(0) & 0xff) % 8
    assert(a.find(_._1 == 0L).get._2 == expectedShard.toLong)
  }

  test("a23: median follows the shipped quantity, not the row count") {
    import spark.implicits._
    // three rows, but the 2.00 line carries half the quantity: many cheap
    // single-unit rows must NOT outvote it
    val li = Seq(
      ("A", 1.00, 1.0),
      ("A", 2.00, 2.0),
      ("A", 3.00, 1.0)
    ).toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val dir = tmp("a23spec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("a23_weighted_median")(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("wmedian_cents") == 200L)
    assert(out(0).getAs[Long]("total_qty") == 4L)
  }

  test("c20: subdomains of blocked suffixes are blocked, lookalike hosts are not") {
    import spark.implicits._
    val docs = (0L until 8L).map(i => (i, "t")).toDF("doc_id", "text")
    val dir = tmp("c20spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("c20_domain_blocklist")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("blocked"), Option(r.getAs[String]("rule"))))
      .toMap
    assert(out(0L) == (true, Some("ads.example.com"))) // cdn.ads.example.com
    assert(out(1L) == (false, None)) // news.example.org
    assert(out(2L) == (true, Some("tracker.net"))) // exact match
    assert(out(3L) == (false, None)) // u0.blog.example.net
    assert(out(4L) == (true, Some("ads.example.com")))
    assert(out(5L) == (true, Some("spam-site.io"))) // mirror.spam-site.io
    assert(out(6L) == (false, None)) // docs.example.com — suffix, not subdomain
    assert(out(7L) == (true, Some("spam-site.io")))
  }

  test("d16: a planted excerpt is fully contained while Jaccard stays low") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, words)).toDF("doc_id", "text")
    val dir = tmp("d16spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("d16_containment")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2")) ->
        (r.getAs[Long]("containment_bp"), r.getAs[Long]("jaccard_bp")))
      .toMap
    // the 10-word excerpt (8 of 38 shingles) is 100% contained ...
    // (planted at −id−1 since r11: excerpt of doc 7 is doc −8, which sorts
    // as doc1 under least/greatest)
    val (cont, jac) = out((-8L, 7L))
    assert(cont == 10000L)
    // ... while symmetric Jaccard sees ~21% — the pair d1/d4 would miss
    assert(jac == 8L * 10000L / 38L)
    assert(out.size == 1)
  }

  test("c21: the generalization ladder releases at the right level and suppresses the tail") {
    import spark.implicits._
    val docs =
      // 5 en/web docs in ONE length cell → release the full tuple (level 0)
      (1L to 5L).map(i => (i, "en", "web", 100L)) ++
        // 4 en/web docs in four DIFFERENT cells → their (en,web) survivor
        // count is 4 < k, and level-2 (en) survivors are the same 4 → suppressed:
        // the five level-0 docs must NOT prop them up
        Seq((6L, "en", "web", 10L), (7L, "en", "web", 300L),
          (8L, "en", "web", 2000L), (9L, "en", "web", 9000L)) ++
        // 5 en/blog docs in five different cells → generalize to (en, blog) (level 1)
        Seq((10L, "en", "blog", 10L), (11L, "en", "blog", 300L),
          (12L, "en", "blog", 2000L), (13L, "en", "blog", 9000L),
          (14L, "en", "blog", 40000L)) ++
        // 5 de docs all in singleton (source, bucket) cells → lang-only (level 2)
        (15L to 19L).map(i => (i, "de", s"s$i", 100L * i))
    val dir = tmp("c21spec")
    docs.toDF("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("c21_k_anonymity_enforce")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("level"))
      .toMap
    assert(out.size == 19)
    for (i <- 1L to 5L) assert(out(i) == 0L)
    for (i <- 6L to 9L) assert(out(i) == 3L, s"doc $i must be suppressed, got ${out(i)}")
    for (i <- 10L to 14L) assert(out(i) == 1L)
    for (i <- 15L to 19L) assert(out(i) == 2L)
  }

  test("j19: pairs respect the horizon, skip adjacency, and never cross users") {
    import spark.implicits._
    val m = 60L * 1000000L // minute in micros
    val events = Seq(
      (1L, 1L, "A", 0L * m * ns),
      (1L, 2L, "C", 3L * m * ns),  // intervening event — A→B must still count
      (1L, 3L, "B", 5L * m * ns),  // 5 min after A: inside the 10 min horizon
      (1L, 4L, "B", 20L * m * ns), // 20 min after A: outside; 15 after B: outside
      (2L, 5L, "B", 1L * m * ns)   // other user — pairs never cross
    ).toDF("user_id", "event_id", "event_type", "ts")
    val dir = tmp("j19spec")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("j19_followed_by")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_users")))
      .toMap
    assert(out(("A", "C")) == (1L, 1L))
    assert(out(("A", "B")) == (1L, 1L)) // through the intervening C
    assert(out(("C", "B")) == (1L, 1L))
    assert(out.size == 3) // no horizon-violating, no cross-user pairs
  }

  test("pl10: only the partition with the planted input delta flags for recompute") {
    import spark.implicits._
    val d95 = java.sql.Date.valueOf("1995-06-01")
    val d96 = java.sql.Date.valueOf("1996-06-01")
    // 1995 contains key 97 (the simulated prev run lacks it → changed);
    // 1996 has no multiple of 97 → digests agree → unchanged
    val orders = Seq(
      (97L, 1L, d95, 10.0, "1-URGENT"),
      (98L, 2L, d95, 20.0, "2-HIGH"),
      (200L, 3L, d96, 30.0, "3-MEDIUM"),
      (201L, 4L, d96, 40.0, "4-NOT SPECIFIED")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority")
    val dir = tmp("pl10spec")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry
      .queries("pl10_incremental_recompute")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("part_year") ->
        (r.getAs[Boolean]("changed"), r.getAs[Long]("recompute_rows")))
      .toMap
    assert(out(1995L) == (true, 2L)) // whole partition re-lands, not one row
    assert(out(1996L) == (false, 0L))
    assert(out.size == 2)
  }

  test("x22: function words spread wide, template terms concentrate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the spam spam spam"), // 'spam' bursts: 3 hits in 1 doc
      (2L, "the cat")
    ).toDF("doc_id", "text")
    val dir = tmp("x22spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("x22_term_burstiness")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("cf"), r.getAs[Long]("df"),
          r.getAs[Long]("burst_pm"), r.getAs[Long]("coverage_pm")))
      .toMap
    assert(out("the") == (2L, 2L, 1000L, 1000L)) // everywhere, never repeated
    assert(out("spam") == (3L, 1L, 3000L, 500L)) // concentrated
    assert(out("cat") == (1L, 1L, 1000L, 500L))
  }

  test("d17: nested plane prefixes never increase pair cost; identical vectors stay together") {
    import spark.implicits._
    // 4 copies of v share every sign bit; 2 copies of -v flip every bit —
    // at ANY plane count the census is the same: 2 buckets, C(4,2)+C(2,2)=7
    // raw pairs (no plane dot is exactly 0 for this v)
    val v    = Array.tabulate(64)(j => (0.1f + 0.01f * j) * (if (j % 3 == 0) -1 else 1))
    val negV = v.map(x => -x)
    val rows = (1L to 4L).map(i => (i, v.toSeq)) ++ Seq((5L, negV.toSeq), (6L, negV.toSeq))
    val dir  = tmp("d17spec")
    rows.toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry
      .queries("d17_plane_tuning")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("n_planes") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("hot_buckets"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("raw_pairs")))
      .toMap
    assert(out.keySet == Set(2L, 3L, 4L, 5L, 6L))
    for (k <- 2L to 6L) assert(out(k) == (2L, 2L, 4L, 7L))
  }

  test("x23: the far vector flags as a 3-sigma distance outlier, the tight cluster doesn't") {
    import spark.implicits._
    val base = Seq.fill(64)(0.5f)
    val far  = Seq.fill(64)(-0.5f)
    val rows = (1L to 10L).map(i => (i, base, 0)) :+ (11L, far, 0)
    val dir  = tmp("x23spec")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry
      .queries("x23_embedding_outliers")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("is_outlier"))
      .toMap
    assert(out.size == 11)
    assert(out(11L) == 1, "the far vector must flag")
    for (i <- 1L to 10L) assert(out(i) == 0, s"tight-cluster vector $i must not flag")
  }

  test("g18: K4 members are perfectly clustered, the bridge hub is diluted") {
    import spark.implicits._
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(
        (2L * i, a.toLong), (2L * i, b.toLong),
        (2L * i + 1, a.toLong), (2L * i + 1, b.toLong)
      )
    }
    val dir = tmp("g18spec")
    rows.toDF("l_partkey", "l_suppkey").write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("g18_clustering_coeff")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("supplier") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"), r.getAs[Long]("coeff_pm")))
      .toMap
    for (v <- 1L to 3L) assert(out(v) == (3L, 3L, 1000L)) // clique corner
    assert(out(4L) == (4L, 3L, 500L)) // same triangles, diluted by the bridge
    assert(!out.contains(5L)) // degree-1 leaf has no defined coefficient
  }

  test("f1h: marker-free text repairs, any U+FFFD refuses the whole-string repair") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (6L, "x")).toDF("doc_id", "text")
    val dir = tmp("f1hspec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("f1h_lossy_refusal")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("cleaned"), r.getAs[Long]("n_replacement"), r.getAs[Boolean]("lossy")))
      .toMap
    assert(out(1L) == ("Café1", 0L, false)) // mojibake repaired, nothing lost
    // both markers present → conservative refusal: mojibake kept, markers intact
    assert(out(6L) == ("CafÃ©6 lost��bytes tail�", 3L, true))
  }

  test("g17: truss peel drops the triangle-free bridge edge, keeps the K4") {
    import spark.implicits._
    // K4 over suppliers 1..4 (each pair shares 2 exclusive parts) plus a
    // bridge 4–5 (2 shared parts, but no triangle through it)
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(
        (2L * i, a.toLong), (2L * i, b.toLong),
        (2L * i + 1, a.toLong), (2L * i + 1, b.toLong)
      )
    }
    val li = rows.toDF("l_partkey", "l_suppkey")
    val dir = tmp("g17spec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry
      .queries("g17_ktruss")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_edges"))
      .toMap
    assert(out("s0_initial") == 7L)
    assert(out("s1_after_pass1") == 6L) // bridge 4–5 peeled
    assert(out("s2_after_pass2") == 6L) // K4 is stable: every edge has support 2
  }

  test("x24: winnowing density bound and position-independent selection") {
    import spark.implicits._
    // passage P of 30 distinct words; doc 2 is P shifted right by 5 pad words
    val passage = (1 to 30).map(i => s"p$i").mkString(" ")
    val shifted = (1 to 5).map(i => s"pad$i").mkString(" ") + " " + passage
    val docs    = Seq((1L, passage), (2L, shifted)).toDF("doc_id", "text")
    val dir     = tmp("x24spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("x24_winnowing")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_windows"),
          r.getAs[Long]("n_fingerprints"), r.getAs[String]("selection_md5")))
      .toMap
    val (g1, w1, f1, _) = out(1L)
    // w = 4 windows over k = 3 grams: counts follow from the word counts
    assert(g1 == 28 && w1 == 25)
    // density: >= 1 selection per w consecutive windows (each chosen value
    // covers at most w overlapping windows when hashes are distinct), and
    // never more than one per window
    assert(f1 >= (w1 + 3) / 4 && f1 <= w1)
    // position independence (the winnowing guarantee): doc 2 contains the
    // SAME passage shifted by 5 words, so every fingerprint doc 1 selects
    // from P's interior is also selected by doc 2 — their selections
    // cannot be disjoint, and md5s differ only because doc 2 adds the
    // pad-boundary grams. Recompute both selections directly to compare.
    def select(text: String): Set[Long] = {
      val ws = text.split(" ")
      val hs = (0 to ws.length - 3).map { i =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(ws.slice(i, i + 3).mkString(" ").getBytes("UTF-8"))
            .take(3).map("%02x".format(_)).mkString, 16)
      }
      (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).toSet
    }
    val s1 = select(passage)
    val s2 = select(shifted)
    assert((s1 intersect s2).size >= s1.size / 2, s"selections nearly disjoint: ${s1.size} vs ${(s1 intersect s2).size}")
  }
}
