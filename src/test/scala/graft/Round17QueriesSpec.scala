package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-17 changes — the properties the row-hash
  * oracle proves equal but can't explain.
  */
class Round17QueriesSpec extends AnyFunSuite with SparkTestBase {

  test("x24: a document with fewer than k=3 words yields ZERO grams and windows (full-window contract), not one partial-window hash") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The testdata corpora have no short docs, so the pre-r17 clamp
    // (`greatest(len - 3, 0)` → one gram hashing the whole 2-word list)
    // passed the gate while violating graft_word_ngrams' documented
    // full-window contract (Shingles.scala:109-111). Plant one.
    val dir = java.nio.file.Files.createTempDirectory("x24short").toString
    Seq(
      (1L, "two words"),
      (2L, "exactly three words"),
      (3L, "a longer document with enough words for real windows here")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry
      .queries("x24_winnowing")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap

    val short = rows(1L)
    assert(short.getAs[Long]("n_grams") == 0L, "2-word doc: no full k=3 window exists")
    assert(short.getAs[Long]("n_windows") == 0L)
    assert(short.getAs[Long]("n_fingerprints") == 0L)
    assert(short.isNullAt(short.fieldIndex("density_pm")), "0 windows → density undefined, not a division")
    // md5 of the empty selection — same constant either engine derives
    assert(short.getAs[String]("selection_md5") == "d41d8cd98f00b204e9800998ecf8427e")

    val exact = rows(2L)
    assert(exact.getAs[Long]("n_grams") == 1L, "3-word doc: exactly one full window")
    assert(exact.getAs[Long]("n_windows") == 1L, "fewer grams than w=4 → one window over all grams")
    assert(exact.getAs[Long]("n_fingerprints") == 1L)

    val long = rows(3L)
    assert(long.getAs[Long]("n_grams") == 8L, "10 words → 8 full k=3 windows")
    assert(long.getAs[Long]("n_windows") == 5L, "8 grams → 5 w=4 windows")
  }

  test("x42: every planted loop is caught at its period (or a divisor), no natural document is flagged, and rep_pm separates the classes") {
    val rows = SparkEntry
      .queries("x42_loop_detector")(spark, "/root/testdata/sf0.001")
      .collect()
    val (planted, natural) = rows.partition(_.getAs[Boolean]("planted"))
    assert(planted.nonEmpty && natural.nonEmpty)
    // a 4-word phrase repeated 8x loops at period 4 — or a DIVISOR if the
    // phrase has internal structure; never longer, never unflagged
    planted.foreach { r =>
      val p = r.getAs[Long]("loop_period")
      assert(p >= 1 && p <= 4, s"planted doc ${r.getAs[Long]("doc_id")} period $p")
      assert(r.getAs[Long]("rep_pm") == 1000L)
    }
    natural.foreach { r =>
      assert(r.getAs[Long]("loop_period") == 0L,
        s"natural doc ${r.getAs[Long]("doc_id")} falsely flagged")
    }
    val maxNat = natural.map(_.getAs[Long]("rep_pm")).max
    assert(maxNat < 1000L, s"natural tails must not score a perfect period (max $maxNat)")
  }

  test("m2's decode boundary is a real header parser: round-trip, still-PNG frame default, and loud failures on corrupt bytes") {
    import graft.functions.MediaStub
    import graft.functions.MediaStub.MediaInput

    // round-trip: the container the synthesis step writes parses back to
    // exactly the md5-derived fields
    val in  = MediaInput(7L, "some synthetic document payload".getBytes("UTF-8"))
    val enc = MediaStub.synthesizeContainer(in)
    val f   = MediaStub.decode(enc)
    val h   = graft.functions.Md5Seed.prefixLong(in.payload, 6)
    assert(f.doc_id == 7L)
    assert(f.width == 160 + h % 480)
    assert(f.height == 90 + (h / 7) % 270)
    assert(f.n_frames == 1 + (h / 11) % 120)

    // a still PNG (no acTL chunk) decodes with the APNG default of 1 frame
    val stripped = {
      val b    = enc.payload
      // walk chunks, dropping acTL: 8-byte signature, then len|type|data|crc
      val outB = Array.newBuilder[Byte]
      outB ++= b.take(8)
      var off = 8
      while (off < b.length) {
        val len = (((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)).toInt
        val t = new String(b, off + 4, 4, "US-ASCII")
        if (t != "acTL") outB ++= b.slice(off, off + 12 + len)
        off += 12 + len
      }
      MediaInput(8L, outB.result())
    }
    assert(MediaStub.decode(stripped).n_frames == 1L, "no acTL → still image, 1 frame")

    // corrupt media must FAIL, not silently score as decoded: bad
    // signature, and a flipped byte inside a CRC-protected chunk
    intercept[IllegalArgumentException] {
      MediaStub.decode(MediaInput(9L, "not a png at all".getBytes("UTF-8")))
    }
    val flipped = enc.payload.clone()
    flipped(16) = (flipped(16) ^ 0x01).toByte // inside IHDR data
    val e = intercept[IllegalArgumentException](MediaStub.decode(MediaInput(10L, flipped)))
    assert(e.getMessage.contains("CRC"), s"expected a CRC failure, got: ${e.getMessage}")
  }
}
