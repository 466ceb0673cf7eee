package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaStub, Md5Seed}
import graft.functions.MediaStub.MediaInput

/** Property tests for the media decode boundaries (m2's (A)PNG header
  * parser + zlib IDAT inflate, m12's RIFF/WAV parser): round-trip identity
  * on ARBITRARY payload bytes, loud failure on a random single-byte
  * corruption of any CRC-protected region, loud failure on a corrupt zlib
  * adler32 even when the chunk CRC is valid, the RIFF odd-chunk pad rule,
  * and the no-trailing-bytes contracts — the invariants a real codec
  * front-end guarantees and a length-hash stub can't.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val payloadGen: Gen[(Long, Array[Byte])] = for {
    id <- Gen.choose(0L, 1000000L)
    n  <- Gen.choose(0, 512)
    bs <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
  } yield (id, bs.toArray)

  /** The oracle's pixel arithmetic, recomputed independently of
    * [[MediaStub.pixelBytes]]: byte i = byte (i mod 16) of
    * md5(payload ++ "|px" ++ (i div 16)).
    */
  private def oraclePixSum(payload: Array[Byte]): Long =
    (0 until 64).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(payload)
      md.update(s"|px${i / 16}".getBytes("US-ASCII"))
      md.digest()(i % 16) & 0xffL
    }.sum

  test("PNG container: synthesize → decode round-trips the md5-derived fields (incl. the inflated pixel sum) for arbitrary payload bytes") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val f = MediaStub.decode(MediaStub.synthesizeContainer(MediaInput(id, bytes)))
      val h = Md5Seed.prefixLong(bytes, 6)
      f.doc_id == id &&
      f.width == 160 + h % 480 &&
      f.height == 90 + (h / 7) % 270 &&
      f.n_frames == 1 + (h / 11) % 120 &&
      f.pix_sum == oraclePixSum(bytes)
    })
  }

  test("WAV container: synthesize → decode round-trips rate/sample geometry and energy is position-exact for arbitrary payload bytes") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val f = MediaStub.decodeWav(MediaStub.synthesizeWav(MediaInput(id, bytes)))
      val h = Md5Seed.prefixLong(bytes, 6)
      val n = 256 + (h % 256)
      // recompute the peak from the generation formula — the parser must
      // agree with the arithmetic the oracle uses
      def s(k: Long): Long = (h + 2654435761L * k) % 65536L - 32768L
      val energies = (0L until n / 64).map(w => (w, (w * 64 until w * 64 + 64).map(k => s(k) * s(k)).sum))
      val (pw, pe) = energies.maxBy { case (w, e) => (e, -w) }
      f.doc_id == id && f.sample_rate == 8000L * (1 + (h / 5) % 6) &&
      f.n_samples == n && f.n_windows == n / 64 &&
      f.peak_window == pw && f.peak_energy == pe
    })
  }

  test("PNG container: flipping any byte of a CRC-protected chunk fails loudly, never mis-decodes") {
    val corruptGen = for {
      p   <- payloadGen
      enc  = MediaStub.synthesizeContainer(MediaInput(p._1, p._2))
      // byte 8 onward = chunk stream; flip somewhere in the IHDR/acTL
      // region (offsets 8..49: both fully CRC-protected chunks)
      off <- Gen.choose(8, 49)
      bit <- Gen.choose(0, 7)
    } yield (enc, off, bit)
    checkProp(Prop.forAll(corruptGen) { case (enc, off, bit) =>
      val bad = enc.payload.clone()
      bad(off) = (bad(off) ^ (1 << bit)).toByte
      try { MediaStub.decode(MediaInput(enc.doc_id, bad)); false }
      catch { case _: IllegalArgumentException => true }
    })
  }

  /** Walk the PNG chunk stream and return (dataOff, dataLen) of the first
    * chunk of the given type — test-side mirror of the decoder's walk.
    */
  private def findChunk(b: Array[Byte], chunkType: String): (Int, Int) = {
    def be32(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    var off = 8
    while (new String(b, off + 4, 4, "US-ASCII") != chunkType) off += 12 + be32(off)
    (off + 8, be32(off))
  }

  test("PNG container: a corrupt zlib adler32 in IDAT fails loudly even when the chunk CRC is re-patched valid — the inflate is real, not a CRC proxy") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc = MediaStub.synthesizeContainer(MediaInput(id, bytes))
      val bad = enc.payload.clone()
      val (dOff, dLen) = findChunk(bad, "IDAT")
      // flip a bit in the adler32 trailer (last 4 bytes of the zlib
      // stream), then RECOMPUTE the chunk CRC so only the inflater can
      // catch it
      bad(dOff + dLen - 1) = (bad(dOff + dLen - 1) ^ 0x01).toByte
      val crc = new java.util.zip.CRC32
      crc.update(bad, dOff - 4, 4 + dLen)
      val v = crc.getValue
      bad(dOff + dLen) = (v >>> 24).toByte
      bad(dOff + dLen + 1) = (v >>> 16).toByte
      bad(dOff + dLen + 2) = (v >>> 8).toByte
      bad(dOff + dLen + 3) = v.toByte
      try { MediaStub.decode(MediaInput(id, bad)); false }
      catch { case _: IllegalArgumentException => true }
    })
  }

  test("PNG container: the fixed-Huffman encoder is bit-exact RFC 1951 — Inflater round-trips it to the same bytes as the stored form, and a corrupt Huffman body fails loudly under a re-patched chunk CRC") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val px = MediaStub.pixelBytes(bytes)
      def inflate(z: Array[Byte]): Array[Byte] = {
        val inf = new java.util.zip.Inflater()
        inf.setInput(z)
        val out = new Array[Byte](4096)
        val n   = inf.inflate(out)
        assert(inf.finished(), "stream must finish (adler verified)")
        out.take(n)
      }
      val viaFixed   = inflate(MediaStub.zlibFixedHuffman(px))
      val viaStored  = inflate(MediaStub.zlibStored(px))
      val viaDynamic = inflate(MediaStub.zlibDynamicHuffman(px))
      val roundTrip = viaFixed.sameElements(px) && viaStored.sameElements(px) &&
        viaDynamic.sameElements(px)
      // and whichever of the three forms this hash's container carries:
      // full synthesize → decode agrees on pix_sum regardless of block type
      val f      = MediaStub.decode(MediaStub.synthesizeContainer(MediaInput(id, bytes)))
      val sumOk  = f.pix_sum == px.map(_ & 0xffL).sum
      // corrupt one bit INSIDE the Huffman body (not header, not adler),
      // re-patch the chunk CRC: only the real inflate path can catch it
      val enc          = MediaStub.synthesizeContainer(MediaInput(id, bytes))
      val (dOff, dLen) = findChunk(enc.payload, "IDAT")
      val bad          = enc.payload.clone()
      bad(dOff + dLen / 2) = (bad(dOff + dLen / 2) ^ 0x10).toByte
      val crc = new java.util.zip.CRC32
      crc.update(bad, dOff - 4, 4 + dLen)
      val v = crc.getValue
      bad(dOff + dLen) = (v >>> 24).toByte
      bad(dOff + dLen + 1) = (v >>> 16).toByte
      bad(dOff + dLen + 2) = (v >>> 8).toByte
      bad(dOff + dLen + 3) = v.toByte
      val loud =
        try { MediaStub.decode(MediaInput(id, bad)); false }
        catch { case _: IllegalArgumentException => true }
      roundTrip && sumOk && loud
    })
  }

  test("PNG container: bytes trailing IEND fail loudly (fails-loudly contract covers the whole stream)") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc = MediaStub.synthesizeContainer(MediaInput(id, bytes))
      val bad = enc.payload :+ 0x00.toByte
      try { MediaStub.decode(MediaInput(id, bad)); false }
      catch { case _: IllegalArgumentException => true }
    })
  }

  test("WAV container: an odd-length ancillary chunk is padded to an even offset (RIFF pad rule) and decode is unchanged") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc  = MediaStub.synthesizeWav(MediaInput(id, bytes))
      val base = enc.payload
      // splice an odd-length "note" chunk (3 data bytes + 1 pad byte)
      // between "fmt " (ends at 36: 12-byte RIFF/WAVE header + 8 + 16)
      // and "data", patching the RIFF size
      val note = "note".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3) ++ Array[Byte](0)
      val spliced = base.slice(0, 36) ++ note ++ base.drop(36)
      val sz = (base.length - 8) + note.length
      spliced(4) = sz.toByte
      spliced(5) = (sz >>> 8).toByte
      spliced(6) = (sz >>> 16).toByte
      spliced(7) = (sz >>> 24).toByte
      MediaStub.decodeWav(MediaInput(id, spliced)) == MediaStub.decodeWav(enc)
    })
  }

  test("MP4 container: synthesize → decode round-trips the md5-derived movie header for arbitrary payloads, across v0/v1, largesize, and to-EOF box forms") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val f = MediaStub.decodeMp4(MediaStub.synthesizeMp4(MediaInput(id, bytes)))
      val h  = Md5Seed.prefixLong(bytes, 6)
      val ts = 600L * (1 + h % 8)
      val du = ts * (1 + (h / 7) % 300) + (h / 11) % ts
      f.doc_id == id && f.version == h % 2 && f.timescale == ts && f.duration == du &&
      f.duration_ms == 1000L * du / ts && f.n_tracks == (h / 13) % 4 + 1 &&
      f.payload_bytes == bytes.length.toLong
    })
  }

  test("MP4 container: truncation and corrupt box sizes fail loudly, never mis-decode") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc = MediaStub.synthesizeMp4(MediaInput(id, bytes))
      // cut PAST the trailing free box (12 bytes): a size=0 to-EOF box
      // legitimately absorbs small tail truncations by the format, so the
      // cut must reach the rawd/moov structure to be detectable
      val truncated = MediaInput(id, enc.payload.dropRight(13 + (id % 7).toInt))
      val overrun = {
        val bad = enc.payload.clone()
        // inflate the ftyp box size so it overruns the file
        bad(0) = 0x7f.toByte
        MediaInput(id, bad)
      }
      def loud(in: MediaInput): Boolean =
        try { MediaStub.decodeMp4(in); false }
        catch { case _: IllegalArgumentException => true }
      loud(truncated) && loud(overrun)
    })
  }

  test("MP4 container: stsd/stco walk — codec fourcc, chunk count and REAL offsets round-trip; corrupt tables fail loudly") {
    def idxOf(hay: Array[Byte], needle: String): Int = {
      val n = needle.getBytes("US-ASCII")
      hay.indices
        .find(i => i + n.length <= hay.length && n.indices.forall(j => hay(i + j) == n(j)))
        .get
    }
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val h       = Md5Seed.prefixLong(bytes, 6)
      val enc     = MediaStub.synthesizeMp4(MediaInput(id, bytes))
      val f       = MediaStub.decodeMp4(enc)
      val nChunks = (h / 17) % 8 + 1
      val codecOk = f.codec == Seq("avc1", "hev1", "mp4v", "av01")((h / 19 % 4).toInt)
      val tableOk = f.n_chunks == nChunks &&
        f.chunk_span == (nChunks - 1) * (bytes.length.toLong / nChunks)
      // the real stco box precedes the rawd payload, so the first ASCII
      // match is the genuine box type (mvhd's numeric fields can't spell it)
      val i = idxOf(enc.payload, "stco")
      def loud(mut: Array[Byte] => Unit): Boolean = {
        val bad = enc.payload.clone(); mut(bad)
        try { MediaStub.decodeMp4(MediaInput(id, bad)); false }
        catch { case _: IllegalArgumentException => true }
      }
      // declared entry count disagrees with the box extent (count <= 8, no wrap)
      val countCorrupt = loud(b => b(i + 11) = (b(i + 11) + 1).toByte)
      // first offset re-pointed at byte 0 — outside the rawd payload: the
      // corrupt container a demuxer must refuse, not read another box's bytes
      val rangeCorrupt = loud { b =>
        b(i + 12) = 0; b(i + 13) = 0; b(i + 14) = 0; b(i + 15) = 0
      }
      codecOk && tableOk && countCorrupt && rangeCorrupt
    })
  }

  test("MP4 container: an unknown mvhd version fails loudly (a real sniffer must not guess field widths)") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc = MediaStub.synthesizeMp4(MediaInput(id, bytes))
      val bad = enc.payload.clone()
      // mvhd payload starts right after ftyp(24) + moov hdr(8) + mvhd hdr(8)
      bad(40) = 7.toByte
      try { MediaStub.decodeMp4(MediaInput(id, bad)); false }
      catch { case _: IllegalArgumentException => true }
    })
  }

  test("WAV container: trailing bytes inside the declared RIFF size fail loudly") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val enc = MediaStub.synthesizeWav(MediaInput(id, bytes))
      // append 3 bytes AND patch the RIFF size so the size check passes —
      // only the end-of-walk contract can catch the leftover
      val bad = enc.payload ++ Array[Byte](0, 0, 0)
      val sz  = bad.length - 8
      bad(4) = sz.toByte
      bad(5) = (sz >>> 8).toByte
      bad(6) = (sz >>> 16).toByte
      bad(7) = (sz >>> 24).toByte
      try { MediaStub.decodeWav(MediaInput(id, bad)); false }
      catch { case _: IllegalArgumentException => true }
    })
  }
}
