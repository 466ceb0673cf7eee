package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaStub, Md5Seed}
import graft.functions.MediaStub.MediaInput

/** Property tests for the media decode boundaries (m2's (A)PNG header
  * parser, m12's RIFF/WAV parser): round-trip identity on ARBITRARY
  * payload bytes, and loud failure on a random single-byte corruption of
  * any CRC-protected region — the invariants a real codec front-end
  * guarantees and a length-hash stub can't.
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

  test("PNG container: synthesize → decode round-trips the md5-derived fields for arbitrary payload bytes") {
    checkProp(Prop.forAll(payloadGen) { case (id, bytes) =>
      val f = MediaStub.decode(MediaStub.synthesizeContainer(MediaInput(id, bytes)))
      val h = Md5Seed.prefixLong(bytes, 6)
      f.doc_id == id &&
      f.width == 160 + h % 480 &&
      f.height == 90 + (h / 7) % 270 &&
      f.n_frames == 1 + (h / 11) % 120
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
}
