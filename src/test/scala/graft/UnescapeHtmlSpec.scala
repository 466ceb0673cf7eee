package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnescapeHtml

/** Property tests for the HTML-entity leg of the text-repair chain. */
class UnescapeHtmlSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def un(s: String): String =
    UnescapeHtml.unescape(UTF8String.fromString(s)).toString

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c   => c.toString
  }

  private val plainGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ',', '&', '<', '>', '"', '#', ';')
    )).map(_.mkString)

  test("escape-then-unescape is the identity on arbitrary text") {
    checkProp(Prop.forAll(plainGen) { s => un(esc(s)) == s })
  }

  test("identity on entity-free text (no '&' means no change)") {
    checkProp(Prop.forAll(plainGen.map(_.replace("&", ""))) { s => un(s) == s })
  }

  test("numeric entities decode to their code point for any valid scalar") {
    val cpGen = Gen.frequency(
      9 -> Gen.choose(1, 0xd7ff),
      1 -> Gen.choose(0xe000, 0x10ffff)
    )
    checkProp(Prop.forAll(cpGen) { cp =>
      val expected = new String(Character.toChars(cp))
      un(s"a&#$cp;b") == s"a${expected}b" &&
      un(s"a&#x${cp.toHexString};b") == s"a${expected}b"
    })
  }

  test("surrogate and out-of-range code points pass through verbatim") {
    val badGen = Gen.oneOf(Gen.choose(0xd800, 0xdfff), Gen.choose(0x110000, 0x7ffffff))
    checkProp(Prop.forAll(badGen) { cp =>
      val s = s"a&#$cp;b"
      un(s) == s
    })
  }

  test("Latin-1/cp1252 named repertoire decodes; unknown names still pass through") {
    assert(un("&Atilde;&copy;") == "Ã©") // the f1e mojibake building block
    assert(un("&eacute;&macr;&euro;&trade;&hellip;") == "é¯€™…")
    assert(un("caf&eacute; &ndash; 5&cent;") == "café – 5¢")
    // names outside the table are NOT guessed at
    assert(un("&alpha; &clubs; &unknown;") == "&alpha; &clubs; &unknown;")
    // case matters, as in HTML: &Eacute; and &eacute; differ, &COPY; is unknown
    assert(un("&Eacute;&eacute;") == "Éé")
    assert(un("&COPY;") == "&COPY;")
  }
}
