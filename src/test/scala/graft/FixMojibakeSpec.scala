package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixMojibake

/** Unit tests for the ftfy-core mojibake repair: UTF-8 mis-decoded as
  * Latin-1/cp1252 is undone (including doubly-encoded text), while clean
  * ASCII, legitimate accented text, and non-Latin text pass through.
  */
class FixMojibakeSpec extends AnyFunSuite {

  private def fix(s: String): String =
    FixMojibake.fix(UTF8String.fromString(s)).toString

  private def mojibake(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  test("repairs UTF-8-as-Latin-1 mojibake") {
    assert(fix("CafÃ©") == "Café")
    assert(fix(mojibake("Café résumé — naïve")) == "Café résumé — naïve")
  }

  test("repairs cp1252-special mojibake (euro, curly quotes)") {
    // € is E2 82 AC in UTF-8; cp1252-decoded that renders as â‚¬
    assert(fix("â‚¬100") == "€100")
    assert(fix(mojibake("“quoted” — ‘single’ €")) == "“quoted” — ‘single’ €")
  }

  test("repairs doubly-encoded mojibake via the fixed-point loop") {
    assert(fix(mojibake(mojibake("héllo wörld"))) == "héllo wörld")
  }

  test("leaves clean and legitimately accented text untouched") {
    assert(fix("hello world") == "hello world")
    assert(fix("naïve café — legit") == "naïve café — legit")
    assert(fix("Ω non-latin ασδ") == "Ω non-latin ασδ")
    assert(fix("emoji 😀 stays") == "emoji 😀 stays")
    assert(fix("") == "")
    assert(fix("é") == "é") // lone accent: no valid UTF-8 reading
  }
}
