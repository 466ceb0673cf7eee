package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ParseSections

/** Unit tests for the section parser (F4), mirroring the reference's
  * behavior: Introduction default for the lead block, stop at the first
  * excluded header (case-insensitively), min-length content filter, output
  * in document order.
  */
class ParseSectionsSpec extends AnyFunSuite {

  private val pad = " lengthy enough content to clear the minimum threshold"

  test("lead block defaults to Introduction; sections in document order") {
    val text =
      s"""Lead paragraph.$pad
         |== History ==
         |History content.$pad
         |== Style ==
         |Style content.$pad""".stripMargin
    val out = ParseSections.parse(text, 30)
    assert(out.map(_._1) == Seq("Introduction", "History", "Style"))
    assert(out.head._2.startsWith("Lead paragraph."))
  }

  test("stops at the first excluded header, dropping everything after") {
    val text =
      s"""Lead.$pad
         |== References ==
         |ref content that must never appear$pad
         |== Legacy ==
         |also unreachable$pad""".stripMargin
    val out = ParseSections.parse(text, 30)
    assert(out.map(_._1) == Seq("Introduction"))
    assert(!out.exists(_._2.contains("unreachable")))
  }

  test("exclusion match is case-insensitive (reference lowercases both sides)") {
    for (header <- Seq("REFERENCES", "External Links", "see also")) {
      val text =
        s"""Lead.$pad
           |== $header ==
           |tail$pad""".stripMargin
      val out = ParseSections.parse(text, 30)
      assert(out.map(_._1) == Seq("Introduction"), s"did not stop at '$header'")
    }
  }

  test("sections shorter than minLen are dropped") {
    val text =
      s"""short
         |== Kept ==
         |This content is long enough to be kept.$pad""".stripMargin
    val out = ParseSections.parse(text, 30)
    assert(out.map(_._1) == Seq("Kept"))
  }

  test("empty / null input yields nothing") {
    assert(ParseSections.parse("", 30).isEmpty)
    assert(ParseSections.parse(null, 30).isEmpty)
  }
}
