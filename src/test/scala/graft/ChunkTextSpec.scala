package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ChunkText, TokenCount}

/** Property tests for the recursive chunker (F3b) — the invariants the
  * reference's RecursiveCharacterTextSplitter guarantees:
  * every chunk ≤ chunkSize, every chunk is a substring of the input,
  * chunks are emitted in input order, and no input word is lost.
  */
class ChunkTextSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val sep: Gen[String] = Gen.oneOf(" ", "\n", "\n\n", ". ", "? ", "! ")

  private val textGen: Gen[String] = for {
    n     <- Gen.choose(1, 80)
    words <- Gen.listOfN(n, word)
    seps  <- Gen.listOfN(n, sep)
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private val paramsGen: Gen[(String, Int, Int)] = for {
    text      <- textGen
    chunkSize <- Gen.choose(20, 120)
    overlap   <- Gen.choose(0, chunkSize / 2)
  } yield (text, chunkSize, overlap)

  test("every chunk is at most chunkSize characters") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      ChunkText.chunk(text, size, overlap).forall(_.length <= size)
    })
  }

  test("every chunk is a (trimmed) substring of the input") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      ChunkText.chunk(text, size, overlap).forall(text.contains(_))
    })
  }

  test("chunks appear in input order (non-decreasing start positions)") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      val chunks = ChunkText.chunk(text, size, overlap)
      var pos = 0
      chunks.forall { c =>
        val i = text.indexOf(c, pos)
        if (i < pos) false else { pos = i; true }
      }
    })
  }

  test("no word of the input is lost (coverage)") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      val chunks = ChunkText.chunk(text, size, overlap)
      text.split("[\\s.?!]+").filter(_.nonEmpty).forall(w => chunks.exists(_.contains(w)))
    })
  }

  test("regression: retained overlap is evicted when the next piece is large") {
    // 8 × 20-char sentences then one 150-char sentence at size=160/overlap=40:
    // before the eviction fix this emitted a 190-char chunk.
    val small  = List.fill(8)("a" * 18 + ". ").mkString
    val big    = "b" * 150
    val chunks = ChunkText.chunk(small + big, 160, 40)
    chunks.foreach(c => assert(c.length <= 160, s"oversize chunk: ${c.length}"))
    assert(chunks.exists(_.contains(big)))
  }

  test("empty and null input yield no chunks") {
    assert(ChunkText.chunk("", 100, 10).isEmpty)
    assert(ChunkText.chunk(null, 100, 10).isEmpty)
  }

  test("unsplittable run is hard-cut at chunkSize") {
    val text   = "x" * 500
    val chunks = ChunkText.chunk(text, 100, 0)
    assert(chunks.length == 5)
    assert(chunks.forall(_.length == 100))
    assert(chunks.mkString == text)
  }

  test("token-measured chunks never exceed chunkSize tokens") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      ChunkText
        .chunkBy(text, size, overlap, ChunkText.DefaultSeparators, TokenCount.count)
        .forall(TokenCount.count(_) <= size)
    })
  }

  test("token-measured chunks keep substring + coverage invariants") {
    checkProp(Prop.forAll(paramsGen) { case (text, size, overlap) =>
      val chunks =
        ChunkText.chunkBy(text, size, overlap, ChunkText.DefaultSeparators, TokenCount.count)
      chunks.forall(text.contains(_)) &&
      text.split("[\\s.?!]+").filter(_.nonEmpty).forall(w => chunks.exists(_.contains(w)))
    })
  }

  test("TokenCount: alnum runs count ceil(len/4), symbols 1, whitespace 0") {
    assert(TokenCount.count("") == 0)
    assert(TokenCount.count("   ") == 0)
    assert(TokenCount.count("abcd") == 1)
    assert(TokenCount.count("abcde") == 2)
    assert(TokenCount.count("ab3f7 fghi. ") == 4) // 2 + 1 + 1 — the f3c sentence
    assert(TokenCount.count("a,b") == 3)
    assert(TokenCount.count("hello world!") == 2 + 2 + 1) // ceil(5/4) twice + '!'
  }
}
