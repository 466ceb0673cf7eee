package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** Column-level tests for F1/F2 against a local session — the F2 cases mirror
  * the reference's own unit expectations (Oxford comma, two-item "and",
  * single item, empty, order-preserving dedup —
  * reference: tests/data_pipeline/utils/test_data_transformation_helpers.py:10-29).
  */
class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def natural(items: Seq[String]): String = {
    import spark.implicits._
    Seq(Tuple1(items)).toDF("items").select(TF.naturalList($"items")).head.getString(0)
  }

  test("naturalList: empty list → empty string") {
    assert(natural(Seq.empty) == "")
  }

  test("naturalList: single item") {
    assert(natural(Seq("techno")) == "techno")
  }

  test("naturalList: two items joined with 'and'") {
    assert(natural(Seq("techno", "house")) == "techno and house")
  }

  test("naturalList: three+ items use the Oxford comma") {
    assert(natural(Seq("techno", "house", "ambient")) == "techno, house, and ambient")
    assert(
      natural(Seq("a", "b", "c", "d")) == "a, b, c, and d"
    )
  }

  test("naturalList: duplicates removed preserving first-occurrence order") {
    assert(natural(Seq("techno", "house", "techno")) == "techno and house")
  }

  test("cleanText: collapses whitespace/newlines, unescapes quotes, trims, NFKC") {
    import spark.implicits._
    val out = Seq(
      "  a\\\"quoted\\\"  \n\r  text  ",
      "ﬁne" // U+FB01 ligature: NFKC → "fine"
    ).toDF("t").select(TF.cleanText($"t")).collect().map(_.getString(0))
    assert(out(0) == "a\"quoted\" text")
    assert(out(1) == "fine")
  }

  test("normalizeUrl: scheme/host case, default ports, fragments, trailing noise") {
    import spark.implicits._
    val cases = Seq(
      "HTTP://Example.COM:80/docs/5/"        -> "http://example.com/docs/5",
      "http://example.com/docs/5"            -> "http://example.com/docs/5",
      "http://example.com:80/docs/5#sec-20"  -> "http://example.com/docs/5",
      "http://EXAMPLE.com/docs/5/?"          -> "http://example.com/docs/5",
      "HTTPS://Example.com:443/A/B"          -> "https://example.com/A/B", // path case kept
      "https://example.com:8443/x"           -> "https://example.com:8443/x", // non-default port kept
      "http://example.com/p?x=1"             -> "http://example.com/p?x=1", // real query kept
      "no-scheme/path/"                      -> "no-scheme/path" // scheme-less: only tail cleanup
    )
    val got = cases.map(_._1).toDF("u")
      .select(TF.normalizeUrl($"u")).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
  }

  /** The F1/pl3/pl7 DuckDB oracles do not model the mojibake-repair stage of
    * cleanText — parity requires `graft_fix_mojibake` to be the identity on
    * every corpus those oracles read (r4 ADVICE). This pins the precondition:
    * if a future test-data or fixture change introduces repairable mojibake,
    * this fails loudly instead of the gate diverging silently.
    */
  test("unescapeHtml: numeric + named entities decode, malformed pass through") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      "Fish &amp; Chips &lt;b&gt; &quot;hi&quot; &apos;y&apos;",
      "caf&#233; costs &#x20AC;5&nbsp;now",
      "no entities here",
      "broken &amp no-semi &unknown; &#; &#xZZ; &#1114112; keep & alone",
      "&amp;amp; stays single-decoded"
    ).toDF("t").select(call_function("graft_unescape_html", col("t"))).collect().map(_.getString(0))
    assert(rows(0) == "Fish & Chips <b> \"hi\" 'y'")
    assert(rows(1) == "café costs €5\u00a0now") // &nbsp; → U+00A0
    assert(rows(2) == "no entities here")
    assert(rows(3) == "broken &amp no-semi &unknown; &#; &#xZZ; &#1114112; keep & alone")
    assert(rows(4) == "&amp; stays single-decoded") // one pass, ftfy-style
  }

  test("mojibake repair and entity unescape are identity on every cleanText oracle corpus") {
    import org.apache.spark.sql.functions._
    val repaired = call_function(
      "graft_unescape_html",
      call_function("graft_fix_mojibake", col("t"))
    )
    def assertNeutral(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val n = df.filter(repaired =!= col("t")).count()
      assert(n == 0, s"$what: $n rows would be altered by the repair chain")
    }
    for {
      sf <- Seq("sf0.001", "sf0.01")
      dir = s"/root/testdata/$sf"
      if new java.io.File(s"$dir/documents.parquet").exists()
    } {
      assertNeutral(
        Engine.table(spark, dir, "documents").select(col("text").as("t")),
        s"$sf documents.text")
      assertNeutral(
        graft.sources.Fixtures.artistIndexRaw(spark, dir).select(col("name").as("t")),
        s"$sf artistIndexRaw.name")
    }
  }
}
