package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_unescape_html(text)` — the HTML-entity leg of ftfy's repair
  * pipeline (reference: utils/data_transformation_helpers.py:28-86 runs
  * `ftfy.fix_text`, whose defaults include `unescape_html`; SURVEY §7.5.3
  * scoped this tail out in rounds 3–5 — this closes it for the entity
  * repertoire that actually occurs in scraped text):
  *
  *   - numeric entities, decimal `&#233;` and hex `&#x20AC;`, for any
  *     valid non-surrogate code point;
  *   - the core named set `&amp; &lt; &gt; &quot; &apos; &nbsp;` (the six
  *     that dominate real corpora) plus the Latin-1/cp1252 high-byte names
  *     (`&copy; &Atilde; &acirc; &euro; &hellip; …`) — the characters
  *     MOJIBAKE produces, so an entity-encoded mojibake mix
  *     ("&Atilde;&copy;" for "Ã©") unescapes back to raw mojibake that
  *     `graft_fix_mojibake` can then repair — ftfy's unescape-THEN-fix
  *     ordering (f1e). Rarer names still pass through untouched rather
  *     than risking false decodes of "&x;"-shaped prose.
  *
  * ONE pass, deliberately: ftfy unescapes once per fix_text call too —
  * recursively decoding `&amp;amp;` would also mangle text that MEANS to
  * display "&amp;". A malformed or unknown entity copies through verbatim,
  * so the function is identity on entity-free text (the property the F1
  * oracle-neutrality spec enforces on the fixture corpora).
  */
case class UnescapeHtml(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_unescape_html"

  override protected def nullSafeEval(t: Any): Any =
    UnescapeHtml.unescape(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.UnescapeHtml.unescape($t)")

  override protected def withNewChildInternal(newChild: Expression): UnescapeHtml =
    copy(child = newChild)
}

object UnescapeHtml {

  private val Named: Map[String, String] = Map(
    "amp"  -> "&",
    "lt"   -> "<",
    "gt"   -> ">",
    "quot" -> "\"",
    "apos" -> "'",
    "nbsp" -> "\u00a0",
    // Latin-1 high-byte + cp1252 punctuation names: the repertoire that
    // appears when already-mojibake'd text gets entity-escaped (f1e's
    // corruption chain) and in ordinary scraped prose. All one-to-one with
    // a single code point \u2014 no ambiguity, identity on text without them.
    "copy"   -> "\u00a9",
    "reg"    -> "\u00ae",
    "deg"    -> "\u00b0",
    "middot" -> "\u00b7",
    "laquo"  -> "\u00ab",
    "raquo"  -> "\u00bb",
    "sect"   -> "\u00a7",
    "para"   -> "\u00b6",
    "pound"  -> "\u00a3",
    "cent"   -> "\u00a2",
    "yen"    -> "\u00a5",
    "curren" -> "\u00a4",
    "euro"   -> "\u20ac",
    "times"  -> "\u00d7",
    "divide" -> "\u00f7",
    "plusmn" -> "\u00b1",
    "frac12" -> "\u00bd",
    "frac14" -> "\u00bc",
    "frac34" -> "\u00be",
    "sup1"   -> "\u00b9",
    "sup2"   -> "\u00b2",
    "sup3"   -> "\u00b3",
    "micro"  -> "\u00b5",
    "macr"   -> "\u00af",
    "acute"  -> "\u00b4",
    "cedil"  -> "\u00b8",
    "uml"    -> "\u00a8",
    "ordf"   -> "\u00aa",
    "ordm"   -> "\u00ba",
    "brvbar" -> "\u00a6",
    "not"    -> "\u00ac",
    "shy"    -> "\u00ad",
    "iexcl"  -> "\u00a1",
    "iquest" -> "\u00bf",
    "szlig"  -> "\u00df",
    "Atilde" -> "\u00c3",
    "atilde" -> "\u00e3",
    "Acirc"  -> "\u00c2",
    "acirc"  -> "\u00e2",
    "Agrave" -> "\u00c0",
    "agrave" -> "\u00e0",
    "Aacute" -> "\u00c1",
    "aacute" -> "\u00e1",
    "Auml"   -> "\u00c4",
    "auml"   -> "\u00e4",
    "Aring"  -> "\u00c5",
    "aring"  -> "\u00e5",
    "AElig"  -> "\u00c6",
    "aelig"  -> "\u00e6",
    "Ccedil" -> "\u00c7",
    "ccedil" -> "\u00e7",
    "Egrave" -> "\u00c8",
    "egrave" -> "\u00e8",
    "Eacute" -> "\u00c9",
    "eacute" -> "\u00e9",
    "Ecirc"  -> "\u00ca",
    "ecirc"  -> "\u00ea",
    "Euml"   -> "\u00cb",
    "euml"   -> "\u00eb",
    "Igrave" -> "\u00cc",
    "igrave" -> "\u00ec",
    "Iacute" -> "\u00cd",
    "iacute" -> "\u00ed",
    "Icirc"  -> "\u00ce",
    "icirc"  -> "\u00ee",
    "Iuml"   -> "\u00cf",
    "iuml"   -> "\u00ef",
    "Ntilde" -> "\u00d1",
    "ntilde" -> "\u00f1",
    "Ograve" -> "\u00d2",
    "ograve" -> "\u00f2",
    "Oacute" -> "\u00d3",
    "oacute" -> "\u00f3",
    "Ocirc"  -> "\u00d4",
    "ocirc"  -> "\u00f4",
    "Otilde" -> "\u00d5",
    "otilde" -> "\u00f5",
    "Ouml"   -> "\u00d6",
    "ouml"   -> "\u00f6",
    "Oslash" -> "\u00d8",
    "oslash" -> "\u00f8",
    "Ugrave" -> "\u00d9",
    "ugrave" -> "\u00f9",
    "Uacute" -> "\u00da",
    "uacute" -> "\u00fa",
    "Ucirc"  -> "\u00db",
    "ucirc"  -> "\u00fb",
    "Uuml"   -> "\u00dc",
    "uuml"   -> "\u00fc",
    "Yacute" -> "\u00dd",
    "yacute" -> "\u00fd",
    "yuml"   -> "\u00ff",
    "ETH"    -> "\u00d0",
    "eth"    -> "\u00f0",
    "THORN"  -> "\u00de",
    "thorn"  -> "\u00fe",
    // cp1252 punctuation block (0x80\u20130x9F as Unicode)
    "ndash"  -> "\u2013",
    "mdash"  -> "\u2014",
    "lsquo"  -> "\u2018",
    "rsquo"  -> "\u2019",
    "sbquo"  -> "\u201a",
    "ldquo"  -> "\u201c",
    "rdquo"  -> "\u201d",
    "bdquo"  -> "\u201e",
    "dagger" -> "\u2020",
    "Dagger" -> "\u2021",
    "bull"   -> "\u2022",
    "hellip" -> "\u2026",
    "permil" -> "\u2030",
    "lsaquo" -> "\u2039",
    "rsaquo" -> "\u203a",
    "oelig"  -> "\u0153",
    "OElig"  -> "\u0152",
    "scaron" -> "\u0161",
    "Scaron" -> "\u0160",
    "fnof"   -> "\u0192",
    "tilde"  -> "\u02dc",
    "circ"   -> "\u02c6",
    "trade"  -> "\u2122"
  )

  /** Longest entity body we accept between '&' and ';' — `&#x10FFFF;` is 8. */
  private val MaxBody = 8

  /** Static entry point shared by interpreted + codegen paths. Fast path:
    * no '&' byte → the input UTF8String is returned as-is (zero copies).
    */
  def unescape(in: UTF8String): UTF8String = {
    val bytes = in.getBytes
    var has   = false
    var i     = 0
    while (i < bytes.length && !has) {
      if (bytes(i) == '&'.toByte) has = true
      i += 1
    }
    if (!has) return in
    val s  = in.toString
    val sb = new java.lang.StringBuilder(s.length)
    var p  = 0
    while (p < s.length) {
      val c = s.charAt(p)
      if (c != '&') { sb.append(c); p += 1 }
      else {
        val semi = s.indexOf(';', p + 1)
        val body = if (semi > p && semi - p - 1 <= MaxBody) s.substring(p + 1, semi) else null
        val decoded: String =
          if (body == null) null
          else if (body.startsWith("#x") || body.startsWith("#X")) parseCp(body.substring(2), 16)
          else if (body.startsWith("#")) parseCp(body.substring(1), 10)
          else Named.getOrElse(body, null)
        if (decoded != null) { sb.append(decoded); p = semi + 1 }
        else { sb.append(c); p += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private def parseCp(digits: String, radix: Int): String =
    try {
      if (digits.isEmpty) null
      else {
        val cp = Integer.parseInt(digits, radix)
        if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) null
        else new String(Character.toChars(cp))
      }
    } catch { case _: NumberFormatException => null }
}
