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
  *     that dominate real corpora; rarer names pass through untouched
  *     rather than risking false decodes of "&x;"-shaped prose).
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
    "nbsp" -> "\u00a0"
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
