package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_fix_mojibake(text)` — the ftfy encoding-repair core
  * (reference: utils/data_transformation_helpers.py:28-86 runs
  * `ftfy.fix_text` before NFKC; SURVEY §7.5.3), reimplemented as the
  * classic single heuristic that covers the overwhelming share of real
  * mojibake: UTF-8 bytes that were mis-decoded as Latin-1 / Windows-1252
  * ("Ã©" for "é", "â‚¬" for "€").
  *
  * Per pass: map every char back to its sloppy-cp1252 byte (chars ≤ U+00FF
  * by code point — covering Latin-1 and the C1 controls — plus the 27
  * printable cp1252 specials like €/™/œ); if every char maps AND the bytes
  * STRICTLY decode as UTF-8 AND the result is shorter (a real repair always
  * contracts, since each multi-byte char came from ≥2 mojibake chars), the
  * repair is accepted. Repeats up to 3 passes for doubly-encoded text, like
  * ftfy's fixed-point loop. Anything else — clean ASCII, legitimate
  * accented text, emoji — fails one of the guards and passes through
  * untouched, which is what keeps the ASCII-fixture oracles valid.
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(t: Any): Any =
    FixMojibake.fix(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.FixMojibake.fix($t)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  /** cp1252 bytes 0x80–0x9F that decode to printable specials (the rest of
    * that range is undefined in cp1252 and arrives as C1 controls ≤ U+00FF).
    */
  private val Cp1252Inverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  /** Static entry point shared by interpreted + codegen paths. */
  def fix(s: UTF8String): UTF8String = {
    var cur     = s.toString
    var changed = false
    var i       = 0
    var next    = repairOnce(cur)
    while (next != null && i < 3) {
      cur = next
      changed = true
      i += 1
      next = repairOnce(cur)
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  /** One repair pass; null when the text is not repairable mojibake. */
  private def repairOnce(t: String): String = {
    val n = t.length
    if (n < 2) return null
    val bytes   = new Array[Byte](n)
    var i       = 0
    var hasHigh = false
    while (i < n) {
      val c = t.charAt(i)
      if (c < 0x100) {
        bytes(i) = c.toByte
        if (c >= 0x80) hasHigh = true
      } else {
        Cp1252Inverse.get(c) match {
          case Some(b) => bytes(i) = b; hasHigh = true
          case None    => return null // genuinely non-Latin text: not mojibake
        }
      }
      i += 1
    }
    if (!hasHigh) return null // pure ASCII round-trips; nothing to repair
    try {
      val dec = StandardCharsets.UTF_8
        .newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(bytes))
        .toString
      if (dec.length < n) dec else null
    } catch {
      case _: CharacterCodingException => null
    }
  }
}
