package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** The single home of the md5-prefix-to-integer derivation that every
  * deterministic seed in this library relies on (LSH planes, MinHash affine
  * constants, media-stub features). The cross-engine contract — "DuckDB
  * regenerates the value as `('0x' || substr(md5(s), 1, n))::BIGINT`" —
  * lives here and nowhere else, so a prefix-width or digest change can't
  * silently desynchronize one consumer from its oracle.
  */
object Md5Seed {

  def hex(bytes: Array[Byte], nHexDigits: Int): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(bytes).take((nHexDigits + 1) / 2).map(b => f"${b & 0xff}%02x")
      .mkString.take(nHexDigits)
  }

  /** First `nHexDigits` md5 hex digits of the UTF-8 seed, as a Long. */
  def prefixLong(seed: String, nHexDigits: Int): Long =
    java.lang.Long.parseLong(hex(seed.getBytes(StandardCharsets.UTF_8), nHexDigits), 16)

  /** Same, over raw bytes (binary payloads). */
  def prefixLong(bytes: Array[Byte], nHexDigits: Int): Long =
    java.lang.Long.parseLong(hex(bytes, nHexDigits), 16)
}
