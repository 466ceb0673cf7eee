package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression text operators from SURVEY.md §2.8 — everything here is
  * pure `org.apache.spark.sql.functions` composition (codegen'd, pushdown- and
  * prune-friendly); the only JVM escape is the NFKC step, which is itself a
  * codegen-capable native expression ([[NormalizeNFKC]]).
  */
object TextFunctions {

  /** F1 — `normalize_and_clean_text`
    * (reference: utils/data_transformation_helpers.py:28-86), all four
    * stages in ftfy's own order: mojibake repair ([[FixMojibake]] — the
    * UTF-8-as-Latin-1 core), HTML-entity unescape ([[UnescapeHtml]]), NFKC
    * normalize ([[NormalizeNFKC]]), then the regex chain: unescape `\"`,
    * collapse newlines and runs of whitespace to one space, trim. Repair,
    * unescape, and NFKC are identity on well-formed entity-free ASCII,
    * which keeps the SQL oracles exact on the fixture corpus — a
    * precondition ENFORCED (not just documented) by TextFunctionsSpec's
    * repair-neutrality test over every corpus the F1/pl3/pl7 oracles read.
    */
  /** ftfy's uncurl_quotes repertoire: single curly/high-reversed quotes →
    * apostrophe, double → straight quote (low-9 „ ‚ stay, as in ftfy).
    */
  private val CurlyFrom = "‘’‛“”‟"
  private val CurlyTo   = "'''\"\"\""

  def cleanText(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            // ftfy's fix_text ordering (reference
            // utils/data_transformation_helpers.py:28-86): unescape_html →
            // remove_terminal_escapes → fix_encoding → (NFKC, which
            // subsumes ftfy's latin-ligature/character-width fixes) →
            // uncurl_quotes. Unescape must run BEFORE the encoding repair —
            // an entity-escaped mojibake mix ("&Atilde;&copy;") has to
            // unescape to raw mojibake ("Ã©") first; terminal escapes
            // before it too, or a CSI sequence splits a mojibake byte run.
            translate(
              call_function(
                "graft_nfkc",
                call_function(
                  "graft_fix_mojibake",
                  regexp_replace(
                    call_function("graft_unescape_html", c),
                    "\\u001B\\[[0-9;]*[A-Za-z]",
                    ""
                  )
                )
              ),
              CurlyFrom,
              CurlyTo
            ),
            "\\\\\"",
            "\""
          ),
          "[\\n\\r]+",
          " "
        ),
        "\\s+",
        " "
      )
    )

  /** F2 — Oxford-comma natural-language list with order-preserving dedup
    * (reference: utils/data_transformation_helpers.py:123-158).
    * "" / "a" / "a and b" / "a, b, and c".
    */
  def naturalList(arr: Column): Column = {
    val d = array_distinct(arr)
    val n = size(d)
    when(d.isNull || n === 0, lit(""))
      .when(n === 1, element_at(d, 1))
      .when(n === 2, concat(element_at(d, 1), lit(" and "), element_at(d, 2)))
      .otherwise(
        concat(
          array_join(slice(d, lit(1), n - 1), ", "),
          lit(", and "),
          element_at(d, n)
        )
      )
  }

  /** F3 (fixed-stride form) — deterministic character chunker as a pure
    * Catalyst expression: start positions 1, 1+stride, … ≤ length, each chunk
    * `size` chars. The token-aware recursive splitter is [[ChunkText]]; this
    * form is the SQL-expressible scale path (reference chunking:
    * utils/data_transformation_helpers.py:161-183, 2048-token windows with
    * 512 overlap ⇒ stride = size - overlap).
    */
  def chunkFixed(c: Column, size: Int, stride: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c), lit(1)), lit(stride)),
      p => c.substr(p, lit(size))
    )

  /** F5 — trailing path segment (QID from entity URI)
    * (reference: defs/assets/extract_artists.py:123-124). */
  def qidFromUri(c: Column): Column = substring_index(c, "/", -1)

  /** F7 — year from a Wikidata time literal `"+1988-00-00T00:00:00Z"`
    * (reference: defs/assets/extract_genres_articles.py:48-66). */
  def yearFromWikidataTime(c: Column): Column =
    substring(c, 2, 4).cast("int")

  /** F9 — list length with null→0 fill (Polars `list.len().fill_null(0)`;
    * Spark `size(null)` is -1 under legacy semantics, so coalesce after a
    * null-guard — reference: defs/checks.py:70-71). */
  def sizeOrZero(c: Column): Column =
    when(c.isNull, lit(0)).otherwise(size(c))

  /** F12 — 32-char sha256 document id (reference:
    * utils/chroma_helpers.py:111-124: sha256(article + "-" + id)[:32]). */
  def docId(article: Column, id: Column): Column =
    substring(sha2(concat(article, lit("-"), id.cast("string")), 256), 1, 32)

  /** F12 — md5 label cache key (reference: utils/wikidata_helpers.py:539). */
  def labelKey(c: Column): Column = md5(lower(c))

  /** F15 — chunk id `{qid}_chunk_{i+1}` (reference:
    * defs/assets/extract_artists_articles.py:198-200). */
  def chunkId(qid: Column, pos0: Column): Column =
    concat(qid.cast("string"), lit("_chunk_"), (pos0 + 1).cast("string"))

  private val UrlAuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** URL canonicalization for dedup keying (the crawl-pipeline counterpart
    * of F1's text cleaning; beyond the reference's §2.8 inventory). Declared
    * rule set, applied in order:
    *   1. strip the fragment (`#…`),
    *   2. lowercase scheme + authority (path/query case is preserved —
    *      paths are case-significant on most servers),
    *   3. drop the scheme-default port (`:80` for http, `:443` for https),
    *   4. strip trailing `/` and empty-`?` noise from the remainder.
    * Every regex is anchored (≤1 possible match), so Spark's replace-all
    * and DuckDB's replace-first semantics agree — the d8 oracle replays the
    * identical chain.
    */
  def normalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val auth   = lower(regexp_extract(noFrag, UrlAuthorityRe, 0))
    val rest   = regexp_replace(noFrag, UrlAuthorityRe, "")
    val authNoPort = regexp_replace(
      regexp_replace(auth, "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$",
      "$1"
    )
    concat(authNoPort, regexp_replace(rest, "[/?]+$", ""))
  }
}
