package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Engine.table
import graft.functions.{ChunkText, ParseSections, TextFunctions => TF}

/** SURVEY.md §2.8 scalar text functions (F1–F17) as registered queries.
  *
  * Reference semantics (citations into /root/reference):
  *   - F1 clean_text: utils/data_transformation_helpers.py:28-86
  *   - F2 Oxford-comma natural list: utils/data_transformation_helpers.py:123-158
  *   - F3 chunker: utils/data_transformation_helpers.py:161-183
  *   - F4 section parser: utils/wikipedia_helpers.py:111-152
  *   - F5 QID from URI: defs/assets/extract_artists.py:123-124
  *   - F6 year from date string: utils/musicbrainz_helpers.py:260-277
  *   - F7 year from Wikidata time: defs/assets/extract_genres_articles.py:48-66
  *   - F9 size with null fill: defs/checks.py:70-71
  *   - F10 explode: defs/assets/extract_genres.py:54
  *   - F12 hash ids: utils/chroma_helpers.py:111-124, utils/wikidata_helpers.py:539
  *   - F13 JSON encode/decode: utils/io_helpers.py:20-128
  *   - F14 context string builder: defs/assets/extract_artists_articles.py:146-190
  *   - F15 chunk id: defs/assets/extract_artists_articles.py:198-200
  *   - F17 title translate: defs/assets/extract_artists_articles.py:203
  *
  * Scale notes: every query here is a narrow projection (no shuffle at all
  * except the two that aggregate first), and the whole cleaning chain stays
  * inside WholeStageCodegen — F1's NFKC step is a native Catalyst expression
  * ([[graft.functions.NormalizeNFKC]]), not a UDF. The two real UDFs (F3b
  * recursive chunker, F4 section parser) are per-row generators with no
  * cross-row state: embarrassingly parallel, no shuffle, no driver collect.
  */
object TextOps extends QueryModule {

  /** F1 — clean_text over deliberately messy input (injected escapes,
    * CR/LF, double spaces) so the whole chain is exercised.
    */
  private def f1_clean_text(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(
        col("doc_id"),
        TF.cleanText(
          concat(lit("  "), col("text"), lit(" \n\r mixed\\\"quote  "))
        ).as("cleaned")
      )

  /** F1b — the ftfy mojibake-repair core in isolation: the query MANUFACTURES
    * real mojibake (UTF-8 bytes of an accented/cp1252-special string
    * re-decoded as Latin-1 — the exact corruption ftfy targets) and
    * `graft_fix_mojibake` must recover the original bit-exactly, while the
    * already-clean original passes through untouched.
    */
  private def f1b_fix_mojibake(s: SparkSession, d: String): DataFrame = {
    val orig = concat(lit("Café résumé — naïve €"), col("doc_id").cast("string"))
    val moji = decode(encode(orig, "UTF-8"), "ISO-8859-1")
    table(s, d, "documents").select(
      col("doc_id"),
      call_function("graft_fix_mojibake", moji).as("fixed"),
      length(moji).cast("long").as("moji_len"),
      call_function("graft_fix_mojibake", orig).as("untouched")
    )
  }

  /** F1d — the DOUBLE-mojibake chain (ftfy's iterate-own-repair tail,
    * reference utils/data_transformation_helpers.py:28-86): UTF-8 bytes
    * mis-decoded as Latin-1 TWICE ("é" → "Ã©" → "ÃƒÂ©").
    * `graft_fix_mojibake` runs its repair to a fixed point (≤3 passes —
    * [[graft.functions.FixMojibake.fix]]), so two corruption layers peel
    * back to the original bit-exactly; clean text still passes through
    * untouched (each guard — full byte-mappability, strict UTF-8 decode,
    * strict contraction — must hold per pass).
    */
  private def f1d_double_mojibake(s: SparkSession, d: String): DataFrame = {
    val orig  = concat(lit("Café résumé — naïve €"), col("doc_id").cast("string"))
    val moji1 = decode(encode(orig, "UTF-8"), "ISO-8859-1")
    val moji2 = decode(encode(moji1, "UTF-8"), "ISO-8859-1")
    table(s, d, "documents").select(
      col("doc_id"),
      call_function("graft_fix_mojibake", moji2).as("fixed"),
      length(moji2).cast("long").as("moji2_len"),
      call_function("graft_fix_mojibake", orig).as("untouched")
    )
  }

  /** F1e — the ENTITY-MIX-OVER-MOJIBAKE chain (ftfy's unescape-then-fix
    * ordering, reference utils/data_transformation_helpers.py:28-86):
    * text that was mojibake'd (UTF-8 bytes mis-decoded as Latin-1) and
    * THEN had its high-byte chars entity-escaped by a sanitizer
    * ("Ã©" → "&Atilde;&copy;"). Repair must run unescape_html FIRST —
    * recovering raw mojibake — and fix_mojibake second; the reverse order
    * can't fire because "&Atilde;" isn't a mojibake byte pattern. The
    * full cleanText chain (which encodes exactly this ordering) recovers
    * the original bit-exactly; clean text still passes through untouched.
    */
  private def f1e_entity_mojibake(s: SparkSession, d: String): DataFrame = {
    val orig = concat(lit("Café résumé naïve"), col("doc_id").cast("string"))
    val moji = decode(encode(orig, "UTF-8"), "ISO-8859-1")
    // the sanitizer pass: Latin-1 high bytes → named entities
    val mix = regexp_replace(
      regexp_replace(regexp_replace(moji, "Ã", "&Atilde;"), "©", "&copy;"),
      "¯",
      "&macr;"
    )
    table(s, d, "documents").select(
      col("doc_id"),
      call_function(
        "graft_fix_mojibake",
        call_function("graft_unescape_html", mix)
      ).as("fixed"),
      length(mix).cast("long").as("mix_len"),
      TF.cleanText(mix).as("cleaned"),
      call_function(
        "graft_fix_mojibake",
        call_function("graft_unescape_html", orig)
      ).as("untouched")
    )
  }

  /** F1f — the uncurl-quotes + terminal-escape legs of the ftfy chain
    * (fix_text defaults `uncurl_quotes` and `remove_terminal_escapes`;
    * reference utils/data_transformation_helpers.py:28-86): input carries
    * curly single/double quotes (which must straighten), low-9 quotes
    * (which must NOT — ftfy leaves „ and ‚ alone), and an ANSI CSI color
    * sequence (which must vanish); all as native translate/regexp_replace
    * inside the cleanText chain — no UDF. The CSI regex is anchored on
    * the ESC byte, so bracketed prose like "[0m" survives.
    */
  private def f1f_uncurl_escapes(s: SparkSession, d: String): DataFrame = {
    val esc = lit("\u001B[31m")
    val messy = concat(
      esc,
      lit("‘quoted’ “double” „low9„ keep [0m "),
      col("doc_id").cast("string")
    )
    table(s, d, "documents").select(
      col("doc_id"),
      TF.cleanText(messy).as("cleaned"),
      length(messy).cast("long").as("messy_len")
    )
  }

  /** The ftfy `badness` heuristic CORE as a declared subset (reference
    * utils/data_transformation_helpers.py:28-86 → ftfy.badness): a weighted
    * count of the byte-signature patterns that distinguish mojibake from
    * legitimately accented text —
    *   - weight 2: a UTF-8 LEAD-byte char (Ã Â Î Ï Ð = C3 C2 CE CF D0
    *     mis-decoded) followed by a char in the continuation range
    *     U+0080–U+00BF ("Ã©", "Ã¯", "Â ");
    *   - weight 2: "â" (E2, the 3-byte-sequence lead) followed by a C1
    *     control — the "â€™"-family signature under strict Latin-1 (where
    *     0x80–0x9F decode to C1 controls, not cp1252 punctuation);
    *   - weight 1: any bare C1 control char U+0080–U+009F.
    * Pure regexp_count — no UDF; ftfy's full scorer adds language-model-ish
    * terms (letter-frequency priors) that stay out of the declared scope
    * (SURVEY §7.5.3).
    */
  private def mojibakeBadness(c: Column): Column =
    (regexp_count(c, lit("[\u00C3\u00C2\u00CE\u00CF\u00D0][\u0080-\u00BF]")) * 2 +
      regexp_count(c, lit("\u00E2[\u0080-\u009F]")) * 2 +
      regexp_count(c, lit("[\u0080-\u009F]"))).cast("long")

  /** F1g — the ftfy ACCEPT-REPAIR decision on the badness scorer: ftfy
    * fixes a line only when the repair REDUCES badness. The query
    * manufactures mojibake (as f1b), scores original / mojibake / repaired
    * text, and emits the decision plus the accepted output. Closed-form
    * oracle: "Café résumé — naïve €" mis-decoded carries 4 lead-pairs
    * (Ã©×3, Ã¯), 2 â+C1 runs (— = E2 80 94, € = E2 82 AC) and 3 bare C1
    * controls → badness 4·2 + 2·2 + 3 = 15; clean text scores 0 (identity
    * preserved: nothing to accept).
    */
  private def f1g_badness_scorer(s: SparkSession, d: String): DataFrame = {
    val orig  = concat(lit("Café résumé — naïve €"), col("doc_id").cast("string"))
    val moji  = decode(encode(orig, "UTF-8"), "ISO-8859-1")
    val fixed = call_function("graft_fix_mojibake", moji)
    table(s, d, "documents").select(
      col("doc_id"),
      mojibakeBadness(moji).as("badness_moji"),
      mojibakeBadness(orig).as("badness_orig"),
      mojibakeBadness(fixed).as("badness_fixed"),
      when(mojibakeBadness(fixed) < mojibakeBadness(moji), 1L)
        .otherwise(0L)
        .as("repair_accepted"),
      when(mojibakeBadness(fixed) < mojibakeBadness(moji), fixed)
        .otherwise(moji)
        .as("accepted")
    )
  }

  /** F1h — lossy-decode refusal: text that went through a decoder that
    * already DROPPED bytes carries U+FFFD replacement characters, and no
    * byte-shuffling repair can recover what isn't there — ftfy's contract
    * (and cleanText's, pinned here) is to fix what is fixable around the
    * loss and never hallucinate content. The engine's repair is
    * deliberately MORE conservative than per-span fixing: a string whose
    * decode already lost bytes (any U+FFFD present) is not re-interpreted
    * AT ALL — `graft_fix_mojibake`'s reverse-encode step cannot encode the
    * marker to Latin-1, so the whole string passes through unchanged,
    * mojibake and all. Re-reading bytes in a string that demonstrably came
    * through a broken decode risks compounding the damage; such rows
    * belong in re-extraction, which is exactly what this census (marker
    * count, lossy flag) routes on. Marker-free strings repair normally —
    * both arms pinned by the closed-form oracle.
    */
  private def f1h_lossy_refusal(s: SparkSession, d: String): DataFrame = {
    val orig  = concat(lit("Café"), col("doc_id").cast("string"))
    val moji  = decode(encode(orig, "UTF-8"), "ISO-8859-1")
    val mixed = concat(
      moji,
      when(col("doc_id") % 2 === 0, lit(" lost��bytes")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit(" tail�")).otherwise(lit(""))
    )
    val cleaned = TF.cleanText(mixed)
    val nRepl   = (length(cleaned) - length(translate(cleaned, "�", ""))).cast("long")
    table(s, d, "documents").select(
      col("doc_id"),
      cleaned.as("cleaned"),
      nRepl.as("n_replacement"),
      (nRepl > 0).as("lossy")
    )
  }

  /** The quantized LETTER-FREQUENCY PRIOR — the last declared tranche of
    * the ftfy chain (SURVEY §7.5.3; reference
    * utils/data_transformation_helpers.py:28-86 → ftfy's badness uses
    * frequency-informed "weirdness" patterns on top of the byte
    * signatures): real language essentially never puts a cp1252 PUNCTUATION
    * special (’ “ † œ …) directly after an uppercase accented letter
    * (À–Þ) — "Ä’" occurs in mojibake ("Ē" read as cp1252) and not in
    * German — while the repaired character is an ordinary letter. The
    * prior is quantized to an integer bigram count (one regexp_count of
    * literal char classes — engine-exact, RE2-safe: no lookahead), so the
    * tiebreak below is bit-reproducible where ftfy's float trigram model
    * is not.
    */
  private def mojibakeWeirdness(c: Column): Column =
    regexp_count(
      c,
      lit("[À-Þ][€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ]")
    ).cast("long")

  /** F1i — the prior TIEBREAK for AMBIGUOUS repairs (r10 verdict #6): the
    * byte-signature badness scorer (f1g) counts only the {Ã Â Î Ï Ð}-lead
    * and C1-control signatures, so a repairable string can score ZERO on
    * both sides — exactly the ambiguity band ftfy resolves with
    * letter-frequency priors. The decision ladder here:
    *
    *   accept repair ⇔ badness drops, OR badness ties AND the weirdness
    *   prior strictly drops; a FULL tie keeps the original (conservative —
    *   never rewrite text no scorer prefers).
    *
    * Two manufactured arms per row:
    *   - arm A ("Ēvele" read as cp1252 → "Ä’vele"): badness 0 == 0, but
    *     weirdness 1 → 0 — the prior accepts the repair;
    *   - arm B ("rīt" read as cp1252 → "rÄ«t"): badness 0 == 0 AND
    *     weirdness 0 == 0 (« is spacing punctuation, outside the
    *     prior's special class) — full tie, original kept. ftfy's full
    *     trigram model would fix this one; the quantized subset DECLARES
    *     the tie-keeps boundary instead of approximating floats.
    */
  private def f1i_prior_tiebreak(s: SparkSession, d: String): DataFrame = {
    // Spark's decode knows iso-8859-1 but not windows-1252; the cp1252
    // mis-read is the Latin-1 mis-read with the 27 defined 0x80–0x9F bytes
    // shown as their cp1252 printables — one translate applies that map.
    def cp1252View(c: Column): Column =
      translate(
        decode(encode(c, "UTF-8"), "ISO-8859-1"),
        "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B\u008C\u008E" +
          "\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009A\u009B\u009C\u009E\u009F",
        "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
      )
    def arms(orig: Column): (Column, Column, Column, Column, Column, Column) = {
      val moji  = cp1252View(orig)
      val fixed = call_function("graft_fix_mojibake", moji)
      val bm    = mojibakeBadness(moji)
      val bf    = mojibakeBadness(fixed)
      val wm    = mojibakeWeirdness(moji)
      val wf    = mojibakeWeirdness(fixed)
      val acc   = bf < bm || (bf === bm && wf < wm)
      (moji, wm, wf,
        when(acc, 1L).otherwise(0L),
        when(acc, fixed).otherwise(moji),
        bm)
    }
    val (aMoji, aWm, aWf, aFlag, aAcc, aBm) =
      arms(concat(lit("Ēvele"), col("doc_id").cast("string")))
    val (bMoji, bWm, bWf, bFlag, bAcc, bBm) =
      arms(concat(lit("rīt"), col("doc_id").cast("string")))
    table(s, d, "documents").select(
      col("doc_id"),
      aMoji.as("a_moji"),
      aBm.as("a_badness_moji"),
      aWm.as("a_weird_moji"),
      aWf.as("a_weird_fixed"),
      aFlag.as("a_repair_accepted"),
      aAcc.as("a_accepted"),
      bMoji.as("b_moji"),
      bBm.as("b_badness_moji"),
      bWm.as("b_weird_moji"),
      bWf.as("b_weird_fixed"),
      bFlag.as("b_repair_accepted"),
      bAcc.as("b_accepted")
    )
  }

  /** F1c — the HTML-entity leg of the ftfy chain in isolation (and then
    * through the full cleanText pipeline): the query MANUFACTURES entity
    * mixes — named, decimal, hex, malformed-left-alone — and
    * `graft_unescape_html` must decode exactly the well-formed ones.
    * Like f1b, the oracle states the expected literals in closed form.
    */
  private def f1c_unescape_html(s: SparkSession, d: String): DataFrame = {
    val mixed = concat(
      lit("Fish &amp; Chips caf&#233; &#x20AC;5 &lt;i&gt; &broken &#; no."),
      col("doc_id").cast("string")
    )
    table(s, d, "documents").select(
      col("doc_id"),
      call_function("graft_unescape_html", mixed).as("unescaped"),
      TF.cleanText(concat(lit("  "), mixed, lit(" \n x  "))).as("cleaned")
    )
  }

  /** F2 + F9 — natural-language list of each order's distinct return flags. */
  private def f2_natural_list(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_sort(array_distinct(collect_list(col("l_returnflag")))).as("flags"))
      .select(
        col("l_orderkey"),
        TF.naturalList(col("flags")).as("flag_phrase"),
        TF.sizeOrZero(col("flags")).cast("long").as("n_flags")
      )

  /** F3 (fixed-stride) + F15 — pure-Catalyst chunker: 120-char windows,
    * stride 90 (i.e. 30-char overlap), chunk ids `{doc}_chunk_{i}`.
    */
  private def f3_chunk_fixed(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"), posexplode(TF.chunkFixed(col("text"), 120, 90)))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_index"),
        TF.chunkId(col("doc_id"), col("pos")).as("chunk_id"),
        col("col").as("chunk")
      )

  /** Sentence-structured restricted input shared by f3b/f3c: per document,
    * `k = doc_id % 40 + 1` copies of one fixed-shape 12-char sentence
    * `"ab" + md5(doc_id)[0:3] + " fghi. "`. On such input the recursive
    * splitter's behavior has a CLOSED FORM (every ". "-piece has identical
    * measure, so the greedy merge/evict arithmetic is pure integer math) —
    * which makes the genuinely recursive path (separator split → greedy
    * merge → overlap retention) SQL-expressible and hash-verifiable.
    * Arbitrary-text invariants stay covered by [[graft.ChunkTextSpec]].
    */
  private def sentenceText(s: SparkSession, d: String): DataFrame = {
    val sentence =
      concat(lit("ab"), substring(md5(col("doc_id").cast("string")), 1, 3), lit(" fghi. "))
    table(s, d, "documents")
      .select(col("doc_id"), repeat(sentence, (col("doc_id") % 40 + 1).cast("int")).as("stext"))
  }

  /** F3 (recursive, char-measured) — the separator-aware recursive splitter
    * with overlap, oracled on the restricted sentence input (see
    * [[sentenceText]]): chunkSize 160 chars, overlap 40 ⇒ 13 sentences per
    * chunk, 3 retained, stride 10.
    */
  private def f3b_chunk_recursive(s: SparkSession, d: String): DataFrame = {
    val chunkUdf = udf((t: String) => ChunkText.chunk(t, 160, 40))
    sentenceText(s, d)
      .select(col("doc_id"), posexplode(chunkUdf(col("stext"))))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_index"),
        col("col").as("chunk")
      )
  }

  /** F3 (recursive, TOKEN-measured) — the reference's unit
    * (2048-token/512-overlap via HF tokenizer,
    * data_transformation_helpers.py:161-183 + settings.py:126-127), here via
    * the declared [[graft.functions.TokenCount]] regex-BPE approximation at
    * test-corpus scale: chunkSize 40 tokens, overlap 12. Each sentence
    * measures 4 tokens (ceil(5/4)+1+1) ⇒ 10 sentences per chunk, 3
    * retained, stride 7.
    */
  private def f3c_chunk_tokenized(s: SparkSession, d: String): DataFrame = {
    val chunkUdf = udf((t: String) =>
      ChunkText.chunkBy(t, 40, 12, ChunkText.DefaultSeparators, graft.functions.TokenCount.count)
    )
    sentenceText(s, d)
      .select(col("doc_id"), posexplode(chunkUdf(col("stext"))))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_index"),
        col("col").as("chunk")
      )
  }

  /** F4 — section parser over synthesized wiki-style documents: a lead block,
    * a History section from the document text, and an excluded trailing
    * section that must be stopped at.
    */
  private def f4_parse_sections(s: SparkSession, d: String): DataFrame = {
    val parseUdf = udf((t: String) => ParseSections.parse(t, 30))
    val wiki = concat(
      lit("Opening paragraph about this document body.\n== History ==\n"),
      substring(col("text"), 1, 100),
      lit("\n== See also ==\nexcluded tail that must not appear")
    )
    table(s, d, "documents")
      .select(col("doc_id"), explode(parseUdf(wiki)).as("sec"))
      .select(
        col("doc_id"),
        col("sec._1").as("section"),
        col("sec._2").as("content")
      )
  }

  private def f5_qid_from_uri(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(
        col("doc_id"),
        TF.qidFromUri(
          concat(lit("http://www.wikidata.org/entity/Q"), col("doc_id").cast("string"))
        ).as("qid")
      )

  private def f6_year_from_date(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .select(
        col("o_orderkey"),
        split(date_format(col("o_orderdate"), "yyyy-MM-dd"), "-")
          .getItem(0)
          .cast("int")
          .as("order_year")
      )

  private def f7_year_from_wikidata_time(s: SparkSession, d: String): DataFrame = {
    val wdTime =
      concat(lit("+"), date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("T00:00:00Z"))
    table(s, d, "orders")
      .select(col("o_orderkey"), TF.yearFromWikidataTime(wdTime).as("wd_year"))
  }

  private def f9_size_null_fill(s: SparkSession, d: String): DataFrame = {
    val nums = table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_linenumber")).as("nums"))
    table(s, d, "orders")
      .join(nums, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), TF.sizeOrZero(col("nums")).as("n_items"))
  }

  private def f10_explode(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_returnflag"))).as("flags"))
      .select(col("l_orderkey"), explode(col("flags")).as("flag"))

  private def f12_hash_ids(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .select(
        col("c_custkey"),
        TF.labelKey(col("c_name")).as("label_key"),
        TF.docId(col("c_name"), col("c_custkey")).as("doc_id_hash")
      )

  private def f13_json_roundtrip(s: SparkSession, d: String): DataFrame = {
    val parsed = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
    table(s, d, "events")
      .select(
        col("event_id"),
        parsed.getField("k").as("k"),
        to_json(struct(col("event_id"), parsed.getField("k").as("k"))).as("js")
      )
  }

  private def f14_context_string(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(
        col("doc_id"),
        concat(
          lit("search_document: Topic: doc"),
          col("doc_id").cast("string"),
          lit(". Context: "),
          when(col("lang") =!= "en", concat(col("lang"), lit("; "))).otherwise(lit("")),
          col("source"),
          lit(" | "),
          col("n_chars").cast("string")
        ).as("context")
      )

  /** F16 — community doc id `community_L{level}_{id}`
    * (reference: defs/assets/ingest_community_summaries.py:156). */
  private def f16_community_doc_id(s: SparkSession, d: String): DataFrame =
    table(s, d, "nation")
      .select(
        col("n_nationkey"),
        concat(
          lit("community_L"),
          col("n_regionkey").cast("string"),
          lit("_"),
          col("n_nationkey").cast("string")
        ).as("community_doc_id")
      )

  private def f17_translate(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .select(
        col("c_custkey"),
        translate(col("c_name"), "#", " ").as("name_spaced"),
        replace(col("c_name"), lit("Customer#"), lit("C_")).as("name_short")
      )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_clean_text" -> (f1_clean_text _),
    "f1b_fix_mojibake" -> (f1b_fix_mojibake _),
    "f1c_unescape_html" -> (f1c_unescape_html _),
    "f1d_double_mojibake" -> (f1d_double_mojibake _),
    "f1e_entity_mojibake" -> (f1e_entity_mojibake _),
    "f1f_uncurl_escapes" -> (f1f_uncurl_escapes _),
    "f1g_badness_scorer" -> (f1g_badness_scorer _),
    "f1h_lossy_refusal" -> (f1h_lossy_refusal _),
    "f1i_prior_tiebreak" -> (f1i_prior_tiebreak _),
    "f2_natural_list" -> (f2_natural_list _),
    "f3_chunk_fixed" -> (f3_chunk_fixed _),
    "f3b_chunk_recursive" -> (f3b_chunk_recursive _),
    "f3c_chunk_tokenized" -> (f3c_chunk_tokenized _),
    "f4_parse_sections" -> (f4_parse_sections _),
    "f5_qid_from_uri" -> (f5_qid_from_uri _),
    "f6_year_from_date" -> (f6_year_from_date _),
    "f7_year_from_wikidata_time" -> (f7_year_from_wikidata_time _),
    "f9_size_null_fill" -> (f9_size_null_fill _),
    "f10_explode" -> (f10_explode _),
    "f12_hash_ids" -> (f12_hash_ids _),
    "f13_json_roundtrip" -> (f13_json_roundtrip _),
    "f14_context_string" -> (f14_context_string _),
    "f16_community_doc_id" -> (f16_community_doc_id _),
    "f17_translate" -> (f17_translate _)
  )

  val oracles: Map[String, String] = Map(
    // closed form, both arms: marker-free rows repair to clean text;
    // any-marker rows pass through UNTOUCHED (mojibake kept, markers
    // byte-identical) — the whole-string refusal the scaladoc declares
    "f1h_lossy_refusal" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 OR doc_id % 3 = 0
                     THEN 'CafÃ©' || CAST(doc_id AS VARCHAR)
                          || CASE WHEN doc_id % 2 = 0 THEN ' lost��bytes' ELSE '' END
                          || CASE WHEN doc_id % 3 = 0 THEN ' tail�' ELSE '' END
                     ELSE 'Café' || CAST(doc_id AS VARCHAR) END
                  AS cleaned,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                     AS BIGINT) AS n_replacement,
                (doc_id % 2 = 0 OR doc_id % 3 = 0) AS lossy
         FROM documents""",
    "f1_clean_text" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(
                  '  ' || text || ' ' || chr(10) || chr(13) || ' mixed\"quote  ',
                  '\\"', '"', 'g'), '[' || chr(10) || chr(13) || ']+', ' ', 'g'),
                  '\s+', ' ', 'g')) AS cleaned
         FROM documents""",
    "f2_natural_list" ->
      """WITH f AS (SELECT l_orderkey,
                           list_sort(list_distinct(list(l_returnflag))) AS flags
                    FROM lineitem GROUP BY 1)
         SELECT l_orderkey,
                CASE WHEN len(flags) = 0 THEN ''
                     WHEN len(flags) = 1 THEN flags[1]
                     WHEN len(flags) = 2 THEN flags[1] || ' and ' || flags[2]
                     ELSE array_to_string(flags[1:len(flags)-1], ', ')
                          || ', and ' || flags[len(flags)]
                END AS flag_phrase,
                CAST(len(flags) AS BIGINT) AS n_flags
         FROM f""",
    // the repaired string IS the original, so the oracle constructs it
    // directly; moji_len = the original's UTF-8 BYTE length (every byte
    // became one Latin-1 char) = DuckDB strlen
    "f1b_fix_mojibake" ->
      """SELECT doc_id,
                'Café résumé — naïve €' || CAST(doc_id AS VARCHAR) AS fixed,
                CAST(strlen('Café résumé — naïve €' || CAST(doc_id AS VARCHAR)) AS BIGINT) AS moji_len,
                'Café résumé — naïve €' || CAST(doc_id AS VARCHAR) AS untouched
         FROM documents""",
    "f1d_double_mojibake" ->
      """SELECT doc_id,
                'Café résumé — naïve €' || CAST(doc_id AS VARCHAR) AS fixed,
                CAST(strlen('Café résumé — naïve €' || CAST(doc_id AS VARCHAR)) + 14 AS BIGINT)
                  AS moji2_len,
                'Café résumé — naïve €' || CAST(doc_id AS VARCHAR) AS untouched
         FROM documents""",
    // fixed/cleaned/untouched all recover the ORIGINAL, so the oracle
    // states it in closed form like f1b/f1d. mix_len: mojibake doubles
    // each accented char (= UTF-8 byte length = DuckDB strlen), then the
    // entity pass adds 7 per "Ã" (4: é×3, ï), 5 per "©" (3) and 5 per
    // "¯" (1) → strlen + 48.
    "f1e_entity_mojibake" ->
      """SELECT doc_id,
                'Café résumé naïve' || CAST(doc_id AS VARCHAR) AS fixed,
                CAST(strlen('Café résumé naïve' || CAST(doc_id AS VARCHAR)) + 48 AS BIGINT)
                  AS mix_len,
                'Café résumé naïve' || CAST(doc_id AS VARCHAR) AS cleaned,
                'Café résumé naïve' || CAST(doc_id AS VARCHAR) AS untouched
         FROM documents""",
    // closed form (see f1g's scaladoc): the manufactured mojibake scores
    // 4 lead-pairs x2 + 2 (â + C1) runs x2 + 3 bare C1 controls = 15;
    // clean and repaired text score 0, so the repair is always accepted
    // and the accepted output IS the original (digits contribute nothing
    // to any pattern).
    // closed form, both arms (see f1i's scaladoc): arm A's mojibake is the
    // cp1252 mis-read 'Ä’vele' (weirdness 1 — Ä followed by the cp1252
    // special ’) whose repair 'Ēvele' is accepted on the prior tiebreak;
    // arm B's 'rÄ«t' is a FULL tie (« is outside the special class) and the
    // original is kept. Digits contribute to no pattern.
    "f1i_prior_tiebreak" ->
      """SELECT doc_id,
                'Ä’vele' || CAST(doc_id AS VARCHAR) AS a_moji,
                CAST(0 AS BIGINT) AS a_badness_moji,
                CAST(1 AS BIGINT) AS a_weird_moji,
                CAST(0 AS BIGINT) AS a_weird_fixed,
                CAST(1 AS BIGINT) AS a_repair_accepted,
                'Ēvele' || CAST(doc_id AS VARCHAR) AS a_accepted,
                'rÄ«t' || CAST(doc_id AS VARCHAR) AS b_moji,
                CAST(0 AS BIGINT) AS b_badness_moji,
                CAST(0 AS BIGINT) AS b_weird_moji,
                CAST(0 AS BIGINT) AS b_weird_fixed,
                CAST(0 AS BIGINT) AS b_repair_accepted,
                'rÄ«t' || CAST(doc_id AS VARCHAR) AS b_accepted
         FROM documents""",
    "f1g_badness_scorer" ->
      """SELECT doc_id,
                CAST(15 AS BIGINT) AS badness_moji,
                CAST(0 AS BIGINT) AS badness_orig,
                CAST(0 AS BIGINT) AS badness_fixed,
                CAST(1 AS BIGINT) AS repair_accepted,
                'Café résumé — naïve €' || CAST(doc_id AS VARCHAR) AS accepted
         FROM documents""",
    // curly quotes straighten, low-9 quotes stay, the 5-char CSI sequence
    // vanishes; messy_len = 39 fixed chars + the id's digits
    "f1f_uncurl_escapes" ->
      """SELECT doc_id,
                '''quoted'' "double" „low9„ keep [0m ' || CAST(doc_id AS VARCHAR)
                  AS cleaned,
                CAST(39 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS messy_len
         FROM documents""",
    "f1c_unescape_html" ->
      """SELECT doc_id,
                'Fish & Chips café €5 <i> &broken &#; no.' || CAST(doc_id AS VARCHAR)
                  AS unescaped,
                'Fish & Chips café €5 <i> &broken &#; no.' || CAST(doc_id AS VARCHAR) || ' x'
                  AS cleaned
         FROM documents""",
    // f3b/f3c closed forms on the sentence-structured input: every piece
    // (". "-delimited sentence) measures the same — 12 chars / 4 tokens — so
    // the splitter's greedy merge is pure arithmetic:
    //   fit  = floor(chunkSize / pieceLen)   pieces per emitted chunk
    //   keep = floor(overlap  / pieceLen)    pieces retained after emit
    //   stride = fit - keep; #chunks m = k <= fit ? 1 : 1 + ceil((k-fit)/stride)
    //   chunk j = pieces [stride*(j-1), +min(fit, k - stride*(j-1))) — a
    //   contiguous substring; trim drops the single trailing space.
    "f3b_chunk_recursive" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 40 + 1 AS k,
                  repeat('ab' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) || ' fghi. ',
                         CAST(doc_id % 40 + 1 AS INTEGER)) AS txt
           FROM documents),
         c AS (
           SELECT doc_id, k, txt,
                  unnest(generate_series(1, CASE WHEN k <= 13 THEN 1
                                               ELSE 1 + (k - 4) // 10 END)) AS j
           FROM p)
         SELECT doc_id, CAST(j AS BIGINT) AS chunk_index,
                substr(txt, CAST(120 * (j - 1) + 1 AS INTEGER),
                       CAST(12 * least(13, k - 10 * (j - 1)) - 1 AS INTEGER)) AS chunk
         FROM c""",
    "f3c_chunk_tokenized" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 40 + 1 AS k,
                  repeat('ab' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) || ' fghi. ',
                         CAST(doc_id % 40 + 1 AS INTEGER)) AS txt
           FROM documents),
         c AS (
           SELECT doc_id, k, txt,
                  unnest(generate_series(1, CASE WHEN k <= 10 THEN 1
                                               ELSE 1 + (k - 4) // 7 END)) AS j
           FROM p)
         SELECT doc_id, CAST(j AS BIGINT) AS chunk_index,
                substr(txt, CAST(84 * (j - 1) + 1 AS INTEGER),
                       CAST(12 * least(10, k - 7 * (j - 1)) - 1 AS INTEGER)) AS chunk
         FROM c""",
    "f3_chunk_fixed" ->
      """WITH pos AS (SELECT doc_id, text,
                             unnest(generate_series(1, greatest(length(text), 1), 90)) AS p
                      FROM documents)
         SELECT doc_id,
                CAST((p-1)//90 + 1 AS BIGINT) AS chunk_index,
                CAST(doc_id AS VARCHAR) || '_chunk_' || CAST((p-1)//90 + 1 AS VARCHAR) AS chunk_id,
                substr(text, CAST(p AS INTEGER), 120) AS chunk
         FROM pos""",
    "f4_parse_sections" ->
      """SELECT doc_id, 'Introduction' AS section,
                'Opening paragraph about this document body.' AS content
         FROM documents
         UNION ALL
         SELECT doc_id, 'History', trim(substr(text, 1, 100))
         FROM documents WHERE length(trim(substr(text, 1, 100))) >= 30""",
    "f5_qid_from_uri" ->
      """SELECT doc_id,
                regexp_extract('http://www.wikidata.org/entity/Q' || CAST(doc_id AS VARCHAR),
                               '([^/]+)$', 1) AS qid
         FROM documents""",
    "f6_year_from_date" ->
      """SELECT o_orderkey,
                CAST(split_part(strftime(o_orderdate, '%Y-%m-%d'), '-', 1) AS INTEGER) AS order_year
         FROM orders""",
    "f7_year_from_wikidata_time" ->
      """SELECT o_orderkey,
                CAST(substr('+' || strftime(o_orderdate, '%Y-%m-%d') || 'T00:00:00Z', 2, 4) AS INTEGER) AS wd_year
         FROM orders""",
    "f9_size_null_fill" ->
      """SELECT o_orderkey, CAST(coalesce(n, 0) AS INTEGER) AS n_items
         FROM orders LEFT JOIN (SELECT l_orderkey, count(*) AS n
                                FROM lineitem GROUP BY 1)
           ON o_orderkey = l_orderkey""",
    "f10_explode" ->
      "SELECT DISTINCT l_orderkey, l_returnflag AS flag FROM lineitem",
    "f12_hash_ids" ->
      """SELECT c_custkey, md5(lower(c_name)) AS label_key,
                substr(sha256(c_name || '-' || CAST(c_custkey AS VARCHAR)), 1, 32) AS doc_id_hash
         FROM customer""",
    "f13_json_roundtrip" ->
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k,
                '{"event_id":' || CAST(event_id AS VARCHAR)
                || CASE WHEN props->>'k' IS NULL THEN ''
                        ELSE ',"k":' || CAST(CAST(props->>'k' AS INTEGER) AS VARCHAR)
                   END || '}' AS js
         FROM events""",
    "f14_context_string" ->
      """SELECT doc_id,
                'search_document: Topic: doc' || CAST(doc_id AS VARCHAR) || '. Context: '
                || CASE WHEN lang <> 'en' THEN lang || '; ' ELSE '' END
                || source || ' | ' || CAST(n_chars AS VARCHAR) AS context
         FROM documents""",
    "f16_community_doc_id" ->
      """SELECT n_nationkey,
                'community_L' || CAST(n_regionkey AS VARCHAR) || '_'
                || CAST(n_nationkey AS VARCHAR) AS community_doc_id
         FROM nation""",
    "f17_translate" ->
      """SELECT c_custkey, translate(c_name, '#', ' ') AS name_spaced,
                replace(c_name, 'Customer#', 'C_') AS name_short
         FROM customer"""
  )
}
