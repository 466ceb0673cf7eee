package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.table

/** Text-analysis operators an LLM training-data pipeline needs at corpus
  * scale: language identification, quality scoring, token counting, and
  * document fingerprinting — the quality-gate family the reference applies
  * per-row (Latin-script gate extract_artists.py:42-63, min-length gate
  * wikipedia_helpers.py:151-152) generalized to corpus curation.
  *
  * Scale notes: every query is a per-row narrow projection over `documents`
  * — zero shuffle, column pruning reaches the parquet scan, no driver
  * round-trips. The higher-order array functions (`filter`/`transform`/
  * `aggregate`) are CodegenFallback in Spark, so the per-row expression tree
  * is partly interpreted — the plan SHAPE (narrow, scan-speed) is what holds
  * at 100 TB; the codegen'd form of the hot set paths lives in the native
  * expression family (graft_sorted_intersect_size, graft_word_shingles).
  */
object TextAnalysis extends QueryModule {

  private val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val StopDe = Seq("der", "die", "das", "und", "ist", "ein")
  private val StopEs = Seq("el", "los", "de", "y", "es", "una")
  private val StopFr = Seq("le", "les", "et", "est", "une", "dans")

  private def words(c: Column): Column = split(c, " ")

  private def stopCount(w: Column, stop: Seq[String]): Column =
    size(filter(w, x => x.isin(stop: _*))).cast("long")

  /** X1 — stopword-profile language ID: count hits against each language's
    * function-word list; predict the argmax (deterministic en>de>es>fr
    * tiebreak), "und" when no list matches at all.
    */
  private def x1_lang_id(s: SparkSession, d: String): DataFrame = {
    val w   = words(col("text"))
    val cEn = stopCount(w, StopEn)
    val cDe = stopCount(w, StopDe)
    val cEs = stopCount(w, StopEs)
    val cFr = stopCount(w, StopFr)
    table(s, d, "documents").select(
      col("doc_id"),
      cEn.as("c_en"),
      cDe.as("c_de"),
      cEs.as("c_es"),
      cFr.as("c_fr"),
      when(cEn === 0 && cDe === 0 && cEs === 0 && cFr === 0, lit("und"))
        .when(cEn >= cDe && cEn >= cEs && cEn >= cFr, lit("en"))
        .when(cDe >= cEs && cDe >= cFr, lit("de"))
        .when(cEs >= cFr, lit("es"))
        .otherwise(lit("fr"))
        .as("pred_lang")
    )
  }

  /** X2 — composite quality score: length saturation, non-alphanumeric
    * (junk-character) ratio, stopword density.
    */
  private def x2_quality_score(s: SparkSession, d: String): DataFrame = {
    // Two-stage projection so the junk count, the word split, and the
    // stopword filter are each evaluated ONCE: the ratios reference them
    // both as output columns and inside the composite score, and an inline
    // single-select form pays every reference again (x21's lesson —
    // CollapseProject refuses to merge exactly because these are expensive
    // multi-referenced expressions, which is the behavior we want). The
    // junk count is a `translate` (table lookup: what survives removing
    // [a-z0-9 ] IS the junk), not a regex — the java.util.regex char-class
    // scan measured 8× slower at the 10× scale point (3.2 s vs 0.4 s).
    // Ratios ride INTEGER ten-thousandths (round-half-up by +den before
    // the div) and only the final display divides by 10000.0 — dividing
    // the same integer by the same power of ten is the one float op both
    // engines perform bit-identically. The earlier all-double form hit a
    // .xxxx5 rounding boundary on 2 of 50k docs at sf0.1 (0.5217 vs
    // 0.5216): the composite's binary representation fell on different
    // sides of the tie in Spark and DuckDB — the exact divergence class
    // the repo's integer-lattice discipline exists to remove.
    val w      = words(col("text"))
    val counts = table(s, d, "documents").select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      length(translate(col("text"), "abcdefghijklmnopqrstuvwxyz0123456789 ", ""))
        .cast("long").as("junk_chars"),
      stopCount(w, StopEn).cast("long").as("stop_hits"),
      size(w).cast("long").as("n_words")
    )
    counts
      .select(
        col("doc_id"),
        expr("least(n_chars * 20, 10000)").as("len_q"),
        expr("(2 * junk_chars * 10000 + n_chars) div (2 * n_chars)").as("junk_q"),
        expr("(2 * stop_hits * 10000 + n_words) div (2 * n_words)").as("stop_q")
      )
      .select(
        col("doc_id"),
        (col("len_q") / 10000.0).as("len_score"),
        (col("junk_q") / 10000.0).as("junk_ratio"),
        (col("stop_q") / 10000.0).as("stop_ratio"),
        (expr("(4 * len_q + 2 * (10000 - junk_q) + 4 * stop_q + 5) div 10") / 10000.0)
          .as("quality")
      )
  }

  /** X3 — token counting three ways: whitespace tokens, regex (BPE-ish
    * pre-tokenizer: letter runs / digit runs / single symbols), and the
    * chars/4 subword estimate.
    */
  private def x3_token_count(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
        .as("re_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("subword_est")
    )

  /** X5 — deterministic stratified sampling + train/val/test split: the
    * corpus-mix primitives a training-data pipeline runs last. Both
    * decisions are pure functions of md5(doc_id | salt) — reproducible
    * across runs/engines, no RNG state, embarrassingly parallel, and the
    * sample filter reaches the scan. Per-language rates (en 80% / de 50% /
    * other 20%) model up-weighting the target language; the 80/10/10 split
    * uses an independent salt so split membership is uncorrelated with
    * sampling.
    */
  private def x5_sample_split(s: SparkSession, d: String): DataFrame = {
    def h(salt: String): Column =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))), 1, 6), 16, 10)
        .cast("long") % 100
    val rate =
      when(col("lang") === "en", 80).when(col("lang") === "de", 50).otherwise(20)
    table(s, d, "documents")
      .filter(h("|sample") < rate)
      .select(
        col("doc_id"),
        col("lang"),
        when(h("|split") < 80, "train")
          .when(h("|split") < 90, "val")
          .otherwise("test")
          .as("split")
      )
  }

  /** X6 — PII redaction: email and phone patterns replaced with typed
    * placeholders, plus a per-row redaction count (the audit metric). The
    * query injects deterministic synthetic PII so the patterns provably
    * fire; a narrow regex projection — scan-speed at any scale.
    */
  private def x6_pii_redact(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phoneRe = "\\+[0-9]{2} [0-9]{3}-[0-9]{4}"
    val withPii = concat(
      col("text"),
      lit(" contact: user"),
      col("doc_id").cast("string"),
      lit("@example.com or +49 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0")
    )
    table(s, d, "documents").select(
      col("doc_id"),
      regexp_replace(regexp_replace(withPii, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
        .as("redacted"),
      (regexp_count(withPii, lit(emailRe)) + regexp_count(withPii, lit(phoneRe)))
        .cast("long")
        .as("n_pii")
    )
  }

  /** X4 — document fingerprints: exact (md5 of the raw text) and
    * order-insensitive bag-of-words (md5 of the sorted distinct token set) —
    * the pair a dedup pipeline keys on before near-dup passes.
    */
  private def x4_fingerprint(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").select(
      col("doc_id"),
      md5(col("text")).as("exact_fp"),
      md5(concat_ws(" ", array_sort(array_distinct(words(col("text")))))).as("bow_fp")
    )

  /** X24 — WINNOWING fingerprint selection (Schleimer–Wilkerson–Aiken's
    * MOSS algorithm, the local fingerprinting every plagiarism/code-clone
    * pipeline runs where MinHash's whole-document signatures are too
    * coarse): positional k-gram hashes (k = 3 words), then for every
    * sliding window of w = 4 consecutive hashes select the window
    * MINIMUM — the selection is position-independent (two documents
    * sharing a long-enough passage select the same fingerprints wherever
    * the passage sits) and guaranteed dense (≥ 1 per window; expected
    * density 2/(w+1) ≈ 400‰ on random hashes). Output per document:
    * gram/window counts, the distinct selected-fingerprint count, its
    * density per-mille, and an md5 over the sorted distinct selection —
    * the shard-level fingerprint index key.
    *
    * Scale shape: zero shuffle — one narrow projection of array
    * expressions; windows are per-document arrays, never a cross-row
    * window function. The hashes are md5-prefix integers (hash24's
    * discipline) so the oracle regenerates every selection
    * bit-identically.
    */
  private def x24_winnowing(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val w = 4
    // FULL windows only (graft_word_ngrams' contract, Shingles.scala:109):
    // a doc with < k words yields ZERO grams and ZERO windows, not one
    // partial-window gram — the r16 verdict #3 clamp (`greatest(…, 0)`)
    // silently hashed a short doc's whole word list as if it were a
    // k-gram. The size guard is explicit because Spark's sequence(0, -1)
    // is a DESCENDING sequence, not an empty one.
    table(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      // graft_gram_h6 / graft_win_min are the native codegen'd kernels for
      // the transform(sequence(...)) chains spelled out in the scaladoc
      // (full windows only built in; GramHashSpec pins value equality) —
      // one byte-walk + one digest per gram instead of an interpreted
      // slice/join/md5 lambda per gram (the DotProduct rationale). The
      // oracle keeps the spelled-out SQL. coalesce(ws, array()): the
      // kernel is null-intolerant where the template's CASE returned an
      // EMPTY array for a NULL text — pin the template's semantics so a
      // NULL document can never diverge from the oracle (r19 ADVICE).
      .withColumn("hs", expr(s"graft_gram_h6(coalesce(ws, array()), $k, '')"))
      .withColumn("wins", expr(s"graft_win_min(hs, $w)"))
      .select(
        col("doc_id"),
        size(col("hs")).cast("long").as("n_grams"),
        size(col("wins")).cast("long").as("n_windows"),
        expr("size(array_distinct(wins))").cast("long").as("n_fingerprints"),
        expr(
          "CASE WHEN size(wins) > 0 THEN 1000 * size(array_distinct(wins)) div size(wins) ELSE CAST(NULL AS BIGINT) END"
        ).as("density_pm"),
        md5(expr(
          "array_join(transform(array_sort(array_distinct(wins)), x -> cast(x as string)), '|')"
        )).as("selection_md5")
      )
  }

  /** X25 — winnowing MATCH JOIN (the point of MOSS — Schleimer et al. 2003
    * §4 builds the fingerprint → postings inverted index and reports
    * document pairs by shared fingerprints; x24 only SELECTS fingerprints
    * per document): the clone-detection complement of d16's containment.
    *
    * Pipeline: per-doc winnowing fingerprints (x24's k=3 positional gram
    * hashes, window-of-4 minima, distinct) → exploded postings
    * (fingerprint, doc) → HOT-FINGERPRINT CAP df ≤ 16 (the g16 hub-cap
    * discipline: a boilerplate gram shared by hundreds of docs carries no
    * clone signal and would otherwise dominate the pair join) → postings
    * self-equi-join on the fingerprint → pairs with ≥ 3 shared
    * fingerprints → EXACT verify on candidates only (full distinct-gram
    * set intersection, never computed for non-candidates).
    *
    * Cost at scale: the pair join emits Σ_fp C(df, 2) ≤ (cap−1)/2 ·
    * |kept postings| rows — LINEAR in corpus size under the cap, never
    * all-pairs; the verify join touches candidate pairs only. Planted
    * truth: every document with ≥ 44 words gets a clone at −doc_id−1
    * (collision-proof at any corpus size — the r10 planted-id rule)
    * sharing a 30-word passage, its first 12 words mutated with a '~p'
    * suffix so ONLY the passage matches; winnowing guarantees any shared
    * run of ≥ w+k−1 = 6 words shares a fingerprint, so a 30-word passage
    * clears the ≥3 bar deterministically. Organic near-dup pairs surface
    * too, with the same exact-verified counts in both engines.
    */
  private def x25_winnowing_matches(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val w = 4
    val base = table(s, d, "documents").select(col("doc_id"), words(col("text")).as("ws"))
    val planted = base
      .filter(size(col("ws")) >= 44)
      .select(
        (-col("doc_id") - 1).as("doc_id"),
        concat(
          transform(slice(col("ws"), 1, 12), wd => concat(wd, lit("~p"))),
          slice(col("ws"), 13, 30)
        ).as("ws")
      )
    val corpus = base.unionByName(planted)
    val fps = graft.Lineage.truncate(
      corpus
        // full windows only — see x24's contract note (short docs yield
        // zero grams/windows, never a partial-window hash); native kernels,
        // value-pinned against the old transform chains by GramHashSpec;
        // coalesce = the template's NULL→empty semantics (see x24)
        .withColumn("hs", expr(s"graft_gram_h6(coalesce(ws, array()), $k, '')"))
        .withColumn("wins", expr(s"graft_win_min(hs, $w)"))
        .select(
          col("doc_id"),
          expr("array_distinct(hs)").as("grams"),
          expr("array_distinct(wins)").as("fps")
        )
    )
    val postings = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val keep = postings
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= 16)
      .select(col("fp"))
    val kept = graft.Lineage.truncate(postings.join(keep, "fp"))
    val pairs = kept
      .select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= 3)
    pairs
      .join(fps.select(col("doc_id").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(fps.select(col("doc_id").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(
        col("doc_a"),
        col("doc_b"),
        col("shared_fingerprints").cast("long").as("shared_fingerprints"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("shared_grams"),
        (col("doc_a") === -col("doc_b") - 1).as("planted")
      )
  }

  /** X7 — corpus token statistics: per-token DOCUMENT frequency (the IDF
    * building block — each token counted once per doc via the distinct
    * set), top-100 by (df desc, token). Integer-only output so the oracle
    * hash can't flap on transcendental rounding. Shape: distinct-per-doc
    * explode → hash aggregate with map-side partial counts → global top-k
    * as TakeOrderedAndProject (O(k) state per partition, no full sort).
    */
  private def x7_df_stats(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(explode(array_distinct(words(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(100)

  /** X8 — Gopher-style repetition metrics (Rae et al. 2021's repetition
    * filters, adapted to this corpus's single-line structure: word and
    * word-bigram granularity instead of lines/paragraphs). Per document:
    * distinct-word fraction, top-word fraction, top-bigram fraction — the
    * signals that catch boilerplate and degenerate repetition.
    *
    * Fractions are integer-quantized (×10000, floor div) so the comparison
    * is pure integer math end-to-end — no float rounding disagreement
    * between engines. Shape: two explode→groupBy aggregates (map-side
    * partial counts; the shuffle carries (doc_id, token) counts, not text)
    * joined on doc_id — both sides already hash-partitioned on doc_id, so
    * AQE plans the join without a third shuffle. Bigrams come from the
    * native `graft_word_ngrams` (multiset, in-order) — the CodegenFallback
    * `transform(sequence(...))` chain this replaced was the last of its
    * kind in a hot path (r5 verdict #2).
    */
  private def x8_repetition(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
    val wordStats = docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_w")
      )
    val bigramStats = docs
      .select(
        col("doc_id"),
        explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("b")
      )
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_b"))
    wordStats
      .join(bigramStats, "doc_id")
      .select(
        col("doc_id"),
        col("n_words"),
        expr("(10000 * n_distinct) div n_words").as("distinct_frac_q"),
        expr("(10000 * top_w) div n_words").as("top_word_frac_q"),
        expr("(10000 * top_b) div n_bigrams").as("top_bigram_frac_q")
      )
  }

  /** X9 — top-3 distinguishing terms per document by TF-IDF, composing X7's
    * document-frequency table. The idf is the LINEAR variant N/df (declared:
    * `ln` mixes libm implementations across engines and a floored log score
    * can flip at an ulp boundary; `score = (10⁶·tf·N) div df` is pure
    * integer arithmetic, monotone in tf·(N/df), and bit-identical
    * everywhere). Shape: two grouped counts (map-side partial), a join on
    * the term, one per-doc top-k window (WindowGroupLimit pushes the rank
    * map-side). N arrives via a broadcast single-row aggregate — no driver
    * action.
    */
  /** X10 — HyperLogLog REGISTER build over document content, all-integer:
    * bucket = top 6 bits of the 24-bit md5 value (64 registers), ρ =
    * leading-zeros-plus-one of the 18-bit suffix via `19 − bitlen` (both
    * engines compute bit length as `length(bin(x))` — no floats anywhere,
    * unlike every stock HLL whose harmonic estimate can't hash-match).
    * The registers ARE the distributed artifact: one bounded 64-row max
    * aggregate per partition, mergeable by max across executors or days —
    * the bounded-memory distinct-count shape a 100 TB pipeline ships
    * between stages. `est_q` is the raw HLL estimate kept rational:
    * Σ 2^−Mⱼ scaled by 2¹⁹ is an exact integer S, and the estimate
    * α·m²/(S/2¹⁹) quantizes to (709·m²·2¹⁹) div (1000·S) — α = 0.709 for
    * m = 64, declared without the small-range correction.
    */
  private def x10_hll_registers(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
      .select(expr("conv(substr(md5(text), 1, 6), 16, 10)").cast("long").as("h24"))
      .select(expr("h24 div 262144").as("bucket"), expr("h24 % 262144").as("suffix"))
      .select(
        col("bucket"),
        when(col("suffix") === 0, lit(19L))
          .otherwise(lit(19L) - length(expr("bin(suffix)")))
          .as("rho")
      )
    val allBuckets = s.range(0, 64).select(col("id").as("bucket"))
    val regs = allBuckets
      .join(docs.groupBy(col("bucket")).agg(max(col("rho")).as("m")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("m"), lit(0L)).as("register"))
    val sRow = regs.agg(
      sum(expr("cast(shiftleft(1, cast(19 - register as int)) as long)")).as("s")
    )
    regs
      .crossJoin(broadcast(sRow))
      .select(
        col("bucket"),
        col("register"),
        expr(s"${709L * 4096L * 524288L} div (s * 1000)").as("est_q")
      )
  }

  /** X13 — HLL MERGE across sources: per-source 64-register sketches of the
    * distinct-word count, plus the union sketch formed by ELEMENTWISE MAX of
    * the per-source registers — the mergeability that lets a 1000-executor
    * job sketch partitions independently and combine results in O(registers)
    * (x10 builds one corpus sketch; x13 demonstrates the property that makes
    * it distributed). Each row reports the quantized HLL estimate next to
    * the exact distinct count, for every source and for the merged
    * `__union__` row — the estimate-vs-truth audit.
    *
    * Scale: sketches aggregate per (source, bucket) — map-side combinable;
    * the merge touches |sources| × 64 rows; the exact counts exist only
    * because the test corpus is small enough to afford the audit.
    */
  private def x13_hll_union(s: SparkSession, d: String): DataFrame = {
    val wordRows = table(s, d, "documents")
      .select(col("source"), explode(words(col("text"))).as("w"))
    val rho = wordRows
      .select(
        col("source"),
        expr("conv(substr(md5(w), 1, 6), 16, 10)").cast("long").as("h24")
      )
      .select(
        col("source"),
        expr("h24 div 262144").as("bucket"),
        when(expr("h24 % 262144") === 0, lit(19L))
          .otherwise(lit(19L) - length(expr("bin(h24 % 262144)")))
          .as("rho")
      )
    val perSrc = rho.groupBy("source", "bucket").agg(max("rho").as("m"))
    val merged = perSrc
      .groupBy("bucket")
      .agg(max("m").as("m"))
      .select(lit("__union__").as("source"), col("bucket"), col("m"))
    val allRegs = perSrc.select("source", "bucket", "m").unionByName(merged)
    val srcSpine = wordRows
      .select("source")
      .distinct()
      .unionByName(s.range(1).select(lit("__union__").as("source")))
      .crossJoin(broadcast(s.range(0, 64).select(col("id").as("bucket"))))
    val est = srcSpine
      .join(allRegs, Seq("source", "bucket"), "left")
      .select(col("source"), coalesce(col("m"), lit(0L)).as("register"))
      .groupBy("source")
      .agg(sum(expr("cast(shiftleft(1, cast(19 - register as int)) as long)")).as("ssum"))
      .select(col("source"), expr(s"${709L * 4096L * 524288L} div (ssum * 1000)").as("est_q"))
    val exact = wordRows
      .groupBy("source")
      .agg(countDistinct(col("w")).as("exact_d"))
      .unionByName(
        wordRows.agg(countDistinct(col("w")).as("exact_d")).select(lit("__union__").as("source"), col("exact_d"))
      )
    est.join(exact, "source")
  }

  /** X14 — heavy-hitter token-mass coverage: the top-20 terms by corpus
    * frequency with each rank's CUMULATIVE share of total token mass
    * (quantized) — the curve a vocabulary-truncation or stopword decision
    * reads ("the top k terms cover p% of the corpus").
    *
    * Scale: term counts are one keyed aggregate; the top-20 is
    * TakeOrderedAndProject (O(k) per partition); only the 20 surviving
    * rows enter the unpartitioned cumulative window — bounded by
    * construction, same discipline as o2/p8.
    */
  private def x14_term_coverage(s: SparkSession, d: String): DataFrame = {
    val tc = table(s, d, "documents")
      .select(explode(words(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
    val top = tc.orderBy(col("cnt").desc, col("term").asc).limit(20)
    val tot = broadcast(tc.agg(sum("cnt").as("total")))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term").asc)
    top
      .crossJoin(tot)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn(
        "cum",
        sum("cnt").over(
          ord.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow
          )
        )
      )
      .select(col("rank"), col("term"), col("cnt"), expr("10000 * cum DIV total").as("cum_share_q"))
  }

  private def x9_tfidf_topk(s: SparkSession, d: String): DataFrame = {
    val tf = table(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, term) pairs, so counting them per term IS
    // the document frequency — no second pass over the corpus
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n  = table(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_q", expr("(1000000 * tf * n_docs) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("score_q"), col("rank"))
  }

  /** X11 — deterministic per-stratum reservoir sample: exactly k=5
    * documents per language, selected by hash rank (md5 of the doc id,
    * salted) with the id as tiebreak. Hash-rank selection IS the
    * distributed reservoir: uniform over the stratum, stable across
    * engines/retries/partitionings (a real `rand()` reservoir is none of
    * those), and one keyed shuffle — WindowGroupLimit pushes the rank
    * cutoff map-side, so each partition forwards at most k candidates per
    * stratum. The sampled-eval primitive every corpus pipeline needs
    * (x5's rate-based split samples a PROPORTION; this pins an exact
    * per-group COUNT). 24-bit hash prefix: the established cross-engine
    * md5 arithmetic window.
    */
  private def x11_reservoir_sample(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit("|res"))), 1, 6), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(h.asc, col("doc_id").asc)
    table(s, d, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
  }

  /** X12 — count-min sketch registers over the corpus token stream: a
    * 4×64 grid of counters; token w increments cell (j, h_j(w)) for each
    * of 4 independent md5-salted hash rows, and freq(w) is later estimated
    * as min_j grid[j][h_j(w)] — always an overestimate, bounded by the
    * collision mass. The frequency twin of x10's HLL cardinality sketch
    * and the third mergeable-sketch family (HLL, histogram a18, CM) a
    * corpus pipeline ships: heavy-hitter token detection at 100 TB
    * without a full term dictionary. The register build is ONE pass —
    * posexplode fans each token into its 4 (row, col) cells in a narrow
    * projection, one hash agg on a 256-key space, zero-filled against the
    * dense grid so shards merge by cell-wise addition. All integer.
    */
  private def x12_cmsketch_registers(s: SparkSession, d: String): DataFrame = {
    val Depth = 4
    val Width = 64L
    val cells = (0 until Depth).map(j =>
      conv(substring(md5(concat(col("w"), lit(s"|cm$j"))), 1, 6), 16, 10)
        .cast("long") % Width
    )
    val hits = table(s, d, "documents")
      .select(explode(words(col("text"))).as("w"))
      .select(posexplode(array(cells: _*)))
      .select(col("pos").cast("long").as("cm_row"), col("col").as("cm_col"))
    val counts = hits.groupBy(col("cm_row"), col("cm_col")).agg(count(lit(1)).as("cnt"))
    s.range(0, Depth)
      .select(col("id").as("cm_row"))
      .crossJoin(s.range(0, Width).select(col("id").as("cm_col")))
      .join(counts, Seq("cm_row", "cm_col"), "left")
      .select(col("cm_row"), col("cm_col"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** X41 — TEXTTILING topic segmentation (Hearst 1997, Computational
    * Linguistics 23(1): subtopic boundaries live where LEXICAL COHESION
    * between adjacent token blocks dips — the semantic chunker the f3
    * family lacked: fixed/recursive/token-measured chunkers cut by size,
    * this cuts by content, the split a RAG pipeline wants so a chunk
    * doesn't straddle a topic shift): per document, w = 8-token blocks;
    * cohesion at gap i = |distinct(block i) ∩ distinct(block i+1)| (the
    * paper's block-comparison score on the integer lattice — set overlap
    * instead of its tf cosine, the declared simplification so both
    * engines share exact arithmetic); a boundary is a STRICT VALLEY
    * (cohesion below both neighboring gaps — interior gaps only, Hearst's
    * depth rule reduced to its sign). Output per document: block count,
    * boundary count, segment count (= boundaries + 1), mean cohesion
    * per-mille, and an md5 over the boundary gap indices — the
    * segmentation fingerprint a downstream chunk-store keys on.
    *
    * Scale shape: ZERO SHUFFLE — one narrow projection of array
    * expressions per document (blocks, the cohesion series, the valley
    * filter are all within-row HOFs, p8's bounded-serial argument never
    * even needed); at 1000 executors this scans and writes.
    */
  /** X42 — DEGENERATE-GENERATION LOOP DETECTOR: tail PERIODICITY over the
    * last 32 words (Holtzman et al. 2020's neural-degeneration failure
    * mode — a sampler stuck repeating a short phrase — and the filter an
    * inference-output or synthetic-data ingest pipeline runs before
    * anything re-enters training; x8 counts gram OCCURRENCES anywhere,
    * which a long document full of legitimate repeats also trips — the
    * loop signature is a PERIOD: w[i] = w[i−p] for every tail position):
    * per doc, score_p = 1000·|{i ≥ p : t[i] = t[i−p]}| div (n−p) for
    * p = 1..8 over the ≤32-word tail; loop_period = the SMALLEST p with a
    * perfect score over ≥ 8 matched positions (0 = no loop), rep_pm = the
    * max partial score. Planted loops at −doc_id−1 (the first 4 words
    * repeated 8×, the r10 planted-id rule) are caught at period ≤ 4 — ≤,
    * not =, because a planted phrase with its own internal period (e.g. a
    * repeated word) legitimately loops at the shorter one; natural prose
    * scores below the loop bar, and `planted` marks ground truth.
    *
    * Scale shape: zero shuffle — one narrow projection of array HOFs over
    * a bounded (32-word) tail; the 8 periods are unrolled compile-time
    * constants, so the work per row is O(32·8) regardless of corpus size.
    */
  private def x42_loop_detector(s: SparkSession, d: String): DataFrame = {
    val base = table(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
    val planted = base
      .filter(size(col("ws")) >= 4)
      .select(
        (-col("doc_id") - 1).as("doc_id"),
        expr("flatten(transform(sequence(1, 8), x -> slice(ws, 1, 4)))").as("ws")
      )
    val scoreCols = (1 to 8).map { p =>
      // Spark array indexing is 0-BASED (t[0]..t[n−1]) where the DuckDB
      // twin is 1-based — the oracle's t[i+1] IS this t[i]
      expr(
        s"""CASE WHEN n > $p THEN
              1000 * size(filter(sequence($p, n - 1), i -> t[i] = t[i - $p]))
                div (n - $p)
            ELSE 0 END"""
      ).as(s"s$p")
    }
    base
      .unionByName(planted)
      .select(
        col("doc_id"),
        expr("slice(ws, greatest(size(ws) - 31, 1), 32)").as("t"),
        (col("doc_id") < 0).as("planted")
      )
      .withColumn("n", size(col("t")))
      .select(Seq(col("doc_id"), col("n"), col("planted")) ++ scoreCols: _*)
      .select(
        col("doc_id"),
        col("n").cast("long").as("tail_words"),
        expr(
          (1 to 8)
            .map(p => s"WHEN s$p = 1000 AND n - $p >= 8 THEN ${p}L")
            .mkString("CASE ", " ", " ELSE 0L END")
        ).as("loop_period"),
        expr("greatest(" + (1 to 8).map(p => s"s$p").mkString(", ") + ")")
          .cast("long")
          .as("rep_pm"),
        col("planted")
      )
  }

  private def x41_texttiling(s: SparkSession, d: String): DataFrame = {
    val w = 8
    table(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3 * w)
      .withColumn("nwin", expr(s"size(ws) div $w"))
      .withColumn(
        "coh",
        expr(s"""transform(sequence(1, nwin - 1), i ->
                   cast(size(array_intersect(
                     array_distinct(slice(ws, (i - 1) * $w + 1, $w)),
                     array_distinct(slice(ws, i * $w + 1, $w)))) as bigint))""")
      )
      .withColumn(
        "bnd",
        // domain = 1..size(coh) with the interior guard INSIDE the lambda:
        // sequence(2, size(coh) - 1) DESCENDS in Spark when the gap count
        // is 2 (DuckDB's generate_series is empty there) — the engine
        // divergence x18's oracle note already documents
        expr("""filter(sequence(1, size(coh)), i ->
                  i >= 2 AND i <= size(coh) - 1 AND
                  element_at(coh, i) < element_at(coh, i - 1) AND
                  element_at(coh, i) < element_at(coh, i + 1))""")
      )
      .select(
        col("doc_id"),
        col("nwin").cast("long").as("n_blocks"),
        size(col("bnd")).cast("long").as("n_boundaries"),
        (size(col("bnd")) + 1).cast("long").as("n_segments"),
        expr("1000 * aggregate(coh, 0L, (a, x) -> a + x) div size(coh)").as("mean_cohesion_q"),
        md5(expr("array_join(transform(bnd, x -> cast(x as string)), '|')")).as("boundaries_md5")
      )
  }

  /** X38 — count-min HEAVY-HITTER PROBE with the overestimate audit: x12
    * builds the registers; this is the QUERY side Cormode–Muthukrishnan
    * 2005 §4.1 actually runs — for the true top-32 tokens, est(w) =
    * min_j grid[j][h_j(w)] next to the exact count, with the overestimate
    * (est − true, ≥ 0 by the sketch's one-sided guarantee — the spec pins
    * it) reported per word. The sketch here is 4×1024
    * ([[graft.operators.CmOps]] — x12's hash scheme at a wider grid, one
    * bit-math definition shared with the streaming register maintenance,
    * the BloomOps discipline) so collision mass ε·N = e/1024 · |tokens|
    * stays below
    * the head counts and the audit shows near-exact heavy hitters — the
    * skew/hot-key detector a 100 TB shuffle planner consults without ever
    * building a term dictionary.
    *
    * Scale: the register build is x12's one narrow posexplode pass into a
    * 4096-key hash agg (map-side combinable, shards merge cell-wise); the
    * probe side is the 32 head words × 4 cells — a ≤128-row broadcast
    * against the 4096-row sketch. The exact counts exist only because the
    * test corpus affords the audit; production keeps the sketch and drops
    * the dictionary.
    */
  private def x38_countmin_hitters(s: SparkSession, d: String): DataFrame = {
    import graft.operators.CmOps
    def cells(c: String) = (0 until CmOps.Depth).map(j => expr(CmOps.bucketExpr(c, j)))
    val wd = table(s, d, "documents")
      .select(explode(words(col("text"))).as("w"))
    val sketch = wd
      .select(posexplode(array(cells("w"): _*)))
      .select(col("pos").cast("long").as("j"), col("col").as("b"))
      .groupBy(col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
    val top = wd
      .groupBy(col("w"))
      .agg(count(lit(1)).as("true_c"))
      .orderBy(col("true_c").desc, col("w").asc)
      .limit(32)
    val probe = top
      .select(col("w"), col("true_c"), posexplode(array(cells("w"): _*)))
      .select(col("w"), col("true_c"), col("pos").cast("long").as("j"), col("col").as("b"))
    broadcast(probe)
      .join(sketch, Seq("j", "b"))
      .groupBy(col("w"), col("true_c"))
      .agg(min(col("c")).as("est_c"))
      .select(
        col("w"),
        col("true_c").cast("long").as("true_c"),
        col("est_c").cast("long").as("est_c"),
        (col("est_c") - col("true_c")).cast("long").as("overest")
      )
  }

  /** X15 — per-source distribution drift: an integer-quantized KL-style
    * divergence between each source's unigram distribution and the whole
    * corpus, over 64 hashed word buckets (c9's DSIR bucket discipline).
    * The log-likelihood ratio log2((scnt/stot) / (ccnt/ctot)) uses the
    * floor-log2 bit-length surrogate (c13's integer-log idiom) applied to
    * each count SEPARATELY — (bitlen(scnt) − bitlen(stot)) −
    * (bitlen(ccnt) − bitlen(ctot)) — so no product of two large counts is
    * ever formed: every term fits 63 bits at any corpus size (the c11
    * headroom rule), at the price of a < 2-bit per-term quantization the
    * scaladoc declares. This is the drift monitor c8's mixture rebalancing
    * acts on.
    *
    * Scale: the corpus is scanned ONCE — the corpus bucket counts, source
    * totals, and grand total all re-aggregate the (source × 64)-row first
    * aggregate, which then joins as broadcasts. One wide explode+count
    * shuffle; everything after is ≤ (sources × 64) rows.
    */
  private def x15_source_divergence(s: SparkSession, d: String): DataFrame = {
    val sb = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(col("source"), explode(words(col("text"))).as("w"))
        .select(
          col("source"),
          (conv(substring(md5(concat(col("w"), lit("|x15"))), 1, 6), 16, 10)
            .cast("long") % 64).as("bk")
        )
        .groupBy("source", "bk")
        .agg(count(lit(1)).as("scnt"))
    )
    val corpus = broadcast(sb.groupBy("bk").agg(sum("scnt").as("ccnt")))
    val totals = broadcast(sb.groupBy("source").agg(sum("scnt").as("stot")))
    val grand  = broadcast(sb.agg(sum("scnt").as("ctot")))
    sb.join(corpus, "bk")
      .join(totals, "source")
      .crossJoin(grand)
      .select(
        col("source"),
        col("scnt"),
        col("stot"),
        ((length(bin(col("scnt"))) - length(bin(col("stot")))) -
          (length(bin(col("ccnt"))) - length(bin(col("ctot"))))).cast("long").as("dl")
      )
      .groupBy("source")
      .agg(
        max("stot").as("n_words"),
        count(lit(1)).as("n_buckets"),
        sum(col("scnt") * col("dl")).as("divergence_q")
      )
  }

  /** X16 — incoming-batch NOVELTY rate: of the distinct 5-grams a delta
    * batch (doc_id % 10 == 0, a22's simulated increment) brings, what
    * per-mille is NOT already in the base corpus — per source. This is the
    * measurement a data-mixing loop reads before paying to ingest a new
    * crawl slice: a source whose novelty has collapsed to ~0 is re-crawl
    * of what the corpus already holds (d6 answers "is the benchmark IN the
    * corpus"; x16 answers "is the new data NEW").
    *
    * Scale: grams travel as 56-bit md5 keys (c3's discipline — the
    * shuffle carries 8-byte longs, never gram strings); the base side is
    * a distinct-key table equi-joined once. At 100 TB the base-gram table
    * is the persisted artifact a pipeline maintains incrementally (a22's
    * merge pattern); swapping the exact join for a c5 Bloom probe trades
    * per-mille exactness for a zero-shuffle probe — declared knob, exact
    * form measured here.
    */
  private def x16_novelty_rate(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    def grams(df: DataFrame): DataFrame = df
      .select(
        col("source"),
        explode(call_function("graft_word_shingles", col("text"), lit(5))).as("g")
      )
      .select(col("source"), expr("conv(substr(md5(g), 1, 14), 16, 10)").cast("long").as("gk"))
    // delta membership is a salted hash, not doc_id % 10: the synthetic
    // table's source correlates with doc_id modulo, and a modulo delta
    // would sample only 2 of the 20 sources
    val isDelta =
      expr("conv(substr(md5(CAST(doc_id AS STRING) || '|x16'), 1, 6), 16, 10) % 10 = 0")
    val base  = grams(docs.filter(!isDelta)).select("gk").distinct()
    val delta = grams(docs.filter(isDelta)).distinct()
    delta
      .join(base.withColumn("seen", lit(1L)), Seq("gk"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("seen"), lit(0L))).as("n_seen"))
      .select(
        col("source"),
        col("n_grams"),
        col("n_seen"),
        expr("1000 * (n_grams - n_seen) DIV n_grams").as("novelty_pm")
      )
  }

  /** X17 — cross-source overlap MATRIX by per-source MinHash: each
    * source's whole gram population collapsed to one 12-component MinHash
    * signature (min per affine hash over every 3-gram the source emits —
    * [[graft.operators.MinHashOps]], the dedup family's exact machinery at
    * corpus granularity), then the pairwise signature-agreement matrix as
    * estimated Jaccard per-mille. This is the source-overlap heat map a
    * curation run reads to find mirror crawls and shared boilerplate pools
    * BEFORE paying for pairwise exact comparison — 20 sources compare in
    * 20·12 integers, where the exact matrix would re-shuffle every gram
    * (x16 prices one batch against the corpus; x17 prices every source
    * against every other).
    *
    * Scale: the signature build is a map-side-combinable groupBy min — no
    * per-gram shuffle survives the combine; the matrix join is a ≤-sources
    * row broadcast (bounded BNLJ, registered). d10 calibrates this exact
    * estimator against true Jaccard.
    */
  private def x17_source_overlap_matrix(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{MinHashOps => MH}
    val xs = table(s, d, "documents")
      .select(col("source"), explode(MH.shingles(col("text"))).as("shingle"))
      .select(col("source"), MH.hash24(col("shingle")).as("x"))
    val aggs = (0 until MH.NumHashes).map(h =>
      min((col("x") * MH.affineA(h) + MH.affineB(h)) % MH.ModP).as(s"m$h")
    )
    val sig = xs.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    val a = sig.select(
      col("source").as("src_a") +: (0 until MH.NumHashes).map(h => col(s"m$h").as(s"a$h")): _*
    )
    val b = sig.select(
      col("source").as("src_b") +: (0 until MH.NumHashes).map(h => col(s"m$h").as(s"b$h")): _*
    )
    val agree = (0 until MH.NumHashes)
      .map(h => when(col(s"a$h") === col(s"b$h"), 1L).otherwise(0L))
      .reduce(_ + _)
    a.crossJoin(broadcast(b))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), agree.as("n_agree"))
      .withColumn("est_jaccard_pm", expr(s"1000 * n_agree DIV ${MH.NumHashes}"))
  }

  /** X18 — Zipf rank-frequency audit over the top-32 corpus terms: each
    * rank's observed frequency next to the Zipf prediction f₁/rank and
    * their ratio in per-mille (1000 = the ideal curve). Natural-language
    * corpora track Zipf closely; machine-generated or template-heavy
    * slices bend the curve — so this is the cheap "does this corpus look
    * like language" check a curation run reads next to x1's lang-ID and
    * c12's boilerplate census. Integer end-to-end: the ratio uses only
    * positive operands, so truncating division agrees across engines.
    *
    * Scale: one map-side-combinable term count, a top-32 TakeOrdered, and
    * a window over those 32 rows only (x14's bounded-global-window
    * argument).
    */
  private def x18_zipf_audit(s: SparkSession, d: String): DataFrame = {
    val freq = table(s, d, "documents")
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("f"))
    val top = freq.orderBy(col("f").desc, col("w").asc).limit(32)
    val wR  = Window.orderBy(col("f").desc, col("w").asc)
    top
      .withColumn("rank", row_number().over(wR).cast("long"))
      .withColumn(
        "f1",
        max(col("f")).over(wR.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .select(
        col("rank"),
        col("w").as("term"),
        col("f").as("freq"),
        expr("f1 DIV rank").as("zipf_pred"),
        expr("1000 * f DIV (f1 DIV rank)").as("ratio_pm")
      )
  }

  /** X19 — tokenizer fertility audit per language: tokens-per-word and
    * chars-per-token under the declared regex-BPE estimator (x3's
    * re_tokens), aggregated per lang. Fertility is the multilingual
    * token-budget number — a language whose fertility runs 2× English
    * costs 2× the compute per word, and the mixing loop prices that
    * BEFORE committing a sampling ratio (pairs with c8's rebalance and
    * x5's per-language rates). Ratios are per-mille positive-operand
    * integer division, so truncation agrees across engines.
    *
    * Scale: one projection (codegen'd regexp_count/size — no explode,
    * no token rows materialized) into one map-side-combinable hash
    * aggregate on lang; output is |languages| rows.
    */
  private def x19_token_fertility(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(words(col("text")))).as("n_words"),
        sum(regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))).as("n_tokens"),
        sum(length(col("text"))).as("n_chars")
      )
      .select(
        col("lang"),
        col("n_docs"),
        col("n_words").cast("long").as("n_words"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_chars").cast("long").as("n_chars"),
        expr("(1000 * n_tokens) div n_words").as("fertility_pm"),
        expr("(1000 * n_chars) div n_tokens").as("chars_per_token_pm")
      )

  /** X20 — gram-novelty DECAY curve: how many NEW distinct 5-grams each
    * additional tenth of the corpus (by doc_id position) contributes, with
    * the cumulative per-mille share — the diminishing-returns curve a
    * scaling decision reads ("does doubling this crawl still buy new
    * content, or are we past the knee?"). x16 prices ONE incoming batch
    * against the corpus; x20 prices the corpus against itself, slice by
    * slice. Each gram is attributed to the slice of its FIRST occurrence
    * (min doc_id — the well-defined distributed form of "who saw it
    * first"; grams travel as 56-bit md5 keys like x16).
    *
    * Scale shape: one groupBy-min over hashed grams (map-side
    * combinable), a single-row max-doc-id broadcast, then all windows run
    * on the ≤10-row decile spine — bounded serial tail, never a global
    * sort of grams.
    */
  private def x20_gram_novelty_decay(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val first = docs
      .select(
        col("doc_id"),
        explode(call_function("graft_word_shingles", col("text"), lit(5))).as("g")
      )
      .select(col("doc_id"), expr("conv(substr(md5(g), 1, 14), 16, 10)").cast("long").as("gk"))
      .groupBy(col("gk"))
      .agg(min(col("doc_id")).as("first_doc"))
    val maxRow = docs.agg(max(col("doc_id")).as("maxd"))
    val spine = first
      .crossJoin(broadcast(maxRow))
      .select(expr("(first_doc * 10) div (maxd + 1)").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("new_grams"))
    val wCum = Window.orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spine
      .withColumn("cum_grams", sum(col("new_grams")).over(wCum))
      .withColumn("total", sum(col("new_grams")).over(wAll))
      .select(
        col("decile"),
        col("new_grams"),
        col("cum_grams"),
        expr("1000 * cum_grams DIV total").as("cum_share_pm")
      )
  }

  /** X21 — character-class entropy: the cheap gibberish/boilerplate signal
    * (binary junk and repeated-padding documents collapse toward one class;
    * natural text sits near the corpus-typical mix of letters / digits /
    * spaces / punctuation). Shannon entropy over the four classes in bits,
    * plus the dominant-class fraction. Pure per-row projection — codegen'd
    * regexp counts, no shuffle, scan-parallel at any scale.
    */
  private def x21_char_class_entropy(s: SparkSession, d: String): DataFrame = {
    // Each class count is ONE `translate` pass (table lookup, ~2× cheaper
    // than a regex class) and is evaluated exactly once: the counts live in
    // an array literal and the entropy folds over it with a lambda, so no
    // count expression is ever duplicated into the CASE branches. The naive
    // inline form re-evaluated each regex count in every term/greatest
    // reference (codegen CSE does not reach into conditional branches) —
    // measured 30.7 s → 1.1 s at the 10× scale point for identical output.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val n     = length(col("text")).cast("double")
    def removed(alphabet: String): Column =
      (length(col("text")) - length(translate(col("text"), alphabet, ""))).cast("double")
    val cs = array(
      removed(lower),                    // letters
      removed("0123456789"),             // digits
      removed(" "),                      // spaces
      length(translate(col("text"), lower + "0123456789 ", "")).cast("double") // other
    )
    val entropy = aggregate(
      cs,
      lit(0.0),
      (acc, c) => acc + when(c > 0, -(c / n) * log2(c / n)).otherwise(lit(0.0))
    )
    table(s, d, "documents").select(
      col("doc_id"),
      round(when(n > 0, entropy).otherwise(lit(0.0)), 4).as("class_entropy_bits"),
      round(when(n > 0, array_max(cs) / n).otherwise(lit(0.0)), 4).as("dominant_frac")
    )
  }

  /** X22 — term burstiness (Church–Gale): for the top-32 corpus terms,
    * occurrences-per-containing-document cf/df in per-mille next to the
    * document-coverage rate df/N. Function words sit near coverage≈high,
    * burst≈low (one hit per doc); topical/boilerplate terms CONCENTRATE —
    * high burst at low coverage — which is the signal that separates "this
    * term is language" from "this term is a template artifact" when x7/x14
    * frequency alone can't.
    *
    * Scale shape: the (doc,term,tf) frame from one explode+hash agg; cf
    * and df are then per-term sums/counts over THAT frame (no second
    * corpus pass — d9's vocabulary-first discipline); top-32 via
    * TakeOrdered; the single-row doc count broadcasts.
    */
  /** X26 — BM25 top-k retrieval (Robertson–Walker–Jones Okapi BM25, the
    * sparse-retrieval rung a GraphRAG pipeline queries its corpus with —
    * x9's TF-IDF is the census form, this is the RANKED form with the two
    * things that make BM25 the production default: tf SATURATION (k1) and
    * length NORMALIZATION (b)): for a fixed 3-term query, score_q(d) =
    * Σ_t idf_q(t) · tfn_q(d,t) div 1000 with
    *
    *   idf_q = 10⁴·(N − df + 1) div (df + 1)          (ratio-quantized idf
    *     — the log is monotone in this ratio, and no float log may cross
    *     the engine boundary; the RANKING is what BM25's log shapes and a
    *     monotone surrogate preserves it per term)
    *   tfn_q = 2.2·10⁶·tf div (10³·tf + 12·(25 + 75·len·N div L))
    *     (k1 = 1.2, b = 0.75 cleared to integers: ×10 and ×100, avglen
    *     = L/N cleared by multiplying through by N)
    *
    * Both floors nest identically in both engines; every operand is
    * positive so div == floor. Headroom: idf_q·tfn_q ≤ 2.2·10³·10⁴·N —
    * fine to N ~ 4·10¹¹ docs, beyond that rescale the quantization
    * constants (c9's note). Output: top-20 (doc_id, score_q, n_terms_hit).
    *
    * Scale shape: the explode filters to the query terms AT THE SCAN (a
    * 3-value isin — at 100 TB this is the inverted-index probe shape:
    * only matching postings survive the first projection); df/N/L are a
    * 3-row + single-row broadcast; the score is one doc-keyed aggregate
    * and the top-k is TakeOrderedAndProject.
    */
  /** The doc-level BM25 scores behind x26's top-k — shared with the
    * hybrid-retrieval fusion (s19h), which ranks the same scores at a
    * different cut.
    */
  private[queries] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val qterms = Seq("spark", "vector", "hash")
    val docs   = table(s, d, "documents")
    val stats = docs.agg(
      count(lit(1)).as("nn"),
      sum(size(words(col("text")))).cast("long").as("ll")
    )
    val tf = docs
      .select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("len"),
        explode(words(col("text"))).as("w")
      )
      .filter(col("w").isin(qterms: _*))
      .groupBy(col("doc_id"), col("len"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfr), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        expr("10000 * (nn - df + 1) div (df + 1)").as("idf_q"),
        expr("2200000 * tf div (1000 * tf + 12 * (25 + 75 * len * nn div ll))").as("tfn_q")
      )
      .groupBy(col("doc_id"))
      .agg(
        sum(expr("idf_q * tfn_q div 1000")).as("score_q"),
        count(lit(1)).as("n_terms_hit")
      )
  }

  private def x26_bm25_topk(s: SparkSession, d: String): DataFrame =
    bm25Scored(s, d)
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(20)
      .select(
        col("doc_id"),
        col("score_q").cast("long").as("score_q"),
        col("n_terms_hit").cast("long").as("n_terms_hit")
      )

  /** X32 — pseudo-relevance feedback (RM3 shape, Lavrenko–Croft 2001 /
    * Abdul-Jaleel 2004, the classic sparse-retrieval quality lever): take
    * x26's ranking, treat its top-10 as relevant, mine the top-5 expansion
    * terms by the relevance-model weight Σ_{d∈F} tf(t,d)·score_q(d)
    * (integer-exact — each exploded occurrence contributes its document's
    * BM25 score; original query terms and single chars excluded;
    * weight-desc/term-asc tiebreak makes the expansion list
    * deterministic), then re-score ONCE with the 8-term expanded query and
    * emit the new top-20 with the rank-movement census vs the unexpanded
    * ranking (rank_old = 0 ⇔ the document ENTERED the list — expansion
    * recall the base query missed) plus the expansion term list.
    *
    * Scale shape: the feedback mine explodes only the TEN feedback
    * documents (broadcast semi-join on doc_id BEFORE the explode); the
    * re-probe is x26's posting shape with the 8-row term table as the
    * broadcast probe filter; df/stats broadcasts and one doc-keyed
    * aggregate; both rank windows run over their 20-row top lists only.
    */
  private def x32_prf_expansion(s: SparkSession, d: String): DataFrame = {
    val qterms = Seq("spark", "vector", "hash")
    val docs   = table(s, d, "documents")
    val base   = bm25Scored(s, d)
    val fb = base
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(10)
      .select(col("doc_id"), col("score_q"))
    val exp = docs
      .select(col("doc_id"), col("text"))
      .join(broadcast(fb), Seq("doc_id"))
      .select(col("score_q"), explode(words(col("text"))).as("w"))
      .filter(!col("w").isin(qterms: _*) && length(col("w")) >= 2)
      .groupBy(col("w"))
      .agg(sum(col("score_q")).as("wgt"))
      .orderBy(col("wgt").desc, col("w").asc)
      .limit(5)
    val terms = exp
      .select(col("w"))
      .unionByName(s.range(1).select(explode(array(qterms.map(lit): _*)).as("w")))
    val stats = docs.agg(
      count(lit(1)).as("nn"),
      sum(size(words(col("text")))).cast("long").as("ll")
    )
    val tf2 = docs
      .select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("len"),
        explode(words(col("text"))).as("w")
      )
      .join(broadcast(terms), Seq("w"))
      .groupBy(col("doc_id"), col("len"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfr2 = tf2.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val sc2 = tf2
      .join(broadcast(dfr2), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"),
        expr("10000 * (nn - df + 1) div (df + 1)").as("idf_q"),
        expr("2200000 * tf div (1000 * tf + 12 * (25 + 75 * len * nn div ll))").as("tfn_q")
      )
      .groupBy(col("doc_id"))
      .agg(sum(expr("idf_q * tfn_q div 1000")).as("score2_q"))
    val new20 = sc2
      .orderBy(col("score2_q").desc, col("doc_id").asc)
      .limit(20)
      .withColumn(
        "rank_new",
        row_number().over(Window.orderBy(col("score2_q").desc, col("doc_id").asc))
      )
    val old20 = base
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(20)
      .withColumn(
        "rank_old",
        row_number().over(Window.orderBy(col("score_q").desc, col("doc_id").asc))
      )
      .select(col("doc_id"), col("rank_old"))
    val el = exp.agg(
      array_join(
        transform(
          array_sort(collect_list(struct((-col("wgt")).as("nw"), col("w")))),
          x => x.getField("w")
        ),
        ","
      ).as("expansion_terms")
    )
    new20
      .join(old20, Seq("doc_id"), "left")
      .crossJoin(broadcast(el))
      .select(
        col("doc_id"),
        col("score2_q").cast("long").as("score2_q"),
        col("rank_new").cast("long").as("rank_new"),
        coalesce(col("rank_old"), lit(0)).cast("long").as("rank_old"),
        when(col("rank_old").isNull, 1L).otherwise(0L).as("entered"),
        col("expansion_terms")
      )
  }

  /** X27 — PMI collocation mining (Church–Hanks 1990, the association
    * measure behind collocation/phrase extraction — the entity-mention
    * bigrams a GraphRAG entity-extraction pass promotes to vocabulary):
    * for every adjacent word pair with count ≥ 5, the quantized pointwise
    * mutual information ratio
    *
    *   pmi_q = 10⁶ · c(ab) · W² div (B · c(a) · c(b))
    *
    * (P(ab)/(P(a)P(b)) with P(ab) = c_ab/B over B bigram positions and
    * P(w) = c_w/W over W word positions; the log is monotone in the
    * ratio, so the RANKING is PMI's — no float log crosses the engine
    * boundary). The count gate is PMI's standard variance guard (rare
    * pairs otherwise dominate). Products run in DECIMAL(38,0) (W²·c_ab
    * overflows a long past ~10⁶-word corpora; the a26 discipline), the
    * quotient narrows back to long. Top-20 by (pmi_q, pair).
    *
    * Scale shape: one unigram hash-aggregate + one positional-bigram
    * hash-aggregate (both map-side-combinable), the ≥5 gate shrinks the
    * pair frame before the two unigram-count joins (keyed equi-joins on
    * the word — NOT broadcast: a real vocabulary is large), totals ride
    * two single-row broadcasts, top-k is TakeOrderedAndProject.
    */
  private def x27_pmi_collocations(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val uni = graft.Lineage.truncate(
      docs
        .select(explode(words(col("text"))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("c"))
    )
    val biAll = graft.Lineage.truncate(
      docs
        .select(explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cab"))
    )
    val wTot = uni.agg(sum(col("c")).as("wt"))
    val bTot = biAll.agg(sum(col("cab")).as("bt"))
    biAll
      .filter(col("cab") >= 5)
      .select(
        split(col("g"), " ")(0).as("wa"),
        split(col("g"), " ")(1).as("wb"),
        col("cab")
      )
      .join(uni.select(col("w").as("wa"), col("c").as("ca")), Seq("wa"))
      .join(uni.select(col("w").as("wb"), col("c").as("cb")), Seq("wb"))
      .crossJoin(broadcast(wTot))
      .crossJoin(broadcast(bTot))
      .select(
        col("wa"),
        col("wb"),
        col("cab").cast("long").as("c_ab"),
        expr(
          """cast(1000000 as decimal(38,0)) * cab * wt * wt
             div (cast(bt as decimal(38,0)) * ca * cb)"""
        ).cast("long").as("pmi_q")
      )
      .orderBy(col("pmi_q").desc, col("wa").asc, col("wb").asc)
      .limit(20)
  }

  /** X28 — one BPE MERGE STEP (Sennrich–Haddow–Birch 2016 §3.2, the
    * byte-pair-encoding training iteration every modern tokenizer is
    * built from — x3's regex estimator COUNTS tokens, this trains the
    * vocabulary that defines them): from the corpus word-frequency table,
    * count every adjacent CHARACTER pair weighted by word frequency
    * (substr(w, i, 2) over i = 1..len−1 — no per-char explode of the
    * corpus, the vocabulary table is the unit of work, exactly why BPE
    * training is vocab-keyed and not corpus-keyed), pick the most
    * frequent pair (deterministic tiebreak), and report the top-10 pair
    * census with the chosen merge applied: symbols_before/after =
    * Σ freq·len before and after replacing the winning pair (replace is
    * left-to-right non-overlapping in both engines — BPE's own merge
    * order). One deterministic iteration, the a25/a28 discipline: the
    * fixed point is an EM-style loop, one audited step proves the
    * machinery without an open loop.
    *
    * Scale shape: the vocabulary aggregate is the only corpus-wide
    * shuffle (map-side combinable); pair counting explodes the VOCAB
    * (≤ |vocab|·maxlen rows — at 100 TB the vocabulary is millions of
    * rows, not trillions); the winner is a single-row broadcast into the
    * after-merge recount; top-10 is TakeOrdered.
    */
  private def x28_bpe_merge_step(s: SparkSession, d: String): DataFrame = {
    val vocab = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(explode(words(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"))
    )
    val pairs = vocab
      .select(
        col("w"),
        col("freq"),
        explode(expr("sequence(1, length(w) - 1)")).as("i")
      )
      .select(expr("substr(w, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"))
    val top = pairs
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(1)
      .select(col("pair").as("mpair"))
    val totals = vocab
      .crossJoin(broadcast(top))
      .select(
        col("freq"),
        length(col("w")).cast("long").as("lb"),
        // each non-overlapping occurrence of the winning pair collapses 2
        // symbols into 1: after = lb - occ, occ = (lb - len(w stripped of
        // the pair)) / 2, so after = (lb + stripped) div 2 - exact, the
        // difference is always even
        length(expr("replace(w, mpair, '')")).cast("long").as("ls")
      )
      .agg(
        sum(col("freq") * col("lb")).as("symbols_before"),
        sum(col("freq") * expr("(lb + ls) div 2")).as("symbols_after")
      )
    pairs
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(10)
      .crossJoin(broadcast(top))
      .crossJoin(broadcast(totals))
      .select(
        col("pair"),
        col("pair_count").cast("long").as("pair_count"),
        when(col("pair") === col("mpair"), 1L).otherwise(0L).as("is_merged"),
        col("symbols_before").cast("long").as("symbols_before"),
        col("symbols_after").cast("long").as("symbols_after")
      )
  }

  /** X29 — TextRank keyword extraction (Mihalcea–Tarau 2004: PageRank on
    * the word co-occurrence graph — the unsupervised keyword/keyphrase
    * baseline every extractive pipeline starts from): vertices are the
    * words of x27's gated bigram substrate (adjacent-pair count ≥ 5,
    * self-loops dropped), edges the symmetrized distinct pairs, and the
    * score three damped iterations of
    * [[graft.graph.GraphOps.pageRankQuantizedWeighted]] — g9's integer-
    * quantized core with Mihalcea–Tarau §2.2's edge weights (w = adjacency
    * count summed over both orientations, contribution = r·w div strength),
    * because on a co-occurrence graph the WEIGHTS carry the signal an
    * unweighted walk flattens. Top-20 by (rank desc, word asc). Where x9's
    * TF-IDF ranks terms by counting, TextRank ranks by RECOMMENDATION — a
    * word matters because well-connected words stand next to it often.
    *
    * Scale shape: the bigram census is the only corpus-wide shuffle
    * (map-side combinable); the ≥5 gate bounds the graph to the frequent-
    * word core (vocabulary-sized, like x28's unit of work — at 100 TB the
    * graph is millions of vertices while the corpus is trillions of
    * tokens); each PageRank pass is one keyed join + hash aggregate on
    * the pre-partitioned edge frame; top-20 is TakeOrderedAndProject.
    */
  private def x29_textrank(s: SparkSession, d: String): DataFrame = {
    val bi = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
        .select(
          split(col("g"), " ")(0).as("wa"),
          split(col("g"), " ")(1).as("wb"),
          col("cab")
        )
        .filter(col("wa") =!= col("wb"))
    )
    val edges = bi
      .select(col("wa").as("src"), col("wb").as("dst"), col("cab").as("w"))
      .unionByName(bi.select(col("wb").as("src"), col("wa").as("dst"), col("cab").as("w")))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w")).as("w"))
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.graph.GraphOps
      .pageRankQuantizedWeighted(nodes, edges, 3)
      .orderBy(col("r").desc, col("id").asc)
      .limit(20)
      .select(col("id").as("word"), col("r").cast("long").as("rank_q"))
  }

  /** X30 — Good–Turing frequency-of-frequencies smoothing census (Good
    * 1953; Gale–Sampson 1995's simple GT is the fitted version of exactly
    * this table — the probability-mass re-estimation every smoothed LM
    * and the species-richness literature rest on): over word TRIGRAMS —
    * the unit with the long tail a smoothed LM actually estimates (the
    * synthetic corpus's unigram vocabulary is hot everywhere; real GT
    * applies wherever singletons live) — N_r = how many distinct trigrams
    * occur exactly r times, the adjusted count r* = (r+1)·N_{r+1}/N_r in
    * per-mille (the expected true count of an r-count trigram: what c13's
    * frequency LM SHOULD charge instead of the raw count), and the
    * unseen-mass estimate P₀ = N₁/T in per-mille (the probability the next
    * trigram is NEW — the mass a smoothing scheme must reserve, and the
    * coverage dial next to x14/x20). Rows r = 1..10 — the head of the FoF
    * table, where GT matters (beyond it raw counts are reliable and
    * Gale–Sampson switch to them).
    *
    * Scale shape: the trigram-count aggregate is the only corpus-wide
    * shuffle (map-side combinable, gram-vocabulary-sized output — x28's
    * unit-of-work argument); the count-of-counts aggregate reduces that
    * vocabulary to a ≤max-count spine, filtered to ≤11 rows BEFORE the
    * r+1 self-join (a keyed join on a tiny frame, never a window over the
    * raw spine); the (T, N₁) totals ride one single-row broadcast.
    */
  private def x30_good_turing(s: SparkSession, d: String): DataFrame = {
    val wc = graft.Lineage.truncate(
      table(s, d, "documents")
        .select(explode(call_function("graft_word_ngrams", col("text"), lit(3))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("c"))
    )
    val fof = graft.Lineage.truncate(
      wc.filter(col("c") <= 11)
        .groupBy(col("c").as("r"))
        .agg(count(lit(1)).as("n_r"))
    )
    val tot = wc.agg(
      sum(col("c")).as("t"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1")
    )
    fof
      .filter(col("r") <= 10)
      .join(fof.select((col("r") - 1).as("r"), col("n_r").as("n_r1")), Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("r").cast("long").as("r"),
        col("n_r").cast("long").as("n_r"),
        coalesce(col("n_r1"), lit(0L)).cast("long").as("n_r_next"),
        expr("1000 * (r + 1) * coalesce(n_r1, 0) div n_r").as("r_star_pm"),
        expr("1000 * n1 div t").as("p0_pm")
      )
  }

  private def x22_term_burstiness(s: SparkSession, d: String): DataFrame = {
    val tf = table(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf
      .groupBy("term")
      .agg(sum("tf").as("cf"), count(lit(1)).as("df"))
    val n = broadcast(table(s, d, "documents").agg(count(lit(1)).as("n_docs")))
    stats
      .orderBy(col("cf").desc, col("term").asc)
      .limit(32)
      .crossJoin(n)
      .select(
        col("term"),
        col("cf"),
        col("df"),
        expr("cf * 1000 div df").as("burst_pm"),
        expr("df * 1000 div n_docs").as("coverage_pm")
      )
  }

  /** X31 — BPE apply round-trip (Sennrich–Haddow–Birch 2016 §3.2 apply
    * step; closes the train→apply loop x28 opened): train a FOUR-merge
    * ranking with x28's recurrence — each step re-counts symbol pairs on
    * the vocabulary REWRITTEN by the previous merges, so later merges may
    * consume earlier merge symbols (true BPE, not a static top-4 of the
    * initial pair table) — then apply the merges in rank order to
    * re-tokenize and re-measure x19's tokens-per-word per language.
    *
    * Merge outputs are encoded as reserved single chars 'A'..'D' (the
    * corpus alphabet is lowercase + space, checked), so symbol count stays
    * `length(w)` at every step and greedy leftmost non-overlapping rank
    * application IS `replace` — identical semantics in both engines. Words
    * rewritten down to ONE symbol are excluded from the next pair count
    * (`length(w) >= 2` per step — also the cross-engine guard: Spark's
    * `sequence(1, 0)` is [1, 0] where DuckDB's `generate_series(1, 0)` is
    * empty).
    *
    * Scale shape: training touches only the VOCABULARY (one corpus
    * aggregate, then 4 vocab-sized pair counts and single-row broadcasts —
    * x28's unit of work); application is one vocabulary-keyed join back to
    * the exploded corpus (NOT broadcast — a real vocab is large), then a
    * per-language hash aggregate. Nothing re-scans the corpus more than
    * the two passes (vocab build + apply).
    */
  /** The BPE training substrate x31 and x36 share, materialized once per
    * (session, dataset): corpus words (length ≥ 2) with frequencies, each
    * carrying its original form `w0` beside the rewrite column `w`.
    */
  private val bpeVocabMemo = graft.Memo.newMap()

  private def bpeVocab0(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(bpeVocabMemo, s, d)(
      table(s, d, "documents")
        .select(explode(words(col("text"))).as("w0"))
        .filter(length(col("w0")) >= 2)
        .groupBy(col("w0"))
        .agg(count(lit(1)).as("freq"))
        .select(col("w0"), col("w0").as("w"), col("freq"))
    )

  private def x31_bpe_apply(s: SparkSession, d: String): DataFrame = {
    val vocab0 = bpeVocab0(s, d)
    val merged = Seq("A", "B", "C", "D").foldLeft(vocab0) { (v, sym) =>
      val top = v
        .filter(length(col("w")) >= 2)
        .select(
          col("freq"),
          explode(expr("sequence(1, length(w) - 1)")).as("i"),
          col("w")
        )
        .select(expr("substr(w, i, 2)").as("pair"), col("freq"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("pc"))
        .orderBy(col("pc").desc, col("pair").asc)
        .limit(1)
        .select(col("pair").as("mp"))
      graft.Lineage.truncate(
        v.crossJoin(broadcast(top))
          .select(col("w0"), expr(s"replace(w, mp, '$sym')").as("w"), col("freq"))
      )
    }
    val tokMap = merged.select(col("w0"), length(col("w")).cast("long").as("sym_bpe"))
    table(s, d, "documents")
      .select(col("lang"), explode(words(col("text"))).as("w0"))
      .join(tokMap, Seq("w0"), "left")
      .select(
        col("lang"),
        length(col("w0")).cast("long").as("sb"),
        coalesce(col("sym_bpe"), length(col("w0")).cast("long")).as("sa")
      )
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("nw"),
        sum(col("sb")).as("sc"),
        sum(col("sa")).as("sbp")
      )
      .select(
        col("lang"),
        col("nw").cast("long").as("n_words"),
        col("sc").cast("long").as("symbols_char"),
        col("sbp").cast("long").as("symbols_bpe"),
        expr("1000 * sc div nw").as("tpw_char_pm"),
        expr("1000 * sbp div nw").as("tpw_bpe_pm")
      )
  }

  /** X36 — BPE MERGE SCHEDULE to 16 merges (Sennrich–Haddow–Birch 2016
    * §3.2: the full training recurrence x28 ran one step of and x31 ran
    * four of, taken to a 16-entry merge TABLE with the per-step census a
    * real tokenizer build reads before freezing its vocabulary): step k
    * re-counts adjacent symbol pairs on the vocabulary REWRITTEN by merges
    * 1..k−1 (later merges consume earlier merge symbols — true BPE), picks
    * the (count desc, pair asc) winner, rewrites greedily
    * leftmost-non-overlapping (reserved single chars 'A'..'P', x31's
    * encoding, so `replace` IS the apply and symbol count stays
    * `length(w)`), and logs (winning pair, its pair count, symbols saved,
    * total symbols, tokens-per-word ‰). The tpw curve is MONOTONE
    * NON-INCREASING by construction — every applied merge collapses ≥ 1
    * occurrence — which X36Spec pins along with the compression-curve
    * flattening (later merges save fewer symbols).
    *
    * Scale shape: one corpus aggregate builds the shared [[bpeVocab0]];
    * each of the 16 steps is ONE vocabulary-sized job (pair count + argmax
    * collapses to a single-row collect — the winning pair is data the next
    * rewrite's expression needs, the same driver-scalar discipline as
    * hitsQuantized's L∞ max; the rewrite is cache-pinned and the next
    * step's count fills it). Per-step totals ride one final job that
    * unions 17 single-row aggregates over the pinned vocabularies. Work
    * per step is vocab-bounded at any corpus size — the x28 argument, 16×.
    * The 16-row census itself assembles on the driver from those
    * single-row aggregates (pl4's bounded-spine pattern).
    */
  private def x36_bpe_schedule(s: SparkSession, d: String): DataFrame = {
    val Merges = 16
    val syms   = ('A' to 'P').map(_.toString)
    val v0     = bpeVocab0(s, d)
    var v      = v0
    val picks  = Array.ofDim[(String, Long)](Merges + 1) // 1-based
    val vs     = Array.ofDim[DataFrame](Merges + 1)
    vs(0) = v0
    (1 to Merges).foreach { k =>
      val top = v
        .filter(length(col("w")) >= 2)
        .select(col("freq"), explode(expr("sequence(1, length(w) - 1)")).as("i"), col("w"))
        .select(expr("substr(w, i, 2)").as("pair"), col("freq"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("pc"))
        .orderBy(col("pc").desc, col("pair").asc)
        .limit(1)
        .head()
      picks(k) = (top.getString(0), top.getLong(1))
      v = graft.Lineage.cachePin(
        v.select(col("w0"), expr(s"replace(w, '${picks(k)._1}', '${syms(k - 1)}')").as("w"), col("freq"))
      )
      vs(k) = v
    }
    val totalsRows = (0 to Merges)
      .map(k =>
        vs(k)
          .agg(
            sum(col("freq") * length(col("w"))).cast("long").as("ts"),
            sum(col("freq")).cast("long").as("nw")
          )
          .select(lit(k.toLong).as("k"), col("ts"), col("nw"))
      )
      .reduce(_.unionByName(_))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val nWords = totalsRows(0L)._2
    val out = (1 to Merges).map { k =>
      val total = totalsRows(k.toLong)._1
      val prev  = totalsRows(k.toLong - 1)._1
      (k.toLong, picks(k)._1, picks(k)._2, prev - total, total, 1000L * total / nWords)
    }
    import s.implicits._
    out.toDF("step", "merge_pair", "pair_count", "symbols_saved", "total_symbols", "tpw_pm")
      .repartition(1)
  }

  /** X37 — UNIGRAM-LM VITERBI SEGMENTATION (Kudo 2018 "Subword
    * regularization", the SentencePiece unigram model's inference step —
    * the OTHER tokenizer family beside x28/x31/x36's BPE: pieces carry
    * probabilities and a word's tokenization is the max-likelihood
    * segmentation, found by Viterbi DP over positions): the piece
    * inventory is every 1–4-char substring of the vocabulary, counted
    * with multiplicity weighted by word frequency; piece cost is the
    * integer-log₂ surrogate bitlen(N) − bitlen(cnt) (c13/x33's
    * `length(bin(x))` lane — ≈ −log₂ p(piece), ≥ 0 since cnt ≤ N by
    * construction), carried in COMBINED units cost·128 + 1 so one integer
    * min is the lexicographic (total cost, token count) minimum — the
    * deterministic tiebreak both engines share (tokens ≤ 16 < 128, and
    * any real cost difference is ≥ 128 units).
    *
    * The DP itself is ONE narrow projection, not an iterative join: each
    * word joins its (distinct) substring costs into a map once, then a
    * single `aggregate(sequence(1, L), array(0L), …)` expression folds
    * dp[j] = min_{i ∈ [j−3, j]} dp[i−1] + cost(w[i..j]) left-to-right
    * inside the row — the per-row-DP shape real tokenizer inference has
    * at 100 TB (tokenize the VOCABULARY, then the corpus joins by word —
    * x31's tokMap discipline; the corpus is never re-scanned per piece).
    * Single-char pieces always exist, so every word is segmentable.
    *
    * Output per vocab word (length ≤ 16): the Viterbi cost and its token
    * count. Oracle: the identical DP unrolled as 16 MATERIALIZED
    * position-frontier CTE steps (the g8e iterated-function-equality
    * pattern on the (word, position) lattice).
    *
    * Scale shape: one corpus aggregate (the shared [[bpeVocab0]]), one
    * vocab-substring aggregate (≤ ~60 pieces/word), one vocab-keyed join
    * + map build, one narrow DP pass — everything vocabulary-sized; at a
    * real corpus the pieces table broadcasts and tokenization rides
    * map-side, the property that makes this the production inference
    * shape.
    */
  private def x37_unigram_viterbi(s: SparkSession, d: String): DataFrame = {
    val MaxLen = 16
    val subsExpr =
      s"""flatten(transform(sequence(1, length(w0)),
            i -> transform(sequence(i, least(i + 3, length(w0))),
                   j -> substr(w0, i, j - i + 1))))"""
    val vocab = bpeVocab0(s, d)
      .filter(length(col("w0")) <= MaxLen)
      .select(col("w0"), col("freq"))
    val pieces = graft.Lineage.truncate(
      vocab
        .select(col("freq"), explode(expr(subsExpr)).as("p"))
        .groupBy(col("p"))
        .agg(sum(col("freq")).as("cnt"))
    )
    val ntot = pieces.agg(sum(col("cnt")).as("nt"))
    val costed = pieces
      .crossJoin(broadcast(ntot))
      .select(col("p"), (expr("length(bin(nt)) - length(bin(cnt))").cast("long") * 128L + 1L).as("uc"))
    val wsubs = vocab
      .select(col("w0"), explode(array_distinct(expr(subsExpr))).as("p"))
      .join(costed, "p")
      .groupBy(col("w0"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("uc")))).as("mp"))
    vocab
      .join(wsubs, "w0")
      .withColumn(
        "best",
        expr("""aggregate(sequence(1, length(w0)), array(0L),
                  (acc, j) -> array_append(acc,
                    array_min(transform(sequence(greatest(j - 3, 1), j),
                      i -> element_at(acc, i) + coalesce(element_at(mp, substr(w0, i, j - i + 1)), 99999999L)))),
                  acc -> element_at(acc, length(w0) + 1))""")
      )
      .select(
        col("w0").as("word"),
        col("freq").cast("long").as("freq"),
        expr("best div 128").cast("long").as("cost_q"),
        expr("best % 128").cast("long").as("n_tokens")
      )
  }

  /** X43 — UNIGRAM-LM TRAINING: one audited EM E-step + vocabulary PRUNE
    * (Kudo 2018 "Subword regularization" §3.2 — the training half of the
    * SentencePiece unigram model whose INFERENCE half x37 runs, closing
    * the train→apply loop the BPE family closed with x28/x31/x36):
    * seed vocabulary = the 256 most frequent multi-char (2–4) pieces plus
    * the full character alphabet (the feasibility base — every word stays
    * segmentable, so no forward/backward value is ever 0), E-step =
    * exact forward–backward occupancy over each word's segmentation
    * lattice — f[j] counts lattice paths covering the prefix, e[m] the
    * suffix, and a piece occurrence (i..j) carries mass f[i−1]·e[L−j] —
    * M-step = expected-count shares, prune = drop pieces below 100 ppm of
    * total expected mass UNLESS single-char (the feasibility invariant
    * the spec pins). Declared lane (FIXTURES discipline): paths are
    * UNIFORMLY weighted (the max-entropy seed — integer-exact in both
    * engines); production SentencePiece weights paths by seed
    * probabilities and prunes by likelihood loss, a float lane outside
    * the exact-oracle scope, with expected-count share the standard cheap
    * surrogate.
    *
    * The whole DP is ROW-LOCAL (x37's shape): each word joins its
    * inventory-membership map once, then two `aggregate` HOFs fold the
    * forward and backward count arrays inside the row — no iterative
    * join, no per-pass shuffle. Per-word masses quantize ×10⁶ against the
    * word's own path total (one integer div, identical in both engines).
    *
    * Scale shape: one corpus aggregate (the shared [[bpeVocab0]]), one
    * piece-count aggregate, a vocabulary-keyed membership join, one
    * narrow DP pass, one piece-keyed sum — everything vocabulary-sized;
    * the expected-count share census rides a single-row total broadcast.
    * Oracle: the SAME forward/backward frontiers unrolled as 2×12
    * MATERIALIZED position CTE steps (the x37/g8e pattern).
    */
  private def x43_unigram_em_prune(s: SparkSession, d: String): DataFrame = {
    val MaxLen   = 12
    val TopMulti = 256
    val subsStr =
      s"""flatten(transform(sequence(1, length(w0)),
            i -> transform(sequence(i, least(i + 3, length(w0))),
                   j -> substr(w0, i, j - i + 1))))"""
    val subsPos =
      s"""flatten(transform(sequence(1, length(w0)),
            i -> transform(sequence(i, least(i + 3, length(w0))),
                   j -> named_struct('i', i, 'j', j, 'p', substr(w0, i, j - i + 1)))))"""
    val vocab = bpeVocab0(s, d)
      .filter(length(col("w0")) <= MaxLen)
      .select(col("w0"), col("freq"))
    val pieceCnt = vocab
      .select(col("freq"), explode(expr(subsStr)).as("p"))
      .groupBy(col("p"))
      .agg(sum(col("freq")).as("cnt"))
    val inv = graft.Lineage.truncate(
      pieceCnt
        .filter(length(col("p")) === 1)
        .unionByName(
          pieceCnt
            .filter(length(col("p")) > 1)
            .orderBy(col("cnt").desc, col("p").asc)
            .limit(TopMulti))
        .select(col("p"), col("cnt"), (length(col("p")) === 1).cast("long").as("is_char"))
    )
    val wmap = vocab
      .select(col("w0"), explode(array_distinct(expr(subsStr))).as("p"))
      .join(inv.select(col("p")), "p")
      .groupBy(col("w0"))
      .agg(map_from_entries(collect_list(struct(col("p"), lit(1L)))).as("mp"))
    // forward path counts f[0..L] (f[j] at array index j+1) and backward
    // suffix counts e[0..L] by distance-from-end — both fold inside the row
    val fExpr =
      """aggregate(sequence(1, length(w0)), array(1L),
           (acc, j) -> array_append(acc,
             aggregate(sequence(1, least(j, 4)), 0L,
               (sa, k) -> sa + coalesce(element_at(mp, substr(w0, j - k + 1, k)), 0L)
                             * element_at(acc, j - k + 1))),
           acc -> acc)"""
    val eExpr =
      """aggregate(sequence(1, length(w0)), array(1L),
           (acc, m) -> array_append(acc,
             aggregate(sequence(1, least(m, 4)), 0L,
               (sa, k) -> sa + coalesce(element_at(mp, substr(w0, length(w0) - m + 1, k)), 0L)
                             * element_at(acc, m - k + 1))),
           acc -> acc)"""
    val ec = vocab
      .join(wmap, "w0")
      .withColumn("f", expr(fExpr))
      .withColumn("e", expr(eExpr))
      .select(
        col("w0"),
        col("freq"),
        col("mp"),
        col("f"),
        col("e"),
        expr("element_at(f, length(w0) + 1)").as("fl"),
        explode(expr(subsPos)).as("u"))
      .filter(expr("element_at(mp, u.p)").isNotNull)
      .select(
        col("w0"),
        col("freq"),
        col("fl"),
        col("u.p").as("p"),
        (expr("element_at(f, u.i)") * expr("element_at(e, length(w0) - u.j + 1)")).as("occm"))
      .groupBy(col("w0"), col("freq"), col("fl"), col("p"))
      .agg(sum(col("occm")).as("mass"))
      .select(col("p"), (col("freq") * expr("(1000000 * mass) div greatest(fl, 1)")).as("ecc"))
      .groupBy(col("p"))
      .agg(sum(col("ecc")).as("ec_q"))
    val joined = inv
      .join(ec, Seq("p"), "left")
      .select(col("p"), col("cnt"), col("is_char"), coalesce(col("ec_q"), lit(0L)).as("ec_q"))
    val tot = joined.agg(sum(col("ec_q")).as("t"))
    joined
      .crossJoin(broadcast(tot))
      .select(
        col("p").as("piece"),
        col("is_char"),
        col("cnt").cast("long").as("seed_cnt"),
        col("ec_q").cast("long").as("ec_q"),
        expr("(cast(ec_q as decimal(38,0)) * 1000000) div greatest(t, 1)").as("share_ppm"))
      .withColumn(
        "kept",
        (col("is_char") === 1L || col("share_ppm") >= 100L).cast("long"))
  }

  /** X45 — TOKENIZER FERTILITY census per language (the multilingual
    * tokenizer-equity audit — Ács 2019 / the mBERT–XLM-R analyses: a
    * tokenizer's FERTILITY (tokens per word) varies by language, and a
    * high-fertility language pays more sequence length per sentence, so a
    * multilingual data recipe reads this census before fixing context
    * budgets and sampling weights): every word occurrence joins the
    * x37 unigram-Viterbi segmentation (the x31 tokMap discipline — the
    * VOCABULARY is tokenized once, the corpus joins by word and is never
    * re-segmented per occurrence), then per language: word count, the
    * covered fraction ‰ (words outside the ≤16-char model vocabulary are
    * reported, not silently dropped), fertility = tokens per covered word
    * ‰, and chars per token ‰ (the compression rate).
    *
    * Scale shape: one corpus explode + a vocabulary-keyed join (broadcast
    * at real scale), one |langs|-row census; the Viterbi DP cost is
    * x37's, paid on the vocabulary only.
    */
  private def x45_tokenizer_fertility(s: SparkSession, d: String): DataFrame = {
    val vit = x37_unigram_viterbi(s, d).select(col("word"), col("n_tokens"))
    table(s, d, "documents")
      .select(col("lang"), explode(words(col("text"))).as("word"))
      .join(vit, Seq("word"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("n_tokens").isNotNull, 1L).otherwise(0L)).as("covered"),
        sum(coalesce(col("n_tokens"), lit(0L))).as("tok"),
        sum(when(col("n_tokens").isNotNull, length(col("word")).cast("long"))
          .otherwise(0L)).as("chars"))
      .select(
        col("lang"),
        col("n_words").cast("long").as("n_words"),
        expr("1000 * covered div n_words").as("covered_pm"),
        expr("1000 * tok div greatest(covered, 1)").as("fertility_pm"),
        expr("1000 * chars div greatest(tok, 1)").as("cpt_pm")
      )
  }

  /** X44 — SELF-BLEU diversity census per source (Zhu et al. 2018
    * "Texygen" §4.1 — the standard diversity gate a SYNTHETIC-data ingest
    * runs: when a generator mode-collapses, every document's n-grams
    * reappear in other documents and self-BLEU → 1, so a corpus-mixing
    * loop reads this census before admitting a synthetic source): per
    * document, the fraction of its DISTINCT n-grams (n = 2 and 3) that
    * also appear in at least one OTHER document — the presence-clipped
    * precision (declared simplification of BLEU's count-clipping;
    * presence-clipping is what diversity gating uses since the reference
    * side is the whole rest of the corpus) — then per (n, source): doc
    * count, mean and max precision ‰. High mean = low diversity.
    *
    * A maximally-DIVERSE source is PLANTED arithmetically (the d18/x33
    * discipline, engine and oracle apply the identical plant): docs
    * -id-1 for id < 20 under source 'planted_diverse', each word an md5
    * of (id, position) — globally unique grams, so its self-BLEU is
    * exactly 0 while the low-entropy natural sources sit near 1000 ‰;
    * the census proves the gate separates (spec-pinned).
    *
    * Scale shape: grams ride 56-bit md5 keys (the c28 discipline — never
    * shuffle strings), ONE gram-keyed min/max-doc-id aggregate (df >= 2 as
    * the min≠max bit — map-side combinable), one doc-keyed reassembly
    * join, and a
    * |sources|-row census. Nothing all-pairs: the "rest of the corpus"
    * comparison is the gram doc-count ≥ 2 test, not a doc×doc join.
    */
  private def x44_self_bleu(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val corpus = docs
      .select(col("doc_id"), col("source"), col("text"))
      .unionByName(
        docs
          .filter(col("doc_id") < 20)
          .select(
            (-col("doc_id") - 1).as("doc_id"),
            lit("planted_diverse").as("source"),
            array_join(
              transform(
                sequence(lit(0), lit(15)),
                i => md5(concat(col("doc_id").cast("string"), lit("#"), i.cast("string")))),
              " ").as("text")))
    def order(n: Int): DataFrame = {
      val grams = corpus
        .select(
          col("doc_id"),
          col("source"),
          explode(array_distinct(call_function("graft_word_ngrams", col("text"), lit(n)))).as("g"))
        .select(
          col("doc_id"),
          col("source"),
          conv(substring(md5(col("g")), 1, 14), 16, 10).cast("long").as("gk"))
      // "shared by >= 2 docs" needs only a BIT, not the distinct count:
      // grams are array_distinct'd per doc, so each (gk, doc) row is unique
      // and df >= 2  <=>  min(doc_id) =!= max(doc_id). min/max partial-
      // aggregate map-side, shuffling |grams| rows — countDistinct shuffled
      // the full (gram, doc) pair stream (r18 verdict item #2).
      val dc = grams
        .groupBy(col("gk"))
        .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("df2"))
      grams
        .join(dc, "gk")
        .groupBy(col("doc_id"), col("source"))
        .agg(
          count(lit(1)).as("ng"),
          sum(when(col("df2"), 1L).otherwise(0L)).as("shared"))
        .select(col("source"), expr("1000 * shared div ng").as("p_pm"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          expr("sum(p_pm) div count(1)").as("mean_p_pm"),
          max(col("p_pm")).as("max_p_pm"))
        .select(
          lit(n.toLong).as("n"),
          col("source"),
          col("n_docs").cast("long").as("n_docs"),
          col("mean_p_pm").cast("long").as("mean_p_pm"),
          col("max_p_pm").cast("long").as("max_p_pm"))
    }
    order(2).unionByName(order(3))
  }

  /** X33 — STUPID BACKOFF bigram LM perplexity filter (Brants et al. 2007
    * "Large Language Models in Machine Translation" §4 — the inexpensive
    * smoothing Google built for corpus-scale LMs precisely because it needs
    * NO discount estimation, just raw counts and a fixed backoff factor;
    * Wenzek et al. 2020 (CCNet) §4.3 is the downstream use priced here: score
    * every document against a reference-corpus LM and bucket the corpus into
    * head/middle/tail by perplexity terciles — the quality gate most open
    * LLM corpora shipped through):
    *
    *   S(w₂|w₁) = c(w₁w₂)/c(w₁)      if the bigram was seen,
    *              0.4 · c(w₂)/N      otherwise (no discount — "stupid").
    *
    * Everything rides c26's integer-log₂ lane: term = LG(c(w₁)) − LG(c(w₁w₂))
    * for seen bigrams and LG(5N) − LG(2·c(w₂)+1) for backoff (0.4 = 2/5
    * folded into the log arguments; +1 is the OOV floor where c(w₂) = 0, and
    * every term is ≥ 0 BY CONSTRUCTION — c(w₁w₂) ≤ c(w₁) — so the per-doc
    * perplexity surrogate ppl_q = 1000·Σterm div n_bigrams divides positive
    * operands only, the d20 truncate-vs-floor discipline). The LM trains on
    * the natural corpus; scoring covers natural docs PLUS c26's planted junk
    * at −id−1 (ids < 20): junk bigrams all take the backoff-to-OOV path, so
    * planted docs land in the tail bucket with ppl_q strictly above every
    * natural doc (Round15QueriesSpec pins it).
    *
    * Tercile cuts use c25's value-domain histogram (ppl_q ≤ 64000 —
    * bit-length terms are ≤ 64 — so the cumulative window runs over a
    * BOUNDED bin table, never a corpus-wide sort; CCNet's percentile cut at
    * 100 TB is exactly this histogram shape). Scale: LM tables are
    * vocabulary-sized keyed aggregates joined back by gram key (left as
    * plain equi-joins — AQE broadcasts them while they fit, shuffles when a
    * real vocabulary doesn't); the corpus sees two linear passes (train
    * count, score) and nothing all-pairs. Output: (src, bucket) census.
    */
  private def x33_stupid_backoff(s: SparkSession, d: String): DataFrame = {
    def junk(c: Column): Column =
      array_join(
        transform(sequence(lit(0), lit(15)), i => md5(concat(c, i.cast("string")))),
        " "
      )
    val docs = table(s, d, "documents")
    val uni = graft.Lineage.truncate(
      docs.select(explode(words(col("text"))).as("w")).groupBy("w").agg(count(lit(1)).as("c"))
    )
    val big = graft.Lineage.truncate(
      docs
        .select(explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("c12"))
    )
    val nTot = uni.agg(sum(col("c")).as("nw"))
    val ev = docs
      .select(col("doc_id"), lit("natural").as("src"), col("text"))
      .unionAll(
        docs
          .filter(col("doc_id") < 20)
          .select(
            (-col("doc_id") - 1).as("doc_id"),
            lit("planted_junk").as("src"),
            junk(col("text")).as("text")
          )
      )
    val bg = ev
      .select(
        col("doc_id"),
        col("src"),
        explode(call_function("graft_word_ngrams", col("text"), lit(2))).as("g")
      )
      .select(
        col("doc_id"),
        col("src"),
        col("g"),
        split(col("g"), " ")(0).as("w1"),
        split(col("g"), " ")(1).as("w2")
      )
    val terms = bg
      .join(big, Seq("g"), "left")
      .join(uni.select(col("w").as("w1"), col("c").as("cw1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c").as("cw2")), Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .select(
        col("doc_id"),
        col("src"),
        when(col("c12").isNotNull, expr("length(bin(cw1)) - length(bin(c12))"))
          .otherwise(expr("length(bin(5 * nw)) - length(bin(2 * coalesce(cw2, 0L) + 1))"))
          .cast("long")
          .as("term")
      )
    val perDoc = graft.Lineage.truncate(
      terms
        .groupBy(col("doc_id"), col("src"))
        .agg(count(lit(1)).as("n_bg"), sum(col("term")).as("sbo_q"))
        .select(col("doc_id"), col("src"), expr("(1000 * sbo_q) div n_bg").as("ppl_q"))
    )
    val hist = perDoc.groupBy(col("ppl_q")).agg(count(lit(1)).as("n"))
    val cum = hist.withColumn(
      "cacc",
      sum(col("n")).over(
        Window.orderBy(col("ppl_q")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      )
    )
    val cuts = cum
      .crossJoin(broadcast(hist.agg(sum(col("n")).as("total"))))
      .agg(
        min(when(col("cacc") * 3 >= col("total"), col("ppl_q"))).as("q1"),
        min(when(col("cacc") * 3 >= col("total") * 2, col("ppl_q"))).as("q2")
      )
    perDoc
      .crossJoin(broadcast(cuts))
      .select(
        col("src"),
        when(col("ppl_q") < col("q1"), 0L)
          .when(col("ppl_q") < col("q2"), 1L)
          .otherwise(2L)
          .as("bucket"),
        col("ppl_q")
      )
      .groupBy(col("src"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("ppl_q")).as("min_ppl_q"),
        max(col("ppl_q")).as("max_ppl_q")
      )
      .select(
        col("src"),
        col("bucket"),
        col("n_docs").cast("long").as("n_docs"),
        col("min_ppl_q").cast("long").as("min_ppl_q"),
        col("max_ppl_q").cast("long").as("max_ppl_q")
      )
  }

  /** X34 — HARD-NEGATIVE triplet mining for contrastive training
    * (Karpukhin et al. 2020, DPR §4.2: "negatives from the top BM25
    * passages that don't contain the answer" — the single trick that made
    * dense retrievers beat BM25; SimCSE and every embedding-model recipe
    * since mines the same (anchor, positive, hard-negative) triplets): the
    * training-data op that CONSUMES this engine's dedup machinery instead
    * of being one — the positive must be a true near-dup, the negative
    * must be the most-confusable non-dup, and both must come from bulk
    * corpus joins, not per-anchor scans.
    *
    * Anchors are docs 0–19; each positive is the planted d-corpus copy at
    * −id−1 (the anchor's text + ' zz tail' — shares every anchor 3-gram by
    * construction). The hard negative is the pool doc with the HIGHEST
    * distinct-3-gram overlap that is neither the anchor nor its positive
    * (3-grams, not c3/d6's 5-grams: on this corpus 5-grams are so
    * discriminative that most anchors share NONE organically — a mined
    * negative must exist for every anchor, and the weaker gram is the
    * honest "confusable" signal) —
    * lexical-overlap mining on the d6/c3 gram lane (deterministic
    * row_number tiebreak). Candidates whose overlap reaches 90% of the
    * positive's are EXCLUDED from the negative pool and counted in the
    * n_excluded column — they are suspected unlabeled near-dups, and
    * training on one as a negative is the "false negative in the batch"
    * failure DPR §5.2 warns poisons the contrastive loss (measured here:
    * at sf0.001 one anchor's organic neighbor ties its positive's full
    * overlap — without the gate that doc becomes a margin-0 negative).
    * The gate makes margin > 0 STRUCTURAL (neg < 0.9·pos by filter);
    * Round15QueriesSpec pins it on all 20 triplets.
    *
    * Scale shape: one gram explode over the pool (corpus-linear), the
    * overlap join keyed on the gram with a 20-anchor probe side (d6's
    * contamination shape — probe-bounded, never pool×pool), one
    * anchor-partitioned top-1 window. At 100 TB the anchor set is the
    * training batch — bounded by design.
    */
  private def x34_hard_negatives(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val pool = docs
      .select(col("doc_id"), col("text"))
      .unionAll(
        docs
          .filter(col("doc_id") < 20)
          .select((-col("doc_id") - 1).as("doc_id"), concat(col("text"), lit(" zz tail")).as("text"))
      )
    val grams = pool.select(
      col("doc_id"),
      explode(array_distinct(call_function("graft_word_ngrams", col("text"), lit(3)))).as("g")
    )
    val ag = grams.filter(col("doc_id").between(0, 19)).select(col("doc_id").as("a"), col("g"))
    val ov = ag
      .join(grams.select(col("doc_id").as("c"), col("g")), Seq("g"))
      .filter(col("c") =!= col("a"))
      .groupBy(col("a"), col("c"))
      .agg(count(lit(1)).as("overlap"))
    val pos = ov.filter(col("c") === -col("a") - 1).select(col("a"), col("overlap").as("pos_overlap"))
    val w   = Window.partitionBy(col("a")).orderBy(col("overlap").desc, col("c").asc)
    val neg = ov
      .filter(col("c") =!= -col("a") - 1)
      .join(pos, Seq("a"))
      .withColumn("suspect", col("overlap") * 10 >= col("pos_overlap") * 9)
      .withColumn("n_excluded", sum(when(col("suspect"), 1L).otherwise(0L)).over(Window.partitionBy(col("a"))))
      .filter(!col("suspect"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("a"), col("c").as("neg_id"), col("overlap").as("neg_overlap"), col("n_excluded"))
    pos
      .join(neg, Seq("a"))
      .select(
        col("a").cast("long").as("anchor_id"),
        (-col("a") - 1).cast("long").as("pos_id"),
        col("pos_overlap").cast("long").as("pos_overlap"),
        col("neg_id").cast("long").as("neg_id"),
        col("neg_overlap").cast("long").as("neg_overlap"),
        (col("pos_overlap") - col("neg_overlap")).cast("long").as("margin"),
        col("n_excluded").cast("long").as("n_excluded")
      )
  }

  /** Memo-shared substrate (see [[QueryModule.substrates]]): the word
    * inventory the BPE family (x26/x36/x37) trains from.
    */
  override def substrates: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "_sub_text_bpe_words" -> ((s, d) => bpeVocab0(s, d))
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x37_unigram_viterbi" -> (x37_unigram_viterbi _),
    "x43_unigram_em_prune" -> (x43_unigram_em_prune _),
    "x44_self_bleu" -> (x44_self_bleu _),
    "x45_tokenizer_fertility" -> (x45_tokenizer_fertility _),
    "x36_bpe_schedule" -> (x36_bpe_schedule _),
    "x34_hard_negatives" -> (x34_hard_negatives _),
    "x33_stupid_backoff" -> (x33_stupid_backoff _),
    "x31_bpe_apply" -> (x31_bpe_apply _),
    "x32_prf_expansion" -> (x32_prf_expansion _),
    "x25_winnowing_matches" -> (x25_winnowing_matches _),
    "x24_winnowing" -> (x24_winnowing _),
    "x30_good_turing" -> (x30_good_turing _),
    "x29_textrank" -> (x29_textrank _),
    "x28_bpe_merge_step" -> (x28_bpe_merge_step _),
    "x27_pmi_collocations" -> (x27_pmi_collocations _),
    "x26_bm25_topk" -> (x26_bm25_topk _),
    "x22_term_burstiness" -> (x22_term_burstiness _),
    "x21_char_class_entropy" -> (x21_char_class_entropy _),
    "x20_gram_novelty_decay" -> (x20_gram_novelty_decay _),
    "x19_token_fertility" -> (x19_token_fertility _),
    "x18_zipf_audit" -> (x18_zipf_audit _),
    "x17_source_overlap_matrix" -> (x17_source_overlap_matrix _),
    "x16_novelty_rate" -> (x16_novelty_rate _),
    "x15_source_divergence" -> (x15_source_divergence _),
    "x12_cmsketch_registers" -> (x12_cmsketch_registers _),
    "x38_countmin_hitters" -> (x38_countmin_hitters _),
    "x41_texttiling" -> (x41_texttiling _),
    "x42_loop_detector" -> (x42_loop_detector _),
    "x11_reservoir_sample" -> (x11_reservoir_sample _),
    "x9_tfidf_topk" -> (x9_tfidf_topk _),
    "x10_hll_registers" -> (x10_hll_registers _),
    "x13_hll_union" -> (x13_hll_union _),
    "x14_term_coverage" -> (x14_term_coverage _),
    "x1_lang_id" -> (x1_lang_id _),
    "x2_quality_score" -> (x2_quality_score _),
    "x3_token_count" -> (x3_token_count _),
    "x4_fingerprint" -> (x4_fingerprint _),
    "x5_sample_split" -> (x5_sample_split _),
    "x6_pii_redact" -> (x6_pii_redact _),
    "x7_df_stats" -> (x7_df_stats _),
    "x8_repetition" -> (x8_repetition _)
  )

  private def inList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")

  private def stopCountSql(xs: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text, ' '), w -> w IN (${inList(xs)}))) AS BIGINT)"

  private val textrankStep: Int => String = t =>
    s"""pr$t AS (
          SELECT n.id, 150000 + (85 * coalesce(s.c, 0)) // 100 AS r
          FROM prnodes n LEFT JOIN (
            SELECT e.dst AS id, sum(p.r * e.w // o.sw) AS c
            FROM predges e
            JOIN pr${t - 1} p ON p.id = e.src
            JOIN prstr o ON o.src = e.src
            GROUP BY e.dst) s ON s.id = n.id)"""

  /** One BPE merge step in SQL: pick the max-frequency pair from `vPrev`
    * (freq desc, pair asc tiebreak — binary collation in both engines) and
    * rewrite the vocabulary with the reserved symbol. Words already at one
    * symbol contribute no pairs (length guard, see [[x31_bpe_apply]]).
    */
  private def bpeStepSql(k: Int, sym: String): String =
    s"""t$k AS (
          SELECT pair FROM (
            SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                     i -> substr(w, CAST(i AS INT), 2))) AS pair, freq
            FROM v${k - 1} WHERE length(w) >= 2)
          GROUP BY 1 ORDER BY sum(freq) DESC, pair LIMIT 1),
        v$k AS (SELECT w0, replace(w, pair, '$sym') AS w, freq FROM v${k - 1}, t$k)"""

  /** One x36 oracle step: like [[bpeStepSql]] but keeps the winner's pair
    * count and snapshots the post-rewrite total symbol mass, so the
    * census columns regenerate per step (iterated-function equality — any
    * prefix of the 16 steps agrees between engines).
    */
  private def x36StepSql(k: Int, sym: String): String =
    s"""t$k AS MATERIALIZED (
          SELECT pair, CAST(sum(freq) AS BIGINT) AS pc FROM (
            SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                     i -> substr(w, CAST(i AS INT), 2))) AS pair, freq
            FROM v${k - 1} WHERE length(w) >= 2)
          GROUP BY 1 ORDER BY pc DESC, pair LIMIT 1),
        v$k AS MATERIALIZED (
          SELECT w0, replace(w, (SELECT pair FROM t$k), '$sym') AS w, freq
          FROM v${k - 1}),
        c$k AS MATERIALIZED (
          SELECT CAST(sum(freq * length(w)) AS BIGINT) AS ts FROM v$k)"""

  private val x36OracleSql: String = {
    val syms  = ('A' to 'P').map(_.toString)
    val steps = (1 to 16).map(k => x36StepSql(k, syms(k - 1))).mkString(",\n        ")
    val rows = (1 to 16)
      .map(k => s"""SELECT CAST($k AS BIGINT) AS step,
                 (SELECT pair FROM t$k) AS merge_pair,
                 (SELECT pc FROM t$k) AS pair_count,
                 (SELECT ts FROM c${k - 1}) - (SELECT ts FROM c$k) AS symbols_saved,
                 (SELECT ts FROM c$k) AS total_symbols,
                 1000 * (SELECT ts FROM c$k) // (SELECT nw FROM n0) AS tpw_pm""")
      .mkString(" UNION ALL ")
    s"""WITH v0 AS MATERIALIZED (
          SELECT w AS w0, w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY 1, 2),
        c0 AS (SELECT CAST(sum(freq * length(w)) AS BIGINT) AS ts FROM v0),
        n0 AS (SELECT CAST(sum(freq) AS BIGINT) AS nw FROM v0),
        $steps
        $rows ORDER BY step"""
  }

  /** The x37 oracle: the same integer Viterbi DP unrolled as position-
    * frontier CTE steps — a$j holds dp for every (word, position ≤ j); a
    * word's answer sits at position = its length. MATERIALIZED throughout
    * (the x36 lesson: inlined chained CTEs re-evaluate exponentially).
    */
  /** The x37 Viterbi-lattice CTE chain (v0, pieces, costs, 16 frontier
    * steps → a16) — shared by the x37 oracle and x45's per-word token
    * counts.
    */
  private val x37LatticeSql: String = {
    val steps = (1 to 16)
      .map(j => s"""d$j AS MATERIALIZED (
             SELECT ss.w0, $j AS jj, min(p.dp + ss.uc) AS dp
             FROM a${j - 1} p JOIN ss ON ss.w0 = p.w0 AND ss.i = p.jj + 1 AND ss.j = $j
             GROUP BY 1),
           a$j AS MATERIALIZED (
             SELECT * FROM a${j - 1} UNION ALL SELECT * FROM d$j)""")
      .mkString(",\n        ")
    s"""v0 AS MATERIALIZED (
          SELECT w AS w0, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE length(w) BETWEEN 2 AND 16 GROUP BY 1),
        occ AS MATERIALIZED (
          SELECT unnest(flatten(list_transform(generate_series(1, length(w0)),
                   i -> list_transform(generate_series(i, least(i + 3, length(w0))),
                          j -> substr(w0, CAST(i AS INT), CAST(j - i + 1 AS INT)))))) AS p,
                 freq
          FROM v0),
        pieces AS MATERIALIZED (SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM occ GROUP BY 1),
        nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pieces),
        ss AS MATERIALIZED (
          SELECT t.w0,
                 CAST(t.u['i'] AS BIGINT) AS i,
                 CAST(t.u['j'] AS BIGINT) AS j,
                 (length(bin(nt.n)) - length(bin(c.cnt))) * 128 + 1 AS uc
          FROM (SELECT w0,
                       unnest(flatten(list_transform(generate_series(1, length(w0)),
                         i -> list_transform(generate_series(i, least(i + 3, length(w0))),
                                j -> {'i': i, 'j': j, 'p': substr(w0, CAST(i AS INT), CAST(j - i + 1 AS INT))})))) AS u
                FROM v0) t,
               pieces c, nt
          WHERE c.p = t.u['p']),
        a0 AS MATERIALIZED (SELECT w0, 0 AS jj, CAST(0 AS BIGINT) AS dp FROM v0),
        $steps,
        vit AS MATERIALIZED (
          SELECT v.w0 AS word, v.freq,
                 CAST(a.dp // 128 AS BIGINT) AS cost_q,
                 CAST(a.dp % 128 AS BIGINT) AS n_tokens
          FROM a16 a JOIN v0 v ON v.w0 = a.w0 AND a.jj = length(v.w0))"""
  }

  private val x37OracleSql: String =
    s"""WITH $x37LatticeSql
        SELECT word, freq, cost_q, n_tokens FROM vit"""

  /** The x43 oracle: the same uniform-lattice forward/backward counts
    * unrolled as 2×12 MATERIALIZED position-frontier CTE steps (x37's
    * frontier shape with `sum` where Viterbi had `min`), then occupancy
    * mass per (word, piece), the ×10⁶ per-word quantization, and the
    * share/prune census.
    */
  private val x43OracleSql: String = {
    val fSteps = (1 to 12)
      .map(j => s"""fd$j AS MATERIALIZED (
             SELECT ss.w0, $j AS jj, sum(p.f) AS f
             FROM fa${j - 1} p JOIN ss ON ss.w0 = p.w0 AND ss.i = p.jj + 1 AND ss.j = $j
             GROUP BY 1),
           fa$j AS MATERIALIZED (
             SELECT * FROM fa${j - 1} UNION ALL SELECT * FROM fd$j)""")
      .mkString(",\n        ")
    val eSteps = (1 to 12)
      .map(m => s"""ed$m AS MATERIALIZED (
             SELECT ss.w0, $m AS mm, sum(p.e) AS e
             FROM eb${m - 1} p JOIN ss
               ON ss.w0 = p.w0 AND ss.i = ss.len - $m + 1 AND p.mm = ss.len - ss.j
             GROUP BY 1),
           eb$m AS MATERIALIZED (
             SELECT * FROM eb${m - 1} UNION ALL SELECT * FROM ed$m)""")
      .mkString(",\n        ")
    s"""WITH v0 AS MATERIALIZED (
          SELECT w AS w0, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE length(w) BETWEEN 2 AND 12 GROUP BY 1),
        occ AS MATERIALIZED (
          SELECT unnest(flatten(list_transform(generate_series(1, length(w0)),
                   i -> list_transform(generate_series(i, least(i + 3, length(w0))),
                          j -> substr(w0, CAST(i AS INT), CAST(j - i + 1 AS INT)))))) AS p,
                 freq
          FROM v0),
        pcnt AS MATERIALIZED (SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM occ GROUP BY 1),
        inv AS MATERIALIZED (
          SELECT p, cnt, CAST(1 AS BIGINT) AS is_char FROM pcnt WHERE length(p) = 1
          UNION ALL
          SELECT p, cnt, CAST(0 AS BIGINT) AS is_char FROM (
            SELECT p, cnt FROM pcnt WHERE length(p) > 1 ORDER BY cnt DESC, p LIMIT 256)),
        ss AS MATERIALIZED (
          SELECT t.w0, t.len,
                 CAST(t.u['i'] AS BIGINT) AS i,
                 CAST(t.u['j'] AS BIGINT) AS j,
                 t.u['p'] AS p
          FROM (SELECT w0, length(w0) AS len,
                       unnest(flatten(list_transform(generate_series(1, length(w0)),
                         i -> list_transform(generate_series(i, least(i + 3, length(w0))),
                                j -> {'i': i, 'j': j,
                                      'p': substr(w0, CAST(i AS INT), CAST(j - i + 1 AS INT))})))) AS u
                FROM v0) t
          WHERE t.u['p'] IN (SELECT p FROM inv)),
        fa0 AS MATERIALIZED (SELECT w0, 0 AS jj, CAST(1 AS BIGINT) AS f FROM v0),
        $fSteps,
        eb0 AS MATERIALIZED (SELECT w0, 0 AS mm, CAST(1 AS BIGINT) AS e FROM v0),
        $eSteps,
        mass AS MATERIALIZED (
          SELECT ss.w0, ss.p, sum(fa.f * eb.e) AS mass
          FROM ss
          JOIN fa12 fa ON fa.w0 = ss.w0 AND fa.jj = ss.i - 1
          JOIN eb12 eb ON eb.w0 = ss.w0 AND eb.mm = ss.len - ss.j
          GROUP BY 1, 2),
        fl AS MATERIALIZED (
          SELECT fa12.w0, fa12.f AS fl FROM fa12 JOIN v0 ON v0.w0 = fa12.w0
          WHERE fa12.jj = length(v0.w0)),
        ec AS MATERIALIZED (
          SELECT mass.p,
                 CAST(sum(v0.freq * ((1000000 * mass.mass) // greatest(fl.fl, 1))) AS BIGINT) AS ec_q
          FROM mass JOIN v0 ON v0.w0 = mass.w0 JOIN fl ON fl.w0 = mass.w0
          GROUP BY 1),
        jn AS MATERIALIZED (
          SELECT inv.p, inv.cnt, inv.is_char, coalesce(ec.ec_q, 0) AS ec_q
          FROM inv LEFT JOIN ec USING (p)),
        tot AS (SELECT sum(ec_q) AS t FROM jn),
        shares AS (
          SELECT p AS piece, is_char, CAST(cnt AS BIGINT) AS seed_cnt,
                 CAST(ec_q AS BIGINT) AS ec_q,
                 CAST((CAST(ec_q AS HUGEINT) * 1000000) // greatest(tot.t, 1) AS BIGINT) AS share_ppm
          FROM jn, tot)
        SELECT piece, is_char, seed_cnt, ec_q, share_ppm,
               CAST(CASE WHEN is_char = 1 OR share_ppm >= 100 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM shares"""
  }

  val oracles: Map[String, String] = Map(
    "x37_unigram_viterbi" -> x37OracleSql,
    "x45_tokenizer_fertility" ->
      s"""WITH $x37LatticeSql,
          occw AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
          j AS (SELECT occw.lang, occw.word, vit.n_tokens, length(occw.word) AS wl
                FROM occw LEFT JOIN vit ON vit.word = occw.word)
          SELECT lang,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(1000 * sum(CASE WHEN n_tokens IS NOT NULL THEN 1 ELSE 0 END)
                      // count(*) AS BIGINT) AS covered_pm,
                 CAST(1000 * sum(coalesce(n_tokens, 0))
                      // greatest(sum(CASE WHEN n_tokens IS NOT NULL THEN 1 ELSE 0 END), 1)
                      AS BIGINT) AS fertility_pm,
                 CAST(1000 * sum(CASE WHEN n_tokens IS NOT NULL THEN wl ELSE 0 END)
                      // greatest(sum(coalesce(n_tokens, 0)), 1) AS BIGINT) AS cpt_pm
          FROM j GROUP BY 1""",
    "x43_unigram_em_prune" -> x43OracleSql,
    "x44_self_bleu" -> {
      def order(n: Int): String = {
        val gramExpr =
          if (n == 2) "list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])"
          else "list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])"
        s"""SELECT CAST($n AS BIGINT) AS n, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(p_pm) // count(*) AS BIGINT) AS mean_p_pm,
                   CAST(max(p_pm) AS BIGINT) AS max_p_pm
            FROM (
              SELECT doc_id, source, 1000 * sum(CASE WHEN dc >= 2 THEN 1 ELSE 0 END) // count(*) AS p_pm
              FROM (
                SELECT g.doc_id, g.source, g.gk, dcnt.dc
                FROM (SELECT doc_id, source,
                             ('0x' || substr(md5(gr), 1, 14))::BIGINT AS gk
                      FROM (SELECT doc_id, source,
                                   unnest(list_distinct($gramExpr)) AS gr
                            FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
                                  FROM corpus))) g
                JOIN (SELECT gk, count(DISTINCT doc_id) AS dc FROM
                        (SELECT doc_id, ('0x' || substr(md5(gr), 1, 14))::BIGINT AS gk
                         FROM (SELECT doc_id, unnest(list_distinct($gramExpr)) AS gr
                               FROM (SELECT doc_id, string_split(text, ' ') AS ws
                                     FROM corpus))) GROUP BY 1) dcnt
                  ON dcnt.gk = g.gk)
              GROUP BY 1, 2)
            GROUP BY 2"""
      }
      s"""WITH corpus AS MATERIALIZED (
            SELECT doc_id, source, text FROM documents
            UNION ALL
            SELECT -doc_id - 1, 'planted_diverse',
                   array_to_string(list_transform(generate_series(0, 15),
                     i -> md5(CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR))), ' ')
            FROM documents WHERE doc_id < 20)
          ${order(2)} UNION ALL ${order(3)}"""
    },
    "x36_bpe_schedule" -> x36OracleSql,
    "x34_hard_negatives" ->
      """WITH pool AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT -doc_id - 1, text || ' zz tail' FROM documents WHERE doc_id < 20),
         gr AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(0, len(string_split(text, ' ')) - 3),
                    i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')))) AS g
           FROM pool),
         ag AS (SELECT doc_id AS a, g FROM gr WHERE doc_id BETWEEN 0 AND 19),
         ov AS (SELECT ag.a, gr.doc_id AS c, count(*) AS overlap
                FROM ag JOIN gr USING (g)
                WHERE gr.doc_id <> ag.a
                GROUP BY 1, 2),
         pos AS (SELECT a, overlap AS pos_overlap FROM ov WHERE c = -a - 1),
         cand AS (SELECT o.a, o.c, o.overlap,
                         o.overlap * 10 >= p.pos_overlap * 9 AS suspect,
                         sum(CASE WHEN o.overlap * 10 >= p.pos_overlap * 9
                                  THEN 1 ELSE 0 END)
                           OVER (PARTITION BY o.a) AS n_excluded
                  FROM ov o JOIN pos p USING (a) WHERE o.c <> -o.a - 1),
         neg AS (SELECT a, c AS neg_id, overlap AS neg_overlap, n_excluded FROM (
                   SELECT a, c, overlap, n_excluded,
                          row_number() OVER (PARTITION BY a
                                             ORDER BY overlap DESC, c) AS rn
                   FROM cand WHERE NOT suspect)
                 WHERE rn = 1)
         SELECT CAST(a AS BIGINT) AS anchor_id,
                CAST(-a - 1 AS BIGINT) AS pos_id,
                CAST(pos_overlap AS BIGINT) AS pos_overlap,
                CAST(neg_id AS BIGINT) AS neg_id,
                CAST(neg_overlap AS BIGINT) AS neg_overlap,
                CAST(pos_overlap - neg_overlap AS BIGINT) AS margin,
                CAST(n_excluded AS BIGINT) AS n_excluded
         FROM pos JOIN neg USING (a)""",
    "x33_stupid_backoff" ->
      """WITH tr AS (SELECT string_split(text, ' ') AS a FROM documents),
         uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(a) AS w FROM tr) GROUP BY 1),
         big AS (SELECT g, count(*) AS c12 FROM (
                   SELECT unnest(list_transform(range(1, len(a)),
                            i -> a[i] || ' ' || a[i + 1])) AS g
                   FROM tr) GROUP BY 1),
         nt AS (SELECT sum(c) AS nw FROM uni),
         jt AS (SELECT doc_id,
                       array_to_string(list_transform(generate_series(0, 15),
                         i -> md5(text || CAST(i AS VARCHAR))), ' ') AS jtext
                FROM documents WHERE doc_id < 20),
         ev AS (SELECT doc_id, 'natural' AS src, text FROM documents
                UNION ALL
                SELECT -doc_id - 1, 'planted_junk', jtext FROM jt),
         eb AS (SELECT doc_id, src,
                       unnest(list_transform(range(1, len(a)),
                         i -> a[i] || ' ' || a[i + 1])) AS g
                FROM (SELECT doc_id, src, string_split(text, ' ') AS a FROM ev)),
         et AS (SELECT doc_id, src,
                       CASE WHEN b.c12 IS NOT NULL
                            THEN length(bin(u1.c)) - length(bin(b.c12))
                            ELSE length(bin(5 * nw)) - length(bin(2 * coalesce(u2.c, 0) + 1))
                       END AS term
                FROM eb
                LEFT JOIN big b USING (g)
                LEFT JOIN uni u1 ON u1.w = string_split(g, ' ')[1]
                LEFT JOIN uni u2 ON u2.w = string_split(g, ' ')[2]
                CROSS JOIN nt),
         pd AS (SELECT doc_id, src, (1000 * sum(term)) // count(*) AS ppl_q
                FROM et GROUP BY 1, 2),
         hist AS (SELECT ppl_q, count(*) AS n FROM pd GROUP BY 1),
         cum AS (SELECT ppl_q, n,
                        sum(n) OVER (ORDER BY ppl_q ROWS UNBOUNDED PRECEDING) AS cacc
                 FROM hist),
         tot AS (SELECT sum(n) AS total FROM hist),
         cuts AS (SELECT min(CASE WHEN cacc * 3 >= total THEN ppl_q END) AS q1,
                         min(CASE WHEN cacc * 3 >= 2 * total THEN ppl_q END) AS q2
                  FROM cum CROSS JOIN tot)
         SELECT src,
                CAST(CASE WHEN ppl_q < q1 THEN 0
                          WHEN ppl_q < q2 THEN 1 ELSE 2 END AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(ppl_q) AS BIGINT) AS min_ppl_q,
                CAST(max(ppl_q) AS BIGINT) AS max_ppl_q
         FROM pd CROSS JOIN cuts GROUP BY 1, 2""",
    "x31_bpe_apply" ->
      s"""WITH v0 AS (
           SELECT w AS w0, w, count(*) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE length(w) >= 2 GROUP BY w),
         ${bpeStepSql(1, "A")},
         ${bpeStepSql(2, "B")},
         ${bpeStepSql(3, "C")},
         ${bpeStepSql(4, "D")},
         m AS (SELECT w0, CAST(length(w) AS BIGINT) AS sym_bpe FROM v4),
         c AS (SELECT lang, unnest(string_split(text, ' ')) AS w0 FROM documents),
         j AS (SELECT lang, CAST(length(c.w0) AS BIGINT) AS sb,
                      coalesce(m.sym_bpe, CAST(length(c.w0) AS BIGINT)) AS sa
               FROM c LEFT JOIN m ON c.w0 = m.w0)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(sb) AS BIGINT) AS symbols_char,
                CAST(sum(sa) AS BIGINT) AS symbols_bpe,
                CAST(1000 * sum(sb) // count(*) AS BIGINT) AS tpw_char_pm,
                CAST(1000 * sum(sa) // count(*) AS BIGINT) AS tpw_bpe_pm
         FROM j GROUP BY lang""",
    "x30_good_turing" ->
      """WITH a AS (SELECT string_split(text, ' ') AS a FROM documents),
         wc AS (SELECT w, count(*) AS c FROM (
                  SELECT unnest(list_transform(range(1, len(a) - 1),
                           i -> a[i] || ' ' || a[i + 1] || ' ' || a[i + 2])) AS w
                  FROM a) GROUP BY 1),
         fof AS (SELECT c AS r, count(*) AS n_r FROM wc
                 WHERE c <= 11 GROUP BY 1),
         tot AS (SELECT sum(c) AS t,
                        sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1
                 FROM wc)
         SELECT CAST(f.r AS BIGINT) AS r,
                CAST(f.n_r AS BIGINT) AS n_r,
                CAST(COALESCE(g.n_r, 0) AS BIGINT) AS n_r_next,
                CAST(1000 * (f.r + 1) * COALESCE(g.n_r, 0) // f.n_r AS BIGINT)
                  AS r_star_pm,
                CAST(1000 * n1 // t AS BIGINT) AS p0_pm
         FROM fof f
         LEFT JOIN fof g ON g.r = f.r + 1
         CROSS JOIN tot
         WHERE f.r <= 10""",
    "x29_textrank" ->
      s"""WITH a AS (SELECT string_split(text, ' ') AS a FROM documents),
          bi AS (SELECT g, count(*) AS cab FROM (
                   SELECT unnest(list_transform(range(1, len(a)),
                            i -> a[i] || ' ' || a[i + 1])) AS g
                   FROM a) GROUP BY 1),
          pp AS (SELECT string_split(g, ' ')[1] AS wa,
                        string_split(g, ' ')[2] AS wb,
                        cab
                 FROM bi
                 WHERE cab >= 5
                   AND string_split(g, ' ')[1] <> string_split(g, ' ')[2]),
          predges AS MATERIALIZED (
            SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
              SELECT wa AS src, wb AS dst, cab AS w FROM pp
              UNION ALL
              SELECT wb AS src, wa AS dst, cab AS w FROM pp)
            GROUP BY 1, 2),
          prnodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM predges),
          prstr AS MATERIALIZED (
            SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM predges GROUP BY src),
          pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM prnodes),
          ${(1 to 3).map(textrankStep).mkString(", ")}
          SELECT id AS word, CAST(r AS BIGINT) AS rank_q
          FROM pr3 ORDER BY r DESC, id LIMIT 20""",
    "x28_bpe_merge_step" ->
      """WITH vocab AS (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE length(w) >= 2 GROUP BY 1),
         pr AS (
           SELECT pair, sum(freq) AS pair_count FROM (
             SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                      i -> substr(w, CAST(i AS INT), 2))) AS pair,
                    freq
             FROM vocab)
           GROUP BY 1),
         top AS (SELECT pair AS mpair FROM pr
                 ORDER BY pair_count DESC, pair LIMIT 1),
         tot AS (
           SELECT sum(freq * length(w)) AS symbols_before,
                  sum(freq * ((length(w) + length(replace(w, mpair, ''))) // 2))
                    AS symbols_after
           FROM vocab, top),
         t10 AS (SELECT pair, pair_count FROM pr
                 ORDER BY pair_count DESC, pair LIMIT 10)
         SELECT t10.pair, CAST(pair_count AS BIGINT) AS pair_count,
                CAST(CASE WHEN t10.pair = mpair THEN 1 ELSE 0 END AS BIGINT)
                  AS is_merged,
                CAST(symbols_before AS BIGINT) AS symbols_before,
                CAST(symbols_after AS BIGINT) AS symbols_after
         FROM t10, top, tot""",
    "x27_pmi_collocations" ->
      """WITH a AS (SELECT string_split(text, ' ') AS a FROM documents),
         uni AS (SELECT w, count(*) AS c FROM (
                   SELECT unnest(a) AS w FROM a) GROUP BY 1),
         bi AS (SELECT g, count(*) AS cab FROM (
                  SELECT unnest(list_transform(range(1, len(a)),
                           i -> a[i] || ' ' || a[i + 1])) AS g
                  FROM a) GROUP BY 1),
         wt AS (SELECT sum(c) AS wt FROM uni),
         bt AS (SELECT sum(cab) AS bt FROM bi),
         sc AS (
           SELECT string_split(g, ' ')[1] AS wa,
                  string_split(g, ' ')[2] AS wb,
                  cab
           FROM bi WHERE cab >= 5)
         SELECT sc.wa, sc.wb, CAST(cab AS BIGINT) AS c_ab,
                CAST(CAST(1000000 AS HUGEINT) * cab * wt * wt
                     // (CAST(bt AS HUGEINT) * ua.c * ub.c) AS BIGINT) AS pmi_q
         FROM sc
         JOIN uni ua ON ua.w = sc.wa
         JOIN uni ub ON ub.w = sc.wb
         CROSS JOIN wt CROSS JOIN bt
         ORDER BY pmi_q DESC, wa ASC, wb ASC
         LIMIT 20""",
    "x32_prf_expansion" ->
      """WITH st AS (
           SELECT count(*) AS nn,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ll
           FROM documents),
         tf0 AS (
           SELECT doc_id, len, w, count(*) AS tf FROM (
             SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
                    unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE w IN ('spark', 'vector', 'hash')
           GROUP BY 1, 2, 3),
         df0 AS (SELECT w, count(*) AS df FROM tf0 GROUP BY 1),
         sc0 AS (
           SELECT doc_id,
                  sum((10000 * (nn - df + 1) // (df + 1)) *
                      (2200000 * tf // (1000 * tf + 12 * (25 + 75 * len * nn // ll)))
                      // 1000) AS score_q
           FROM tf0 JOIN df0 USING (w) CROSS JOIN st GROUP BY 1),
         fb AS (SELECT doc_id, score_q FROM sc0
                ORDER BY score_q DESC, doc_id LIMIT 10),
         expn AS (SELECT w, sum(score_q) AS wgt FROM (
                    SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w
                    FROM documents d JOIN fb USING (doc_id)) t
                  JOIN fb USING (doc_id)
                  WHERE w NOT IN ('spark', 'vector', 'hash') AND length(w) >= 2
                  GROUP BY 1 ORDER BY wgt DESC, w LIMIT 5),
         terms AS (SELECT w FROM expn
                   UNION ALL SELECT unnest(['spark', 'vector', 'hash']) AS w),
         tf2 AS (
           SELECT doc_id, len, t.w, count(*) AS tf FROM (
             SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
                    unnest(string_split(text, ' ')) AS w
             FROM documents) t
           JOIN terms ON terms.w = t.w
           GROUP BY 1, 2, 3),
         df2 AS (SELECT w, count(*) AS df FROM tf2 GROUP BY 1),
         sc2 AS (
           SELECT doc_id,
                  sum((10000 * (nn - df + 1) // (df + 1)) *
                      (2200000 * tf // (1000 * tf + 12 * (25 + 75 * len * nn // ll)))
                      // 1000) AS score2_q
           FROM tf2 JOIN df2 USING (w) CROSS JOIN st GROUP BY 1),
         new20 AS (SELECT doc_id, score2_q,
                          row_number() OVER (ORDER BY score2_q DESC, doc_id) AS rank_new
                   FROM sc2 ORDER BY score2_q DESC, doc_id LIMIT 20),
         old20 AS (SELECT doc_id,
                          row_number() OVER (ORDER BY score_q DESC, doc_id) AS rank_old
                   FROM sc0 ORDER BY score_q DESC, doc_id LIMIT 20),
         el AS (SELECT string_agg(w, ',' ORDER BY wgt DESC, w) AS expansion_terms
                FROM expn)
         SELECT n.doc_id,
                CAST(score2_q AS BIGINT) AS score2_q,
                CAST(rank_new AS BIGINT) AS rank_new,
                CAST(coalesce(rank_old, 0) AS BIGINT) AS rank_old,
                CAST(CASE WHEN rank_old IS NULL THEN 1 ELSE 0 END AS BIGINT) AS entered,
                expansion_terms
         FROM new20 n LEFT JOIN old20 o USING (doc_id) CROSS JOIN el""",
    "x26_bm25_topk" ->
      """WITH st AS (
           SELECT count(*) AS nn,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ll
           FROM documents),
         tf AS (
           SELECT doc_id, len, w, count(*) AS tf FROM (
             SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
                    unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE w IN ('spark', 'vector', 'hash')
           GROUP BY 1, 2, 3),
         dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         sc AS (
           SELECT doc_id,
                  10000 * (nn - df + 1) // (df + 1) AS idf_q,
                  2200000 * tf // (1000 * tf + 12 * (25 + 75 * len * nn // ll)) AS tfn_q
           FROM tf JOIN dfr USING (w) CROSS JOIN st)
         SELECT doc_id,
                CAST(sum(idf_q * tfn_q // 1000) AS BIGINT) AS score_q,
                CAST(count(*) AS BIGINT) AS n_terms_hit
         FROM sc GROUP BY 1
         ORDER BY score_q DESC, doc_id ASC
         LIMIT 20""",
    "x25_winnowing_matches" ->
      """WITH b AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         pl AS (
           SELECT -doc_id - 1 AS doc_id,
                  list_concat(list_transform(ws[1:12], w -> w || '~p'), ws[13:42]) AS ws
           FROM b WHERE len(ws) >= 44),
         corpus AS (
           SELECT doc_id, ws FROM b UNION ALL SELECT doc_id, ws FROM pl),
         h AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 3
                  THEN list_transform(generate_series(0, len(ws) - 3),
                    i -> ('0x' || substr(md5(array_to_string(ws[i+1:i+3], ' ')), 1, 6))::BIGINT)
                  ELSE []::BIGINT[] END AS hs
           FROM corpus),
         wn AS (
           SELECT doc_id, list_distinct(hs) AS grams,
                  list_distinct(CASE WHEN len(hs) >= 4
                       THEN list_transform(generate_series(0, len(hs) - 4),
                              j -> list_min(hs[j+1:j+4]))
                       WHEN len(hs) >= 1 THEN [list_min(hs)]
                       ELSE []::BIGINT[] END) AS fps
           FROM h),
         post AS (SELECT doc_id, unnest(fps) AS fp FROM wn),
         keep AS (SELECT fp FROM post GROUP BY fp HAVING count(*) <= 16),
         kept AS MATERIALIZED (SELECT p.doc_id, p.fp FROM post p JOIN keep USING (fp)),
         pairs AS (
           SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS shared_fingerprints
           FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
                CAST(p.doc_b AS BIGINT) AS doc_b,
                p.shared_fingerprints,
                CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS shared_grams,
                (p.doc_a = -p.doc_b - 1) AS planted
         FROM pairs p
         JOIN wn a ON a.doc_id = p.doc_a
         JOIN wn b ON b.doc_id = p.doc_b""",
    "x24_winnowing" ->
      """WITH b AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         h AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 3
                  THEN list_transform(generate_series(0, len(ws) - 3),
                    i -> ('0x' || substr(md5(array_to_string(ws[i+1:i+3], ' ')), 1, 6))::BIGINT)
                  ELSE []::BIGINT[] END AS hs
           FROM b),
         wn AS (
           SELECT doc_id, hs,
                  CASE WHEN len(hs) >= 4
                       THEN list_transform(generate_series(0, len(hs) - 4),
                              j -> list_min(hs[j+1:j+4]))
                       WHEN len(hs) >= 1 THEN [list_min(hs)]
                       ELSE []::BIGINT[] END AS wins
           FROM h)
         SELECT doc_id,
                CAST(len(hs) AS BIGINT) AS n_grams,
                CAST(len(wins) AS BIGINT) AS n_windows,
                CAST(len(list_distinct(wins)) AS BIGINT) AS n_fingerprints,
                CASE WHEN len(wins) > 0
                     THEN CAST(1000 * len(list_distinct(wins)) // len(wins) AS BIGINT)
                     ELSE NULL END AS density_pm,
                md5(array_to_string(list_sort(list_distinct(wins)), '|')) AS selection_md5
         FROM wn""",
    "x22_term_burstiness" ->
      """WITH w AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         ),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         st AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf,
                       CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
         top AS (SELECT * FROM st ORDER BY cf DESC, term LIMIT 32),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         SELECT term, cf, df,
                CAST(cf * 1000 // df AS BIGINT) AS burst_pm,
                CAST(df * 1000 // n_docs AS BIGINT) AS coverage_pm
         FROM top, n""",
    "x21_char_class_entropy" ->
      """WITH c AS (
           SELECT doc_id,
                  CAST(length(text) AS DOUBLE) AS n,
                  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS l,
                  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS dg,
                  CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) AS sp
           FROM documents),
         k AS (SELECT doc_id, n, l, dg, sp, n - l - dg - sp AS o FROM c)
         SELECT doc_id,
                round(CASE WHEN n > 0 THEN
                  (CASE WHEN l  > 0 THEN -(l/n)  * log2(l/n)  ELSE 0 END) +
                  (CASE WHEN dg > 0 THEN -(dg/n) * log2(dg/n) ELSE 0 END) +
                  (CASE WHEN sp > 0 THEN -(sp/n) * log2(sp/n) ELSE 0 END) +
                  (CASE WHEN o  > 0 THEN -(o/n)  * log2(o/n)  ELSE 0 END)
                ELSE 0 END, 4) AS class_entropy_bits,
                round(CASE WHEN n > 0
                      THEN greatest(l, dg, sp, o) / n ELSE 0 END, 4)
                  AS dominant_frac
         FROM k""",
    "x20_gram_novelty_decay" ->
      """WITH g AS (
           SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(0, len(string_split(text, ' ')) - 5),
                    i -> array_to_string(string_split(text, ' ')[i+1:i+5], ' ')))) AS g
           FROM documents),
         k AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 14))::BIGINT AS gk FROM g),
         f AS (SELECT gk, min(doc_id) AS first_doc FROM k GROUP BY 1),
         m AS (SELECT max(doc_id) AS maxd FROM documents),
         dc AS (SELECT (first_doc * 10) // (maxd + 1) AS decile FROM f, m),
         c AS (SELECT decile, count(*) AS new_grams FROM dc GROUP BY 1)
         SELECT CAST(decile AS BIGINT) AS decile,
                CAST(new_grams AS BIGINT) AS new_grams,
                CAST(sum(new_grams) OVER (ORDER BY decile) AS BIGINT) AS cum_grams,
                CAST(1000 * sum(new_grams) OVER (ORDER BY decile)
                     // sum(new_grams) OVER () AS BIGINT) AS cum_share_pm
         FROM c""",
    "x19_token_fertility" ->
      """WITH t AS (SELECT lang, count(*) AS n_docs,
                sum(len(string_split(text, ' '))) AS n_words,
                sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS n_tokens,
                sum(length(text)) AS n_chars
         FROM documents GROUP BY 1)
         SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_words AS BIGINT) AS n_words,
                CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(n_chars AS BIGINT) AS n_chars,
                CAST((1000 * n_tokens) // n_words AS BIGINT) AS fertility_pm,
                CAST((1000 * n_chars) // n_tokens AS BIGINT) AS chars_per_token_pm
         FROM t""",
    "x18_zipf_audit" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         f AS (SELECT w, count(*) AS f FROM w GROUP BY 1),
         top AS (SELECT w, f FROM f ORDER BY f DESC, w LIMIT 32),
         r AS (SELECT w, f,
                      row_number() OVER (ORDER BY f DESC, w) AS rank,
                      max(f) OVER (ORDER BY f DESC, w ROWS UNBOUNDED PRECEDING) AS f1
               FROM top)
         SELECT CAST(rank AS BIGINT) AS rank, w AS term,
                CAST(f AS BIGINT) AS freq,
                CAST(f1 // rank AS BIGINT) AS zipf_pred,
                CAST(1000 * f // (f1 // rank) AS BIGINT) AS ratio_pm
         FROM r""",
    "x17_source_overlap_matrix" -> {
      import graft.operators.{MinHashOps => MH}
      val cols = (0 until MH.NumHashes)
        .map(h => s"min((x * ${MH.affineA(h)} + ${MH.affineB(h)}) % ${MH.ModP}) AS m$h")
        .mkString(", ")
      val agree = (0 until MH.NumHashes)
        .map(h => s"CASE WHEN a.m$h = b.m$h THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH g AS (
            SELECT source, unnest(list_distinct(list_transform(
                     generate_series(0, len(string_split(text, ' ')) - ${MH.ShingleN}),
                     i -> array_to_string(string_split(text, ' ')[i+1:i+${MH.ShingleN}], ' ')))) AS sh
            FROM documents),
          x AS (SELECT source, ('0x' || substr(md5(sh), 1, 6))::BIGINT AS x FROM g),
          sig AS (SELECT source, $cols FROM x GROUP BY source)
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST($agree AS BIGINT) AS n_agree,
                 CAST(1000 * ($agree) // ${MH.NumHashes} AS BIGINT) AS est_jaccard_pm
          FROM sig a JOIN sig b ON a.source < b.source"""
    },
    "x16_novelty_rate" ->
      """WITH g AS (
           SELECT source, doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(0, len(string_split(text, ' ')) - 5),
                    i -> array_to_string(string_split(text, ' ')[i+1:i+5], ' ')))) AS g
           FROM documents),
         k AS (SELECT source, doc_id, ('0x' || substr(md5(g), 1, 14))::BIGINT AS gk,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|x16'), 1, 6))::BIGINT % 10
                        AS hd
               FROM g),
         base AS (SELECT DISTINCT gk FROM k WHERE hd != 0),
         delta AS (SELECT DISTINCT source, gk FROM k WHERE hd = 0),
         j AS (SELECT d.source, CASE WHEN b.gk IS NULL THEN 0 ELSE 1 END AS seen
               FROM delta d LEFT JOIN base b ON b.gk = d.gk)
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(seen) AS BIGINT) AS n_seen,
                CAST(1000 * (count(*) - sum(seen)) // count(*) AS BIGINT) AS novelty_pm
         FROM j GROUP BY 1""",
    "x15_source_divergence" ->
      """WITH w0 AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
         w AS (SELECT source,
                      ('0x' || substr(md5(w || '|x15'), 1, 6))::BIGINT % 64 AS bk
               FROM w0),
         sb AS (SELECT source, bk, CAST(count(*) AS BIGINT) AS scnt FROM w GROUP BY 1, 2),
         cb AS (SELECT bk, CAST(sum(scnt) AS BIGINT) AS ccnt FROM sb GROUP BY 1),
         st AS (SELECT source, CAST(sum(scnt) AS BIGINT) AS stot FROM sb GROUP BY 1),
         g AS (SELECT CAST(sum(scnt) AS BIGINT) AS ctot FROM sb),
         t AS (SELECT sb.source, sb.scnt, st.stot,
                      CAST((length(bin(sb.scnt)) - length(bin(st.stot)))
                         - (length(bin(cb.ccnt)) - length(bin(g.ctot))) AS BIGINT) AS dl
               FROM sb JOIN cb USING (bk) JOIN st USING (source) CROSS JOIN g)
         SELECT source,
                CAST(max(stot) AS BIGINT) AS n_words,
                CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(sum(scnt * dl) AS BIGINT) AS divergence_q
         FROM t GROUP BY 1""",
    "x11_reservoir_sample" ->
      """WITH h AS (
           SELECT doc_id, lang,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|res'), 1, 6))::BIGINT AS hv
           FROM documents),
         r AS (
           SELECT doc_id, lang,
                  CAST(row_number() OVER (PARTITION BY lang
                                          ORDER BY hv, doc_id) AS BIGINT) AS rk
           FROM h)
         SELECT doc_id, lang, rk FROM r WHERE rk <= 5""",
    "x1_lang_id" ->
      s"""WITH c AS (
            SELECT doc_id,
                   ${stopCountSql(StopEn)} AS c_en,
                   ${stopCountSql(StopDe)} AS c_de,
                   ${stopCountSql(StopEs)} AS c_es,
                   ${stopCountSql(StopFr)} AS c_fr
            FROM documents)
          SELECT doc_id, c_en, c_de, c_es, c_fr,
                 CASE WHEN c_en = 0 AND c_de = 0 AND c_es = 0 AND c_fr = 0 THEN 'und'
                      WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                      WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
                      WHEN c_es >= c_fr THEN 'es'
                      ELSE 'fr' END AS pred_lang
          FROM c""",
    "x2_quality_score" ->
      s"""WITH q AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n,
                   CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS junk,
                   CAST(${stopCountSql(StopEn)} AS BIGINT) AS stp,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
            FROM documents),
          qq AS (
            SELECT doc_id,
                   least(n * 20, 10000) AS len_q,
                   (2 * junk * 10000 + n) // (2 * n) AS junk_q,
                   (2 * stp * 10000 + nw) // (2 * nw) AS stop_q
            FROM q)
          SELECT doc_id,
                 len_q / 10000.0 AS len_score,
                 junk_q / 10000.0 AS junk_ratio,
                 stop_q / 10000.0 AS stop_ratio,
                 ((4 * len_q + 2 * (10000 - junk_q) + 4 * stop_q + 5) // 10) / 10000.0 AS quality
          FROM qq""",
    "x3_token_count" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
                CAST(ceil(length(text) / 4.0) AS BIGINT) AS subword_est
         FROM documents""",
    "x4_fingerprint" ->
      """SELECT doc_id, md5(text) AS exact_fp,
                md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp
         FROM documents""",
    "x5_sample_split" ->
      """WITH h AS (
           SELECT doc_id, lang,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|sample'), 1, 6))::BIGINT % 100 AS hs,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 6))::BIGINT % 100 AS hp
           FROM documents)
         SELECT doc_id, lang,
                CASE WHEN hp < 80 THEN 'train' WHEN hp < 90 THEN 'val' ELSE 'test' END AS split
         FROM h
         WHERE hs < CASE WHEN lang = 'en' THEN 80 WHEN lang = 'de' THEN 50 ELSE 20 END""",
    "x6_pii_redact" ->
      """WITH p AS (
           SELECT doc_id,
                  text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +49 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
           FROM documents)
         SELECT doc_id,
                regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
                               '\+[0-9]{2} [0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted,
                CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+'))
                     + len(regexp_extract_all(t, '\+[0-9]{2} [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_pii
         FROM p""",
    "x7_df_stats" ->
      """WITH w AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
           FROM documents),
         d AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM w GROUP BY token)
         SELECT token, df FROM d ORDER BY df DESC, token LIMIT 100""",
    "x8_repetition" ->
      """WITH a AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         w AS (SELECT doc_id, unnest(a) AS w FROM a),
         wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
         ws AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, max(c) AS top_w
                FROM wc GROUP BY 1),
         bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i + 1])) AS b
                FROM a),
         bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         bs AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_b FROM bc GROUP BY 1)
         SELECT ws.doc_id, CAST(n_words AS BIGINT) AS n_words,
                CAST((10000 * n_distinct) // n_words AS BIGINT) AS distinct_frac_q,
                CAST((10000 * top_w) // n_words AS BIGINT) AS top_word_frac_q,
                CAST((10000 * top_b) // n_bigrams AS BIGINT) AS top_bigram_frac_q
         FROM ws JOIN bs ON ws.doc_id = bs.doc_id""",
    "x9_tfidf_topk" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (SELECT tf.doc_id, tf.term,
                      (1000000 * tf.tf * n.n_docs) // df.df AS score_q
               FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
         r AS (SELECT doc_id, term, score_q,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score_q DESC, term) AS rank
               FROM s)
         SELECT doc_id, term, CAST(score_q AS BIGINT) AS score_q,
                CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 3""",
    "x42_loop_detector" -> {
      val scores = (1 to 8)
        .map(p => s"""CASE WHEN len(t) > $p
               THEN CAST(1000 * len(list_filter(generate_series($p, len(t) - 1),
                      i -> t[i + 1] = t[i - $p + 1])) // (len(t) - $p) AS BIGINT)
               ELSE 0 END AS s$p""")
        .mkString(",\n                ")
      val period = (1 to 8)
        .map(p => s"WHEN s$p = 1000 AND n - $p >= 8 THEN $p")
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         corpus AS (
           SELECT doc_id, ws FROM b
           UNION ALL
           SELECT -doc_id - 1,
                  flatten(list_transform(generate_series(1, 8), x -> ws[1:4]))
           FROM b WHERE len(ws) >= 4),
         tl AS (SELECT doc_id,
                       ws[greatest(len(ws) - 31, 1):len(ws)] AS t,
                       doc_id < 0 AS planted
                FROM corpus),
         sc AS (SELECT doc_id, len(t) AS n, planted,
                $scores
           FROM tl)
         SELECT doc_id,
                CAST(n AS BIGINT) AS tail_words,
                CAST($period AS BIGINT) AS loop_period,
                CAST(greatest(${(1 to 8).map(p => s"s$p").mkString(", ")}) AS BIGINT) AS rep_pm,
                planted
         FROM sc"""
    },
    "x41_texttiling" ->
      """WITH b AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id, ws, len(ws) // 8 AS nwin FROM b WHERE len(ws) >= 24),
         c AS (
           SELECT doc_id, nwin,
                  list_transform(generate_series(1, nwin - 1), i ->
                    CAST(len(list_intersect(
                      list_distinct(ws[(i - 1) * 8 + 1 : i * 8]),
                      list_distinct(ws[i * 8 + 1 : (i + 1) * 8]))) AS BIGINT)) AS coh
           FROM g),
         v AS (
           SELECT doc_id, nwin, coh,
                  list_filter(generate_series(2, len(coh) - 1), i ->
                    coh[i] < coh[i - 1] AND coh[i] < coh[i + 1]) AS bnd
           FROM c)
         SELECT doc_id,
                CAST(nwin AS BIGINT) AS n_blocks,
                CAST(len(bnd) AS BIGINT) AS n_boundaries,
                CAST(len(bnd) + 1 AS BIGINT) AS n_segments,
                CAST(1000 * list_sum(coh) // len(coh) AS BIGINT) AS mean_cohesion_q,
                md5(coalesce(
                  array_to_string(list_transform(bnd, x -> CAST(x AS VARCHAR)), '|'), ''))
                  AS boundaries_md5
         FROM v""",
    "x38_countmin_hitters" -> {
      // x12's unrolled-j hash idiom at width 1024: sketch build + head probe.
      def rows(src: String) = (0 until 4)
        .map(j =>
          s"""SELECT w, true_c, $j AS j,
                     ('0x' || substr(md5(w || '|cm$j'), 1, 6))::BIGINT % 1024 AS b
              FROM $src"""
        )
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w,
                            CAST(0 AS BIGINT) AS true_c
                     FROM documents),
          sk AS MATERIALIZED (
            SELECT j, b, count(*) AS c FROM (${rows("t")}) GROUP BY 1, 2),
          top AS MATERIALIZED (
            SELECT w, count(*) AS true_c FROM t GROUP BY 1
            ORDER BY count(*) DESC, w LIMIT 32),
          qp AS (${rows("top")}),
          qe AS (
            SELECT q.w, q.true_c, min(s.c) AS est_c
            FROM qp q JOIN sk s ON s.j = q.j AND s.b = q.b
            GROUP BY 1, 2)
          SELECT w, CAST(true_c AS BIGINT) AS true_c,
                 CAST(est_c AS BIGINT) AS est_c,
                 CAST(est_c - true_c AS BIGINT) AS overest
          FROM qe"""
    },
    "x12_cmsketch_registers" -> {
      val rows = (0 until 4)
        .map(j =>
          s"""SELECT $j AS cm_row,
                     ('0x' || substr(md5(w || '|cm$j'), 1, 6))::BIGINT % 64 AS cm_col
              FROM t"""
        )
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
          c AS (SELECT cm_row, cm_col, count(*) AS cnt FROM ($rows) GROUP BY 1, 2),
          grid AS (
            SELECT r.r AS cm_row, k.k AS cm_col
            FROM (SELECT unnest(range(0, 4)) AS r) r,
                 (SELECT unnest(range(0, 64)) AS k) k)
          SELECT CAST(grid.cm_row AS BIGINT) AS cm_row,
                 CAST(grid.cm_col AS BIGINT) AS cm_col,
                 CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
          FROM grid LEFT JOIN c
            ON c.cm_row = grid.cm_row AND c.cm_col = grid.cm_col"""
    },
    "x14_term_coverage" ->
      """WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM w0 GROUP BY 1),
         tot AS (SELECT sum(cnt) AS total FROM tc),
         top AS (SELECT term, cnt,
                        CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
                 FROM tc ORDER BY cnt DESC, term LIMIT 20),
         c AS (SELECT rank, term, cnt,
                      sum(cnt) OVER (ORDER BY cnt DESC, term
                                     ROWS UNBOUNDED PRECEDING) AS cum
               FROM top)
         SELECT rank, term, cnt, CAST(10000 * cum // total AS BIGINT) AS cum_share_q
         FROM c CROSS JOIN tot""",
    "x13_hll_union" ->
      s"""WITH w0 AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
          h AS (SELECT source, w, ('0x' || substr(md5(w), 1, 6))::BIGINT AS h24 FROM w0),
          r AS (SELECT source, h24 // 262144 AS bucket,
                       CASE WHEN h24 % 262144 = 0 THEN 19
                            ELSE 19 - length(bin(h24 % 262144)) END AS rho
                FROM h),
          ps AS (SELECT source, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
          un AS (SELECT '__union__' AS source, bucket, max(m) AS m FROM ps GROUP BY bucket),
          ar AS (SELECT source, bucket, m FROM ps UNION ALL SELECT source, bucket, m FROM un),
          srcs AS (SELECT DISTINCT source FROM documents UNION ALL SELECT '__union__'),
          dense AS (SELECT s.source, b.bucket, coalesce(ar.m, 0) AS register
                    FROM srcs s
                    CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) b
                    LEFT JOIN ar ON ar.source = s.source AND ar.bucket = b.bucket),
          est AS (SELECT source,
                         CAST(${709L * 4096L * 524288L} // (sum(1 << (19 - register)) * 1000) AS BIGINT) AS est_q
                  FROM dense GROUP BY 1),
          ex AS (SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS exact_d FROM w0 GROUP BY 1
                 UNION ALL
                 SELECT '__union__', CAST(count(DISTINCT w) AS BIGINT) FROM w0)
          SELECT est.source, est_q, exact_d FROM est JOIN ex ON est.source = ex.source""",
    "x10_hll_registers" ->
      s"""WITH h AS (SELECT ('0x' || substr(md5(text), 1, 6))::BIGINT AS h24
                     FROM documents),
          r AS (SELECT h24 // 262144 AS bucket,
                       CASE WHEN h24 % 262144 = 0 THEN 19
                            ELSE 19 - length(bin(h24 % 262144)) END AS rho
                FROM h),
          regs AS (
            SELECT b.bucket, coalesce(max(r.rho), 0) AS register
            FROM (SELECT unnest(range(0, 64)) AS bucket) b
            LEFT JOIN r ON r.bucket = b.bucket
            GROUP BY b.bucket),
          s AS (SELECT sum(1 << (19 - register)) AS s FROM regs)
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 CAST(register AS BIGINT) AS register,
                 CAST(${709L * 4096L * 524288L} // (s.s * 1000) AS BIGINT) AS est_q
          FROM regs, s"""
  )
}
