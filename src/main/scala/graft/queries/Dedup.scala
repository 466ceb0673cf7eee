package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.{VectorFunctions => VF}

/** Near-duplicate detection — the flagship LLM-training-pipeline operators
  * the reference's corpus build implies (its ChromaDB ingest dedups exact ids,
  * utils/chroma_helpers.py:111-124; at 100 TB the required form is MinHash/LSH
  * banding, SimHash, and embedding-cosine near-dup, built here Spark-first).
  *
  * All hashes are md5-derived so the DuckDB oracle regenerates every
  * signature bit-identically — the only randomness is the seed strings.
  *
  * Scale notes (100 TB):
  *   - MinHash/LSH (`d1`/`d2`): per-row signature computation is a narrow
  *     codegen'd projection (no shuffle); candidate generation is an
  *     equi-join on the band key — cost ∝ Σ bucket², never all-pairs. The
  *     band-key shuffle carries (doc_id, 32-byte key) only. Verification
  *     joins shingle sets back for candidates only (a tiny fraction of rows).
  *   - SimHash (`d3`): one pass, per-row arithmetic over the token array,
  *     zero shuffle — each doc gets a 16-bit fingerprint; equal fingerprints
  *     are near-dup buckets.
  *   - n-gram Jaccard (`d4`): exact verification primitive, evaluated here on
  *     a linear pair set (consecutive ids), not all-pairs.
  *   - Embedding near-dup (`d5`): LSH sign-bit buckets (shared with
  *     s19b_knn_bucketed) bound the pair join to within-bucket candidates.
  *
  * Test-corpus note: the synthetic `documents` table has no planted
  * duplicates, so d1/d2 run against `corpus` = documents ∪ a perturbed copy
  * (id+100000, two appended tokens) — near-dup pairs exist by construction
  * and every derived pair is deterministic.
  */
object Dedup extends QueryModule {

  private val ShingleN  = 3
  private val NumHashes = 12
  private val BandR     = 3 // rows per band → 4 bands
  private val NumBands  = NumHashes / BandR

  private def words(c: Column): Column = split(c, " ")

  /** Distinct word n-gram shingles of a text column. */
  private def shingles(c: Column): Column = {
    val w = words(c)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(w) - ShingleN, lit(0))),
        i => concat_ws(" ", slice(w, i + 1, lit(ShingleN)))
      )
    )
  }

  /** MinHash h: lexicographic min of salted md5 over the shingle set. */
  private def minhash(sh: Column, h: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(s"$h|"), x))))

  /** documents ∪ perturbed copy — the dedup test corpus (see scaladoc). */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    docs
      .select(col("doc_id"), col("text"))
      .unionAll(
        docs.select(
          (col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz tail")).as("text")
        )
      )
  }

  /** (doc_id, band, band_key) — NumBands rows per document. */
  private def bandKeys(c: DataFrame): DataFrame = {
    val sh  = c.select(col("doc_id"), shingles(col("text")).as("sh"))
    val sig = sh.select(
      col("doc_id") +: (0 until NumHashes).map(h => minhash(col("sh"), h).as(s"m$h")): _*
    )
    val keys = (0 until NumBands).map { b =>
      md5(concat((0 until BandR).map(r => col(s"m${b * BandR + r}")): _*))
    }
    sig.select(col("doc_id"), posexplode(array(keys: _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
  }

  /** D1 — MinHash + LSH banding candidate pairs. */
  private def d1_minhash_candidates(s: SparkSession, d: String): DataFrame = {
    val bands = bandKeys(corpus(s, d))
    val a     = bands.as("a")
    val b     = bands.as("b")
    a.join(
        b,
        col("a.bkey") === col("b.bkey") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
  }

  /** D2 — exact-Jaccard verification of the MinHash candidates (τ = 0.8). */
  private def d2_verified_pairs(s: SparkSession, d: String): DataFrame = {
    val sh   = corpus(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))
    val cand = d1_minhash_candidates(s, d)
    val j = cand
      .join(sh.select(col("doc_id").as("doc1"), col("sh").as("s1")), "doc1")
      .join(sh.select(col("doc_id").as("doc2"), col("sh").as("s2")), "doc2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("double"))
      .withColumn(
        "jac",
        col("inter") / (size(col("s1")) + size(col("s2")) - col("inter"))
      )
    j.filter(col("jac") >= 0.8)
      .select(col("doc1"), col("doc2"), round(col("jac"), 4).as("jaccard"))
  }

  /** D3 — 16-bit SimHash fingerprint per document (token-frequency weighted:
    * each occurrence votes ±1 per bit; bit = sign of the vote sum).
    */
  private def d3_simhash(s: SparkSession, d: String): DataFrame = {
    val w = words(col("text"))
    val bits: Seq[Column] = (0 until 16).map { b =>
      val vote = aggregate(
        w,
        lit(0),
        (acc, word) =>
          acc +
            (conv(substring(md5(concat(lit(s"$b|"), word)), 1, 1), 16, 10)
              .cast("int") % 2) * 2 - 1
      )
      when(vote > 0, lit("1")).otherwise(lit("0"))
    }
    table(s, d, "documents")
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  /** D4 — exact character-4-gram Jaccard over a linear pair set (consecutive
    * ids) — the verification primitive without an all-pairs join.
    */
  private def d4_ngram_jaccard(s: SparkSession, d: String): DataFrame = {
    val grams = array_distinct(
      transform(
        sequence(lit(1), greatest(length(col("text")) - 3, lit(1))),
        i => col("text").substr(i, lit(4))
      )
    )
    val g = table(s, d, "documents").select(col("doc_id"), grams.as("g"))
    val a = g.select(col("doc_id").as("doc1"), col("g").as("g1"))
    val b = g.select(col("doc_id").as("doc2"), col("g").as("g2"))
    a.join(b, col("doc2") === col("doc1") + 1)
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))).cast("double"))
      .select(
        col("doc1"),
        col("doc2"),
        round(col("inter") / (size(col("g1")) + size(col("g2")) - col("inter")), 4)
          .as("jaccard")
      )
  }

  /** D5 — embedding-cosine near-dup pairs, LSH-bucketed: pairs are generated
    * only within a sign-bit bucket (shared plane family with s19b), then
    * exact-cosine filtered.
    */
  private def d5_embed_neardup(s: SparkSession, d: String): DataFrame = {
    val pls = VF.planes(4, 64)
    val v = table(s, d, "embeddings")
      .select(
        col("vec_id"),
        col("embedding"),
        VF.signBits(col("embedding"), pls).as("bk")
      )
    val a = v.select(col("vec_id").as("vec1"), col("embedding").as("e1"), col("bk"))
    val b = v.select(col("vec_id").as("vec2"), col("embedding").as("e2"), col("bk").as("bk2"))
    a.join(b, col("bk") === col("bk2") && col("vec1") < col("vec2"))
      .withColumn("cos", VF.cosine(col("e1"), col("e2")))
      .filter(col("cos") >= 0.25)
      .select(col("vec1"), col("vec2"), round(col("cos"), 4).as("cos_sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_minhash_candidates" -> (d1_minhash_candidates _),
    "d2_verified_pairs" -> (d2_verified_pairs _),
    "d3_simhash" -> (d3_simhash _),
    "d4_ngram_jaccard" -> (d4_ngram_jaccard _),
    "d5_embed_neardup" -> (d5_embed_neardup _)
  )

  // ---- oracles ----

  private val corpusSql =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 100000 AS doc_id, text || ' zz tail' AS text FROM documents
       )"""

  private val shinglesSql =
    s"""sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(0, greatest(len(string_split(text, ' ')) - $ShingleN, 0)),
                   i -> array_to_string(string_split(text, ' ')[i+1:i+$ShingleN], ' '))) AS s
          FROM corpus
        )"""

  private val sigSql = {
    val cols = (0 until NumHashes)
      .map(h => s"list_min(list_transform(s, x -> md5('$h|' || x))) AS m$h")
      .mkString(", ")
    s"sig AS (SELECT doc_id, $cols FROM sh)"
  }

  private val bandsSql = {
    val unions = (0 until NumBands)
      .map { b =>
        val cat = (0 until BandR).map(r => s"m${b * BandR + r}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($cat) AS bkey FROM sig"
      }
      .mkString(" UNION ALL ")
    s"bands AS ($unions)"
  }

  private val candSql =
    """cand AS (
         SELECT a.doc_id AS doc1, b.doc_id AS doc2
         FROM bands a JOIN bands b
           ON a.bkey = b.bkey AND a.band = b.band AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       )"""

  private val simhashBitsSql = (0 until 16)
    .map(b =>
      s"""CASE WHEN list_sum(list_transform(string_split(text, ' '),
            w -> (('0x' || substr(md5('$b|' || w), 1, 1))::BIGINT % 2) * 2 - 1)) > 0
          THEN '1' ELSE '0' END"""
    )
    .mkString(" || ")

  private val planeBkSql = (0 until 4)
    .map(p =>
      s"""CASE WHEN list_dot_product(embedding::DOUBLE[], ${VF.duckdbPlaneSql(p, 64)}) >= 0
          THEN '1' ELSE '0' END"""
    )
    .mkString(" || ")

  val oracles: Map[String, String] = Map(
    "d1_minhash_candidates" ->
      s"WITH $corpusSql, $shinglesSql, $sigSql, $bandsSql, $candSql SELECT doc1, doc2 FROM cand",
    "d2_verified_pairs" ->
      s"""WITH $corpusSql, $shinglesSql, $sigSql, $bandsSql, $candSql
          SELECT doc1, doc2,
                 round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) /
                       (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))), 4) AS jaccard
          FROM cand
          JOIN sh s1 ON s1.doc_id = doc1
          JOIN sh s2 ON s2.doc_id = doc2
          WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) /
                (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) >= 0.8""",
    "d3_simhash" ->
      s"SELECT doc_id, $simhashBitsSql AS simhash FROM documents",
    "d4_ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id,
                  list_distinct(list_transform(
                    generate_series(1, greatest(length(text) - 3, 1)),
                    i -> substr(text, CAST(i AS INTEGER), 4))) AS g
           FROM documents)
         SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
                      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4) AS jaccard
         FROM g a JOIN g b ON b.doc_id = a.doc_id + 1""",
    "d5_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, $planeBkSql AS bk FROM embeddings)
          SELECT a.vec_id AS vec1, b.vec_id AS vec2,
                 round(list_dot_product(a.e, b.e) /
                       (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
          FROM v a JOIN v b ON a.bk = b.bk AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.e, b.e) /
                (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.25"""
  )
}
