package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.pipeline.{Assets, Checks}
import graft.sources.Fixtures

/** End-to-end pipeline-asset queries: each runs a real segment of the
  * [[graft.pipeline.Pipeline]] DAG (fixture source → asset transforms) and
  * is oracled by the full equivalent SQL chain — so the correctness gate
  * covers the *composition* of the operators, not just each in isolation.
  *
  * s7 exercises the resumable-source cache pattern (S7/S8) on its own.
  */
object PipelineQueries extends QueryModule {

  /** S7 — cache-hit/fetch-missing split: requested ids partitioned by a
    * warm-cache semi/anti join pair, tagged by provenance.
    */
  private def s7_cache_fetch_missing(s: SparkSession, d: String): DataFrame = {
    val requested = table(s, d, "customer")
      .filter(col("c_custkey") <= 900)
      .select(concat(lit("Q"), col("c_custkey").cast("string")).as("qid"))
    val cache = table(s, d, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(concat(lit("Q"), col("c_custkey").cast("string")).as("qid"))
    val (hits, missing) = Fixtures.cacheSplit(requested, cache, "qid")
    hits
      .select(col("qid"), lit("cache").as("src"))
      .unionByName(missing.select(col("qid"), lit("fetched").as("src")))
  }

  /** S8 — label→QID resolver with md5-keyed cache (reference
    * utils/wikidata_helpers.py:497-606): lookups hit the cache by
    * `md5(lower(label))`; misses resolve through the (fixture) search
    * source and are tagged for append-back.
    */
  private def s8_label_resolver(s: SparkSession, d: String): DataFrame = {
    val c = table(s, d, "customer").select(
      col("c_custkey"),
      col("c_name"),
      graft.functions.TextFunctions.labelKey(col("c_name")).as("label_key")
    )
    val cache = c
      .filter(col("c_custkey") % 2 === 0)
      .select(
        col("label_key"),
        concat(lit("Q"), col("c_custkey").cast("string")).as("cached_qid")
      )
    c.join(cache, Seq("label_key"), "left")
      .select(
        col("c_custkey"),
        col("label_key"),
        coalesce(col("cached_qid"), concat(lit("Q"), col("c_custkey").cast("string")))
          .as("qid"),
        when(col("cached_qid").isNotNull, lit("cache")).otherwise(lit("resolved")).as("src")
      )
  }

  private def index(s: SparkSession, d: String): DataFrame =
    Assets.buildArtistIndex(Fixtures.artistIndexRaw(s, d))

  /** The artists frame heads every downstream branch (pl2/pl3/pl5/pl6 and
    * the article merge) — memoized per (session, dataset) like the dedup
    * pair tables, so the index dedup windows + entity join run once for
    * the whole pl-family instead of once per query.
    */
  private val artistsMemo = graft.Memo.newMap()

  private def artists(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(artistsMemo, s, d)(
      Assets.extractArtists(index(s, d), Fixtures.entityFixture(s, d))
    )

  /** PL1 — build_artist_index end-to-end: raw fixture → clean → null gates
    * → dedup-by-priority.
    */
  private def pl1_artist_index(s: SparkSession, d: String): DataFrame = index(s, d)

  /** PL2 — extract_artists end-to-end: QID/year derivation → Latin gate →
    * enrichment join → validation gate.
    */
  private def pl2_artists(s: SparkSession, d: String): DataFrame = artists(s, d)

  /** PL3 — extract_articles end-to-end: artists ⨝ article fixture → clean →
    * chunk → chunk ids + search_document context strings.
    */
  private def pl3_article_chunks(s: SparkSession, d: String): DataFrame =
    Assets.extractArticles(artists(s, d), Fixtures.articleFixture(s, d))

  /** PL4 — the five quality checks as a report over the built index. */
  private def pl4_check_report(s: SparkSession, d: String): DataFrame =
    Checks.artistIndexReport(index(s, d))

  private def releases(s: SparkSession, d: String): DataFrame =
    Assets.extractReleases(artists(s, d), Fixtures.releaseGroupFixture(s, d))

  /** PL5 — the releases→tracks branch end-to-end: release groups of known
    * artists → type/secondary filters + year parse → best-release argmin
    * per group (O3 in pipeline form) → track flatten of exactly the chosen
    * release.
    */
  private def pl5_tracks(s: SparkSession, d: String): DataFrame =
    Assets.extractTracks(
      releases(s, d),
      Fixtures.releaseCandidatesFixture(s, d),
      Fixtures.trackFixture(s, d)
    )

  /** PL6 — the genres branch end-to-end: explode artist genre lists, drop
    * nulls, dedup, resolve label/aliases/parents.
    */
  private def pl6_genres(s: SparkSession, d: String): DataFrame =
    Assets.extractGenres(artists(s, d))

  private val mergedMemo = graft.Memo.newMap()

  /** pl7's output and pl8's input — memoized so the vector-ingest tail
    * starts from the materialized merge instead of re-running both
    * branches.
    */
  private def mergedArticles(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(mergedMemo, s, d)(mergedArticlesCompute(s, d))

  private def mergedArticlesCompute(s: SparkSession, d: String): DataFrame = {
    val a = artists(s, d) // memoized + truncated
    val artistChunks = Assets
      .extractArticles(a, Fixtures.articleFixture(s, d))
      .withColumn("entity_type", lit("artist"))
    val genreChunks =
      Assets.genreArticleChunks(Assets.extractGenres(a), table(s, d, "documents"))
    Assets.mergeArticles(artistChunks, genreChunks)
  }

  /** PL7 — merge_wikipedia_articles: artist chunks ∪ genre chunks via
    * relaxed union (U1) — the genre-only `parents` column null-fills on the
    * artist side.
    */
  private def pl7_article_merge(s: SparkSession, d: String): DataFrame =
    mergedArticles(s, d)

  /** PL8 — the vector-ingest tail: merged chunks → sha256 doc ids (F12) →
    * versioned keep-last upsert against the already-ingested rows (S17)
    * with updated/inserted provenance (S18).
    */
  private def pl8_vector_ingest(s: SparkSession, d: String): DataFrame =
    Assets.vectorIngest(mergedArticles(s, d))

  /** PL10 — digest-driven incremental recompute (the reference's per-decade
    * partition reruns, `build_artist_index.py:141-142`, made INCREMENTAL):
    * a pipeline that re-lands only the partitions whose INPUT changed. Each
    * order-year partition is reduced to (row count, order-independent
    * digest) — s25's summed-row-hash digest, map-side combinable so the
    * whole decision costs one narrow scan at any scale — and compared
    * against the previous run's digests; `changed` partitions are exactly
    * the recompute set, priced in rows. The previous run is simulated
    * deterministically: the same inputs minus the planted delta (every
    * 97th order of 1995), so 1995 — and only 1995 — must flag.
    *
    * At 100 TB this decision table is |partitions| rows; recompute cost
    * drops from full-corpus to Σ changed-partition rows, which is the
    * entire point of partitioned pipeline state (s31's dynamic overwrite
    * is the write-side half of the same story).
    */
  private def pl10_incremental_recompute(s: SparkSession, d: String): DataFrame = {
    val o = table(s, d, "orders").select(
      col("o_orderkey"),
      col("o_custkey"),
      year(col("o_orderdate")).cast("long").as("part_year"),
      expr("CAST(round(o_totalprice * 100, 0) AS LONG)").as("cents"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
      col("o_orderpriority")
    )
    val h = conv(
      substring(
        md5(concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"),
          col("cents").cast("string"),
          col("day"),
          col("o_orderpriority"))),
        1, 8),
      16, 10
    ).cast("long")
    def digestOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("part_year"), h.as("h"))
      .groupBy("part_year")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("digest"))
    val now  = digestOf(o)
    val prev = digestOf(o.filter(!(col("part_year") === 1995 && col("o_orderkey") % 97 === 0)))
      .select(col("part_year"), col("n_rows").as("prev_rows"), col("digest").as("prev_digest"))
    now
      .join(prev, Seq("part_year"), "left")
      .select(
        col("part_year"),
        col("n_rows"),
        col("digest"),
        col("prev_digest"),
        (col("prev_digest").isNull || col("digest") =!= col("prev_digest")
          || col("n_rows") =!= col("prev_rows")).as("changed"),
        when(
          col("prev_digest").isNull || col("digest") =!= col("prev_digest")
            || col("n_rows") =!= col("prev_rows"),
          col("n_rows")
        ).otherwise(lit(0L)).as("recompute_rows")
      )
  }

  /** Memo-shared substrates (see [[QueryModule.substrates]]): the resolved
    * artist frame and the merged-articles frame feed the pl* chain.
    */
  override def substrates: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "_sub_pipeline_artists" -> ((s, d) => artists(s, d)),
    "_sub_pipeline_merged" -> ((s, d) => mergedArticles(s, d))
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pl10_incremental_recompute" -> (pl10_incremental_recompute _),
    "s7_cache_fetch_missing" -> (s7_cache_fetch_missing _),
    "s8_label_resolver" -> (s8_label_resolver _),
    "pl1_artist_index" -> (pl1_artist_index _),
    "pl2_artists" -> (pl2_artists _),
    "pl3_article_chunks" -> (pl3_article_chunks _),
    "pl4_check_report" -> (pl4_check_report _),
    "pl5_tracks" -> (pl5_tracks _),
    "pl6_genres" -> (pl6_genres _),
    "pl7_article_merge" -> (pl7_article_merge _),
    "pl8_vector_ingest" -> (pl8_vector_ingest _)
  )

  // ---- oracle CTE chain mirroring Fixtures + Assets ----

  private val rawSql =
    """raw AS (
         SELECT 'http://www.wikidata.org/entity/Q' || CAST(c_custkey AS VARCHAR) AS artist_uri,
                '  ' || c_name || CASE WHEN c_custkey % 17 = 0 THEN ' Ω' ELSE '' END || '  ' AS name,
                '19' || lpad(CAST(c_custkey % 50 + 20 AS VARCHAR), 2, '0') || '-01-01' AS start_date
         FROM customer
         UNION ALL
         SELECT 'http://www.wikidata.org/entity/Q' || CAST(c_custkey AS VARCHAR),
                c_name || ' (later)', '1999-12-31'
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT 'http://www.wikidata.org/entity/QX' || CAST(c_custkey AS VARCHAR),
                CASE WHEN c_custkey % 2 = 0 THEN c_name END,
                CASE WHEN c_custkey % 2 <> 0 THEN '1980-01-01' END
         FROM customer WHERE c_custkey % 13 = 0
       )"""

  private val indexSql =
    s"""$rawSql,
       cleaned AS (
         SELECT artist_uri,
                trim(regexp_replace(regexp_replace(regexp_replace(name, '\\\\"', '"', 'g'),
                     '[' || chr(10) || chr(13) || ']+', ' ', 'g'), '\\s+', ' ', 'g')) AS name,
                start_date
         FROM raw),
       gated AS (
         SELECT * FROM cleaned
         WHERE artist_uri IS NOT NULL AND name IS NOT NULL AND name <> ''
           AND start_date IS NOT NULL),
       s1 AS (
         SELECT *, row_number() OVER (PARTITION BY artist_uri
                ORDER BY start_date, artist_uri, name) AS rn FROM gated),
       d1 AS (SELECT artist_uri, name, start_date FROM s1 WHERE rn = 1),
       s2 AS (
         SELECT *, row_number() OVER (PARTITION BY name
                ORDER BY start_date, artist_uri, name) AS rn FROM d1),
       index_out AS (SELECT artist_uri, name, start_date FROM s2 WHERE rn = 1)"""

  private val artistsSql =
    s"""$indexSql,
       qids AS (
         SELECT regexp_extract(artist_uri, '([^/]+)$$', 1) AS qid, name,
                CAST(split_part(start_date, '-', 1) AS INTEGER) AS inception_year
         FROM index_out
         WHERE regexp_matches(name, '^[\\x00-\\x{024F}\\x{1E00}-\\x{1EFF}]*$$')),
       entities AS (
         SELECT 'Q' || CAST(c_custkey AS VARCHAR) AS qid, c_name AS entity_name,
                md5(c_name) AS mbid, n_name AS country,
                CASE WHEN c_custkey % 4 = 0 THEN NULL
                     ELSE 'https://en.wikipedia.org/wiki/T' || CAST(c_custkey AS VARCHAR)
                END AS wikipedia_url
         FROM customer JOIN nation ON c_nationkey = n_nationkey),
       artists_out AS (
         SELECT qid AS id, name, mbid, country, wikipedia_url, inception_year
         FROM qids JOIN entities USING (qid)
         WHERE wikipedia_url IS NOT NULL AND mbid IS NOT NULL AND country IS NOT NULL)"""

  /** The pl3 chunk chain as a reusable CTE block ending in `artist_chunks`. */
  private val artistChunksSql =
    s"""$artistsSql,
       fixt AS (
         SELECT 'Q' || CAST(doc_id AS VARCHAR) AS qid,
                'Title_' || CAST(doc_id AS VARCHAR) AS title,
                trim(regexp_replace(regexp_replace(regexp_replace(text, '\\\\"', '"', 'g'),
                     '[' || chr(10) || chr(13) || ']+', ' ', 'g'), '\\s+', ' ', 'g')) AS ct
         FROM documents),
       joined AS (
         SELECT a.id AS qid, a.name, a.country, a.inception_year, f.title, f.ct
         FROM artists_out a JOIN fixt f ON a.id = f.qid),
       achunks AS (
         SELECT qid, name, country, inception_year, title,
                unnest(generate_series(1, greatest(length(ct), 1), 150)) AS p, ct
         FROM joined),
       artist_chunks AS (
         SELECT qid || '_chunk_' || CAST((p - 1) // 150 + 1 AS VARCHAR) AS id,
                'search_document: Topic: ' || name || '. Context: ' || country || '; '
                || CAST(inception_year AS VARCHAR) || ' | ' || title || ' | '
                || substr(ct, CAST(p AS INTEGER), 200) AS article,
                qid,
                CAST((p - 1) // 150 + 1 AS BIGINT) AS chunk_index
         FROM achunks)"""

  /** Release groups of known artists, filtered + year-parsed → `releases_out`. */
  private val releasesSql =
    """rg AS (
         SELECT 'RG' || CAST(o_orderkey AS VARCHAR) AS rg_id,
                'Q' || CAST(o_custkey AS VARCHAR) AS artist_qid,
                'Release ' || CAST(o_orderkey AS VARCHAR) AS title,
                CASE CAST(o_orderkey % 3 AS INTEGER) WHEN 0 THEN 'Album'
                     WHEN 1 THEN 'Single' ELSE 'EP' END AS primary_type,
                CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS has_secondary,
                CASE WHEN o_orderkey % 5 = 0 THEN strftime(o_orderdate, '%Y')
                     WHEN o_orderkey % 5 = 1 THEN strftime(o_orderdate, '%Y-%m')
                     ELSE strftime(o_orderdate, '%Y-%m-%d') END AS frd
         FROM orders),
       releases_out AS (
         SELECT rg_id AS id, title, CAST(split_part(frd, '-', 1) AS INTEGER) AS year,
                artist_qid AS artist_id
         FROM rg
         WHERE primary_type IN ('Album', 'Single') AND has_secondary = 0
           AND artist_qid IN (SELECT id FROM artists_out))"""

  /** Genre derivation from artists_out → `genres_out`. */
  private val genresSql =
    """gx AS (
         SELECT DISTINCT gid FROM (
           SELECT unnest(['G' || CAST(cnum % 7 AS VARCHAR),
                          CASE WHEN cnum % 3 <> 0
                               THEN 'G' || CAST(cnum % 13 AS VARCHAR) END]) AS gid
           FROM (SELECT CAST(substr(id, 2) AS BIGINT) AS cnum FROM artists_out))
         WHERE gid IS NOT NULL),
       genres_out AS (
         SELECT gid AS id,
                'Genre ' || CAST(n AS VARCHAR) AS name,
                'g' || CAST(n AS VARCHAR) || ',style' || CAST(n AS VARCHAR) AS aliases,
                CASE WHEN n > 3 THEN 'G' || CAST(n % 4 AS VARCHAR) ELSE '' END AS parents
         FROM (SELECT gid, CAST(substr(gid, 2) AS INTEGER) AS n FROM gx))"""

  /** Artist chunks ∪ genre chunks (relaxed union) → `merged`. */
  private val mergedSql =
    s"""$artistChunksSql,
       $genresSql,
       gdocs AS (
         SELECT g.id AS gid, g.name, g.parents,
                trim(regexp_replace(regexp_replace(regexp_replace(d.text, '\\\\"', '"', 'g'),
                     '[' || chr(10) || chr(13) || ']+', ' ', 'g'), '\\s+', ' ', 'g')) AS ct
         FROM genres_out g JOIN documents d ON d.doc_id = CAST(substr(g.id, 2) AS INTEGER) + 1),
       gchunks AS (
         SELECT gid, name, parents,
                unnest(generate_series(1, greatest(length(ct), 1), 150)) AS p, ct
         FROM gdocs),
       genre_chunks AS (
         SELECT gid || '_chunk_' || CAST((p - 1) // 150 + 1 AS VARCHAR) AS id,
                'search_document: Topic: ' || name || '. Context: genre | '
                || substr(ct, CAST(p AS INTEGER), 200) AS article,
                gid AS qid,
                CAST((p - 1) // 150 + 1 AS BIGINT) AS chunk_index,
                parents
         FROM gchunks),
       merged AS (
         SELECT id, article, qid, chunk_index, 'artist' AS entity_type,
                CAST(NULL AS VARCHAR) AS parents
         FROM artist_chunks
         UNION ALL
         SELECT id, article, qid, chunk_index, 'genre' AS entity_type, parents
         FROM genre_chunks)"""

  val oracles: Map[String, String] = Map(
    "pl10_incremental_recompute" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey,
                  CAST(year(o_orderdate) AS BIGINT) AS part_year,
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                  strftime(o_orderdate, '%Y-%m-%d') AS day,
                  o_orderpriority
           FROM orders),
         h AS (SELECT part_year, o_orderkey,
                      ('0x' || substr(md5(
                        CAST(o_orderkey AS VARCHAR) || '|' ||
                        CAST(o_custkey AS VARCHAR) || '|' ||
                        CAST(cents AS VARCHAR) || '|' ||
                        day || '|' || o_orderpriority), 1, 8))::BIGINT AS h
               FROM o),
         now AS (SELECT part_year, CAST(count(*) AS BIGINT) AS n_rows,
                        CAST(sum(h) AS BIGINT) AS digest
                 FROM h GROUP BY 1),
         prev AS (SELECT part_year, CAST(count(*) AS BIGINT) AS prev_rows,
                         CAST(sum(h) AS BIGINT) AS prev_digest
                  FROM h
                  WHERE NOT (part_year = 1995 AND o_orderkey % 97 = 0)
                  GROUP BY 1)
         SELECT now.part_year, now.n_rows, now.digest, prev.prev_digest,
                (prev.prev_digest IS NULL OR now.digest <> prev.prev_digest
                 OR now.n_rows <> prev.prev_rows) AS changed,
                CASE WHEN prev.prev_digest IS NULL
                       OR now.digest <> prev.prev_digest
                       OR now.n_rows <> prev.prev_rows
                     THEN now.n_rows ELSE 0 END AS recompute_rows
         FROM now LEFT JOIN prev ON prev.part_year = now.part_year""",
    "s7_cache_fetch_missing" ->
      """WITH req AS (
           SELECT 'Q' || CAST(c_custkey AS VARCHAR) AS qid
           FROM customer WHERE c_custkey <= 900),
         cache AS (
           SELECT 'Q' || CAST(c_custkey AS VARCHAR) AS qid
           FROM customer WHERE c_custkey % 3 = 0)
         SELECT qid,
                CASE WHEN qid IN (SELECT qid FROM cache) THEN 'cache'
                     ELSE 'fetched' END AS src
         FROM req""",
    "s8_label_resolver" ->
      """SELECT c_custkey, md5(lower(c_name)) AS label_key,
                'Q' || CAST(c_custkey AS VARCHAR) AS qid,
                CASE WHEN c_custkey % 2 = 0 THEN 'cache' ELSE 'resolved' END AS src
         FROM customer""",
    "pl1_artist_index" ->
      s"WITH $indexSql SELECT artist_uri, name, start_date FROM index_out",
    "pl2_artists" ->
      s"WITH $artistsSql SELECT id, name, mbid, country, wikipedia_url, inception_year FROM artists_out",
    "pl3_article_chunks" ->
      s"WITH $artistChunksSql SELECT id, article, qid, chunk_index FROM artist_chunks",
    "pl5_tracks" ->
      s"""WITH $artistsSql, $releasesSql,
          cand AS (
            SELECT 'RG' || CAST(l_orderkey AS VARCHAR) AS rg_id,
                   'R' || CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR) AS release_id,
                   CASE WHEN l_linenumber % 2 = 1 THEN 'Official'
                        ELSE 'Promotion' END AS status,
                   strftime(l_shipdate, '%Y-%m-%d') AS rdate
            FROM lineitem),
          best AS (
            SELECT rg_id, release_id FROM (
              SELECT c.*, row_number() OVER (PARTITION BY rg_id ORDER BY
                       CASE WHEN status = 'Official' THEN 0 ELSE 1 END,
                       rdate, release_id) AS rn
              FROM cand c WHERE rg_id IN (SELECT id FROM releases_out)) WHERE rn = 1),
          trk AS (
            SELECT 'R' || CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR) AS release_id,
                   l_partkey,
                   unnest(generate_series(1, CAST(l_linenumber AS BIGINT))) AS tno
            FROM lineitem)
          SELECT t.release_id || '_t' || CAST(tno AS VARCHAR) AS id,
                 'Track ' || CAST(l_partkey AS VARCHAR) || '-'
                 || CAST(tno AS VARCHAR) AS title,
                 b.rg_id AS album_id
          FROM best b JOIN trk t ON t.release_id = b.release_id""",
    "pl6_genres" ->
      s"""WITH $artistsSql, $genresSql
          SELECT id, name, aliases, parents FROM genres_out""",
    "pl7_article_merge" ->
      s"""WITH $mergedSql
          SELECT id, article, qid, chunk_index, entity_type, parents FROM merged""",
    "pl8_vector_ingest" ->
      s"""WITH $mergedSql,
          batch AS (
            SELECT substr(sha256(article || '-' || id), 1, 32) AS doc_id,
                   qid, entity_type, chunk_index
            FROM merged WHERE article IS NOT NULL AND length(article) > 0)
          SELECT doc_id, qid, entity_type, chunk_index,
                 CASE WHEN chunk_index = 1 THEN 'updated' ELSE 'inserted' END AS src
          FROM batch""",
    "pl4_check_report" ->
      s"""WITH $indexSql,
          counts AS (
            SELECT CAST(count(*) AS DOUBLE) AS row_count,
                   CAST(sum(CASE WHEN artist_uri IS NULL THEN 1 ELSE 0 END)
                        + sum(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS null_ids,
                   CAST(count(DISTINCT artist_uri) AS DOUBLE) AS distinct_uris,
                   CAST(sum(CASE WHEN start_date IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS dated_rows
            FROM index_out),
          dups AS (
            SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS dup_rows FROM (
              SELECT count(*) AS c FROM index_out
              GROUP BY artist_uri, name, start_date HAVING count(*) > 1))
          SELECT 'row_count' AS check, round(row_count, 6) AS value, row_count > 0 AS passed
          FROM counts, dups
          UNION ALL
          SELECT 'null_ids', round(null_ids, 6), null_ids = 0 FROM counts, dups
          UNION ALL
          SELECT 'dup_rows', round(dup_rows, 6), dup_rows = 0 FROM counts, dups
          UNION ALL
          SELECT 'unique_uri_ratio', round(distinct_uris / row_count, 6),
                 distinct_uris = row_count FROM counts, dups
          UNION ALL
          SELECT 'date_completeness', round(dated_rows / row_count, 6),
                 dated_rows / row_count >= 0.95 FROM counts, dups"""
  )
}
