package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** The reference's asset transforms as pure `DataFrame* => DataFrame`
  * functions, composable into the DAG that [[Pipeline]] orchestrates —
  * SURVEY.md §7.1's `pipeline/` layer. Each function cites the asset it
  * re-expresses; all of them compose operators that have their own oracled
  * queries, so the pipeline is the integration of independently verified
  * parts.
  *
  * Scale notes: the chain is shuffle-minimal — cleaning/gating/chunking are
  * narrow projections; the dedup is two key-partitioned windows; enrichment
  * joins broadcast the dim side; nothing collects to the driver.
  */
object Assets {

  /** build_artist_index (reference defs/assets/build_artist_index.py:88-197):
    * F1 clean the name, P7 null gates, A11 dedup-by-priority — sort by
    * start_date and keep the first row per artist_uri, then per name, with a
    * deterministic tiebreak (SURVEY §7.5.1).
    */
  def buildArtistIndex(raw: DataFrame): DataFrame = {
    val cleaned = raw.select(
      col("artist_uri"),
      TF.cleanText(col("name")).as("name"),
      col("start_date")
    )
    val gated = cleaned.filter(
      col("artist_uri").isNotNull && col("name").isNotNull &&
        col("name") =!= "" && col("start_date").isNotNull
    )
    val byDate = Seq(col("start_date").asc, col("artist_uri").asc, col("name").asc)
    val w1     = Window.partitionBy(col("artist_uri")).orderBy(byDate: _*)
    val w2     = Window.partitionBy(col("name")).orderBy(byDate: _*)
    gated
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Latin-script name gate (reference defs/assets/extract_artists.py:42-63,
    * 305-309): the compiled `^[ -ɏḀ-ỿ]*$` range pair.
    */
  val LatinNameRegex = "^[\\u0000-\\u024F\\u1E00-\\u1EFF]*$"

  /** extract_artists (reference defs/assets/extract_artists.py:66-309):
    * QID from URI (F5), enrichment join against the entity source (S7),
    * Latin-script gate (P4), validation gate — wikipedia_url AND mbid AND
    * country all present (P6). Entities are the smaller side at fixture
    * scale; at real scale both sides shuffle on qid and AQE picks the join.
    */
  def extractArtists(index: DataFrame, entities: DataFrame): DataFrame =
    index
      .select(
        TF.qidFromUri(col("artist_uri")).as("qid"),
        col("name"),
        split(col("start_date"), "-").getItem(0).cast("int").as("inception_year")
      )
      .filter(col("name").rlike(LatinNameRegex))
      .join(entities.withColumnRenamed("name", "entity_name"), Seq("qid"))
      .filter(
        col("wikipedia_url").isNotNull && col("mbid").isNotNull && col("country").isNotNull
      )
      .select(col("qid").as("id"), col("name"), col("mbid"), col("country"),
        col("wikipedia_url"), col("inception_year"))

  /** extract_countries (reference defs/assets/extract_countries.py:47-92):
    * distinct country names from the artist frame, resolved to fixture ids;
    * unresolved names (J9 anti-join) are the reconciliation report.
    */
  def extractCountries(artists: DataFrame, resolved: DataFrame): (DataFrame, DataFrame) = {
    val names = artists.select(col("country").as("name")).distinct()
    (
      names.join(resolved, Seq("name")),
      names.join(resolved, Seq("name"), "left_anti")
    )
  }

  /** extract_articles (reference defs/assets/extract_artists_articles.py:
    * 104-203): join article text by QID, clean (F1), fixed-stride chunk
    * (F3, declared chunking function SURVEY §7.5.4), chunk ids (F15), and
    * the search_document context header (F14).
    */
  def extractArticles(artists: DataFrame, articleSrc: DataFrame): DataFrame = {
    val joined = artists
      .select(col("id").as("qid"), col("name"), col("country"), col("inception_year"))
      .join(articleSrc, Seq("qid"))
    joined
      .select(
        col("qid"),
        col("name"),
        col("country"),
        col("inception_year"),
        col("title"),
        posexplode(TF.chunkFixed(TF.cleanText(col("raw_text")), 200, 150))
      )
      .select(
        TF.chunkId(col("qid"), col("pos")).as("id"),
        concat(
          lit("search_document: Topic: "),
          col("name"),
          lit(". Context: "),
          col("country"),
          lit("; "),
          col("inception_year").cast("string"),
          lit(" | "),
          col("title"),
          lit(" | "),
          col("col")
        ).as("article"),
        col("qid"),
        (col("pos") + 1).cast("long").as("chunk_index")
      )
  }

  /** extract_releases (reference defs/assets/extract_releases.py:28-99 +
    * utils/musicbrainz_helpers.py filter_release_groups/parse_release_year):
    * release groups of known artists, kept only when primary type is
    * Album/Single AND no secondary types; title cleaned (F1), year = leading
    * date component (handles "YYYY" / "YYYY-MM" / "YYYY-MM-DD" uniformly).
    */
  def extractReleases(artists: DataFrame, releaseGroups: DataFrame): DataFrame =
    releaseGroups
      .join(artists.select(col("id").as("artist_qid")), Seq("artist_qid"), "left_semi")
      .filter(
        col("primary_type").isin("Album", "Single") && size(col("secondary_types")) === 0
      )
      .select(
        col("rg_id").as("id"),
        TF.cleanText(col("title")).as("title"),
        split(col("first_release_date"), "-").getItem(0).cast("int").as("year"),
        col("artist_qid").as("artist_id")
      )

  /** select_best_release (reference utils/musicbrainz_helpers.py:280-308):
    * per release group, prefer Official status, then earliest date. The
    * reference relies on Python's stable sort for ties; the declared
    * deterministic tiebreak here is the release id (SURVEY §7.5.1 pattern).
    * O3 argmin-by-composite-key in pipeline form — one key-partitioned
    * window, no collected candidate lists.
    */
  def selectBestRelease(candidates: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("rg_id"))
      .orderBy(
        when(col("status") === "Official", 0).otherwise(1).asc,
        col("rdate").asc,
        col("release_id").asc
      )
    candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rg_id"), col("release_id"))
  }

  /** extract_tracks (reference defs/assets/extract_tracks.py:28-110):
    * candidates restricted to surviving release groups, best release chosen
    * per group ([[selectBestRelease]]), then the track fan-out runs ONLY on
    * the chosen releases (the reference fetches tracks per chosen release;
    * exploding before the best-release prune would build ~every candidate's
    * track list and throw it away). Output Track(id, title,
    * album_id = release-GROUP id).
    */
  def extractTracks(releases: DataFrame, candidates: DataFrame, trackSrc: DataFrame): DataFrame = {
    val cands = candidates
      .join(releases.select(col("id").as("rg_id")), Seq("rg_id"), "left_semi")
    selectBestRelease(cands)
      .join(trackSrc, "release_id")
      .select(
        col("rg_id"),
        col("release_id"),
        col("l_partkey"),
        explode(sequence(lit(1), col("n_tracks"))).as("tno")
      )
      .select(
        concat(col("release_id"), lit("_t"), col("tno").cast("string")).as("id"),
        TF.cleanText(
          concat(
            lit("  Track "),
            col("l_partkey").cast("string"),
            lit("-"),
            col("tno").cast("string"),
            lit("  ")
          )
        ).as("title"),
        col("rg_id").as("album_id")
      )
  }

  /** extract_genres (reference defs/assets/extract_genres.py:33-132): each
    * artist's genre-QID list is exploded (F10), null entries dropped (P3),
    * de-duplicated, and resolved to label + aliases + P279 parents — here
    * derived deterministically from the genre number the same way the
    * entity fixtures derive from keys (aliases/parents emitted as CSV
    * strings, the JSONL-friendly sparse form; empty string = no parents).
    */
  def extractGenres(artists: DataFrame): DataFrame = {
    val cnum = substring(col("id"), 2, 18).cast("long")
    val gids = artists
      .select(
        explode(
          array(
            concat(lit("G"), (cnum % 7).cast("string")),
            when(cnum % 3 =!= 0, concat(lit("G"), (cnum % 13).cast("string")))
          )
        ).as("gid")
      )
      .filter(col("gid").isNotNull)
      .distinct()
    val n = substring(col("gid"), 2, 6).cast("int")
    gids.select(
      col("gid").as("id"),
      TF.cleanText(concat(lit("  Genre "), n.cast("string"), lit("  "))).as("name"),
      concat(lit("g"), n.cast("string"), lit(",style"), n.cast("string")).as("aliases"),
      when(n > 3, concat(lit("G"), (n % 4).cast("string"))).otherwise(lit("")).as("parents")
    )
  }

  /** extract_genres_articles (reference defs/assets/extract_genres_articles
    * .py): the same clean→chunk→id→context pipeline as [[extractArticles]]
    * but keyed by genre, with the genre-only `parents` column carried
    * through (exercises the relaxed-union fill on the artist side).
    */
  def genreArticleChunks(genres: DataFrame, docs: DataFrame): DataFrame = {
    val n = substring(col("id"), 2, 6).cast("long")
    genres
      .select(col("id").as("gid"), col("name"), col("parents"), (n + 1).as("doc_id"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(
        col("gid"),
        col("name"),
        col("parents"),
        posexplode(TF.chunkFixed(TF.cleanText(col("text")), 200, 150))
      )
      .select(
        TF.chunkId(col("gid"), col("pos")).as("id"),
        concat(
          lit("search_document: Topic: "),
          col("name"),
          lit(". Context: genre | "),
          col("col")
        ).as("article"),
        col("gid").as("qid"),
        (col("pos") + 1).cast("long").as("chunk_index"),
        lit("genre").as("entity_type"),
        col("parents")
      )
  }

  /** merge_wikipedia_articles (reference defs/assets/merge_wikipedia_articles.py:
    * 42-61): relaxed union of per-entity-type article frames.
    */
  def mergeArticles(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** ingest_vector_db (reference defs/assets/ingest_vector_db.py:126-221 +
    * utils/chroma_helpers.py:111-124): empty articles filtered, doc id =
    * sha256(article + "-" + id)[:32] (F12), then the collection upsert —
    * a stale copy of the chunk-1 rows plays the already-ingested
    * collection, the full batch arrives versioned on top, and keep-last
    * per doc_id (S17, one key-partitioned window) resolves; rows are
    * tagged updated/inserted by whether an existing row was replaced
    * (S18's provenance semantics).
    */
  def vectorIngest(chunks: DataFrame): DataFrame = {
    val batch = chunks
      .filter(col("article").isNotNull && length(col("article")) > 0)
      .select(
        TF.docId(col("article"), col("id")).as("doc_id"),
        col("qid"),
        col("entity_type"),
        col("chunk_index").cast("long").as("chunk_index")
      )
    val stale    = batch.filter(col("chunk_index") === 1).withColumn("ver", lit(0L))
    val incoming = batch.withColumn("ver", lit(1L))
    val w        = Window.partitionBy(col("doc_id")).orderBy(col("ver").desc)
    stale
      .unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("qid"),
        col("entity_type"),
        col("chunk_index"),
        when(col("chunk_index") === 1, lit("updated")).otherwise(lit("inserted")).as("src")
      )
  }

  /** ingest_graph_db node/edge derivation (reference
    * defs/assets/ingest_graph_db.py:126-296): typed node union + the
    * FROM_COUNTRY edge join (J6, broadcast dim).
    */
  def graphTables(artists: DataFrame, countries: DataFrame): (DataFrame, DataFrame) = {
    val artistNodes = artists.select(
      col("id").as("node_id"),
      lit("Artist").as("node_type"),
      col("name")
    )
    val countryNodes = countries.select(
      col("id").as("node_id"),
      lit("Country").as("node_type"),
      col("name")
    )
    // FROM_COUNTRY edges: artist id -> country id
    val e = artists
      .join(
        broadcast(countries.select(col("id").as("country_id"), col("name").as("cname"))),
        col("country") === col("cname")
      )
      .select(col("id").as("src"), col("country_id").as("dst"), lit("FROM_COUNTRY").as("rel"))
    (artistNodes.unionByName(countryNodes), e)
  }
}
