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

  /** merge_wikipedia_articles (reference defs/assets/merge_wikipedia_articles.py:
    * 42-61): relaxed union of per-entity-type article frames.
    */
  def mergeArticles(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

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
