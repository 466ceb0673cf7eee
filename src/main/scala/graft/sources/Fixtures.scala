package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table

/** Fixture-backed sources — SURVEY.md §2.1 S6–S13: the reference's five HTTP
  * adapters (SPARQL, Wikidata entity batches, Wikipedia extracts, Last.fm,
  * MusicBrainz) are replaced in this offline environment by deterministic
  * fixture frames derived from the harness tables. The *shapes* are the
  * reference's: a raw SPARQL artist index `(artist_uri, name, start_date)`
  * with planted duplicates and nulls, entity tables keyed by QID, and a
  * cache table supporting the resumable fetch pattern.
  *
  * Reference semantics (citations into /root/reference):
  *   - S6 SPARQL paginated source: utils/wikidata_helpers.py:31-118 — the
  *     fixture preserves its ORDER BY (start_date, artist) determinism (O2)
  *   - S7/S8 entity batch + cache: utils/wikidata_helpers.py:188-298,497-606
  *   - J10-style cache partition: utils/wikidata_helpers.py:229-245 — split
  *     requested ids into cache hits (LEFT SEMI) vs to-fetch (LEFT ANTI);
  *     at scale this is the whole point: the fetch set shrinks to the anti
  *     side, and neither side ever materializes an id list on the driver.
  */
object Fixtures {

  /** S6 — raw SPARQL-shaped artist index with the reference's dirt baked in:
    * duplicate URIs with later dates (dedup-by-priority must keep the
    * earliest), duplicate names under different URIs, rows with missing
    * name/date (P7 null gates must drop), and whitespace noise (F1 cleans).
    */
  def artistIndexRaw(s: SparkSession, d: String): DataFrame = {
    val c = table(s, d, "customer")
    val base = c.select(
      concat(lit("http://www.wikidata.org/entity/Q"), col("c_custkey").cast("string"))
        .as("artist_uri"),
      // injected whitespace noise for the F1 cleaning stage, plus non-Latin
      // names on a slice of rows so the P4 Latin-script gate has work to do
      concat(
        lit("  "),
        col("c_name"),
        when(col("c_custkey") % 17 === 0, lit(" Ω")).otherwise(lit("")),
        lit("  ")
      ).as("name"),
      concat(
        lit("19"),
        lpad((col("c_custkey") % 50 + 20).cast("string"), 2, "0"),
        lit("-01-01")
      ).as("start_date")
    )
    // duplicate URIs, dated later — the dedup must prefer the original
    val dupUris = c
      .filter(col("c_custkey") % 10 === 0)
      .select(
        concat(lit("http://www.wikidata.org/entity/Q"), col("c_custkey").cast("string"))
          .as("artist_uri"),
        concat(col("c_name"), lit(" (later)")).as("name"),
        lit("1999-12-31").as("start_date")
      )
    // null-gated rows: missing name or date (P7 drops these)
    val nulled = c
      .filter(col("c_custkey") % 13 === 0)
      .select(
        concat(lit("http://www.wikidata.org/entity/QX"), col("c_custkey").cast("string"))
          .as("artist_uri"),
        when(col("c_custkey") % 2 === 0, col("c_name")).as("name"),
        when(col("c_custkey") % 2 =!= 0, lit("1980-01-01")).as("start_date")
      )
    base.unionByName(dupUris).unionByName(nulled)
  }

  /** S7-shaped entity fixture: one enrichment row per QID. */
  def entityFixture(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(
        broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey")
      )
      .select(
        concat(lit("Q"), col("c_custkey").cast("string")).as("qid"),
        col("c_name").as("name"),
        md5(col("c_name")).as("mbid"),
        col("n_name").as("country"),
        when(col("c_custkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("https://en.wikipedia.org/wiki/T"), col("c_custkey").cast("string")))
          .as("wikipedia_url")
      )

  /** S9-shaped article text fixture keyed by QID. */
  def articleFixture(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").select(
      concat(lit("Q"), col("doc_id").cast("string")).as("qid"),
      concat(lit("Title_"), col("doc_id").cast("string")).as("title"),
      col("text").as("raw_text")
    )

  /** S10-shaped MusicBrainz release-group fixture keyed by artist QID
    * (reference fetch_artist_release_groups_async,
    * utils/musicbrainz_helpers.py:31-118): primary type cycles
    * Album/Single/EP (EP must be filtered out), every 7th group carries a
    * secondary type (must be filtered out), and the first-release date
    * cycles through MusicBrainz's three formats "YYYY" / "YYYY-MM" /
    * "YYYY-MM-DD" so the year parser sees all of them.
    */
  def releaseGroupFixture(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders").select(
      concat(lit("RG"), col("o_orderkey").cast("string")).as("rg_id"),
      concat(lit("Q"), col("o_custkey").cast("string")).as("artist_qid"),
      concat(lit("  Release "), col("o_orderkey").cast("string"), lit("  ")).as("title"),
      when(col("o_orderkey") % 3 === 0, lit("Album"))
        .when(col("o_orderkey") % 3 === 1, lit("Single"))
        .otherwise(lit("EP"))
        .as("primary_type"),
      when(col("o_orderkey") % 7 === 0, array(lit("Compilation")))
        .otherwise(array().cast("array<string>"))
        .as("secondary_types"),
      when(col("o_orderkey") % 5 === 0, date_format(col("o_orderdate"), "yyyy"))
        .when(col("o_orderkey") % 5 === 1, date_format(col("o_orderdate"), "yyyy-MM"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .as("first_release_date")
    )

  /** S11-shaped candidate releases per release group (reference
    * fetch_releases_for_group_async): odd line numbers are "Official",
    * even are "Promotion"; dates come from the ship date — the best-release
    * argmin must prefer (Official, earliest date, id tiebreak).
    */
  def releaseCandidatesFixture(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem").select(
      concat(lit("RG"), col("l_orderkey").cast("string")).as("rg_id"),
      concat(
        lit("R"),
        col("l_orderkey").cast("string"),
        lit("_"),
        col("l_linenumber").cast("string")
      ).as("release_id"),
      when(col("l_linenumber") % 2 === 1, lit("Official"))
        .otherwise(lit("Promotion"))
        .as("status"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("rdate")
    )

  /** S12-shaped track source (reference fetch_tracks_for_release_async):
    * release R{o}_{n} carries n tracks. Returned UNEXPLODED — the reference
    * fetches tracks only for each group's chosen release, so the consumer
    * semi-joins the best-release set FIRST and fans out after
    * ([[graft.pipeline.Assets.extractTracks]]); exploding up front would
    * materialize every candidate's track list only to discard ~all of it.
    */
  def trackFixture(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .select(
        concat(
          lit("R"),
          col("l_orderkey").cast("string"),
          lit("_"),
          col("l_linenumber").cast("string")
        ).as("release_id"),
        col("l_partkey"),
        col("l_linenumber").cast("int").as("n_tracks")
      )

  /** The cache-hit / fetch-missing split (S7/S8/J10): `requested` ids are
    * partitioned into cache hits and to-fetch via semi/anti joins — no
    * driver-side id sets, no shuffle beyond the two key-only joins.
    */
  def cacheSplit(requested: DataFrame, cache: DataFrame, key: String): (DataFrame, DataFrame) = (
    requested.join(cache, Seq(key), "left_semi"),
    requested.join(cache, Seq(key), "left_anti")
  )
}
