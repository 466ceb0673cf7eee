package graft.model

/** Domain model — the typed record collections of the reference
  * (reference: src/data_pipeline/models.py:16-134), as Scala case classes.
  *
  * `Encoders.product[T].schema` is the single source of truth for each
  * frame's schema, replacing the reference's msgspec→Polars reflection
  * (`models.py:137-202`): declare once, derive the Spark schema — Optional
  * fields become nullable columns, `Option[Seq[String]]` becomes a nullable
  * `array<string>`, and the nested `ArticleMetadata` struct nests naturally.
  *
  * Ids are strings (Wikidata QIDs / MusicBrainz MBIDs); years are Ints; no
  * timestamp semantics exist anywhere in the reference (dates stay strings,
  * SURVEY §1.2).
  */
final case class Artist(
    id: String,
    name: String,
    mbid: String,
    country: String,
    aliases: Option[Seq[String]] = None,
    genres: Option[Seq[String]] = None,
    tags: Option[Seq[String]] = None,
    similar_artists: Option[Seq[String]] = None
)

final case class Genre(
    id: String,
    name: String,
    aliases: Option[Seq[String]] = None,
    parent_ids: Option[Seq[String]] = None
)

final case class Release(
    id: String,
    title: String,
    year: Option[Int] = None,
    artist_id: String
)

final case class Track(
    id: String,
    title: String,
    album_id: String
)

final case class Country(
    id: String,
    name: String,
    aliases: Option[Seq[String]] = None
)

final case class ArticleMetadata(
    title: String,
    name: String,
    entity_type: String,
    aliases: Option[Seq[String]] = None,
    tags: Option[Seq[String]] = None,
    similar_artists: Option[Seq[String]] = None,
    genres: Option[Seq[String]] = None,
    inception_year: Option[Int] = None,
    country: Option[String] = None,
    wikipedia_url: String,
    wikidata_uri: String,
    chunk_index: Int,
    total_chunks: Int
)

final case class Article(
    id: String,
    metadata: ArticleMetadata,
    article: String
)

final case class CommunityAssignment(
    artist_id: String,
    artist_name: String,
    community_id: Long,
    level: Int
)

final case class Community(
    community_id: Long,
    level: Int,
    entity_type: String = "community",
    member_count: Long,
    top_tags: Seq[String],
    top_genres: Seq[String],
    top_countries: Seq[String],
    representative_artists: Seq[String],
    member_ids: Seq[String],
    name: Option[String] = None,
    summary: Option[String] = None
)
