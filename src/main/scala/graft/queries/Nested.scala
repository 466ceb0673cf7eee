package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table

/** SURVEY.md §2.9 N1–N8 — nested-struct extraction (JSON shredding): the
  * reference's most-executed helper family, which shreds Wikidata/Last.fm
  * API JSON into flat columns.
  *
  * Reference semantics (citations into /root/reference):
  *   - N1 get_sparql_binding_value: utils/wikidata_helpers.py:172-183
  *   - N2 extract_wikidata_label (language fallback): utils/wikidata_helpers.py:348-378
  *   - N3 extract_wikidata_aliases (fallback, list): utils/wikidata_helpers.py:381-411
  *   - N4 extract_wikidata_wikipedia_url (sitelink→URL): utils/wikidata_helpers.py:414-432
  *   - N5 extract_wikidata_claim_value (entity-id vs literal dispatch):
  *     utils/wikidata_helpers.py:435-467
  *   - N6 extract_wikidata_claim_ids (all entity-id claims): utils/wikidata_helpers.py:470-494
  *   - N7 parse_lastfm_artist_response (dict-or-list normalization):
  *     utils/lastfm_helpers.py:110-153
  *   - N8 metadata struct flatten + sparse field drop: defs/assets/ingest_vector_db.py:24-73
  *
  * The offline harness ships no API fixture files, so each query synthesizes
  * the exact API JSON shape deterministically from customer columns, then
  * extracts with `from_json` + nested projections — the extraction machinery
  * (schema'd parse, coalesce fallback chains, type dispatch on claim values,
  * array filter/transform) is identical to what runs over real payloads.
  * Both engines parse their own synthesized string, so only the extracted
  * values are compared.
  *
  * Scale notes: all per-row narrow projections, no shuffle; `from_json` is
  * the one non-codegen'd expression (Jackson parse per row) — unavoidable
  * for schema-on-read JSON and embarrassingly parallel.
  */
object Nested extends QueryModule {

  private val NoOpts = Map.empty[String, String]

  private def ck: Column  = col("c_custkey")
  private def cks: Column = ck.cast("string")
  private def nks: Column = col("c_nationkey").cast("string")

  private def q(parts: Column*): Column = concat(parts: _*)

  /** N1 — SPARQL binding shape: `binding[key]["value"]`. */
  private def n1_binding_value(s: SparkSession, d: String): DataFrame = {
    val j = q(
      lit("{\"artist\":{\"type\":\"uri\",\"value\":\"http://www.wikidata.org/entity/Q"),
      cks,
      lit("\"},\"name\":{\"type\":\"literal\",\"value\":\""),
      col("c_name"),
      lit("\"}}")
    )
    val p = from_json(
      j,
      "artist STRUCT<type:STRING,value:STRING>, name STRUCT<type:STRING,value:STRING>",
      NoOpts
    )
    table(s, d, "customer").select(
      ck,
      p.getField("artist").getField("value").as("artist_uri"),
      p.getField("name").getField("value").as("label")
    )
  }

  /** N2 — label with language fallback: en when present, else de. */
  private def n2_label_fallback(s: SparkSession, d: String): DataFrame = {
    val en = when(ck % 3 =!= 0, q(lit("\"en\":{\"value\":\""), col("c_name"), lit("\"},")))
      .otherwise(lit(""))
    val j = q(lit("{\"labels\":{"), en, lit("\"de\":{\"value\":\""), col("c_name"), lit(" DE\"}}}"))
    val p = from_json(j, "labels STRUCT<en:STRUCT<value:STRING>,de:STRUCT<value:STRING>>", NoOpts)
    table(s, d, "customer").select(
      ck,
      coalesce(
        p.getField("labels").getField("en").getField("value"),
        p.getField("labels").getField("de").getField("value")
      ).as("label")
    )
  }

  /** N3 — alias list with language fallback, rendered to CSV. */
  private def n3_alias_fallback(s: SparkSession, d: String): DataFrame = {
    val j = when(
      ck % 2 === 0,
      q(lit("{\"aliases\":{\"en\":[\""), col("c_name"), lit("\",\"A"), cks, lit("\"]}}"))
    ).otherwise(q(lit("{\"aliases\":{\"de\":[\""), col("c_name"), lit(" DE\"]}}")))
    val p = from_json(j, "aliases STRUCT<en:ARRAY<STRING>,de:ARRAY<STRING>>", NoOpts)
    table(s, d, "customer").select(
      ck,
      array_join(
        coalesce(p.getField("aliases").getField("en"), p.getField("aliases").getField("de")),
        ","
      ).as("aliases_csv")
    )
  }

  /** N4 — sitelink title → Wikipedia URL + display title. */
  private def n4_sitelink_url(s: SparkSession, d: String): DataFrame = {
    val j = q(lit("{\"sitelinks\":{\"enwiki\":{\"title\":\"Title_"), cks, lit("\"}}}"))
    val p     = from_json(j, "sitelinks STRUCT<enwiki:STRUCT<title:STRING>>", NoOpts)
    val title = p.getField("sitelinks").getField("enwiki").getField("title")
    table(s, d, "customer").select(
      ck,
      concat(lit("https://en.wikipedia.org/wiki/"), title).as("wikipedia_url"),
      translate(title, "_", " ").as("display_title")
    )
  }

  /** N5 — first claim value with entity-id vs literal dispatch: the claim
    * `value` is an object (`{"id": "Q…"}`) for entity claims and a bare
    * string for literals, so the value is parsed under both schemas and the
    * `type` field (read under a schema that omits `value`) picks the branch.
    */
  private def n5_claim_value(s: SparkSession, d: String): DataFrame = {
    val j = when(
      ck % 2 === 0,
      q(
        lit("{\"claims\":{\"P495\":[{\"mainsnak\":{\"datavalue\":{\"type\":\"wikibase-entityid\",\"value\":{\"id\":\"Q"),
        nks,
        lit("\"}}}}]}}")
      )
    ).otherwise(
      q(
        lit("{\"claims\":{\"P495\":[{\"mainsnak\":{\"datavalue\":{\"type\":\"string\",\"value\":\"lit"),
        cks,
        lit("\"}}}]}}")
      )
    )
    def dv(valueDdl: String): Column =
      element_at(
        from_json(
          j,
          s"claims STRUCT<P495:ARRAY<STRUCT<mainsnak:STRUCT<datavalue:STRUCT<type:STRING$valueDdl>>>>>",
          NoOpts
        ).getField("claims").getField("P495"),
        1
      ).getField("mainsnak").getField("datavalue")
    val t = dv("").getField("type")
    table(s, d, "customer").select(
      ck,
      when(
        t === "wikibase-entityid",
        dv(",value:STRUCT<id:STRING>").getField("value").getField("id")
      ).otherwise(dv(",value:STRING").getField("value")).as("claim_value")
    )
  }

  /** N6 — all entity-id claim targets, filtered and rendered to CSV. */
  private def n6_claim_ids(s: SparkSession, d: String): DataFrame = {
    val j = q(
      lit("{\"P527\":[{\"type\":\"wikibase-entityid\",\"id\":\"Q"),
      nks,
      lit("\"},{\"type\":\"string\",\"v\":\"x\"},{\"type\":\"wikibase-entityid\",\"id\":\"Q"),
      (ck % 50).cast("string"),
      lit("\"}]}")
    )
    val arr = from_json(j, "P527 ARRAY<STRUCT<type:STRING,id:STRING>>", NoOpts).getField("P527")
    table(s, d, "customer").select(
      ck,
      array_join(
        transform(
          filter(arr, x => x.getField("type") === "wikibase-entityid"),
          x => x.getField("id")
        ),
        ","
      ).as("claim_ids_csv")
    )
  }

  /** N7 — Last.fm dict-or-list normalization: `tag` is a JSON array for
    * multi-tag artists and a bare object for single-tag ones; both parse
    * attempts run and the non-null one wins.
    */
  private def n7_lastfm_normalize(s: SparkSession, d: String): DataFrame = {
    val j = when(
      ck % 2 === 0,
      q(lit("{\"tag\":[{\"name\":\"t"), nks, lit("\"},{\"name\":\"t"), (ck % 7).cast("string"), lit("\"}]}"))
    ).otherwise(q(lit("{\"tag\":{\"name\":\"t"), nks, lit("\"}}")))
    val asArr = from_json(j, "tag ARRAY<STRUCT<name:STRING>>", NoOpts).getField("tag")
    val asOne = from_json(j, "tag STRUCT<name:STRING>", NoOpts).getField("tag")
    val names = when(asArr.isNotNull, transform(asArr, x => x.getField("name")))
      .otherwise(array(asOne.getField("name")))
    table(s, d, "customer").select(ck, array_join(names, ",").as("tags_csv"))
  }

  /** N8 — nested metadata struct flatten with sparse-field semantics: build
    * the struct, project `m.*`, keep the optional field nullable.
    */
  private def n8_meta_flatten(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .withColumn(
        "m",
        struct(
          col("c_name").as("artist"),
          (col("c_nationkey") + 1900).cast("long").as("inception_year"),
          when(ck % 5 =!= 0, concat(lit("N"), nks)).as("country")
        )
      )
      .select(ck, col("m.artist"), col("m.inception_year"), col("m.country"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_binding_value" -> (n1_binding_value _),
    "n2_label_fallback" -> (n2_label_fallback _),
    "n3_alias_fallback" -> (n3_alias_fallback _),
    "n4_sitelink_url" -> (n4_sitelink_url _),
    "n5_claim_value" -> (n5_claim_value _),
    "n6_claim_ids" -> (n6_claim_ids _),
    "n7_lastfm_normalize" -> (n7_lastfm_normalize _),
    "n8_meta_flatten" -> (n8_meta_flatten _)
  )

  val oracles: Map[String, String] = Map(
    "n1_binding_value" ->
      """WITH src AS (SELECT c_custkey,
                '{"artist":{"type":"uri","value":"http://www.wikidata.org/entity/Q'
                || CAST(c_custkey AS VARCHAR)
                || '"},"name":{"type":"literal","value":"' || c_name || '"}}' AS j
              FROM customer)
         SELECT c_custkey, j->'artist'->>'value' AS artist_uri,
                j->'name'->>'value' AS label
         FROM src""",
    "n2_label_fallback" ->
      """WITH src AS (SELECT c_custkey,
                '{"labels":{'
                || CASE WHEN c_custkey % 3 <> 0
                        THEN '"en":{"value":"' || c_name || '"},' ELSE '' END
                || '"de":{"value":"' || c_name || ' DE"}}}' AS j
              FROM customer)
         SELECT c_custkey,
                coalesce(j->'labels'->'en'->>'value', j->'labels'->'de'->>'value') AS label
         FROM src""",
    "n3_alias_fallback" ->
      """WITH src AS (SELECT c_custkey,
                CASE WHEN c_custkey % 2 = 0
                     THEN '{"aliases":{"en":["' || c_name || '","A' || CAST(c_custkey AS VARCHAR) || '"]}}'
                     ELSE '{"aliases":{"de":["' || c_name || ' DE"]}}' END AS j
              FROM customer)
         SELECT c_custkey,
                array_to_string(coalesce(CAST(j->'aliases'->'en' AS VARCHAR[]),
                                         CAST(j->'aliases'->'de' AS VARCHAR[])), ',') AS aliases_csv
         FROM src""",
    "n4_sitelink_url" ->
      """WITH src AS (SELECT c_custkey,
                '{"sitelinks":{"enwiki":{"title":"Title_' || CAST(c_custkey AS VARCHAR) || '"}}}' AS j
              FROM customer)
         SELECT c_custkey,
                'https://en.wikipedia.org/wiki/' || (j->'sitelinks'->'enwiki'->>'title') AS wikipedia_url,
                replace(j->'sitelinks'->'enwiki'->>'title', '_', ' ') AS display_title
         FROM src""",
    "n5_claim_value" ->
      """WITH src AS (SELECT c_custkey,
                CASE WHEN c_custkey % 2 = 0
                     THEN '{"claims":{"P495":[{"mainsnak":{"datavalue":{"type":"wikibase-entityid","value":{"id":"Q'
                          || CAST(c_nationkey AS VARCHAR) || '"}}}}]}}'
                     ELSE '{"claims":{"P495":[{"mainsnak":{"datavalue":{"type":"string","value":"lit'
                          || CAST(c_custkey AS VARCHAR) || '"}}}]}}' END AS j
              FROM customer),
         dv AS (SELECT c_custkey, j->'claims'->'P495'->0->'mainsnak'->'datavalue' AS v FROM src)
         SELECT c_custkey,
                CASE WHEN v->>'type' = 'wikibase-entityid'
                     THEN v->'value'->>'id' ELSE v->>'value' END AS claim_value
         FROM dv""",
    "n6_claim_ids" ->
      """WITH src AS (SELECT c_custkey,
                '{"P527":[{"type":"wikibase-entityid","id":"Q' || CAST(c_nationkey AS VARCHAR)
                || '"},{"type":"string","v":"x"},{"type":"wikibase-entityid","id":"Q'
                || CAST(c_custkey % 50 AS VARCHAR) || '"}]}' AS j
              FROM customer)
         SELECT c_custkey,
                array_to_string(list_transform(
                  list_filter(CAST(j->'P527' AS JSON[]),
                              x -> json_extract_string(x, '$.type') = 'wikibase-entityid'),
                  x -> json_extract_string(x, '$.id')), ',') AS claim_ids_csv
         FROM src""",
    "n7_lastfm_normalize" ->
      """WITH src AS (SELECT c_custkey,
                CASE WHEN c_custkey % 2 = 0
                     THEN '{"tag":[{"name":"t' || CAST(c_nationkey AS VARCHAR)
                          || '"},{"name":"t' || CAST(c_custkey % 7 AS VARCHAR) || '"}]}'
                     ELSE '{"tag":{"name":"t' || CAST(c_nationkey AS VARCHAR) || '"}}' END AS j
              FROM customer)
         SELECT c_custkey,
                CASE WHEN json_type(j->'tag') = 'ARRAY'
                     THEN array_to_string(list_transform(CAST(j->'tag' AS JSON[]),
                            x -> json_extract_string(x, '$.name')), ',')
                     ELSE j->'tag'->>'name' END AS tags_csv
         FROM src""",
    "n8_meta_flatten" ->
      """SELECT c_custkey, c_name AS artist,
                CAST(c_nationkey + 1900 AS BIGINT) AS inception_year,
                CASE WHEN c_custkey % 5 <> 0
                     THEN 'N' || CAST(c_nationkey AS VARCHAR) END AS country
         FROM customer"""
  )
}
