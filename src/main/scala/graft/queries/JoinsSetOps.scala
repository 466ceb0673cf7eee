package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table

/** SURVEY.md §2.3 joins (J1–J10) and §2.7 set operations (U1–U4).
  *
  * Reference semantics (citations into /root/reference):
  *   - J1 left equi-join releases⟕grouped tracks: defs/assets/ingest_graph_db.py:110-115
  *   - J2 left enrichment join: defs/assets/detect_communities.py:283-288
  *   - J5 OR-predicate theta join (name OR alias): defs/assets/ingest_graph_db.py:236-243,
  *     rewritten as a union of equi-joins + distinct so Catalyst never plans a
  *     broadcast-nested-loop join — the OR form would be quadratic at scale.
  *   - J6 broadcast dim join: defs/assets/ingest_graph_db.py:284-295
  *   - J7 self equi-join, self-pairs excluded: defs/assets/ingest_graph_db.py:267-280
  *   - J8 fk inner equi-join: defs/assets/ingest_graph_db.py:252-263
  *   - J9 anti join: defs/assets/extract_countries.py:90-92
  *   - J10 semi join (cache-hit partition): utils/wikidata_helpers.py:229-245
  *   - U1 relaxed union: defs/assets/merge_wikipedia_articles.py:42-61
  *   - U4 difference: defs/assets/extract_countries.py:90
  *
  * Scale notes: dims (nation/region) are broadcast explicitly; the fact-side
  * joins shuffle once on the join key and AQE handles skew. The J5 rewrite
  * turns a worst-case O(n·m) predicate into two hash joins + one dedup.
  */
object JoinsSetOps extends QueryModule {

  private def j1_left_join_agg(s: SparkSession, d: String): DataFrame = {
    val liAgg = table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact in fp64
        count(lit(1)).as("n_items")
      )
    table(s, d, "orders")
      .join(liAgg, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("sum_qty"),
        coalesce(col("n_items"), lit(0L)).as("n_items")
      )
  }

  private def j2_left_enrich(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(
        broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"),
        "left"
      )
      .select(col("c_custkey"), col("c_name"), col("n_name"))

  /** J5 — `a = x OR b = x` join, rewritten as union-of-equi-joins + distinct. */
  private def j5_theta_or_join(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val p = table(s, d, "part").select("p_partkey")
    val byPart = li.join(p, col("p_partkey") === col("l_partkey"))
    val bySupp = li.join(p, col("p_partkey") === col("l_suppkey"))
    byPart
      .select("l_orderkey", "p_partkey")
      .union(bySupp.select("l_orderkey", "p_partkey"))
      .distinct()
  }

  private def j6_broadcast_dims(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"))

  /** J7 — self equi-join on a grouping key, self-pairs excluded. */
  private def j7_self_join(s: SparkSession, d: String): DataFrame = {
    val a = table(s, d, "nation").select(
      col("n_nationkey").as("a_key"),
      col("n_regionkey").as("a_region")
    )
    val b = table(s, d, "nation").select(
      col("n_nationkey").as("b_key"),
      col("n_regionkey").as("b_region")
    )
    a.join(b, col("a_region") === col("b_region") && col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"), col("a_region").as("regionkey"))
  }

  private def j8_fk_join(s: SparkSession, d: String): DataFrame =
    table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))

  private def j9_anti_join(s: SparkSession, d: String): DataFrame = {
    val fOrders = table(s, d, "orders").filter(col("o_orderstatus") === "F")
    table(s, d, "customer")
      .join(fOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  private def j10_semi_join(s: SparkSession, d: String): DataFrame = {
    val bigOrders = table(s, d, "orders").filter(col("o_totalprice") > 1000.0)
    table(s, d, "customer")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
  }

  /** J3 — exploded-array lookup join (reference
    * defs/assets/extract_artists_articles.py:77-97: genre-id list → lookup →
    * name list): build the per-order supplier-id array in deterministic
    * order, posexplode it, broadcast-join the supplier dim, and re-collect
    * names preserving the original array order.
    */
  private def j3_array_lookup(s: SparkSession, d: String): DataFrame = {
    val arr = table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("l_suppkey")))),
          x => x.getField("l_suppkey")
        ).as("supp_ids")
      )
    val sup = table(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
    arr
      .select(col("l_orderkey"), posexplode(col("supp_ids")))
      .join(broadcast(sup), col("col") === col("s_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("s_name")))),
            x => x.getField("s_name")
          ),
          ","
        ).as("supplier_names")
      )
  }

  /** J4 — qid→year lookup join (reference
    * defs/assets/extract_artists_articles.py:82-97): extract the trailing
    * QID from an entity URI, broadcast-join a small (qid → year) lookup.
    */
  private def j4_qid_year_lookup(s: SparkSession, d: String): DataFrame = {
    val uri =
      concat(lit("http://www.wikidata.org/entity/Q"), col("c_nationkey").cast("string"))
    val cust = table(s, d, "customer")
      .select(col("c_custkey"), graft.functions.TextFunctions.qidFromUri(uri).as("qid"))
    val years = table(s, d, "nation").select(
      concat(lit("Q"), col("n_nationkey").cast("string")).as("qid"),
      (col("n_nationkey") + 1950).cast("long").as("inception_year")
    )
    cust.join(broadcast(years), Seq("qid")).select(col("c_custkey"), col("inception_year"))
  }

  /** J11 — salted skew join: the fact side is deliberately skewed (80% of
    * rows share key 0); the dim side is exploded ×16 with a salt column and
    * the fact side salts deterministically, so the hot key's rows spread
    * over 16 shuffle partitions instead of one straggler task. AQE's skew
    * split handles this adaptively; explicit salting is the plan-stable
    * form when the skew is known (e.g. null-ish sentinel keys at 100 TB).
    */
  private def j11_salted_skew_join(s: SparkSession, d: String): DataFrame = {
    val Salts = 16
    val fact = table(s, d, "lineitem").select(
      when(col("l_orderkey") % 5 =!= 0, lit(0L))
        .otherwise(col("l_partkey") % 100)
        .as("k"),
      (col("l_orderkey") % Salts).as("salt"),
      col("l_quantity")
    )
    val dim = table(s, d, "part")
      .groupBy((col("p_partkey") % 100).as("k"))
      .agg(min(col("p_name")).as("dname"))
    val dimSalted =
      dim.withColumn("salt", explode(sequence(lit(0L), lit(Salts - 1L))))
    fact
      .join(dimSalted, Seq("k", "salt"))
      .groupBy(col("k"), col("dname"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty") // integral doubles: exact in fp64
      )
  }

  /** J15 — NULL-SAFE equi-join (`<=>` / SQL `IS NOT DISTINCT FROM`): the
    * join semantic for nullable business keys, where NULL must MATCH NULL
    * instead of silently dropping both sides (plain `=` never matches a
    * NULL — rows with unknown keys vanish from an inner join with no
    * trace, the classic reconciliation bug). Spark plans EqualNullSafe as
    * a true equi-join key (hash/SMJ, asserted in PlanShapeSpec), not a
    * nested loop — so the null-safe form costs the same shuffle as `=`.
    * The NULL⋈NULL block is a key-group cross product by definition;
    * keyed like any skewed group, bounded here (and salted/AQE-split at
    * scale like any hot key — the j11 discipline).
    */
  private def j15_nullsafe_join(s: SparkSession, d: String): DataFrame = {
    val custKey = when(col("c_custkey") % 7 === 0, lit(null).cast("long"))
      .otherwise(col("c_nationkey").cast("long"))
    val natKey = when(col("n_nationkey") % 5 === 0, lit(null).cast("long"))
      .otherwise(col("n_nationkey").cast("long"))
    val left  = table(s, d, "customer").select(custKey.as("k"), col("c_custkey"))
    val right = table(s, d, "nation").select(natKey.as("k"), col("n_name"))
    left
      .join(right, left("k") <=> right("k"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** U1 — union with compatible-but-unequal schemas (vertical_relaxed). */
  private def u1_union_relaxed(s: SparkSession, d: String): DataFrame = {
    val c = table(s, d, "customer").select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_acctbal").as("bal")
    )
    val sup = table(s, d, "supplier").select(
      col("s_suppkey").as("id"),
      col("s_name").as("name")
    )
    c.unionByName(sup, allowMissingColumns = true)
  }

  private def u4_except(s: SparkSession, d: String): DataFrame = {
    val allNations = table(s, d, "nation").select(col("n_nationkey").as("nationkey"))
    val customerNations =
      table(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
    allNations.except(customerNations)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_left_join_agg" -> (j1_left_join_agg _),
    "j2_left_enrich" -> (j2_left_enrich _),
    "j3_array_lookup" -> (j3_array_lookup _),
    "j4_qid_year_lookup" -> (j4_qid_year_lookup _),
    "j5_theta_or_join" -> (j5_theta_or_join _),
    "j6_broadcast_dims" -> (j6_broadcast_dims _),
    "j7_self_join" -> (j7_self_join _),
    "j8_fk_join" -> (j8_fk_join _),
    "j9_anti_join" -> (j9_anti_join _),
    "j10_semi_join" -> (j10_semi_join _),
    "j11_salted_skew_join" -> (j11_salted_skew_join _),
    "j15_nullsafe_join" -> (j15_nullsafe_join _),
    "u1_union_relaxed" -> (u1_union_relaxed _),
    "u4_except" -> (u4_except _)
  )

  val oracles: Map[String, String] = Map(
    "j15_nullsafe_join" ->
      """WITH l AS (
           SELECT CASE WHEN c_custkey % 7 <> 0 THEN CAST(c_nationkey AS BIGINT) END AS k,
                  c_custkey
           FROM customer),
         r AS (
           SELECT CASE WHEN n_nationkey % 5 <> 0 THEN CAST(n_nationkey AS BIGINT) END AS k,
                  n_name
           FROM nation)
         SELECT n_name, CAST(count(*) AS BIGINT) AS n_matches
         FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
         GROUP BY n_name""",
    "j1_left_join_agg" ->
      """SELECT o_orderkey, sum_qty, CAST(coalesce(n_items, 0) AS BIGINT) AS n_items
         FROM orders LEFT JOIN (
           SELECT l_orderkey, sum(l_quantity) AS sum_qty, count(*) AS n_items
           FROM lineitem GROUP BY l_orderkey
         ) ON o_orderkey = l_orderkey""",
    "j2_left_enrich" ->
      """SELECT c_custkey, c_name, n_name
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""",
    "j3_array_lookup" ->
      """SELECT l_orderkey,
                string_agg(s_name, ',' ORDER BY l_linenumber, l_suppkey) AS supplier_names
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY l_orderkey""",
    "j4_qid_year_lookup" ->
      """WITH cust AS (
           SELECT c_custkey,
                  regexp_extract('http://www.wikidata.org/entity/Q' || CAST(c_nationkey AS VARCHAR),
                                 '([^/]+)$', 1) AS qid
           FROM customer),
         years AS (
           SELECT 'Q' || CAST(n_nationkey AS VARCHAR) AS qid,
                  CAST(n_nationkey + 1950 AS BIGINT) AS inception_year
           FROM nation)
         SELECT c_custkey, inception_year FROM cust JOIN years USING (qid)""",
    "j5_theta_or_join" ->
      """SELECT DISTINCT l_orderkey, p_partkey
         FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) l, part
         WHERE p_partkey = l_partkey OR p_partkey = l_suppkey""",
    "j6_broadcast_dims" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "j7_self_join" ->
      """SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key,
                a.n_regionkey AS regionkey
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""",
    "j8_fk_join" ->
      """SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "j9_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)""",
    "j10_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_totalprice > 1000.0 AND o_custkey = c_custkey)""",
    "j11_salted_skew_join" ->
      """WITH fact AS (
           SELECT CASE WHEN l_orderkey % 5 <> 0 THEN 0
                       ELSE l_partkey % 100 END AS k,
                  l_quantity
           FROM lineitem),
         dim AS (
           SELECT p_partkey % 100 AS k, min(p_name) AS dname
           FROM part GROUP BY 1)
         SELECT k, dname, CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty
         FROM fact JOIN dim USING (k) GROUP BY 1, 2""",
    "u1_union_relaxed" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
         UNION ALL
         SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) FROM supplier""",
    "u4_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
         EXCEPT
         SELECT CAST(c_nationkey AS INTEGER) FROM customer"""
  )
}
