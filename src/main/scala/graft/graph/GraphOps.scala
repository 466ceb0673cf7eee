package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vertex/edge DataFrame operators — the Spark-native form of the reference's
  * property-graph layer (Neo4j node/edge ingestion,
  * defs/assets/ingest_graph_db.py:126-296; igraph analytic graph,
  * utils/neo4j_helpers.py:196-234). A graph here is just two DataFrames:
  * vertices `(id, …attrs)` and edges `(src, dst, rel)` — Parquet-friendly,
  * partition-parallel, no driver materialization.
  *
  * Scale notes (100 TB):
  *   - [[validEdges]] is two LEFT SEMI joins against the vertex id set —
  *     exactly the reference's "edge endpoints must exist" filter
  *     (neo4j_helpers.py:215-223) with no collected id map. Semi joins
  *     shuffle only the join keys and short-circuit per match; with a dim
  *     vertex table Catalyst broadcasts it.
  *   - [[degrees]] is one union + one hash aggregate — map-side partial
  *     aggregation keeps the shuffle at one row per (vertex, partition).
  *   - [[connectedComponents]] is iterative min-label propagation (the
  *     standard distributed CC; Leiden/Louvain's coarse first pass). Each
  *     pass is one equi-join + one aggregate; `localCheckpoint` truncates
  *     the plan between passes so lineage doesn't grow with iterations —
  *     the driver only ever sees a convergence count, never the graph.
  */
object GraphOps {

  /** Keep edges whose src AND dst both exist in `vertexIds` (a single-column
    * `id` DataFrame) — two semi-joins, never a collected id set.
    */
  def validEdges(edges: DataFrame, vertexSrcIds: DataFrame, vertexDstIds: DataFrame): DataFrame =
    edges
      .join(vertexSrcIds.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(vertexDstIds.select(col("id").as("dst")), Seq("dst"), "left_semi")

  /** Per-vertex degree over an undirected view of the edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges
      .select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("degree"))

  /** Synchronous label propagation (fixed iteration count, fully
    * deterministic): label₀(v) = v; each pass every vertex adopts the most
    * frequent label among its neighbors, ties broken by the smallest label;
    * isolated vertices keep theirs. The deterministic community baseline
    * one step up from connected components (async LPA — and seeded Leiden,
    * reference utils/neo4j_helpers.py:237-268 — are not run-reproducible
    * across engines; SURVEY §7.4 declares this substitution).
    *
    * Per pass: one equi-join + one count aggregate + one top-1 window +
    * one left join — all key-partitioned, `localCheckpoint` truncating
    * lineage between passes.
    */
  def labelPropagation(vertexIds: DataFrame, edges: DataFrame, iterations: Int): DataFrame = {
    val sym = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels =
      vertexIds.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val neigh = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("lbl"))
      val cnt = neigh.groupBy(col("id"), col("lbl")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("c").desc, col("lbl").asc)
      val picked = cnt
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("lbl").as("new_lbl"))
      labels = labels
        .join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Connected components by min-label propagation: every vertex starts
    * labelled with its own id; each pass every vertex takes the min label in
    * its closed neighborhood; converged when no label changes. Returns
    * `(id, component)` with component = min vertex id of the component.
    *
    * The reference collects its (small) graph to the driver for igraph/Leiden
    * (neo4j_helpers.py:196-268); this is the distributed form that holds at
    * 100 TB — per-pass cost is one shuffle join + one aggregate.
    */
  def connectedComponents(vertexIds: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels =
      vertexIds.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var iter      = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym
        .join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels
        .unionByName(msgs)
        .groupBy("id")
        .agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val changed = next
        .as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
