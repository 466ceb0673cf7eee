package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps

/** Unit tests for the graph operators on tiny in-memory graphs. */
class GraphOpsSpec extends AnyFunSuite with SparkTestBase {

  test("connectedComponents labels each component with its min vertex id") {
    import spark.implicits._
    // two chains {1-2-3-4} and {10-11}, one isolate {20}
    val edges    = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val got = GraphOps
      .connectedComponents(vertices, edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents is identical under reliable-checkpoint mode") {
    import spark.implicits._
    val edges    = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val expected =
      GraphOps.connectedComponents(vertices, edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_chk").toString
    spark.conf.set(graft.Lineage.CheckpointDirConf, dir)
    try {
      val got = GraphOps
        .connectedComponents(vertices, edges)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected)
      // reliable mode actually wrote checkpoint data to the configured dir
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally spark.conf.unset(graft.Lineage.CheckpointDirConf)
  }

  test("validEdges drops edges with a missing endpoint") {
    import spark.implicits._
    val edges = Seq((1L, 100L, "R"), (1L, 999L, "R"), (7L, 100L, "R"))
      .toDF("src", "dst", "rel")
    val srcIds = Seq(1L, 2L).toDF("id")
    val dstIds = Seq(100L, 101L).toDF("id")
    val got = GraphOps
      .validEdges(edges, srcIds, dstIds)
      .select("src", "dst")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 100L)))
  }

  test("degrees counts both endpoints of every edge") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val got = GraphOps
      .degrees(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
