package graft

import org.apache.spark.sql.DataFrame

/** Plan-lineage truncation for iterative / reused intermediates.
  *
  * Iterative operators (connected components, label propagation) and
  * twice-joined signature tables must cut their logical plan between passes
  * or lineage grows with the iteration count. Two modes:
  *
  *   - default: `localCheckpoint(eager)` — executor-local block storage, no
  *     configuration, fastest. Correct in `local[N]` and on healthy
  *     clusters, but the blocks die with their executor: at the 100 TB /
  *     1000-executor scale an executor loss mid-iteration kills the job.
  *   - `spark.graft.checkpointDir=<path>`: reliable `checkpoint()` to the
  *     configured (HDFS/object-store) directory — survives executor loss,
  *     the cluster-grade mode a production pipeline sets. One conf flag, no
  *     code change.
  *
  * Both are EAGER, so callers can treat the result as materialized (e.g.
  * count it cheaply, join it twice without recompute).
  */
object Lineage {

  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** [[truncate]] + STATS RESET — for frames that feed back into their own
    * computation across many passes. `localCheckpoint`/`checkpoint` cut the
    * logical plan but PRESERVE the source plan's size-in-bytes estimate,
    * and Catalyst's join-stats visitor multiplies child sizes — so a loop
    * that feeds pass k's (truncated) output into pass k+1 compounds the
    * estimate multiplicatively per join, i.e. DOUBLY-exponentially in the
    * pass count. At ~5 joins per pass the estimate is a BigInt of 63·5^k
    * bits by pass k: harmless for the 2–3-factor passes of LPA/CC/PageRank,
    * but a measured multi-minute optimizer hang in BigInteger.multiply by
    * pass ~10 of the refinement fixed point. Re-materializing through an
    * RDD boundary resets the leaf estimate each pass, bounding every
    * pass's internal product at its own handful of factors. Costs one
    * extern/re-encode of the frame — the fixed-point loops apply it to
    * COMMUNITY-sized frames, never the full graph.
    */
  def truncateFresh(df: DataFrame): DataFrame = {
    val cp = truncate(df)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  def truncate(df: DataFrame): DataFrame = {
    if (sys.env.contains("GRAFT_PHASE_DEBUG")) {
      val t0 = System.nanoTime()
      val r  = truncateImpl(df)
      val ph = df.queryExecution.tracker.phases.map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}" }
      println(f"[phase-debug] truncate total=${(System.nanoTime() - t0) / 1e6}%.0f ms  ${ph.mkString(" ")}")
      return r
    }
    truncateImpl(df)
  }

  private def truncateImpl(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirConf) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a per-call UUID subdirectory, so compare
        // against the parent: re-point only when the conf value actually
        // changed (the first-writer-wins pinning the r4 advice flagged).
        val pointsAtDir = sc.getCheckpointDir.exists { current =>
          val parent = new org.apache.hadoop.fs.Path(current).getParent
          parent != null && parent.toString == new org.apache.hadoop.fs.Path(dir).toString
        }
        if (!pointsAtDir) sc.setCheckpointDir(dir)
        // Superseded checkpoints are reclaimed by the ContextCleaner
        // (spark.cleaner.referenceTracking.cleanCheckpoints, set in
        // Engine.builder) once the RDD they back is garbage-collected.
        df.checkpoint()
      case None =>
        df.localCheckpoint(true)
    }
  }
}
