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

  def truncate(df: DataFrame): DataFrame = {
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
