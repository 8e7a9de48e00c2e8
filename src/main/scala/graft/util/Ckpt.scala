package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization / lineage-truncation for iterative and multi-branch
  * plans (VERDICT round-3 item 6).
  *
  * Default mode is `localCheckpoint(eager = true)`: blocks cached on the
  * executors, no durable copy — the right trade on a healthy cluster and
  * in local mode, but the truncated lineage means executor loss cannot be
  * recomputed; at 1000-executor scale a lost executor then fails the job.
  *
  * Reliable mode — opt in by setting `spark.graft.checkpoint.dir` to a
  * durable path (HDFS/S3 on a cluster) — writes a reliable `checkpoint`
  * instead: executor loss replays from the checkpoint files. The first
  * staged frame pins the SparkContext's checkpoint dir; both modes
  * produce bit-identical frames ([[CheckpointModeSpec]]), reliable mode
  * just pays a durable write per stage for fault tolerance.
  */
object Ckpt {
  /** Materialize `df` once and truncate its lineage, in the
    * session-configured mode. */
  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.checkpoint.dir") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
}
