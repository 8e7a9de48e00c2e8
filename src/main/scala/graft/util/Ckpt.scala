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
  /** The configured dir we last pinned via `setCheckpointDir` —
    * `SparkContext.getCheckpointDir` returns a random CHILD of the
    * configured path, so it can't be compared against the conf directly.
    * One SparkContext per JVM, so a plain volatile is enough. */
  @volatile private var pinnedDir: String = null

  /** Materialize `df` once and truncate its lineage, in the
    * session-configured mode.
    *
    * `spark.graft.stage.disable=true` makes this a no-op (the frame is
    * recomputed per consumer) — set ONLY by plan-audit tooling
    * ([[graft.PlanBudgetSpec]], `graft.PlanAudit`) so exchanges upstream
    * of a stage boundary stay visible in the executed plan; checkpoint
    * truncation would otherwise hide them from the audit. */
  def stage(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    if (conf.getOption("spark.graft.stage.disable").contains("true")) df
    else conf.getOption("spark.graft.checkpoint.dir") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // (re-)pin whenever the configured dir changes mid-session, not
        // just on first use — otherwise later checkpoints silently land
        // in the stale directory
        if (pinnedDir != dir || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir)
          pinnedDir = dir
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Drop every persisted block in the context: staged checkpoints from
    * [[stage]], plus any `cache()`/`persist()` entries.
    *
    * Staged frames are per-query temporaries — nothing outside the query
    * that built them ever reads them again — but `localCheckpoint` pins
    * their blocks in executor storage memory for the lifetime of the
    * session. A long-lived session running many queries (the bench, the
    * verify dump, a notebook, a query service) therefore accumulates dead
    * blocks without bound: storage eviction churn and GC pressure degrade
    * every later query, and at cluster scale the session eventually OOMs.
    * Callers that consume one query at a time MUST call this between
    * queries, after the result is fully consumed (the staged blocks are
    * the materialization the still-unconsumed frame would read).
    *
    * `blocking = true` waits for block removal before returning — the
    * bench uses it so background cleanup never bleeds into the next
    * query's timed window; throughput callers (Verify) pass false. */
  def release(spark: org.apache.spark.sql.SparkSession, blocking: Boolean = false): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking))
  }
}
