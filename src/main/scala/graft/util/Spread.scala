package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-side parallelism for CPU-dense per-row pipelines (md5 ladders,
  * vector dot products, n-gram/posexplode expansions, media decoders).
  *
  * Why it exists: a parquet scan parallelizes at ROW-GROUP granularity,
  * so a single-row-group file (the fixture layout at every SF — and any
  * real-world compacted small table) yields a one-task scan stage, and
  * every expression fused into that stage runs on one core no matter how
  * many the session has. AQE cannot help: its partition coalescing is
  * sized by shuffle BYTES (`coalescePartitions.minPartitionSize`), so a
  * byte-light/CPU-heavy frame gets squeezed back to one task even after
  * a keyed shuffle. This is guide-§2.5's "unsplittable input" case: the
  * fix is a deterministic hash repartition right after the read.
  *
  * Scale discipline:
  *  - The partition count is `sparkContext.defaultParallelism` — the
  *    session's real core budget (local[N] ⇒ N; cluster ⇒ total executor
  *    cores), never a constant tuned to one box.
  *  - The repartition is EXPLICIT-N (`REPARTITION_BY_NUM`), which AQE is
  *    contractually not allowed to coalesce — an implicit
  *    `repartition(col)` would be folded back to one partition by the
  *    byte-sized heuristic exactly where this helper is needed.
  *  - It is CONDITIONAL: when the input already carries at least the
  *    session's parallelism (any multi-row-group/multi-file table — the
  *    100 TB case, where scans are wide and an extra full-table exchange
  *    would be pure waste), it is an identity and adds no exchange.
  *  - Keys are required (hash partitioning): a keyless round-robin
  *    repartition pays a per-task sort (`sortBeforeRepartition`) and is
  *    retry-unsafe on nondeterministic input; a hash on the row key is
  *    deterministic under retries at any scale.
  */
object Spread {
  def apply(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "Spread needs a deterministic partitioning key")
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the (narrow, scan-level) frame without
    // running a job; callers hand the raw scan+project, never a joined
    // subtree, so this stays O(file listing)
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}
