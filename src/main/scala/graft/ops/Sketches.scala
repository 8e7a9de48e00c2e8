package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable sketch columns (SURVEY §7.5's deferral; VERDICT round-3
  * item 2): distinct-count state that can be pre-aggregated at a fine
  * grain, stored, and UNIONED later at any coarser grain — the pattern a
  * 100 TB pipeline actually runs (sketch per partition/day at ingest; any
  * later rollup is a cheap union over kilobyte blobs, never a rescan of
  * the raw data). `approx_count_distinct` cannot express this: its HLL++
  * state is consumed inside one aggregation and never materialized.
  *
  * Built on Spark's native Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, SPARK-16484
  * family) rather than a hand-rolled typed Aggregator — preference order
  * (a): the built-ins are codegen'd Catalyst expressions, the binary
  * column is a standard DataSketches blob readable by any DataSketches
  * binding (Java/C++/Python), and union is register-wise max — exactly the
  * mergeable-state contract. HLL state is order- and partition-
  * independent, so estimates are deterministic across runs and cluster
  * layouts (asserted by [[SketchSpec]]).
  *
  * No DuckDB oracle by design: DuckDB's approx_distinct uses a different
  * sketch; correctness is a ±5% tolerance against exact distinct counts
  * plus the merge law `est(union(sk(A), sk(B))) = est(sk(A ∪ B))`
  * (exact sketch-state equality, not approximate — both asserted in
  * [[SketchSpec]]).
  */
object Sketches {

  /** Per-day HLL sketches of the ordering customer set, rolled up to
    * month by sketch UNION — never re-reading orders. Emits, per month:
    * the number of daily sketches merged, the unioned estimate, the sum
    * of the daily estimates (which OVERCOUNTS repeat customers — the
    * error the mergeable sketch exists to avoid), and the exact distinct
    * count for reference. At 100 TB the `daily` aggregate is the only
    * pass over the fact table; the rollup shuffles one ~KB blob per day. */
  def sketchUnion(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(
        hll_sketch_agg(col("o_custkey"), 12).as("sk"),
        countDistinct(col("o_custkey")).as("exact_day"))
    daily
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"),
        sum(col("exact_day")).as("sum_daily"))
      .orderBy("month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_union" -> (sketchUnion _),
  )

  // rows-only driver check by design (see object doc) — tolerance +
  // merge-law tests live in SketchSpec
  val oracle: Map[String, String] = Map.empty
}
