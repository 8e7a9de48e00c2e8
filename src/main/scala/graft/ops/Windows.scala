package graft.ops

import graft.util.Det
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function family (SURVEY.md §2b: q_window_rank, q_window_running,
  * q_window_lag_lead, q_topk_per_group).
  *
  * Not present in the reference (SURVEY.md §2a negative findings); part of
  * the declared Athena-SQL surface (R20) and the pandas-stats comparison
  * (R21). Each query is one shuffle on the partition key + per-partition
  * sort — the minimal plan for windowed analytics at scale. Running sums go
  * through DECIMAL so the frame accumulation is order-exact across engines.
  *
  * Window orderings use `event_id` / `o_orderkey` (unique) rather than raw
  * timestamps: `events.ts` is ns in parquet but µs in Spark, so a ts-only
  * ordering could tie-break differently across engines.
  */
object Windows {

  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .orderBy("o_custkey", "rn")
  }

  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("running",
        sum(col("value").cast(DecimalType(24, 6))).over(w).cast("double"))
      .orderBy("user_id", "event_id")
  }

  def windowLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("prev", lag("value", 1).over(w))
      .withColumn("next", lead("value", 1).over(w))
      .withColumn("delta", col("value") - col("prev"))
      .orderBy("user_id", "event_id")
  }

  /** Top-3 lineitems by extended price per supplier — the window-rank
    * formulation of top-k (no global sort; per-group short-circuit). */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("l_suppkey", "rn")
  }

  /** RANGE frame: per-type sum of all events within 50.0 below the current
    * value. Range frames are defined by value bounds, not row positions, so
    * the result is order-independent even across tied sort keys (what makes
    * this oracle-safe for a double ordering). Expressed via SQL window
    * syntax — the Scala `Window.rangeBetween` API takes long offsets only. */
  def windowRange(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr(
        "event_id", "event_type", "value",
        """CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER (
          |  PARTITION BY event_type ORDER BY value
          |  RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum""".stripMargin)
      .orderBy("event_id")

  /** Distribution / navigation window family: ntile, percent_rank,
    * cume_dist, first/last/nth value. The ORDER BY carries the unique
    * o_orderkey tie-break, so peer groups are singletons and every
    * distribution value is deterministic. */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        Det.q4(percent_rank().over(w)).as("pct_rank"),
        Det.q4(cume_dist().over(w)).as("cdist"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wf).as("last_price"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_key"))
      .orderBy("o_orderkey")
  }

  /** Time-interval RANGE frame: per-user rolling 1-hour event count and
    * value sum — the batch twin of a sliding stream aggregation. Value
    * bounds (not row positions) make it deterministic across ties, and the
    * frame is evaluated in one pass over each key partition. */
  def windowTimeRange(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr(
        "event_id", "user_id", "value",
        """COUNT(*) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour""".stripMargin,
        """CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last_hour""".stripMargin)
      .orderBy("event_id")

  /** IGNORE NULLS navigation: error events null out their measurement, and
    * the window forward-fills the last valid reading (LOCF — the standard
    * sensor/feature-pipeline gap repair) plus the previous valid value.
    * Same one-pass-per-partition execution as any other frame. */
  def windowIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(wf))
      .withColumn("prev_valid", lag(col("v"), 1, null, ignoreNulls = true).over(w))
      .orderBy("event_id")
  }

  /** The same top-3-per-supplier selection as [[topkPerGroup]], through the
    * native bounded-selection operator (`graft.plans.TopKPerGroup`) instead
    * of a window: the shuffle carries at most k rows per (supplier × map
    * partition) rather than the whole table. Same oracle as the window
    * formulation — the operator must be result-invisible. */
  def topkNative(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    graft.plans.TopKPerGroup.topK(base, Seq("l_suppkey"),
      Seq("l_extendedprice" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 3)
      .orderBy("l_suppkey", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_ignore_nulls" -> (windowIgnoreNulls _),
    "q_topk_native"     -> (topkNative _),
    "q_window_rank"     -> (windowRank _),
    "q_window_distribution" -> (windowDistribution _),
    "q_window_time_range" -> (windowTimeRange _),
    "q_window_range"    -> (windowRange _),
    "q_window_running"  -> (windowRunning _),
    "q_window_lag_lead" -> (windowLagLead _),
    "q_topk_per_group"  -> (topkPerGroup _),
  )

  val oracle: Map[String, String] = Map(
    "q_window_ignore_nulls" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events
        |)
        |SELECT user_id, event_id, v,
        |       last_value(v IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |       lag(v, 1 IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY event_id) AS prev_valid
        |FROM e
        |ORDER BY event_id""".stripMargin,
    "q_window_time_range" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
        |)
        |SELECT event_id, user_id, value,
        |       COUNT(*) OVER w AS n_last_hour,
        |       CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_window_distribution" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       floor((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS pct_rank,
        |       floor((cume_dist() OVER w) * 10000 + 0.5) / 10000 AS cdist,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER wf AS last_price,
        |       nth_value(o_orderkey, 2) OVER wf AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       CAST(row_number() OVER w AS INTEGER) AS rn,
        |       CAST(rank() OVER w AS INTEGER) AS rk,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, event_type, value,
        |       CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER (
        |         PARTITION BY event_type ORDER BY value
        |         RANGE BETWEEN 50.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id, value,
        |       CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER (
        |         PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |       lag(value, 1) OVER w AS prev,
        |       lead(value, 1) OVER w AS next,
        |       value - lag(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_topk_native" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |         CAST(row_number() OVER (
        |           PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INTEGER) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |         CAST(row_number() OVER (
        |           PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INTEGER) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
  )
}
