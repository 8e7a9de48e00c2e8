package graft.ops

import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Descriptive-statistics family beyond the univariate moments the engine
  * already ships (q_stats_moments, q_percentiles): bivariate correlation /
  * covariance / least-squares regression, and fixed-width histogram binning.
  *
  * Covers the reference's declared "pandas-comparable local stats" surface
  * (`reqdef.yaml:13,44-45`, SURVEY.md §2a R21) with the distributed
  * formulation: every statistic is derived from decimal-exact power sums
  * (Σx, Σy, Σx², Σy², Σxy), which partial-aggregate map-side, combine
  * order-independently, and reproduce bit-for-bit across engines — the
  * built-in `corr`/`covar_samp` fold doubles in partition order and would
  * not. One shuffle per query, final arithmetic in a codegen'd projection.
  */
object Statistics {

  private def p2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sum((a * b).cast(DecimalType(30, 8))).cast("double")

  /** Pearson r, sample covariance, and OLS slope/intercept of
    * extendedprice ~ quantity per return flag. */
  def corrRegr(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val n = count(lit(1)).cast("double")
    val sx = dsum(x); val sy = dsum(y)
    val sxx = p2(x, x); val syy = p2(y, y); val sxy = p2(x, y)
    val covS = (sxy - sx * sy / n) / (n - lit(1.0))
    val r = (n * sxy - sx * sy) /
      sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        n.cast("long").as("n"),
        round(r, 4).as("corr_qty_price"),
        round(covS, 4).as("covar_samp"),
        round(slope, 4).as("slope"),
        round(icept, 4).as("intercept"))
      .orderBy("l_returnflag")
  }

  /** Fixed-width histogram of extendedprice (width_bucket-style binning by
    * floor division — the binning expression itself is the group key, so the
    * whole histogram is one hash aggregate). */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(floor(col("l_extendedprice") / 5000).cast("int").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("l_extendedprice")), 4).as("lo"),
        round(max(col("l_extendedprice")), 4).as("hi"))
      .orderBy("bucket")

  /** Equi-width bucketing via `width_bucket` (PostgreSQL semantics:
    * `[lo,hi)` split into n equal cells, bucket 0 / n+1 for out-of-range).
    * The fixture's quantities are integral 1..50, so every cell boundary is
    * exact in IEEE double and the oracle's floor-arithmetic emulation
    * (DuckDB ships no width_bucket) lands identically. */
  def widthBucket(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_quantity"), col("l_extendedprice"))
      .withColumn("bucket", expr("width_bucket(l_quantity, 1.0, 51.0, 10)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(dsum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("bucket")

  /** Custom typed-Aggregator UDAF (graft.functions.WeightedAvg): quantity-
    * weighted mean unit price per return flag. Inputs are converted to the
    * integer domain (cents / whole units) at the scan so the custom
    * aggregation is exact and order-independent. */
  def weightedAvgUdaf(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(graft.functions.WeightedAvg,
      org.apache.spark.sql.Encoders.product[graft.functions.WeightedItem])
    Tables.lineitem(s, d)
      .select(
        col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        floor(col("l_quantity")).cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(round(wavg(col("pc"), col("q")), 4).as("w_unit_price"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corr_regr" -> (corrRegr _),
    "q_histogram" -> (histogram _),
    "q_width_bucket" -> (widthBucket _),
    "q_weighted_avg_udaf" -> (weightedAvgUdaf _),
  )

  val oracle: Map[String, String] = Map(
    "q_corr_regr" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS syy,
        |         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |       CAST(n AS BIGINT) AS n,
        |       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS corr_qty_price,
        |       round((sxy - sx * sy / n) / (n - 1.0), 4) AS covar_samp,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
        |FROM s
        |ORDER BY l_returnflag""".stripMargin,
    "q_width_bucket" ->
      """SELECT CAST(floor((l_quantity - 1.0) / 5.0) AS BIGINT) + 1 AS bucket,
        |       count(*) AS n,
        |       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_price
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_weighted_avg_udaf" ->
      """SELECT l_returnflag,
        |       round((SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0)
        |             / SUM(CAST(floor(l_quantity) AS BIGINT)), 4) AS w_unit_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS INTEGER) AS bucket,
        |       count(*) AS n,
        |       round(min(l_extendedprice), 4) AS lo,
        |       round(max(l_extendedprice), 4) AS hi
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
  )
}
