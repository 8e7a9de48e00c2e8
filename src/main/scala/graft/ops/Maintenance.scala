package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: the data-quality gate and the snapshot
  * upsert every production pipeline runs between ingest and training
  * (alongside `sources.Formats.compact`, the small-file compactor).
  *
  * The reference's pipeline has no quality gate and rebuilds its output
  * wholesale per run (`process_tsv.py` reloads the full word_counts table);
  * these are the two operators that change that story at 100 TB — validate
  * before publish, merge instead of rewrite.
  */
object Maintenance {

  /** Data-quality report over orders: one row per check, computed in a
    * single aggregate pass (never one job per check) and reshaped long. A
    * publish gate reads this and fails the run on any non-zero violation. */
  def dqReport(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        count(lit(1)).as("row_count"),
        count_if(col("o_custkey").isNull).as("null_custkey"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
        count_if(col("o_totalprice") <= 0.0).as("nonpositive_price"),
        count_if(col("o_orderdate") > lit("2002-01-01").cast("timestamp")).as("future_orderdate"))
      .unpivot(Array.empty, "metric", "value")
      .orderBy("metric")

  /** +10% in integer cents — round(x*1.1, 2) disagrees across engines on
    * half-cent doubles; floor over exact integer arithmetic never does. */
  private def bump(price: org.apache.spark.sql.Column) =
    floor(round(price * 100) * 11 / 10) / 100.0

  /** SCD-1 upsert: merge an incoming batch into the current snapshot —
    * incoming rows overwrite matching keys, unmatched incoming rows insert,
    * everything else carries over, with a provenance tag. Expressed as one
    * key-partitioned FULL OUTER join (both sides shuffle once on the key),
    * the vanilla-Spark MERGE INTO. The incoming batch is derived
    * deterministically from the fixture: every 'P' order re-priced +10%,
    * plus the same rows re-keyed past the key space as fresh inserts. */
  def upsertSnapshot(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
    val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
    val incoming = p
      .select(col("o_orderkey").as("uk"), bump(col("o_totalprice")).as("uprice"))
      .unionByName(p.select((col("o_orderkey") + 10000000L).as("uk"),
        bump(col("o_totalprice")).as("uprice")))
    base.join(incoming, col("k") === col("uk"), "full")
      .select(
        coalesce(col("k"), col("uk")).as("o_orderkey"),
        coalesce(col("uprice"), col("price")).as("price"),
        when(col("k").isNull, lit("inserted"))
          .when(col("uk").isNull, lit("kept"))
          .otherwise(lit("updated")).as("provenance"))
      .orderBy("o_orderkey")
  }

  /** SCD Type-2 dimension build: the per-customer order-status history
    * compressed to effective-dated versions — consecutive same-status
    * orders collapse, each surviving change opens a version row
    * [valid_from, valid_to) with the successor's start as the close and
    * NULL (is_current=1) on the latest. Two key-partitioned window passes
    * over (custkey | orderdate, orderkey) — one exchange on the customer
    * key, no joins; at 100 TB the change-filter drops most rows BEFORE the
    * second pass materializes version numbers. Validity bounds are emitted
    * as formatted strings so both engines hash identically. */
  def scd2Dim(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val day = (c: org.apache.spark.sql.Column) => date_format(c, "yyyy-MM-dd")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .withColumn("prev", lag("o_orderstatus", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
      .withColumn("valid_to", day(lead("o_orderdate", 1).over(w)))
      .withColumn("version", row_number().over(w))
      .select(col("o_custkey").as("custkey"),
        col("o_orderstatus").as("status"),
        day(col("o_orderdate")).as("valid_from"),
        col("valid_to"), col("version"),
        col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy("custkey", "version")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_report" -> (dqReport _),
    "q_upsert"    -> (upsertSnapshot _),
    "q_scd2_dim"  -> (scd2Dim _),
  )

  val oracle: Map[String, String] = Map(
    "q_dq_report" ->
      """WITH a AS (
        |  SELECT count(*) AS row_count,
        |         count(*) FILTER (WHERE o_custkey IS NULL) AS null_custkey,
        |         count(*) - count(DISTINCT o_orderkey) AS dup_orderkey,
        |         count(*) FILTER (WHERE o_totalprice <= 0.0) AS nonpositive_price,
        |         count(*) FILTER (WHERE o_orderdate > TIMESTAMP '2002-01-01') AS future_orderdate
        |  FROM orders
        |)
        |SELECT 'dup_orderkey' AS metric, dup_orderkey AS value FROM a
        |UNION ALL SELECT 'future_orderdate', future_orderdate FROM a
        |UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM a
        |UNION ALL SELECT 'null_custkey', null_custkey FROM a
        |UNION ALL SELECT 'row_count', row_count FROM a
        |ORDER BY metric""".stripMargin,
    "q_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        |), incoming AS (
        |  SELECT o_orderkey AS uk,
        |         floor(round(o_totalprice * 100) * 11 / 10) / 100.0 AS uprice
        |  FROM orders WHERE o_orderstatus = 'P'
        |  UNION ALL
        |  SELECT o_orderkey + 10000000,
        |         floor(round(o_totalprice * 100) * 11 / 10) / 100.0
        |  FROM orders WHERE o_orderstatus = 'P'
        |)
        |SELECT coalesce(k, uk) AS o_orderkey,
        |       coalesce(uprice, price) AS price,
        |       CASE WHEN k IS NULL THEN 'inserted'
        |            WHEN uk IS NULL THEN 'kept'
        |            ELSE 'updated' END AS provenance
        |FROM base FULL JOIN incoming ON k = uk
        |ORDER BY o_orderkey""".stripMargin,
    "q_scd2_dim" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        |         lag(o_orderstatus) OVER
        |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders
        |), c AS (
        |  SELECT * FROM h WHERE prev IS NULL OR prev <> o_orderstatus
        |)
        |SELECT o_custkey AS custkey, o_orderstatus AS status,
        |       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |       strftime(lead(o_orderdate) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS valid_to,
        |       row_number() OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS version,
        |       CASE WHEN lead(o_orderdate) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
        |         THEN 1 ELSE 0 END AS is_current
        |FROM c
        |ORDER BY custkey, version""".stripMargin,
  )
}
