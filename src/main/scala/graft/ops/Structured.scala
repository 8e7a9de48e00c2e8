package graft.ops

import graft.util.Det
import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-type surface: map construction/lookup, struct build + nested field
  * access, and unpivot (wide→long reshaping).
  *
  * The reference stores its DynamoDB item as a flat map with an attached
  * metadata map (`process_tsv.py:81-87` — `analysis_metadata` dict); this
  * family generalizes that record shape into first-class Spark map/struct
  * columns. Unpivot is the inverse of the pivot the engine already ships —
  * together they round-trip wide and long layouts, a standard feature-table
  * reshaping step in training pipelines.
  *
  * Scale notes: all three are single-shuffle (one groupBy or none) followed
  * by codegen'd projections. Map/struct values stay columnar — no UDFs, no
  * serialization off Tungsten rows. Output columns are scalars (the oracle
  * compare is cell-wise; nested values are surfaced via lookups/concat).
  */
object Structured {

  /** Per-user event-type count map: build with map_from_entries, then read
    * back via element_at / map_keys / size. The map is assembled from a
    * sorted entry list so its iteration order is deterministic. */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(
        col("user_id"),
        size(col("m")).as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("types"))
      .orderBy("user_id")

  /** Nested struct build + dotted-path field access. */
  def structFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        struct(
          col("o_orderstatus").as("status"),
          struct(col("o_orderpriority").as("pri"),
                 col("o_totalprice").as("total")).as("detail")).as("info"))
      .select(
        col("o_orderkey"),
        col("info.status").as("status"),
        col("info.detail.pri").as("pri"),
        Det.q(col("info.detail.total"), 2).as("total"))
      .orderBy("o_orderkey")

  /** Wide aggregate → long (measure, value) rows via Dataset.unpivot —
    * the inverse reshaping of q_pivot. */
  def unpivotMeasures(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .withColumn("value", Det.q4(col("value")))
      .orderBy("l_returnflag", "measure")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_map_funcs"    -> (mapFuncs _),
    "q_struct_funcs" -> (structFuncs _),
    "q_unpivot"      -> (unpivotMeasures _),
    "q_variant_json" -> (variantJson _),
  )

  /** Semi-structured access through Spark's VARIANT type (the open binary
    * JSON encoding, Spark 4): `parse_json` once, then typed `variant_get`
    * path extraction — at scale this beats per-path `get_json_object`
    * re-parsing, the reason engines grew a variant type at all. Missing
    * paths surface as SQL NULL. The oracle states the same paths over
    * DuckDB's JSON reader. */
  def variantJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr(
        "event_id",
        "parse_json(props) AS vj")
      .selectExpr(
        "event_id",
        "variant_get(vj, '$.k', 'bigint') AS k_num",
        "variant_get(vj, '$.k', 'string') AS k_str",
        "variant_get(vj, '$.missing', 'string') AS missing_val")
      .withColumn("k_bucket", col("k_num") % 10)
      .orderBy("event_id")

  val oracle: Map[String, String] = Map(
    "q_variant_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |       json_extract_string(props, '$.k') AS k_str,
        |       json_extract_string(props, '$.missing') AS missing_val,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT user_id,
        |       CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
        |       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_struct_funcs" ->
      """SELECT o_orderkey,
        |       o_orderstatus AS status,
        |       o_orderpriority AS pri,
        |       floor((o_totalprice) * 100 + 0.5) / 100 AS total
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_price,
        |         CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, 'sum_qty' AS measure, floor((sum_qty) * 10000 + 0.5) / 10000 AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', floor((sum_price) * 10000 + 0.5) / 10000 FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', floor((sum_disc) * 10000 + 0.5) / 10000 FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,
  )
}
