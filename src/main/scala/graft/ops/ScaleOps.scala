package graft.ops

import graft.Tables
import graft.util.Det.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DecimalType}

/** Scale-pattern operators surfaced as queries: the physical-rewrite tricks a
  * 100 TB deployment leans on, each with a logically-identical plain
  * formulation the DuckDB oracle states. The reference's ETL
  * (`infra/scripts/demo-etl-2a-notebook.py:53-56`) has no skew or
  * runtime-filter handling — at its 149k-row scale none is needed; these are
  * the forms its two jobs take once inputs stop fitting a G.1X worker pair.
  *
  * - [[saltedAgg]]: two-phase (salted) aggregation, the skew-proof shape
  *   demonstrated on a 5-key table. For combinable aggregates like the
  *   count/sum here, Spark's partial aggregation already collapses each
  *   map partition to ≤ 5 rows, so the salt is not load-bearing — it
  *   becomes load-bearing when per-key reduce state does NOT collapse
  *   map-side (exact distinct sets, collect_list/percentile state), where
  *   a single hot key's state must be split across reducers and merged in
  *   a second phase. The query pins the pattern and its result-invariance.
  *
  * - [[bloomPrejoin]]: runtime-filter join. The selective dimension's join
  *   keys are sketched into a Bloom filter (driver-side, ~100 KB — the same
  *   broadcast economics as a runtime filter), and the fact side is
  *   pre-filtered through the codegen'd Catalyst
  *   [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  *   predicate *before* the join shuffle. False positives only leak extra
  *   rows into the exact join, so the result is identical to the plain join
  *   — which is what the oracle asserts. This is what
  *   `spark.sql.optimizer.runtime.bloomFilter.enabled` injects automatically
  *   when stats expose the selectivity; the explicit form pins the behavior
  *   independent of stats quality.
  */
object ScaleOps {

  /** Phase-1 salt count. At 100 TB this would be sized to
    * (hot-key bytes / target partition bytes); 16 is plenty for local[32]. */
  private val Salts = 16

  /** Skew-resistant two-phase aggregation over the 5-key `events` table:
    * count + exact value sum per event_type, partials split over 16 salts.
    * The salt is a deterministic function of a unique key (not `rand()`),
    * so retried tasks re-produce identical partials — required for
    * exactly-once semantics under speculative execution. */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), col("value"), pmod(hash(col("event_id")), lit(Salts)).as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(24, 6))).as("pv"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).as("n_events"),
        sum(col("pv")).cast("double").as("total_value"))
      .withColumn("total_value", round(col("total_value"), 4))
      .orderBy("event_type")

  /** `mightContain` over a driver-built key sketch, as a native codegen'd
    * predicate (no UDF): the probe column is evaluated against the
    * serialized filter bytes inlined as a foldable binary literal. */
  private def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expression(key)))

  /** High-value orders (top ~3.5% by totalprice) joined to their lineitems,
    * revenue per order priority. The fact scan is pre-filtered through the
    * dimension-key Bloom sketch so only ~3% of lineitem rows reach the join
    * shuffle; the join itself stays exact. */
  def bloomPrejoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    // capacity sized to the *filtered* dimension (~3.5% of orders), not the
    // table: an oversized sketch just inflates the literal every task
    // deserializes. ~120 KB at fpp 0.01; a real deployment would size from
    // the filter's observed cardinality.
    val bf = dim.stat.bloomFilter("o_orderkey", expectedNumItems = 100000L, fpp = 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(mightContain(bytes, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Join-key skew diagnosis — the report run before sizing a shuffle: the
    * top-10 heaviest o_custkey values on the orders fact, each with its
    * share of the table and its ratio to the mean key load. One partial-
    * aggregating shuffle on the key plus a 10-row global top-k; the numbers
    * decide between AQE skew handling and an explicit salted join. */
  def keySkew(s: SparkSession, d: String): DataFrame = {
    val perKey = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(totals))
      .withColumn("share", round(col("cnt") / col("total"), 6))
      // divide by the mean key load rather than multiplying cnt * n_keys:
      // the integer product can exceed Long range at the very scales this
      // diagnostic exists for (Spark would wrap silently in non-ANSI mode)
      .withColumn("skew",
        round(col("cnt") / (col("total") / col("n_keys").cast("double")), 4))
      .select(col("o_custkey"), col("cnt"), col("share"), col("skew"))
      .orderBy(col("cnt").desc, col("o_custkey").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_salted"    -> (saltedAgg _),
    "q_bloom_prejoin" -> (bloomPrejoin _),
    "q_key_skew"      -> (keySkew _),
  )

  val oracle: Map[String, String] = Map(
    // The salt is physical-only: the logical result is the plain GROUP BY.
    "q_agg_salted" ->
      """SELECT event_type,
        |       count(*) AS n_events,
        |       round(CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE), 4) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_key_skew" ->
      """WITH k AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        |), t AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM k
        |)
        |SELECT o_custkey, cnt,
        |       round(cnt / CAST(total AS DOUBLE), 6) AS share,
        |       round(cnt / (CAST(total AS DOUBLE) / n_keys), 4) AS skew
        |FROM k, t
        |ORDER BY cnt DESC, o_custkey ASC
        |LIMIT 10""".stripMargin,
    // The Bloom prefilter only drops rows the exact join would drop anyway.
    "q_bloom_prejoin" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_items,
        |       round(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 480000.0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
