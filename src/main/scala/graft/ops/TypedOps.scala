package graft.ops

import graft.util.Det
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` operators (SURVEY.md §1.3: case-class/tuple Encoders
  * where type safety helps). The reference's Job B re-reads the upstream
  * aggregate and casts/validates each record per row as it loads
  * (`infra/scripts/process_tsv.py:62-87`); generalized here to a
  * two-source consistency audit. The query surface is the co-grouped
  * reconciliation pass — `KeyValueGroupedDataset.cogroup`, the typed
  * operator with no single-DataFrame equivalent: both inputs hash-cluster
  * on the key and each key's two row groups meet exactly once, the shape a
  * two-source consistency audit wants at any scale (one co-partitioned
  * shuffle, no join row explosion, streaming per-key state).
  *
  * Cross-engine determinism inside the typed lambda follows the same rules
  * as the SQL surface (`graft.util.Det`): per-item products stay IEEE
  * doubles, accumulation goes through scale-6 HALF_UP decimals (the exact
  * arithmetic Spark's `CAST(double AS DECIMAL(24,6))` and DuckDB's cast
  * both perform), and the final rounding is `BigDecimal.valueOf(_).
  * setScale(4, HALF_UP)` — bit-identical to both engines' `round(x, 4)`
  * on the non-negative values here.
  */
object TypedOps {

  /** Per-order reconciliation of the order header against its lineitems:
    * item count and decimal-exact discounted revenue, emitted from one
    * cogroup pass. Orders with no lineitems surface with zero items — the
    * oracle's LEFT JOIN + coalesce. */
  def cogroupReconcile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)]
    val out = orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
      (key, os, ls) =>
        val header = os.toSeq
        if (header.isEmpty) Iterator.empty // orphan lineitems: none in the fixture
        else {
          var n = 0L
          var rev = JBigDecimal.ZERO
          ls.foreach { case (_, price, disc) =>
            n += 1
            // product in IEEE double first (what both engines' SQL does),
            // THEN the exact-decimal accumulation. valueOf (shortest decimal
            // repr) is the conversion Spark's CAST(double AS DECIMAL) and
            // DuckDB's cast perform — new BigDecimal(double) would take the
            // exact binary expansion and can round differently at scale 6
            rev = rev.add(JBigDecimal.valueOf(price * (1.0 - disc))
              .setScale(6, RoundingMode.HALF_UP))
          }
          val revenue = JBigDecimal.valueOf(rev.doubleValue())
            .setScale(4, RoundingMode.HALF_UP).doubleValue()
          Iterator((key, header.head._2, n, revenue))
        }
    }
    out.toDF("o_orderkey", "o_totalprice", "n_items", "revenue")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cogroup_reconcile" -> (cogroupReconcile _),
  )

  val oracle: Map[String, String] = Map(
    "q_cogroup_reconcile" ->
      """SELECT o_orderkey, o_totalprice,
        |       count(l_orderkey) AS n_items,
        |       floor((CAST(coalesce(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))), 0) AS DOUBLE)) * 10000 + 0.5) / 10000 AS revenue
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
  )
}
