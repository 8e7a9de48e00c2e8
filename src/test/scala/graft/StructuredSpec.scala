package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-type family: map lookup consistency, struct field integrity, and
  * pivot/unpivot round-trip shape. */
class StructuredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("map lookups reconcile with direct conditional counts") {
    val viaMap = ops.Structured.mapFuncs(spark, sf)
      .select(col("user_id"), col("clicks")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "click", 1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMap === direct)
  }

  test("n_types equals the length of the types csv") {
    val bad = ops.Structured.mapFuncs(spark, sf)
      .filter(size(split(col("types"), ",")) =!= col("n_types"))
    assert(bad.count() === 0)
  }

  test("struct field access preserves source values") {
    val out = ops.Structured.structFuncs(spark, sf)
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_orderpriority").as("pri"), round(col("o_totalprice"), 2).as("total"))
    assert(out.exceptAll(src).count() === 0)
    assert(src.exceptAll(out).count() === 0)
  }

  test("unpivot yields 3 measures per returnflag group") {
    val out = ops.Structured.unpivotMeasures(spark, sf)
    val perFlag = out.groupBy("l_returnflag").count().collect()
    assert(perFlag.nonEmpty)
    assert(perFlag.forall(_.getLong(1) === 3L))
  }
}
