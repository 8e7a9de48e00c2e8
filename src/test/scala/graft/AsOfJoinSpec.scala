package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator must agree with the window formulation and
  * handle the boundary cases explicitly. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("native as-of join equals the tagged-union window formulation") {
    val native = ops.Joins.joinAsofNative(spark, sf).collect().map(_.toSeq)
    val window = ops.Joins.joinAsof(spark, sf).collect().map(_.toSeq)
    assert(native.length === window.length)
    assert(native.sameElements(window))
  }

  test("edge cases: no prior row, exact-timestamp tie, unmatched key") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), // tie with right at 10:00 → inclusive
      (2L, 1L, "2024-01-01 09:00:00"), // before any right row → null
      (3L, 2L, "2024-01-01 12:00:00"), // key with no right rows → null
      (4L, 1L, "2024-01-01 11:30:00")  // between rights → 11:00
    ).toDF("id", "k", "t_str").withColumn("t", to_timestamp(col("t_str")))
    val right = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 11:00:00")
    ).toDF("k", "rt_str").withColumn("rt", to_timestamp(col("rt_str")))

    val out = AsOfJoin.nearestPrior(left.select("id", "k", "t"),
        right.select("k", "rt"), "k", "t", "k", "rt")
      .select(col("id"), date_format(col("asof_t"), "HH:mm").as("asof"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(out === Map(
      1L -> Some("10:00"), 2L -> None, 3L -> None, 4L -> Some("11:00")))
  }

  test("tolerance nulls matches farther than the horizon, keeps the rest") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), // prior at 09:30 → within 1h
      (2L, 1L, "2024-01-01 12:00:00")  // prior at 09:30 → beyond 1h → null
    ).toDF("id", "k", "t_str").withColumn("t", to_timestamp(col("t_str")))
    val right = Seq((1L, "2024-01-01 09:30:00"))
      .toDF("k", "rt_str").withColumn("rt", to_timestamp(col("rt_str")))
    val out = AsOfJoin.nearestPrior(left.select("id", "k", "t"),
        right.select("k", "rt"), "k", "t", "k", "rt",
        toleranceMicros = Some(3600L * 1000 * 1000))
      .select(col("id"), date_format(col("asof_t"), "HH:mm").as("asof"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> Some("09:30"), 2L -> None))
  }
}
