package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistics family: decimal-power-sum formulations must agree with Spark's
  * built-in estimators to float tolerance, and derived structure must hold. */
class StatisticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("power-sum corr/covar match built-in corr/covar_samp to 1e-3") {
    val ours = ops.Statistics.corrRegr(spark, sf)
      .select("l_returnflag", "corr_qty_price", "covar_samp").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (k, (c, cv)) =>
      assert(math.abs(c - builtin(k)._1) < 1e-3, s"corr $k")
      assert(math.abs(cv - builtin(k)._2) / math.abs(builtin(k)._2) < 1e-3, s"covar $k")
    }
  }

  test("histogram buckets partition the table and bounds nest in bucket range") {
    val total = Tables.lineitem(spark, sf).count()
    val h = ops.Statistics.histogram(spark, sf).collect()
    assert(h.map(_.getLong(1)).sum === total)
    h.foreach { r =>
      val b = r.getInt(0); val lo = r.getDouble(2); val hi = r.getDouble(3)
      assert(lo >= b * 5000.0 && hi < (b + 1) * 5000.0 && lo <= hi)
    }
  }

  test("UDAF weighted mean matches the expression-level formulation") {
    val udafRes = ops.Statistics.weightedAvgUdaf(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exprRes = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        floor(col("l_quantity")).cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(round((sum("pc") / 100.0) / sum("q"), 4).as("w")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(udafRes === exprRes)
  }

  test("hash sample is deterministic and near the 1a/100 fraction") {
    val a = ops.Relational.hashSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = ops.Relational.hashSample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    val total = Tables.orders(spark, sf).count().toDouble
    val frac = a.size / total
    assert(frac > 0.05 && frac < 0.16, s"fraction $frac")
  }
}
