package graft

import graft.plans.{RewriteTopKWindow, TopKPerGroupPlan, TopKPerGroupStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** The row_number()-top-k rewrite rule: fires on the exact idiom, stays
  * away from everything else, and the rewritten plan computes the same
  * result through the bounded operator. */
class RewriteTopKWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  private def windowTopK(cond: org.apache.spark.sql.Column): DataFrame = {
    val w = W.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(cond)
  }

  private def hasTopK(p: LogicalPlan): Boolean =
    p.collect { case t: TopKPerGroupPlan => t }.nonEmpty

  test("rewrites rn <= k and computes the window-identical result") {
    val df = windowTopK(col("rn") <= 3)
    val rewritten = RewriteTopKWindow(df.queryExecution.analyzed)
    assert(hasTopK(rewritten), s"rule did not fire:\n$rewritten")
    assert(rewritten.collect { case w: Window => w }.isEmpty, "window survived the rewrite")
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val native = Bridge.ofRows(spark, rewritten)
      .orderBy("l_suppkey", "rn").collect().toSeq.map(_.toSeq)
    val window = df.orderBy("l_suppkey", "rn").collect().toSeq.map(_.toSeq)
    assert(native == window)
  }

  test("rn < k and rn = 1 map to bounds k-1 and 1") {
    val lt = RewriteTopKWindow(windowTopK(col("rn") < 3).queryExecution.analyzed)
    assert(lt.collect { case t: TopKPerGroupPlan => t.k } == Seq(2))
    val eq = RewriteTopKWindow(windowTopK(col("rn") === 1).queryExecution.analyzed)
    assert(eq.collect { case t: TopKPerGroupPlan => t.k } == Seq(1))
  }

  test("does not fire on rank() or compound predicates; computed keys are fine") {
    val w = W.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc)
    val base = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
    val rankDf = base.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(!hasTopK(RewriteTopKWindow(rankDf.queryExecution.analyzed)))

    // a computed partition key is materialized by the analyzer as a project
    // column below the window (_w0), so the spec's attribute-only guard
    // still holds and the rewrite remains semantics-preserving
    val computed = base
      .withColumn("rn", row_number().over(
        W.partitionBy(pmod(col("l_suppkey"), lit(7))).orderBy(col("l_extendedprice").desc)))
      .filter(col("rn") <= 3)
    assert(hasTopK(RewriteTopKWindow(computed.queryExecution.analyzed)))

    val compound = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("l_orderkey") > 10)
    assert(!hasTopK(RewriteTopKWindow(compound.queryExecution.analyzed)))
  }

  test("is idempotent") {
    val once = RewriteTopKWindow(windowTopK(col("rn") <= 3).queryExecution.analyzed)
    val twice = RewriteTopKWindow(once)
    assert(once == twice)
  }
}
