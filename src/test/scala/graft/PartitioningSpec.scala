package graft

import java.nio.file.Files

import graft.ops.Partitioning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting and bucketing change plans, not results — assert both halves. */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("saltedJoin equals the plain join") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey").as("k"), col("o_orderkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("k"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    val salted = Partitioning.saltedJoin(orders, cust, "k", salts = 4)
      .select(plain.headOption.map(_ => col("k")).getOrElse(col("k")),
        col("o_orderkey"), col("o_totalprice"), col("c_mktsegment"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(salted.sameElements(plain))
  }

  test("bucketed join has no exchange on either side") {
    val base = Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    Partitioning.writeBucketed(orders, "b_orders", s"$base/o", "o_custkey", 8)
    Partitioning.writeBucketed(cust, "b_cust", s"$base/c", "o_custkey", 8)

    // force the sort-merge path (at fixture scale the planner prefers
    // broadcast, which hides the bucketing) and assert no shuffle exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Partitioning.bucketedJoin(spark, "b_orders", "b_cust", "o_custkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"), s"expected sort-merge join:\n$physical")
      assert(!physical.contains("ShuffleExchange") && !physical.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$physical")
      assert(joined.count() === orders.count()) // every order has a customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout + dim filter triggers dynamic partition pruning") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_dpp").toString
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    Partitioning.writePartitioned(events, s"$base/events", "event_type")
    // dim: (event_type, is_conversion) — the filter is on the NON-key
    // attribute, so only the join can reveal which partitions survive.
    // The dim must be a real datasource: a LocalRelation would be
    // constant-folded, erasing the Filter node DPP's selectivity
    // heuristic looks for on the build side
    // (attr = literal, not a bare boolean attribute — PartitionPruning's
    // isLikelySelective recognizes comparisons, not lone attributes)
    Seq(("click", 0), ("view", 0), ("purchase", 1),
      ("signup", 1), ("error", 0)).toDF("event_type", "is_conversion")
      .write.mode("overwrite").parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim").filter(col("is_conversion") === 1)
    val joined = Partitioning.dppJoin(spark, s"$base/events", dim, "event_type")
    joined.collect() // materialize so the adaptive plan finalizes
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in fact scan:\n${physical.take(2000)}")
    // result equality with the unpartitioned formulation
    val expected = events.join(dim, "event_type").count()
    assert(joined.count() === expected)
  }
}
