package graft

import graft.plans.{TopKPerGroup, TopKPerGroupFinalExec, TopKPerGroupPartialExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded top-k operator: result-identical to the window
  * formulation, planned as partial → shuffle → final, and deterministic
  * across partition counts. */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def go(n: SparkPlan): Unit = {
      buf += n
      n.children.foreach(go)
      n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec => go(q.plan)
        case _ =>
      }
    }
    go(p)
    buf.toSeq
  }

  test("native top-k equals the window formulation cell-for-cell") {
    val native = ops.Windows.topkNative(spark, sf).collect().toSeq.map(_.toSeq)
    val window = ops.Windows.topkPerGroup(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
      .collect().toSeq.map(_.toSeq)
    assert(native == window)
  }

  test("plans as partial selection, then a shuffle, then final selection") {
    val df = ops.Windows.topkNative(spark, sf)
    df.collect() // finalize adaptive stages (count() would plan a separate query)
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[TopKPerGroupPartialExec]), "no partial node")
    assert(nodes.exists(_.isInstanceOf[TopKPerGroupFinalExec]), "no final node")
    val finalNode = nodes.collectFirst { case f: TopKPerGroupFinalExec => f }.get
    assert(allNodes(finalNode).exists(_.isInstanceOf[ShuffleExchangeLike]),
      "no shuffle between partial and final")
  }

  test("partial pass bounds what the shuffle carries") {
    // the partial operator's output is at most k rows per (group × input
    // partition) — read off its numOutputRows metric after execution
    val base = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val df = TopKPerGroup.topK(base, Seq("l_suppkey"),
      Seq("l_extendedprice" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 3)
    df.collect() // execute THIS plan (count() would build a separate one)
    val nodes = allNodes(df.queryExecution.executedPlan)
    val partial = nodes.collectFirst { case p: TopKPerGroupPartialExec => p }.get
    val partialRows = partial.metrics("numOutputRows").value
    val total = base.count()
    val nGroups = base.select("l_suppkey").distinct().count()
    assert(partialRows > 0)
    assert(partialRows <= 3L * nGroups * 32)
    assert(partialRows < total, s"partial pass did not reduce ($partialRows of $total)")
  }

  test("result is independent of input partitioning") {
    def run(parts: Int): Seq[Seq[Any]] = {
      val base = Tables.lineitem(spark, sf)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .repartition(parts)
      TopKPerGroup.topK(base, Seq("l_suppkey"),
        Seq("l_extendedprice" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 3)
        .orderBy("l_suppkey", "rn").collect().toSeq.map(_.toSeq)
    }
    assert(run(2) == run(17))
  }

  test("k larger than any group returns whole groups, ranked") {
    val base = Tables.supplier(spark, sf).select(col("s_nationkey"), col("s_suppkey"))
    val df = TopKPerGroup.topK(base, Seq("s_nationkey"), Seq("s_suppkey" -> false), 1000)
    assert(df.count() == base.count())
    val perGroup = df.groupBy("s_nationkey").agg(max("rn").as("mx"), count(lit(1)).as("n"))
    assert(perGroup.filter(col("mx") =!= col("n")).count() == 0)
  }

  test("null group keys and null order values match the window formulation") {
    // synthesize nulls: error events lose their value, odd users lose their id
    val base = Tables.events(spark, sf)
      .select(
        when(col("user_id") % 2 === 1, lit(null)).otherwise(col("user_id")).as("g"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"),
        col("event_id"))
    val native = TopKPerGroup.topK(base, Seq("g"), Seq("v" -> true, "event_id" -> false), 2)
      .orderBy(col("g").asc_nulls_first, col("rn"))
      .collect().toSeq.map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("event_id").asc)
    val window = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy(col("g").asc_nulls_first, col("rn"))
      .collect().toSeq.map(_.toSeq)
    assert(native == window)
  }

  test("empty input yields an empty result") {
    val base = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .filter(col("l_extendedprice") < -1)
    val df = TopKPerGroup.topK(base, Seq("l_suppkey"), Seq("l_extendedprice" -> true), 3)
    assert(df.count() == 0)
  }

  test("float/double group keys are rejected (raw-binary grouping skips float normalization)") {
    val base = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_orderkey"))
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup.topK(base, Seq("l_extendedprice"), Seq("l_orderkey" -> false), 2)
    }
    assert(e.getMessage.contains("float/double"))
    val nested = base.select(struct(col("l_extendedprice")).as("s"), col("l_orderkey"))
    assert(intercept[IllegalArgumentException] {
      TopKPerGroup.topK(nested, Seq("s"), Seq("l_orderkey" -> false), 2)
    }.getMessage.contains("float/double"))
  }

  test("ambiguous column names are rejected instead of silently resolving") {
    val a = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
    val b = Tables.nation(spark, sf).select(col("n_nationkey").as("k2"), col("n_name"))
    val joined = a.join(b, col("n_nationkey") === col("k2")) // two n_name columns
    val e = intercept[RuntimeException] {
      TopKPerGroup.topK(joined, Seq("n_name"), Seq("n_nationkey" -> false), 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("partial-group cap: 1M distinct groups pass through bounded state, result exact") {
    // every row its own group (worst case for the heap map) with the cap
    // forced tiny: partial state holds <= 512 heaps, everything else
    // streams through unpruned, and the final stage still ranks exactly
    val s = spark
    s.conf.set("spark.graft.topk.maxPartialGroups", "512")
    try {
      val base = s.range(1000000L).toDF("g")
        .withColumn("v", (col("g") * 7919) % 1000003)
      val out = TopKPerGroup.topK(base, Seq("g"), Seq("v" -> false), 1)
      assert(out.count() === 1000000L)
      assert(out.filter(col("rn") =!= 1).count() === 0)
    } finally s.conf.unset("spark.graft.topk.maxPartialGroups")
  }

  test("capped and uncapped runs produce identical results") {
    val s = spark
    val base = Tables.lineitem(s, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    def run(): Seq[Seq[Any]] =
      TopKPerGroup.topK(base, Seq("l_suppkey"),
        Seq("l_extendedprice" -> true, "l_orderkey" -> false, "l_linenumber" -> false), 3)
        .orderBy("l_suppkey", "rn").collect().toSeq.map(_.toSeq)
    val uncapped = run()
    s.conf.set("spark.graft.topk.maxPartialGroups", "1")
    val capped = try run() finally s.conf.unset("spark.graft.topk.maxPartialGroups")
    assert(capped == uncapped)
  }
}
