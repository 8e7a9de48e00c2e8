package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan-level claims SCALE.md makes: filters reach the parquet
  * scan, projections prune the read schema, top-k compiles to
  * TakeOrderedAndProject, dimensions broadcast. A regression here is a
  * silent 100 TB cost explosion that correctness tests cannot see. */
class PlanAssertionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  // sparkPlan (pre-AQE wrapping): AdaptiveSparkPlanExec hides its subtree
  // from collect() until execution
  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("filter predicates are pushed to the parquet scan") {
    val scan = scans(ops.Relational.filterPred(spark, sf))
      .find(_.metadata.get("Location").exists(_.contains("lineitem"))).get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,10.0)"), pushed)
    assert(pushed.contains("In(l_returnflag"), pushed)
  }

  test("projection prunes the read schema to referenced columns only") {
    val scan = scans(ops.Relational.scanProject(spark, sf)).head
    val readCols = scan.metadata("ReadSchema")
    assert(readCols.contains("l_orderkey") && readCols.contains("l_discount"))
    // the 11-column table must NOT be read wholesale for a 5-column query
    assert(!readCols.contains("l_shipdate") && !readCols.contains("l_returnflag"),
      readCols)
  }

  test("sort+limit compiles to TakeOrderedAndProject (no global sort)") {
    val plan = ops.Relational.sortLimit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    val plan = ops.Joins.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), plan.take(500))
  }

  test("binned range join plans as an equi join, never a nested loop") {
    val plan = ops.EventTime.joinRangeBinned(spark, sf)
      .queryExecution.sparkPlan.toString
    // the whole point of the binning rewrite: the event×window overlap
    // must meet through hash/merge machinery on the bin key — a
    // BroadcastNestedLoopJoin here means the rewrite silently degraded
    // to the quadratic plan it exists to avoid
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(800))
  }

  test("partition-column filters prune partitions at planning time") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_prune").toString + "/docs"
    graft.sources.Formats.writePartitioned(
      Tables.documents(spark, sf), dir, "lang")
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = scans(pruned).head
    // the predicate must land in partitionFilters (directory-level skip),
    // not dataFilters (row-level evaluation over every file)
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      scan.partitionFilters.toString)
    assert(scan.metadata("PartitionFilters").contains("lang"),
      scan.metadata("PartitionFilters"))
  }

  test("simhash runs as a per-row expression, not a word explode") {
    val plan = ops.Dedup.dedupSimhash(spark, sf).queryExecution.sparkPlan.toString
    assert(!plan.contains("Generate"), plan.take(800))
    assert(plan.contains("simhash16"), plan.take(800))
  }

  test("exact dedup exchanges on the md5 digest, never the document body") {
    // exchanges only exist post-EnsureRequirements: execute, then walk
    // through the adaptive wrapper to the materialized stages
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = ops.Dedup.dedupExact(spark, sf)
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
      def go(n: SparkPlan): Unit = {
        buf += n; n.children.foreach(go)
        n match {
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case q: QueryStageExec => go(q.plan)
          case _ =>
        }
      }
      go(p); buf.toSeq
    }
    val exchanges = allNodes(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.nonEmpty, df.queryExecution.executedPlan.toString.take(500))
    // no exchange (window shuffle or final sort) may ship the body...
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.name == "text"),
        s"exchange ships document bodies: ${e.child.output.map(_.name)}")
    }
    // ...and the window's hash exchange must key on the digest
    assert(exchanges.exists(e =>
      e.outputPartitioning.toString.startsWith("hashpartitioning") &&
        e.outputPartitioning.toString.contains("key")),
      exchanges.map(_.outputPartitioning.toString).mkString("; "))
  }

  test("bloom prejoin filters the fact scan below the join") {
    val plan = ops.ScaleOps.bloomPrejoin(spark, sf).queryExecution.sparkPlan
    // find the join, then assert a might_contain filter exists in its
    // subtree (the prefilter must run BEFORE the shuffle/join, not after)
    val joins = plan.collect {
      case j if j.nodeName.contains("Join") => j
    }
    assert(joins.nonEmpty, plan.toString.take(500))
    val belowJoin = joins.head.children.map(_.toString).mkString
    assert(belowJoin.contains("might_contain"), belowJoin.take(800))
  }
}
