package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Dev-only: per-query physical-plan audit — shuffle exchange count,
  * broadcast count, whole-stage-codegen presence, all from the *final*
  * adaptive plan. The 100 TB sanity check: a query with surprise shuffles
  * shows up here before it shows up on a cluster bill.
  * Usage: PlanAudit [sfDir]
  */
object PlanAudit {

  private[graft] def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case other => other
  }

  /** Collect across AQE stage boundaries (collect() stops at QueryStageExec). */
  private[graft] def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(n: SparkPlan): Unit = if (seen.add(n)) {
      buf += n
      n.children.foreach(go)
      n match { case q: QueryStageExec => go(q.plan); case _ => }
    }
    go(p)
    buf.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // optional args(1..): audit only these query names (default: all)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-22s shuffles broadcasts codegen")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // materialize THIS plan (count() builds a different one) so AQE finalizes
        val all = nodes(finalPlan(df.queryExecution.executedPlan))
        val shuffles = all.count(_.isInstanceOf[ShuffleExchangeLike])
        val bcasts = all.count(_.isInstanceOf[BroadcastExchangeLike])
        val codegen = all.exists(_.isInstanceOf[WholeStageCodegenExec])
        println(f"$name%-22s $shuffles%8d $bcasts%10d $codegen%7b")
      } catch {
        case e: Throwable => println(f"$name%-22s FAILED: ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
