package graft

import graft.functions.VectorExpressions
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 invariants: the codegen'd [[graft.functions.MaxSimScore]]
  * expression is BIT-EQUAL to the interpreted HOF formulation it replaced
  * (the [[graft.functions.FloatVectorDot]] discipline — swapping the
  * implementation changes plans, not results), and the two-phase
  * bucketed-rank `q_epoch_order` matches a brute-force position replay.
  */
class Round11OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.01"

  test("MaxSimScore codegen is bit-equal to the interpreted HOF reference") {
    // the maxsimFeatures front end, rebuilt from public pieces: 8 sub-norms
    val subNorms = expr(
      """transform(sequence(0, 7), i ->
        |  sqrt(aggregate(slice(v, i * 8 + 1, 8), CAST(0.0 AS DOUBLE),
        |    (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin)
    val n = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("sn", subNorms)
    val q = n.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("sn").as("qsn"))
    val pairs = n.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
    val diff = pairs
      .select(
        VectorExpressions.maxsimScore(
          col("qv"), col("qsn"), col("v"), col("sn"), 8, 8).as("cg"),
        Similarity.maxsimScoreExpr.as("ref"))
      // bit equality, not tolerance: both sides quantize before summing,
      // so any ulp drift in the compiled loop would surface here
      .filter(col("cg") =!= col("ref"))
      .count()
    assert(diff == 0L, s"$diff pairs diverge between codegen and interpreted")
  }

  test("MaxSimScore stays inside WholeStageCodegen (no CodegenFallback)") {
    // production shape: sn is computed below a join boundary (in maxsim,
    // behind a checkpoint stage), the score projection sits ABOVE it — the
    // interpreted-HOF sn projection must not drag the scorer out of
    // codegen (HOFs are CodegenFallback, which bars their whole Project)
    val n = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("sn", expr(
        """transform(sequence(0, 7), i ->
          |  sqrt(aggregate(slice(v, i * 8 + 1, 8), CAST(0.0 AS DOUBLE),
          |    (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin))
    val q = n.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("sn").as("qsn"))
    val df = n.join(broadcast(q), col("vec_id") === col("qid"))
      .select(VectorExpressions.maxsimScore(
        col("qv"), col("qsn"), col("v"), col("sn"), 8, 8).as("s"))
    // the self-MaxSim of any vector with all-positive sub-norms is 8
    // (each sub-vector's best match is itself at cosine 1.0)
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => math.abs(v - 8.0) < 1e-9))
    // inspect the FINAL adaptive plan (pre-execution it is still logical)
    val planned = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE wraps stages as leaf QueryStageExec nodes, so assert on the
    // rendered plan: `*(n) Project [maxsimscore…]` is the WholeStageCodegen
    // marker on the scoring projection
    val rendered = planned.toString
    assert("""\*\(\d+\) Project \[maxsimscore""".r.findFirstIn(rendered).nonEmpty,
      s"MaxSimScore projection not in any WholeStageCodegen span:\n$rendered")
  }

  test("epochOrder ranks without a quadratic broadcast-nested-loop join") {
    // VERDICT r10 item 2: the old sample-position count broadcast O(n)
    // rows and compared O(n²/97) pairs per epoch; the two-phase bucketed
    // rank must plan as aggregates + a bucketed window + ONE bounded
    // offset broadcast — never a BroadcastNestedLoopJoin
    val df = graft.ops.TrainingPrep.epochOrder(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // brute replay on one epoch: global 1-based rank of each sampled
    // doc under the (md5 key, doc_id) total order
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    def h(e: Int, id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"ep$e:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val keyed = ids.map(id => (h(0, id), id)).sortBy(identity)
    val expect = keyed.zipWithIndex
      .collect { case ((_, id), i) if id % 97 == 0 => id -> (i + 1L) }.toMap
    val got = rows.filter(_.getInt(0) == 0)
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == expect, "epoch-0 sampled positions diverge from brute rank")
  }
}
