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

  test("suffix array: distributed prefix doubling matches brute suffix sort") {
    val sfs = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfs).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    // brute: all within-doc suffixes ordered by (token seq, doc_id, pos)
    implicit val ord: Ordering[(Seq[String], Long, Int)] =
      Ordering.Tuple3(Ordering.Implicits.seqOrdering[Seq, String],
        Ordering.Long, Ordering.Int)
    val suffixes = docs.toSeq.flatMap { case (id, ws) =>
      ws.indices.map(p => (ws.drop(p), id, p))
    }.sorted
    // the stride-sampled SA must be exactly the brute order's stride rows
    val got = ops.SuffixOps.suffixArray(spark, sfs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val expect = suffixes.zipWithIndex.collect {
      case ((ws, id, p), i) if i % 250 == 0 =>
        (i.toLong, id, p, ws.take(3).mkString(" "))
    }
    assert(got.toSeq == expect, "SA stride sample diverges from brute sort")
    // repeated positions at L=8 == brute 8-gram repetition set
    val rep8 = suffixes.map(_._1.take(8)).filter(_.length == 8)
      .groupBy(identity).filter(_._2.length >= 2).keySet
    val expectN8 = suffixes.count(s => s._1.length >= 8 && rep8(s._1.take(8)))
    val gotRows = ops.SuffixOps.exactSubstrings(spark, sfs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotRows(8) == expectN8.toLong,
      s"L=8 repeated positions: got ${gotRows(8)}, brute $expectN8")
  }
}
