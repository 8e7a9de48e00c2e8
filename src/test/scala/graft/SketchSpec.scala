package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketch column (ops.Sketches): the merge law and the
  * accuracy tolerance that replace a DuckDB oracle (different sketch
  * implementations cannot hash-match; the LAWS are the correctness
  * contract — VERDICT round-3 item 2). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("merge law: union of per-half sketches == sketch of the whole, exactly") {
    // split orders into two arbitrary halves; HLL state is register-wise
    // max, so building per-half and unioning must equal building once —
    // as sketch BYTES (after union normalization), not just as estimates
    val o = Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderkey"))
    val half = o.withColumn("h", (col("o_orderkey") % 2).cast("int"))
    val merged = half.groupBy("h").agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val whole = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), 12)).as("est"))
      .head().getLong(0)
    assert(merged === whole,
      s"union-of-parts estimate $merged != whole-set estimate $whole")
  }

  test("union estimates EQUAL exact distinct counts in the theta exact regime") {
    // round 11: sketchUnion moved from HLL to theta precisely because
    // theta's exact mode has no coupon-collision correction — below the
    // nominal entry count the union estimate is the exact count, not a
    // ±5% neighbor (the measured HLL counterexample: exact+1 at 16k
    // coupons per month in the sf1 sweep)
    val rows = ops.Sketches.sketchUnion(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val m = r.getString(r.fieldIndex("month"))
      val est = r.getLong(r.fieldIndex("est_union"))
      val ex = exact(m)
      assert(est == ex, s"month $m: est $est != exact $ex (exact regime)")
      // sum of daily exacts can only overcount the monthly distinct
      assert(r.getLong(r.fieldIndex("sum_daily")) >= ex)
    }
  }

  test("sketch union estimate is deterministic across partitionings") {
    val a = ops.Sketches.sketchUnion(spark, sf).collect().toSeq
    val b = ops.Sketches.sketchUnion(
      spark.newSession(), sf).collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }

  // ------------------------------------------------ KLL quantile sketches

  test("KLL: calendar-bounded rollup is exact inclusive-rank at any scale") {
    // round 9: the sketched series is the day-level revenue pre-aggregate,
    // so every merged month sketch holds <= 31 items — below k = 200 at
    // ANY corpus scale, never compacted, and getQuantile is the exact
    // inclusive-rank selection (smallest value whose rank cum/n >= q)
    val sf01 = "/root/testdata/sf0.01"
    val est = ops.Sketches.sketchQuantile(spark, sf01).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val daily = Tables.orders(spark, sf01)
      .groupBy(col("o_orderdate").as("day"))
      .agg(graft.util.Det.dsum(col("o_totalprice")).as("rev"))
      .select(date_format(col("day"), "yyyy-MM").as("month"), col("rev"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    // smallest value whose inclusive normalized rank >= q — the same
    // IEEE double comparison the sketch's sorted view performs
    def incq(vs: Array[Double], q: Double): Double =
      vs(vs.indices.find(i => (i + 1).toDouble / vs.length >= q).get)
    assert(est.nonEmpty && est.keySet == daily.keySet)
    est.foreach { case (m, (nDays, p50, p95)) =>
      val vs = daily(m)
      assert(nDays == vs.length && vs.length <= 31,
        s"$m: ${vs.length} items must be calendar-bounded")
      assert(p50 == incq(vs, 0.5), s"$m p50 est $p50 vs exact ${incq(vs, 0.5)}")
      assert(p95 == incq(vs, 0.95), s"$m p95 est $p95 vs exact ${incq(vs, 0.95)}")
    }
  }

  test("KLL merge law: per-half merge matches the whole within rank error") {
    import graft.functions.SketchAggs._
    // merge MAY compact (KLL compaction triggers on merge even below k),
    // so the law is the published ±1.65% rank-error bound at k=200, not
    // byte equality; both paths must answer within that band of each other
    val o = Tables.orders(spark, sf).select(col("o_totalprice"), col("o_orderkey"))
    val halves = o.withColumn("h", (col("o_orderkey") % 2).cast("int"))
      .groupBy("h").agg(kllAgg(col("o_totalprice")).as("sk"))
      .agg(kllMergeAgg(col("sk")).as("m"))
      .select(kllQuantile(col("m"), 0.5), kllQuantile(col("m"), 0.95))
      .head()
    val values = o.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    def rankOf(v: Double): Double =
      values.count(_ <= v).toDouble / values.length
    Seq(0 -> 0.5, 1 -> 0.95).foreach { case (i, q) =>
      val r = rankOf(halves.getDouble(i))
      assert(math.abs(r - q) <= 0.0165 * 2 + 1.0 / values.length,
        s"merged q=$q answered value at rank $r")
    }
  }

  // ------------------------------------------------- Theta set operations

  test("theta: exact-mode estimates equal true distinct counts as integers") {
    import graft.functions.SketchAggs._
    val got = Tables.orders(spark, sf)
      .agg(thetaEstimate(thetaAgg(col("o_custkey"))).as("est"))
      .head().getDouble(0)
    val exact = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(got == exact.toDouble, s"exact-mode theta $got != $exact")
  }

  test("theta: pairwise intersect == aggregate intersect == relational answer") {
    import graft.functions.SketchAggs._
    // customer sets of the two order-status segments
    val seg = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus")).agg(thetaAgg(col("o_custkey")).as("sk"))
    val twoSegs = seg.orderBy("o_orderstatus").limit(2)
    val viaAgg = twoSegs
      .agg(thetaEstimate(thetaIntersectAgg(col("sk"))).as("est"))
      .head().getDouble(0)
    val pair = twoSegs.collect()
    val viaPairDf = twoSegs
      .agg(collect_list(col("sk")).as("sks"))
      .select(thetaEstimate(graft.functions.SketchAggs.thetaPairIntersect(
        element_at(col("sks"), 1), element_at(col("sks"), 2))).as("est"))
      .head().getDouble(0)
    val statuses = pair.map(_.getString(0))
    val a = Tables.orders(spark, sf).filter(col("o_orderstatus") === statuses(0))
      .select("o_custkey").distinct()
    val b = Tables.orders(spark, sf).filter(col("o_orderstatus") === statuses(1))
      .select("o_custkey").distinct()
    val exact = a.intersect(b).count()
    assert(viaAgg == exact.toDouble, s"agg intersect $viaAgg != $exact")
    assert(viaPairDf == exact.toDouble, s"pair intersect $viaPairDf != $exact")
  }

  test("theta union merge law mirrors HLL: parts == whole, exactly") {
    import graft.functions.SketchAggs._
    val o = Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderkey"))
    val parts = o.withColumn("h", (col("o_orderkey") % 4).cast("int"))
      .groupBy("h").agg(thetaAgg(col("o_custkey")).as("sk"))
      .agg(thetaEstimate(thetaUnionAgg(col("sk"))).as("est"))
      .head().getDouble(0)
    val whole = o.agg(thetaEstimate(thetaAgg(col("o_custkey"))).as("est"))
      .head().getDouble(0)
    assert(parts == whole)
  }

  test("frequent items: exact below map size, whole == merged parts") {
    import graft.functions.SketchAggs._
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val truth = toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocabulary ≪ 2^10 map entries → no purge ever → exact estimates
    val whole = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .agg(freqItems(freqAgg(col("term"), 10)).as("f"))
      .select(explode(col("f")).as("f"))
      .select(col("f.term"), col("f.est"), col("f.lb"), col("f.ub"))
      .collect()
    assert(whole.nonEmpty)
    whole.foreach { r =>
      val (t, est, lb, ub) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est == truth(t), s"$t: est $est != exact ${truth(t)}")
      assert(lb == est && ub == est, s"$t: exact regime must have lb==est==ub")
    }
    // merge law in the exact regime: per-lang sketches merged == whole
    val merged = toks.groupBy("lang").agg(freqAgg(col("term"), 10).as("sk"))
      .agg(freqItems(freqMergeAgg(col("sk"), 10)).as("f"))
      .select(explode(col("f")).as("f"))
      .select(col("f.term"), col("f.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == truth)
  }

  test("frequent items: purged regime brackets the truth within the error bound") {
    import graft.functions.SketchAggs._
    // Zipf-shaped synthetic stream: one term at 50% share, a long tail of
    // singletons — 2^3 = 8 map slots against 1501 distinct terms forces
    // constant purging; Misra-Gries still guarantees lb ≤ true ≤ ub and
    // the reported set (no-false-positives policy) contains the heavy term
    val streamLen = 3000L
    val toks = spark.range(streamLen).select(
      when(col("id") % 2 === 0, lit("alpha"))
        .otherwise(concat(lit("tail_"), col("id"))).as("term"))
    val rows = toks.agg(freqItems(freqAgg(col("term"), 3)).as("f"))
      .select(explode(col("f")).as("f"))
      .select(col("f.term"), col("f.est"), col("f.lb"), col("f.ub"))
      .collect()
    assert(rows.nonEmpty, "heavy hitters must survive the purge")
    val truth: String => Long = t => if (t == "alpha") streamLen / 2 else 1L
    rows.foreach { r =>
      val (t, lb, ub) = (r.getString(0), r.getLong(2), r.getLong(3))
      assert(lb <= truth(t) && truth(t) <= ub,
        s"$t: true ${truth(t)} outside [$lb, $ub]")
      assert(ub - lb <= streamLen * 3.5 / 8,
        s"$t: bound width ${ub - lb} exceeds the a-priori error")
    }
    assert(rows.exists(_.getString(0) == "alpha"),
      "the 50%-share term must be reported")
  }

  test("count-min: never undercounts, bounded overcount, merge == single-shot") {
    import graft.functions.SketchAggs._
    import graft.functions.TextFeatures.words
    import org.apache.spark.sql.functions._
    val out = ops.Sketches.cmsFreq(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(explode(words(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val n = toks.count()
    val exact = toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (term, est, total) =>
      assert(total === n, "any CM row sums to the stream length")
      val ex = exact.getOrElse(term, 0L)
      assert(est >= ex, s"CM undercounted $term: $est < $ex")
      assert(est <= ex + 5 * n / 256, s"CM overcount out of bound for $term")
    }
    // merge law: the per-lang rollup in cmsFreq must equal a single-shot
    // global build, as exact blob equality
    val merged = Tables.documents(spark, sf)
      .select(col("lang"), explode(words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("lang").agg(cmAgg(col("term")).as("sk"))
      .agg(cmMergeAgg(col("sk")).as("sk")).collect().head.getAs[Array[Byte]](0)
    val single = toks.agg(cmAgg(col("term")).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, single), "merge law violated")
  }
}
