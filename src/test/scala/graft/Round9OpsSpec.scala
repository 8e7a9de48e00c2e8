package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Law/replay tests for the round-9 additions: split-conformal
  * intervals, Cohen's d / Hedges' g, the JL projection audit, and the
  * repeated-span (exact-substring) primitive. */
class Round9OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("conformal: guaranteed coverage, interval algebra, rank replay") {
    val rows = ops.Evaluation.conformal(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 1000000 + lit(0.5)).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val ty = r.getString(0)
      val nTrain = r.getLong(1); val nCal = r.getLong(2)
      val mu = r.getDouble(3); val qhat = r.getLong(4)
      val lo = r.getDouble(5); val hi = r.getDouble(6)
      val cov = r.getDouble(7)
      // split-conformal guarantee: empirical coverage >= ceil(0.9(n+1))/n... >= 0.9
      // holds whenever k <= n (n_cal >= 9 on the fixture)
      assert(cov >= 0.9 - 1e-9, s"$ty coverage $cov < 0.9")
      assert(lo <= mu && mu <= hi, s"$ty interval must bracket the center")
      // driver replay: train mean (integer div) and the k-th smallest score
      val tr = ev.filter(e => e._1 == ty && e._2 % 5 != 0).map(_._3)
      val cal = ev.filter(e => e._1 == ty && e._2 % 5 == 0).map(_._3)
      assert(nTrain == tr.length && nCal == cal.length)
      val muMicro = tr.sum / tr.length
      assert(math.abs(mu - muMicro.toDouble / 1e6) < 1e-12)
      val scores = cal.map(x => math.abs(x - muMicro)).sorted
      val k = math.min((9 * (scores.length + 1) + 9) / 10, scores.length)
      assert(qhat == scores(k - 1), s"$ty qhat $qhat vs replay ${scores(k - 1)}")
      val covBrute = scores.count(_ <= qhat).toDouble / scores.length
      assert(math.abs(cov - math.floor(covBrute * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("cohens d: brute replay, hedges correction shrinks toward zero") {
    val rows = ops.Statistics.cohensD(spark, sf).collect()
    assert(rows.length >= 3, "needs several type pairs")
    val byType = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000 + lit(0.5)).cast("long").as("m"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toArray).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, "pair grid is ordered")
      val (xa, xb) = (byType(ta).map(_.toDouble), byType(tb).map(_.toDouble))
      val (na, nb) = (xa.length, xb.length)
      assert(r.getLong(2) == na && r.getLong(3) == nb)
      val (ma, mb) = (xa.sum / na, xb.sum / nb)
      def ss(x: Array[Double], m: Double) = x.map(v => (v - m) * (v - m)).sum
      val sp = math.sqrt((ss(xa, ma) + ss(xb, mb)) / (na + nb - 2))
      val d = (ma - mb) / sp
      assert(math.abs(r.getDouble(6) - d) < 1e-4, s"$ta/$tb d replay")
      val g = r.getDouble(7)
      // the bias correction strictly shrinks |d| (factor in (0,1))
      assert(math.abs(g) <= math.abs(r.getDouble(6)) + 1e-12)
      assert(math.signum(g) == math.signum(r.getDouble(6)) || g == 0.0)
    }
  }

  test("jl transform: projection preserves cosine structure on the panel") {
    val rows = ops.Similarity.jlTransform(spark, sf).collect()
    val nPanel = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50).count().toInt
    assert(rows.length == nPanel * (nPanel - 1) / 2, "full pair grid")
    val errs = rows.map(_.getDouble(4))
    assert(errs.forall(e => e >= 0.0 && e <= 2.0))
    val meanErr = errs.sum / errs.length
    assert(meanErr < 0.3, s"mean |cos_full - cos_proj| $meanErr too large " +
      "for a 16-dim JL projection (~1/sqrt(16) scale)")
    // the projection must carry signal, not noise: full and projected
    // cosines correlate positively across the panel
    val cf = rows.map(_.getDouble(2)); val cp = rows.map(_.getDouble(3))
    val (mf, mp) = (cf.sum / cf.length, cp.sum / cp.length)
    val cov = cf.zip(cp).map { case (x, y) => (x - mf) * (y - mp) }.sum
    val sx = math.sqrt(cf.map(x => (x - mf) * (x - mf)).sum)
    val sy = math.sqrt(cp.map(y => (y - mp) * (y - mp)).sum)
    val corr = cov / (sx * sy)
    // the fixture panel is near-orthogonal (cosines ~ ±0.2) while JL
    // noise at k = 16 is ~ 1/sqrt(16) = 0.25 — comparable magnitudes, so
    // full correlation is impossible BY DESIGN; 0.3 separates "carries
    // the geometry" from "pure noise" (corr ~ 0) with wide margin
    assert(corr > 0.3, s"projection lost the geometry: corr $corr")
  }

  test("energy distance: brute pair-sum replay, metric laws") {
    val row = ops.Statistics.energyDistance(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view") && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000 + lit(0.5)).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val x = ev.filter(_._1 == "click").map(_._2)
    val y = ev.filter(_._1 == "view").map(_._2)
    assert(row.getLong(0) == x.length && row.getLong(1) == y.length)
    def pairSum(a: Array[Long], b: Array[Long]): BigInt =
      a.foldLeft(BigInt(0))((acc, xi) =>
        acc + b.foldLeft(BigInt(0))((s, yj) => s + BigInt(math.abs(xi - yj))))
    val q6 = (v: Double) => math.floor(v * 1e6 + 0.5) / 1e6
    val exy = pairSum(x, y).toDouble / (x.length.toDouble * y.length) / 1e6
    val exx = pairSum(x, x).toDouble / (x.length.toDouble * x.length) / 1e6
    val eyy = pairSum(y, y).toDouble / (y.length.toDouble * y.length) / 1e6
    assert(math.abs(row.getDouble(2) - q6(exy)) < 1e-5, "E|X-Y| replay")
    assert(math.abs(row.getDouble(3) - q6(exx)) < 1e-5, "E|X-X'| replay")
    assert(math.abs(row.getDouble(4) - q6(eyy)) < 1e-5, "E|Y-Y'| replay")
    val d2 = 2 * exy - exx - eyy
    assert(math.abs(row.getDouble(5) - q6(d2)) < 1e-5, "D2 replay")
    // energy distance is nonnegative and zero iff equal distributions
    assert(row.getDouble(5) >= -1e-9)
    assert(row.getDouble(6) >= -1e-9, "scaled statistic nonnegative")
  }

  test("tost: one-sided t identity, flag consistency, Welch replay") {
    val r = ops.Statistics.tost(spark, sf).collect().head
    val se = r.getDouble(3)
    val (tLo, tHi) = (r.getDouble(4), r.getDouble(5))
    // identity: t_lower + t_upper = 2*delta/se regardless of the data
    assert(math.abs((tLo + tHi) - 2 * 5.0 / se) < 1e-3, "TOST t identity")
    val eq = r.getInt(6)
    assert(eq == (if (tLo > 1.645 && tHi > 1.645) 1 else 0), "flag consistency")
    // Welch se replay from raw values
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    def stats(t: String) = {
      val v = ev.filter(_._1 == t).map(_._2)
      val m = v.sum / v.length
      (v.length, m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (n1, m1, v1) = stats("click"); val (n2, m2, v2) = stats("view")
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(2) - (m1 - m2)) < 1e-4, "mean diff replay")
    assert(math.abs(se - math.sqrt(v1 / n1 + v2 / n2)) < 1e-4, "Welch se replay")
  }

  test("curriculum: positions are a permutation, phases ordered, shuffled within") {
    val out = ops.TrainingPrep.curriculum(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.length.toLong == n)
    // positions are exactly 1..N
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to n).toSeq)
    // phase blocks are contiguous in position order: max pos of phase p
    // < min pos of phase p+1
    val byPhase = out.groupBy(_.getInt(2)).view
      .mapValues(rs => (rs.map(_.getLong(3)).min, rs.map(_.getLong(3)).max)).toMap
    byPhase.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byPhase(a)._2 < byPhase(b)._1, s"phases $a/$b overlap")
      case _ =>
    }
    // easy -> hard: mean n_chars strictly increases across phases
    val meansByPhase = out.groupBy(_.getInt(2)).view
      .mapValues(rs => rs.map(_.getLong(1).toDouble).sum / rs.length).toMap
    meansByPhase.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(meansByPhase(a) < meansByPhase(b), "length curriculum")
      case _ =>
    }
    // the within-phase shuffle actually shuffles: in at least one phase
    // the doc_id sequence in position order is not monotone
    val shuffled = out.groupBy(_.getInt(2)).values.exists { rs =>
      val ids = rs.sortBy(_.getLong(3)).map(_.getLong(0))
      ids.zip(ids.drop(1)).exists { case (a, b) => a > b }
    }
    assert(shuffled, "md5 key must break doc_id order inside phases")
  }

  test("span coverage: brute interval-union replay per document") {
    val out = ops.Dedup.spanCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams8(t: String): Seq[(String, Int)] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Seq.empty
      else w.sliding(8).zipWithIndex.map { case (g, i) => (g.mkString(" "), i) }.toSeq
    }
    val all = docs.flatMap { case (id, t) => grams8(t).map { case (g, p) => (g, id, p) } }
    val repeated = all.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2).keySet
    assert(out.size == docs.length)
    docs.foreach { case (id, t) =>
      val (nTok, nSpans, covered, share) = out(id)
      assert(nTok == t.split(" ", -1).length)
      val hits = grams8(t).filter(g => repeated(g._1)).map(_._2).sorted
      // brute interval union of [p, p+8)
      var spans = 0L; var cov = 0L; var end = -1
      hits.foreach { p =>
        if (p > end) { spans += 1; cov += 8; end = p + 8 }
        else { cov += (p + 8 - end).max(0); end = math.max(end, p + 8) }
      }
      assert(nSpans == spans, s"doc $id spans")
      assert(covered == cov, s"doc $id covered")
      assert(covered <= nTok, s"doc $id union cannot exceed the doc")
      assert(math.abs(share - math.floor(cov.toDouble / nTok * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // the fixture's planted dups must make coverage non-trivial somewhere
    assert(out.values.exists(_._3 > 0), "planted dups must produce covered spans")
    assert(out.values.exists(_._3 == 0), "and clean docs must exist")
  }

  test("repeated spans: every reported span recounts across >= 2 docs") {
    val rows = ops.Dedup.repeatedSpans(spark, sf).collect()
    assert(rows.length <= 50)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams8(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Seq.empty else w.sliding(8).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (id, t) => grams8(t).map(g => (g, id)) }
    val byGram = all.groupBy(_._1)
    rows.foreach { r =>
      val g = r.getString(0)
      val occ = byGram(g)
      assert(occ.map(_._2).distinct.length.toLong == r.getLong(1), s"n_docs of '$g'")
      assert(occ.length.toLong == r.getLong(2), s"n_occ of '$g'")
      assert(r.getLong(1) >= 2)
      assert(occ.map(_._2).min == r.getLong(3) && occ.map(_._2).max == r.getLong(4))
    }
    // the report is the TOP-50: no unreported span beats a reported one
    if (rows.length == 50) {
      val reported = rows.map(_.getString(0)).toSet
      val minOcc = rows.map(_.getLong(2)).min
      val bestUnreported = byGram.view
        .filter { case (gm, oc) => !reported(gm) && oc.map(_._2).distinct.length >= 2 }
        .map(_._2.length).maxOption.getOrElse(0)
      assert(bestUnreported <= minOcc, "TakeOrdered must report the max-occurrence spans")
    }
  }
}
