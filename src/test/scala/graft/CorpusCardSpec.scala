package graft

import graft.ops.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the corpus-card wave (retention curve,
  * candidate-similarity histogram, per-source datasheet). */
class CorpusCardSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("retention curve: monotone, anchored at the corpus, share law") {
    val rows = Curation.retentionCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    // lowest present bucket retains everything at or above it; if bucket 0
    // is present its row IS the whole corpus
    assert(rows.head._2 == rows.map(_._2).max)
    if (rows.head._1 == 0L) assert(rows.head._2 == nDocs)
    // cumulative-from-top: strictly ordered buckets, non-increasing counts
    rows.sliding(2).foreach {
      case Array((b1, d1, t1, s1), (b2, d2, t2, s2)) =>
        assert(b1 < b2); assert(d1 >= d2); assert(t1 >= t2); assert(s1 >= s2)
      case _ =>
    }
    rows.foreach { case (_, _, _, ppm) => assert(ppm >= 0 && ppm <= 1000000L) }
    // brute force from the audited per-doc score (q_quality_score) and
    // whitespace token count (q_token_count) — the same columns the curve
    // claims to aggregate
    val quality = TextAnalysis.qualityScore(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val per = TextAnalysis.tokenCount(spark, sf)
      .select("doc_id", "ws_tokens").collect()
      .map(r => (math.min(9L, math.floor(quality(r.getLong(0)) * 10.0).toLong),
        r.getAs[Number](1).longValue))
    rows.foreach { case (b, nd, nt, _) =>
      val keep = per.filter(_._1 >= b)
      assert(keep.length.toLong == nd, s"bucket $b docs")
      assert(keep.map(_._2).sum == nt, s"bucket $b tokens")
    }
  }

  test("jaccard histogram: partitions the candidate-pair frame") {
    val hist = Dedup.jaccardHist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("jaccard", "inter").collect()
      .map(r => (r.getDouble(0), r.getAs[Number](1).longValue))
    assert(hist.map(_._2).sum == pairs.length, "histogram must partition the pairs")
    assert(hist.map(_._3).sum == pairs.map(_._2).sum, "intersection mass conserved")
    hist.foreach { case (b, n, _) =>
      assert(b >= 0 && b <= 9); assert(n > 0)
      val expect = pairs.count(p => math.min(9L, math.floor(p._1 * 10.0).toLong) == b)
      assert(expect.toLong == n, s"bucket $b: $n vs brute force $expect")
    }
  }

  test("dedup savings: per-family doc counts equal the agreement matrix totals") {
    val rows = Dedup.dedupSavings(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("embed", "exact", "minhash", "semantic", "simhash", "wide"))
    val cmp = Dedup.dedupMethodCompare(spark, sf).collect()(0)
    val totals = Map(
      "exact" -> cmp.getAs[Long]("n_exact"),
      "minhash" -> cmp.getAs[Long]("n_minhash"),
      "wide" -> cmp.getAs[Long]("n_minhash_wide"),
      "simhash" -> cmp.getAs[Long]("n_simhash"),
      "semantic" -> cmp.getAs[Long]("n_semantic"),
      "embed" -> cmp.getAs[Long]("n_embed"))
    val totToks = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long")).collect().map(_.getLong(0)).sum
    rows.foreach { case (fam, nf, tf, ppm) =>
      assert(nf == totals(fam), s"$fam: savings count vs matrix total")
      assert(tf <= totToks)
      assert(ppm == tf * 1000000L / totToks, s"$fam ppm law")
    }
  }

  test("t-closeness: TVD in range, flag law, brute-force distance per class") {
    val rows = Curation.tCloseness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    // same released classes as the l-diversity audit
    assert(rows.length.toLong == Curation.lDiversity(spark, sf).count())
    val docs = Tables.documents(spark, sf)
      .select(col("source"), floor(col("n_chars") / lit(100)).cast("long"), col("lang"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getString(2)))
    val nTot = docs.length.toLong
    val global = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byClass = docs.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    rows.foreach { case (src, bkt, n, l1, tvd, above) =>
      assert(tvd >= 0.0 && tvd <= 1.0, s"($src,$bkt) tvd range")
      val cl = byClass((src, bkt))
      val expect = global.map { case (lang, cL) =>
        math.abs(cl.getOrElse(lang, 0L) * nTot - cL * n)
      }.sum
      assert(expect == l1, s"($src,$bkt): scaled L1 $l1 vs brute force $expect")
      assert((above == 1) == (l1 * 10 > 8L * nTot * n), s"($src,$bkt) flag law")
    }
  }

  test("source datasheet: partitions the corpus, dup law vs distinct digests") {
    val rows = Curation.sourceDatasheet(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    val nDistinct = Tables.documents(spark, sf).select(md5(col("text"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "doc counts partition the corpus")
    // total dups across sources = docs minus distinct bodies (exact dedup law)
    assert(rows.map(_.getLong(4)).sum == nDocs - nDistinct, "dup totals")
    rows.foreach { r =>
      val (n, dups, ppm) = (r.getLong(1), r.getLong(4), r.getLong(5))
      assert(dups < n)
      assert(ppm == dups * 1000000L / n, "ppm law")
      val q = r.getDouble(6)
      assert(q >= 0.0 && q <= 1.0, "quality mean in range")
      assert(r.getLong(2) > 0 && r.getLong(3) >= 1)
    }
  }

  test("dedup kappa: replays the matrix row's 2x2 algebra, bounded, symmetric frame") {
    val cmp = Dedup.dedupMethodCompare(spark, sf).collect()(0)
    val n = cmp.getAs[Long]("n_docs")
    val rows = Dedup.dedupKappa(spark, sf).collect()
    assert(rows.length === 15, "one row per unordered family pair")
    rows.foreach { r =>
      val (na, nb, both, agree) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"), r.getAs[Long]("n_agree"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(agree === n - na - nb + 2 * both, "agreement identity")
      assert(agree >= 0 && agree <= n)
      assert(both <= math.min(na, nb), "overlap bounded by each margin")
      val peNum = BigInt(na) * nb + BigInt(n - na) * (n - nb)
      val den = BigInt(n) * n - peNum
      if (den != 0) {
        val brute = (BigInt(n) * agree - peNum).toDouble / den.toDouble
        val k = r.getAs[Double]("kappa")
        assert(math.abs(k - brute) < 1e-5,
          s"${r.getString(0)}/${r.getString(1)}: kappa $k vs brute $brute")
        assert(k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9)
      } else assert(r.isNullAt(r.fieldIndex("kappa")), "degenerate pe must be NULL")
    }
  }

  test("cochran Q + fleiss kappa: k-rater algebra off the shared stats row") {
    val cmp = Dedup.dedupMethodCompare(spark, sf).collect()(0)
    val n = cmp.getAs[Long]("n_docs")
    val totals = Seq("n_exact", "n_minhash", "n_minhash_wide", "n_simhash",
      "n_semantic", "n_embed").map(cmp.getAs[Long])
    val cq = Dedup.cochranQ(spark, sf).collect()(0)
    assert(cq.getAs[Long]("n_docs") === n)
    val t = cq.getAs[Long]("n_flags")
    val sumL2 = cq.getAs[Long]("sum_l2")
    assert(t === totals.sum, "T = sum of column totals")
    // L ∈ [0,6] ⇒ T ≤ ΣL² ≤ 6T (each L ≤ L² when L ≥ 1, L² ≤ 6L)
    assert(sumL2 >= t && sumL2 <= 6 * t, "row-sum square bounds")
    val num = BigInt(5) * (BigInt(6) * totals.map(g => BigInt(g) * g).sum -
      BigInt(t) * t)
    val den = BigInt(6) * t - sumL2
    if (den != 0) {
      val q = cq.getAs[Double]("q_stat")
      assert(q >= 0.0, "Cauchy-Schwarz: Q >= 0")
      assert(math.abs(q - num.toDouble / den.toDouble) < 1e-5, "Q algebra")
    } else assert(cq.isNullAt(cq.fieldIndex("q_stat")))
    val fk = Dedup.fleissKappa(spark, sf).collect()(0)
    val a = BigInt(2) * sumL2 + BigInt(36) * n - BigInt(12) * t - BigInt(6) * n
    val dd = BigInt(30) * n
    val e = BigInt(t) * t + (BigInt(6) * n - t) * (BigInt(6) * n - t)
    val m = BigInt(36) * n * n
    assert(math.abs(fk.getAs[Double]("p_bar") - a.toDouble / dd.toDouble) < 1e-5)
    assert(math.abs(fk.getAs[Double]("p_e") - e.toDouble / m.toDouble) < 1e-5)
    assert(fk.getAs[Double]("p_bar") >= 0.0 && fk.getAs[Double]("p_bar") <= 1.0)
    assert(fk.getAs[Double]("p_e") >= 0.0 && fk.getAs[Double]("p_e") <= 1.0)
    if (m != e) {
      val kap = fk.getAs[Double]("kappa")
      assert(math.abs(kap - (a * m - e * dd).toDouble / (dd * (m - e)).toDouble)
        < 1e-5, "Fleiss kappa algebra")
      assert(kap <= 1.0 + 1e-9, "kappa bounded above by 1")
    } else assert(fk.isNullAt(fk.fieldIndex("kappa")))
  }

  test("cochran Q at k=2 reduces exactly to McNemar's (b-c)^2/(b+c)") {
    // Algebraic reduction on real pair stats: with two raters,
    // T = n_a + n_b, sumL2 = n_a + n_b + 2*n_both, sumG2 = n_a^2 + n_b^2,
    // Q = (2-1)*(2*sumG2 - T^2)/(2*T - sumL2) = (n_a-n_b)^2/(b+c)
    // = (b-c)^2/(b+c) since b = n_a - n_both, c = n_b - n_both.
    val kap = Dedup.dedupKappa(spark, sf).collect()
    assert(kap.nonEmpty)
    kap.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val both = r.getAs[Long]("n_both")
      val t = na + nb; val sumL2 = na + nb + 2 * both
      val sumG2 = BigInt(na) * na + BigInt(nb) * nb
      val den = 2 * t - sumL2
      val b = na - both; val c = nb - both
      if (den != 0) {
        val q2 = (BigInt(2) * sumG2 - BigInt(t) * t).toDouble / den.toDouble
        val mcnemar = (b - c).toDouble * (b - c) / (b + c)
        assert(math.abs(q2 - mcnemar) < 1e-9,
          s"${r.getString(0)}/${r.getString(1)}: Q2 $q2 vs McNemar $mcnemar")
      } else assert(b + c == 0)
    }
  }

  test("mcnemar: discordant counts tie to the kappa frame, chi2 laws") {
    val kap = Dedup.dedupKappa(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both")))
      .toMap
    val rows = Dedup.mcnemarPairs(spark, sf).collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      val (na, nb, both) = kap((r.getString(0), r.getString(1)))
      val b = r.getAs[Long]("n_only_a"); val c = r.getAs[Long]("n_only_b")
      assert(b === na - both, "b = n_a - n_both")
      assert(c === nb - both, "c = n_b - n_both")
      if (b + c == 0) {
        assert(r.isNullAt(r.fieldIndex("chi2")))
        assert(r.isNullAt(r.fieldIndex("chi2_cc")))
      } else {
        val chi2 = r.getAs[Double]("chi2")
        val cc = r.getAs[Double]("chi2_cc")
        val d = (b - c).toDouble
        assert(math.abs(chi2 - d * d / (b + c)) < 1e-5, "chi2 algebra")
        val cn = math.max(math.abs(b - c) - 1L, 0L).toDouble
        assert(math.abs(cc - cn * cn / (b + c)) < 1e-5, "continuity algebra")
        assert(cc <= chi2 + 1e-9, "correction never increases the statistic")
      }
    }
  }
}
