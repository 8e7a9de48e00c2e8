package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-7 additions: the bigram LM, the cross-document
  * boilerplate audit, the rule-based quality gate, and the ANN recall
  * audit. Each law is an independent recomputation or an algebraic
  * invariant — never a comparison of the query against itself. */
class RulesAndRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("bigram LM: every surprisal sum is positive and consistent with its mean") {
    val rows = ops.TextAnalysis.bigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sumN, avgN) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n >= 1)
      // add-one smoothing guarantees c12 + 1 <= c1 + V strictly when V > 1,
      // so every bigram's surprisal is positive
      assert(sumN > 0, s"non-positive surprisal sum $sumN")
      // avg is the floor-quantized sum/n — reproducible from the row itself
      // only up to the two quantizations; bound the drift by one 4-dp step
      assert(math.abs(avgN - sumN / n) <= 1e-4 + 1e-9,
        s"avg $avgN inconsistent with $sumN / $n")
    }
  }

  test("bigram LM: per-doc bigram count equals word count minus one") {
    val lm = ops.TextAnalysis.bigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("nw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    words.foreach { case (id, nw) =>
      if (nw >= 2) assert(lm(id) === nw - 1, s"doc $id: ${lm.get(id)} vs ${nw - 1}")
      else assert(!lm.contains(id), s"doc $id with $nw words should have no bigrams")
    }
  }

  test("boilerplate: counts bound the fraction and match an independent df recount") {
    val rows = ops.TextAnalysis.boilerplateNgrams(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTri, nBoiler, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBoiler >= 0 && nBoiler <= nTri)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(frac - math.floor(nBoiler.toDouble / nTri * 10000 + 0.5) / 10000) < 1e-12)
    }
    // independent recount of one doc's boilerplate trigrams from raw text
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def tris(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val df = scala.collection.mutable.Map.empty[String, Int]
    docs.values.foreach(t => tris(t).foreach(g => df(g) = df.getOrElse(g, 0) + 1))
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { case (id, t) =>
      val ts = tris(t)
      if (ts.nonEmpty) {
        val (nTri, nBoiler) = byId(id)
        assert(nTri === ts.size, s"doc $id distinct-trigram count")
        assert(nBoiler === ts.count(df(_) >= 3), s"doc $id boilerplate count")
      }
    }
  }

  test("quality rules: keep is exactly the conjunction and every flag is 0/1") {
    val rows = ops.Curation.qualityRules(spark, sf).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val flags = (5 to 8).map(r.getInt)
      val keep = r.getInt(9)
      flags.foreach(f => assert(f == 0 || f == 1))
      assert(keep === flags.min, s"keep ${keep} != conjunction of $flags")
      kept += keep
    }
    assert(kept > 0 && kept < rows.length,
      s"degenerate gate: kept $kept of ${rows.length}")
  }

  test("quality rules: r_wordlen agrees with a recomputed mean word length") {
    val rows = ops.Curation.qualityRules(spark, sf).collect()
    rows.foreach { r =>
      val (nw, nl, rWordlen) = (r.getLong(1), r.getLong(2), r.getInt(6))
      val expected = if (3 * nw <= nl && nl <= 10 * nw) 1 else 0
      assert(rWordlen === expected, s"doc ${r.getLong(0)}: nw=$nw nl=$nl")
    }
  }

  test("greedy next-fit packing matches a single-threaded fold and respects capacity") {
    val rows = ops.TrainingPrep.binPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // independent single-threaded replay of the fold per source
    val bySource = rows.groupBy(_._2)
    bySource.foreach { case (_, docs) =>
      var bin = 0L; var fill = 0L
      docs.sortBy(_._1).foreach { case (id, srcName, nt, gotBin, gotFill) =>
        if (fill > 0 && fill + nt > 256) { bin += 1; fill = 0 }
        fill += nt
        assert(gotBin === bin, s"doc $id bin")
        assert(gotFill === fill, s"doc $id fill")
        // capacity law: a bin only exceeds 256 when a single doc does
        assert(fill <= 256 || fill == nt, s"doc $id overfilled a shared bin")
      }
    }
    // bins are dense 0..max per source
    bySource.foreach { case (srcName, docs) =>
      val bins = docs.map(_._4).distinct.sorted
      assert(bins === (0L to bins.max), s"$srcName bins not contiguous")
    }
  }

  test("embedding drift: split counts reconcile and an independent recompute agrees") {
    val rows = ops.Statistics.embedDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val labelCounts = Tables.embeddings(spark, sf)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (label, nRef, nCur) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(nRef + nCur === labelCounts(label), s"label $label split count")
      assert(r.getDouble(3) >= 0 && r.getDouble(4) >= r.getDouble(3),
        "L1 shift must dominate the max per-dim shift")
    }
    // independent recompute of one label's shifts from the raw vectors
    val label0 = rows.head.getInt(0)
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("label") === label0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (ref, cur) = vecs.partition(_._1 % 2 == 0)
    def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val dims = vecs.head._2.length
    val nums = (0 until dims).map { i =>
      val s0 = ref.map(v => q6(v._2(i).toDouble)).sum
      val s1 = cur.map(v => q6(v._2(i).toDouble)).sum
      math.abs(s1 * ref.length - s0 * cur.length)
    }
    val denom = ref.length.toLong * cur.length
    val row0 = rows.find(_.getInt(0) == label0).get
    assert(math.abs(row0.getDouble(3) - nums.max.toDouble / denom / 1e6) < 1e-12)
    assert(math.abs(row0.getDouble(4) - nums.map(BigInt(_)).sum.toDouble / denom / 1e6) < 1e-9)
  }

  test("cluster purity: cells partition the corpus and majority shares are lawful") {
    val rows = ops.Similarity.clusterPurity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === corpus, "cells must partition every vector")
    val nLabels = Tables.embeddings(spark, sf).select("label").distinct.count()
    rows.foreach { case (cid, n, k, majLabel, majN, purity) =>
      assert(k >= 1 && k <= nLabels)
      assert(majN >= 1 && majN <= n)
      assert(majN * k >= n, s"cell $cid: majority count below the pigeonhole bound")
      assert(math.abs(purity - math.floor(majN.toDouble / n * 10000 + 0.5) / 10000) < 1e-12)
      assert(majLabel >= 0 && majLabel < nLabels)
    }
  }

  test("time decay: decayed total never exceeds raw and matches an exact replay") {
    val rows = ops.EventTime.timeDecay(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9,
        s"${r.getString(0)}: decayed ${r.getDouble(3)} > raw ${r.getDouble(2)}")
      assert(r.getDouble(3) > 0)
    }
    // exact single-threaded replay of one type's decayed sum
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), to_date(col("ts")).as("dt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDate(2).toLocalDate))
    val anchor = evs.map(_._3).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val t0 = rows.head.getString(0)
    val expected = evs.filter(_._1 == t0).map { case (_, v, dt) =>
      val k = math.min(62L, java.time.temporal.ChronoUnit.DAYS.between(dt, anchor) / 7)
      math.floor(v / (1L << k).toDouble * 1e6 + 0.5).toLong
    }.sum
    assert(rows.head.getDouble(3) === expected.toDouble / 1e6, s"replay mismatch for $t0")
  }

  test("PMI terms: ranks are dense, ordered, and each score replays from raw counts") {
    val rows = ops.TextAnalysis.pmiTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rs.length), s"$src ranks not dense")
      assert(sorted.map(-_._5).toSeq === sorted.map(-_._5).toSeq.sorted, s"$src not pmi-ordered")
    }
    // independent occurrence counting + the same quantized-log combination
    val occ = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cts = occ.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cs = occ.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = occ.length.toLong
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { case (src, _, term, cTs, pmi) =>
      assert(cTs === cts((src, term)), s"($src,$term) count")
      val exp = q6(math.log(cTs.toDouble)) + q6(math.log(n.toDouble)) -
        q6(math.log(ct(term).toDouble)) - q6(math.log(cs(src).toDouble))
      assert(math.abs(pmi - exp.toDouble) < 1e-12, s"($src,$term) pmi $pmi vs $exp")
    }
  }

  test("ANN recall audit equals the exact/approx top-5 intersection") {
    val exact = ops.Similarity.cosineTopk(spark, sf).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val adc = ops.Similarity.pqAdc(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val hits = adc.groupBy(_._1).map { case (q, ns) =>
      q -> ns.count(exact.contains)
    }
    val audit = ops.Similarity.annRecall(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val (qid, nHits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(nHits === hits(qid).toLong, s"probe $qid hit count")
      assert(recall === nHits / 5.0)
      assert(nHits >= 0 && nHits <= 5)
    }
    assert(audit.map(_.getLong(0)).toSet === hits.keySet.map(_.toLong))
  }

  test("embedding norm audit: labels partition the corpus and the mean replays") {
    val rows = ops.Similarity.embedNormAudit(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val (mn, mx, mean) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, s"label ${r.getInt(0)}: mean outside [min,max]")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("embed PCA: unit loading, positive lambda, and alignment with an unquantized replay") {
    val rows = ops.Similarity.embedPca(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.length === 64)
    val v = rows.map(_.getDouble(1))
    val lambda = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == lambda), "lambda repeated on every row")
    assert(lambda > 0.0)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"loading norm $norm not ~1")
    // plain-double power iteration replay (same 5 passes from e0, no
    // quantization) must align with the integerized loop
    val xs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var w = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    var lam = 0.0
    (1 to 5).foreach { _ =>
      val s = new Array[Double](64)
      xs.foreach { x =>
        var dot = 0.0
        var i = 0
        while (i < 64) { dot += x(i) * w(i); i += 1 }
        i = 0
        while (i < 64) { s(i) += x(i) * dot; i += 1 }
      }
      lam = math.sqrt(s.map(x => x * x).sum)
      w = s.map(_ / lam)
    }
    val cos = v.zip(w).map { case (a, b) => a * b }.sum /
      (norm * math.sqrt(w.map(x => x * x).sum))
    assert(cos > 0.999, s"quantized loop diverged from the replay: cos $cos")
    assert(math.abs(lambda - lam) / lam < 0.01, s"lambda $lambda vs replay $lam")
  }

  test("PQ rerank: exact re-rank never loses recall vs the raw ADC ranking") {
    val exact = ops.Similarity.cosineTopk(spark, sf).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val hits = rows.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      hits.toDouble / rows.length
    }
    val adc = ops.Similarity.pqAdc(spark, sf).collect()
    val rer = ops.Similarity.pqRerank(spark, sf).collect()
    assert(rer.length === adc.length, "same query set, same k")
    // the shortlist contains the ADC top-5, and the re-rank scores it
    // exactly — recall can only improve (modulo 4-dp cosine ties)
    assert(recall(rer) >= recall(adc) - 1e-9,
      s"rerank recall ${recall(rer)} fell below ADC recall ${recall(adc)}")
    // per query: dense ranks 1..5, cosine non-increasing in rank
    rer.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length), s"q$qid ranks")
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      byRank.zip(byRank.drop(1)).foreach { case (a, b) =>
        assert(a >= b, s"q$qid cosine increases down the ranking")
      }
    }
  }

  test("lang confusion: cells partition the corpus and restate q_lang_id's own predictions") {
    val cells = ops.TextAnalysis.langConfusion(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum === Tables.documents(spark, sf).count())
    cells.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(2)).sum === rs.head.getLong(3), s"$lang row total")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-4, s"$lang shares sum to 1")
    }
    // the matrix must restate the per-doc query's predictions exactly
    val perDoc = ops.TextAnalysis.langId(spark, sf).select("lang", "pred").collect()
      .groupBy(r => (r.getString(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    cells.foreach { r =>
      assert(r.getLong(2) === perDoc((r.getString(0), r.getString(1))),
        s"cell (${r.getString(0)}, ${r.getString(1)}) diverges from q_lang_id")
    }
  }

  test("vocab coverage: monotone in k, bounded by 1, and covered@10 replays exactly") {
    val rows = ops.TextAnalysis.vocabCoverage(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).sameElements(Seq(10, 100, 1000)))
    val shares = rows.map(_.getDouble(2))
    shares.zip(shares.drop(1)).foreach { case (a, b) => assert(a <= b, "shares monotone in k") }
    assert(shares.forall(sh => sh > 0.0 && sh <= 1.0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select("text").collect().foreach { row =>
      row.getString(0).split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L)
    }
    val top10 = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(10).map(_._2).sum
    assert(rows.head.getLong(1) === top10, "covered@10 replays from the collected vocabulary")
  }

  test("wilson rate: interval brackets p, stays in [0,1], and replays from daily counts") {
    val rows = ops.EventTime.wilsonRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, p, lo, hi) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, "interval brackets the point estimate")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, "Wilson bounds stay in [0,1]")
      val nd = n.toDouble; val ph = c.toDouble / nd; val za = 1.96 * 1.96
      val rad = math.sqrt(ph * (1 - ph) / nd + za / (4 * nd * nd))
      val den = 1.0 + za / nd
      assert(math.abs(lo - (ph + za / (2 * nd) - 1.96 * rad) / den) < 1e-6)
      assert(math.abs(hi - (ph + za / (2 * nd) + 1.96 * rad) / den) < 1e-6)
    }
  }

  test("BPE merge step: dense ranks, non-increasing counts, winner replays exactly") {
    val rows = ops.TextAnalysis.bpeMergeStep(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sameElements(1 to rows.length), "dense ranks")
    val ns = rows.map(_.getLong(2))
    ns.zip(ns.drop(1)).foreach { case (a, b) => assert(a >= b, "counts non-increasing") }
    rows.foreach(r => assert(r.getString(1).length === 2, "pairs are exactly 2 chars"))
    // independent replay: pair counts from the collected vocabulary
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select("text").collect().foreach { row =>
      row.getString(0).split(" ").filter(_.nonEmpty).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
    }
    val expectTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(rows.length)
    rows.zip(expectTop).foreach { case (r, (p, n)) =>
      assert(r.getString(1) === p && r.getLong(2) === n,
        s"rank ${r.getInt(0)}: (${r.getString(1)}, ${r.getLong(2)}) vs replay ($p, $n)")
    }
  }

  test("rolling median: window sizes ramp to 7 and every cell replays single-threaded") {
    val rows = ops.EventTime.rollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1000000 + lit(0.5)).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    rows.foreach { r =>
      val (tpe, day, k, med) = (r.getString(0), java.time.LocalDate.parse(r.getString(1)),
        r.getLong(2), r.getDouble(3))
      val win = daily.filter { case (t, d, _) =>
        t == tpe && !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._3).sorted
      assert(k === win.length.toLong && k >= 1 && k <= 7)
      val m2 = win(((k + 1) / 2 - 1).toInt) + win(((k + 2) / 2 - 1).toInt)
      assert(med === m2.toDouble / 2000000.0, s"$tpe $day median")
    }
  }

  test("day-of-week profile: rows partition the stream and indices average to 1") {
    val rows = ops.EventTime.dowProfile(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 7)
    assert(rows.map(_.getInt(0)).forall(d => d >= 1 && d <= 7))
    val nTotal = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum === nTotal, "weekdays partition the stream")
    // the event-weighted mean of the seasonality index is 1 by construction
    val wIdx = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / nTotal
    assert(math.abs(wIdx - 1.0) < 1e-4, s"weighted index mean $wIdx")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2) / r.getLong(1)) < 1e-4,
        s"dow ${r.getInt(0)}: avg inconsistent with sum/count")
    }
  }

  test("perplexity filter: partition laws and an exact replay of the integer mean gate") {
    val rows = ops.TextAnalysis.pplFilter(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "sources partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1), s"${r.getString(0)}: kept+dropped=docs")
    }
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0 && kept < total, "the mean gate keeps a strict subset")
    // replay the all-integer gate from the LM's own per-doc averages
    val avgq = ops.TextAnalysis.unigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(3) * 10000 + 0.5).toLong)
    val ta = avgq.map(_._2).sum
    val nd = avgq.length.toLong
    val keepSet = avgq.filter { case (_, a) => nd * a <= ta }.map(_._1).toSet
    val bySource = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expKept = keepSet.groupBy(bySource).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === expKept.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: kept count diverges from the replayed gate")
    }
  }

  test("markov transitions: rows normalize, totals conserve the pair count") {
    val rows = ops.EventTime.markovTransition(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-from-state: n sums to n_from and p sums to 1 (up to 6-dp rounding)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val nFrom = rs.head.getLong(3)
      assert(rs.forall(_.getLong(3) == nFrom), s"$from: n_from repeated")
      assert(rs.map(_.getLong(2)).sum === nFrom, s"$from: counts total n_from")
      val pSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from: probabilities sum to $pSum")
    }
    // total transition count = events - users with at least one event
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("triangle participation: apex counts are thirds of a whole and respect degree bounds") {
    val rows = ops.Graph.triangleCount(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    // each triangle is counted once from each of its 3 apexes
    assert(total % 3 === 0, s"apex total $total not divisible by 3")
    assert(total > 0, "trade graph is dense enough to close at least one triangle")
    rows.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("media aHash: expression path bit-agrees with the parsed-bytes path, groups partition") {
    val viaExpr = ops.Multimodal.mediaAhash(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaBytes = ops.Multimodal.ahashFromBytes(
      ops.Multimodal.mediaFromDocuments(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaExpr.keySet === viaBytes.keySet)
    viaExpr.foreach { case (id, h) =>
      assert(h === viaBytes(id), s"doc $id: expression hash != parsed-bytes hash")
    }
    // halves never touch the sign bit, and dupe-group sizes partition the corpus
    val rows = ops.Multimodal.mediaAhash(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 32), "hi half in 32 bits")
      assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 32), "lo half in 32 bits")
    }
    val byHash = rows.groupBy(r => (r.getLong(1), r.getLong(2)))
    byHash.foreach { case (h, rs) =>
      assert(rs.forall(_.getLong(3) == rs.length), s"group $h size mismatch")
    }
  }

  test("markov steady state: quantized power-iteration replay, mass ~ 1") {
    val p = ops.EventTime.markovTransition(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    val types = p.flatMap(x => Seq(x._1, x._2)).distinct.sorted
    val q6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    val q9 = (x: Double) => math.floor(x * 1e9 + 0.5) / 1e9
    var pi = types.map(_ -> 0.2).toMap
    (1 to 4).foreach { _ =>
      val acc = scala.collection.mutable.Map.empty[String, BigDecimal]
        .withDefaultValue(BigDecimal(0))
      p.foreach { case (f, t, pr) => acc(t) += BigDecimal(q9(pi(f) * pr)) }
      pi = types.map(t => t -> q6(acc(t).toDouble)).toMap
    }
    val rows = ops.EventTime.markovSteady(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === types.toSet)
    types.foreach(t => assert(rows(t) === pi(t), s"$t steady replay"))
    val mass = rows.values.sum
    assert(mass > 0.98 && mass < 1.02, s"stochastic mass ~1, got $mass")
  }

  test("interarrival: per-user gap replay, median/p90/max rank laws") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsl")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._2))
      sorted.sliding(2).filter(_.length == 2).map(p =>
        (p(1)._3, p(1)._4 - p(0)._4)).toSeq
    }
    val byType = gaps.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sorted }
    val rows = ops.EventTime.interarrival(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val g = byType(r.getString(0)); val n = g.length
      assert(r.getLong(1) === n.toLong)
      val med = (g((n + 1) / 2 - 1) + g((n + 2) / 2 - 1)).toDouble * 0.5
      assert(r.getDouble(2) === med, "rank-selected median")
      assert(r.getLong(3) === g((9 * n + 9) / 10 - 1), "p90 rank selection")
      assert(r.getLong(4) === g.last, "max")
      assert(r.getDouble(2) <= r.getLong(3).toDouble &&
        r.getLong(3) <= r.getLong(4), "median <= p90 <= max")
    }
  }
}
