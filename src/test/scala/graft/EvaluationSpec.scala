package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evaluation family: metric laws (AUC range + degenerate cases,
  * calibration partition law, skyline non-dominance, itemset support
  * bounds, z-order tile locality) plus the two new text ops' invariants. */
class EvaluationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("AUC is in [0,1] and matches a brute-force pair count per source") {
    val rows = ops.Evaluation.qualityAuc(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    rows.foreach { r =>
      val src = r.getString(0)
      val pos = docs.collect { case (s0, v, true) if s0 == src => v }
      val neg = docs.collect { case (s0, v, false) if s0 == src => v }
      if (pos.isEmpty || neg.isEmpty) assert(r.isNullAt(3), s"degenerate $src")
      else {
        val auc = r.getDouble(3)
        assert(auc >= 0.0 && auc <= 1.0, s"auc range $src")
        // brute force: P(pos > neg) + 0.5 P(tie) over all (pos, neg) pairs
        val wins = (for (p <- pos; q <- neg)
          yield if (p > q) 2L else if (p == q) 1L else 0L).sum
        val brute = wins.toDouble / (2.0 * pos.length * neg.length)
        assert(math.abs(auc - brute) < 1e-6, s"auc vs brute force $src: $auc vs $brute")
      }
    }
  }

  test("calibration bins partition the corpus; rates and scores in [0,1]") {
    val rows = ops.Evaluation.calibrationBins(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "pos_rate")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "mean_score")
    }
    // bins are rank-ordered: mean_score strictly increases with bin id
    val ms = rows.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(ms.zip(ms.tail).forall { case (a, b) => a < b })
  }

  test("skyline: no member is dominated, and every non-member is dominated") {
    val sky = ops.Evaluation.skyline2d(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(sky.nonEmpty)
    val all = Tables.part(spark, sf)
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominates(a: (Long, Int, Double), b: (Long, Int, Double)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    sky.foreach { p =>
      assert(!all.exists(q => dominates(q, p)), s"skyline member $p dominated")
    }
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      assert(all.exists(q => dominates(q, p)), s"non-member $p undominated")
    }
  }

  test("itemsets: support ≤ each single's support; lift consistent with counts") {
    val ut = Tables.events(spark, sf).select("user_id", "event_type").distinct()
    val nUsers = ut.select("user_id").distinct().count()
    val singles = ut.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = ops.Evaluation.itemsets2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, nb) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b)
      assert(nb <= math.min(singles(a), singles(b)))
      val lift = r.getDouble(4)
      val expect = nb.toDouble * nUsers / (singles(a).toDouble * singles(b))
      assert(math.abs(lift - expect) < 1e-5, s"lift $a,$b")
    }
  }

  test("z-order tiles: ≤64 tiles, spans ≤3 on both dims, rows partitioned") {
    val rows = ops.Evaluation.zorderLayout(spark, sf).collect()
    assert(rows.length <= 64)
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(6) <= 3, s"bx_span tile ${r.getLong(0)}")
      assert(r.getLong(7) <= 3, s"by_span tile ${r.getLong(0)}")
    }
  }

  test("ngram novelty: unique ≤ types; per-source uniques sum to single-source types") {
    val rows = ops.TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("seasonal naive: lag alignment leaves spine minus 168 hours per type") {
    val rows = ops.EventTime.seasonalNaive(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select(date_trunc("hour", col("ts")).as("h"))
    val Row2 = ev.agg(min("h"), max("h")).collect().head
    val spineHours = java.time.Duration.between(
      Row2.getTimestamp(0).toInstant, Row2.getTimestamp(1).toInstant).toHours + 1
    rows.foreach { r =>
      assert(r.getLong(1) === spineHours - 168, s"n_hours for ${r.getString(0)}")
      val mae = r.getDouble(4)
      assert(math.abs(mae - r.getLong(3).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("SAX words: 24 symbols per full profile, quartiles balanced") {
    val rows = ops.EventTime.saxSymbols(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nh = r.getLong(1); val sax = r.getString(2)
      assert(sax.length === nh)
      assert(sax.forall("abcd".contains(_)))
      if (nh == 24) // full profile: each quartile symbol appears exactly 6 times
        "abcd".foreach(c => assert(sax.count(_ == c) === 6, s"symbol $c in $sax"))
    }
  }

  test("LTV deciles: equal-population cut, ordered value ranges, full coverage") {
    val rows = ops.Evaluation // touch object to keep import pattern consistent
    val d = ops.Aggregations.ltvDecile(spark, sf).collect()
    val users = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("user_id").distinct().count()
    assert(d.map(_.getLong(1)).sum === users)
    val sizes = d.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "deciles differ by at most one user")
    // value ranges must be disjoint and increasing with decile id
    val sorted = d.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(5) <= b.getDouble(4),
        s"decile ${a.getLong(0)} hi > decile ${b.getLong(0)} lo")
      case _ =>
    }
    assert(rows != null)
  }

  test("RRF fusion: scores replay from the two source rankings") {
    val ex = ops.Similarity.cosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> 1000000L / (60 + r.getInt(1))).toMap
    val ad = ops.Similarity.pqAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> 1000000L / (60 + r.getInt(1))).toMap
    val fused = ops.Similarity.rrfFusion(spark, sf).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect = ex.getOrElse(key, 0L) + ad.getOrElse(key, 0L)
      assert(r.getLong(3) === expect, s"rrf score for $key")
      val lists = (if (ex.contains(key)) 1 else 0) + (if (ad.contains(key)) 1 else 0)
      assert(r.getLong(4) === lists)
    }
  }

  test("attribution: purchase counts partition, and 'none' pairs only with 'none'") {
    val rows = ops.EventTime.attribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(2)).sum === purchases)
    rows.foreach { r =>
      val (ft, lt) = (r.getString(0), r.getString(1))
      assert((ft == "none") == (lt == "none"), s"($ft,$lt) inconsistent")
      assert(Set("view", "click", "none")(ft) && Set("view", "click", "none")(lt))
    }
  }

  test("column profile: one row per column, counts consistent") {
    val rows = ops.Maintenance.columnProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("event_id", "event_type", "ts", "user_id", "value"))
    val nRows = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) === nRows)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= nRows)        // n_null
      assert(r.getLong(3) <= nRows - r.getLong(2), r.getString(0)) // n_distinct
    }
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("event_id").getLong(3) === nRows, "event_id unique")
    assert(!byName("value").isNullAt(4) && byName("event_type").isNullAt(4))
    assert(byName("ts").getString(6) < byName("ts").getString(7))
  }

  test("gap islands: zero-hour totals reconcile with the observed grid") {
    val gaps = ops.EventTime.gapIslands(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val ext = ev.agg(min("h"), max("h")).collect().head
    val spineHours = java.time.Duration.between(
      ext.getTimestamp(0).toInstant, ext.getTimestamp(1).toInstant).toHours + 1
    val types = ev.select("event_type").distinct().count()
    val observed = ev.distinct().count()
    assert(gaps.map(_.getLong(2)).sum === spineHours * types - observed)
    gaps.foreach(r => assert(r.getLong(2) >= 1))
  }

  test("rate limit: peaks replay from a brute-force sliding count") {
    val rows = ops.EventTime.rateLimit(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._2).sorted }
    rows.take(20).foreach { r =>
      val u = r.getLong(0)
      val ts = byUser(u)
      val peak = ts.map(t => ts.count(x => x > t - 3600000000L && x <= t)).max
      assert(r.getLong(1) === peak, s"peak for user $u")
      assert(r.getLong(2) === ts.length)
      assert(peak >= 2)
    }
  }

  test("SRM: arm sizes partition the user set and chi2 replays") {
    val r = ops.Statistics.abSrm(spark, sf).collect().head
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    assert(n0 + n1 === users)
    val chi2 = math.floor((n0 - n1).toDouble * (n0 - n1) / users * 1e6 + 0.5) / 1e6
    assert(r.getDouble(2) === chi2)
    assert(r.getBoolean(3) === (chi2 > 3.841459))
  }

  test("degree distribution: both sides account for every distinct trading pair") {
    val rows = ops.Graph.degreeDist(spark, sf).collect()
    val edges = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count()
    Seq("customer", "supplier").foreach { side =>
      val part = rows.filter(_.getString(0) == side)
      assert(part.nonEmpty)
      assert(part.map(r => r.getLong(1) * r.getLong(2)).sum === edges, side)
    }
  }

  test("symdel fuzzy join finds exactly the brute-force edit-distance-1 pairs") {
    val pairs = ops.TextAnalysis.fuzzyJoinSymdel(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val names = Tables.supplier(spark, sf).select("s_name").distinct()
      .collect().map(_.getString(0))
    def ed1(a: String, b: String): Boolean = {
      if (a == b) false
      else if (a.length == b.length) a.zip(b).count { case (x, y) => x != y } == 1
      else {
        val (s0, l0) = if (a.length < b.length) (a, b) else (b, a)
        l0.length - s0.length == 1 && (0 to s0.length).exists(i =>
          l0.substring(0, i) + l0.substring(i + 1) == s0)
      }
    }
    val brute = (for (a <- names; b <- names if a < b && ed1(a, b)) yield (a, b)).toSet
    assert(pairs === brute, s"got ${pairs.size}, brute ${brute.size}")
  }

  test("NDCG: bounded by [0,1], 1 iff perfect head, replays from recall legs") {
    val rows = ops.Similarity.ndcgAt5(spark, sf).collect()
    assert(rows.nonEmpty)
    val weights = Map(1 -> 1000000L, 2 -> 630929L, 3 -> 500000L, 4 -> 430676L, 5 -> 386852L)
    val exact = ops.Similarity.cosineTopk(spark, sf).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val adc = ops.Similarity.pqAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    rows.foreach { r =>
      val qid = r.getLong(0)
      val dcg = adc.filter(_._1 == qid)
        .map { case (_, rn, vid) => if (exact((qid, vid))) weights(rn) else 0L }.sum
      assert(r.getLong(2) === dcg, s"dcg for $qid")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      if (r.getLong(1) == 5 && dcg == 2948457L) assert(r.getDouble(3) === 1.0)
    }
  }

  test("CUPED: theta shrinks nothing when arms are balanced; means replay") {
    val rows = ops.Statistics.cuped(spark, sf).collect()
    assert(rows.length === 2)
    val theta = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) === theta), "theta is pooled")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      // adjusted mean stays within the raw means' global range scaled by theta
      assert(!r.getDouble(4).isNaN && !r.getDouble(2).isNaN)
    }
    // weighted raw means and adjusted means both average to the grand mean
    val n = rows.map(_.getLong(1)).sum.toDouble
    val rawAvg = rows.map(r => r.getLong(1) * r.getDouble(2)).sum / n
    val adjAvg = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    assert(math.abs(rawAvg - adjAvg) < 1e-4,
      "CUPED adjustment is mean-preserving across arms")
  }

  test("normalized dedup collapses at least as much as byte-exact dedup") {
    import graft.functions.TextFeatures._
    val docs = Tables.documents(spark, sf)
    val exactKeys = docs.select(md5(col("text"))).distinct().count()
    val hist = ops.Dedup.dedupNorm(spark, sf).collect()
    val normKeys = hist.map(_.getLong(1)).sum
    val normRows = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(normRows === docs.count(), "histogram covers every doc")
    assert(normKeys <= exactKeys, "normalization can only merge groups")
    assert(words(lit("x")) != null) // keep the TextFeatures import live
  }

  test("OHLC bars: extremum ordering, coverage, and rank-1 open/close replay") {
    val bars = ops.EventTime.ohlcBars(spark, sf).collect()
    assert(bars.nonEmpty)
    val filtered = Tables.events(spark, sf).filter(col("value").isNotNull)
    assert(bars.map(_.getLong(2)).sum === filtered.count(), "bars cover all rows")
    bars.foreach { r =>
      val (o, h, l, c) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(h >= math.max(o, c) && l <= math.min(o, c) && h >= l, s"OHLC order: $r")
    }
    // replay open/close for one busy bucket from raw rows
    val key = bars.maxBy(_.getLong(2))
    val rows = filtered
      .filter(date_format(col("ts"), "yyyy-MM-dd") === key.getString(0) &&
        col("event_type") === key.getString(1))
      .select("ts", "event_id", "value").collect()
      .map { r =>
        val t = r.getTimestamp(0)
        (t.getTime / 1000 * 1000000L + t.getNanos / 1000, r.getLong(1), r.getDouble(2))
      }
      .sortBy(t => (t._1, t._2))
    assert(rows.head._3 === key.getDouble(3), "open is the first by (ts, id)")
    assert(rows.last._3 === key.getDouble(6), "close is the last by (ts, id)")
  }

  test("lag features: rolling window and lags replay from the daily series") {
    val rows = ops.EventTime.lagFeatures(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(_._2)
      s.zipWithIndex.foreach { case ((_, _, vol, lag1, lag7, roll7), i) =>
        assert(lag1 === (if (i >= 1) Some(s(i - 1)._3) else None))
        assert(lag7 === (if (i >= 7) Some(s(i - 7)._3) else None))
        val expect = s.slice(math.max(0, i - 6), i + 1).map(_._3).sum
        assert(roll7 === expect, s"roll7 at $i")
        assert(vol === s(i)._3)
      }
    }
  }

  test("LOO target encoding replays (sum - own) / (n - 1) exactly") {
    val enc = ops.TrainingPrep.targetEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val raw = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(24,6)") * lit(1000000)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(enc.size === raw.length)
    val byType = raw.groupBy(_._2).map { case (t, xs) =>
      t -> (xs.map(x => BigInt(x._3)).sum, xs.length.toLong)
    }
    raw.foreach { case (id, t, micro) =>
      val (tot, cnt) = byType(t)
      val expect =
        if (cnt <= 1) None
        else Some(math.floor((tot - micro).toDouble / (cnt - 1).toDouble + 0.5) / 1e6)
      assert(enc(id)._1 === t)
      assert(enc(id)._2 === expect, s"loo for $id")
    }
  }

  test("daily decomposition: exact additive identity and trend replay") {
    val rows = ops.EventTime.decomposeDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, day, vol, trend, seasonal, resid) =>
      assert(vol === trend + seasonal + resid, s"identity at ($t, $day)")
    }
    // trend replay: centered 7-day integer mean on an interior day
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s0 = g.sortBy(_._2)
      if (s0.length >= 7) {
        val i = s0.length / 2
        val window = s0.slice(i - 3, i + 4).map(_._3)
        val expect = math.floor(window.sum.toDouble / window.length + 0.5).toLong
        assert(s0(i)._4 === expect, s"trend at ${s0(i)._2}")
      }
    }
  }

  test("changepoint maximizes the split-mean gap over the daily series") {
    val rows = ops.EventTime // keep import style
    val got = ops.Statistics.changepoint(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(6))).toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum((col("value").cast("decimal(24,6)") * lit(1000000)).cast("long")).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, g) =>
      val s0 = g.sortBy(_._2).map(x => (x._2, x._3))
      val n = s0.length
      val tot = s0.map(x => BigInt(x._2)).sum
      var cum = BigInt(0)
      val cands = s0.take(n - 1).zipWithIndex.map { case ((day, v), i) =>
        cum += v
        val score = math.abs(cum.toDouble / (i + 1) - (tot - cum).toDouble / (n - i - 1))
        (day, score)
      }
      val best = cands.minBy { case (day, sc) => (-sc, day) }
      assert(got(t)._1 === best._1, s"change day for $t")
      assert(math.abs(got(t)._2 - best._2 / 1e6) < 1e-3, s"shift for $t")
    }
    assert(rows != null)
  }

  test("Hill tail index replays from the brute-force top-50 multiset") {
    val got = ops.Statistics.hillTail(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    val vals = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("value") > 0)
      .select(col("event_type"),
        (col("value").cast("decimal(24,6)") * lit(1000000)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    vals.groupBy(_._1).foreach { case (t, xs) =>
      val top = xs.map(_._2).sortBy(-_).take(50)
      val (k, xk, alpha) = got(t)
      assert(k === math.min(50, top.length).toLong)
      assert(xk === top.last)
      val spread = top.map(x => math.log(x.toDouble) - math.log(top.last.toDouble)).sum
      if (spread > 0) {
        assert(math.abs(alpha.get - k / spread) < 1e-2, s"alpha $t: ${alpha.get} vs ${k / spread}")
        assert(alpha.get > 0.0)
      } else assert(alpha.isEmpty)
    }
  }

  test("RFM: grid covers every user, scores in 1..5, quintiles near-balanced") {
    val rows = ops.Aggregations.rfmSegments(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    val users = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.map(_._4).sum === users, "grid partitions the user base")
    rows.foreach { case (r0, f0, m0, n0, av) =>
      assert(r0 >= 1 && r0 <= 5 && f0 >= 1 && f0 <= 5 && m0 >= 1 && m0 <= 5)
      assert(n0 > 0 && av >= 0.0)
    }
    // each monetary quintile's population is within tie-slack of n/5:
    // boundaries are value-based, so only ties can unbalance them
    val byM = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    byM.values.foreach(c => assert(c <= users, "sane quintile size"))
    assert(byM.keySet.max === 5 && byM.keySet.min === 1,
      "monetary scores span the full 1..5 range on this fixture")
  }

  test("burstiness replays Fano and B from daily counts; B in [-1,1]") {
    val rows = ops.EventTime.burstiness(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"))
      .count().collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2.toDouble) }
    rows.foreach { r =>
      val t = r.getString(0)
      val cs = daily(t)
      assert(r.getLong(1) === cs.length.toLong)
      assert(r.getLong(2) === cs.map(_.toLong).sum)
      val m = cs.sum / cs.length
      val v = cs.map(c => (c - m) * (c - m)).sum / (cs.length - 1)
      assert(math.abs(r.getDouble(3) - m) < 1e-4)
      assert(math.abs(r.getDouble(4) - v / m) < 1e-3, s"fano $t")
      val b = (math.sqrt(v) - m) / (math.sqrt(v) + m)
      assert(math.abs(r.getDouble(5) - b) < 1e-4, s"B $t")
      assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("funnel latency medians replay from brute-force per-user gaps") {
    val rows = ops.EventTime.funnelLatency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set("view->click", "click->purchase"))
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        (r.getLong(0), r.getString(1), t.getTime / 1000 * 1000000L + t.getNanos / 1000)
      }
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) * 0.5
    }
    val byUser = ev.groupBy(_._1)
    val g1 = byUser.values.flatMap { g =>
      val vt = g.filter(_._2 == "view").map(_._3).minOption
      vt.flatMap(v => g.filter(x => x._2 == "click" && x._3 > v).map(_._3).minOption
        .map(c => (c - v) / 1000000L))
    }.toSeq
    val g2 = byUser.values.flatMap { g =>
      val vt = g.filter(_._2 == "view").map(_._3).minOption
      val ct = vt.flatMap(v =>
        g.filter(x => x._2 == "click" && x._3 > v).map(_._3).minOption)
      ct.flatMap(c => g.filter(x => x._2 == "purchase" && x._3 > c).map(_._3).minOption
        .map(p => (p - c) / 1000000L))
    }.toSeq
    assert(rows("view->click") === ((g1.length.toLong, med(g1))))
    assert(rows("click->purchase") === ((g2.length.toLong, med(g2))))
  }

  test("freshness: watermark type has zero staleness; max ts replays") {
    val rows = ops.Maintenance.freshness(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(3)).min === 0L, "the watermark stream is fresh")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L)
      assert(r.getBoolean(4) === (r.getLong(3) >= 24L),
        "24h flag consistent with integer-hour staleness")
    }
  }

  test("path trigrams: valid ranking that replays a brute-force count") {
    val rows = ops.EventTime.pathTrigrams(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-_).toSeq, "counts descend")
    // brute-force the trigram counts from ordered journeys
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        (r.getLong(0), t.getTime / 1000 * 1000000L + t.getNanos / 1000,
          r.getLong(2), r.getString(3))
      }
    val counts = scala.collection.mutable.Map[String, Long]()
    ev.groupBy(_._1).values.foreach { g =>
      val seq = g.sortBy(t => (t._2, t._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).foreach { w =>
        val k = w.mkString("->")
        counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val bruteTop = counts.toSeq.sortBy(t => (-t._2, t._1)).take(rows.length)
    assert(rows.map(t => (t._2, t._3)).toSeq === bruteTop, "top paths agree")
  }

  test("markov attribution: monotone removals, share normalization, VI replay") {
    val rows = ops.EventTime.markovAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === Seq("click", "error", "signup", "view"))
    val pBase = rows.head._2
    assert(rows.forall(_._2 === pBase), "one base probability")
    assert(pBase > 0.0 && pBase < 1.0)
    rows.foreach { case (_, pb, pr, re, _) =>
      assert(pr <= pb + 1e-9, "removal can only hurt conversion")
      assert(re >= 0.0 && re <= 1.0 + 1e-9)
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "shares normalize")
    // replay the base chain's value iteration in plain doubles from the
    // journey-derived edge counts
    val dayFmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    dayFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        (r.getLong(0), dayFmt.format(t),
          t.getTime / 1000 * 1000000L + t.getNanos / 1000, r.getLong(2), r.getString(3))
      }
    val edges = scala.collection.mutable.Map[(String, String), Long]()
    ev.groupBy(t => (t._1, t._2)).values.foreach { g =>
      val seq0 = g.sortBy(t => (t._3, t._4)).map(_._5)
      val cut = seq0.indexOf("purchase")
      val states = (if (cut >= 0) seq0.take(cut + 1) else seq0)
        .map(t => if (t == "purchase") "CONV" else t)
      def inc(a: String, b: String): Unit =
        edges((a, b)) = edges.getOrElse((a, b), 0L) + 1
      inc("START", states.head)
      states.sliding(2).filter(_.length == 2).foreach(w => inc(w(0), w(1)))
      if (states.last != "CONV") inc(states.last, "NULL")
    }
    val srcs = edges.keys.map(_._1).toSet
    var p = srcs.map(_ -> 0.0).toMap
    for (_ <- 1 to 40) {
      p = srcs.map { s0 =>
        val out = edges.filter(_._1._1 == s0)
        val tot = out.values.sum.toDouble
        s0 -> out.map { case ((_, dto), c) =>
          val pv = if (dto == "CONV") 1.0 else if (dto == "NULL") 0.0 else p(dto)
          c * pv
        }.sum / tot
      }.toMap
    }
    assert(math.abs(pBase - p("START")) < 1e-3, s"base P: $pBase vs ${p("START")}")
  }

  test("MDE: positive, replayed from per-user stats, and power-consistent") {
    val r = ops.Statistics.abMde(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (n0, n1) = (row.getLong(0), row.getLong(1))
    val (sd, mde) = (row.getDouble(4), row.getDouble(5))
    assert(n0 > 0 && n1 > 0 && sd > 0.0 && mde > 0.0)
    // brute replay in plain doubles
    val per = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(24,6)")).cast("double").as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
      .collect().map(r2 => (r2.getLong(0) % 2, r2.getDouble(1)))
    val g = per.groupBy(_._1).map { case (a, xs) =>
      val ys = xs.map(_._2); val m = ys.sum / ys.length
      a -> (ys.length, ys.map(y => (y - m) * (y - m)).sum)
    }
    val sp2 = (g(0L)._2 + g(1L)._2) / (g(0L)._1 + g(1L)._1 - 2).toDouble
    val expect = (1.959964 + 0.841621) * math.sqrt(sp2 * (1.0 / g(0L)._1 + 1.0 / g(1L)._1))
    assert(math.abs(mde - expect) < 1e-4, s"mde $mde vs $expect")
    assert(math.abs(sd - math.sqrt(sp2)) < 1e-4)
  }

  test("ECE/MCE recompose from the calibration bins; ECE <= MCE") {
    val bins = ops.Evaluation.calibrationBins(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(5)))
    val r = ops.Evaluation.ece(spark, sf).collect().head
    val (nBins, nTotal, e, m) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(nBins === bins.length.toLong)
    assert(nTotal === bins.map(_._1).sum)
    val brute = bins.map { case (n, g) => n * math.abs(g) }.sum / nTotal
    assert(math.abs(e - brute) < 1e-5, s"ece $e vs $brute")
    assert(math.abs(m - bins.map(x => math.abs(x._2)).max) < 1e-5)
    assert(e >= 0.0 && e <= m + 1e-12)
  }

  test("isotonic fit: nondecreasing, mass-preserving, matches scan-PAV") {
    val rows = ops.Evaluation.isotonicFit(spark, sf).collect()
      .sortBy(_.getLong(0))
    val iso = rows.map(_.getDouble(4))
    iso.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, s"iso not monotone: ${iso.toSeq}")
    }
    // weighted L2 isotonic regression preserves total mass
    val mass = rows.map(r => r.getLong(1) * r.getDouble(4)).sum
    val pos = rows.map(_.getLong(2)).sum
    assert(math.abs(mass - pos) < pos * 1e-4, s"mass $mass vs positives $pos")
    // brute PAV by stack pooling over the same bins
    case class Block(var n: Long, var p: Long)
    val st = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      st.append(Block(r.getLong(1), r.getLong(2)))
      while (st.length > 1 &&
        st(st.length - 2).p.toDouble * st.last.n >= st.last.p.toDouble * st(st.length - 2).n) {
        val b = st.remove(st.length - 1)
        st.last.n += b.n; st.last.p += b.p
      }
    }
    // expand blocks back to per-bin fitted values
    val fitted = scala.collection.mutable.ArrayBuffer.empty[Double]
    var idx = 0
    st.foreach { b =>
      var cnt = 0L
      while (cnt < b.n) { val nb = rows(idx).getLong(1); fitted.append(b.p.toDouble / b.n); cnt += nb; idx += 1 }
    }
    assert(fitted.length === rows.length)
    iso.zip(fitted).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-5, s"bin $i: minimax $a vs PAV $b")
    }
  }

  test("average precision: exact driver replay per source") {
    val got = ops.Evaluation.avgPrecision(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val ranked = xs.sortBy(x => (-x._3, x._2))
      var cum = 0L; var k = 0L; var terms = List.empty[Double]
      ranked.foreach { x =>
        k += 1
        if (x._4 == "en") { cum += 1
          terms ::= math.floor(cum.toDouble / k * 1e6 + 0.5) / 1e6 }
      }
      if (terms.nonEmpty) {
        val (np, ap) = got(src)
        assert(np === cum, s"$src n_pos")
        val brute = terms.sum / np
        assert(math.abs(ap - brute) < 1e-5, s"$src ap $ap vs $brute")
      } else assert(!got.contains(src))
    }
  }

  test("brier: per-doc squared-error replay, proper-score bounds") {
    val row = ops.Evaluation.brier(spark, sf).collect().head
    val docs = Tables.documents(spark, sf).select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1.0 else 0.0))
    val n = docs.length
    // min-rank percent scores: prev = count of strictly smaller values
    val counts = docs.groupBy(_._1).map { case (v, xs) => v -> xs.length }
    var acc = 0L
    val prevBy = counts.keys.toSeq.sorted.map { v =>
      val p = acc; acc += counts(v); v -> p }.toMap
    val bruteSe = docs.map { case (v, y) =>
      val s = prevBy(v).toDouble / (n - 1)
      (s - y) * (s - y)
    }.sum
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === docs.count(_._2 == 1.0).toLong)
    // the quantized decimal sum tracks the raw double sum to ~1e-6
    assert(math.abs(row.getDouble(2) - bruteSe / n) < 1e-5, "brier replay")
    val p = row.getLong(1).toDouble / n
    assert(math.abs(row.getDouble(3) - math.floor(p * (1 - p) * 1e6 + 0.5) / 1e6)
      < 1e-12)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0 + 1e-9)
    // skill = 1 - BS/BS_ref consistency
    assert(math.abs(row.getDouble(4) -
      (1.0 - (bruteSe / n) / (p * (1 - p)))) < 1e-4, "skill consistency")
  }

  test("eb shrink: prior replay from integer moments, shrinkage laws") {
    val rows = ops.Evaluation.ebShrink(spark, sf).collect()
    assert(rows.nonEmpty)
    val per = rows.map(r => (r.getLong(1), r.getLong(2)))
    val k = per.length.toLong
    val rs = per.map { case (n, c) => c * 1000000L / n }
    val sr = rs.sum; val sr2 = rs.map(r => BigInt(r) * r).sum
    val m = (sr / k).toDouble / 1e6
    val v = (BigInt(k) * sr2 - BigInt(sr) * sr).toDouble /
      ((k * (k - 1)).toDouble * 1e12)
    val q6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    val fitOk = v > 0.0 && (m * (1 - m) / v - 1.0) > 0.0
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val raw = q6(c.toDouble / n)
      assert(r.getDouble(3) === raw)
      if (fitOk) {
        val ab = m * (1 - m) / v - 1.0
        val alpha = q6(m * ab); val beta = q6((1 - m) * ab)
        assert(r.getDouble(4) === alpha && r.getDouble(5) === beta)
        val shrunk = r.getDouble(6)
        assert(shrunk === q6((c + alpha) / (n + alpha + beta)), "shrink replay")
        // shrinkage pulls TOWARD the prior mean alpha/(alpha+beta)
        val priorMean = alpha / (alpha + beta)
        val lo = math.min(raw, priorMean) - 1e-6
        val hi = math.max(raw, priorMean) + 1e-6
        assert(shrunk >= lo && shrunk <= hi,
          s"${r.getString(0)}: $shrunk outside [$lo, $hi]")
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5))
        assert(r.getDouble(6) === raw, "degenerate prior falls back to raw")
      }
    }
  }

  test("woe/iv: sign law, total is the exact sum of quantized terms") {
    val rows = ops.Evaluation.woeIv(spark, sf).collect()
    assert(rows.nonEmpty)
    val iv = rows.head.getAs[Double]("iv")
    rows.foreach(r => assert(r.getAs[Double]("iv") === iv, "iv constant"))
    var sum = BigDecimal(0)
    rows.foreach { r =>
      val (g, b) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
      assert(g > 0 && b > 0, "degenerate bins excluded")
      val woe = r.getAs[Double]("woe")
      val term = r.getAs[Double]("iv_term")
      // same-sign law: woe and (g/G - b/B) share a sign, so terms are >= 0
      assert(term >= -1e-12, s"bin ${r.getLong(0)}: IV term $term negative")
      sum += BigDecimal(term)
    }
    assert((sum - BigDecimal(iv)).abs < BigDecimal("1e-9"),
      "iv = exact sum of quantized terms")
    assert(iv >= 0.0)
  }

  test("gains: cumulative laws, anchors, lift identity") {
    val rows = ops.Evaluation.cumulativeGains(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty && rows.length <= 10)
    val nt = rows.map(_.getAs[Long]("n_bin")).sum
    val last = rows.last
    assert(last.getAs[Long]("cum_n") === nt, "full read reaches the corpus")
    assert(math.abs(last.getAs[Double]("gain") - 1.0) < 1e-6,
      "full read captures all positives")
    var prevGain = 0.0; var prevCum = 0L
    rows.foreach { r =>
      val g = r.getAs[Double]("gain")
      assert(g >= prevGain - 1e-12 && g <= 1.0 + 1e-9, "gain monotone in [0,1]")
      assert(r.getAs[Long]("cum_n") === prevCum + r.getAs[Long]("n_bin"))
      prevGain = g; prevCum = r.getAs[Long]("cum_n")
      if (!r.isNullAt(r.fieldIndex("lift"))) {
        val gt = math.round(last.getAs[Long]("cum_pos").toDouble)
        val brute = r.getAs[Long]("cum_pos").toDouble * nt /
          (r.getAs[Long]("cum_n").toDouble * gt)
        assert(math.abs(r.getAs[Double]("lift") - brute) < 1e-5, "lift identity")
      }
    }
  }
}
