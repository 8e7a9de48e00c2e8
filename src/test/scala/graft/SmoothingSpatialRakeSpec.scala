package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 smoothing / spatial / keyword
  * operators — the oracle proves cross-engine equality; these prove the
  * numbers mean what they claim. */
class SmoothingSpatialRakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("EWMA alpha=1/2: closed integer form replays the recurrence EXACTLY") {
    val rows = ops.EventTime.ewmaSmooth(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, xs) =>
      val ordered = xs.sortBy(_._2)
      var s = ordered.head._3.toDouble
      assert(ordered.head._4 === s, s"$t day 1 seeds with n_1")
      ordered.tail.foreach { case (_, day, n, ewma) =>
        s = (n + s) / 2.0 // both ops exact: integer add stays < 2^53, /2 shifts
        assert(ewma === s, s"$t $day: $ewma != recurrence $s (must be bit-exact)")
      }
    }
  }

  test("Holt linear alpha=beta=1/2: the fold replays the recurrence bit-exactly") {
    val rows = ops.EventTime.holtLinear(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, xs) =>
      val ordered = xs.sortBy(_._2)
      var l = ordered.head._3.toDouble; var b = 0.0
      assert(ordered.head._4 === l && ordered.head._5 === 0.0,
        s"$t seeds (l, b) = (x1, 0)")
      ordered.tail.foreach { case (_, day, n, level, trend, fc) =>
        val nl = (n.toDouble + l + b) * 0.5
        b = ((nl - l) + b) * 0.5
        l = nl
        assert(level === l, s"$t $day level (must be bit-exact)")
        assert(trend === b, s"$t $day trend (must be bit-exact)")
        assert(fc === l + b, s"$t $day forecast")
      }
      // the zero-filled grid is contiguous per type
      assert(ordered.map(_._2).distinct.length === ordered.length)
    }
  }

  test("Hampel: 5-window order statistics replay, gate is the integer rule") {
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 1000000 + lit(0.5)).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = ops.EventTime.hampelFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = daily.groupBy(_._1).map { case (t, xs) =>
      t -> xs.sortBy(_._2) }
    val expected = byType.flatMap { case (t, xs) =>
      xs.indices.filter(i => i >= 2 && i <= xs.length - 3).map { i =>
        val win = (i - 2 to i + 2).map(j => xs(j)._3).sorted
        val med = win(2)
        val mad = (i - 2 to i + 2).map(j => math.abs(xs(j)._3 - med)).sorted.apply(2)
        (t, xs(i)._2) -> (xs(i)._3, med, mad)
      }
    }
    assert(rows.length === expected.size, "interior days only")
    rows.foreach { r =>
      val (x, med, mad) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === x && r.getLong(3) === med && r.getLong(4) === mad)
      val dev = math.abs(x - med)
      assert(r.getLong(5) === dev)
      assert(r.getInt(6) === (if (dev * 10000L > 44478L * mad) 1 else 0))
    }
  }

  test("Kneser-Ney: count replay, probability component bounds") {
    val rows = ops.TextAnalysis.kneserNey(spark, sf).collect()
    assert(rows.length === 20)
    // brute counts from the corpus
    val words = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(" ", -1).filter(_.nonEmpty).toSeq)
    val bigrams = words.flatMap(w => w.sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")))
    val c12 = bigrams.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val c1 = c12.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (w1, xs) => w1 -> (xs.map(_._2).sum, xs.length.toLong) }
    val nbw = c12.keys.toSeq.groupBy(_.split(" ")(1))
      .map { case (w2, xs) => w2 -> xs.length.toLong }
    val ntypes = c12.size.toLong
    var prev = Long.MaxValue
    rows.foreach { r =>
      val bg = r.getString(0)
      assert(r.getLong(1) === c12(bg), s"$bg c12")
      assert(r.getLong(1) <= prev, "sorted by count desc"); prev = r.getLong(1)
      val (cc1, nfw) = c1(bg.split(" ")(0))
      assert(r.getLong(2) === cc1 && r.getLong(3) === nfw)
      assert(r.getLong(4) === nbw(bg.split(" ")(1)))
      val q6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
      val pc = r.getLong(4).toDouble / ntypes
      val lam = 0.75 * nfw / cc1
      assert(r.getDouble(5) === q6(pc) && r.getDouble(6) === q6(lam))
      assert(r.getDouble(7) ===
        q6((c12(bg) - 0.75) / cc1 + (0.75 * nfw / cc1) * (r.getLong(4).toDouble / ntypes)))
      assert(r.getDouble(7) > 0.0 && r.getDouble(7) <= 1.0 + 1e-9)
      assert(r.getDouble(6) <= 0.75 + 1e-12, "lambda <= d")
    }
  }

  test("conditional entropy: decimal-log replay, conditioning reduces entropy") {
    val row = ops.TextAnalysis.condEntropy(spark, sf).collect().head
    val bigrams = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1).filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(_.mkString(" ")))
    val c12 = bigrams.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val c1 = c12.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val n = bigrams.length.toLong
    assert(row.getLong(0) === n)
    val qln = (x: Long) =>
      BigDecimal(math.round(math.log(x.toDouble) * 1e6)) / BigDecimal(1000000)
    val hsum = c12.map { case (g, c) =>
      BigDecimal(c) * (qln(c1(g.split(" ")(0))) - qln(c))
    }.sum
    val h = math.floor(hsum.toDouble / n * 1e6 + 0.5) / 1e6
    assert(row.getDouble(1) === h, "quantized-log entropy replay")
    // conditioning reduces entropy: H(W2|W1) <= H(W2) (same estimator)
    val c2 = c12.toSeq.groupBy(_._1.split(" ")(1))
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val hw2 = c12.map { case (g, c) =>
      BigDecimal(c) * (qln(n) - qln(c2(g.split(" ")(1))))
    }.sum.toDouble / n
    assert(h <= hw2 + 1e-6, s"H(W2|W1)=$h > H(W2)=$hw2")
    assert(row.getDouble(2) ===
      math.floor(math.exp(h) * 1e4 + 0.5) / 1e4, "perplexity = exp(H)")
    assert(row.getDouble(2) >= 1.0)
  }

  test("RAKE: phrases are stopword-free, scores replay from corpus word stats") {
    val stops = Set("the", "a", "of")
    val got = ops.TextAnalysis.rakeKeywords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 30)
    got.foreach { case (phrase, nWords, nOcc, score) =>
      val ws = phrase.split(" ")
      assert(ws.length === nWords)
      assert(nOcc >= 1)
      assert(ws.forall(w => !stops(w)), s"stopword inside phrase '$phrase'")
      assert(score > 0.0)
    }
    // brute replay: island segmentation + deg/freq scoring in plain Scala
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val phrases = docs.flatMap { t =>
      val words = t.split(" ").filter(_.nonEmpty)
      val acc = scala.collection.mutable.Buffer[List[String]]()
      var cur = List.empty[String]
      words.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) acc += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) acc += cur.reverse
      acc
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.length))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val bruteScore = phrases.map(p => p.mkString(" ") ->
      p.map(w => BigDecimal(q6(deg(w).toDouble / freq(w)))).sum).toMap
    val bruteOcc = phrases.map(_.mkString(" ")).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    got.foreach { case (phrase, _, nOcc, score) =>
      assert(nOcc === bruteOcc(phrase), s"'$phrase' occurrences")
      assert(score === q6(bruteScore(phrase).toDouble), s"'$phrase' score")
    }
    // top-30 really is the top: no unreported phrase outscores the floor
    val floorScore = got.map(_._4).min
    val missed = bruteScore.filter { case (p, s) =>
      q6(s.toDouble) > floorScore && !got.exists(_._1 == p)
    }
    assert(missed.isEmpty, s"phrases above the reported floor missing: ${missed.keys}")
  }

  test("geo grid kNN: neighbors come from the 3x3 neighborhood and are the true top-3 there") {
    def u(salt: String, k: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt$k".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(md.substring(0, 8), 16).toDouble + 0.5) / 4294967296.0
    }
    val keys = Tables.customer(spark, sf).select("c_custkey").collect().map(_.getLong(0))
    val pts = keys.map(k => k ->
      (u("lat:", k) * 180.0 - 90.0, u("lon:", k) * 360.0 - 180.0)).toMap
    def cell(p: (Double, Double)) =
      (math.floor(p._2 / 10.0).toLong, math.floor(p._1 / 10.0).toLong)
    val got = ops.Joins.geoGridKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (qid, xs) =>
      val (qc, qp) = (cell(pts(qid)), pts(qid))
      // membership: every reported neighbor is in the 3x3 neighborhood
      xs.foreach { case (_, _, nb, _) =>
        val nc = cell(pts(nb))
        assert(math.abs(nc._1 - qc._1) <= 1 && math.abs(nc._2 - qc._2) <= 1)
      }
      // optimality among the neighborhood candidate set
      val cands = keys.filter(k => k != qid && {
        val nc = cell(pts(k))
        math.abs(nc._1 - qc._1) <= 1 && math.abs(nc._2 - qc._2) <= 1
      }).map { k =>
        val p = pts(k)
        val d2 = (qp._1 - p._1) * (qp._1 - p._1) + (qp._2 - p._2) * (qp._2 - p._2)
        (d2, k)
      }.sorted.take(3)
      assert(xs.sortBy(_._2).map(_._3).toSeq === cands.map(_._2).toSeq,
        s"qid $qid: reported neighbors are not the candidate-set top-3")
      // ranks ascend with distance
      xs.sortBy(_._2).map(_._4).sliding(2).foreach {
        case Array(d1, d2) => assert(d1 <= d2)
        case _ =>
      }
    }
  }
}
