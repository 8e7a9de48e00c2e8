package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-4 corpus metrics: Shannon entropy bounds,
  * deterministic mode, and asymmetric containment vs Jaccard. */
class CorpusMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("per-source entropy obeys 0 <= H <= log2(vocab)") {
    val rows = ops.TextAnalysis.entropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vocab, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= -1e-4, s"negative entropy $h")
      assert(h <= math.log(vocab.toDouble) / math.log(2.0) + 1e-4,
        s"entropy $h above log2($vocab)")
    }
  }

  test("entropy of a uniform distribution is exactly log2(k)") {
    // independent recomputation on a constructed frame via the same
    // algebraic form: H = log2(N) - sum(c*log2 c)/N with c all equal
    val k = 16; val c = 8
    val n = k * c
    val h = math.log(n.toDouble) / math.log(2.0) -
      k * (c * (math.log(c.toDouble) / math.log(2.0))) / n
    assert(math.abs(h - math.log(k.toDouble) / math.log(2.0)) < 1e-9)
  }

  test("deterministic mode is the argmax of the value-count table") {
    val modes = ops.Aggregations.modeDet(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val counts = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    counts.foreach { case (flag, rows) =>
      val best = rows.map { case (_, q, c) => (c, q) }
        .sortBy { case (c, q) => (-c, q) }.head
      assert(modes(flag) === ((best._2, best._1)), s"mode mismatch for $flag")
    }
  }

  test("containment dominates Jaccard on every shared pair and is <= 1") {
    val cont = ops.Dedup.containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(5), r.getDouble(6), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val jac = ops.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    cont.foreach { case (pair, (cab, cba, inter, n1, n2)) =>
      assert(cab > 0 && cab <= 1.0 + 1e-9 && cba > 0 && cba <= 1.0 + 1e-9)
      assert(inter <= math.min(n1, n2), "intersection cannot exceed either set")
      // containment >= jaccard always: |A∩B|/|A| >= |A∩B|/|A∪B|.
      // Tolerance is two half-ulps of the 4-dp rounding both values carry.
      jac.get(pair).foreach { j =>
        assert(math.max(cab, cba) >= j - 1e-4,
          s"containment below jaccard for $pair")
      }
    }
    assert(cont.nonEmpty, "fixture's planted near-dups must surface")
  }

  test("JSD: bounded in [0,1] bits, complete pair frame, self-divergence is 0") {
    val rows = ops.TextAnalysis.jsDivergence(spark, sf).collect()
    val srcs = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length === (srcs * (srcs - 1) / 2).toInt, "one row per unordered pair")
    rows.foreach { r =>
      val jsd = r.getDouble(3)
      // 1e-4 headroom: each of the ~vocab quantized log terms carries a
      // half-ulp of its 6-dp round, so the aggregate can poke past the
      // analytic bound by the accumulated quantization, never more
      assert(jsd >= -1e-4 && jsd <= 1.0 + 1e-4, s"JSD out of [0,1]: $r")
      assert(r.getLong(2) >= 0)
    }
    // identity law, via the same quantized pipeline run source-vs-twin:
    // a distribution against an identical copy has la = lb = log2(1) = 0
    // on every shared term and no exclusive mass, so jsd must be exactly 0
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val twin = docs.union(docs.withColumn("source", concat(col("source"), lit("_twin"))))
    val selfRows = ops.TextAnalysis.jsDivergenceFrom(twin)
      .filter(col("src_b") === concat(col("src_a"), lit("_twin")))
      .collect()
    assert(selfRows.nonEmpty)
    selfRows.foreach(r => assert(r.getDouble(3) === 0.0, s"self-JSD nonzero: $r"))
  }

  test("Heaps fit replays log-log OLS over per-source (tokens, types)") {
    val r = ops.TextAnalysis.heapsFit(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val pts = Tables.documents(spark, sf).select("source", "text").collect()
      .map(x => (x.getString(0), x.getString(1)))
      .groupBy(_._1).map { case (_, xs) =>
        val words = xs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        (math.log(words.length.toDouble), math.log(words.distinct.length.toDouble))
      }.toArray
    assert(row.getLong(0) === pts.length.toLong)
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(row.getDouble(1) - beta) < 1e-3, s"beta ${row.getDouble(1)} vs $beta")
    assert(math.abs(row.getDouble(2) - (sy - beta * sx) / n) < 1e-3, "intercept")
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(row.getDouble(3) - r2) < 1e-3, "r2")
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0 + 1e-9)
  }

  test("readability replays the Flesch formula from JVM-side counts") {
    val got = ops.TextAnalysis.readability(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val brute = docs.groupBy(_._1).map { case (src, xs) =>
      val per = xs.map { case (_, t) =>
        val sent = math.max(1, t.count(c => c == '.' || c == '!' || c == '?'))
        val nw = t.split(" ", -1).count(_.nonEmpty)
        val low = t.toLowerCase
        val vg = "[aeiou]+".r.findAllIn(low).length
        (sent.toLong, nw.toLong, math.max(nw, vg).toLong)
      }
      src -> (xs.length.toLong, per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
    }
    got.foreach { case (src, (nd, sent, nw, syl, fl)) =>
      val (bd, bs, bw, by) = brute(src)
      assert((nd, sent, nw, syl) === ((bd, bs, bw, by)), s"counts $src")
      val expect = 206.835 - 1.015 * (nw.toDouble / sent) - 84.6 * (syl.toDouble / nw)
      assert(math.abs(fl - expect) < 1e-3, s"flesch $src: $fl vs $expect")
    }
  }

  test("Simpson diversity: probability identity replayed per source") {
    val counts = Tables.documents(spark, sf).groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = ops.TextAnalysis.simpsonDiversity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    counts.groupBy(_._1).foreach { case (src, xs) =>
      val (n, nl, simp) = got(src)
      assert(n === xs.map(_._3).sum)
      assert(nl === xs.length.toLong)
      val brute = 1.0 - xs.map(x => x._3 * (x._3 - 1)).sum.toDouble / (n * (n - 1))
      assert(math.abs(simp - brute) < 1e-5, s"$src: $simp vs $brute")
      assert(simp >= 0.0 && simp < 1.0)
    }
  }

  test("term chi-square: 2x2 identity replayed for every reported term") {
    val dw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nn = Tables.documents(spark, sf).count()
    val nlM = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nwM = dw.map(x => (x._3, x._1)).distinct.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val n11M = dw.map(x => ((x._3, x._2), x._1)).distinct.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val got = ops.TextAnalysis.termChi2(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lang, rn, w, n11, nw, nl, chi2) = (r.getString(0), r.getInt(1),
        r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(rn >= 1 && rn <= 5)
      assert(n11 === n11M((w, lang)) && nw === nwM(w) && nl === nlM(lang))
      val n10 = nl - n11; val n01 = nw - n11; val n00 = nn - nl - n01
      val det = (BigInt(n11) * n00 - BigInt(n10) * n01).toDouble
      val brute =
        if (nw == nn) 0.0
        else nn.toDouble * det * det /
          (nw.toDouble * (nn - nw) * nl.toDouble * (nn - nl))
      assert(math.abs(chi2 - brute) < 1e-4, s"$lang/$w: $chi2 vs $brute")
      assert(chi2 >= 0.0 && chi2 <= nn.toDouble + 1e-9)
    }
  }

  test("Hellinger: bounds, complete pair frame, brute BC replay, self-distance 0") {
    val rows = ops.TextAnalysis.hellinger(spark, sf).collect()
    val srcs = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length === (srcs * (srcs - 1) / 2).toInt, "one row per unordered pair")
    rows.foreach { r =>
      val (bc, h) = (r.getDouble(3), r.getDouble(4))
      assert(bc >= 0.0 && bc <= 1.0 + 1e-4, s"BC out of range: $r")
      assert(h >= 0.0 && h <= 1.0 + 1e-9, s"H out of range: $r")
      // H and BC are tied: H = sqrt(1 - BC) up to the 6-dp rounds
      assert(math.abs(h - math.sqrt(math.max(0.0, 1.0 - bc))) < 1e-5)
    }
    // brute BC on the lexicographically first pair
    val tc = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("source", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySrc = tc.groupBy(_._1._1)
    val (sa, sb) = { val ks = bySrc.keys.toSeq.sorted; (ks(0), ks(1)) }
    val na = bySrc(sa).values.sum.toDouble; val nb = bySrc(sb).values.sum.toDouble
    val bcBrute = bySrc(sa).map { case ((_, t), ca) =>
      tc.get((sb, t)).map(cb => math.sqrt(ca.toDouble * cb / (na * nb))).getOrElse(0.0)
    }.sum
    val got = rows.find(r => r.getString(0) == sa && r.getString(1) == sb).get.getDouble(3)
    assert(math.abs(got - bcBrute) < 1e-3, s"BC $got vs brute $bcBrute")
    // identity law via the twin-corpus construction (the JSD test's):
    // identical distributions give sqrt(ca*cb) = ca exactly per term, so
    // BC rounds to exactly 1 and H to exactly 0
    import org.apache.spark.sql.functions.{concat, lit => flit}
    val docs = Tables.documents(spark, sf)
    // hellinger(s, d) reads the table itself; replay its body over a twin
    // frame through the public seam used by jsDivergenceFrom's law test
    val twin = docs.union(docs.withColumn("source", concat(col("source"), flit("_twin"))))
    val selfRows = ops.TextAnalysis.hellingerFrom(twin)
      .filter(col("src_b") === concat(col("src_a"), flit("_twin")))
      .collect()
    assert(selfRows.nonEmpty)
    selfRows.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"self-BC not 1: $r")
      assert(r.getDouble(4) === 0.0, s"self-H nonzero: $r")
    }
  }
}
