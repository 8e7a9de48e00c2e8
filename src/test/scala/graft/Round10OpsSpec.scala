package graft

import graft.ops.{Similarity, TrainingPrep}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-10 wave-2 operators (the oracle
  * proves cross-engine equality; these prove the numbers mean what they
  * claim): MaxSim late-interaction retrieval and the deterministic
  * per-epoch training order.
  */
class Round10OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.01"

  test("maxsim: structure, bounds, and a brute-force replay") {
    val rows = Similarity.maxsim(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).toSeq.sorted == (1 to rs.length),
        s"ranks at $qid not 1..k")
      assert(rs.length <= 5)
      // MaxSim over 8 sub-cosines is bounded by ±8
      rs.foreach(r => assert(math.abs(r.getDouble(3)) <= 8.0))
      // scores non-increasing in rank
      val sc = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      sc.sliding(2).foreach(p => if (p.length == 2) assert(p(0) >= p(1)))
      assert(qid % 200 == 0)
    }
    // brute replay: same slices, same fold order, same quantize
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def subs(v: Array[Float]): Array[Array[Double]] =
      (0 until 8).map(i => v.slice(i * 8, i * 8 + 8).map(_.toDouble)).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k) * b(k); k += 1 }
      acc
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val qids = byQ.keySet
    qids.foreach { qid =>
      val qs = subs(emb(qid)); val qn = qs.map(nrm)
      val scored = emb.toSeq.filter(_._1 != qid).map { case (id, v) =>
        val ds = subs(v); val dn = ds.map(nrm)
        var acc = 0.0
        (0 until 8).foreach { i =>
          val mx = (0 until 8).map(j => dot(qs(i), ds(j)) / (qn(i) * dn(j))).max
          acc += math.floor(mx * 1000000 + 0.5) / 1000000
        }
        (id, acc)
      }.sortBy(x => (-x._2, x._1)).take(5)
      val got = byQ(qid).sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got.map(_._1) == scored.map(_._1), s"top-5 ids at $qid")
      got.zip(scored).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-9, s"score at $qid: $a vs $b") }
    }
  }

  test("maxsim rerank: bucket-filtered shortlist, scores replay maxsim's") {
    val rows = Similarity.maxsimRerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bucket(v: Array[Float]): String =
      (0 until 4).map(i => if (v(i) >= 0) '1' else '0').mkString
    def subs(v: Array[Float]): Array[Array[Double]] =
      (0 until 8).map(i => v.slice(i * 8, i * 8 + 8).map(_.toDouble)).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k) * b(k); k += 1 }
      acc
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def score(q: Long, c: Long): Double = {
      val qs = subs(emb(q)); val qn = qs.map(nrm)
      val ds = subs(emb(c)); val dn = ds.map(nrm)
      (0 until 8).map { i =>
        val mx = (0 until 8).map(j => dot(qs(i), ds(j)) / (qn(i) * dn(j))).max
        math.floor(mx * 1000000 + 0.5) / 1000000
      }.sum
    }
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(qid % 200 == 0)
      // full shortlist replay: bucket-mates ranked by (score desc, id)
      val mates = emb.keys.filter(c => c != qid &&
        bucket(emb(c)) == bucket(emb(qid))).toSeq
      val want = mates.map(c => (c, score(qid, c)))
        .sortBy(x => (-x._2, x._1)).take(5)
      val got = rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))
      assert(got.map(_._1).toSeq == want.map(_._1), s"shortlist at $qid")
      got.zip(want).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("maxsim recall: hit counts replay the two rankings' intersection") {
    val exact = Similarity.maxsim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rerank = Similarity.maxsimRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val rows = Similarity.maxsimRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rerank.groupBy(_._1)
    rows.foreach { r =>
      val qid = r.getLong(0)
      val cand = byQ(qid)
      assert(r.getLong(1) == cand.length.toLong, s"n_cand at $qid")
      val hits = cand.count(exact.contains)
      assert(r.getLong(2) == hits.toLong, s"n_hits at $qid")
      assert(math.abs(r.getDouble(3) - hits / 5.0) < 1e-15)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // every rerank query is accounted for
    assert(rows.map(_.getLong(0)).toSet == byQ.keySet)
  }

  test("epoch shift: footrule replay, ratio sane for independent permutations") {
    val ord = TrainingPrep.epochOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    val n = Tables.documents(spark, sf).count()
    val rows = TrainingPrep.epochShift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted == Seq(0, 1))
    val byEp = ord.groupBy(_._1).map { case (e, xs) =>
      e -> xs.map(x => x._2 -> x._3).toMap }
    rows.foreach { r =>
      val e = r.getInt(0)
      val fr = byEp(e).map { case (id, p) => math.abs(p - byEp(e + 1)(id)) }.sum
      assert(r.getLong(1) == byEp(e).size.toLong)
      assert(r.getLong(2) == fr, s"footrule at $e")
      assert(math.abs(r.getDouble(3) - fr.toDouble / byEp(e).size) < 1e-12)
      assert(math.abs(r.getDouble(4) -
        3.0 * fr / (byEp(e).size.toLong * n)) < 1e-12)
      // two independent permutations: mean displacement well above 0 and
      // below the n bound (the ≈ n/3 expectation sits in the middle)
      assert(r.getDouble(4) > 0.1 && r.getDouble(4) < 3.0, s"ratio ${r.getDouble(4)}")
    }
  }

  test("hop histogram: strong-backbone BFS replay, monotone cum, p90 rule") {
    import graft.ops.Graph
    val rows = Graph.hopHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // cum is the running sum; p90 flag is exactly the 10·cum >= 9·total rule
    var run = 0L
    rows.foreach { case (_, n, cum, p90) =>
      run += n
      assert(cum == run, "cumulative mismatch")
      assert(p90 == (10 * cum >= 9 * total), "p90 rule mismatch")
    }
    // replay: strong lanes (w·nl > tw), undirected BFS from every node
    val e = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val tw = e.map(_._3).sum; val nl = e.length.toLong
    val strong = e.filter(x => x._3 * nl > tw).map(x => (x._1, x._2))
    val adj = (strong ++ strong.map(x => (x._2, x._1))).filter(x => x._1 != x._2)
      .distinct.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    val hist = scala.collection.mutable.Map[Long, Long]()
    (0 until 25).foreach { s0 =>
      val dist = scala.collection.mutable.Map(s0 -> 0)
      var q = scala.collection.immutable.Queue(s0)
      while (q.nonEmpty) {
        val (u, rest) = q.dequeue
        q = rest
        adj.getOrElse(u, Nil).foreach { v =>
          if (!dist.contains(v)) { dist(v) = dist(u) + 1; q = q.enqueue(v) }
        }
      }
      dist.foreach { case (v, dd) =>
        if (v != s0) hist(dd.toLong) = hist.getOrElse(dd.toLong, 0L) + 1 }
    }
    assert(rows.map(r => r._1 -> r._2).toMap == hist.toMap, "histogram replay")
  }

  test("forecast error: agrees with seasonal-naive masses, metric laws") {
    import graft.ops.EventTime
    val sn = EventTime.seasonalNaive(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = EventTime.forecastError(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == sn.size)
    rows.foreach { r =>
      val t = r.getString(0)
      val (nh, na, sae) = sn(t)
      // the error masses are the forecaster's own
      assert(r.getLong(1) == nh && r.getLong(2) == na && r.getLong(3) == sae)
      if (!r.isNullAt(4)) {
        val wape = r.getDouble(4)
        assert(math.abs(wape -
          math.floor(sae.toDouble / na * 1e6 + 0.5) / 1e6) < 1e-15)
        assert(wape >= 0.0)
      }
      val smape = r.getDouble(5)
      assert(smape >= 0.0 && smape <= 2.0, s"smape $smape out of [0,2]")
      if (!r.isNullAt(6)) assert(r.getDouble(6) > 0.0 || sae == 0L)
    }
  }

  test("rbo: replay from the two rankings, bounds, identity on self") {
    val ms = Similarity.maxsim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
    val ct = Similarity.cosineTopk(spark, sf).collect()
      .filter(r => r.getInt(1) <= 5 && r.getLong(0) % 200 == 0)
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    val w = Seq(100000L, 90000L, 81000L, 72900L, 65610L)
    val cm = (1 to 5).map(m => (m to 5).map(d => w(d - 1) * (60 / d)).sum)
    val max = cm.sum
    val rows = Similarity.rboRankings(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qid = r.getLong(0)
      val pairs = ms.filter(_._1 == qid)
      val matched = pairs.flatMap { case (_, vid, ra) =>
        ct.get((qid, vid)).map(rb => math.max(ra, rb)) }
      assert(r.getLong(1) == matched.length.toLong, s"n_common at $qid")
      val score = matched.map(m => cm(m - 1)).sum
      assert(r.getLong(2) == score, s"score at $qid")
      val rbo = r.getDouble(3)
      assert(math.abs(rbo - score.toDouble / max) < 1e-15)
      assert(rbo >= 0.0 && rbo <= 1.0)
    }
    // identity: a ranking's RBO against itself is exactly 1
    assert(cm.sum == max && max == 24570600L)
  }

  test("minhash PR sweep: confusion replay from the estimate audit") {
    import graft.ops.Dedup
    val est = Dedup.minhashEstimate(spark, sf).collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    val rows = Dedup.minhashPr(spark, sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.2, 0.4, 0.6, 0.8))
    rows.foreach { r =>
      val t = r.getDouble(0)
      val tp = est.count { case (e, x) => e >= t && x >= t }.toLong
      val fp = est.count { case (e, x) => e >= t && x < t }.toLong
      val fn = est.count { case (e, x) => e < t && x >= t }.toLong
      assert(r.getLong(1) == est.length.toLong)
      assert(r.getLong(2) == tp && r.getLong(3) == fp && r.getLong(4) == fn)
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        == est.length.toLong)
      if (!r.isNullAt(6)) {
        val p = r.getDouble(6)
        assert(p >= 0.0 && p <= 1.0)
        assert(math.abs(p - math.floor(tp.toDouble / (tp + fp) * 1e6 + 0.5) / 1e6)
          < 1e-12)
      }
      if (!r.isNullAt(7)) {
        val rec = r.getDouble(7)
        assert(math.abs(rec - math.floor(tp.toDouble / (tp + fn) * 1e6 + 0.5) / 1e6)
          < 1e-12)
      }
    }
  }

  test("media compare: flag replay, containment laws, constant row total") {
    import graft.ops.Multimodal
    val rows = Multimodal.mediaCompare(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size == 6)
    val n = Tables.documents(spark, sf).count()
    rows.values.foreach { case (b, oa, ob, ne) => assert(b + oa + ob + ne == n) }
    // exact digest collision implies ahash collision implies near membership
    assert(rows(("ahash", "exact"))._3 == 0, "exact dup without ahash dup")
    assert(rows(("ahash", "near"))._2 == 0, "ahash dup without near membership")
    assert(rows(("exact", "near"))._2 == 0, "exact dup without near membership")
    // replay the four flags from the standalone queries' own outputs
    val ah = Multimodal.mediaAhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3) > 1)).toMap
    val ph = Multimodal.mediaPhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3) > 1)).toMap
    val nd = Multimodal.mediaNeardup(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val ex = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exN = ex.groupBy(_._2).iterator
      .flatMap { case (_, xs) => xs.map(x => x._1 -> (xs.length > 1)) }.toMap
    def flag(m: String, id: Long): Long = m match {
      case "exact" => if (exN(id)) 1L else 0L
      case "ahash" => if (ah(id)) 1L else 0L
      case "phash" => if (ph(id)) 1L else 0L
      case "near"  => if (nd(id)) 1L else 0L
    }
    rows.foreach { case ((a, b), (nb, noa, nob, nn)) =>
      val ids = ex.map(_._1)
      assert(nb == ids.count(i => flag(a, i) == 1 && flag(b, i) == 1).toLong)
      assert(noa == ids.count(i => flag(a, i) == 1 && flag(b, i) == 0).toLong)
      assert(nob == ids.count(i => flag(a, i) == 0 && flag(b, i) == 1).toLong)
      assert(nn == ids.count(i => flag(a, i) == 0 && flag(b, i) == 0).toLong)
    }
  }

  test("cluster topics: cell partition, chi2 replay for every reported term") {
    val rows = Similarity.clusterTopics(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 100 == 0, "cid is a centroid id")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 3)
      assert(r.getDouble(6) >= 0.0)
      assert(r.getLong(3) <= r.getLong(5) && r.getLong(3) <= r.getLong(4))
    }
    // replay the assignment (argmax quantized cosine, tie -> smallest cid)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k) * b(k); k += 1 }
      acc
    }
    val cents = emb.filter(_._1 % 100 == 0)
    val asg = emb.map { case (id, v) =>
      val nv = math.sqrt(dot(v, v))
      id -> cents.map { case (cid, cv) =>
        val c = math.floor(dot(v, cv) / (nv * math.sqrt(dot(cv, cv)))
          * 10000 + 0.5) / 10000
        (c, -cid)
      }.max._2 * -1
    }.toMap
    // cell sizes reported = replayed partition sizes
    val sizes = asg.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    rows.foreach(r => assert(r.getLong(5) == sizes(r.getLong(0)), s"n_cell at $r"))
    // chi2 replay from doc-presence sets
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val nn = asg.size.toLong
    rows.foreach { r =>
      val (cid, word) = (r.getLong(0), r.getString(2))
      val n11 = docs.count { case (id, ws) => asg(id) == cid && ws(word) }.toLong
      val nw = docs.count { case (id, ws) => ws(word) }.toLong
      val nc = sizes(cid)
      assert(r.getLong(3) == n11 && r.getLong(4) == nw)
      val det = BigDecimal(n11) * BigDecimal(nn - nc - (nw - n11)) -
        BigDecimal(nc - n11) * BigDecimal(nw - n11)
      val chi = if (nw < nn && nc < nn)
        math.floor((BigDecimal(nn) * det * det).toDouble /
          (BigDecimal(nw) * BigDecimal(nn - nw) * BigDecimal(nc) *
            BigDecimal(nn - nc)).toDouble * 1000000.0 + 0.5) / 1000000.0
      else 0.0
      assert(math.abs(r.getDouble(6) - chi) < 1e-9, s"chi2 at ($cid, $word)")
    }
  }

  test("epoch order: positions are exact ranks, reproducible, epoch-distinct") {
    val rows = TrainingPrep.epochOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { case (_, id, _, pos) =>
      assert(id % 97 == 0)
      assert(pos >= 1 && pos <= nDocs, s"pos $pos out of range")
    }
    // replay: rank of each sample doc within its epoch's (h, doc_id) order
    val keyed = Tables.documents(spark, sf).select(col("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0), lit(2))))
      .withColumn("h", md5(concat(lit("ep"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))))
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getString(2)))
    val byEpoch = keyed.groupBy(_._1).map { case (e, xs) =>
      e -> xs.map(x => (x._3, x._2)).sorted.zipWithIndex
        .map { case ((_, id), idx) => id -> (idx + 1L) }.toMap
    }
    rows.foreach { case (e, id, _, pos) =>
      assert(byEpoch(e)(id) == pos, s"epoch $e doc $id")
    }
    // the permutation actually changes between epochs for the sample
    val sample = rows.groupBy(_._2)
    assert(sample.values.exists(rs => rs.map(_._4).distinct.length > 1),
      "every sample doc kept the same position across all epochs")
    // and each epoch's sampled positions are distinct (a total order)
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._4).distinct.length == rs.length)
    }
  }
}
