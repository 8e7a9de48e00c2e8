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
