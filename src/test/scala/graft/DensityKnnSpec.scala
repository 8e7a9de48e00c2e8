package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN-over-the-ε-graph and kNN label classification: role-partition
  * laws for the density clustering, and an exact driver-side replay of the
  * kNN vote over the small fixture corpus. */
class DensityKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("DBSCAN: role laws — degree threshold, cluster nullability, reps") {
    val rows = ops.Similarity.dbscan(spark, sf).collect()
    assert(rows.length === Tables.embeddings(spark, sf).count())
    val byRole = rows.groupBy(_.getString(2))
    // the ε/minPts choice must populate all three roles on the fixture
    assert(byRole.keySet === Set("core", "border", "noise"))
    rows.foreach { r =>
      val nn = r.getLong(1); val role = r.getString(2)
      val cl = if (r.isNullAt(3)) None else Some(r.getLong(3))
      role match {
        case "core" =>
          assert(nn >= 3, s"core ${r.getLong(0)} with degree $nn")
          assert(cl.exists(_ <= r.getLong(0)), s"core label above own id")
        case "border" =>
          assert(nn >= 1 && nn < 3, s"border ${r.getLong(0)} with degree $nn")
          assert(cl.nonEmpty)
        case "noise" =>
          assert(cl.isEmpty, s"noise ${r.getLong(0)} carries a cluster")
      }
    }
    // every cluster representative is a core vector labeled by itself
    val coreLabel = rows.filter(_.getString(2) == "core")
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.filter(!_.isNullAt(3)).map(_.getLong(3)).distinct.foreach { rep =>
      assert(coreLabel.get(rep).contains(rep), s"rep $rep not a self-labeled core")
    }
  }

  test("contrastive pairs: 5 pos + 5 neg per probe, disjoint, negatives dominated") {
    val rows = ops.Similarity.contrastivePairs(spark, sf).collect()
    val probes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size.toLong === probes)
    byProbe.foreach { case (qid, rs) =>
      val pos = rs.filter(_.getString(1) == "pos")
      val neg = rs.filter(_.getString(1) == "neg")
      assert(pos.length === 5 && neg.length === 5, s"$qid counts")
      assert(pos.map(_.getLong(3)).toSet.intersect(neg.map(_.getLong(3)).toSet).isEmpty,
        s"$qid role overlap")
      // no sampled id is a probe (held-out corpus only)
      rs.foreach(r => assert(r.getLong(3) % 50 != 0, s"$qid sampled a probe"))
      // positives are the candidate-set maximum: no negative beats the
      // weakest positive (rounded-cosine order with id tie-break)
      val minPos = pos.map(_.getDouble(4)).min
      neg.foreach { n =>
        assert(n.getDouble(4) <= minPos + 1e-12, s"$qid negative beats a positive")
      }
    }
  }

  test("kNN classify: exact driver replay of the 5-NN majority vote") {
    val got = ops.Similarity.knnClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val vecs = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))
    }.sortBy(_._1)
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var da = 0.0; var db = 0.0; var dp = 0.0
      var i = 0
      while (i < a.length) {
        da += a(i).toDouble * a(i); db += b(i).toDouble * b(i)
        dp += a(i).toDouble * b(i); i += 1
      }
      BigDecimal(dp / (math.sqrt(da) * math.sqrt(db)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // round 9: candidates come from the IVF serve shape — voters assigned
    // to their best cell, probes to their 2 nearest cells (never a probe
    // broadcast) — so the replay replicates the cell routing too
    val cents = vecs.filter(_._1 % 100 == 0)
    def cells(v: Array[Float], k: Int): Seq[Long] =
      cents.map { case (cid, cv, _) => (cid, cos4(cv, v)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k).map(_._1).toSeq
    val voters = vecs.filter(_._1 % 50 != 0)
    val assigned = voters.map { case (id, v, _) => id -> cells(v, 1).head }.toMap
    val probes = vecs.filter(_._1 % 50 == 0)
    assert(got.keySet === probes.map(_._1).toSet)
    probes.foreach { case (qid, qv, qlabel) =>
      val probeCells = cells(qv, 2).toSet
      val top = voters
        .filter { case (id, _, _) => probeCells(assigned(id)) }
        .map { case (id, v, lb) => (id, lb, cos4(v, qv)) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(5)
      val (pred, nv) = top.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (lb, n) => (-n, lb) }.head
      val r = got(qid)
      assert(r.getInt(1) === qlabel, s"$qid true_label")
      assert(r.getInt(2) === pred, s"$qid pred")
      assert(r.getLong(3) === nv.toLong, s"$qid votes")
      assert(r.getInt(4) === (if (pred == qlabel) 1 else 0))
    }
  }
}
