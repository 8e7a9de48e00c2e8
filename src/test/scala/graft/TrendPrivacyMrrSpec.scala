package graft

import graft.ops.{Aggregations, Curation, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the trend / privacy / retrieval-eval trio —
  * cross-engine equality is the oracle's job; these pin the metric laws.
  */
class TrendPrivacyMrrSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("mrr: reciprocal law, bounds, and brute-force first-hit from the audited ranking") {
    val rows = Similarity.mrrLabel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val nProbes = Tables.embeddings(spark, sf).filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nProbes, "one row per probe")
    rows.foreach { case (qid, _, frn, nRel, rr) =>
      assert(frn >= 0 && frn <= 10)
      assert(nRel >= 0 && nRel <= 10)
      assert((frn == 0) == (nRel == 0L), s"qid $qid: rank-0 iff no relevant hit")
      assert(rr == (if (frn > 0) 1000000L / frn else 0L), s"qid $qid reciprocal law")
    }
    // brute force from the ranking the metric claims to summarize
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topk = Similarity.cosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expect = topk.groupBy(_._1).map { case (qid, ns) =>
      val hit = ns.filter(n => labels(n._3) == labels(qid)).map(_._2)
      qid -> (if (hit.isEmpty) 0 else hit.min)
    }
    rows.foreach { case (qid, _, frn, _, _) =>
      assert(frn == expect(qid), s"qid $qid: operator $frn != brute force ${expect(qid)}")
    }
  }

  test("l-diversity: partitions the corpus, bounded by the lang inventory, homogeneous classes flagged") {
    val rows = Curation.lDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val nDocs = Tables.documents(spark, sf).count()
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.map(_._3).sum == nDocs, "class sizes must partition the corpus")
    rows.foreach { case (src, bkt, n, l, below) =>
      assert(l >= 1 && l <= math.min(n, nLangs), s"($src,$bkt) l_div out of range")
      assert((below == 1) == (l < 2), s"($src,$bkt) flag law")
    }
    // brute force one flagged + one unflagged class
    val docs = Tables.documents(spark, sf)
      .select(col("source"), floor(col("n_chars") / lit(100)).cast("long").as("b"), col("lang"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getString(2)))
    val langSets = docs.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    rows.foreach { case (src, bkt, _, l, _) =>
      assert(langSets((src, bkt)) == l, s"($src,$bkt): distinct langs")
    }
  }

  test("trending parts: growth law, support, ordering, and window disjointness") {
    val rows = Aggregations.trendingParts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (p, rec, pri, g) =>
      assert(rec > 0 && pri > 0, s"part $p: both periods must have revenue")
      assert(g == rec * 1000 / pri, s"part $p: integer per-mille growth law")
    }
    rows.sliding(2).foreach {
      case Array((p1, _, _, g1), (p2, _, _, g2)) =>
        assert(g1 > g2 || (g1 == g2 && p1 < p2), "total order (growth desc, part asc)")
      case _ =>
    }
    // the two periods are disjoint halves of the trailing 60-day window:
    // recent + prior revenue can never exceed the part's total 60-day revenue
    val mx = Tables.lineitem(spark, sf)
      .agg(max(unix_micros(col("l_shipdate").cast("timestamp")))).collect()(0).getLong(0)
    val tot = Tables.lineitem(spark, sf)
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) > mx - 2 * 30L * 86400L * 1000000L)
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(24, 6))
        .multiply(lit(1000000L)).cast("long")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (p, rec, pri, _) =>
      assert(rec + pri == tot(p), s"part $p: periods must partition the 60-day window")
    }
  }
}
