package graft

import graft.ops.{Dedup, EventTime, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sweep-line / co-occurrence / cluster-shape
  * operators — the oracle proves cross-engine equality; these prove the
  * numbers mean what they claim, each against an independent brute-force
  * recomputation at sf0.001.
  */
class SweepLineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  private val Cover = 600L * 1000 * 1000

  test("interval union: bounds, and exact match vs brute-force merge per user") {
    val rows = EventTime.intervalUnion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, cov, contained) =>
      assert(cov >= Cover, s"user $u union below one interval")
      assert(cov <= n * Cover, s"user $u union exceeds disjoint sum")
      assert(contained < n, s"user $u: first event is never contained")
    }
    // brute force: merge sorted [ts, ts+10min) intervals in plain Scala
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expect = evs.map { case (u, ts) =>
      var covered = 0L
      var maxEnd = Long.MinValue
      ts.foreach { t =>
        val end = t + Cover
        if (end > maxEnd) { covered += end - math.max(t, if (maxEnd == Long.MinValue) t else maxEnd); maxEnd = end }
      }
      u -> covered
    }
    rows.foreach { case (u, _, cov, _) =>
      assert(cov == expect(u), s"user $u: operator $cov != brute force ${expect(u)}")
    }
  }

  test("lateness audit: totals partition the table and match brute-force replay") {
    val rows = EventTime.latenessAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum == total, "per-type counts must partition the table")
    rows.foreach { case (t, n, late, maxL, sumL) =>
      assert(late <= n)
      assert(maxL <= sumL)
      assert((late == 0) == (sumL == 0L), s"type $t: n_late and sum_late must agree on zero")
    }
    // brute force: replay each user's arrival order (event_id) in Scala
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val perType = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    evs.groupBy(_._1).foreach { case (_, es) =>
      var maxT = Long.MinValue
      es.sortBy(_._2).foreach { case (_, _, typ, t) =>
        if (maxT > t) perType(typ) += maxT - t
        maxT = math.max(maxT, t)
      }
    }
    rows.foreach { case (t, _, _, _, sumL) =>
      assert(sumL == perType(t), s"type $t: operator $sumL != brute force ${perType(t)}")
    }
  }

  test("co-purchase pairs: ordering, support floor, and brute-force counts") {
    val rows = Graph.copurchasePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n) =>
      assert(a < b, "canonical pair order")
      assert(n >= 2, "support floor")
    }
    // descending support with (a, b) tiebreak — the top-k order is total
    rows.sliding(2).foreach {
      case Array((a1, b1, n1), (a2, b2, n2)) =>
        assert(n1 > n2 || (n1 == n2 && (a1 < a2 || (a1 == a2 && b1 < b2))))
      case _ =>
    }
    // brute force the full pair-count map from the order→parts lists
    val orders = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    orders.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) counts((ps(i), ps(j))) += 1
    }
    rows.foreach { case (a, b, n) =>
      assert(counts((a, b)) == n, s"pair ($a,$b): operator $n != brute force ${counts((a, b))}")
    }
    // nothing with higher support was left out of the top-100
    val minReported = rows.map(_._3).min
    val missedHigher = counts.filter { case (p, c) => c > minReported && !rows.exists(r => (r._1, r._2) == p) }
    assert(missedHigher.isEmpty, s"pairs above the reported floor missing: $missedHigher")
  }

  test("component sizes: histogram partitions the corpus and matches the closure") {
    val hist = Dedup.componentSizes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(hist.map { case (sz, n) => sz * n }.sum == nDocs,
      "sum(size × n_clusters) must equal the corpus")
    // consistent with the closure it summarizes
    val sizes = Dedup.dedupClusters(spark, sf)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    val expect = sizes.groupBy(identity).view.mapValues(_.length.toLong).toMap
    hist.foreach { case (sz, n) =>
      assert(expect(sz) == n, s"size $sz: histogram $n != closure ${expect(sz)}")
    }
  }

  test("RI audit: all seven relations, intact fixture integrity, exact child counts") {
    val rows = ops.Maintenance.riAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 7)
    // TPC-H-shaped fixtures hold referential integrity: zero orphans/nulls
    rows.foreach { case (rel, (_, nNull, nOrph)) =>
      assert(nNull === 0L, s"$rel null FKs")
      assert(nOrph === 0L, s"$rel orphans")
    }
    assert(rows("lineitem.l_orderkey->orders")._1 === Tables.lineitem(spark, sf).count())
    assert(rows("orders.o_custkey->customer")._1 === Tables.orders(spark, sf).count())
    assert(rows("nation.n_regionkey->region")._1 === Tables.nation(spark, sf).count())
  }

  test("association rules: confidence/lift replay from raw supports") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = li.map(_._1).distinct.length
    val supp = li.groupBy(_._2).view.mapValues(_.length).toMap
    val pairCount = li.groupBy(_._1).values
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2).map(_.toSeq))
      .toSeq.groupBy(identity).view.mapValues(_.length).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rules = Graph.assocRules(spark, sf).collect()
    assert(rules.nonEmpty && rules.length <= 50)
    rules.foreach { r =>
      val (a, b, nab, na, nb) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(a !== b)
      assert(nab === pairCount(Seq(math.min(a, b), math.max(a, b))).toLong)
      assert(na === supp(a).toLong && nb === supp(b).toLong)
      assert(r.getDouble(5) === q6(nab.toDouble / na), "confidence replay")
      assert(r.getDouble(6) === q6(nOrders.toDouble * nab / (na.toDouble * nb)),
        "lift replay")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    // descending lift with full tiebreak
    rules.sliding(2).foreach {
      case Array(x, y) => assert(x.getDouble(6) >= y.getDouble(6))
      case _ =>
    }
  }
}
