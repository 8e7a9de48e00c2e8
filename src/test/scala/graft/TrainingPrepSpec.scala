package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-set preparation operators (beyond the
  * DuckDB oracle): mixing weights form a distribution, packing respects
  * the shard budget and in-order placement. */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("source mixing weights form a probability distribution over sources") {
    val df = ops.TrainingPrep.sourceMix(spark, sf).cache()
    val wsum = df.agg(sum("weight")).head().getDouble(0)
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    assert(df.filter(col("weight") <= 0).count() == 0)
    // temperature scaling compresses the range: max/min weight ratio must be
    // at most the raw count ratio (sqrt flattens), never more extreme
    val r = df.agg(max("n_docs"), min("n_docs"), max("weight"), min("weight")).head()
    val countRatio = r.getLong(0).toDouble / r.getLong(1)
    val weightRatio = r.getDouble(2) / r.getDouble(3)
    assert(weightRatio <= countRatio + 1e-9, s"weight ratio $weightRatio vs count ratio $countRatio")
  }

  test("token packing is gapless and in-order within each source") {
    val df = ops.TrainingPrep.tokenPack(spark, sf).cache()
    assert(df.filter(col("offset_in_shard") < 0 || col("offset_in_shard") >= 8192).count() == 0)
    // cum_before of each doc equals the previous doc's cum_before + n_tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")
    val gaps = df
      .withColumn("expected", lag(col("cum_before") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("cum_before") =!= col("expected"))
    assert(gaps.count() == 0)
    // shard ids are non-decreasing in doc order
    val bad = df.withColumn("prev_shard", lag("shard", 1, 0L).over(w))
      .filter(col("shard") < col("prev_shard"))
    assert(bad.count() == 0)
  }

  test("token apportionment: allocations sum EXACTLY to the budget, each within 1 of its quota") {
    val rows = ops.TrainingPrep.tokenApportion(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = 1000000L
    assert(rows.map(_.getLong(4)).sum === budget, "largest-remainder must restore the exact budget")
    rows.foreach { r =>
      val (quota, extra, alloc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(extra == 0L || extra == 1L)
      assert(alloc === quota + extra)
    }
    // quota-monotone in token mass: a strictly larger source never gets a
    // smaller base quota (floor of a monotone function)
    val byTokens = rows.sortBy(_.getLong(1))
    byTokens.map(_.getLong(2)).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "base quota not monotone in source size")
      case _ =>
    }
  }

  test("train split partitions every document exactly once, near the designed fractions") {
    val rows = ops.TrainingPrep.trainSplit(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    // exhaustive + disjoint: split is a single CASE over one hash — the
    // audit's doc counts must reconstruct the corpus exactly
    assert(rows.map(_.getLong(2)).sum === total)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === rows.length)
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // designed shares: test = 5/256, val = 5/256, train = 246/256 of the
    // hash space; a 4-sigma binomial envelope bounds the realized counts
    val p = 5.0 / 256
    val sd = math.sqrt(total * p * (1 - p))
    Seq("test", "val").foreach { s =>
      val n = bySplit.getOrElse(s, 0L).toDouble
      assert(math.abs(n - total * p) <= 4 * sd + 1,
        s"$s split ${n.toLong} outside 4-sigma of ${total * p}")
    }
    // determinism: the assignment is a pure key hash — rerun must be equal
    val again = ops.TrainingPrep.trainSplit(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("split leakage flags exactly the cross-split cells and conserves candidate pairs") {
    val rows = ops.TrainingPrep.splitLeakage(spark, sf).collect()
    assert(rows.nonEmpty)
    // is_leak is definitionally split_a != split_b, per row
    rows.foreach { r =>
      assert((r.getString(0) != r.getString(1)) === (r.getInt(3) == 1), r.toString)
    }
    // ordered split-pair cells are unique and pair counts are positive
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === rows.length)
    assert(rows.forall(_.getLong(2) > 0))
    // conservation: the audit's cells must total the dedup family's own
    // candidate-pair count — the audit rides the same banding, so a
    // mismatch means the split labels dropped or duplicated pairs
    val nPairs = graft.ops.Dedup.bandBucketsOf(Tables.documents(spark, sf)).as("x")
      .join(graft.ops.Dedup.bandBucketsOf(Tables.documents(spark, sf)).as("y"),
        org.apache.spark.sql.functions.col("x.bkey") === org.apache.spark.sql.functions.col("y.bkey") &&
          org.apache.spark.sql.functions.col("x.doc_id") < org.apache.spark.sql.functions.col("y.doc_id"))
      .select(org.apache.spark.sql.functions.col("x.doc_id"),
        org.apache.spark.sql.functions.col("y.doc_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum === nPairs)
  }

  test("concentration: bounds hold and every statistic replays exactly from source totals") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.TrainingPrep.concentration(spark, sf).collect().head
    val (n, total, hhi, gini, topShare) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // bounds: HHI and top share at least the uniform floor; Gini in [0, 1)
    assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9)
    assert(topShare >= 1.0 / n - 1e-9 && topShare <= 1.0 + 1e-9)
    assert(gini >= -1e-9 && gini < 1.0)
    // exact BigInt replay from the per-source token totals
    val ts = graft.ops.TrainingPrep.sourceMix(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(2))).sortBy(t => (t._2, t._1))
      .map(_._2)
    assert(n === ts.length.toLong && total === ts.sum)
    val bigT = BigInt(total)
    val hhiExp = ts.map(t => BigInt(t) * BigInt(t)).sum.toDouble / (total.toDouble * total.toDouble)
    val sumIt = ts.zipWithIndex.map { case (t, i) => BigInt(i + 1) * BigInt(t) }.sum
    val giniExp = (2 * sumIt - BigInt(n + 1) * bigT).toDouble / (n.toDouble * total.toDouble)
    assert(math.abs(hhi - hhiExp) < 5e-7 + 1e-9)
    assert(math.abs(gini - giniExp) < 5e-7 + 1e-9)
    assert(math.abs(topShare - ts.max.toDouble / total.toDouble) < 5e-7 + 1e-9)
  }

  test("Neyman allocation: sums exactly to budget, monotone in N_h * S_h") {
    val rows = graft.ops.TrainingPrep.neymanAlloc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sum === 1000L, "largest-remainder total is exact")
    // allocation order follows the weight order (ties aside)
    val byW = rows.sortBy(-_._4).map(_._5)
    assert(byW.zip(byW.tail).forall { case (a, b) => a + 1 >= b },
      "higher N_h*S_h never gets a materially smaller allocation")
    rows.foreach { case (_, nh, sd, w, alloc) =>
      assert(sd >= 0.0 && alloc >= 0L)
      assert(math.abs(w - nh * sd * 1e6) <= nh + 1e6,
        "weight is the quantized N_h * S_h product")
    }
  }

  test("cluster-safe split: zero cross-split candidate pairs, clusters never straddle, docs conserved") {
    val rows = ops.TrainingPrep.clusterSplit(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // the theorem the operator exists to enforce: every LSH candidate
    // pair is intra-cluster, clusters hash to one split, so leakage = 0
    rows.foreach(r => assert(r.getLong(4) === 0L, s"cross pairs in ${r.getString(0)}"))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "split partitions all docs")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "clusters cannot outnumber docs")
      assert(r.getLong(3) === r.getLong(1) * 1000000L / nDocs, "ppm law")
    }
    // the invariant cross_pairs = 0 RESTS on: label propagation reached
    // its fixpoint, so no candidate pair spans two clusters. Check it
    // directly — an early-stopped loop would pass the definitional laws
    // above but fail here
    import org.apache.spark.sql.functions.col
    val lab = graft.ops.Dedup.dedupClusters(spark, sf)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bb = graft.ops.Dedup.bandBucketsOf(Tables.documents(spark, sf))
    val spanning = bb.as("x").join(bb.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().collect()
      .count(r => lab(r.getLong(0)) != lab(r.getLong(1)))
    assert(spanning === 0, "a candidate pair spans two clusters — propagation not converged")
  }

  test("abc class: Pareto boundaries replay, classes partition the parts") {
    val rows = ops.TrainingPrep.abcClass(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // brute force from lineitem micro revenue
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(24, 6))
          * lit(1000000)).cast("long").as("m"))
      .groupBy("l_partkey").agg(sum("m").as("r")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tot = rev.map(x => BigInt(x._2)).sum
    var cum = BigInt(0)
    val classed = rev.sortBy(x => (-x._2, x._1)).map { case (_, r) =>
      cum += r
      val cls = if (cum * 5 <= tot * 4) "A"
      else if (cum * 20 <= tot * 19) "B" else "C"
      (cls, r)
    }
    val brute = classed.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.length.toLong, xs.map(x => BigInt(x._2)).sum) }
    assert(rows.keySet === brute.keySet)
    brute.foreach { case (c, (n, r)) =>
      val (gn, gr, ppm) = rows(c)
      assert(gn === n, s"class $c count")
      assert(BigInt(gr) === r, s"class $c revenue")
      assert(ppm === (r * 1000000 / tot).toLong, s"class $c ppm")
    }
    assert(rows.values.map(_._1).sum === rev.length.toLong, "classes partition")
    // the ppm shares respect the Pareto boundaries by construction
    if (rows.contains("A")) assert(rows("A")._3 <= 800000L)
    assert(rows.values.map(_._3).sum <= 1000000L, "floor divisions only lose")
  }
}
