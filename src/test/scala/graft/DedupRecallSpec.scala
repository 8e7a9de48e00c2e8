package graft

import graft.functions.TextFeatures._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall/precision harness for the production-parameter MinHash dedup
  * (r=4, b=16, 64 permutations) against exact 3-shingle-Jaccard ground
  * truth on the fixture's planted near-duplicates (VERDICT round-2 item 1).
  *
  * The S-curve at (r=4, b=16) has its 50% point at (1/16)^(1/4) ≈ 0.5
  * Jaccard: pairs at ≥ 0.8 collide in some band with p ≈ 0.9998, pairs at
  * ≤ 0.2 with p ≤ 2.5% — so the assertions below (≥95% recall of ≥0.8
  * pairs, ≤5% false-flag rate among docs whose best match is < 0.2) hold
  * with wide margin in expectation and are stable across md5's fixed hash
  * values (everything here is deterministic — no RNG at run time).
  */
class DedupRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf01 = "/root/testdata/sf0.01"

  test("minhash-wide recall >= 95% on >=0.8-Jaccard planted dups, false-flag <= 5% below 0.2") {
    // exact ground truth: distinct-3-shingle Jaccard for every pair that
    // shares at least one shingle (pairs sharing none have Jaccard 0)
    val sh = Tables.documents(spark, sf01)
      .select(col("doc_id"),
        explode(array_distinct(shingles3(words(col("text")), col("text")))).as("s"))
      .localCheckpoint(true)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("d1"), col("s"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), "s")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    // per doc: the best Jaccard against any LOWER doc_id (the keeper side)
    val bestLower = inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("j", col("i") / (col("n1") + col("n2") - col("i")))
      .groupBy("d2").agg(max("j").as("mj"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val allDocs = Tables.documents(spark, sf01)
      .select("doc_id").collect().map(_.getLong(0))
    val flagged = ops.Dedup.dedupMinhashWide(spark, sf01)
      .filter(col("is_dup") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val trueDups = allDocs.filter(d => bestLower.getOrElse(d, 0.0) >= 0.8)
    val clean = allDocs.filter(d => bestLower.getOrElse(d, 0.0) < 0.2)
    assert(trueDups.nonEmpty, "fixture should contain planted >=0.8-Jaccard near-dups")
    assert(clean.nonEmpty, "fixture should contain docs with no near-duplicate (best Jaccard < 0.2)")
    val recall = trueDups.count(flagged) .toDouble / trueDups.length
    val falseFlag = clean.count(flagged).toDouble / clean.length
    info(f"planted(>=0.8)=${trueDups.length} recall=$recall%.3f  clean(<0.2)=${clean.length} falseFlag=$falseFlag%.4f")
    assert(recall >= 0.95, s"recall $recall < 0.95")
    assert(falseFlag <= 0.05, s"false-flag rate $falseFlag > 0.05")
  }

  test("jaccard df-cap is result-invariant on the fixture and bounds hot blocks") {
    // invariance: the production cap (1000) changes nothing vs an
    // unbounded run — fixture max block-df is 17 — so the CORRECTNESS
    // hash is untouched by the skew guard
    val capped = ops.Dedup.ngramJaccard(spark, sf01).collect().toSeq.map(_.toSeq)
    val unbounded = ops.Dedup.ngramJaccardCapped(spark, sf01, Int.MaxValue)
      .collect().toSeq.map(_.toSeq)
    assert(capped == unbounded)
    assert(capped.nonEmpty)
    // engagement: cap=1 keeps only single-doc blocks, which cannot form a
    // pair — the filter provably bounds every join block at <= cap docs
    assert(ops.Dedup.ngramJaccardCapped(spark, sf01, 1).count() === 0)
  }

  test("minhash estimator tracks exact Jaccard within theory bounds on candidate pairs") {
    // std error of a 64-permutation estimate is sqrt(J(1-J)/64) <= 0.0625;
    // 0.25 is a 4-sigma envelope — deterministic here (md5-fixed), so the
    // assertion is stable, not flaky
    val rows = ops.Dedup.minhashEstimate(spark, sf01)
      .select("est_j", "exact_j", "abs_err").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) <= 0.25),
      s"estimator off by > 0.25: ${rows.filter(_.getDouble(2) > 0.25).take(3).mkString}")
    val meanErr = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanErr <= 0.08, s"mean estimator error $meanErr > 0.08")
    // exact duplicates (J = 1) must estimate exactly 1 (all minima equal)
    assert(rows.filter(_.getDouble(1) >= 0.9999).forall(_.getDouble(0) >= 0.9999))
  }

  test("bandedPairs: planted near-dups at ARBITRARY id distance, recall >= 0.95") {
    // geometry-driven recall (VERDICT round-8 item 1): plant a perturbed
    // copy of every 5th vector at id + 1,000,000 — maximally far in id
    // space, where the old id-window front end could never find it —
    // and require the banded LSH front end to recover >= 95% of the
    // planted pairs whose true cosine is >= 0.8.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = Tables.embeddings(spark, sf01)
      .select("vec_id", "label", "embedding").collect()
    val rng = new scala.util.Random(42) // test-only determinism
    def normOf(v: Array[Float]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    def cosOf(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      math.floor(d / (normOf(a) * normOf(b)) * 10000 + 0.5) / 10000
    }
    val origRows = base.map { r =>
      val v = r.getSeq[Float](2).toArray
      Row(r.getLong(0), r.getInt(1), v, normOf(v))
    }
    val planted = base.filter(_.getLong(0) % 5 == 0).map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](2).toArray
      val scale = v.map(x => math.abs(x.toDouble)).sum / v.length
      val v2 = v.map(x => (x + rng.nextGaussian() * 0.25 * scale).toFloat)
      (id, v2, Row(id + 1000000L, r.getInt(1), v2, normOf(v2)))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("label", IntegerType),
      StructField("v", ArrayType(FloatType)), StructField("norm", DoubleType)))
    val frame = spark.createDataFrame(
      spark.sparkContext.parallelize((origRows ++ planted.map(_._3)).toSeq, 8), schema)
    val found = ops.Similarity.bandedPairs(frame, 0.8)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val origVecs = base.map(r => r.getLong(0) -> r.getSeq[Float](2).toArray).toMap
    val target = planted
      .filter { case (id, v2, _) => cosOf(origVecs(id), v2) >= 0.8 }
      .map { case (id, _, _) => (id, id + 1000000L) }
    assert(target.length >= 50, s"planting produced only ${target.length} >=0.8 pairs")
    val recall = target.count(found).toDouble / target.length
    info(f"planted=${target.length} found=${target.count(found)} recall=$recall%.3f")
    assert(recall >= 0.95, s"recall $recall < 0.95 on far-id planted duplicates")
    // and every reported pair respects the threshold
    ops.Similarity.bandedPairs(frame, 0.8).select("cos").collect()
      .foreach(r => assert(r.getDouble(0) >= 0.8))
  }

  test("minhash-wide flags a superset of exact-duplicate docs") {
    // identical texts have Jaccard 1 and must always share every band
    val exactDups = ops.Dedup.dedupExact(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val droppedByExact = all -- exactDups // docs removed as exact dups
    val flagged = ops.Dedup.dedupMinhashWide(spark, TestSpark.Sf)
      .filter(col("is_dup") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(droppedByExact.subsetOf(flagged),
      s"exact dups not flagged: ${(droppedByExact -- flagged).take(5)}")
  }
}
