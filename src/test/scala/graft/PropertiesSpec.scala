package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-free invariants (SURVEY.md §5.3): conservation laws, ordering
  * laws, and tolerance checks that hold regardless of data. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("cluster dedup terminates and returns empty on an empty corpus") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.documents(spark, sf).filter(lit(false))
      .write.parquet(s"$dir/documents.parquet")
    assert(ops.Dedup.dedupClusters(spark, dir).count() === 0)
  }

  test("cluster labels refine the pairwise minhash keepers") {
    // every pairwise-flagged dup must also be flagged by the transitive
    // closure, and cluster ids can only be <= the pairwise keeper
    val pairs = ops.Dedup.dedupMinhash(spark, sf)
      .select(col("doc_id"), col("keeper")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = ops.Dedup.dedupClusters(spark, sf)
      .select(col("doc_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.keySet === clusters.keySet)
    pairs.foreach { case (doc, keeper) =>
      assert(clusters(doc) <= keeper, s"doc $doc: cluster above keeper") }
  }

  test("word_count conserves total token count") {
    val wc = ops.Relational.wordCount(spark, sf)
    val sumCounts = wc.agg(sum("cnt")).head.getLong(0)
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(sumCounts === totalTokens)
  }

  test("sort_limit is a prefix of the full descending sort") {
    val top = ops.Relational.sortLimit(spark, sf).collect().map(_.getDouble(2))
    assert(top.length === 100)
    assert(top.sameElements(top.sortBy(-_)), "limit output not sorted desc")
    val globalMax = Tables.orders(spark, sf).agg(max("o_totalprice")).head.getDouble(0)
    assert(top.head === globalMax)
  }

  test("set-operation cardinality laws") {
    val nc = Tables.customer(spark, sf).count()
    val no = Tables.orders(spark, sf).count()
    assert(ops.Relational.unionAll(spark, sf).count() === nc + no)
    assert(ops.Relational.intersectKeys(spark, sf).count() <= nc)
    val exceptKeys = ops.Relational.exceptKeys(spark, sf)
    val pCust = Tables.orders(spark, sf).filter(col("o_orderstatus") === "P")
      .select(col("o_custkey").as("k")).distinct()
    assert(exceptKeys.join(pCust, "k", "inner").count() === 0)
  }

  test("dedup outputs have unique keys and minimal survivors") {
    val exact = ops.Dedup.dedupExact(spark, sf)
    assert(exact.count() === exact.select("doc_id").distinct().count())
    val mh = ops.Dedup.dedupMinhash(spark, sf)
    assert(mh.filter(col("keeper") > col("doc_id")).count() === 0,
      "keeper must be <= doc_id")
    assert(mh.filter(col("is_dup") === 0 && col("keeper") =!= col("doc_id")).count() === 0)
    val sh = ops.Dedup.dedupSimhash(spark, sf)
    assert(sh.filter(length(col("fp")) =!= 16).count() === 0)
  }

  test("simhashNeighbors pigeonhole blocking is exact at the production radius shape (k=3)") {
    // the parameterized path at a DIFFERENT shape than the oracled query
    // (4 blocks of 4 bits, radius 3): block-LSH candidates must reproduce
    // the brute-force hamming<=3 nearest-earlier-neighbor exactly
    val sig = Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.SimHash16.simhash(split(col("text"), " ")).as("fp"))
    val fps = sig.collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val expected = fps.map { case (id, fp) =>
      val cands = fps.filter { case (id2, fp2) =>
        id2 < id && Integer.bitCount(Integer.parseInt(fp, 2) ^ Integer.parseInt(fp2, 2)) <= 3
      }
      val best = cands.map { case (id2, fp2) =>
        (Integer.bitCount(Integer.parseInt(fp, 2) ^ Integer.parseInt(fp2, 2)), id2)
      }.sorted.headOption
      (id, best.map(_._2), best.map(_._1))
    }.toSeq
    val got = ops.Dedup.simhashNeighbors(sig, 16, 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getAs[Number](2).intValue))).toSeq.sortBy(_._1)
    assert(got === expected)
    assert(expected.exists(_._2.nonEmpty), "fixture should contain hamming<=3 pairs")
  }

  test("simhashNeighbors pigeonhole split is exact at the 64-bit production width (k=2, k=3)") {
    // controlled 64-bit fingerprints with dense near-dup structure: 8
    // random base patterns, each doc flips one distinct bit of its base,
    // so same-base pairs sit at hamming 1-2 and cross-base pairs far away.
    // k=2 exercises the UNEQUAL ceil/floor split (22/21/21 — rejected by
    // the old equal-blocks require); k=3 is the documented 4x16 shape.
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(8)(Array.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString)
    val fps: Seq[(Long, String)] = (0L until 160L).map { id =>
      val b = bases((id % 8).toInt).toCharArray
      val flip = (id / 8).toInt
      if (flip > 0) { val pos = (flip * 7) % 64; b(pos) = if (b(pos) == '1') '0' else '1' }
      (id, new String(b))
    }
    val sig = spark.createDataFrame(fps).toDF("doc_id", "fp")
    def dist(a: String, b: String): Int = java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 2) ^ java.lang.Long.parseUnsignedLong(b, 2))
    for (k <- Seq(2, 3)) {
      val expected = fps.map { case (id, fp) =>
        val best = fps.filter(_._1 < id)
          .map { case (id2, fp2) => (dist(fp, fp2), id2) }
          .filter(_._1 <= k).sorted.headOption
        (id, best.map(_._2), best.map(_._1))
      }
      val got = ops.Dedup.simhashNeighbors(sig, 64, k)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getAs[Number](2).intValue))).toSeq.sortBy(_._1)
      assert(got === expected, s"k=$k")
      assert(expected.count(_._2.nonEmpty) > 50, s"fixture must contain hamming<=$k pairs")
    }
  }

  test("cosine results are valid similarities with dense ranks") {
    val topk = ops.Similarity.cosineTopk(spark, sf)
    assert(topk.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() === 0)
    assert(topk.filter(col("qid") === col("vec_id")).count() === 0, "query matched itself")
    val ranks = topk.groupBy("qid").agg(max("rn").as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n")).count() === 0, "ranks not consecutive")
  }

  test("ANN paths are consistent with brute force and achieve recall") {
    val bf = ops.Similarity.cosineTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    for ((name, df) <- Seq(
        "lsh" -> ops.Similarity.annLsh(spark, sf),
        "ivf" -> ops.Similarity.annIvf(spark, sf))) {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      // any (query, candidate) pair also present in brute force must carry
      // the identical rounded cosine
      approx.foreach { case (pair, cos) =>
        bf.get(pair).foreach(expected => assert(cos === expected, s"$name pair $pair"))
      }
    }
    // IVF with 2 probes must recover at least half the brute-force top-5
    val bf5 = ops.Similarity.cosineTopk(spark, sf).filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = ops.Similarity.annIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf5 & ivf).size.toDouble / bf5.size
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall")
  }

  test("PQ encode: valid codes, self-encoding codebook vectors, nonneg errors") {
    val pq = ops.Similarity.embedPq(spark, sf).cache()
    val nVec = Tables.embeddings(spark, sf).count()
    // exactly M codes per vector, one per subspace
    assert(pq.count() === nVec * 8)
    assert(pq.groupBy("vec_id").count().filter(col("count") =!= 8).count() === 0)
    // codes reference codebook members (the %100 coarse sample) and
    // reconstruction error is a nonnegative squared distance
    assert(pq.filter(col("code") % 100 =!= 0).count() === 0)
    assert(pq.filter(col("dist2") < 0).count() === 0)
    // a vector that IS a codebook member encodes each subspace to itself
    // with zero error (distance to its own subvector is exactly 0)
    val self = pq.filter(col("vec_id") % 100 === 0)
    assert(self.filter(col("code") =!= col("vec_id")).count() === 0)
    assert(self.filter(col("dist2") =!= 0.0).count() === 0)
    pq.unpersist()
  }

  test("ADC distances reconstruct exactly from the PQ codes") {
    val adc = ops.Similarity.pqAdc(spark, sf).collect()
    assert(adc.nonEmpty)
    adc.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Number](1).intValue).sorted.toSeq === (1 to rows.length),
        "ranks must be consecutive per query")
    }
    assert(adc.forall(_.getDouble(3) >= 0.0), "squared distances are nonnegative")
    // cross-query consistency law: ADC(q, c) = Σ_m quantized d2 between
    // q's subvector m and c's ASSIGNED codebook entry — recomputed here
    // from q_embed_pq's codes and the raw vectors (same sequential dot
    // fold as the codegen'd expression, so the doubles match bitwise)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codes = ops.Similarity.embedPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def sub(v: Array[Double], m: Int) = v.slice(m * 8, m * 8 + 8)
    def dot(x: Array[Double], y: Array[Double]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
    def d2(a: Array[Double], b: Array[Double]) =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    adc.take(20).foreach { r =>
      val (q, c, ad) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val expect = (0 until 8).map { m =>
        math.floor(d2(sub(vecs(q), m), sub(vecs(codes((c, m))), m)) * 10000 + 0.5).toLong
      }.sum
      assert(ad === expect / 10000.0, s"q=$q c=$c")
    }
  }

  test("IVF-PQ scores agree with whole-corpus ADC on shared pairs") {
    // same codes, same LUTs — a (query, candidate) pair surviving both
    // the cell probe and the whole-corpus top-5 must carry the identical
    // asymmetric distance
    val ivfpq = ops.Similarity.annIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val adc = ops.Similarity.pqAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivfpq.nonEmpty)
    val shared = ivfpq.keySet intersect adc.keySet
    assert(shared.nonEmpty, "probe cells should retain some global top-5 pairs")
    shared.foreach(p => assert(ivfpq(p) === adc(p), s"pair $p"))
  }

  test("SQL-over-parquet views answer the flagship query") {
    sources.Formats.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT word, count(*) AS cnt
        |FROM (SELECT explode(split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word ASC""".stripMargin)
      .collect().map(_.toSeq)
    val viaApi = ops.Relational.wordCount(spark, sf).collect().map(_.toSeq)
    assert(viaSql.sameElements(viaApi))
  }

  test("approx_count_distinct: within 5% of exact, and partition-invariant") {
    val approx = ops.Aggregations.approxDistinct(spark, sf)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val a = approx(t)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$t: approx $a vs exact $n")
    }
    // the law that replaces an oracle (round 11 — Spark's HLL++ is
    // dense-only, so NO cardinality makes the estimate exact; see
    // approxDistinct's scaladoc): register-wise max is layout-independent,
    // so the estimate must be bit-stable under any repartitioning
    val reparted = Tables.events(spark, sf).repartition(7, col("ts"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == approx, "HLL++ estimate changed under repartitioning")
  }

  test("percentile_approx within 5% of the exact median") {
    val approx = ops.Aggregations.approxQuantile(spark, sf)
      .select("event_type", "p50_approx").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e) / math.abs(e) <= 0.05,
        s"$t: approx ${approx(t)} vs exact $e")
    }
  }

  test("session windows conserve events per user") {
    val sessions = ops.EventTime.sessionWindow(spark, sf)
    val perUserSessions = sessions.groupBy("user_id").agg(sum("n_events").as("n"))
    val perUserEvents = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("m"))
    val joined = perUserSessions.join(perUserEvents, "user_id")
    assert(joined.filter(col("n") =!= col("m")).count() === 0)
  }

  test("topk_per_group returns at most 3 per group, correctly ordered") {
    val tk = ops.Windows.topkPerGroup(spark, sf)
    val over = tk.groupBy("l_suppkey").agg(count(lit(1)).as("n")).filter(col("n") > 3)
    assert(over.count() === 0)
    val bad = tk.filter(col("rn") > 3)
    assert(bad.count() === 0)
  }
}
