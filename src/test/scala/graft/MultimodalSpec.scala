package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mapPartitions header-parse path must agree with the pure-expression
  * metadata path: the decoder really reads the planted GRFT header bytes,
  * so agreement means pack → parse round-trips exactly. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("mediaDecode (mapPartitions) equals multimodalMeta (expressions)") {
    val cols = Seq("doc_id", "n_bytes", "content_md5", "width", "height")
    val a = ops.Multimodal.mediaDecode(spark, sf)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    val b = ops.Multimodal.multimodalMeta(spark, sf)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("decode fails loudly on a payload without the GRFT header") {
    import org.apache.spark.sql.Encoders
    val bad = spark.createDataset(Seq(
      ops.Multimodal.MediaRecord(1L, "not a media payload".getBytes("UTF-8"))
    ))(Encoders.product[ops.Multimodal.MediaRecord])
    val e = intercept[org.apache.spark.SparkException] {
      ops.Multimodal.decodeMeta(bad).collect()
    }
    assert(e.getMessage.contains("GRFT") ||
      Option(e.getCause).exists(_.getMessage.contains("GRFT")))
  }

  test("feature extraction yields fixed-dim unit-range vectors") {
    val feats = ops.Multimodal.extractFeatures(ops.Multimodal.mediaFromDocuments(spark, sf))
    import org.apache.spark.sql.functions._
    assert(feats.count() === 500)
    assert(feats.filter(size(col("features")) =!= 8).count() === 0)
    val flat = feats.select(explode(col("features")).as("f"))
    assert(flat.filter(col("f") < 0.0 || col("f") > 1.0).count() === 0)
  }

  test("frame sampling yields 1..8 stride-aligned frames per doc") {
    val frames = ops.Multimodal.frameSample(spark, sf)
    import org.apache.spark.sql.functions._
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"), min("frame_idx").as("mn"))
    assert(perDoc.filter(col("n") < 1 || col("n") > 8).count() === 0)
    assert(perDoc.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() === 0)
    assert(frames.filter(col("byte_offset") =!= col("frame_idx") * 100).count() === 0)
  }

  test("pHash: exact-dup docs collide, brightness shift flips few bits") {
    import org.apache.spark.sql.functions._
    val ph = ops.Multimodal.mediaPhash(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ph.nonEmpty)
    // identical texts must share the hash and be counted in one group
    val byText = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    byText.groupBy(_._2).values.filter(_.length >= 2).foreach { grp =>
      val hs = grp.map(g => (ph(g._1)._1, ph(g._1)._2)).distinct
      assert(hs.length == 1, "exact duplicates must collide")
      grp.foreach(g => assert(ph(g._1)._3 >= grp.length))
    }
    // non-constant across the corpus
    assert(ph.values.map(v => (v._1, v._2)).toSet.size > 1)
    // frequency-domain robustness: a uniform +10 brightness shift on the
    // byte signal flips almost no sign bits (the DC-free basis rows sum
    // to ~0, so the shift barely moves any coefficient)
    def phashOf(bytes: Array[Int]): (Long, Long) = {
      val x = Array.tabulate(64)(i => if (i < bytes.length) bytes(i).toDouble else 0.0)
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64) {
        var c = 0.0
        for (i <- 0 until 64) c += x(i) * ops.Multimodal.phashCos(k)(i)
        if (c > 0) { if (k < 32) hi |= 1L << k else lo |= 1L << (k - 32) }
      }
      (hi, lo)
    }
    val sample = byText.take(20)
    val flips = sample.map { case (_, t) =>
      val raw = t.getBytes("UTF-8").take(64).map(_ & 0xff)
      val (h1, l1) = phashOf(raw)
      val (h2, l2) = phashOf(raw.map(b => math.min(255, b + 10)))
      java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    }
    val meanFlips = flips.sum.toDouble / flips.length
    assert(meanFlips <= 8.0,
      s"pHash must survive a global brightness shift (mean $meanFlips/64 bits flipped)")
  }

  test("aHash near-dup finds exactly the brute-force Hamming<=2 pairs") {
    import org.apache.spark.sql.functions._
    val got = ops.Multimodal.mediaNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hashes = ops.Multimodal.mediaAhash(spark, sf)
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ha, la) <- hashes; (b, hb, lb) <- hashes if a < b
      hd = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if hd <= 2
    } yield (a, b) -> hd.toLong).toMap
    assert(got === brute, s"got ${got.size}, brute ${brute.size}")
    assert(brute.nonEmpty, "fixture should contain near-dup media")
  }
}
