package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-2 scale-pattern and pipeline operators beyond the
  * oracle gate: physical rewrites (salting, Bloom prefilter) must be
  * result-invariant, and the text/window/variant additions must satisfy
  * their defining invariants on the fixtures. */
class ScaleAndPipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("salted aggregation equals the single-phase groupBy") {
    val plain = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
          .cast("double"), 4).as("total_value"))
      .orderBy("event_type")
    assert(rows(ops.ScaleOps.saltedAgg(spark, sf)) == rows(plain))
  }

  test("bloom prejoin equals the plain join and actually prefilters the fact scan") {
    val result = ops.ScaleOps.bloomPrejoin(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 480000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(graft.util.Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy("o_orderpriority")
    assert(rows(result) == rows(plain))
    // the predicate is the native Catalyst might_contain, not a UDF
    assert(result.queryExecution.executedPlan.toString.contains("might_contain"))
    // the sketch genuinely thins the fact side before the join (~3.5% + FPs)
    val dim = Tables.orders(spark, sf).filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bf = dim.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    val li = Tables.lineitem(spark, sf)
    val kept = li.filter(udf((k: Long) => bf.mightContain(k)).apply(col("l_orderkey"))).count()
    assert(kept < li.count() / 5, s"prefilter kept $kept rows")
  }

  test("contamination: planted near-dups are flagged, counts are consistent") {
    val df = ops.TextAnalysis.contamination(spark, sf).cache()
    val bad = df.filter(col("contaminated")).count()
    assert(bad >= 1, "expected at least one contaminated src0 doc (planted dups)")
    assert(df.filter(col("n_shared") > col("n_grams")).count() == 0)
    assert(df.filter(col("contaminated") =!= (col("n_shared") > 0)).count() == 0)
  }

  test("repetition ratio is a valid fraction and matches its definition") {
    val df = ops.TextAnalysis.repetitionRatio(spark, sf).cache()
    assert(df.filter(col("rep_ratio") < 0.0 || col("rep_ratio") > 1.0).count() == 0)
    assert(df.filter(col("n_distinct") > col("n_bigrams")).count() == 0)
    assert(df.filter(col("top_cnt") > col("n_bigrams")).count() == 0)
  }

  test("interval self-join keeps gaps strictly inside (0, 2h]") {
    val df = ops.EventTime.joinIntervalTime(spark, sf)
    val agg = df.agg(min("gap_us"), max("gap_us"), count(lit(1))).head()
    assert(agg.getLong(2) > 0)
    assert(agg.getLong(0) > 0L)
    assert(agg.getLong(1) <= 2L * 3600 * 1000000)
  }

  test("ignore-nulls window forward-fills every gap after the first reading") {
    val df = ops.Windows.windowIgnoreNulls(spark, sf).cache()
    // filled is null only while a user has seen no valid reading yet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val withSeen = df.withColumn("seen_valid",
      count(col("v")).over(w.rowsBetween(Long.MinValue, 0)))
    assert(withSeen.filter(col("filled").isNull && col("seen_valid") > 0).count() == 0)
    assert(withSeen.filter(col("filled").isNotNull && col("seen_valid") === 0).count() == 0)
  }

  test("width_bucket partitions every lineitem row into cells 1..10") {
    val df = ops.Statistics.widthBucket(spark, sf)
    val buckets = df.select("bucket").collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 1 && b <= 10))
    val total = df.agg(sum("n")).head().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("variant path extraction round-trips the JSON payload") {
    val df = ops.Structured.variantJson(spark, sf).cache()
    assert(df.filter(col("missing_val").isNotNull).count() == 0)
    assert(df.filter(col("k_str") =!= col("k_num").cast("string")).count() == 0)
    assert(df.filter(col("k_bucket") =!= col("k_num") % 10).count() == 0)
  }

  test("incremental aggregate merge equals full recompute on every key") {
    val rows = ops.ScaleOps.incrAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"merge mismatch on ${r.getString(0)}")
      assert(r.getLong(1) + r.getLong(2) === r.getLong(3), "counts compose")
    }
    val total = rows.map(_.getLong(3)).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("join cardinality estimate: PK-FK joins are estimated exactly") {
    val rows = ops.ScaleOps.joinCardEst(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("lineitem_orders", "orders_customer"))
    rows.values.foreach { r =>
      // for a key-containment join (every fact key exists on the PK
      // side, ndv = PK count), the containment formula is exact:
      // est = n_fact * n_pk / n_pk = n_fact = actual
      assert(r.getLong(5) === r.getLong(6), s"${r.getString(0)} est vs actual")
      assert(r.getDouble(7) === 1.0)
    }
  }

  test("schema drift halves partition the table; identical halves don't alarm") {
    val rows = ops.Maintenance.schemaDrift(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted ===
      Array("event_id", "event_type", "props", "user_id", "value"))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total, s"halves cover ${r.getString(0)}")
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) <= r.getLong(1) && r.getLong(6) <= r.getLong(2))
    }
    // the uniform fixture halves should profile alike: null-rate drift
    // within 2pp and ndv ratio within a factor of 2 on every column
    rows.foreach { r =>
      assert(math.abs(r.getDouble(7)) < 0.02, s"null drift ${r.getString(0)}")
      if (!r.isNullAt(8))
        assert(r.getDouble(8) > 0.5 && r.getDouble(8) < 2.0, s"ndv ${r.getString(0)}")
    }
  }

  test("decontaminate: brute 5-gram membership replay, token laws") {
    val rows = ops.TextAnalysis.decontaminate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams5(t: String): Set[String] =
      t.split(" ", -1).sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._2 == "src0").flatMap(x => grams5(x._3)).toSet
    val train = docs.filter(_._2 != "src0")
    val bySource = train.groupBy(_._2)
    assert(rows.keySet === bySource.keySet, "every training source reported")
    bySource.foreach { case (src, xs) =>
      val (nDocs, nDropped, tokTot, tokDrop, ppm) = rows(src)
      assert(nDocs === xs.length.toLong)
      val dropped = xs.filter(x => grams5(x._3).exists(evalGrams))
      assert(nDropped === dropped.length.toLong, s"$src dropped")
      val tok = (t: String) => t.split(" ", -1).length.toLong
      assert(tokTot === xs.map(x => tok(x._3)).sum, s"$src tokens")
      assert(tokDrop === dropped.map(x => tok(x._3)).sum, s"$src dropped tokens")
      assert(ppm === tokDrop * 1000000L / tokTot, s"$src ppm")
    }
  }

  test("rouge attribution: argmax clip replay, recall bounds") {
    val rows = ops.TextAnalysis.rougeOverlap(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams5(t: String): Set[String] =
      t.split(" ", -1).sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    def bigs(t: String): Map[String, Long] = {
      val w = t.split(" ", -1)
      w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    }
    val evals = docs.filter(_._2 == "src0")
    val train = docs.filter(_._2 != "src0")
    val expect = evals.flatMap { case (ed, _, et) =>
      val eg = grams5(et)
      val cands = train.map { case (td, _, tt) =>
        (td, grams5(tt).count(eg), tt) }.filter(_._2 > 0)
      if (cands.isEmpty) None
      else {
        val eb = bigs(et)
        val scored = cands.map { case (td, sh, tt) =>
          val tb = bigs(tt)
          val clip = eb.map { case (g, c) => math.min(c, tb.getOrElse(g, 0L)) }.sum
          (td, sh.toLong, clip)
        }
        val best = scored.sortBy(x => (-x._3, -x._2, x._1)).head
        Some(ed -> (best._1, best._2, best._3, eb.values.sum))
      }
    }.toMap
    assert(rows.length === expect.size, "one row per contaminated eval doc")
    rows.foreach { r =>
      val (md, sh, clip, ref) = expect(r.getLong(0))
      assert(r.getLong(1) === md, s"match for ${r.getLong(0)}")
      assert(r.getLong(2) === sh && r.getLong(3) === clip && r.getLong(4) === ref)
      val rouge = r.getDouble(5)
      assert(rouge >= 0.0 && rouge <= 1.0 + 1e-9)
      assert(math.abs(rouge - math.floor(clip.toDouble / ref * 1e6 + 0.5) / 1e6)
        < 1e-12, "rouge2 quantized division")
    }
  }
}
