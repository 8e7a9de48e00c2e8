package graft

import graft.streaming.Streams
import graft.streaming.Streams.{SessionSummary, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch equivalence (SURVEY.md §2b footer: the batch
  * event-time queries are the oracle for the streaming twins). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("streaming tumbling counts equal the batch formulation") {
    val agg = Streams.tumblingCounts(Streams.eventsStream(spark, sf))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = ops.EventTime.tumblingWindow(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("streaming count-min sketch is bit-identical to the batch build") {
    val agg = Streams.cmSketchStream(Streams.eventsStream(spark, sf))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("cms_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cms_out").collect().head.getAs[Array[Byte]](0)
    val batch = Tables.events(spark, sf).select(col("event_type"))
      .agg(graft.functions.SketchAggs.cmAgg(col("event_type")).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(streamed, batch),
      "CM merge must make streaming == batch, bit-for-bit")
    // and the blob answers point queries downstream
    import spark.implicits._
    val est = Seq(0).toDF("x").select(
      graft.functions.SketchAggs.cmEstimate(lit(streamed), lit("click")).as("e"))
      .collect().head.getLong(0)
    val exact = Tables.events(spark, sf).filter(col("event_type") === "click").count()
    assert(est >= exact)
  }

  test("streaming Misra-Gries heavy hitters equal the batch build in the exact regime") {
    import graft.functions.SketchAggs._
    val agg = Streams.mgStream(Streams.eventsStream(spark, sf))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("mg_out").start()
    try q.processAllAvailable() finally q.stop()
    def items(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(freqItems(col("sk"))).as("f"))
        .select("f.term", "f.est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = items(spark.table("mg_out"))
    val batch = items(Tables.events(spark, sf).select(col("event_type"))
      .agg(freqAgg(col("event_type"), 10).as("sk")))
    assert(streamed === batch,
      "no purge at 5 types <= 2^10 capacity, so streamed estimates must equal batch")
    // in the exact regime the estimates ARE the true per-type counts
    val exact = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === exact)
  }

  test("stream-static join enriches events with the customer dimension") {
    val enriched = Streams.enrichedStream(
      Streams.eventsStream(spark, sf), Tables.customer(spark, sf))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enriched_out")
    assert(got.count() === Tables.events(spark, sf).count())
    // all users 0..149 exist in customer at sf0.001 → no null segments
    assert(got.filter(col("c_mktsegment").isNull).count() === 0)
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"), "left")
      .select("event_id", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamed = got.select("event_id", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === batch)
  }

  test("streaming quantizer assignment per micro-batch equals the batch assignment") {
    import graft.functions.VectorExpressions.doubleDot
    val cents = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", sqrt(doubleDot(col("cv"), col("cv"))))
      .localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        got ++= Streams.assignCells(batch, cents)
          .select("vec_id", "cid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
    val q = Streams.embeddingsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val expected = Streams.assignCells(Tables.embeddings(spark, sf), cents)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    assert(got.size === expected.size, "each vector assigned exactly once")
    assert(got.toSet === expected)
  }

  test("streaming PQ encode per micro-batch is bit-identical to the batch index build") {
    val cb = graft.ops.Similarity.pqCodebookFor(spark, sf).localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        got ++= Streams.encodePqBatch(batch, cb)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        ()
      }
    val q = Streams.embeddingsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val expected = graft.ops.Similarity
      .pqEncodeOf(Tables.embeddings(spark, sf), cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got.size === expected.size, "each (vector, subspace) encoded exactly once")
    assert(got.toSet === expected)
  }

  test("streaming PSI vs broadcast baseline equals the batch computation; self-PSI is zero") {
    val ev = Tables.events(spark, sf)
    val ext = ev.agg(min(col("value")), max(col("value"))).head
    val (lo, hi) = (ext.getDouble(0), ext.getDouble(1))
    val baseline = Streams.valueHistogram(
      ev.filter(col("event_type") === "view"), lo, hi).localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var nBatches = 0
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        nBatches += 1
        got ++= Streams.psiVsBaseline(batch, baseline, lo, hi)
          .collect().map(_.toSeq)
        ()
      }
    val q = Streams.eventsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    // the fixture is one file -> one micro-batch, so per-batch PSI must be
    // cell-identical to the same monitor run on the batch table (the PSI
    // arithmetic is literally shared; this pins the streaming plumbing)
    assert(nBatches === 1, "fixture file arrives as one micro-batch")
    val expected = Streams.psiVsBaseline(ev, baseline, lo, hi)
      .collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
    // law: a batch scored against ITS OWN histogram has o1=o2 in every
    // bin, so diff=0 and ln(ratio)=0 -> every contrib and the total are
    // EXACTLY zero (no tolerance)
    val self = Streams.psiVsBaseline(
      ev, Streams.valueHistogram(ev, lo, hi), lo, hi).collect()
    assert(self.length === ops.Statistics.PsiBins)
    assert(self.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }

  test("streaming robust-outlier alerts equal the batch MAD gate") {
    val ev = Tables.events(spark, sf)
    val stats = ops.Statistics.outlierMad(spark, sf)
      .select(col("event_type"), col("med"), col("thr"))
      .localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        got ++= Streams.robustAlerts(batch, stats).collect().map(_.getLong(0))
        ()
      }
    val q = Streams.eventsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    // the gate is a pure row-local predicate, so the union of per-batch
    // alerts must equal the same gate over the batch table
    val expected = Streams.robustAlerts(ev, stats).collect().map(_.getLong(0))
    assert(got.sorted.toSeq === expected.sorted.toSeq)
    assert(expected.nonEmpty, "fixture contains MAD outliers")
    // and the alert count must replay outlierMad's own n_outliers totals
    val nOut = ops.Statistics.outlierMad(spark, sf)
      .agg(sum("n_outliers")).head.getLong(0)
    assert(expected.length.toLong === nOut)
  }

  test("streaming chi-square vs broadcast baseline equals the batch computation; self-chi2 is zero") {
    val ev = Tables.events(spark, sf)
    // baseline: the view-heavy early half's type mix
    val baseline = ev.filter(dayofmonth(col("ts")) <= 15)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var nBatches = 0
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        nBatches += 1
        got ++= Streams.chisqVsBaseline(batch, baseline).collect().map(_.toSeq)
        ()
      }
    val q = Streams.eventsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(nBatches === 1, "fixture file arrives as one micro-batch")
    val expected = Streams.chisqVsBaseline(ev, baseline).collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
    // law: a batch scored against ITS OWN counts has o1=o2 per cell, so
    // every o·N - r·c numerator is exactly zero -> chi2 EXACTLY 0
    val self = Streams.chisqVsBaseline(
      ev, ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))).collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }

  test("streaming embed shift vs broadcast baseline equals the batch rollup; self-shift is zero") {
    val emb = Tables.embeddings(spark, sf)
    // baseline: the even-id reference half's per-(label, dim) sums —
    // exactly q_embed_drift's reference side
    val baseline = ops.Statistics.dimSums(
      emb.filter(col("vec_id") % 2 === 0)).localCheckpoint(true)
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var nBatches = 0
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      got.synchronized {
        nBatches += 1
        got ++= Streams.embedShiftVsBaseline(batch, baseline)
          .collect().map(_.toSeq)
        ()
      }
    val q = Streams.embeddingsStream(spark, sf).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(nBatches === 1, "fixture file arrives as one micro-batch")
    val expected = Streams.embedShiftVsBaseline(emb, baseline).collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
    // streaming the odd half against the even baseline IS q_embed_drift
    // (same sufficient statistic, same rollup) — cell-identical
    val drift = ops.Statistics.embedDrift(spark, sf).collect().map(_.toSeq)
    val oddOnly = Streams.embedShiftVsBaseline(
      emb.filter(col("vec_id") % 2 === 1), baseline).collect().map(_.toSeq)
    assert(oddOnly.toSeq === drift.toSeq)
    // law: a batch scored against ITS OWN sums has s1=s0, n1=n0 per
    // (label, dim), so every |s1·n0 − s0·n1| is exactly zero
    val self = Streams.embedShiftVsBaseline(emb, ops.Statistics.dimSums(emb))
      .collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }

  test("embeddingsStream reads the sharded directory layout (ADVICE r5)") {
    // sf1-style layout: embeddings.parquet is a DIRECTORY of part files —
    // the old parent-dir + pathGlobFilter formulation read zero files here
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    Tables.embeddings(spark, sf).repartition(3)
      .write.parquet(s"$dir/embeddings.parquet")
    var n = 0L
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batch, _) => { n += batch.count(); () }
    val q = Streams.embeddingsStream(spark, dir).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(n === Tables.embeddings(spark, sf).count())
  }

  test("eventsStream reads the sharded directory layout and normalizes ts") {
    // sf1-style layout: events.parquet is a DIRECTORY of part files; the
    // stream must target it directly (pathGlobFilter matches file names
    // only) and still produce the same normalized TimestampType column
    val dir = java.nio.file.Files.createTempDirectory("graft_evshard").toString
    Tables.events(spark, sf).repartition(3)
      .write.parquet(s"$dir/events.parquet")
    var n = 0L
    var tsType: org.apache.spark.sql.types.DataType = null
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batch, _) => { n += batch.count(); tsType = batch.schema("ts").dataType; () }
    val q = Streams.eventsStream(spark, dir).writeStream
      .foreachBatch(fn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(n === Tables.events(spark, sf).count())
    assert(tsType === org.apache.spark.sql.types.TimestampType)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    ms.addData((1L, t0), (1L, t0), (2L, t0), (2L, t1), (3L, t1))
    val deduped = Streams.dedupStream(
      ms.toDF().toDF("event_id", "ts"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[UserEvent]
    val hour = 3600L * 1000 * 1000
    ms.addData(
      UserEvent(1, 1, 0), UserEvent(1, 2, 10 * 60 * 1000 * 1000L), // session 1: 2 events
      UserEvent(1, 3, 2 * hour),                                   // closes s1, opens s2
      UserEvent(1, 4, 5 * hour),                                   // closes s2, opens s3
      UserEvent(2, 5, 0))                                          // user 2, stays open
    val out = Streams.sessionize(ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()

    val closed = spark.table("sessions_out").as[SessionSummary].collect().toSet
    assert(closed === Set(
      SessionSummary(1, 2, 0, 10 * 60 * 1000 * 1000L),
      SessionSummary(1, 1, 2 * hour, 2 * hour)))
  }

  test("watermark finalizes windows and drops data later than the horizon") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.tumblingCounts(
      ms.toDS().toDF("ts", "event_type", "value"))
    // append mode emits a window only once its watermark passes — the
    // finalization semantics `complete` mode never exercises
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      ms.addData((t(10, 15), "click", 1.0), (t(10, 45), "click", 2.0))
      q.processAllAvailable()
      // advance event time far enough that the 10:00 window finalizes
      ms.addData((t(13, 0), "view", 1.0))
      q.processAllAvailable()
      val afterAdvance = spark.table("wm_out").as[(Timestamp, String, Long, Double)].collect()
      assert(afterAdvance.toSeq == Seq((t(10, 0), "click", 2L, 3.0)),
        afterAdvance.mkString(","))
      // a straggler behind the watermark (13:00 − 1h) must be dropped, not
      // reopen the finalized 10:00 window
      ms.addData((t(10, 30), "click", 100.0))
      q.processAllAvailable()
      val afterLate = spark.table("wm_out").as[(Timestamp, String, Long, Double)].collect()
      assert(afterLate.toSeq == afterAdvance.toSeq, afterLate.mkString(","))
    } finally q.stop()
  }

  test("transformWithState keeps running per-user stats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Double)]
      val out = Streams.runningUserStats(ms.toDS())
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try {
        ms.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
        q.processAllAvailable()
        ms.addData((1L, 20.0), (2L, 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_out")
        .as[Streams.UserRunning].collect().toSeq
      // latest emission per user reflects state carried across batches
      val latest = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(latest(1L) == Streams.UserRunning(1L, 3, 20.0))
      assert(latest(2L) == Streams.UserRunning(2L, 2, 7.0))
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("Trigger.AvailableNow drains the source then stops on its own") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_availnow").toString
    val q = Streams.tumblingCounts(Streams.eventsStream(spark, sf))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName("availnow_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    // the incremental-batch deployment shape: process everything available,
    // terminate, resume from the checkpoint on the next scheduled run
    assert(q.awaitTermination(120000), "query did not self-terminate")
    assert(spark.table("availnow_out").count() > 0)
  }

  test("streaming word-count-to-KV emits updated counts per micro-batch") {
    import java.nio.file.Files
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = Files.createTempDirectory("graft_kvstream").toString
    val ms = MemoryStream[String]
    val q = Streams.wordCountToKv(ms.toDF().toDF("text"), outDir).start()
    try {
      ms.addData("a b a")
      q.processAllAvailable()
      ms.addData("b c")
      q.processAllAvailable()
    } finally q.stop()
    // batch 0: a=2, b=1; batch 1 updates b=2 and introduces c=1
    val all = spark.read.json(s"$outDir/batch_*/part-*.jsonl")
    val last = all.groupBy("word").agg(max("count").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("streaming parquet file sink with checkpoint persists exactly the input") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_sink").toString
    val enriched = Streams.enrichedStream(
      Streams.eventsStream(spark, sf), Tables.customer(spark, sf))
    val q = enriched.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(s"$base/out")
    assert(written.count() === Tables.events(spark, sf).count())
    // restart with the same checkpoint: no source data is reprocessed
    val q2 = enriched.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$base/out").count() === Tables.events(spark, sf).count())
  }

  test("stream-stream interval join matches clicks within 30min of a view") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val views = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    // view 10 at t0 for user 1; clicks at +5min (match), +45min (too late);
    // user 2 clicks at +5min with no view (no match)
    views.addData((10L, 1L, ts(0)), (11L, 3L, ts(1)))
    clicks.addData((20L, 1L, ts(5)), (21L, 1L, ts(45)), (22L, 2L, ts(5)))
    val joined = Streams.viewClickJoin(
      views.toDF().toDF("event_id", "user_id", "ts"),
      clicks.toDF().toDF("event_id", "user_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("viewclick_out").start()
    try q.processAllAvailable() finally q.stop()
    val pairs = spark.table("viewclick_out")
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 20L)))
  }

  test("stateful transitions: batch-boundary pairs survive and counts equal one batch lead() pass") {
    import graft.streaming.Streams.{Transition, TypedEvent}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[TypedEvent]
    val b1 = Seq(
      TypedEvent(1, 1, 100, "view"), TypedEvent(1, 2, 200, "click"),
      TypedEvent(2, 3, 100, "view"))
    val b2 = Seq(
      // u1's first event here must pair with the click that ended batch 1
      TypedEvent(1, 4, 300, "purchase"),
      TypedEvent(2, 5, 150, "view"), TypedEvent(2, 6, 250, "error"))
    val out = Streams.transitions(ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("transitions_out").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("transitions_out").as[Transition].collect()
      .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.length.toLong).toMap
    // the cross-batch pair is present at all
    assert(streamed.contains(("click", "purchase")),
      "batch-boundary transition lost — state not carried across batches")
    // full equivalence: one lead() pass over the union of both batches
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsMicros", "event_id")
    val batch = (b1 ++ b2).toDS().toDF()
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch, s"streamed $streamed vs batch $batch")
  }

  test("lateness stream: cross-batch running max and equivalence with the batch audit window") {
    import graft.streaming.Streams.{Lateness, TypedEvent}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[TypedEvent]
    val b1 = Seq(
      TypedEvent(1, 1, 100, "view"), TypedEvent(1, 2, 50, "click"), // 50 is late by 50
      TypedEvent(2, 3, 900, "view"))
    val b2 = Seq(
      // u1's in-order arrival; u2's arrival far behind the batch-1 max
      TypedEvent(1, 4, 300, "purchase"),
      TypedEvent(2, 5, 100, "view"))
    val out = Streams.latenessStream(ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lateness_out").start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lateness_out").as[Lateness].collect()
      .map(l => l.event_id -> l.late_us).toMap
    // cross-batch: user 2's batch-2 event must see batch-1's max (900)
    assert(streamed(5L) == 800L, "state not carried across batches")
    assert(streamed(2L) == 50L && streamed(1L) == 0L && streamed(4L) == 0L)
    // full equivalence: the batch audit's running-max window over the union
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = (b1 ++ b2).toDS().toDF()
      .withColumn("late_us",
        greatest(lit(0L), coalesce(max(col("tsMicros")).over(w), col("tsMicros")) - col("tsMicros")))
      .select("event_id", "late_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch, s"streamed $streamed vs batch $batch")
  }

  test("EWMA advance: a type skipping a day decays identically in fold and closed form") {
    val spark = TestSpark.session
    import spark.implicits._
    // type "b" is missing on day 2 of 3 (the ADVICE r7 gap): the fold
    // advances it with n = 0 (full join), and the batch query's causal
    // zero-fill must produce the same W — here checked against the
    // hand-unrolled recurrence s3 = (n3 + (0 + s1)/2)/2 with s1 = n1.
    val byDay = Seq(
      Seq(("a", 10L), ("b", 8L)),  // day 1
      Seq(("a", 6L)),              // day 2 - b absent
      Seq(("a", 4L), ("b", 2L)))   // day 3
    var state = Seq.empty[(String, Int, Long)].toDF("event_type", "t", "w")
    byDay.foreach { batch =>
      state = Streams.ewmaAdvance(state, batch.toDF("event_type", "n"))
        .select("event_type", "t", "w").as[(String, Int, Long)]
        .collect().toSeq.toDF("event_type", "t", "w")
    }
    val folded = state
      .withColumn("ewma", col("w").cast("double") /
        expr("shiftleft(cast(1 as bigint), t + 1)").cast("double"))
      .select("event_type", "ewma").as[(String, Double)].collect().toMap
    // a: s = 10, (10+6)/2 = 8, (8+4)/2 = 6 ; b: s = 8, (8+0)/2 = 4, (4+2)/2 = 3
    assert(folded === Map("a" -> 6.0, "b" -> 3.0), s"folded $folded")
  }

  test("EWMA advance: folding daily micro-batches is BIT-exact vs the batch query") {
    val spark = TestSpark.session
    import spark.implicits._
    val sf = TestSpark.Sf
    // the batch query's own daily frame, replayed one day at a time
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), graft.util.Det.fmtDate(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val days = daily.map(_._2).distinct.sorted
    var state = Seq.empty[(String, Int, Long)].toDF("event_type", "t", "w")
    days.foreach { d =>
      val batch = daily.filter(_._2 == d).map(x => (x._1, x._3))
        .toSeq.toDF("event_type", "n")
      state = Streams.ewmaAdvance(state, batch)
        .select("event_type", "t", "w").as[(String, Int, Long)]
        .collect().toSeq.toDF("event_type", "t", "w") // materialize the fold
    }
    val folded = state
      .withColumn("ewma", col("w").cast("double") /
        expr("shiftleft(cast(1 as bigint), t + 1)").cast("double"))
      .select("event_type", "ewma").as[(String, Double)].collect().toMap
    val batchLast = ops.EventTime.ewmaSmooth(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.maxBy(_._2)._3 }
    assert(folded.keySet === batchLast.keySet)
    batchLast.foreach { case (t, e) =>
      assert(folded(t) === e, s"$t: folded ${folded(t)} != batch $e (must be bit-exact)")
    }
  }

  test("Holt advance: folding daily micro-batches is BIT-exact vs the batch query") {
    val spark = TestSpark.session
    import spark.implicits._
    val sf = TestSpark.Sf
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), graft.util.Det.fmtDate(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val days = daily.map(_._2).distinct.sorted
    var state = Seq.empty[(String, Double, Double)].toDF("event_type", "l", "b")
    val perDay = scala.collection.mutable.Map.empty[(String, String), (Double, Double)]
    days.foreach { d =>
      val batch = daily.filter(_._2 == d).map(x => (x._1, x._3))
        .toSeq.toDF("event_type", "n")
      state = Streams.holtAdvance(state, batch)
        .select("event_type", "l", "b").as[(String, Double, Double)]
        .collect().toSeq.toDF("event_type", "l", "b") // materialize the fold
      state.as[(String, Double, Double)].collect()
        .foreach { case (t, l, b) => perDay((t, d)) = (l, b) }
    }
    val batchRows = ops.EventTime.holtLinear(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(batchRows.keySet === perDay.keySet.toSet,
      "fold visits exactly the batch grid cells")
    batchRows.foreach { case (k, (l, b)) =>
      val (fl, fb) = perDay(k)
      assert(fl === l && fb === b,
        s"$k: folded ($fl, $fb) != batch ($l, $b) (must be bit-exact)")
    }
  }

  test("SPC x-bar advance: fold over daily batches is BIT-exact vs windowed replay") {
    val spark = TestSpark.session
    import spark.implicits._
    val sf = TestSpark.Sf
    // the batch chart's own daily milli-quantized means, replayed one day
    // at a time (Phase II: each day judged by the history before it)
    val daily = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(graft.util.Det.fmtDate(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1000000 + lit(0.5)).cast("long")).as("tot"),
        count(lit(1)).as("n"))
      .select(col("day"),
        floor(col("tot").cast("double") / col("n").cast("double") /
          lit(1000000.0) * 1000 + lit(0.5)).cast("long").as("md"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(daily.length >= 5, "needs enough days to exercise the gate")
    var state = spark.emptyDataFrame
      .select(lit(0L).as("t"), lit(0L).as("smd"),
        lit(java.math.BigDecimal.ZERO).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)).as("smd2"))
      .limit(0)
    val perDay = scala.collection.mutable.Map.empty[String, Int]
    daily.foreach { case (d, md) =>
      val out = Streams.spcXbarAdvance(state, Seq((d, md)).toDF("day", "md"))
      val row = out.select("day", "md", "t", "smd", "smd2", "out_of_control")
        .collect().head
      perDay(d) = row.getInt(5)
      state = Seq((row.getLong(2), row.getLong(3),
          row.getDecimal(4).toBigInteger.toString))
        .toDF("t", "smd", "s2s")
        .select(col("t"), col("smd"),
          col("s2s").cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("smd2"))
    }
    // batch replay: running prefix sums via ordered windows, the identical
    // pure-integer 3-sigma gate on the PRECEDING days
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val prev = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val replay = daily.toSeq.toDF("day", "md")
      .withColumn("t0", (row_number().over(w) - 1).cast("long"))
      .withColumn("s", coalesce(sum("md").over(prev), lit(0L)))
      .withColumn("s2", coalesce(
        sum(col("md").cast(dec0) * col("md").cast(dec0)).over(prev),
        lit(0L).cast(dec0)))
      .withColumn("oob", when(col("t0") < 2, lit(0)).otherwise(
        ((col("t0").cast(dec0) * col("md").cast(dec0) - col("s").cast(dec0)) *
          (col("t0").cast(dec0) * col("md").cast(dec0) - col("s").cast(dec0)) *
          (col("t0") - 1).cast(dec0) >
          lit(9).cast(dec0) *
            (col("t0").cast(dec0) * col("s2") -
              col("s").cast(dec0) * col("s").cast(dec0)) *
            col("t0").cast(dec0)).cast("int")))
      .select("day", "oob").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(perDay.keySet === replay.keySet)
    perDay.foreach { case (d, f) =>
      assert(f === replay(d), s"$d: folded oob $f != replay ${replay(d)}")
    }
    // the gate engages somewhere (otherwise the test is vacuous) — at
    // least one judged day and at least one in-control day
    assert(perDay.values.toSeq.contains(0))
  }

  test("Page-Hinkley advance: fold over daily batches is BIT-exact vs windowed replay") {
    val spark = TestSpark.session
    import spark.implicits._
    val sf = TestSpark.Sf
    // daily micro-unit totals per type — the same frame the batch
    // detector aggregates (here per event type, the online deployment)
    val daily = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), graft.util.Det.fmtDate(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1000000 + lit(0.5)).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val days = daily.map(_._2).distinct.sorted
    var state = Seq.empty[(String, Long, Long, Double, Double, Double, String)]
      .toDF("event_type", "t", "cum", "m", "runmin", "best_ph", "best_day")
    days.foreach { d =>
      val batch = daily.filter(_._2 == d).map(x => (x._1, x._2, x._3))
        .toSeq.toDF("event_type", "day", "x")
      state = Streams.pageHinkleyAdvance(state, batch)
        .select("event_type", "t", "cum", "m", "runmin", "best_ph", "best_day")
        .as[(String, Long, Long, Double, Double, Double, String)]
        .collect().toSeq.toDF("event_type", "t", "cum", "m", "runmin", "best_ph", "best_day")
    }
    val folded = state.as[(String, Long, Long, Double, Double, Double, String)]
      .collect().map(r => r._1 -> r).toMap
    // batch replay: the identical per-day deviation and the same
    // left-to-right running accumulation via ordered windows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val replay = daily.toSeq.toDF("event_type", "day", "x")
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum", sum("x").over(run))
      .withColumn("d", (col("x") * col("t") - col("cum") - lit(50000L) * col("t"))
        .cast("double") / col("t").cast("double"))
      .withColumn("m", sum("d").over(run))
      .withColumn("runmin", least(lit(0.0), min("m").over(run)))
      .withColumn("ph", col("m") - col("runmin"))
    val last = replay.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("day").desc)))
      .filter(col("rn") === 1)
      .select("event_type", "t", "cum", "m", "runmin")
      .collect().map(r => r.getString(0) -> r).toMap
    val best = replay.withColumn("bp", max("ph").over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .filter(col("ph") === col("bp"))
      .groupBy("event_type").agg(first("bp").as("bp"), min("day").as("bd"))
      .collect().map(r => r.getString(0) -> (r.getString(0), r.getDouble(1), r.getString(2))).toMap
    assert(folded.keySet === last.keySet)
    last.foreach { case (ty, r) =>
      val f = folded(ty)
      assert(f._2 === r.getLong(1) && f._3 === r.getLong(2), s"$ty t/cum")
      assert(f._4 === r.getDouble(3), s"$ty m must be bit-exact")
      assert(f._5 === r.getDouble(4), s"$ty runmin must be bit-exact")
      assert(f._6 === best(ty)._2, s"$ty best_ph must be bit-exact")
      assert(f._7 === best(ty)._3, s"$ty best_day")
    }
  }
}
