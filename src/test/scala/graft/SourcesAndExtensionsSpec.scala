package graft

import java.nio.file.Files

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TSV/JSONL/ORC source round-trips (SURVEY.md R1) and the SQL surface of
  * the native expressions. */
class SourcesAndExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("TSV round-trip preserves documents (reference ingestion path)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft_tsv").toString + "/docs"
    Formats.writeTsv(docs, dir)

    val inferred = Formats.readTsvInferred(spark, dir)
    assert(inferred.count() === docs.count())
    assert(inferred.columns.toSeq === Seq("doc_id", "text", "lang"))

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val explicit = Formats.readTsv(spark, dir, schema)
    val back = explicit.orderBy("doc_id").collect().map(_.toSeq)
    val orig = docs.orderBy("doc_id").collect().map(_.toSeq)
    assert(back.sameElements(orig))
  }

  test("JSONL and ORC round-trips preserve rows") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val base = Files.createTempDirectory("graft_fmt").toString
    Formats.writeJsonl(ev, s"$base/jsonl")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    assert(Formats.readJsonl(spark, s"$base/jsonl", schema).count() === ev.count())
    Formats.writeOrc(ev, s"$base/orc")
    assert(Formats.readOrc(spark, s"$base/orc").count() === ev.count())
  }

  test("JSONL quarantine: malformed rows are captured, not dropped") {
    val base = Files.createTempDirectory("graft_quarantine").toString
    val lines = Seq(
      """{"event_id": 1, "event_type": "click", "value": 1.5}""",
      """{"event_id": 2, "event_type": "view"  "value": 2.5}""", // missing comma
      """not json at all""",
      """{"event_id": 4, "event_type": "error", "value": 4.5}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(base, "part.json"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val df = Formats.readJsonlQuarantine(spark, s"$base/part.json", schema).cache()
    // conservation: every input line is either parsed or quarantined
    assert(df.count() === lines.length)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() === 2)
    // the quarantined payload is the ORIGINAL line, re-processable
    val kept = corrupt.select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(kept === Set(lines(1), lines(2)))
    // parsed rows carry their typed values
    val good = df.filter(col("_corrupt_record").isNull)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(good === Set(1L, 4L))
    df.unpersist()
  }

  test("partitioned writes prune partitions on read") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    Formats.writePartitioned(docs, dir, "lang")

    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in:\n$plan")
    val expected = docs.filter(col("lang") === "en").count()
    assert(filtered.count() === expected)
  }

  test("z-ordered layout narrows per-file ranges in both dimensions") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    graft.sources.Formats.writeZOrdered(li, s"$base/z", "l_orderkey", "l_partkey", 8)
    li.repartition(8).write.parquet(s"$base/rr")
    def spanSum(dir: String, c: String): Double =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head
          r.getDouble(1) - r.getDouble(0)
        }.sum
    // round-robin files each span ~the full key range; z-ordered files
    // cover rectangles-with-jumps — total span must shrink in BOTH
    // dimensions (a 1-D sort would shrink only its leading column)
    assert(spanSum(s"$base/z", "l_orderkey") < spanSum(s"$base/rr", "l_orderkey") * 0.7)
    assert(spanSum(s"$base/z", "l_partkey") < spanSum(s"$base/rr", "l_partkey") * 0.7)
    // and the data itself is unchanged
    assert(spark.read.parquet(s"$base/z").count() === li.count())
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // generation 1: (doc_id, lang); generation 2 adds quality
    Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 100)
      .select("doc_id", "lang").write.parquet(dir)
    Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") >= 100)
      .select(col("doc_id"), col("lang"), (col("n_chars") > 500).as("quality"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "lang", "quality"))
    assert(merged.count() === Tables.documents(spark, TestSpark.Sf).count())
    // old-generation rows surface the new column as null
    assert(merged.filter(col("doc_id") < 100 && col("quality").isNotNull).count() === 0)
  }

  test("compaction collapses a many-file table without changing its rows") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/fragmented"
    val out = s"$base/compacted"
    Tables.documents(spark, TestSpark.Sf).repartition(32).write.parquet(frag)
    def files(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(frag) === 32)
    graft.sources.Formats.compact(spark, frag, out, targetFileBytes = 1L << 30)
    assert(files(out) === 1)
    val a = spark.read.parquet(frag).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("streaming anomaly alerts deliver per-batch above-threshold events") {
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = streaming.Streams.anomalyAlerts(
        streaming.Streams.eventsStream(spark, sf),
        Map("error" -> 150.0, "click" -> 200.0)) { (batch, _) =>
        seen ++= batch.collect().map(r => (r.getLong(0), r.getString(1)))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "error" && col("value") > 150.0 ||
              col("event_type") === "click" && col("value") > 200.0)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(seen.toSet === expected)
    assert(seen.nonEmpty)
  }

  test("float_dot and ngrams_ws are callable from SQL and match the Column API") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_ext ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaApi = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.VectorExpressions.floatDot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.sameElements(viaApi))

    Tables.documents(spark, sf).createOrReplaceTempView("docs_ext")
    val tri = spark.sql(
      "SELECT ngrams_ws(split(text, ' '), 3) AS g FROM docs_ext WHERE doc_id = 0")
      .head.getSeq[String](0)
    assert(tri.nonEmpty && tri.head.split(" ").length === 3)

    // r11 expressions: self-MaxSim of a unit-structured vector is subs
    // (8), and a suffix's LCP with itself is its remaining length
    val ms = spark.sql(
      """SELECT maxsim_score(embedding,
        |  transform(sequence(0, 7), i ->
        |    sqrt(aggregate(slice(embedding, i * 8 + 1, 8), CAST(0.0 AS DOUBLE),
        |      (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
        |  embedding,
        |  transform(sequence(0, 7), i ->
        |    sqrt(aggregate(slice(embedding, i * 8 + 1, 8), CAST(0.0 AS DOUBLE),
        |      (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
        |  8, 8) AS s
        |FROM emb_ext ORDER BY vec_id LIMIT 3""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(ms.nonEmpty && ms.forall(v => math.abs(v - 8.0) < 1e-9))
    val lcp = spark.sql(
      "SELECT token_lcp(split(text, ' '), split(text, ' '), 2, 2) AS l, " +
        "size(split(text, ' ')) - 2 AS want FROM docs_ext WHERE doc_id = 0")
      .head
    assert(lcp.getInt(0) === lcp.getInt(1))
  }

  test("Observation API: pipeline metrics ride the action, no second scan") {
    // the Spark-native way to collect row counts / sums for a run
    // manifest WITHOUT a separate count() pass over the data (the
    // reference's job metrics re-scan; Observation piggybacks the write)
    val spark = TestSpark.session
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    val df = Tables.documents(spark, TestSpark.Sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(length(col("text"))).as("n_chars"),
        count(when(col("lang") === "en", 1)).as("n_en"))
    val n = df.count() // the one action; metrics are a side product
    val m = obs.get
    assert(m("n_rows") === n)
    assert(m("n_chars").asInstanceOf[Long] > 0L)
    assert(m("n_en").asInstanceOf[Long] <= n)
  }

  test("parameterized spark.sql: named args bind without string splicing") {
    // Spark 4 parameterized SQL — the injection-safe form of the
    // reference's string-built job parameters (reqdef.yaml's
    // parameterized queries surface)
    val spark = TestSpark.session
    Tables.documents(spark, TestSpark.Sf).createOrReplaceTempView("docs_param")
    val rows = spark.sql(
      "SELECT count(*) AS n FROM docs_param WHERE lang = :lang AND n_chars >= :minLen",
      Map("lang" -> "en", "minLen" -> 10))
      .collect()
    val brute = Tables.documents(spark, TestSpark.Sf)
      .filter(col("lang") === "en" && col("n_chars") >= 10).count()
    assert(rows.head.getLong(0) === brute)
  }
}
