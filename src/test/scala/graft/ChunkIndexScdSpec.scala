package graft

import graft.ops.{Maintenance, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the chunking / inverted-index / SCD-2 operators —
  * properties beyond the DuckDB parity hash (engine parity proves both
  * engines agree, not that the result means what the operator claims). */
class ChunkIndexScdSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("chunkOverlap: strides reconstruct every document verbatim") {
    val W = 32
    val S = 24
    val chunks = TextAnalysis.chunkOverlap(spark, sf).cache()
    // every chunk holds 1..W tokens and token count matches its text
    assert(chunks.filter(col("n_tokens") < 1 || col("n_tokens") > W).count() === 0)
    assert(chunks.filter(
      size(split(col("chunk_text"), " ")) =!= col("n_tokens")).count() === 0)
    // concatenating each chunk's first S words (full final chunk) yields the
    // original text — i.e. the windows tile the document with overlap S..W
    val rebuilt = chunks
      .withColumn("piece", slice(split(col("chunk_text"), " "), 1, S))
      .groupBy("doc_id")
      .agg(array_join(flatten(sort_array(collect_list(
        struct(col("chunk_id"), col("piece"))))("piece")), " ").as("rebuilt"))
    val orig = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    assert(rebuilt.join(orig, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count() === 0)
    chunks.unpersist()
  }

  test("invertedIndex: df equals posting length, postings strictly ascending, band respected") {
    val idx = TextAnalysis.invertedIndex(spark, sf).cache()
    val parsed = idx.withColumn("ids",
      transform(split(col("postings"), ","), _.cast("long")))
    assert(parsed.filter(size(col("ids")) =!= col("df")).count() === 0)
    // strictly ascending ⇒ no duplicate doc ids and deterministic layout
    assert(parsed.filter(exists(
      zip_with(col("ids"), slice(col("ids"), 2, 1000000), (a, b) => b <= a),
      x => x)).count() === 0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(idx.filter(col("df") < 2 || col("df") > nDocs * 0.8).count() === 0)
    idx.unpersist()
  }

  test("scd2Dim: contiguous versions, one open row per customer, abutting validity") {
    val dim = Maintenance.scd2Dim(spark, sf).cache()
    val perCust = dim.groupBy("custkey").agg(
      count(lit(1)).as("n"),
      max("version").as("maxv"),
      sum("is_current").as("n_open"))
    // versions are exactly 1..n and exactly one row is open-ended
    assert(perCust.filter(col("maxv") =!= col("n")).count() === 0)
    assert(perCust.filter(col("n_open") =!= 1).count() === 0)
    // each closed row abuts its successor: valid_to == next valid_from,
    // and never precedes its own valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("version")
    val seq = dim.withColumn("next_from", lead("valid_from", 1).over(w))
    assert(seq.filter(col("valid_to").isNotNull &&
      col("valid_to") =!= col("next_from")).count() === 0)
    assert(seq.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count() === 0)
    // no zero-information rows: consecutive versions changed status
    val seq2 = dim.withColumn("prev_status", lag("status", 1).over(w))
    assert(seq2.filter(col("prev_status").isNotNull &&
      col("prev_status") === col("status")).count() === 0)
    dim.unpersist()
  }
}
