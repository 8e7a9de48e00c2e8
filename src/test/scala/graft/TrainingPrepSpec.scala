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
}
