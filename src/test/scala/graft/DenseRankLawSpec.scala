package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.ops.SuffixOps.denseRank2]] law: the sampled-bounds
  * two-phase dense rank equals the single-window brute force on a frame
  * large enough to spread across every bucket, with heavy key skew and
  * high pair multiplicity (the sf1 regime that caught the
  * spark_partition_id formulation — AQE gave the offs branch and the
  * row branch different partition-id mappings; a data-derived bucket id
  * cannot split that way).
  */
class DenseRankLawSpec extends AnyFunSuite {
  private val spark = TestSpark.session

  test("denseRank2 equals brute-force dense rank on a large skewed frame") {
    val df = spark.range(0, 600000).select(
      (col("id") % 3000).as("doc_id"),
      (col("id") / 3000).cast("int").as("pos"),
      // hot head: ~12% of rows share r1=0 (the "the" regime), the rest
      // spread over a small domain so pairs repeat heavily
      when(col("id") % 8 === 0, 0L)
        .otherwise(pmod(hash(col("id") * 7), lit(5000)).cast("long")).as("r1"),
      (pmod(hash(col("id") * 13), lit(300)).cast("long") - 1).as("r2"))
    val got = graft.ops.SuffixOps.denseRank2(df, 600000L)
    val exp = df.withColumn("rank",
      dense_rank().over(Window.orderBy("r1", "r2")).cast("long") - 1)
      .select("doc_id", "pos", "rank")
    val diff = got.as("g").join(exp.as("e"), Seq("doc_id", "pos"))
      .filter(col("g.rank") =!= col("e.rank")).count()
    assert(diff == 0L, s"$diff rows diverge from the brute-force rank")
  }
}
