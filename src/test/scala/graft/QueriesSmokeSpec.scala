package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage: every declared query runs and returns rows at sf0.001,
  * and the contract maps are mutually consistent. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, TestSpark.Sf)
      assert(df.schema.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
