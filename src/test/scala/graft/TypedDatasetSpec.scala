package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Catalyst can construct its Encoder without an outer scope. */
case class TypedItem(l_returnflag: String, l_quantity: Double)

/** The typed Dataset[T] surface (SURVEY.md §1.3: case-class Encoders where
  * type safety helps) must agree with the untyped DataFrame plans — and use
  * the scale-correct typed operators (reduceGroups partial-aggregates;
  * mapGroups does not and is avoided). */
class TypedDatasetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("typed filter + groupByKey.reduceGroups equals the untyped aggregate") {
    import spark.implicits._
    val typed = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity")).as[TypedItem]
      .filter(_.l_quantity > 10.0)
      .groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity)
      .reduceGroups(_ + _)
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10.0)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-6, s"flag $k") }
  }

  test("typed map over a case class preserves the schema contract") {
    import spark.implicits._
    val ds = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, n) => (id, n / 100) }
    assert(ds.schema.fields.map(_.name).toSeq === Seq("_1", "_2"))
    assert(ds.count() === Tables.documents(spark, sf).count())
  }
}
