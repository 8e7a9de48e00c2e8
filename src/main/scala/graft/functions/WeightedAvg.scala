package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[WeightedAvg]]: price in integer cents, integer quantity.
  * Integer-domain inputs keep the aggregation exact and therefore
  * order-independent — a double-accumulating UDAF would give
  * partition-order-dependent results at scale. */
case class WeightedItem(price_cents: Long, qty: Long)

/** Typed `Aggregator` UDAF: quantity-weighted mean unit price.
  *
  * Demonstrates the engine's custom-aggregation surface (the §2b fallback
  * reserved in SURVEY.md "UDF surface"): a two-field commutative monoid
  * buffer, so Spark plans it as a partial (map-side) + final hash aggregate
  * exactly like a built-in — no row shuffling beyond the group keys, and
  * merge() is associative so AQE/skew splitting stay correct.
  */
object WeightedAvg extends Aggregator[WeightedItem, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: WeightedItem): (Long, Long) =
    (b._1 + a.price_cents, b._2 + a.qty)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) Double.NaN else (r._1 / 100.0) / r._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
