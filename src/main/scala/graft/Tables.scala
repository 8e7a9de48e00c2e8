package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas in /root/repo/FIXTURES.md).
  *
  * Mirrors the reference's source stage — a Parquet scan
  * (`infra/scripts/process_tsv.py:62-64`) — generalized to the driver's
  * TPC-H-ish star schema. Keeping one accessor per table makes column
  * pruning / filter pushdown visible at each call site: callers `.select`
  * immediately, so the parquet reader only materializes needed columns.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** `events.ts` normalized to a session-timezone (UTC) microsecond
    * timestamp regardless of the fixture generation's physical layout:
    *
    *  - parquet timestamp[ns]: Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]), so we read the raw long
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros
    *    (`ts div 1000`) — the original fixture layout.
    *  - parquet timestamp[us] without isAdjustedToUTC: Spark infers
    *    TIMESTAMP_NTZ; cast to TimestampType is wall-clock-preserving
    *    under the UTC session timezone every entry point sets — the
    *    regenerated fixture layout.
    *
    * The DuckDB oracle reads the same file natively, so every oracled
    * query formats/truncates `ts` before it reaches a result column
    * (FIXTURES.md gotchas).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(p(s, d, "events"))
  }

  /** See [[events]]; shared with the streaming source so both read shapes
    * produce the identical TimestampType column. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
}
