package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe main: checks Spark can read the ns-precision events
  * parquet and prints schemas. Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    try {
      val ev = Tables.events(spark, d)
      ev.printSchema()
      ev.show(3, truncate = false)
      println("events read OK, count=" + ev.count())
    } catch {
      case e: Throwable => println("EVENTS READ FAILED: " + e)
    }
    spark.stop()
  }
}
