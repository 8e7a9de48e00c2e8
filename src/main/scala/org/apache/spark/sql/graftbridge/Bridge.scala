package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils` (and the
  * Column(ColumnNode) constructor path) `private[sql]`, so extension
  * libraries embedding custom Catalyst expressions expose them through a
  * shim inside the `org.apache.spark.sql` package namespace — the standard
  * pattern for Spark-native extension jars.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (analyzed) logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]` in Spark 4. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently register a planner strategy on a live session.
    * `planner.strategies` is the full list — it prepends
    * `experimental.extraStrategies` and includes `spark.sql.extensions`-
    * injected strategies (which a bare `extraStrategies.contains` check
    * would miss). Synchronized so concurrent callers cannot both pass the
    * check and double-register. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession,
                     strategy: org.apache.spark.sql.execution.SparkStrategy): Unit =
    spark.synchronized {
      val planner = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner
      if (!planner.strategies.contains(strategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
      }
    }

  /** The reliable-checkpoint directory of the RDD backing a
    * just-checkpointed DataFrame: `Dataset.checkpoint` returns a
    * `LogicalRDD` (private[sql]) over the checkpointed RDD, whose
    * `getCheckpointFile` names its own `rdd-&lt;id&gt;` dir exactly —
    * the attribution [[graft.util.Ckpt]] needs without diffing a
    * directory listing that a concurrent writer could pollute. */
  def checkpointFileOf(df: org.apache.spark.sql.DataFrame): Option[String] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
      case _ => None
    }

  /** Register a function builder on a live session (sessionState is
    * `private[sql]`; at build time use `GraftExtensions` via
    * `spark.sql.extensions` instead). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
