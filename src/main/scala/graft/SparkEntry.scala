package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-family modules under
  * `graft.ops` — one entry per operator in SURVEY.md §2b.
  */
object SparkEntry {
  /** Flagship query (the reference's word-frequency ETL,
    * `infra/scripts/demo-etl-2a-notebook.py:53-56`) on sf=0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.wordCount(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Relational.queries, ops.Relational.oracle),
      (ops.Scalars.queries, ops.Scalars.oracle),
      (ops.Aggregations.queries, ops.Aggregations.oracle),
      (ops.Joins.queries, ops.Joins.oracle),
      (ops.Windows.queries, ops.Windows.oracle),
      (ops.EventTime.queries, ops.EventTime.oracle),
      (ops.TextAnalysis.queries, ops.TextAnalysis.oracle),
      (ops.Dedup.queries, ops.Dedup.oracle),
      (ops.Similarity.queries, ops.Similarity.oracle),
      (ops.Multimodal.queries, ops.Multimodal.oracle),
      (ops.Structured.queries, ops.Structured.oracle),
      (ops.Statistics.queries, ops.Statistics.oracle),
      (ops.Sketches.queries, ops.Sketches.oracle),
      (ops.Maintenance.queries, ops.Maintenance.oracle),
      (ops.ScaleOps.queries, ops.ScaleOps.oracle),
      (ops.TrainingPrep.queries, ops.TrainingPrep.oracle),
      (ops.Curation.queries, ops.Curation.oracle),
      (ops.Graph.queries, ops.Graph.oracle),
      (ops.SuffixOps.queries, ops.SuffixOps.oracle),
      (ops.TypedOps.queries, ops.TypedOps.oracle),
      (ops.Evaluation.queries, ops.Evaluation.oracle),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
