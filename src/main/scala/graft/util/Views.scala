package graft.util

import org.apache.spark.sql.DataFrame

/** Temp-view registration for SQL-surface queries, race-free across
  * fixture directories (ADVICE round-3, low): a fixed view name means two
  * concurrent calls of the same query against DIFFERENT fixture dirs
  * clobber each other's input mid-plan. The view name here is a pure
  * function of (base, dir), so distinct dirs get distinct views, while
  * same-dir reuse overwrites with identical content — benign. Names stay
  * deterministic (no UUID churn in catalogs or plans) and bounded by the
  * number of dirs a session touches. */
object Views {
  def forDir(base: String, dir: String, df: DataFrame): String = {
    val name = s"${base}_${Integer.toHexString(dir.hashCode)}"
    df.createOrReplaceTempView(name)
    name
  }
}
