package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query pins one or more operators from SURVEY.md §2 /
  * §7.3 and has matching DuckDB ANSI SQL in [[oracleSql]] (the driver
  * hash-compares both on sf0.01). Column names, rounding, integer
  * widths, and final ordering are aligned on both sides (SURVEY.md
  * §7.0 determinism rules). Queries live next to their oracle SQL in
  * per-package packs; this object only aggregates.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    olap.OlapQueries.revenueByCategory(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etl.EtlQueries.queries ++ olap.OlapQueries.queries ++
      olap.OlapMore.queries ++ olap.Analytics.queries ++
      olap.Inference.queries ++
      olap.OlapStats.queries ++ olap.Skew.queries ++ olap.SqlSurface.queries ++
      olap.Subqueries.queries ++
      stream.EventQueries.queries ++ text.TextQueries.queries ++
      text.TextAnalytics.queries ++ text.CorpusOps.queries ++
      text.DocOps.queries ++ text.GrowthOps.queries ++
      vector.VectorQueries.queries ++
      vector.Projection.queries ++ multimodal.MediaQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    etl.EtlQueries.oracle ++ olap.OlapQueries.oracle ++
      olap.OlapMore.oracle ++ olap.Analytics.oracle ++
      olap.Inference.oracle ++
      olap.OlapStats.oracle ++ olap.Skew.oracle ++ olap.SqlSurface.oracle ++
      olap.Subqueries.oracle ++
      stream.EventQueries.oracle ++ text.TextQueries.oracle ++
      text.TextAnalytics.oracle ++ text.CorpusOps.oracle ++
      text.DocOps.oracle ++ text.GrowthOps.oracle ++
      vector.VectorQueries.oracle ++
      vector.Projection.oracle ++ multimodal.MediaQueries.oracle
}
