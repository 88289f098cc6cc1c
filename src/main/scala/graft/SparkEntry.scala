package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §3
  * (lifecycle). Each operator category lives in its own object under
  * `graft.operators`; this object just merges their maps.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggregates.queries ++ SetOps.queries ++
      Windows.queries ++ Scalars.queries ++ Pipeline.queries ++
      Temporal.queries ++ Text.queries ++ NearDedup.queries ++
      Ann.queries ++ Ivf.queries ++ Pq.queries ++ Pca.queries ++
      Multimodal.queries ++
      Tpch.queries ++ Etl.queries ++ Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggregates.oracle ++ SetOps.oracle ++
      Windows.oracle ++ Scalars.oracle ++ Pipeline.oracle ++
      Temporal.oracle ++ Text.oracle ++ NearDedup.oracle ++
      Ann.oracle ++ Ivf.oracle ++ Pq.oracle ++ Pca.oracle ++
      Multimodal.oracle ++
      Tpch.oracle ++ Etl.oracle ++ Analytics.oracle
}
