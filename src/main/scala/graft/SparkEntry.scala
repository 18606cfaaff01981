package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's named queries and their DuckDB oracle
  * SQL. Each module lives under [[graft.ops]] and exposes
  * `queries: Map[String, (SparkSession, String) => DataFrame]` plus
  * `oracle: Map[String, String]` (omitted entries get the driver's weaker
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01FlagshipRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Temporal.queries ++ ops.Scalars.queries ++
      ops.UdfSurface.queries ++ ops.Text.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.Sources.queries ++ ops.Grouping.queries ++ ops.Extended.queries ++
      ops.Extended2.queries ++ ops.Round3.queries ++ ops.Round4.queries ++
      ops.Round5.queries ++ ops.Round6.queries ++ ops.Round7.queries ++
      ops.Round8.queries ++ ops.Round9.queries ++ ops.Round10.queries ++
      ops.Round11.queries ++ ops.Round12.queries ++ ops.Round13.queries ++
      ops.Round14.queries ++ ops.Round15.queries ++ ops.Round16.queries ++
      ops.Round17.queries ++ ops.Round18.queries ++
      ml.Pipelines.queries ++ multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Temporal.oracle ++ ops.Scalars.oracle ++
      ops.UdfSurface.oracle ++ ops.Text.oracle ++
      ops.Dedup.oracle ++ ops.Similarity.oracle ++
      ops.Sources.oracle ++ ops.Grouping.oracle ++ ops.Extended.oracle ++
      ops.Extended2.oracle ++ ops.Round3.oracle ++ ops.Round4.oracle ++
      ops.Round5.oracle ++ ops.Round6.oracle ++ ops.Round7.oracle ++
      ops.Round8.oracle ++ ops.Round9.oracle ++ ops.Round10.oracle ++
      ops.Round11.oracle ++ ops.Round12.oracle ++ ops.Round13.oracle ++
      ops.Round14.oracle ++ ops.Round15.oracle ++ ops.Round16.oracle ++
      ops.Round17.oracle ++ ops.Round18.oracle ++
      ml.Pipelines.oracle ++ multimodal.Multimodal.oracle
}
