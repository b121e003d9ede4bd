package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, ExtQueries, LifecycleQueries, MlQueries, MoreQueries, OpQueries, QuerySpec, ShapeQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-module registries; every entry with an
  * `oracle` is hash-checked against DuckDB on sf0.01 by the driver, entries
  * without one get a rows-only check.
  */
object SparkEntry {

  def registry: Seq[QuerySpec] =
    CoreQueries.all ++ MoreQueries.all ++ OpQueries.all ++ ShapeQueries.all ++
      WarehouseQueries.all ++ LifecycleQueries.all ++ ExtQueries.all ++ MlQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j2_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
