package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-area query inventories; names map to SURVEY.md §2
  * operator ids (s1_, f1_, g2_, …) plus pipeline ops (p_…).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.queries("g2_time_bins_5m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ StoreQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracleSql ++ StoreQueries.oracleSql ++ PipelineQueries.oracleSql

  /** One-time fixture build (store datasets under /tmp) so benchmark
    * timings measure queries, not setup. */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    StoreQueries.ensure(spark, sfDir): Unit
    PipelineQueries.prepare(spark, sfDir)
  }
}
