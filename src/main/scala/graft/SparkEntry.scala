package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{TsQueries, OlapQueries, TextQueries, AnnQueries, TierQueries, PipelineQueries}
import graft.ml.MlQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Influx `max_groupby` headline query (reference
    * database/src/benchmark/influx_bench/mod.rs:33).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("influx_max_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsQueries.queries ++ OlapQueries.queries ++ TextQueries.queries ++ AnnQueries.queries ++ TierQueries.queries ++ MlQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsQueries.oracles ++ OlapQueries.oracles ++ TextQueries.oracles ++ AnnQueries.oracles ++ TierQueries.oracles ++ MlQueries.oracles ++ PipelineQueries.oracles

  /** Linear-time invariant checks for queries whose exact oracles are
    * quadratic/transitive in SQL — run by the sf0.1 scale checker when
    * the exact oracle blows its budget (see ScaleInvariants for the
    * contract and scope).
    */
  def scaleInvariants: Map[String, String] =
    graft.operators.ScaleInvariants.sql
}
