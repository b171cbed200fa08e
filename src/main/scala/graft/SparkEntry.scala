package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EavQueries, ExpressQueries, ExtQueries,
  FunctionQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every entry that is
  * SQL-expressible, used by the driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (RelationalQueries.all, RelationalQueries.oracles),
    (FunctionQueries.all, FunctionQueries.oracles),
    (EavQueries.all, EavQueries.oracles),
    (ExpressQueries.all, ExpressQueries.oracles),
    (PipelineQueries.all, PipelineQueries.oracles),
    (ExtQueries.all, ExtQueries.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
