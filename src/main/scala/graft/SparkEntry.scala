package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator of SURVEY.md §2 (plus the
  * LLM-pipeline extensions); `oracleSql` carries the DuckDB-equivalent SQL for
  * every query whose semantics ANSI SQL can express.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.OpsQueries.queries ++
      graft.queries.ExtQueries.queries ++ graft.queries.StreamQueries.queries ++
      graft.queries.Analytics.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.OpsQueries.oracle ++
      graft.queries.ExtQueries.oracle ++ graft.queries.StreamQueries.oracle ++
      graft.queries.Analytics.oracle
}
