package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * query key maps to.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    _root_.graft.queries.CoreQueries.all ++
      _root_.graft.queries.ExtendedQueries.all ++
      _root_.graft.queries.PipelineQueries.all ++
      _root_.graft.queries.SqlTvfQueries.all

  private lazy val maps = Q.toMaps(modules)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = maps._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] = maps._2
}
