package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark query plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Column names must match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Collect a module's queries into the SparkEntry maps. */
  def toMaps(qs: Seq[Q])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) =
    (qs.map(q => q.name -> q.run).toMap,
     qs.flatMap(q => q.oracle.map(q.name -> _)).toMap)
}
