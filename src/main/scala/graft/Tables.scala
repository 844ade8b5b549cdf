package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables.
  *
  * Plays the role of pyhdk's storage layer (`ArrowStorage.importParquet`,
  * reference: python/pyhdk/hdk.py:2313 + omniscidb/ArrowStorage) — but
  * Spark's vectorized parquet reader already IS an Arrow-class columnar
  * scan with predicate pushdown and column pruning, so "storage" is just
  * `spark.read.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"),
      nanosAsLongCols = if (name == "events") Set("ts") else Set.empty)

  /** Timestamp normalization across driver data vintages. The tables
    * have carried two parquet encodings: TIMESTAMP(NANOS) (read as
    * long under spark.sql.legacy.parquet.nanosAsLong, set by
    * GraftSession / Verify / Bench) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ since Spark 4
    * infers NTZ). Every session here pins spark.sql.session.timeZone
    * = UTC, so NTZ → LTZ preserves the wall clock exactly and keeps
    * one engine-wide timestamp type the operator code (unix_micros,
    * windows, watermarks) can rely on. */
  def normalizeTimestamps(df: DataFrame,
      nanosAsLongCols: Set[String] = Set.empty): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast("timestamp"))
        case LongType if nanosAsLongCols(f.name) =>
          acc.withColumn(f.name,
            expr(s"timestamp_micros(${f.name} div 1000)"))
        case _ => acc
      }
    }
  }

  /** Register every table as a temp view (idempotent) — the analogue of
    * pyhdk `create_table`/`scan` (hdk.py:2130,2556); enables the SQL
    * frontend path (hdk.py:2456 `HDK.sql`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
