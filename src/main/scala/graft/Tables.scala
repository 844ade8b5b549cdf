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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) — Spark reads it as long only
    // under spark.sql.legacy.parquet.nanosAsLong (set by GraftSession /
    // Verify / Bench); normalize to a proper TimestampType (micros).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (idempotent) — the analogue of
    * pyhdk `create_table`/`scan` (hdk.py:2130,2556); enables the SQL
    * frontend path (hdk.py:2456 `HDK.sql`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
