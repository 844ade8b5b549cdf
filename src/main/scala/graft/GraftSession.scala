package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Mirrors the role of pyhdk's `Config`/`init()` (reference:
  * python/pyhdk/hdk.py:2113,2956) — one place that owns engine-wide
  * settings. At cluster scale the same settings apply; only `master`
  * changes (spark-submit injects it).
  */
object GraftSession {
  def build(appName: String = "graft",
            cores: Int = Runtime.getRuntime.availableProcessors min 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
