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
  /** Checkout-relative scratch directory for roundtrip queries and
    * specs (r6 advice: a hardcoded absolute path broke the library the
    * moment the repo was checked out elsewhere). Resolves under the
    * process working directory — sbt pins that to the project root —
    * and is overridable with -Dgraft.scratch.dir for callers whose CWD
    * is not writable. */
  def scratchDir(name: String): String = {
    val base = new java.io.File(
      sys.props.getOrElse("graft.scratch.dir", "target/tmp"))
    new java.io.File(base, name).getAbsolutePath
  }

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
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
