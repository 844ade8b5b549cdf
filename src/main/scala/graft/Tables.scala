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

  /** Parquet schema cache (r16, guide §6/§1.2 "per-query fixed work"):
    * `spark.read.parquet(path)` infers the schema by listing the path
    * and reading a footer on the DRIVER at plan-build time — ~20-50 ms
    * per call, paid again on EVERY query invocation (SQL-route keys
    * pay it ×10 via [[registerAll]]). The driver-generated tables are
    * immutable for the life of a process, so the schema is read once
    * per path and passed explicitly thereafter; the DATA is still
    * scanned from parquet by every query — this caches metadata, never
    * results. Keyed by resolved path so different SF dirs coexist. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    normalizeTimestamps(spark.read.schema(schema).parquet(path),
      nanosAsLongCols = if (name == "events") Set("ts") else Set.empty)
  }

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
    *
    * r16: re-registration is skipped while the SAME dir is already the
    * session's registered source — every SQL-route query calls this,
    * and 10 view (re)creations per query were ~0.5-1 s of pure
    * per-query fixed work (guide §1.2: per-task/per-query overhead
    * after the algorithm is right). A temp view holds only the scan
    * PLAN — each query execution still reads the parquet data fresh,
    * and switching dirs re-registers, so behavior is unchanged.
    *
    * r17 (ADVICE): the skip is only sound while the canonical views
    * actually still point at this dir's parquet. Importer.createTable/
    * dropTable/register and QueryBuilder can shadow or drop any of the
    * 10 names in the same session — they call [[invalidate]] so the
    * next registerAll repairs the views instead of silently running
    * SQL against wrong data. The map is weak-keyed so retired sessions
    * (specs build hundreds) are not pinned for the JVM's lifetime. */
  private val registeredDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Forget the session's registered-dir marker — called by every code
    * path that (re)binds a temp view whose name collides with a
    * canonical table name. */
  def invalidate(spark: SparkSession, viewName: String): Unit =
    if (names.contains(viewName)) registeredDir.remove(spark)

  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.put(spark, dir) != dir)
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
