package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest analogues of pyhdk's storage importers
  * (reference: python/pyhdk/hdk.py import_csv:2229, import_parquet:2313,
  * import_arrow:2361, import_pydict:2416, create/drop_table:2130,2169).
  *
  * HDK fragments tables into fixed row-count fragments (its unit of
  * parallel execution); Spark's analogue is partitioning, so
  * `fragmentSize` maps to `repartition(ceil(rows / fragmentSize))`.
  * Registered names are temp views — the same role as HDK's database
  * catalog for query resolution.
  */
object Importer {

  def importParquet(spark: SparkSession, path: String, tableName: String,
      fragmentSize: Option[Long] = None): DataFrame =
    register(spark, spark.read.parquet(path), tableName, fragmentSize)

  /** CSV import with hdk.py:2229's knobs: header, delimiter, skip_rows,
    * optional explicit schema (inferred otherwise). */
  def importCsv(spark: SparkSession, path: String, tableName: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      delimiter: String = ",",
      skipRows: Int = 0,
      fragmentSize: Option[Long] = None): DataFrame = {
    var r = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
    if (skipRows > 0) r = r.option("skipLines", skipRows.toString)
    val df = schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
    register(spark, df, tableName, fragmentSize)
  }

  /** import_pydict analogue: columnar in-memory data → table. */
  def importColumns(spark: SparkSession, tableName: String,
      columns: (String, Seq[Any])*): DataFrame = {
    require(columns.nonEmpty, "importColumns needs at least one column")
    val n = columns.head._2.length
    require(columns.forall(_._2.length == n), "ragged columns")
    val rows = (0 until n).map(i =>
      org.apache.spark.sql.Row.fromSeq(columns.map(_._2(i))))
    val fields = columns.map { case (name, vs) =>
      val dt = vs.headOption match {
        case Some(_: Int) => org.apache.spark.sql.types.IntegerType
        case Some(_: Long) => org.apache.spark.sql.types.LongType
        case Some(_: Double) => org.apache.spark.sql.types.DoubleType
        case Some(_: Boolean) => org.apache.spark.sql.types.BooleanType
        case _ => org.apache.spark.sql.types.StringType
      }
      org.apache.spark.sql.types.StructField(name, dt)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq),
      StructType(fields.toSeq))
    register(spark, df, tableName, None)
  }

  def dropTable(spark: SparkSession, tableName: String): Unit =
    spark.catalog.dropTempView(tableName)

  private def register(spark: SparkSession, df0: DataFrame, name: String,
      fragmentSize: Option[Long]): DataFrame = {
    val df = fragmentSize match {
      case Some(fs) =>
        val parts = math.max(1L, math.ceil(df0.count().toDouble / fs).toLong)
        df0.repartition(parts.toInt)
      case None => df0
    }
    df.createOrReplaceTempView(name)
    df
  }
}
