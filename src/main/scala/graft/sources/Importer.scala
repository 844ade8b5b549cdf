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
    * optional explicit schema (inferred otherwise).
    *
    * `skipRows` drops the first N PHYSICAL lines of each file (the
    * preamble-skipping semantic of the reference's skip_rows) before
    * CSV parsing. Spark's CSV reader has no such option, so the skip
    * path reads each file whole (`wholetext`), drops the lines, and
    * parses the remainder as an in-memory CSV dataset — per-file
    * non-splittable, which is the honest cost of a line-offset
    * semantic; the skipRows=0 path stays on the splittable reader. */
  def importCsv(spark: SparkSession, path: String, tableName: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      delimiter: String = ",",
      skipRows: Int = 0,
      fragmentSize: Option[Long] = None): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
    val parse = (withSchema: org.apache.spark.sql.DataFrameReader) =>
      schema match {
        case Some(s) => withSchema.schema(s)
        case None => withSchema.option("inferSchema", "true")
      }
    val df =
      if (skipRows > 0) {
        import spark.implicits._
        val body = spark.read.option("wholetext", "true").textFile(path)
          .flatMap(_.split("\n", -1).iterator.drop(skipRows))
          .filter(_.nonEmpty)
        parse(r).csv(body)
      } else parse(r).csv(path)
    register(spark, df, tableName, fragmentSize)
  }

  /** JSONL (newline-delimited JSON) import — beyond the reference's
    * importer surface but table stakes for a training-data pipeline
    * (web-scrape and annotation dumps ship as JSONL). Splittable
    * line-per-record reads via Spark's native JSON source; schema
    * explicit or inferred; malformed lines either fail the read
    * (permissive=false) or land whole in a `_corrupt_record` column
    * for quarantine (permissive=true) — dropping them silently is not
    * an option a curation pipeline can afford. */
  def importJsonl(spark: SparkSession, path: String, tableName: String,
      schema: Option[StructType] = None,
      permissive: Boolean = true,
      fragmentSize: Option[Long] = None): DataFrame = {
    val r = spark.read
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    val df = schema match {
      case Some(s) =>
        val withCorrupt =
          if (permissive && !s.fieldNames.contains("_corrupt_record"))
            s.add("_corrupt_record", org.apache.spark.sql.types.StringType)
          else s
        r.schema(withCorrupt).json(path)
      case None => r.json(path)
    }
    register(spark, df, tableName, fragmentSize)
  }

  /** ORC import — beyond the reference's importer surface (parquet's
    * sibling columnar format in the Hadoop world; warehouses hand data
    * over as ORC as often as parquet). Spark's native vectorized ORC
    * reader: splittable, columnar, with predicate pushdown + column
    * pruning into the stripe reader exactly like the parquet path
    * (ImporterSpec asserts PushedFilters on an ORC scan). */
  def importOrc(spark: SparkSession, path: String, tableName: String,
      fragmentSize: Option[Long] = None): DataFrame =
    register(spark, spark.read.orc(path), tableName, fragmentSize)

  /** import_arrow analogue (hdk.py:2361): a standard Arrow IPC stream
    * (as produced by pyarrow's RecordBatchStreamWriter, DuckDB's
    * `.arrow()`, or [[org.apache.spark.sql.GraftShim.toArrowIpcStream]])
    * becomes a registered table; schema comes from the stream itself. */
  def importArrowIpc(spark: SparkSession, bytes: Array[Byte],
      tableName: String, fragmentSize: Option[Long] = None): DataFrame =
    register(spark,
      org.apache.spark.sql.GraftShim.fromArrowIpcStream(spark, bytes),
      tableName, fragmentSize)

  /** import_pydict analogue (hdk.py:2416): columnar in-memory data →
    * table, routed through a REAL Arrow IPC stream (columns are built
    * as Arrow vectors with the public arrow-vector API, serialized,
    * and ingested via [[importArrowIpc]]) — the same wire format a
    * pyarrow caller would hand us. */
  def importColumns(spark: SparkSession, tableName: String,
      columns: (String, Seq[Any])*): DataFrame = {
    require(columns.nonEmpty, "importColumns needs at least one column")
    val n = columns.head._2.length
    require(columns.forall(_._2.length == n), "ragged columns")
    importArrowIpc(spark, columnsToArrowIpc(columns, n), tableName)
  }

  /** Build one Arrow IPC stream from driver-side columns. Matches the
    * reference's pyarrow-backed pydict inference (hdk.py:2416): values
    * may be null (or scala Option); types are inferred from the first
    * non-null value — int, long, double, boolean, java.sql/java.time
    * date + timestamp, BigDecimal (scala or java; the column's scale is
    * the max scale observed, precision fits the widest rescaled value),
    * anything else as UTF-8 string. An all-null column is string. */
  private[graft] def columnsToArrowIpc(columns: Seq[(String, Seq[Any])],
      n: Int): Array[Byte] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    def unwrap(x: Any): Any = x match {
      case Some(v) => v
      case None => null
      case v => v
    }
    def toJBig(x: Any): java.math.BigDecimal = x match {
      case d: java.math.BigDecimal => d
      case d: scala.math.BigDecimal => d.bigDecimal
    }
    val cols = columns.map { case (name, vs) => name -> vs.map(unwrap) }
    val fields = cols.map { case (name, vs) =>
      val at: ArrowType = vs.find(_ != null) match {
        case Some(_: Int) => new ArrowType.Int(32, true)
        case Some(_: Long) => new ArrowType.Int(64, true)
        case Some(_: Double) => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case Some(_: Boolean) => ArrowType.Bool.INSTANCE
        case Some(_: java.sql.Date) | Some(_: java.time.LocalDate) =>
          new ArrowType.Date(DateUnit.DAY)
        case Some(_: java.sql.Timestamp) | Some(_: java.time.Instant) =>
          // session zone UTC repo-wide; tz-bearing micros = Spark TimestampType
          new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
        case Some(_: java.math.BigDecimal) | Some(_: scala.math.BigDecimal) =>
          val ds = vs.collect { case d if d != null &&
            (d.isInstanceOf[java.math.BigDecimal] || d.isInstanceOf[scala.math.BigDecimal]) => toJBig(d) }
          val scale = math.max(0, ds.map(_.scale).max)
          val precision = math.min(38,
            math.max(scale + 1, ds.map(_.setScale(scale).precision).max))
          new ArrowType.Decimal(precision, scale, 128)
        case _ => ArrowType.Utf8.INSTANCE
      }
      new Field(name, FieldType.nullable(at), null)
    }
    val schema = new Schema(java.util.Arrays.asList(fields: _*))
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        cols.zipWithIndex.foreach { case ((_, vs), ci) =>
          val v = root.getVector(ci)
          def setNull(i: Int): Unit = v match {
            case fw: BaseFixedWidthVector => fw.setNull(i)
            case vw: BaseVariableWidthVector => vw.setNull(i)
            case other => throw new IllegalStateException(s"null in $other")
          }
          vs.zipWithIndex.foreach {
            case (null, i) => setNull(i)
            case (x: Int, i) => v.asInstanceOf[IntVector].setSafe(i, x)
            case (x: Long, i) => v.asInstanceOf[BigIntVector].setSafe(i, x)
            case (x: Double, i) => v.asInstanceOf[Float8Vector].setSafe(i, x)
            case (x: Boolean, i) =>
              v.asInstanceOf[BitVector].setSafe(i, if (x) 1 else 0)
            case (x: java.sql.Date, i) => v.asInstanceOf[DateDayVector]
              .setSafe(i, x.toLocalDate.toEpochDay.toInt)
            case (x: java.time.LocalDate, i) => v.asInstanceOf[DateDayVector]
              .setSafe(i, x.toEpochDay.toInt)
            case (x: java.sql.Timestamp, i) =>
              v.asInstanceOf[TimeStampMicroTZVector]
                .setSafe(i, x.getTime * 1000L + (x.getNanos % 1000000) / 1000)
            case (x: java.time.Instant, i) =>
              v.asInstanceOf[TimeStampMicroTZVector]
                .setSafe(i, x.getEpochSecond * 1000000L + x.getNano / 1000)
            case (x: java.math.BigDecimal, i) =>
              val dv = v.asInstanceOf[DecimalVector]
              dv.setSafe(i, x.setScale(dv.getScale))
            case (x: scala.math.BigDecimal, i) =>
              val dv = v.asInstanceOf[DecimalVector]
              dv.setSafe(i, x.bigDecimal.setScale(dv.getScale))
            case (x, i) => v.asInstanceOf[VarCharVector]
              .setSafe(i, x.toString.getBytes("UTF-8"))
          }
        }
        root.setRowCount(n)
        val out = new java.io.ByteArrayOutputStream()
        val w = new ArrowStreamWriter(root, null, out)
        w.start(); w.writeBatch(); w.end()
        out.toByteArray
      } finally root.close()
    } finally alloc.close()
  }

  /** create_table analogue (hdk.py:2130): an empty table with the
    * given schema registered in the catalog. Column types accept the
    * reference's names (int/int64/text/fp64/…) as well as Spark DDL. */
  def createTable(spark: SparkSession, tableName: String,
      schema: Seq[(String, String)]): DataFrame = {
    require(schema.nonEmpty, "createTable needs at least one column")
    val st = StructType(schema.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, hdkType(t))
    })
    val df = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), st)
    graft.Tables.invalidate(spark, tableName)
    df.createOrReplaceTempView(tableName)
    df
  }

  /** HDK type-name → Spark type (IR/Type.h vocabulary + DDL passthrough). */
  private[graft] def hdkType(t: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t.trim.toLowerCase match {
      case "int8" | "tinyint" => ByteType
      case "int16" | "smallint" => ShortType
      case "int" | "int32" | "integer" => IntegerType
      case "int64" | "bigint" | "long" => LongType
      case "fp32" | "float" | "float32" => FloatType
      case "fp64" | "double" | "float64" => DoubleType
      case "bool" | "boolean" => BooleanType
      case "text" | "string" | "varchar" | "dict" => StringType
      case "date" => DateType
      case "time" | "timestamp" => TimestampType
      case other => StructType.fromDDL(s"__c $other").head.dataType
    }
  }

  def dropTable(spark: SparkSession, tableName: String): Unit = {
    graft.Tables.invalidate(spark, tableName)
    spark.catalog.dropTempView(tableName)
  }

  private def register(spark: SparkSession, df0: DataFrame, name: String,
      fragmentSize: Option[Long]): DataFrame = {
    val df = fragmentSize match {
      case Some(fs) => df0.repartition(estimateParts(df0, fs))
      case None => df0
    }
    graft.Tables.invalidate(df.sparkSession, name)
    df.createOrReplaceTempView(name)
    df
  }

  /** Partition count for a target rows-per-fragment WITHOUT scanning
    * the data: rows ≈ plan-stat bytes / schema row width. An exact
    * `count()` here would read every file footer (and at 100 TB add a
    * full extra job to each ingest); fragment sizing only steers
    * partition fan-out, and AQE absorbs the residual estimate error at
    * runtime. */
  private[graft] def estimateParts(df: DataFrame, fragmentSize: Long): Int = {
    require(fragmentSize > 0, s"fragmentSize must be positive: $fragmentSize")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val rowWidth = math.max(1, df.schema.defaultSize)
    val estRows = (bytes / rowWidth).max(BigInt(1))
    (estRows / fragmentSize + (if (estRows % fragmentSize == 0) 0 else 1))
      .max(BigInt(1)).min(BigInt(1 << 20)).toInt
  }
}
