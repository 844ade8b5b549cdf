package graft.sources

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Arrow interchange (IO3/IO5; reference hdk.py:2361 import_arrow,
  * hdk.py:2416 import_pydict, ResultSetArrowConversion): real IPC
  * bytes in, real IPC bytes out, including a stream written by a
  * DIFFERENT Arrow implementation (pyarrow fixture).
  */
class ArrowInterchangeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("DataFrame → Arrow IPC stream → DataFrame round-trips schema and values") {
    val nation = Tables.load(spark, TestSpark.sf, "nation")
      .orderBy(col("n_nationkey"))
    val bytes = GraftShim.toArrowIpcStream(nation)
    assert(bytes.length > 0)
    val back = Importer.importArrowIpc(spark, bytes, "nation_arrow")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      nation.schema.map(f => (f.name, f.dataType)))
    val a = nation.collect().map(_.toSeq).toSeq
    val b = back.orderBy(col("n_nationkey")).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(spark.sql("SELECT count(*) FROM nation_arrow").head().getLong(0) == 25)
    Importer.dropTable(spark, "nation_arrow")
  }

  test("doubles and aggregates survive the Arrow round trip bit-exactly") {
    val src = Tables.load(spark, TestSpark.sf, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"))
    val back = GraftShim.fromArrowIpcStream(spark, GraftShim.toArrowIpcStream(src))
    val a = src.agg(sum(col("s_acctbal").cast("decimal(18,2)"))).head().getDecimal(0)
    val b = back.agg(sum(col("s_acctbal").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(a == b)
    assert(back.count() == src.count())
  }

  test("a pyarrow-written IPC stream imports with correct schema and values") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/pyarrow_fixture.arrows").toURI))
    val df = Importer.importArrowIpc(spark, bytes, "pyarrow_t")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("id", "long"), ("name", "string"), ("score", "double"), ("ok", "boolean")))
    val rows = df.orderBy(col("id")).collect()
    assert(rows.length == 4)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(rows(3).getDouble(2) == 42.125 && !rows(3).getBoolean(3))
    assert(spark.sql("SELECT sum(score) FROM pyarrow_t").head().getDouble(0) == 41.375)
    Importer.dropTable(spark, "pyarrow_t")
  }

  test("builder toArrow egress is readable back as an IPC stream") {
    val hdk = new graft.builder.GraftBuilder(spark, TestSpark.sf)
    val bytes = hdk.scan("region").sort(("r_regionkey", "asc")).toArrow
    val back = GraftShim.fromArrowIpcStream(spark, bytes)
    assert(back.count() == 5)
    assert(back.columns.contains("r_name"))
  }

  test("empty results and NULL values survive the round trip") {
    import spark.implicits._
    // empty: stream carries schema + zero batches
    val empty = Tables.load(spark, TestSpark.sf, "nation")
      .filter(col("n_nationkey") < 0)
    val backEmpty = GraftShim.fromArrowIpcStream(
      spark, GraftShim.toArrowIpcStream(empty))
    assert(backEmpty.count() == 0)
    assert(backEmpty.schema.map(_.name) == empty.schema.map(_.name))
    // nulls in every type class
    val withNulls = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, None),
      (3L, Some("c"), Some(-0.25))).toDF("id", "s", "x")
    val back = GraftShim.fromArrowIpcStream(
      spark, GraftShim.toArrowIpcStream(withNulls))
    val rows = back.orderBy(col("id")).collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).getString(1) == "c" && rows(2).getDouble(2) == -0.25)
  }

  test("a multi-batch stream decodes distributed: >1 partition, no driver copy") {
    val nation = Tables.load(spark, TestSpark.sf, "nation").repartition(3)
    val bytes = GraftShim.toArrowIpcStream(nation)
    val back = GraftShim.fromArrowIpcStream(spark, bytes)
    // one record batch per source partition → one decode partition each
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() == 25)
    assert(back.agg(sum(col("n_nationkey"))).head().getLong(0) == 300L)
  }

  test("writeArrowIpcStream: chunked file export equals the buffered stream, round-trips") {
    // the r13 bounded-memory export: batches are PULLED one partition
    // at a time (toLocalIterator) and written straight to the sink —
    // the path a driver-memory-sized result takes. The produced bytes
    // must equal the buffered convenience form byte-for-byte, and a
    // many-partition frame (here 32 shuffle partitions of lineitem)
    // must survive a file round-trip.
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .repartition(32, col("l_orderkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    assert(li.rdd.getNumPartitions == 32)
    val f = java.io.File.createTempFile("graft_arrow_export", ".arrows")
    f.deleteOnExit()
    val fos = new java.io.FileOutputStream(f)
    try GraftShim.writeArrowIpcStream(li, fos) finally fos.close()
    val streamed = java.nio.file.Files.readAllBytes(f.toPath)
    val buffered = GraftShim.toArrowIpcStream(li)
    assert(java.util.Arrays.equals(streamed, buffered),
      "chunked and buffered exports must produce identical IPC bytes")
    val back = GraftShim.fromArrowIpcStream(spark, streamed)
    assert(back.count() == li.count())
    assert(back.agg(sum(col("l_orderkey"))).head().getLong(0) ==
      li.agg(sum(col("l_orderkey"))).head().getLong(0))
  }

  test("importColumns routes through a real Arrow IPC stream") {
    val ipc = Importer.columnsToArrowIpc(
      Seq("k" -> Seq(1, 2, 3), "v" -> Seq("a", "b", "c"),
        "x" -> Seq(1.5, 2.5, 3.5), "b" -> Seq(true, false, true)), 3)
    // the produced bytes are a standard stream: our own reader accepts them
    val df = GraftShim.fromArrowIpcStream(spark, ipc)
    assert(df.schema.map(_.dataType.typeName) ==
      Seq("integer", "string", "double", "boolean"))
    assert(df.orderBy(col("k")).collect().map(_.getString(1)).toSeq ==
      Seq("a", "b", "c"))
  }
}
