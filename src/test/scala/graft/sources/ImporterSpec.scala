package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ImporterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("importParquet registers a queryable view with fragmentation") {
    val df = Importer.importParquet(spark,
      s"${TestSpark.sf}/lineitem.parquet", "li_frag", fragmentSize = Some(1000L))
    assert(df.rdd.getNumPartitions == 6) // 6000 rows / 1000 per fragment
    assert(spark.sql("SELECT count(*) FROM li_frag").head().getLong(0) == 6000)
    Importer.dropTable(spark, "li_frag")
  }

  test("importCsv honors schema, delimiter, header") {
    val dir = "/root/repo/target/tmp/importer_csv"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/d.csv"), "a;b\n1;x\n2;y\n")
    val df = Importer.importCsv(spark, dir, "csv_t",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL("a INT, b STRING")),
      delimiter = ";")
    assert(df.count() == 2)
    assert(spark.sql("SELECT sum(a) FROM csv_t").head().getLong(0) == 3)
    Importer.dropTable(spark, "csv_t")
  }

  test("importColumns builds a table from in-memory columns") {
    val df = Importer.importColumns(spark, "mem_t",
      "k" -> Seq(1, 2, 3), "v" -> Seq("a", "b", "c"))
    assert(df.count() == 3)
    assert(spark.sql("SELECT v FROM mem_t WHERE k = 2").head().getString(0) == "b")
    Importer.dropTable(spark, "mem_t")
  }
}
