package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order write layout (SURVEY.md §2 IO8): the proof is on the FILE
  * STATISTICS a selective reader actually uses — after a z-ordered
  * write, most files' (min, max) boxes are disjoint from a small
  * 2-D box predicate and are skippable, where the same rows written
  * unclustered produce files that all span the whole domain. */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("zValue interleaves bits (hand-checked Morton codes)") {
    import spark.implicits._
    val df = Seq((3L, 1L), (2L, 3L), (0L, 0L), (1023L, 0L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 10).as("z"))
    // z(3,1): x bits 1,1; y bits 1,0 → 0b0111 = 7
    // z(2,3): x bits 0,1; y bits 1,1 → 0b1110 = 14
    // z(1023,0): x alone in even positions → 0b01...01 over 20 bits
    val zs = df.as[Long].collect()
    assert(zs(0) == 7L && zs(1) == 14L && zs(2) == 0L)
    assert(zs(3) == (0 until 10).map(i => 1L << (2 * i)).sum)
  }

  test("z-ordered write makes files skippable for a 2-D box; plain write does not") {
    val n = 20000L
    val pts = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit(7)), lit(1024L)).as("y"))
    val zdir = graft.GraftSession.scratchDir("layout_z")
    val rdir = graft.GraftSession.scratchDir("layout_plain")
    Layout.writeZOrdered(pts, "x", "y", zdir, maxRecordsPerFile = 1000)
    pts.write.mode("overwrite").option("maxRecordsPerFile", "1000")
      .parquet(rdir)
    // a file is skippable for the box x,y ∈ [0,100] iff its min/max
    // range is disjoint — exactly the footer-stats test the parquet
    // reader applies to row groups under a pushed filter
    def skippable(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet"))
      val skips = files.count { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
          .head()
        r.getLong(0) > 100 || r.getLong(1) < 0 ||
          r.getLong(2) > 100 || r.getLong(3) < 0
      }
      (skips, files.length)
    }
    val (zSkip, zTotal) = skippable(zdir)
    val (pSkip, pTotal) = skippable(rdir)
    assert(zTotal >= 8 && pTotal >= 8, s"want several files: $zTotal/$pTotal")
    assert(zSkip * 2 >= zTotal,
      s"z-order should make most files skippable: $zSkip of $zTotal")
    assert(zSkip > pSkip,
      s"z-order must beat the unclustered layout: $zSkip vs $pSkip")
    // layout must not change answers
    val expected = pts.filter(col("x") <= 100 && col("y") <= 100).count()
    assert(spark.read.parquet(zdir)
      .filter(col("x") <= 100 && col("y") <= 100).count() == expected)
  }

  test("compactFiles merges a micro-batch file mess to the target count, rows intact") {
    import spark.implicits._
    val dir = graft.GraftSession.scratchDir("compact_test")
    val rows = (1 to 2000).map(i => (i.toLong, s"payload_$i"))
    // simulate a streaming ingest: 50 tiny files
    rows.toDF("id", "v").repartition(50)
      .write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 50)
    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target: ~quarter of the data per file → ~4 output files
    val n = Layout.compactFiles(spark, dir, targetBytes = totalBytes / 4)
    assert(n >= 4 && n <= 6, s"got $n files")
    assert(parquetFiles == n)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
    // fixed point: compact all the way down to one file, then a
    // repeat call finds nothing to do and reports the same count
    assert(Layout.compactFiles(spark, dir, targetBytes = Long.MaxValue) == 1)
    assert(Layout.compactFiles(spark, dir, targetBytes = Long.MaxValue) == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet
      == rows.toSet)
  }

  test("bucketed tables join and aggregate with NO Exchange; answers unchanged") {
    import graft.Tables
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    Layout.writeBucketed(orders, "b_orders", 8, "o_orderkey",
      Seq("o_orderkey"))
    Layout.writeBucketed(li, "b_lineitem", 8, "l_orderkey",
      Seq("l_orderkey"))
    try {
      val bo = spark.table("b_orders")
      val bl = spark.table("b_lineitem")
      // force sort-merge so an Exchange would be visible if required
      val joined = bo.hint("merge")
        .join(bl, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(3000))
      // co-located layout changes the plan, never the answer
      val expected = orders
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")))
      assert(joined.exceptAll(expected).isEmpty
        && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
