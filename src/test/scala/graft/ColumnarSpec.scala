package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftColumnarProjectExec

/** The device-heterogeneity extension point, executed (SURVEY §1;
  * reference Config.device_type hdk.py:2101): under
  * spark.graft.columnar.enabled the injected ColumnarRule swaps
  * supported projections for GraftColumnarProjectExec, and the results
  * are bit-identical to the row path. Queries and operators are
  * untouched — which is the whole deferral argument.
  */
class ColumnarSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(graft.plans.Columnar.EnabledKey, on.toString)
    try body finally spark.conf.unset(graft.plans.Columnar.EnabledKey)
  }

  private def lineitemProj = Tables
    .load(spark, TestSpark.sf, "lineitem")
    .select((col("l_orderkey") * lit(3L) + col("l_partkey")).as("a"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
      col("l_suppkey").as("s"))

  test("flag on: supported projection runs on the columnar node") {
    withFlag(on = true) {
      val df = lineitemProj
      val found = df.queryExecution.executedPlan.collectFirst {
        case g: GraftColumnarProjectExec => g
      }
      assert(found.isDefined,
        s"no GraftColumnarProjectExec in:\n${df.queryExecution.executedPlan}")
      // the planner placed a ColumnarToRow above it for the collect
      assert(df.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"))
    }
  }

  test("flag off (default): the row path is untouched") {
    val df = lineitemProj
    assert(df.queryExecution.executedPlan.collectFirst {
      case g: GraftColumnarProjectExec => g
    }.isEmpty)
  }

  test("columnar and row paths agree bit-for-bit") {
    val rowPath = lineitemProj.collect().toSeq
    val colPath = withFlag(on = true) { lineitemProj.collect().toSeq }
    assert(colPath == rowPath)
  }

  test("nulls propagate through vectorized arithmetic") {
    import spark.implicits._
    val dir = GraftSession.scratchDir("columnar_nulls")
    Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null),
      (null, 20L), (4L, 40L))
      .toDF("x", "y").write.mode("overwrite").parquet(dir)
    // QueryExecution caches per-DataFrame — build a fresh frame under
    // each flag state so the rule actually sees both plans
    def q = spark.read.parquet(dir)
      .select((col("x") * lit(2L) + col("y")).as("z"))
    val rowPath = q.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    val (colPath, sawNode) = withFlag(on = true) {
      val df = q
      (df.collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet,
        df.queryExecution.executedPlan.collectFirst {
          case g: GraftColumnarProjectExec => g }.isDefined)
    }
    assert(sawNode, "columnar node not planned over the parquet scan")
    assert(colPath == rowPath)
    assert(colPath.contains(None) && colPath.contains(Some(12L)))
  }

  test("unsupported expressions refuse the columnar path") {
    withFlag(on = true) {
      val df = Tables.load(spark, TestSpark.sf, "lineitem")
        .select(upper(col("l_returnflag")).as("f"),
          (col("l_orderkey") + lit(1L)).as("k"))
      assert(df.queryExecution.executedPlan.collectFirst {
        case g: GraftColumnarProjectExec => g
      }.isEmpty, "a projection with a string function must stay row-based")
      df.collect() // and it still runs
    }
  }

  test("ANSI long overflow still fails the query on the columnar path") {
    import spark.implicits._
    val dir = GraftSession.scratchDir("columnar_ovf")
    Seq(Long.MaxValue, 1L).toDF("x").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select((col("x") + lit(1L)).as("y"))
    assume(spark.conf.get("spark.sql.ansi.enabled", "true").toBoolean)
    intercept[Exception] { q.collect() }
    withFlag(on = true) {
      val e = intercept[Exception] { q.collect() }
      assert(e != null)
    }
  }

  // ------------------------- r10: the vectorized FILTER (the selective
  // half of the scan-adjacent hot path — batches SHRINK through it)

  private def lineitemFiltered = Tables
    .load(spark, TestSpark.sf, "lineitem")
    .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
      col("l_discount"))
    .filter(col("l_quantity") * lit(2.0) > lit(60.0)
      && col("l_discount") <= lit(0.05))

  test("flag on: supported filter runs on the columnar node and shrinks batches") {
    withFlag(on = true) {
      val df = lineitemFiltered
      val found = df.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GraftColumnarFilterExec => g
      }
      assert(found.isDefined,
        s"no GraftColumnarFilterExec in:\n${df.queryExecution.executedPlan}")
      // selectivity is real: the node's output is a strict subset
      val n = df.count()
      val total = Tables.load(spark, TestSpark.sf, "lineitem").count()
      assert(n > 0 && n < total)
    }
  }

  test("columnar filter and row filter agree bit-for-bit") {
    val rowPath = lineitemFiltered.collect().toSeq
    val colPath = withFlag(on = true) { lineitemFiltered.collect().toSeq }
    assert(colPath.nonEmpty && colPath.toSet == rowPath.toSet
      && colPath.size == rowPath.size)
  }

  test("filter three-valued logic: NULL predicates drop rows, OR(null,true) keeps") {
    import spark.implicits._
    val dir = GraftSession.scratchDir("columnar_filter_nulls")
    Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null),
      (null, 20L), (4L, 40L), (5L, null))
      .toDF("x", "y").write.mode("overwrite").parquet(dir)
    // x > 3 OR y < 15: row (2,null) → OR(false, null) = null → dropped;
    // (5,null) → OR(true, null) = true → kept; (null,20) → OR(null,
    // false) = null → dropped; (1,10) kept; (4,40) → OR(true,false) kept
    def q = spark.read.parquet(dir)
      .filter(col("x") > lit(3L) || col("y") < lit(15L))
    val rowPath = q.collect().map(_.getLong(0)).toSet
    val (colPath, sawNode) = withFlag(on = true) {
      val df = q
      (df.collect().map(_.getLong(0)).toSet,
        df.queryExecution.executedPlan.collectFirst {
          case g: graft.plans.GraftColumnarFilterExec => g }.isDefined)
    }
    // the scan pushes IsNotNull only for non-null-tolerant predicates;
    // whatever residual FilterExec remains must have been swapped
    assert(sawNode, "columnar filter node not planned")
    assert(colPath == rowPath && colPath == Set(1L, 4L, 5L))
  }

  test("unsupported predicates refuse the columnar filter path") {
    withFlag(on = true) {
      val df = Tables.load(spark, TestSpark.sf, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"))
        .filter(col("l_returnflag") === lit("R")) // string compare
      assert(df.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GraftColumnarFilterExec => g
      }.isEmpty, "a string-comparison filter must stay row-based")
      df.collect() // and it still runs
    }
  }

  test("flag off (default): no columnar filter is planned") {
    val df = lineitemFiltered
    assert(df.queryExecution.executedPlan.collectFirst {
      case g: graft.plans.GraftColumnarFilterExec => g
    }.isEmpty)
  }

  // ------------------------- r11: the vectorized PARTIAL AGGREGATE
  // (the scan-adjacent trio's last member — map-side combine is where
  // columnar wins most)

  private def lineitemAgg = Tables
    .load(spark, TestSpark.sf, "lineitem")
    .groupBy(col("l_suppkey"))
    .agg(sum(col("l_extendedprice")).as("s_d"),
      sum(col("l_orderkey")).as("s_l"),
      count(col("l_quantity")).as("cnt"),
      min(col("l_discount")).as("mn"),
      max(col("l_partkey")).as("mx"))

  test("flag on: supported partial aggregate runs on the columnar node, " +
      "bit-equal to the row path incl. multi-batch double sums") {
    // multi-batch partitions are the FP-order case: the node must fold
    // double sums in row order across batches, not per-batch partials.
    // Aggregates shuffle, so AQE injects the columnar node at stage
    // creation — assert on the executed adaptive plan, post-collect.
    val rowPath = lineitemAgg.orderBy(col("l_suppkey")).collect().toSeq
    withFlag(on = true) {
      val df = lineitemAgg.orderBy(col("l_suppkey"))
      val got = df.collect().toSeq
      assert(df.queryExecution.executedPlan.toString
        .contains("GraftColumnarPartialAgg"),
        s"no GraftColumnarPartialAggExec in:\n${df.queryExecution.executedPlan}")
      assert(got == rowPath)
    }
    // flag off: untouched
    val off = lineitemAgg
    off.collect()
    assert(!off.queryExecution.executedPlan.toString
      .contains("GraftColumnarPartialAgg"))
  }

  test("partial aggregate: null groups and null values aggregate identically") {
    import spark.implicits._
    val dir = GraftSession.scratchDir("columnar_agg_nulls")
    Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, 10.5, 100L), (1L, null, 200L), (null, 3.25, null),
      (null, null, 50L), (2L, -0.0, null), (2L, 0.0, 7L))
      .toDF("g", "v", "w").write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("g"))
      .agg(sum(col("v")).as("sv"), count(col("v")).as("cv"),
        min(col("v")).as("mnv"), max(col("w")).as("mxw"),
        sum(col("w")).as("sw"), count(lit(1)).as("n"))
    val rowPath = q.collect().map(_.toString).sorted.toSeq
    val (colPath, sawNode) = withFlag(on = true) {
      val df = q
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString
        .contains("GraftColumnarPartialAgg"))
    }
    assert(sawNode, "columnar partial aggregate not planned")
    assert(colPath == rowPath)
    // the null group is a real group and all-null inputs give null
    // sums/mins with zero counts
    assert(rowPath.exists(_.startsWith("[null,")))
  }

  test("ANSI overflow in a vectorized long sum still fails the query") {
    import spark.implicits._
    assume(spark.conf.get("spark.sql.ansi.enabled", "true").toBoolean)
    val dir = GraftSession.scratchDir("columnar_agg_ovf")
    Seq((1L, Long.MaxValue), (1L, 1L)).toDF("g", "v")
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("g"))
      .agg(sum(col("v")).as("s"))
    intercept[Exception] { q.collect() } // row path fails
    // AQE off: the node is visible pre-execution, so the failure is
    // provably OURS
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withFlag(on = true) {
      val df = q
      assert(df.queryExecution.executedPlan.collectFirst {
        case g: graft.plans.GraftColumnarPartialAggExec => g }.isDefined)
      val e = intercept[Exception] { df.collect() }
      assert(e != null) // columnar path fails too (coarser message)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q01 shape: two string group keys + decimal sums, bit-equal to the row path") {
    val dir = GraftSession.scratchDir("columnar_agg_q01")
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(12,2)").as("qty"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_orderkey"))
      .write.mode("overwrite").parquet(dir)
    // the TPC-H q01 aggregate shape: 2 group keys, decimal sums, a
    // count, and a long sum riding along in the same partial
    def q = spark.read.parquet(dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty")).as("sum_qty"),
        sum(col("price")).as("sum_price"),
        count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("s_l"))
    val rowPath = q.collect().map(_.toString).sorted.toSeq
    val (colPath, sawNode) = withFlag(on = true) {
      val df = q
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString
        .contains("GraftColumnarPartialAgg"))
    }
    assert(sawNode, "q01-shaped partial aggregate not planned columnar")
    assert(colPath == rowPath)
    assert(rowPath.size > 1, "q01 shape should produce several groups")
  }

  test("decimal sums: null keys and all-null decimal groups keep the (sum, isEmpty) contract") {
    import spark.implicits._
    val dir = GraftSession.scratchDir("columnar_agg_decnull")
    Seq[(String, String, java.lang.Long)](
      ("A", "x", 100L), ("A", "x", null), ("A", null, 5L),
      (null, "x", null), (null, "x", null), ("B", "y", 7L))
      .toDF("g1", "g2", "raw")
      .withColumn("v", col("raw").cast("decimal(9,2)") / 4)
      .select(col("g1"), col("g2"),
        col("v").cast("decimal(10,3)").as("v"))
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir).groupBy(col("g1"), col("g2"))
      .agg(sum(col("v")).as("sv"), count(col("v")).as("cv"))
    val rowPath = q.collect().map(_.toString).sorted.toSeq
    val (colPath, sawNode) = withFlag(on = true) {
      val df = q
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString
        .contains("GraftColumnarPartialAgg"))
    }
    assert(sawNode, "decimal partial aggregate not planned columnar")
    assert(colPath == rowPath)
    // the (null, "x") group is real and all-null input gives NULL sum
    assert(rowPath.exists(_.startsWith("[null,x,null,0")))
  }

  test("unsupported aggregates refuse the columnar path") {
    withFlag(on = true) {
      // avg's partial carries (sum, count) buffers; distinct rewrites —
      // both must stay on the row path and still run
      val df = Tables.load(spark, TestSpark.sf, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(avg(col("l_quantity")).as("a"),
          countDistinct(col("l_partkey")).as("d"))
      df.collect()
      assert(!df.queryExecution.executedPlan.toString
        .contains("GraftColumnarPartialAgg"),
        "avg/distinct aggregates must stay row-based")
    }
  }
}
