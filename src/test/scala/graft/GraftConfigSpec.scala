package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference init(**kwargs) knob vocabulary → Spark conf mapping
  * (reference: _common.pyx:187 buildConfig, ConfigBuilder.cpp). */
class GraftConfigSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("semantics-bearing knobs set live Spark confs") {
    val before = spark.conf.get("spark.sql.ansi.enabled")
    try {
      val ms = GraftConfig(spark,
        "null-div-by-zero" -> true, // dash form accepted
        "streaming_top_n_max" -> 50000,
        "huge_join_hash_threshold" -> (32 * 1024 * 1024))
      assert(ms.collect { case a: GraftConfig.Applied => a.sparkConf }.toSet ==
        Set("spark.sql.ansi.enabled",
          "spark.sql.execution.topKSortFallbackThreshold",
          "spark.sql.autoBroadcastJoinThreshold"))
      // null_div_by_zero=true really changes division semantics
      assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
      assert(spark.sql("SELECT 1/0 AS x").head().isNullAt(0))
      assert(spark.conf.get(
        "spark.sql.execution.topKSortFallbackThreshold") == "50000")
    } finally spark.conf.set("spark.sql.ansi.enabled", before)
  }

  test("structural and ignored knobs classify without touching confs") {
    val ms = GraftConfig(spark,
      "cpu_only" -> true,
      "bigint_count" -> true,
      "enable_watchdog" -> false,
      "gpu_block_size" -> 1024)
    assert(ms.count(_.isInstanceOf[GraftConfig.Structural]) == 2)
    assert(ms.count(_.isInstanceOf[GraftConfig.Ignored]) == 2)
  }

  test("unknown knobs throw like the reference CLI parser") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(spark, "enable_warp_drive" -> true)
    }
    assert(e.getMessage.contains("unknown config knob"))
  }

  test("hllRsd maps precision bits to approx_count_distinct rsd") {
    // 11 bits (HDK default) → rsd ≈ 1.04/sqrt(2048) ≈ 0.0230
    assert(math.abs(GraftConfig.hllRsd(11) - 0.02298) < 1e-4)
  }
}
