package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    // skew stand-in: join on the 3-value returnflag key
    val dim = li.select(col("l_returnflag").as("rf")).distinct()
      .withColumn("flag_tag", concat(lit("tag_"), col("rf")))
    val plain = li.join(dim, li("l_returnflag") === dim("rf"))
      .groupBy("l_returnflag", "flag_tag").count()
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_returnflag", "rf"), dim,
      keys = Seq("rf"), salt = 8, saltBy = col("l_orderkey"))
      .groupBy(col("rf").as("l_returnflag"), col("flag_tag")).count()
      .orderBy("l_returnflag").collect()
    assert(plain.map(_.toString).toSeq == salted.map(_.toString).toSeq)
  }

  test("salt column does not leak into the output schema") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem").limit(10)
    val dim = li.select(col("l_returnflag").as("rf")).distinct()
    val out = Skew.saltedJoin(
      li.withColumnRenamed("l_returnflag", "rf"), dim,
      keys = Seq("rf"), salt = 4, saltBy = col("l_orderkey"))
    assert(!out.columns.contains("__salt"))
  }

  test("keyProfile: planted hot key, exact stats, threshold dial") {
    import spark.implicits._
    val rows = (Seq.fill(8)("hot") ++ Seq("a", "b")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    // n_total=10, n_keys=3, mx=8 → avg 3.333333, skew 2.4
    val got = Skew.keyProfile(rows, Seq("k"), topK = 2,
        saltThreshold = 2.0)
      .select("k", "rank", "n_rows", "share", "n_total", "n_keys",
        "avg_rows", "skew_factor", "salt_recommended")
      .as[(String, Long, Long, Double, Long, Long, Double, Double, Boolean)]
      .collect().sortBy(_._2)
    assert(got.length == 2) // topK caps the report
    assert(got(0) == (("hot", 1L, 8L, 0.8, 10L, 3L, 3.333333, 2.4, true)))
    assert(got(1)._1 == "a" && got(1)._2 == 2L && got(1)._3 == 1L)
    // same distribution under a laxer threshold: no salt recommended
    val lax = Skew.keyProfile(rows, Seq("k"), topK = 1,
        saltThreshold = 4.0)
      .select("salt_recommended").as[Boolean].head()
    assert(!lax)
  }
}

/** Bucketing: pre-shuffled storage layout → co-located joins with no
  * Exchange. The 100 TB analogue of HDK's fragment-aligned hash joins.
  */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join should not shuffle:\n" + plan)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
