package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class TopKAggSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("topk returns k largest, descending") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g").agg(topk(col("v"), 5).as("t"))
      .select("t").as[Seq[Double]].head()
    assert(got == Seq(100.0, 99.0, 98.0, 97.0, 96.0))
  }

  test("bottomk returns k smallest, ascending") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g").agg(bottomk(col("v"), 3).as("t"))
      .select("t").as[Seq[Double]].head()
    assert(got == Seq(1.0, 2.0, 3.0))
  }

  test("partial aggregation across partitions merges correctly") {
    val df = (1 to 1000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
      .repartition(8)
    val got = df.groupBy("g").agg(topk(col("v"), 2).as("t"))
      .orderBy("g").select("t").as[Seq[Double]].collect()
    // group g holds values { v : v % 7 == g }, max two are the answers
    val expect = (0 until 7).map { g =>
      (1 to 1000).filter(_ % 7 == g).sortBy(-_).take(2).map(_.toDouble)
    }
    assert(got.toSeq.map(_.toList) == expect.map(_.toList))
  }

  test("fewer rows than k yields all rows") {
    val df = Seq(("g", 5.0), ("g", 1.0)).toDF("g", "v")
    val got = df.groupBy("g").agg(topk(col("v"), 10).as("t"))
      .select("t").as[Seq[Double]].head()
    assert(got == Seq(5.0, 1.0))
  }

  test("nulls are skipped") {
    val df = Seq(("g", Some(2.0)), ("g", None), ("g", Some(9.0)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(topk(col("v"), 5).as("t"))
      .select("t").as[Seq[Double]].head()
    assert(got == Seq(9.0, 2.0))
  }
}
