package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one SparkSession). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"
}

/** Every SparkEntry query runs and returns a sane result at sf0.001. */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // Queries whose correct result can legitimately be empty at tiny SF.
  // (dedup_minhash/dedup_simhash/ann_lsh became 1-row r13 gate queries)
  private val mayBeEmpty = Set("q08_anti_join", "dedup_ngram",
    "dedup_cosine")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
