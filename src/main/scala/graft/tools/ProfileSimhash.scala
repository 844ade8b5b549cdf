package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the SimHash pipeline (dev tool). */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    docs.count(); Dedup.simhashPairs(docs).count() // warmup
    time("shingles") { Dedup.shingleTable(docs).count() }
    time("simhash p2") { Dedup.simhashed(docs).count() }
    time("simhash p2b") { Dedup.simhashed(docs).count() }
    time("simhash p4") { Dedup.simhashed(docs, packPer = 4).count() }
    time("simhash p4b") { Dedup.simhashed(docs, packPer = 4).count() }
    time("candidates") { Dedup.simhashCandidates(docs).count() }
    time("pairs") { Dedup.simhashPairs(docs).count() }
    time("pairs b") { Dedup.simhashPairs(docs).count() }
    spark.stop()
  }
}
