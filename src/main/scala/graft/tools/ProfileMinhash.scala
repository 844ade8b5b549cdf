package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for minhashPairs (dev tool, not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("profile", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // warmup JVM
    docs.count(); Dedup.minhashPairs(docs).count()
    time("explode+hash") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("h")).count()
    }
    time("signatures") { Dedup.minhashSignatures(docs).count() }
    time("full pairs") { Dedup.minhashPairs(docs).count() }
    spark.stop()
  }
}
