package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.pipeline.TextAnalysis

/** Dev tool: time Linkage.matchEntities per blocking strategy on the
  * er_match query shape (dirty = 8%-dropout quarter of documents,
  * clean = full documents, τ=0.5). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.ErProbe auto prefix bands"
  */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val strategies = if (args.isEmpty) Seq("auto") else args.toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("erprobe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64 * 1024 * 1024).toString)
    val docs = Tables.load(spark, d, "documents")
    val dirty = TextAnalysis.withTokenDropout(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), dropBp = 800,
        epoch = 2)
      .select(col("doc_id").as("dirty_id"), col("aug_text").as("text"))
    val clean = docs.select(col("doc_id").as("clean_id"), col("text"))
    strategies.foreach { s =>
      (1 to 2).foreach { rep =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        val t0 = System.nanoTime()
        val n = graft.operators.Linkage
          .matchEntities(dirty, clean, threshold = 0.5, strategy = s)
          .count()
        println(f"[erprobe] $s rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
