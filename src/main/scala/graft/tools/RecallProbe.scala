package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Dev tool: print per-method ANN recall at one or more SF dirs, to pick
  * the `ann_recall` thresholds with margin. Not part of the contract.
  *
  *   sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.001 ..."
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("recall-probe")
    args.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      Similarity.recallVsExact(emb, emb.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("method"))
        .collect()
        .foreach(r => println(f"[recall] $d ${r.getString(0)}%-4s n=${r.getLong(1)} recall=${r.getDouble(2)}%.3f"))
    }
    spark.stop()
  }
}
