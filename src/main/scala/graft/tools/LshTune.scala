package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dev tool: sweep (nTables, nBits) for lshTopK and print measured
  * recall vs the exact top-k plus steady-state wall time per config, to
  * pick the cheapest setting with ≥0.4 recall margin over the 0.3
  * `ann_recall` gate. Not part of the contract.
  *
  *   sbt "runMain graft.tools.LshTune /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("lsh-tune", 32)
    val configs = Seq((4, 8), (6, 8), (8, 10), (8, 8))
    args.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val k = 10
      val exact = Similarity.bruteForceTopK(emb, queries, k)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      val nExact = exact.count()
      require(nExact > 0, s"empty exact top-k in $d — recall undefined")
      configs.foreach { case (nTables, nBits) =>
        def run(): (Double, Double) = {
          val t0 = System.nanoTime()
          val approx = Similarity.lshTopK(emb, queries, k,
            nBits = nBits, nTables = nTables)
            .select(col("query_id"), col("neighbor_id"))
          val hits = exact.join(approx, Seq("query_id", "neighbor_id")).count()
          ((System.nanoTime() - t0) / 1e9, hits.toDouble / nExact)
        }
        run() // warmup
        val (t1, r) = run()
        val (t2, _) = run()
        println(f"[lsh] $d tables=$nTables bits=$nBits recall=$r%.3f time=${math.min(t1, t2)}%.2f s")
      }
    }
    spark.stop()
  }
}
