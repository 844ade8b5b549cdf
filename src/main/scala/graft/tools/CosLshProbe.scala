package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.{Dedup, Similarity}

/** Dev tool: measure cosinePairsLsh recall vs the all-pairs baseline at
  * the dedup_cosine threshold across SFs and table counts, to pick the
  * driver-gate threshold with margin. Not part of the contract.
  *
  *   sbt "runMain graft.tools.CosLshProbe /root/testdata/sf0.001 ..."
  */
object CosLshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("coslsh-probe", 32)
    val thr = 0.44
    args.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val exact = Dedup.cosinePairs(emb, thr).localCheckpoint()
      val nExact = exact.count()
      require(nExact > 0,
        s"no exact pairs at threshold $thr in $d — recall undefined, " +
          "lower the threshold before sweeping")
      Seq(8, 16, 24).foreach { nTables =>
        def run(): (Double, Long) = {
          val t0 = System.nanoTime()
          val lsh = Similarity.cosinePairsLsh(emb, thr, nTables = nTables)
          val hits = exact.join(lsh, Seq("a_id", "b_id", "cos_sim")).count()
          ((System.nanoTime() - t0) / 1e9, hits)
        }
        run() // warmup
        val (t1, hits) = run()
        val (t2, _) = run()
        println(f"[coslsh] $d tables=$nTables exact=$nExact recall=${hits.toDouble / nExact}%.3f time=${math.min(t1, t2)}%.2f s")
        // no blanket unpersist here: it would drop `exact`'s checkpoint
        // blocks too, and a localCheckpoint cannot be recomputed
      }
    }
    spark.stop()
  }
}
