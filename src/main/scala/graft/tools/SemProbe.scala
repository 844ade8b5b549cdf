package graft.tools

import graft.{GraftSession, Tables}
import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dev tool: semDedupPairs precision/recall vs the all-pairs cosine
  * baseline per SF dir, to set the semdedup gate threshold with margin.
  *
  *   sbt "runMain graft.tools.SemProbe /root/testdata/sf0.01 ..."
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("sem-probe")
    args.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      Seq(8, 16, 32).foreach { nCells =>
        val sem = Similarity.semDedupPairs(emb, threshold = 0.44,
          nCells = nCells)
        val exact = Dedup.cosinePairs(emb, threshold = 0.44)
        val stats = exact.withColumn("ex", lit(1L))
          .join(sem.withColumn("se", lit(1L)),
            Seq("a_id", "b_id", "cos_sim"), "full_outer")
          .agg(
            coalesce(sum(col("ex")), lit(0L)).as("n_exact"),
            coalesce(sum(when(col("ex").isNotNull && col("se").isNotNull,
              lit(1L)).otherwise(lit(0L))), lit(0L)).as("n_found"),
            coalesce(sum(when(col("ex").isNull, lit(1L)).otherwise(lit(0L))),
              lit(0L)).as("n_extra"))
          .head()
        println(s"[sem] $d nCells=$nCells exact=${stats.getLong(0)} " +
          s"found=${stats.getLong(1)} extra=${stats.getLong(2)}")
      }
    }
    spark.stop()
  }
}
