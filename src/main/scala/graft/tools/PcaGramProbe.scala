package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{GraftSession, Tables}
import graft.pipeline.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev tool (r13 verdict ask #2 closure): measure the one-pass Gram's
  * wall time AND shuffle-write volume across corpus scale tiers. The
  * claim under test: with the d²-state GramAgg the shuffle carries
  * partitions · d(d+1)/2 cells — CONSTANT in N — where the old
  * cent⨝cent plan shuffled N·d exploded element rows. Shuffle-write
  * bytes are summed from stage metrics via a listener.
  *
  *   sbt "runMain graft.tools.PcaGramProbe /root/testdata/sf0.1 \
  *     target/sfgen5 target/sfgen25"
  */
object PcaGramProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("gram-probe")
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics
          .shuffleWriteMetrics.bytesWritten)
    })
    args.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val n = emb.count()
      // μ pass (outside the measured window — same at both plans)
      val muRows = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("i"),
          round(col("x").cast("double"), 6).cast("decimal(18,6)").as("x6"))
        .groupBy("i")
        .agg(sum(col("x6")).cast("decimal(38,6)").as("sx"),
          count(lit(1)).as("n"))
        .select(col("i"),
          round(col("sx").cast("double") / col("n").cast("double"), 6)
            .as("mu"))
        .collect()
      val dDim = muRows.length
      val muMicro = new Array[Long](dDim)
      muRows.foreach(r =>
        muMicro(r.getInt(0)) = math.round(r.getDouble(1) * 1e6))
      (1 to 3).foreach { rep =>
        System.gc()
        Thread.sleep(300) // let the async listener bus drain
        shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        Similarity.gramFrame(emb, "embedding", dDim, lit(muMicro)).head()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[gram] $d n=$n d=$dDim rep$rep $secs%6.2f s " +
          f"shuffleWrite=${shuffleWrite.get()}%,d B")
      }
    }
    spark.stop()
  }
}
