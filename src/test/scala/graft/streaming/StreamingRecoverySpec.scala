package graft.streaming

import scala.collection.concurrent.TrieMap

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Crash-recovery half of the streaming bounded-state contract (r12
  * verdict ask #3): StreamingSpec proves two-microbatch replay
  * equivalence in one uninterrupted run; this suite KILLS a stateful
  * query mid-stream and restarts it from its checkpointLocation,
  * proving the combined emission stream is identical to an
  * uninterrupted run — i.e. the state store actually round-trips
  * through the checkpoint, duplicates arriving after the restart are
  * still recognized, and no emission is lost or doubled.
  *
  * MemoryStream keeps every added batch in the JVM, so the restarted
  * query re-reads from the committed offsets — the same mechanics a
  * Kafka source gives in production. The sink is foreachBatch into a
  * batchId-keyed map (the memory sink refuses checkpoint recovery by
  * design): keying by batchId is exactly the idempotent-sink contract
  * Spark documents for exactly-once foreachBatch pipelines, so a
  * replayed batch overwrites itself instead of double-counting. */
class StreamingRecoverySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val root = graft.GraftSession.scratchDir(name)
    val f = new java.io.File(root)
    if (f.exists()) {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(f)
    }
    root
  }

  /** Run `out` to completion against `ckpt`, appending each micro-batch
    * into the batchId-keyed emission map (idempotent on replay). */
  private def drain(out: DataFrame, ckpt: String, mode: String,
      sink: TrieMap[Long, Seq[Row]]): Unit = {
    val q = out.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        sink.put(id, df.collect().toSeq)
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("streaming dedup: state survives a kill + checkpoint restart") {
    implicit val sq = spark.sqlContext
    val ckpt = freshDir("recovery_dedup_ckpt")
    val mem = MemoryStream[(Long, Long)] // (event_id, ts_s)
    val out = EventPipeline.dedupedStream(
      mem.toDF().select(col("_1").as("event_id"),
        timestamp_seconds(col("_2")).as("ts")), Seq("event_id"))
    val firstBatch = Seq((1L, 1000L), (2L, 2000L), (1L, 1000L))
    // replays of ALREADY-EMITTED ids arrive only after the kill: a
    // restart that lost the dedup state would re-emit 1 and 2
    val secondBatch = Seq((2L, 2000L), (3L, 3000L), (1L, 1000L), (4L, 4000L))
    val emissions = TrieMap.empty[Long, Seq[Row]]
    mem.addData(firstBatch)
    drain(out, ckpt, "append", emissions) // run 1, then "crash"
    val afterRun1 = emissions.values.flatten.map(_.getLong(0)).toSeq
    mem.addData(secondBatch)
    drain(out, ckpt, "append", emissions) // restart from checkpoint
    val got = emissions.values.flatten.map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 2L, 3L, 4L),
      s"recovered emissions wrong: run1=$afterRun1 all=$got")
    // uninterrupted twin over the identical delivery order
    val mem2 = MemoryStream[(Long, Long)]
    val out2 = EventPipeline.dedupedStream(
      mem2.toDF().select(col("_1").as("event_id"),
        timestamp_seconds(col("_2")).as("ts")), Seq("event_id"))
    val ckptU = freshDir("recovery_dedup_ckpt_u")
    val uninterrupted = TrieMap.empty[Long, Seq[Row]]
    mem2.addData(firstBatch)
    mem2.addData(secondBatch)
    drain(out2, ckptU, "append", uninterrupted)
    val unint = uninterrupted.values.flatten.map(_.getLong(0)).toSeq.sorted
    assert(got == unint,
      "kill+restart must emit exactly what an uninterrupted run emits")
  }

  test("streaming MWU: per-key rank state survives a kill + checkpoint restart") {
    val obs = graft.Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(7)).as("k"),
        col("event_id").as("t"), col("event_type").as("g"),
        col("value").as("v"))
      .na.drop()
    val rows = obs.as[(Long, Long, String, Double)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    implicit val sq = spark.sqlContext
    val ckpt = freshDir("recovery_mwu_ckpt")
    val mem = MemoryStream[(Long, Long, String, Double)]
    val out = StreamMwu
      .monitor(mem.toDF().toDF("k", "t", "g", "v"), "click", "view")
      .select(col("k"), col("n_a"), col("n_b"), col("u_stat"),
        col("z_stat"), col("reject_05"))
    val emissions = TrieMap.empty[Long, Seq[Row]]
    mem.addData(first.toSeq)
    drain(out, ckpt, "update", emissions) // run 1, then "crash"
    mem.addData(second.toSeq)
    drain(out, ckpt, "update", emissions) // restart from checkpoint
    // the post-restart update must equal the batch statistic over ALL
    // observations — possible only if the prefix's per-key rank state
    // was recovered from the checkpoint, not recounted from zero
    val fin = emissions.toSeq.sortBy(_._1).flatMap(_._2)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Boolean])))
      .groupBy(_._1)
      .map { case (k, es) =>
        val best = es.maxBy(e => e._2 + e._3)
        k -> ((best._2, best._3, best._4, best._5, best._6))
      }
    val batch = graft.operators.Stats
      .mannWhitneyByKey(rows.toIndexedSeq.toDF("k", "t", "g", "v"),
        "k", "g", "click", "view", "v")
      .select(col("k"), col("n_a"), col("n_b"), col("u_stat"),
        col("z_stat"), col("reject_05"))
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(fin == batch,
      s"post-restart MWU diverged from the batch twin: ${fin.take(2)}")
    assert(fin.valuesIterator.exists(_._4.isDefined),
      "at least one key carries a real statistic after recovery")
  }
}
