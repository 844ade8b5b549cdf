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

  test("streaming KS: histogram state survives a kill + checkpoint restart, failsafe included") {
    val obs = graft.Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(7)).as("k"),
        col("event_id").as("t"), col("event_type").as("g"),
        col("value").as("v"))
      .na.drop()
    val rows = obs.as[(Long, Long, String, Double)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    implicit val sq = spark.sqlContext
    val ckpt = freshDir("recovery_ks_ckpt")
    val mem = MemoryStream[(Long, Long, String, Double)]
    val out = StreamKs
      .monitor(mem.toDF().toDF("k", "t", "g", "v"), "click", "view")
      .select(col("k"), col("n_a"), col("n_b"), col("d_stat"),
        col("c_stat"), col("reject_05"))
    val emissions = TrieMap.empty[Long, Seq[Row]]
    mem.addData(first.toSeq)
    drain(out, ckpt, "update", emissions) // run 1, then "crash"
    mem.addData(second.toSeq)
    drain(out, ckpt, "update", emissions) // restart from checkpoint
    // the post-restart emission must equal batch ksTest over ALL rows —
    // possible only if the (value → per-group counts) histogram was
    // recovered from the checkpoint, not recounted from zero
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
    val batch = rows.map(_._1).distinct.sorted.map { k =>
      val df = rows.toIndexedSeq.filter(_._1 == k).toDF("k", "t", "g", "v")
      k -> graft.operators.Stats
        .ksTest(df, "g", "click", "view", "v")
        .select(col("n_a"), col("n_b"), col("d_stat"), col("c_stat"),
          col("reject_05"))
        .as[(Long, Long, Option[Double], Option[Double], Option[Boolean])]
        .head()
    }.toMap
    assert(fin == batch,
      s"post-restart KS diverged from the batch twin: ${fin.take(2)}")
    assert(fin.valuesIterator.exists(_._3.isDefined),
      "at least one key carries a real D statistic after recovery")
    // the maxDistinct failsafe must count the RESTORED vocabulary: two
    // distinct values land before the kill, two more after the restart
    // — a restore that lost the histogram would see only 2 and stay
    // silent; the recovered one sees 4 > 3 and fails loudly
    val ckptF = freshDir("recovery_ks_failsafe_ckpt")
    val memF = MemoryStream[(Long, Long, String, Double)]
    val outF = StreamKs
      .monitor(memF.toDF().toDF("k", "t", "g", "v"), "click", "view",
        maxDistinct = 3).toDF()
    val sinkF = TrieMap.empty[Long, Seq[Row]]
    memF.addData(Seq((1L, 1L, "click", 1.0), (1L, 2L, "view", 2.0)))
    drain(outF, ckptF, "update", sinkF) // within bound, then "crash"
    memF.addData(Seq((1L, 3L, "click", 3.0), (1L, 4L, "view", 4.0)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(outF, ckptF, "update", sinkF)
    }
    assert(e.getMessage.contains("maxDistinct") ||
      Option(e.getCause).exists(_.getMessage.contains("maxDistinct")),
      s"failsafe must fire on the restored vocabulary: ${e.getMessage}")
  }

  test("streaming KLL: compactor stack + parity counter survive a kill + checkpoint restart") {
    val kllK = 64
    val nShards = 4
    val vals = graft.Tables.load(spark, TestSpark.sf, "events")
      .select(col("value").cast("double")).as[Double].collect()
    val (first, second) = vals.splitAt(vals.length / 2)
    implicit val sq = spark.sqlContext
    def latest(rows: Iterable[Row]): Map[Int, (Long, Seq[Double])] =
      rows.map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
        .groupBy(_._1)
        .map { case (s, es) =>
          val b = es.maxBy(_._2)
          s -> ((b._2, b._3))
        }
    // interrupted run: batch 1, kill, restart from checkpoint, batch 2
    val ckpt = freshDir("recovery_kll_ckpt")
    val mem = MemoryStream[Double]
    val out = StreamQuantiles
      .kllShards(mem.toDF().select(col("value")), k = kllK,
        nShards = nShards).toDF()
    val emissions = TrieMap.empty[Long, Seq[Row]]
    mem.addData(first.toSeq)
    drain(out, ckpt, "update", emissions) // run 1, then "crash"
    mem.addData(second.toSeq)
    drain(out, ckpt, "update", emissions) // restart from checkpoint
    val recovered = latest(emissions.values.flatten)
    // uninterrupted twin: SAME batch boundaries, no kill — the final
    // summaries must match BIT-FOR-BIT, which holds only if the level
    // stacks AND the derandomized parity counter round-tripped through
    // the checkpoint (a lost parity picks different survivors)
    val mem2 = MemoryStream[Double]
    val out2 = StreamQuantiles
      .kllShards(mem2.toDF().select(col("value")), k = kllK,
        nShards = nShards).toDF()
    val q2 = out2.writeStream.format("memory").queryName("kll_recovery_u")
      .outputMode("update").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
    } finally q2.stop()
    val uninterrupted = latest(spark.table("kll_recovery_u").collect().toSeq)
    assert(recovered.keySet == uninterrupted.keySet)
    assert(recovered == uninterrupted,
      "kill+restart summaries must equal the uninterrupted run's, bitwise")
    // and the recovered union still conserves mass over the whole stream
    recovered.foreach { case (s, (seen, sum)) =>
      val mass = sum.grouped(2).map(_(1)).sum
      assert(mass == seen.toDouble, s"shard $s mass $mass != n_seen $seen")
    }
    assert(recovered.values.map(_._1).sum == vals.length.toLong)
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
