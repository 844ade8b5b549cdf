package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg") {
    val batchEvents = Tables.load(spark, TestSpark.sf, "events")
    val expected = EventPipeline.hourlyAgg(batchEvents)
      .orderBy("hour", "event_type").collect()

    // replay the same rows through a MemoryStream
    implicit val sq = spark.sqlContext
    val rows = batchEvents
      .select(col("ts").cast("long").as("ts_s"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows.toSeq)
    val streamDf = mem.toDF()
      .select(timestamp_seconds(col("_1")).as("ts"), col("_2").as("event_type"), col("_3").as("value"))
    val q = EventPipeline.hourlyAgg(streamDf).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_out").orderBy("hour", "event_type").collect()
    assert(got.length == expected.length)
    // ts was truncated to seconds for the replay, so compare counts per bucket
    val gotN = got.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    val expN = expected.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotN == expN)
  }

  test("file-source streaming: append mode emits only watermark-finalized windows") {
    // FileStreamSource requires a directory — stage the parquet file
    val dir = java.nio.file.Paths.get(graft.GraftSession.scratchDir("events_stream"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${graft.TestSpark.sf}/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // infer the staged file's actual schema (the ts encoding has
    // changed across data vintages) and normalize like Tables.load
    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.Tables.normalizeTimestamps(
      spark.readStream.schema(schema).parquet(dir.toString),
      nanosAsLongCols = Set("ts"))
    val q = EventPipeline.hourlyAgg(stream).writeStream
      .format("memory").queryName("hourly_append").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val appended = spark.table("hourly_append")
      .select("hour", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventPipeline.hourlyAgg(
      graft.Tables.load(spark, graft.TestSpark.sf, "events"))
      .select("hour", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(appended.nonEmpty, "append mode emitted nothing")
    assert(appended.subsetOf(batch),
      "appended windows must agree with the batch computation")
    // only the tail windows still inside the 2h watermark may be held back
    val held = batch -- appended
    val maxHour = batch.map(_._1.getTime).max
    assert(held.forall(_._1.getTime >= maxHour - 3 * 3600 * 1000),
      s"non-tail windows were held back: $held")
  }

  test("streaming dedup drops replayed duplicates within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (event_id, ts_s)
    // every event delivered twice (at-least-once replay)
    mem.addData(Seq((1L, 1000L), (2L, 2000L), (1L, 1000L), (3L, 9000L), (2L, 2000L)))
    val streamDf = mem.toDF()
      .select(col("_1").as("event_id"), timestamp_seconds(col("_2")).as("ts"))
    val q = EventPipeline.dedupedStream(streamDf, Seq("event_id")).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long, Double)] // (user_id, ts_s, value)
    mem.addData(Seq((1L, 1000L, 5.0), (2L, 2000L, 7.0), (9L, 3000L, 1.0)))
    val streamDf = mem.toDF()
      .select(col("_1").as("user_id"), timestamp_seconds(col("_2")).as("ts"),
        col("_3").as("value"))
    val q = EventPipeline.enriched(streamDf, dim, "user_id").writeStream
      .format("memory").queryName("enriched_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enriched_out").select("user_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 9L -> None))
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)] // (event_id, user_id, ts_s)
    val purchases = MemoryStream[(Long, Long, Long, Double)]
    clicks.addData(Seq((10L, 1L, 1000L), (11L, 1L, 50_000L), (12L, 2L, 1000L)))
    purchases.addData(Seq(
      (20L, 1L, 2000L, 9.5),  // 1000s after click 10 → attributed
      (21L, 1L, 49_000L, 3.0), // before click 11, > 1h after click 10 → none
      (22L, 2L, 1500L, 7.0))) // attributed to click 12
    def evDf(df: org.apache.spark.sql.DataFrame) = df
    val cDf = clicks.toDF().select(col("_1").as("event_id"),
      col("_2").as("user_id"), timestamp_seconds(col("_3")).as("ts"))
    val pDf = purchases.toDF().select(col("_1").as("event_id"),
      col("_2").as("user_id"), timestamp_seconds(col("_3")).as("ts"),
      col("_4").as("value"))
    val q = EventPipeline.purchaseAttribution(cDf, pDf).writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attr_out")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (12L, 22L)))

    // batch twin gives the same pairs
    val batch = EventPipeline.purchaseAttribution(
      cDf.sparkSession.createDataFrame(
        Seq((10L, 1L, new java.sql.Timestamp(1000_000L)),
          (11L, 1L, new java.sql.Timestamp(50_000_000L)),
          (12L, 2L, new java.sql.Timestamp(1000_000L))))
        .toDF("event_id", "user_id", "ts"),
      cDf.sparkSession.createDataFrame(
        Seq((20L, 1L, new java.sql.Timestamp(2000_000L), 9.5),
          (21L, 1L, new java.sql.Timestamp(49_000_000L), 3.0),
          (22L, 2L, new java.sql.Timestamp(1500_000L), 7.0)))
        .toDF("event_id", "user_id", "ts", "value"))
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(batch == got)
  }

  test("left-outer stream-stream join emits unconverted clicks after watermark") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)] // (event_id, user_id, ts_s)
    val purchases = MemoryStream[(Long, Long, Long, Double)]
    val cDf = clicks.toDF().select(col("_1").as("event_id"),
      col("_2").as("user_id"), timestamp_seconds(col("_3")).as("ts"))
    val pDf = purchases.toDF().select(col("_1").as("event_id"),
      col("_2").as("user_id"), timestamp_seconds(col("_3")).as("ts"),
      col("_4").as("value"))
    val q = EventPipeline.purchaseAttributionOuter(cDf, pDf).writeStream
      .format("memory").queryName("attr_outer_out").outputMode("append").start()
    try {
      // click 10 converts; click 12 never does
      clicks.addData(Seq((10L, 1L, 1000L), (12L, 2L, 1000L)))
      purchases.addData(Seq((20L, 1L, 2000L, 9.5)))
      q.processAllAvailable()
      // far-future traffic pushes the watermark past click 12's window
      // (1000s + 1h window + 2h delay); the null-extended row may only
      // surface in the batch AFTER the watermark advances, hence the
      // second nudge
      clicks.addData(Seq((98L, 3L, 40_000_000L)))
      purchases.addData(Seq((99L, 3L, 40_000_000L, 1.0)))
      q.processAllAvailable()
      clicks.addData(Seq((97L, 3L, 40_000_500L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_outer_out")
      .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
    assert(got.contains((10L, Some(20L))), s"converted click missing: $got")
    assert(got.contains((12L, None)), s"unconverted click not emitted: $got")

    // batch twin: the same code path left-outer joins without watermarks
    val batch = EventPipeline.purchaseAttributionOuter(
      spark.createDataFrame(
        Seq((10L, 1L, new java.sql.Timestamp(1000_000L)),
          (12L, 2L, new java.sql.Timestamp(1000_000L))))
        .toDF("event_id", "user_id", "ts"),
      spark.createDataFrame(
        Seq((20L, 1L, new java.sql.Timestamp(2000_000L), 9.5)))
        .toDF("event_id", "user_id", "ts", "value"))
      .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toSet
    assert(batch == Set((10L, Some(20L)), (12L, None)))
  }

  test("native session_window sessionizes a stream (append after watermark)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)] // (user_id, ts_s, value)
    val streamDf = mem.toDF()
      .select(col("_1").as("user_id"), timestamp_seconds(col("_2")).as("ts"),
        col("_3").as("value"))
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val q = streamDf.writeStream
      .format("memory").queryName("sess_win_out").outputMode("append").start()
    try {
      mem.addData(Seq((1L, 1000L, 2.0), (1L, 1600L, 3.0), (2L, 1000L, 7.0)))
      q.processAllAvailable()
      // a far-future event pushes the watermark past the open sessions
      mem.addData(Seq((9L, 100000L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_win_out")
      .select("user_id", "n", "total").as[(Long, Long, Double)]
      .collect().toSet
    // user 1's two events fall in ONE session (gap 600s < 30min)
    assert(got.contains((1L, 2L, 5.0)) && got.contains((2L, 1L, 7.0)))
  }

  test("streaming near-dup: batch twin equals minhashPairs pair set") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val expected = graft.pipeline.Dedup.minhashPairs(docs, threshold = 0.5)
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    val got = StreamDedup.nearDupHits(docs, threshold = 0.5,
        maxPerBucket = 10000)
      .collect().map(h => (h.a_id, h.b_id)).toSet
    assert(got == expected,
      s"stream-plan pairs diverge: extra=${got -- expected} missing=${expected -- got}")
  }

  test("streaming near-dup: detects a pair arriving in different microbatches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    // no idle timeout here: registering a processing-time timeout makes
    // the engine re-run (empty) micro-batches continuously to check
    // deadlines, and MemoryStream's processAllAvailable never settles
    val q = StreamDedup.nearDupHits(streamDf, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and then"
    try {
      mem.addData(Seq((1L, a), (5L, "completely different words about spark shuffles here")))
      q.processAllAvailable()
      mem.addData(Seq((2L, b)))   // near-dup of doc 1, later batch
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("neardup_out")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 2L)), s"got $hits")
  }

  test("sessionize splits on gap and aggregates state (batch mode)") {
    val evs = Seq(
      EventPipeline.Ev(1L, 0L, 1.0),
      EventPipeline.Ev(1L, 60_000L, 2.0),
      EventPipeline.Ev(1L, 10_000_000L, 3.0), // > 30 min gap → new session
      EventPipeline.Ev(2L, 0L, 5.0)
    ).toDS()
    val sessions = EventPipeline.sessionize(evs, gapMs = 30 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.start_ms))
    // batch flatMapGroupsWithState emits only completed (pre-gap) sessions
    assert(sessions.exists(s => s.user_id == 1L && s.n_events == 2 && s.total_value == 3.0))
  }

  test("streaming heavy hitters: candidates + exact verify equal true HH set across microbatches") {
    // the real corpus tokens, split into two microbatches mid-stream:
    // state must carry each shard's MG counters across the batch cut
    val hhK = 50
    val toks = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(graft.pipeline.TextAnalysis.tokens(col("text")))
        .as("token"))
      .filter(col("token") =!= "")
      .as[String].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamHeavyHitters
      .mgCandidates(mem.toDF().select(col("value").as("token")),
        k = hhK, nShards = 8)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      val (first, second) = toks.splitAt(toks.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    // keep each shard's LAST emission (highest n_seen) — the current
    // candidate set — then union across shards
    val cands = spark.table("hh_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("n_seen").desc)))
      .filter(col("rn") === 1)
      .select(explode(col("candidates")).as("token"))
      .as[String].collect().toSet
    // true heavy hitters (freq*k > n) computed directly
    val n = toks.length.toLong
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.filter { case (_, c) => c * hhK > n }.keySet
    assert(trueHH.subsetOf(cands),
      s"MG guarantee violated: missing ${trueHH -- cands}")
    // exact verify over candidates reproduces exactly the true HH set
    val verified = cands.filter(t => exact.getOrElse(t, 0L) * hhK > n)
    assert(verified == trueHH)
  }

  test("streaming funnel: final levels equal the batch funnel on real events") {
    // one ms-truncated replay feeds BOTH engines so the strict-`>` time
    // comparisons see identical instants
    val rows = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), unix_millis(col("ts")), col("event_type"))
      .as[(Long, Long, String)].collect()
    val ev = rows.toSeq.toDF("user_id", "ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_type"))
    val expected = graft.operators.Funnel
      .funnel(ev, Seq("view", "click", "purchase"), "7 days")
      .select("user_id", "level").as[(Long, Int)].collect().toMap

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF()
      .select(col("_1").as("user_id"), col("_2").as("ts_ms"),
        col("_3").as("event_type"))
      .as[EventPipeline.FunnelEv]
    val q = EventPipeline
      .funnelProgress(stream, Seq("view", "click", "purchase"),
        windowMs = 7L * 24 * 3600 * 1000)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // two microbatches split by time: state must carry the frontier
      val cut = rows.map(_._2).sorted.apply(rows.length / 2)
      mem.addData(rows.filter(_._2 <= cut).toSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._2 > cut).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_out")
      .groupBy("user_id").agg(max("level").as("level"))
      .as[(Long, Int)].collect().toMap
    assert(got == expected,
      s"diverging users: ${((got.toSet diff expected.toSet) ++
        (expected.toSet diff got.toSet)).take(5)}")
  }

  test("streaming anomaly z-scores EQUAL the batch rollingZScore bitwise") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("double").as("value"))
    val batch = graft.operators.TimeJoins
      .rollingZScore(ev, "user_id", "us", "value", "event_id")
      .select(col("event_id"), col("roll_n"), col("z"), col("flagged"))
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // replay ordered per event time so cross-batch arrival matches the
    // operator's in-order contract; cut mid-stream
    val rows = ev.orderBy(col("us"), col("event_id"))
      .as[(Long, Long, Long, Double)].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamAnomaly.zScores(
        mem.toDF().toDF("event_id", "user_id", "us", "value"))
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("update").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom_out")
      .select(col("event_id"), col("roll_n"), col("z"), col("flagged"))
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(streamed.size == batch.size)
    val diffs = batch.collect {
      case (id, b) if streamed(id) != b => (id, b, streamed(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("streaming CUSUM: fixed-target drift scores EQUAL the batch SPC mode bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("value").cast("double").as("value"))
      .dropDuplicates("k", "t")
    val batch = graft.operators.TimeJoins
      .cusum(obs, "k", "t", "value", target = Some(10.0))
      .select(col("k"), col("t"), col("cusum_up"), col("cusum_dn"),
        col("flagged"))
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val rows = obs.as[(Long, Long, Double)].collect().sortBy(_._2)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val q = StreamCusum.detect(
        mem.toDF().toDF("k", "t", "value"), target = 10.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("update").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cusum_out")
      .select(col("k"), col("t"), col("cusum_up"), col("cusum_dn"),
        col("flagged"))
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(streamed.size == batch.size)
    val diffs = batch.collect {
      case (key, b) if streamed(key) != b => (key, b, streamed(key))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    // and the drift actually fires somewhere (events average well off
    // the 10.0 target) — equality of two all-false columns proves little
    assert(streamed.values.exists(_._3), "expected at least one flag")
  }

  test("streaming OLS: final and cut-prefix emissions EQUAL batch linearFit bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("value").cast("double").as("x"),
        pmod(col("event_id"), lit(97)).cast("double").as("y"))
      .dropDuplicates("k", "t")
    val rows = obs.as[(Long, Long, Double, Double)].collect()
      .sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchFit(data: Seq[(Long, Long, Double, Double)]) =
      graft.operators.Stats
        .linearFit(data.toDF("k", "t", "x", "y"), "k", "x", "y")
        .select(col("k"), col("n"), col("slope"), col("intercept"),
          col("r2"))
        .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Double)]
    val q = StreamRegression.fit(mem.toDF().toDF("k", "t", "x", "y"))
      .writeStream.format("memory").queryName("reg_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      val expCut = batchFit(first.toIndexedSeq)
      assert(atCut == expCut, s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      val expAll = batchFit(rows.toIndexedSeq)
      assert(fin == expAll, s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._2.isDefined),
        "at least one key has a real fit")
    } finally q.stop()

    def latestPerKey() = spark.table("reg_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("n").desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n"), col("slope"), col("intercept"),
        col("r2"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("streaming Holt: final and cut-prefix emissions EQUAL batch holtSmooth bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("value").cast("double").as("v"))
      .dropDuplicates("k", "t")
    val rows = obs.as[(Long, Long, Double)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchHolt(data: Seq[(Long, Long, Double)]) =
      graft.operators.TimeJoins
        .holtSmooth(data.toDF("k", "t", "v"), "k", "t", "v", "t",
          alpha = 0.25, beta = 0.125, horizon = 3)
        .select(col("k"), col("n"), col("level"), col("trend"),
          col("forecast"))
        .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val q = StreamHolt.smooth(mem.toDF().toDF("k", "t", "v"),
        alpha = 0.25, beta = 0.125, horizon = 3)
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      assert(atCut == batchHolt(first.toIndexedSeq),
        s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      assert(fin == batchHolt(rows.toIndexedSeq),
        s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._3.isDefined),
        "at least one key carries a real trend")
    } finally q.stop()

    def latestPerKey() = spark.table("holt_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("n").desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n"), col("level"), col("trend"),
        col("forecast"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("streaming calibration: final and cut-prefix emissions EQUAL batch bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id").as("k"), col("event_id").as("t"),
        (pmod(col("value"), lit(100.0)) / 100.0).as("s"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
      .na.drop()
    val rows = obs.as[(Long, Long, Double, Int)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchCal(data: Seq[(Long, Long, Double, Int)]) =
      graft.operators.Stats
        .calibration(data.toDF("k", "t", "s", "y"), "k", "y", "s",
          nBins = 10)
        .select(col("k"), col("n"), col("n_pos"), col("brier"),
          col("ece"))
        .as[(Long, Long, Long, Double, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val q = StreamCalibration
      .monitor(mem.toDF().toDF("k", "t", "s", "y"), nBins = 10)
      .writeStream.format("memory").queryName("cal_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      assert(atCut == batchCal(first.toIndexedSeq),
        s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      assert(fin == batchCal(rows.toIndexedSeq),
        s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._4 > 0),
        "at least one key carries a real ECE")
    } finally q.stop()

    def latestPerKey() = spark.table("cal_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("n").desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n"), col("n_pos"), col("brier"), col("ece"))
      .as[(Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("streaming AUC: final and cut-prefix emissions EQUAL batch rocAuc bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id").as("k"), col("event_id").as("t"),
        col("value").as("s"),
        when(col("event_type").isin("purchase", "click"), 1)
          .otherwise(0).as("y"))
      .na.drop()
    val rows = obs.as[(Long, Long, Double, Int)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchAuc(data: Seq[(Long, Long, Double, Int)]) =
      graft.operators.Stats
        .rocAuc(data.toDF("k", "t", "s", "y"), "k", "y", "s")
        .select(col("k"), col("n_pos"), col("n_neg"), col("auc"),
          col("gini"))
        .as[(Long, Long, Long, Option[Double], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val q = StreamAuc.monitor(mem.toDF().toDF("k", "t", "s", "y"))
      .writeStream.format("memory").queryName("auc_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      assert(atCut == batchAuc(first.toIndexedSeq),
        s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      assert(fin == batchAuc(rows.toIndexedSeq),
        s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._3.isDefined),
        "at least one key carries a real AUC")
    } finally q.stop()
    def latestPerKey() = spark.table("auc_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"))
          .orderBy((col("n_pos") + col("n_neg")).desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n_pos"), col("n_neg"), col("auc"),
        col("gini"))
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    // the vocabulary failsafe fires loudly instead of truncating
    val mem2 = MemoryStream[(Long, Long, Double, Int)]
    val q2 = StreamAuc
      .monitor(mem2.toDF().toDF("k", "t", "s", "y"), maxDistinct = 3)
      .writeStream.format("memory").queryName("auc_over")
      .outputMode("update").start()
    try {
      mem2.addData((1 to 8).map(i => (1L, i.toLong, i * 1.0, i % 2)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("maxDistinct") ||
        Option(e.getCause).exists(_.getMessage.contains("maxDistinct")))
    } finally q2.stop()
  }

  test("streaming KS: final and cut-prefix emissions EQUAL batch ksTest bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(7)).as("k"),
        col("event_id").as("t"), col("event_type").as("g"),
        col("value").as("v"))
      .na.drop()
    val rows = obs.as[(Long, Long, String, Double)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchKs(data: Seq[(Long, Long, String, Double)]) =
      data.map(_._1).distinct.sorted.map { k =>
        val df = data.filter(_._1 == k).toDF("k", "t", "g", "v")
        k -> graft.operators.Stats
          .ksTest(df, "g", "click", "view", "v")
          .select(col("n_a"), col("n_b"), col("d_stat"), col("c_stat"),
            col("reject_05"))
          .as[(Long, Long, Option[Double], Option[Double], Option[Boolean])]
          .head()
      }.toMap
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = StreamKs
      .monitor(mem.toDF().toDF("k", "t", "g", "v"), "click", "view")
      .writeStream.format("memory").queryName("ks_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      assert(atCut == batchKs(first.toIndexedSeq),
        s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      assert(fin == batchKs(rows.toIndexedSeq),
        s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._3.isDefined),
        "at least one key carries a real D statistic")
    } finally q.stop()
    def latestPerKey() = spark.table("ks_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"))
          .orderBy((col("n_a") + col("n_b")).desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n_a"), col("n_b"), col("d_stat"),
        col("c_stat"), col("reject_05"))
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    // the value-vocabulary failsafe fires loudly instead of truncating
    val mem2 = MemoryStream[(Long, Long, String, Double)]
    val q2 = StreamKs
      .monitor(mem2.toDF().toDF("k", "t", "g", "v"), "click", "view",
        maxDistinct = 3)
      .writeStream.format("memory").queryName("ks_over")
      .outputMode("update").start()
    try {
      mem2.addData((1 to 8).map(i =>
        (1L, i.toLong, if (i % 2 == 0) "click" else "view", i * 1.0)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("maxDistinct") ||
        Option(e.getCause).exists(_.getMessage.contains("maxDistinct")))
    } finally q2.stop()
  }

  test("streaming MWU: final and cut-prefix emissions EQUAL batch mannWhitneyByKey bitwise") {
    val obs = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(pmod(col("user_id"), lit(7)).as("k"),
        col("event_id").as("t"), col("event_type").as("g"),
        col("value").as("v"))
      .na.drop()
    val rows = obs.as[(Long, Long, String, Double)].collect().sortBy(_._2)
    val (first, second) = rows.splitAt(rows.length / 2)
    def batchMwu(data: Seq[(Long, Long, String, Double)]) = {
      val df = data.toDF("k", "t", "g", "v")
      graft.operators.Stats
        .mannWhitneyByKey(df, "k", "g", "click", "view", "v")
        .select(col("k"), col("n_a"), col("n_b"), col("u_stat"),
          col("z_stat"), col("reject_05"))
        .as[(Long, Long, Long, Option[Double], Option[Double], Option[Boolean])]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    }
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = StreamMwu
      .monitor(mem.toDF().toDF("k", "t", "g", "v"), "click", "view")
      .writeStream.format("memory").queryName("mwu_out")
      .outputMode("update").start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      val atCut = latestPerKey()
      assert(atCut == batchMwu(first.toIndexedSeq),
        s"cut-prefix mismatch: ${atCut.take(2)}")
      mem.addData(second.toSeq); q.processAllAvailable()
      val fin = latestPerKey()
      assert(fin == batchMwu(rows.toIndexedSeq),
        s"final mismatch: ${fin.take(2)}")
      assert(fin.valuesIterator.exists(_._4.isDefined),
        "at least one key carries a real z statistic")
    } finally q.stop()
    def latestPerKey() = spark.table("mwu_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"))
          .orderBy((col("n_a") + col("n_b")).desc, col("t").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("n_a"), col("n_b"), col("u_stat"),
        col("z_stat"), col("reject_05"))
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    // the value-vocabulary failsafe fires loudly instead of truncating
    val mem2 = MemoryStream[(Long, Long, String, Double)]
    val q2 = StreamMwu
      .monitor(mem2.toDF().toDF("k", "t", "g", "v"), "click", "view",
        maxDistinct = 3)
      .writeStream.format("memory").queryName("mwu_over")
      .outputMode("update").start()
    try {
      mem2.addData((1 to 8).map(i =>
        (1L, i.toLong, if (i % 2 == 0) "click" else "view", i * 1.0)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("maxDistinct") ||
        Option(e.getCause).exists(_.getMessage.contains("maxDistinct")))
    } finally q2.stop()
  }

  test("streaming CMS: zip-summed shard sketches EQUAL the batch sketch bitwise") {
    val (depth, width) = (3, 128)
    val toks = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(graft.pipeline.TextAnalysis.tokens(col("text")))
        .as("token"))
      .filter(col("token") =!= "")
      .as[String].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamCountMin
      .cmsShards(mem.toDF().select(col("value").as("token")),
        depth = depth, width = width, nShards = 4)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    try {
      val (first, second) = toks.splitAt(toks.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table("cms_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("n_seen").desc)))
      .filter(col("rn") === 1)
      .select(col("counters")).as[Seq[Long]].collect()
    val streamed = latest.reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
    val batch = toks.toSeq.toDF("token")
      .agg(graft.functions.cmsSketch(col("token"), depth, width).as("s"))
      .as[Seq[Long]].head()
    assert(streamed == batch,
      "shard-sum must equal the batch sketch exactly (CMS merge is addition)")
  }

  test("streaming drift: js_div EQUALS batch distributionDrift on the prefix AND the whole") {
    val rows = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("source"), col("text"))
      .filter(col("text").isNotNull)
      .as[(String, String)].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamDrift
      .tokenHistograms(mem.toDF()
        .select(col("_1").as("source"), col("_2").as("text")))
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("update").start()
    val (first, second) = rows.splitAt(rows.length / 2)
    def streamedDrift() = StreamDrift
      .driftFromHistograms(spark.table("drift_out"))
      .orderBy(col("source_a"), col("source_b")).collect().toSeq
    def batchDrift(docs: Seq[(String, String)]) = graft.pipeline
      .TextAnalysis.distributionDrift(docs.toDF("source", "text"))
      .orderBy(col("source_a"), col("source_b")).collect().toSeq
    try {
      // microbatch 1: the streamed histograms must reproduce the batch
      // operator on the ingested PREFIX, bit-for-bit (same counts in,
      // same jsDivergenceFromCounts core)
      mem.addData(first.toSeq); q.processAllAvailable()
      assert(streamedDrift() == batchDrift(first.toSeq),
        "prefix drift must equal the batch operator bitwise")
      // microbatch 2: state carried the histograms across the cut
      mem.addData(second.toSeq); q.processAllAvailable()
      assert(streamedDrift() == batchDrift(rows.toSeq),
        "full drift must equal the batch operator bitwise")
    } finally q.stop()
  }

  test("streaming drift: PSI consumer equals batch distributionPsi on the prefix") {
    val rows = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("lang"), col("text"))
      .filter(col("text").isNotNull)
      .as[(String, String)].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamDrift
      .tokenHistograms(mem.toDF()
        .select(col("_1").as("source"), col("_2").as("text")))
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("update").start()
    def streamedPsi() = StreamDrift
      .psiFromHistograms(spark.table("psi_out"), baseline = "en")
      .orderBy(col("source")).collect().toSeq
    def batchPsi(docs: Seq[(String, String)]) = graft.pipeline
      .TextAnalysis.distributionPsi(docs.toDF("source", "text"),
        baseline = "en")
      .orderBy(col("source")).collect().toSeq
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      assert(streamedPsi() == batchPsi(first.toSeq),
        "prefix PSI must equal the batch operator bitwise")
      mem.addData(second.toSeq); q.processAllAvailable()
      assert(streamedPsi() == batchPsi(rows.toSeq),
        "full PSI must equal the batch operator bitwise")
    } finally q.stop()
  }

  test("streaming drift: the maxVocab failsafe is loud, not lossy") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamDrift
      .tokenHistograms(mem.toDF()
        .select(col("_1").as("source"), col("_2").as("text")),
        maxVocab = 4)
      .writeStream.format("memory").queryName("drift_guard_out")
      .outputMode("update").start()
    mem.addData(Seq(("crawl", "a b c d e f g h")))
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(e.getMessage != null)
    q.stop()
  }

  test("streaming KLL: mass conserved and rank bound holds across microbatches") {
    // real event values, split into two microbatches: shard compactor
    // stacks (including the parity counter) must survive the batch cut
    val kllK = 64
    val nShards = 4
    val vals = Tables.load(spark, TestSpark.sf, "events")
      .select(col("value").cast("double")).as[Double].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Double]
    val q = StreamQuantiles
      .kllShards(mem.toDF().select(col("value")), k = kllK,
        nShards = nShards)
      .writeStream.format("memory").queryName("kll_out")
      .outputMode("update").start()
    try {
      val (first, second) = vals.splitAt(vals.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    // freshest summary per shard, then union the (value, weight) lists
    val latest = spark.table("kll_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("n_seen").desc)))
      .filter(col("rn") === 1)
      .select(col("n_seen"), col("summary"))
      .as[(Long, Seq[Double])].collect()
    val n = vals.length.toLong
    // mass conservation: per-shard Σ weights == n_seen, totals == n
    latest.foreach { case (seen, sum) =>
      val mass = sum.grouped(2).map(_(1)).sum
      assert(mass == seen.toDouble, s"shard mass $mass != n_seen $seen")
    }
    assert(latest.map(_._1).sum == n)
    val union = latest.flatMap(_._2.grouped(2).map(p => (p(0), p(1))))
    // rank bound: estimated rank within the summed per-shard bounds
    val bound = latest.map { case (seen, _) =>
      val lv = math.ceil(math.log(seen.toDouble / kllK)
        / math.log(2)).max(1) + 1
      seen * lv / kllK
    }.sum
    val sorted = vals.sorted
    Seq(0.1, 0.5, 0.9).foreach { phi =>
      val v = sorted(((sorted.length - 1) * phi).toInt)
      val estRank = union.filter(_._1 <= v).map(_._2).sum
      val exactRank = sorted.count(_ <= v).toDouble
      assert(math.abs(estRank - exactRank) <= bound,
        s"phi=$phi: est $estRank vs exact $exactRank, bound $bound")
    }
  }

  test("streaming CDC ops across a microbatch cut EQUAL batch snapshotDiff") {
    import org.apache.spark.sql.DataFrame
    val s1 = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")).localCheckpoint()
    val rows = s1.as[(Long, Long, Double)].collect()
    // batch 1: first ingest of every row; batch 2: disjoint classes —
    // tombstones (k%11=3), repriced re-ingests (k%7=0), unchanged
    // re-crawls (k%4=0), and brand-new keys (k%13=1 shifted)
    val b1 = rows.zipWithIndex.map { case ((k, ck, p), i) =>
      (i.toLong, k, ck, p, "R") }
    var seq = rows.length.toLong
    val b2 = rows.flatMap { case (k, ck, p) =>
      val r =
        if (k % 11 == 3) Some((k, 0L, 0.0, "D"))
        else if (k % 7 == 0) Some((k, ck, p + 10.0, "R"))
        else if (k % 4 == 0) Some((k, ck, p, "R"))
        else None
      val ins = if (k % 13 == 1)
        Some((k + 1000000000L, ck, p, "R")) else None
      (r.toSeq ++ ins.toSeq).map { t =>
        seq += 1; (seq, t._1, t._2, t._3, t._4) }
    }
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double, String)]
    val q = StreamCdc.ops(mem.toDF()
        .toDF("seq", "o_orderkey", "o_custkey", "o_totalprice", "op"))
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    def sink(): Set[(Long, String, Long, Option[Double])] =
      spark.table("cdc_out")
        .as[(Long, String, Long, Option[Double])].collect().toSet
    val (after1, after2) = try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      val a1 = sink()
      mem.addData(b2.toSeq); q.processAllAvailable()
      (a1, sink())
    } finally q.stop()
    // batch 1 is all inserts
    assert(after1.size == rows.length && after1.forall(_._2 == "I"))
    // batch 2's emissions must equal Merge.snapshotDiff(s1, s2) where
    // s2 is the intended second snapshot — the online/offline CDC
    // equivalence (unchanged re-crawls emit nothing on both sides)
    val s2: DataFrame = s1.filter(col("o_orderkey") % 11 =!= 3)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(10.0))
          .otherwise(col("o_totalprice")))
      .unionByName(s1.filter(col("o_orderkey") % 13 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)))
    val want = graft.operators.Merge.snapshotDiff(s1, s2, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"), col("o_custkey"),
        col("o_totalprice"))
      .as[(Long, String, Long, Option[Double])].collect().toSet
    val got = after2 diff after1
    assert(got == want, s"first diffs: ${((got diff want) ++
      (want diff got)).take(5)}")
  }

  test("streaming SCD2 across a microbatch cut EQUALS batch historize") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts"), col("event_type"), col("value"))
      .localCheckpoint()
    val rows = ev.as[(Long, Long, Long, String, Double)].collect()
    assert(rows.nonEmpty)
    // split at the median ts: every batch-1 row precedes every batch-2
    // row, so per-key replay order equals the batch window order
    val cut = rows.map(_._3).sorted.apply(rows.length / 2)
    val b1 = rows.filter(_._3 < cut).toSeq
    val b2 = rows.filter(_._3 >= cut).toSeq
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val q = StreamScd2.historize(mem.toDF()
        .toDF("user_id", "event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("update").start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("scd2_out")
      .as[(Long, Long, Option[String], Option[Double], Long,
        Option[Long], Boolean)].collect()
    // Update-mode reconciliation: the closed re-emission supersedes the
    // open one for the same (user_id, event_id) version
    val got = emitted.groupBy(r => (r._1, r._2)).map { case (_, vs) =>
      vs.find(!_._7).getOrElse(vs.head)
    }.toSet
    val want = graft.operators.Merge
      .historize(ev, Seq("user_id"), "ts", Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .as[(Long, Long, Option[String], Option[Double], Long,
        Option[Long], Boolean)].collect().toSet
    assert(got == want, s"first diffs: ${((got diff want) ++
      (want diff got)).take(5)}")
  }

  test("streaming CDC: NULL custkey is null-safe, not an encoder NPE") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Option[Long], Option[Double], String)]
    val q = StreamCdc.ops(mem.toDF()
        .toDF("seq", "o_orderkey", "o_custkey", "o_totalprice", "op"))
      .writeStream.format("memory").queryName("cdc_null_out")
      .outputMode("update").start()
    def sink(): Set[(Long, String, Option[Long], Option[Double])] =
      spark.table("cdc_null_out")
        .as[(Long, String, Option[Long], Option[Double])].collect().toSet
    try {
      // key 1: NULL custkey at insert, re-crawled identical (no emit),
      // then NULL→value (must be U — the <=> contract)
      // key 2: value→NULL is also U; key 3: NULL throughout, deleted
      mem.addData(Seq(
        (1L, 1L, None, Some(5.0), "R"),
        (2L, 2L, Some(7L), Some(1.0), "R"),
        (3L, 3L, None, None, "R")))
      q.processAllAvailable()
      val a1 = sink()
      assert(a1 == Set(
        (1L, "I", None, Some(5.0)),
        (2L, "I", Some(7L), Some(1.0)),
        (3L, "I", None, None)))
      mem.addData(Seq(
        (4L, 1L, None, Some(5.0), "R"),      // unchanged NULL==NULL
        (5L, 1L, Some(9L), Some(5.0), "R"),  // NULL→value = U
        (6L, 2L, None, Some(1.0), "R"),      // value→NULL = U
        (7L, 3L, None, None, "D")))          // delete carries last state
      q.processAllAvailable()
      val got = sink() diff a1
      assert(got == Set(
        (1L, "U", Some(9L), Some(5.0)),
        (2L, "U", None, Some(1.0)),
        (3L, "D", None, None)))
    } finally q.stop()
  }
}
