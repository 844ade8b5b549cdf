package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipeline over the `events` table (SURVEY.md §2
  * ST1/ST2). The same transform runs in batch (for the DuckDB oracle)
  * and streaming (readStream) — identical code path, which is the point
  * of Spark's unified model. HDK has no streaming story; this is
  * Spark-native surface the reference can't match.
  */
object EventPipeline {

  /** Hourly tumbling-window aggregation with a 2h watermark. On a batch
    * DataFrame the watermark is a no-op and this is a plain groupBy. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // decimal sum (SURVEY §4 rule 6): order-free exact, then one
        // cast back to double keeps the public schema unchanged
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup: first occurrence per `keyCols` wins; state
    * for a key is dropped once the watermark passes it, so state stays
    * bounded — the streaming twin of [[graft.pipeline.Dedup.exactKept]].
    * On a batch frame it degrades to dropDuplicates. */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", watermarkDelay)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(keyCols)
    else wm.dropDuplicates(keyCols)
  }

  /** Stream-static enrichment: each micro-batch broadcast-joins the
    * static dimension — no streaming state at all. The standard shape
    * for attaching dimension attributes to an event firehose. */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (ST5): purchases attributed to the
    * same user's clicks within the preceding hour. BOTH sides carry
    * watermarks and the join condition bounds event time on both
    * sides, so the join state store is expired by watermark — the
    * canonical streaming fact-fact join. On batch frames the
    * watermarks are no-ops and this is a plain interval join. */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
      attributionWindow: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $attributionWindow"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** LEFT-OUTER stream-stream interval join (ST7): like
    * [[purchaseAttribution]], but clicks with NO purchase inside the
    * window are still emitted — with null purchase columns — once the
    * watermark closes their join state. This is the semantics inner
    * joins cannot express on a stream: "this click did NOT convert" is
    * only knowable after event time has provably passed the window, and
    * the watermark is exactly that proof. State stays bounded for the
    * same reason. On batch frames the watermarks are no-ops and this is
    * a plain left-outer interval join — the oracle twin. */
  def purchaseAttributionOuter(clicks: DataFrame, purchases: DataFrame,
      attributionWindow: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $attributionWindow"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class SessionAgg(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, total_value: Double)
  private case class SessState(start_ms: Long, last_ms: Long, n: Int, total: Double)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom-
    * state escape hatch (ST2). Emits a session whenever a user's events
    * are separated by more than `gapMs`. State per user is O(1). */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionAgg] = {
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionAgg]
    implicit val keyEnc = Encoders.scalaLong

    def fn(userId: Long, rows: Iterator[Ev], state: GroupState[SessState]): Iterator[SessionAgg] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var st = state.getOption.orNull
      val out = Seq.newBuilder[SessionAgg]
      sorted.foreach { e =>
        if (st == null) st = SessState(e.ts_ms, e.ts_ms, 1, e.value)
        else if (e.ts_ms - st.last_ms > gapMs) {
          out += SessionAgg(userId, st.start_ms, st.last_ms, st.n, st.total)
          st = SessState(e.ts_ms, e.ts_ms, 1, e.value)
        } else st = SessState(st.start_ms, e.ts_ms, st.n + 1, st.total + e.value)
      }
      if (st != null) state.update(st)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  case class FunnelEv(user_id: Long, ts_ms: Long, event_type: String)
  case class FunnelProgress(user_id: Long, level: Int, at_ms: Long)
  // JVM-visible (not `private`): the state deserializer is Janino-
  // compiled codegen, which cannot construct a Scala-private class
  private[streaming] case class FunnelState(anchor_ms: Long, prev_ms: Long,
      level: Int)

  /** Streaming twin of [[graft.operators.Funnel.funnel]] (ST9): a
    * per-user O(1) state machine — (anchor t1, last advance ts, level)
    * — that emits a FunnelProgress row each time a user advances a
    * step. The greedy first-qualifying-event advance equals the batch
    * chained-min-ts semantics because events are processed in event-
    * time order (sorted within each group batch; the equal-ts tie
    * processes the EARLIER step first, which the strictly-after rule
    * then rejects, matching batch `>`). Cross-microbatch disorder
    * carries the same caveat as [[sessionize]]: state never rewinds, so
    * late events past their group's frontier are ignored rather than
    * re-folded — the bounded-state price every streaming funnel pays.
    */
  def funnelProgress(events: Dataset[FunnelEv], steps: Seq[String],
      windowMs: Long): Dataset[FunnelProgress] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelProgress]
    implicit val keyEnc = Encoders.scalaLong
    val stepIdx = steps.zipWithIndex.toMap

    def fn(userId: Long, rows: Iterator[FunnelEv],
        state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
      val sorted = rows.toSeq
        .filter(e => stepIdx.contains(e.event_type))
        .sortBy(e => (e.ts_ms, stepIdx(e.event_type)))
      var st = state.getOption.orNull
      val out = Seq.newBuilder[FunnelProgress]
      sorted.foreach { e =>
        val i = stepIdx(e.event_type)
        if (st == null) {
          if (i == 0) {
            st = FunnelState(e.ts_ms, e.ts_ms, 1)
            out += FunnelProgress(userId, 1, e.ts_ms)
          }
        } else if (i == st.level && st.level < steps.size &&
            e.ts_ms > st.prev_ms && e.ts_ms <= st.anchor_ms + windowMs) {
          st = FunnelState(st.anchor_ms, e.ts_ms, st.level + 1)
          out += FunnelProgress(userId, st.level, e.ts_ms)
        }
      }
      if (st != null) state.update(st)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
