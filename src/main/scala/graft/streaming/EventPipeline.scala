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
        round(sum(col("value")), 4).as("total_value"))
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
}
