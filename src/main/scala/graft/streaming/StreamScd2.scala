package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 historize (SURVEY.md §2 ST15): the online twin
  * of [[graft.operators.Merge.historize]] — instead of re-windowing
  * the whole change log tonight, each key's version chain extends the
  * moment its next change arrives. Completes the online change-data
  * family: [[StreamCdc]] emits the ops, this one versions them.
  *
  * Semantics per key (state = the OPEN version only — bounded by live
  * keys, not history length):
  *  - the first change opens version 1: emitted with valid_to NULL,
  *    is_current true;
  *  - each later change CLOSES the open version (re-emitted with
  *    valid_to = the new change's ts, is_current false) and opens its
  *    own. In Update output mode the closed re-emission supersedes the
  *    earlier open one; a consumer keying the sink on
  *    (user_id, event_id) — or taking the closed row when both exist —
  *    holds exactly [[graft.operators.Merge.historize]]'s output for
  *    the ingested prefix (StreamingSpec proves this across a
  *    microbatch cut).
  *
  * Within a batch rows sort by (ts, event_id) — the batch operator's
  * tie rule. Shared [[EventPipeline]] caveat: per-key order ACROSS
  * microbatches is the replay order; a late change with an earlier ts
  * than the open version still chains after it (state never rewinds —
  * re-historize the batch log when out-of-order arrivals matter).
  */
object StreamScd2 {

  private[graft] case class Scd2State(ts: Long, eventId: Long,
      eventType: Option[String], value: Option[Double])

  case class Scd2Row(user_id: Long, event_id: Long,
      event_type: Option[String], value: Option[Double],
      valid_from: Long, valid_to: Option[Long], is_current: Boolean)

  /** `changes` needs (user_id, event_id, ts, event_type, value) with
    * `ts` castable to long (epoch micros). Emits version rows as
    * documented above. */
  def historize(changes: DataFrame): Dataset[Scd2Row] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def fn(key: Long,
        rows: Iterator[(Long, Long, Long, Option[String], Option[Double])],
        state: GroupState[Scd2State]): Iterator[Scd2Row] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
      rows.toArray.sortBy(r => (r._3, r._2)).foreach {
        case (_, eid, ts, et, v) =>
          state.getOption.foreach { s =>
            out += Scd2Row(key, s.eventId, s.eventType, s.value,
              s.ts, Some(ts), is_current = false)
          }
          out += Scd2Row(key, eid, et, v, ts, None, is_current = true)
          state.update(Scd2State(ts, eid, et, v))
      }
      out.iterator
    }

    changes
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("long"), col("event_type").cast("string"),
        col("value").cast("double"))
      .as[(Long, Long, Long, Option[String], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
