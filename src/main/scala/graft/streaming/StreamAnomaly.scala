package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection (SURVEY.md §2 ST13):
  * the online twin of [[graft.operators.TimeJoins.rollingZScore]] —
  * "flag this event now", not in tonight's batch. Per-user state is
  * the trailing `span` values STRICTLY BEFORE the current event (the
  * batch operator's exclusive ROWS −span..−1 frame), O(span) doubles
  * per user — bounded state.
  *
  * Bitwise batch equality, not approximate agreement: the per-event
  * mean/std recompute replays EXACTLY the update rule Spark's
  * declarative `stddev_samp` applies when a sliding window frame is
  * re-evaluated in frame order (Welford: δ = x−avg, δₙ = δ/n,
  * avg += δₙ, M2 += δ·(δ−δₙ)), and the 6dp/4dp rounds replay
  * `round`'s HALF_UP BigDecimal rule — so the streamed z equals the
  * batch z on the same rows bit-for-bit (spec-proven across a
  * microbatch cut). Shared [[EventPipeline]] caveat: rows must arrive
  * per-user in event-time order across batches (within a batch they
  * are sorted here); state never rewinds for stragglers.
  */
object StreamAnomaly {

  private[graft] case class ZState(vals: Array[Double])

  case class ScoredEvent(event_id: Long, user_id: Long, us: Long,
      value: Double, roll_n: Long, z: Option[Double], flagged: Boolean)

  private def round(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def welford(vals: Array[Double]): (Double, Double) = {
    var n = 0L
    var avg = 0.0
    var m2 = 0.0
    vals.foreach { v =>
      n += 1
      val delta = v - avg
      val deltaN = delta / n
      avg += deltaN
      m2 += delta * (delta - deltaN)
    }
    (avg, math.sqrt(m2 / (n - 1)))
  }

  /** `events` needs (event_id, user_id, us, value). */
  def zScores(events: DataFrame, span: Int = 20, minObs: Int = 5,
      threshold: Double = 3.0): Dataset[ScoredEvent] = {
    require(span >= minObs && minObs >= 2, "need span >= minObs >= 2")
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, rows: Iterator[(Long, Long, Long, Double)],
        state: GroupState[ZState]): Iterator[ScoredEvent] = {
      var buf = if (state.exists) state.get.vals else Array.empty[Double]
      val out = rows.toArray.sortBy(r => (r._3, r._1)).map {
        case (eventId, _, us, v) =>
          val rollN = buf.length.toLong
          val z =
            if (rollN >= minObs) {
              val (m, s) = welford(buf)
              val (m6, s6) = (round(m, 6), round(s, 6))
              if (s6 > 0) Some(round((v - m6) / s6, 4)) else None
            } else None
          buf = (buf :+ v).takeRight(span)
          ScoredEvent(eventId, user, us, v, rollN, z,
            z.exists(math.abs(_) > threshold))
      }
      state.update(ZState(buf))
      out.iterator
    }

    events
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("us").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
