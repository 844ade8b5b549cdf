package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM mean-shift detection (SURVEY.md §2 ST16): the
  * online twin of [[graft.operators.TimeJoins.cusum]] in its
  * fixed-target SPC mode — "has this metric drifted off its known
  * process mean", decided the moment each observation arrives. The
  * batch operator's retrospective mode (μ from the full series) is
  * inherently non-causal, so the shared semantics — and the
  * spec-proven bitwise equality — live in the `target` mode both
  * sides implement.
  *
  * State per key is O(1), not O(span): the exact prefix sum (longs at
  * 6dp scale — the DECIMAL(38,6) accumulator the batch window uses,
  * held as scaled integers), the observation count, and the running
  * minima of both rounded drift series. Every arithmetic step replays
  * the batch column expressions: v rounds 6dp into the exact sum,
  * C = round(Σv − i·(μ±k), 6) is IEEE on the same operands, the
  * running min compares the same rounded doubles, and the final
  * rounds use the HALF_UP BigDecimal rule `round` applies — so the
  * streamed cusum equals the batch cusum on the same prefix
  * bit-for-bit (StreamingSpec, across a microbatch cut).
  *
  * Shared [[EventPipeline]] caveat: per-key rows must arrive in
  * t-order across batches (sorted within each batch here); state
  * never rewinds for stragglers.
  */
object StreamCusum {

  private[graft] case class CusumState(csScaled: Long, i: Long,
      minUp: Double, minDn: Double)

  case class CusumRow(k: Long, t: Long, value: Double,
      cusum_up: Double, cusum_dn: Double, flagged: Boolean)

  private def round(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `obs` needs (k, t, value) with (k, t) unique and t-ordered per
    * key across batches. `target`/`slack`/`threshold` as in the batch
    * operator's SPC mode. */
  def detect(obs: DataFrame, target: Double, slack: Double = 0.5,
      threshold: Double = 5.0): Dataset[CusumRow] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val mu6 = math.rint(target * 1e6) / 1e6
    val k6 = math.rint(slack * 1e6) / 1e6

    def fn(key: Long, rows: Iterator[(Long, Long, Double)],
        state: GroupState[CusumState]): Iterator[CusumRow] = {
      var st = if (state.exists) state.get
        else CusumState(0L, 0L, 0.0, 0.0)
      val out = rows.toArray.sortBy(_._2).map { case (_, t, v) =>
        // exact 6dp-scaled integer sum = the batch DECIMAL accumulator
        val v6s = math.rint(round(v, 6) * 1e6).toLong
        val cs = st.csScaled + v6s
        val i = st.i + 1
        val csD = java.math.BigDecimal.valueOf(cs, 6).doubleValue()
        val cUp = round(csD - i * (mu6 + k6), 6)
        val cDn = round(-csD + i * (mu6 - k6), 6)
        val minUp = math.min(st.minUp, cUp) // batch: least(0, min C)
        val minDn = math.min(st.minDn, cDn)
        st = CusumState(cs, i, minUp, minDn)
        val up = round(cUp - minUp, 6)
        val dn = round(cDn - minDn, 6)
        CusumRow(key, t, v, up, dn, up > threshold || dn > threshold)
      }
      state.update(st)
      out.iterator
    }

    obs
      .select(col("k").cast("long"), col("t").cast("long"),
        col("value").cast("double"))
      // NULL key/t/value rows are out of scope (the batch operator's
      // (key, t)-unique contract) — dropped here rather than NPE-ing
      // inside the primitive-tuple encoder (the StreamCdc lesson)
      .na.drop()
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
