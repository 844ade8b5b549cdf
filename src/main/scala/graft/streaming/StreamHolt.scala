package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt linear-trend smoothing (SURVEY.md §2 ST19): the
  * online twin of [[graft.operators.TimeJoins.holtSmooth]] — every
  * arriving observation re-emits the key's level/trend/h-step
  * forecast over everything seen so far: the live "where is this
  * metric heading" readout a capacity monitor wants without tonight's
  * batch.
  *
  * State per key is O(1): (n, first value, l, b). The batch operator's
  * recurrence is a pure-double left fold in (ts, tie) order, so the
  * stream replays the IDENTICAL IEEE steps in arrival order — the
  * unrounded state agrees with the batch fold bit-for-bit on any
  * ordered prefix, and emissions apply the same 6dp HALF_UP rounds
  * (StreamingSpec proves cut-prefix and final equality). Shared
  * in-order caveat of the family: state never rewinds — re-run the
  * batch operator when out-of-order matters.
  */
object StreamHolt {

  private[graft] case class HoltState(n: Long, first: Double,
      l: Double, b: Double)

  case class HoltRow(k: Long, t: Long, n: Long, level: Option[Double],
      trend: Option[Double], forecast: Option[Double])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `obs` needs (k, t, v); rows must arrive t-ordered per key across
    * batches (sorted within each batch here). */
  def smooth(obs: DataFrame, alpha: Double = 0.3, beta: Double = 0.1,
      horizon: Int = 1): Dataset[HoltRow] = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "need 0<alpha<1, 0<beta<1")
    require(horizon >= 1, "horizon must be >= 1")
    val spark = obs.sparkSession
    import spark.implicits._
    val q = 1 - alpha
    val r = 1 - beta

    def fn(key: Long, rows: Iterator[(Long, Long, Double)],
        state: GroupState[HoltState]): Iterator[HoltRow] = {
      var st = if (state.exists) state.get
        else HoltState(0L, 0.0, 0.0, 0.0)
      val out = rows.toArray.sortBy(_._2).map { case (_, t, v) =>
        st =
          if (st.n == 0L) HoltState(1L, v, v, 0.0)
          else if (st.n == 1L) {
            // the batch init (l₁, b₁) = (y₁, y₂−y₁), then one fold
            // step over y₂ — the identical IEEE sequence
            val l0 = st.first
            val b0 = v - st.first
            val nl = alpha * v + q * (l0 + b0)
            val nb = beta * ((alpha * v + q * (l0 + b0)) - l0) + r * b0
            HoltState(2L, st.first, nl, nb)
          } else {
            val nl = alpha * v + q * (st.l + st.b)
            val nb = beta * ((alpha * v + q * (st.l + st.b)) - st.l) +
              r * st.b
            HoltState(st.n + 1, st.first, nl, nb)
          }
        if (st.n == 1L)
          HoltRow(key, t, 1L, Some(round6(st.l)), None, None)
        else
          HoltRow(key, t, st.n, Some(round6(st.l)), Some(round6(st.b)),
            Some(round6(st.l + horizon.toDouble * st.b)))
      }
      state.update(st)
      out.iterator
    }

    obs
      .select(col("k").cast("long"), col("t").cast("long"),
        col("v").cast("double"))
      // NULL rows are out of scope in the batch operator too
      .na.drop()
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
