package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming classifier-calibration monitor (SURVEY.md §2 ST20): the
  * online twin of [[graft.operators.Stats.calibration]] — every
  * arriving (score, label) observation re-emits its key's Brier score
  * and expected calibration error over everything seen so far: the
  * live "is the quality model still calibrated on this segment" alarm
  * a pipeline wants the day a source drifts, not at tonight's batch.
  *
  * State per key is O(nBins): exact counts, the exact DECIMAL(38,12)
  * Brier numerator (the batch accumulator value), and per-bin
  * (n, n_pos, Σ score6) cells. Every emission replays the batch IEEE
  * ladder — the width_bucket clamp arithmetic, 6dp HALF_UP rounds of
  * bin means/fracs, the exact decimal ECE numerator, one division —
  * so emissions are bit-equal to `Stats.calibration` over the seen
  * rows (StreamingSpec proves cut-prefix and final equality). Shared
  * in-order caveat of the family (here order only matters for which
  * `t` labels the emission — the statistics themselves are
  * order-free).
  */
object StreamCalibration {

  private[graft] case class CalState(n: Long, npos: Long,
      se: java.math.BigDecimal, binN: Seq[Long], binP: Seq[Long],
      binS: Seq[java.math.BigDecimal])

  case class CalRow(k: Long, t: Long, n: Long, n_pos: Long,
      brier: Double, ece: Double)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def q6(x: Double): java.math.BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal

  /** `obs` needs (k, t, s, y): key, tie, score, binary label. */
  def monitor(obs: DataFrame, nBins: Int = 10): Dataset[CalRow] = {
    require(nBins > 0, "nBins must be positive")
    val spark = obs.sparkSession
    import spark.implicits._
    val zero = java.math.BigDecimal.ZERO

    def bin(s: Double): Int = {
      // Spark's width_bucket(s, 0, 1, n) arithmetic, then the batch
      // operator's clamp into [1, n]
      val raw =
        if (s < 0.0) 0L
        else if (s >= 1.0) nBins + 1L
        else (nBins.toDouble * (s - 0.0) / 1.0).toLong + 1L
      math.min(math.max(raw, 1L), nBins.toLong).toInt
    }

    def fn(key: Long, rows: Iterator[(Long, Long, Double, Int)],
        state: GroupState[CalState]): Iterator[CalRow] = {
      var st = if (state.exists) state.get
        else CalState(0L, 0L, zero, Seq.fill(nBins)(0L),
          Seq.fill(nBins)(0L), Seq.fill(nBins)(zero))
      val out = rows.toArray.sortBy(_._2).map { case (_, t, s, y) =>
        val b = bin(s) - 1
        val s6 = q6(s)
        val yd = if (y > 0) java.math.BigDecimal.ONE else zero
        val d = s6.subtract(yd)
        st = CalState(st.n + 1, st.npos + (if (y > 0) 1L else 0L),
          st.se.add(d.multiply(d)),
          st.binN.updated(b, st.binN(b) + 1L),
          st.binP.updated(b, st.binP(b) + (if (y > 0) 1L else 0L)),
          st.binS.updated(b, st.binS(b).add(s6)))
        // the batch ladder: per-bin 6dp mean/frac re-cast to exact
        // decimals, |diff|·n_b summed exactly, ONE division each
        var en = zero
        (0 until nBins).foreach { i =>
          if (st.binN(i) > 0) {
            val m = q6(round6(st.binS(i).doubleValue / st.binN(i)))
            val f = q6(round6(st.binP(i).toDouble / st.binN(i)))
            en = en.add(m.subtract(f).abs
              .multiply(java.math.BigDecimal.valueOf(st.binN(i))))
          }
        }
        CalRow(key, t, st.n, st.npos,
          round6(st.se.doubleValue / st.n),
          round6(en.doubleValue / st.n))
      }
      state.update(st)
      out.iterator
    }

    obs
      .select(col("k").cast("long"), col("t").cast("long"),
        col("s").cast("double"), col("y").cast("int"))
      // NULL rows are out of scope in the batch operator too
      .na.drop()
      .as[(Long, Long, Double, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
