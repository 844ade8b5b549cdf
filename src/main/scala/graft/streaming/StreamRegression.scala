package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key OLS fit (SURVEY.md §2 ST17): the online twin of
  * [[graft.operators.Stats.linearFit]] — every arriving observation
  * re-emits the key's slope/intercept/R² over everything seen so far,
  * the live drift-rate readout a monitoring pipeline wants without
  * tonight's batch.
  *
  * State per key is the five exact moments (and n) — O(1), carried as
  * DECIMAL state columns that hold the batch operator's
  * DECIMAL(38,12) accumulator values exactly. Every emission replays
  * the batch IEEE ladder on the same agreed operands (decimal→double
  * conversions, one division, the ROUNDED slope composed into the
  * intercept, HALF_UP rounds), so the last emission per key is
  * bit-equal to `linearFit` over the same rows — and the emission AT
  * the microbatch cut equals `linearFit` over the prefix
  * (StreamingSpec proves both). Shared in-order caveat of the family.
  */
object StreamRegression {

  private[graft] case class RegState(n: Long,
      sx: java.math.BigDecimal, sy: java.math.BigDecimal,
      sxy: java.math.BigDecimal, sxx: java.math.BigDecimal,
      syy: java.math.BigDecimal)

  case class FitRow(k: Long, t: Long, n: Long, slope: Option[Double],
      intercept: Option[Double], r2: Option[Double])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def q6(x: Double): java.math.BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal

  /** `obs` needs (k, t, x, y); rows must arrive t-ordered per key
    * across batches (sorted within each batch here). */
  def fit(obs: DataFrame): Dataset[FitRow] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val zero = java.math.BigDecimal.ZERO

    def fn(key: Long, rows: Iterator[(Long, Long, Double, Double)],
        state: GroupState[RegState]): Iterator[FitRow] = {
      var st = if (state.exists) state.get
        else RegState(0L, zero, zero, zero, zero, zero)
      val out = rows.toArray.sortBy(_._2).map { case (_, t, x, y) =>
        val (x6, y6) = (q6(x), q6(y))
        st = RegState(st.n + 1,
          st.sx.add(x6), st.sy.add(y6),
          st.sxy.add(x6.multiply(y6)), st.sxx.add(x6.multiply(x6)),
          st.syy.add(y6.multiply(y6)))
        // the batch IEEE ladder on the exact moments
        val nD = st.n.toDouble
        val (sxD, syD) = (st.sx.doubleValue, st.sy.doubleValue)
        val cov = st.sxy.doubleValue * nD - sxD * syD
        val vx = st.sxx.doubleValue * nD - sxD * sxD
        val vy = st.syy.doubleValue * nD - syD * syD
        val slope = if (st.n >= 2 && vx > 0) Some(round6(cov / vx)) else None
        val icept = slope.map(sl => round6((syD - sl * sxD) / nD))
        val r2 = if (st.n >= 2 && vx > 0 && vy > 0)
          Some(round6(cov * cov / (vx * vy))) else None
        FitRow(key, t, st.n, slope, icept, r2)
      }
      state.update(st)
      out.iterator
    }

    obs
      .select(col("k").cast("long"), col("t").cast("long"),
        col("x").cast("double"), col("y").cast("double"))
      // NULL rows are out of scope in the batch operator too
      // (linearFit filters them) — dropped, not NPE'd
      .na.drop()
      .as[(Long, Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
