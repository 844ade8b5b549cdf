package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key Mann–Whitney U monitor (SURVEY.md §2 ST23; r12) —
  * the LIVE A/B readout: the online twin of
  * [[graft.operators.Stats.mannWhitneyByKey]]. Each segment key's
  * (group, value) arrivals maintain a per-key value histogram; every
  * micro-batch re-emits that key's exact rank-sum verdict over
  * everything seen so far — "is treatment B's metric distribution
  * shifted against control A in segment k, right now", without
  * waiting for tonight's batch. Completes the monitor family: ST20
  * watches calibration, ST21 ranking quality, ST22 distribution
  * SHAPE; this one is the nonparametric LOCATION-SHIFT alarm.
  *
  * State per key is the (distinct value → per-group counts) histogram
  * — bounded by the column's VALUE VOCABULARY, never by stream
  * length, with the LOUD `maxDistinct` failsafe (silent truncation
  * would corrupt every later U). Emission is ONCE per key per
  * MICRO-BATCH (the r12 [[StreamKs]] discipline — rank sums depend on
  * the running totals, so per-arrival emission would re-walk the
  * histogram per row): one ascending walk recomputes the batch
  * operator's exact integers — the doubled rank sum
  * Σ n_a(v)·(2·before(v) + t(v) + 1) and tie mass Σ(t³−t) as
  * BigInteger — then the same IEEE ladder (z rounded 4dp), so every
  * emitted row EQUALS `Stats.mannWhitneyByKey` over the seen rows
  * BIT-FOR-BIT (StreamingSpec proves cut-prefix and final equality).
  * Statistics are order-free; arrival order only affects which `t`
  * labels an emission. Compose with
  * [[graft.operators.Stats.twoSidedNormalP]] + bhFdr downstream when
  * many segments stream at once.
  */
object StreamMwu {

  private[graft] case class MwuState(vs: Seq[Double], na: Seq[Long],
      nb: Seq[Long])

  case class MwuRow(k: Long, t: Long, n_a: Long, n_b: Long,
      u_stat: Option[Double], z_stat: Option[Double],
      reject_05: Option[Boolean])

  /** `obs` needs (k, t, g, v): segment key, tie, group label, value.
    * Rows whose group is neither `gA` nor `gB` are out of scope (the
    * batch operator's filter). */
  def monitor(obs: DataFrame, gA: String, gB: String,
      maxDistinct: Int = 100000): Dataset[MwuRow] = {
    require(maxDistinct > 0, "maxDistinct must be positive")
    val spark = obs.sparkSession
    import spark.implicits._

    // local so the state function captures no module reference (the
    // StreamMwu object is not serializable and must not ride the task)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fn(key: Long, rows: Iterator[(Long, Long, String, Double)],
        state: GroupState[MwuState]): Iterator[MwuRow] = {
      val cells = scala.collection.mutable.TreeMap.empty[Double, (Long, Long)]
      if (state.exists) {
        val st = state.get
        st.vs.indices.foreach(i => cells(st.vs(i)) = (st.na(i), st.nb(i)))
      }
      var tMax = Long.MinValue
      rows.foreach { case (_, t, g, v) =>
        if (t > tMax) tMax = t
        val (a0, b0) = cells.getOrElse(v, (0L, 0L))
        cells(v) = if (g == gA) (a0 + 1, b0) else (a0, b0 + 1)
        if (cells.size > maxDistinct)
          throw new IllegalStateException(
            s"StreamMwu: key $key exceeded maxDistinct=$maxDistinct " +
              "distinct values — a truncated histogram would corrupt " +
              "every later U statistic. Quantize the value upstream " +
              "(its measurement grain, the batch operator's `grain` " +
              "parameter) or raise the bound.")
      }
      // the batch integers, one ascending walk: doubled rank sum and
      // tie mass as exact BigInteger (t³ overflows long past ~2e6 ties)
      var ta = 0L; var tb = 0L
      cells.foreach { case (_, (a, b)) => ta += a; tb += b }
      var beforeCum = java.math.BigInteger.ZERO
      var r2a = java.math.BigInteger.ZERO
      var ties = java.math.BigInteger.ZERO
      cells.foreach { case (_, (a, b)) =>
        val t = java.math.BigInteger.valueOf(a + b)
        // n_a(v)·(2·before + t + 1)
        r2a = r2a.add(java.math.BigInteger.valueOf(a).multiply(
          beforeCum.shiftLeft(1).add(t).add(java.math.BigInteger.ONE)))
        ties = ties.add(t.multiply(t).multiply(t).subtract(t))
        beforeCum = beforeCum.add(t)
      }
      val out =
        if (tMax == Long.MinValue) Iterator.empty[MwuRow]
        else {
          val n = ta + tb
          val u2 = r2a.subtract(java.math.BigInteger.valueOf(ta)
            .multiply(java.math.BigInteger.valueOf(ta + 1)))
          val mu2 = java.math.BigInteger.valueOf(ta)
            .multiply(java.math.BigInteger.valueOf(tb))
          val varU = ta.toDouble * tb / 12.0 *
            ((n + 1).toDouble - ties.doubleValue / (n.toDouble * (n - 1)))
          val u = if (ta > 0 && tb > 0) Some(u2.doubleValue / 2.0) else None
          val z = if (ta > 0 && tb > 0 && n > 1 && varU > 0)
            Some(round4(u2.subtract(mu2).doubleValue / 2.0 / math.sqrt(varU)))
          else None
          Iterator(MwuRow(key, tMax, ta, tb, u, z,
            z.map(v => math.abs(v) > 1.96)))
        }
      val snap = cells.toSeq
      state.update(MwuState(snap.map(_._1), snap.map(_._2._1),
        snap.map(_._2._2)))
      out
    }

    obs
      .select(col("k").cast("long"), col("t").cast("long"),
        col("g").cast("string"), col("v").cast("double"))
      .na.drop()
      .filter(col("g").isin(gA, gB))
      .as[(Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
