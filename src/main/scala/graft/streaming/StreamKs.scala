package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sample Kolmogorov–Smirnov monitor (SURVEY.md §2 ST22;
  * the r10 verdict's missing DISTRIBUTION-SHAPE alarm): the online twin
  * of [[graft.operators.Stats.ksTest]] — every arriving (group, value)
  * observation re-emits its key's exact two-sample D/c statistics over
  * everything seen so far. Completes the drift trio: ST18 (JS) and PSI
  * watch token MASS, this one watches a numeric column's whole ECDF —
  * "did today's score/length/value distribution change SHAPE against
  * the control group", without waiting for tonight's batch.
  *
  * State per key is the (distinct value → per-group counts) histogram —
  * bounded by the column's VALUE VOCABULARY, never by stream length,
  * with a LOUD `maxDistinct` failsafe (the ST18/ST21 discipline:
  * silent truncation would corrupt every later D). Emission is ONCE
  * per key per MICRO-BATCH (r12; labeled by the batch's max `t`): D's
  * numerator — max |cum_a·n_b − cum_b·n_a| over exact BigInteger
  * cross-products — depends on the running TOTALS, so it cannot be
  * maintained incrementally under insertion; a per-ARRIVAL emission
  * (the r11 shape) re-walked the whole histogram per row, making a
  * busy key's micro-batch O(rows × |V|) BigInteger work — at the
  * 100000 default maxDistinct, billions of ops. Per-batch emission
  * bounds the cost at O(rows·log|V| + |V|) per key per batch while
  * every emitted row still equals `Stats.ksTest` over all rows seen
  * through that batch BIT-FOR-BIT — the same one-division 6dp/4dp
  * rounding ladder over the same integers (StreamingSpec proves
  * cut-prefix and final equality). Statistics are order-free; arrival
  * order only affects which `t` labels an emission.
  */
object StreamKs {

  private[graft] case class KsState(vs: Seq[Double], na: Seq[Long],
      nb: Seq[Long])

  case class KsRow(k: Long, t: Long, n_a: Long, n_b: Long,
      d_stat: Option[Double], c_stat: Option[Double],
      reject_05: Option[Boolean])

  /** `obs` needs (k, t, g, v): key, tie, group label, value. Rows whose
    * group is neither `gA` nor `gB` are out of scope (the batch
    * operator's filter). */
  def monitor(obs: DataFrame, gA: String, gB: String,
      maxDistinct: Int = 100000): Dataset[KsRow] = {
    require(maxDistinct > 0, "maxDistinct must be positive")
    val spark = obs.sparkSession
    import spark.implicits._

    // local so the state function captures no module reference (the
    // StreamKs object is not serializable and must not ride the task)
    def round(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fn(key: Long, rows: Iterator[(Long, Long, String, Double)],
        state: GroupState[KsState]): Iterator[KsRow] = {
      val cells = scala.collection.mutable.TreeMap.empty[Double, (Long, Long)]
      if (state.exists) {
        val st = state.get
        st.vs.indices.foreach(i => cells(st.vs(i)) = (st.na(i), st.nb(i)))
      }
      // apply the whole micro-batch to the histogram first (one
      // insertion per row), then ONE ascending walk for the emission —
      // never a walk per arriving row
      var tMax = Long.MinValue
      rows.foreach { case (_, t, g, v) =>
        if (t > tMax) tMax = t
        val (a0, b0) = cells.getOrElse(v, (0L, 0L))
        cells(v) = if (g == gA) (a0 + 1, b0) else (a0, b0 + 1)
        if (cells.size > maxDistinct)
          throw new IllegalStateException(
            s"StreamKs: key $key exceeded maxDistinct=$maxDistinct " +
              "distinct values — a truncated histogram would corrupt " +
              "every later D statistic. Quantize the value upstream " +
              "(its measurement grain) or raise the bound.")
      }
      // the batch integers, walked over ascending values:
      // max |cum_a·n_b_tot − cum_b·n_a_tot| as exact BigInteger
      var ta = 0L; var tb = 0L
      cells.foreach { case (_, (a, b)) => ta += a; tb += b }
      val taB = java.math.BigInteger.valueOf(ta)
      val tbB = java.math.BigInteger.valueOf(tb)
      var cumA = java.math.BigInteger.ZERO
      var cumB = java.math.BigInteger.ZERO
      var dnum = java.math.BigInteger.ZERO
      cells.foreach { case (_, (a, b)) =>
        cumA = cumA.add(java.math.BigInteger.valueOf(a))
        cumB = cumB.add(java.math.BigInteger.valueOf(b))
        val x = cumA.multiply(tbB).subtract(cumB.multiply(taB)).abs()
        if (x.compareTo(dnum) > 0) dnum = x
      }
      val out =
        if (tMax == Long.MinValue) Iterator.empty[KsRow]
        else if (ta > 0 && tb > 0) {
          val d = round(dnum.doubleValue / (ta.toDouble * tb), 6)
          val c = round(d * math.sqrt(ta.toDouble * tb / (ta + tb)), 4)
          Iterator(KsRow(key, tMax, ta, tb, Some(d), Some(c),
            Some(c > 1.358)))
        } else Iterator(KsRow(key, tMax, ta, tb, None, None, None))
      val snap = cells.toSeq
      state.update(KsState(snap.map(_._1), snap.map(_._2._1),
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
