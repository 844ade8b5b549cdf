package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ROC-AUC monitor (SURVEY.md §2 ST21): the online twin of
  * [[graft.operators.Stats.rocAuc]] — every arriving (score, label)
  * observation re-emits its key's exact tie-aware AUC over everything
  * seen so far: the live "is the model's RANKING quality dropping on
  * this segment" alarm, completing the classifier-QA pair with
  * [[StreamCalibration]] (ST20 watches whether the scores MEAN what
  * they say, this one watches whether they still ORDER the classes).
  *
  * State per key is the (distinct score → pos/neg counts) histogram —
  * bounded by the segment's score VOCABULARY (a model emitting a
  * bounded score grid, the common case), never by stream length, with
  * a LOUD `maxDistinct` failsafe (silent truncation would corrupt
  * every later AUC — the ST18 discipline). Emission is ONCE per key
  * per MICRO-BATCH (r12, the [[StreamKs]] discipline — the doubled
  * concordance depends on running totals, so it cannot be maintained
  * incrementally, and the r11 per-arrival shape re-walked the whole
  * histogram per row: O(rows×|V|) BigInteger work per batch;
  * per-batch bounds it at O(rows·log|V| + |V|)): one ascending walk
  * recomputes the batch operator's exact integers — the doubled
  * concordance count 2·Σ_v n_pos(v)·(below(v)+½n_neg(v)) — and
  * applies the same one-division 6dp rounds, so every streamed
  * (auc, gini) ≡ `Stats.rocAuc` over the seen rows BIT-FOR-BIT
  * (StreamingSpec proves cut-prefix and final equality). Statistics
  * are order-free; arrival order only affects which `t` labels an
  * emission.
  */
object StreamAuc {

  private[graft] case class AucState(vs: Seq[Double], np: Seq[Long],
      nn: Seq[Long])

  case class AucRow(k: Long, t: Long, n_pos: Long, n_neg: Long,
      auc: Option[Double], gini: Option[Double])

  /** `obs` needs (k, t, s, y): key, tie, score, binary label. */
  def monitor(obs: DataFrame, maxDistinct: Int = 100000): Dataset[AucRow] = {
    require(maxDistinct > 0, "maxDistinct must be positive")
    val spark = obs.sparkSession
    import spark.implicits._

    // local so the state function captures no module reference (the
    // StreamAuc object is not serializable and must not ride the task)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fn(key: Long, rows: Iterator[(Long, Long, Double, Int)],
        state: GroupState[AucState]): Iterator[AucRow] = {
      val cells = scala.collection.mutable.TreeMap.empty[Double, (Long, Long)]
      if (state.exists) {
        val st = state.get
        st.vs.indices.foreach(i => cells(st.vs(i)) = (st.np(i), st.nn(i)))
      }
      // apply the whole micro-batch to the histogram first (one
      // insertion per row), then ONE ascending walk for the emission —
      // never a walk per arriving row (r12)
      var tMax = Long.MinValue
      rows.foreach { case (_, t, s, y) =>
        if (t > tMax) tMax = t
        val (p0, n0) = cells.getOrElse(s, (0L, 0L))
        cells(s) =
          if (y > 0) (p0 + 1, n0) else (p0, n0 + 1)
        if (cells.size > maxDistinct)
          throw new IllegalStateException(
            s"StreamAuc: key $key exceeded maxDistinct=$maxDistinct " +
              "distinct scores — a truncated histogram would corrupt " +
              "every later AUC. Quantize the score upstream (e.g. " +
              "round to the model's emission grain, the batch " +
              "operator's `grain` parameter) or raise the bound.")
      }
      // the batch integers, walked over ascending scores
      var npos = 0L; var nneg = 0L
      var below = java.math.BigInteger.ZERO
      var num2 = java.math.BigInteger.ZERO
      cells.foreach { case (_, (p, n)) =>
        val nB = java.math.BigInteger.valueOf(n)
        num2 = num2.add(java.math.BigInteger.valueOf(p)
          .multiply(below.shiftLeft(1).add(nB)))
        below = below.add(nB)
        npos += p; nneg += n
      }
      val out =
        if (tMax == Long.MinValue) Iterator.empty[AucRow]
        else if (npos > 0 && nneg > 0) {
          val numD = num2.doubleValue
          Iterator(AucRow(key, tMax, npos, nneg,
            Some(round6(numD / (2.0 * npos * nneg))),
            Some(round6(numD / (1.0 * npos * nneg) - 1.0))))
        } else Iterator(AucRow(key, tMax, npos, nneg, None, None))
      val snap = cells.toSeq
      state.update(AucState(snap.map(_._1), snap.map(_._2._1),
        snap.map(_._2._2)))
      out
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
