package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC extraction (SURVEY.md §2 ST14): the online twin of
  * [[graft.operators.Merge.snapshotDiff]] — instead of diffing two
  * complete snapshot vintages tonight, emit each key's I/U/D op the
  * moment its re-ingested row arrives. The consumer-side contract is
  * identical: the emitted op stream folded through
  * [[graft.operators.Merge.upsert]] reproduces the latest state
  * (spec-proven across a microbatch cut).
  *
  * Semantics per key (state = last seen values, one row per live key —
  * bounded by live-key cardinality, not stream length):
  *  - first sighting emits I and stores;
  *  - a re-ingested row with any differing value emits U (carrying the
  *    NEW values) and stores;
  *  - an identical row emits NOTHING — re-crawls of unchanged rows are
  *    the overwhelmingly common case and must cost zero downstream;
  *  - a tombstone row (`op` = "D") emits D (carrying the LAST KNOWN
  *    values) and clears the state. Deletes need tombstones: absence
  *    is not an event a row stream can observe — the same reason batch
  *    snapshotDiff needs the WHOLE prev snapshot to find D rows.
  * Value comparison is null-safe exactly as the batch operator's
  * `<=>` conjunction: NULL→NULL is "unchanged", NULL→value is U —
  * and EVERY value column decodes as Option (a NULL custkey must
  * compare, not NPE in the encoder).
  *
  * Shared [[EventPipeline]] caveat: per-key arrival order across
  * microbatches is the replay order (within a batch rows sort by
  * `seq`); state never rewinds.
  */
object StreamCdc {

  private[graft] case class CdcState(custkey: Option[Long],
      price: Option[Double])

  case class CdcOp(o_orderkey: Long, op: String, o_custkey: Option[Long],
      o_totalprice: Option[Double])

  /** `changes` needs (seq, o_orderkey, o_custkey, o_totalprice, op)
    * where op is "R" for a re-ingested full row and "D" for a
    * tombstone. Emits only real changes. */
  def ops(changes: DataFrame): Dataset[CdcOp] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def fn(key: Long,
        rows: Iterator[(Long, Long, Option[Long], Option[Double], String)],
        state: GroupState[CdcState]): Iterator[CdcOp] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[CdcOp]
      rows.toArray.sortBy(_._1).foreach {
        case (_, _, ck, price, op) =>
          if (op == "D") {
            if (state.exists) {
              val s = state.get
              out += CdcOp(key, "D", s.custkey, s.price)
              state.remove()
            } // tombstone for an absent key: no-op, like MERGE
          } else {
            val same = state.exists && state.get.custkey == ck &&
              state.get.price == price
            if (!same) {
              out += CdcOp(key, if (state.exists) "U" else "I", ck, price)
              state.update(CdcState(ck, price))
            }
          }
      }
      out.iterator
    }

    changes
      .select(col("seq").cast("long"), col("o_orderkey").cast("long"),
        col("o_custkey").cast("long"), col("o_totalprice").cast("double"),
        col("op").cast("string"))
      .as[(Long, Long, Option[Long], Option[Double], String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
