package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.KllBuffer

/** Streaming quantiles (SURVEY.md §2 ST11): the KLL summary of
  * [[graft.functions.KllQuantileAgg]] maintained ONLINE — "what is the
  * p99 right now" answered per micro-batch at ingest time; the rank
  * sibling of ST10's streaming heavy hitters, completing the online
  * sketch family (ST8 similarity, ST10 frequency, ST11 rank).
  *
  * Shape: rows hash to `nShards` groups (shard count scales with the
  * cluster — no single global state row), each shard folds its values
  * into ONE KLL(k) compactor stack inside `flatMapGroupsWithState`,
  * and after every batch each touched shard re-emits its current
  * (value, weight) summary. KLL summaries are MERGEABLE by
  * concatenation: weights are absolute masses, so a consumer unions
  * the freshest summary per shard and reads ranks off the combined
  * (value, weight) list — Σ weights over all shards is exactly the
  * total row count (mass conservation per shard, spec-asserted across
  * the batch cut), and the union's rank error is at most the sum of
  * the per-shard deterministic bounds n_s·L_s/k.
  *
  * State round-trip: the full compactor stack (flattened level values
  * + level lengths) AND the derandomized compaction-parity counter are
  * carried across batches, so an interrupted-and-resumed stream folds
  * exactly like an uninterrupted one. State is O(nShards · k·L)
  * values total — logarithmic in stream length, the bounded-state
  * contract.
  */
object StreamQuantiles {

  // Parallel flattened arrays (not nested): the streaming state
  // encoder's generated code needs flat bean-ish fields (the
  // StreamDedup BucketState note).
  private[graft] case class KllState(values: Array[Double],
      levelLens: Array[Int], seen: Long, parity: Long)

  /** `summary` is the flattened (value, weight) pair list
    * [v₀,w₀,v₁,w₁,…] sorted by value — same layout as the batch
    * [[graft.functions.kllSketch]] column. `n_seen` is monotone per
    * shard; consumers keep each shard's freshest row. */
  case class ShardSummary(shard: Int, n_seen: Long, summary: Seq[Double])

  /** Per-shard online KLL summaries. `values` needs a numeric `value`
    * column; identical code path batch and stream. */
  def kllShards(values: DataFrame, k: Int = 128,
      nShards: Int = 8): Dataset[ShardSummary] = {
    val spark = values.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, Double)],
        state: GroupState[KllState]): Iterator[ShardSummary] = {
      val buf = new KllBuffer(k)
      var seen = 0L
      if (state.exists) {
        val s = state.get
        seen = s.seen
        var off = 0
        var h = 0
        while (h < s.levelLens.length) {
          buf.restoreLevel(h,
            java.util.Arrays.copyOfRange(s.values, off, off + s.levelLens(h)))
          off += s.levelLens(h)
          h += 1
        }
        buf.restoreParity(s.parity)
      }
      rows.foreach { case (_, v) => buf.add(v); seen += 1 }
      val lv = buf.levels
      state.update(KllState(lv.flatten, lv.map(_.length), seen,
        buf.parityCounter))
      val sum = buf.summary
      Iterator.single(ShardSummary(shard, seen,
        sum.flatMap(p => Seq(p._1, p._2.toDouble)).toSeq))
    }

    values
      .select(pmod(xxhash64(col("value").cast("double").cast("string")),
          lit(nShards)).cast("int").as("shard"),
        col("value").cast("double").as("value"))
      .as[(Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
