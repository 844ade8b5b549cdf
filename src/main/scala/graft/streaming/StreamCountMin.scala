package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.CountMinAgg

/** Streaming Count–Min sketch (SURVEY.md §2 ST12): the point-frequency
  * summary of [[graft.functions.CountMinAgg]] maintained ONLINE — the
  * last member of the online sketch family (ST8 similarity, ST10
  * frequency candidates, ST11 rank, ST12 point frequency).
  *
  * Shape: tokens hash to `nShards` groups; each shard's state is ONE
  * d·w counter array updated inside `flatMapGroupsWithState`, re-emitted
  * per touched batch. Because every occurrence of a token lands in
  * exactly one shard and CMS cells are plain sums, the ELEMENTWISE SUM
  * of the shard sketches IS the global sketch — not an approximation
  * of it: consumers keep the freshest row per shard, zip-sum the
  * arrays, and get bit-for-bit the sketch a batch [[CountMinAgg]] pass
  * over the same rows would produce (spec-proven across a microbatch
  * cut). State is O(nShards·d·w) counters, independent of stream
  * length.
  */
object StreamCountMin {

  private[graft] case class CmsState(counters: Array[Long], seen: Long)

  /** `counters` is the row-major d·w array, same layout as the batch
    * [[graft.functions.cmsSketch]] column. `n_seen` is monotone per
    * shard; consumers keep each shard's freshest row. */
  case class ShardSketch(shard: Int, n_seen: Long, counters: Seq[Long])

  /** Per-shard online CMS. `tokens` needs a string `token` column;
    * identical code path batch and stream. */
  def cmsShards(tokens: DataFrame, depth: Int = 3, width: Int = 256,
      nShards: Int = 8): Dataset[ShardSketch] = {
    val spark = tokens.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[CmsState]): Iterator[ShardSketch] = {
      val buf = if (state.exists) state.get.counters.clone()
        else new Array[Long](depth * width)
      var seen = if (state.exists) state.get.seen else 0L
      rows.foreach { case (_, t) =>
        var r = 0
        while (r < depth) {
          buf(r * width + CountMinAgg.bucket(t, r, width)) += 1L
          r += 1
        }
        seen += 1
      }
      state.update(CmsState(buf, seen))
      Iterator.single(ShardSketch(shard, seen, buf.toSeq))
    }

    tokens
      .select(pmod(xxhash64(col("token")), lit(nShards)).cast("int")
          .as("shard"),
        col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
