package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MGBuffer

/** Streaming heavy hitters (SURVEY.md §2 ST10): the Misra–Gries
  * summary of [[graft.functions.MisraGriesAgg]] maintained ONLINE —
  * "what are the frequent tokens right now" answered per micro-batch
  * at ingest time instead of by a nightly batch job; the frequency
  * sibling of ST8's streaming near-dup.
  *
  * Shape: tokens hash to `nShards` groups (`pmod(xxhash64(token),
  * nShards)` — the shard count scales with the cluster, there is no
  * single global state row), and each shard's state is ONE MG(k)
  * counter set updated by the classic per-item rule inside
  * `flatMapGroupsWithState`. After each batch every touched shard
  * re-emits its current candidate set.
  *
  * Guarantee (why the shard union is safe): shards partition the token
  * space, so a token's GLOBAL frequency equals its within-shard
  * frequency, while the shard's stream length n_s ≤ n. MG(k) per shard
  * keeps every token with freq > n_s/k — a superset of freq > n/k.
  * The union of shard candidates therefore contains every global heavy
  * hitter; the caller applies the usual output-proportional exact
  * verify over candidates (the batch `heavy_hitters` discipline) for
  * deterministic final sets. State is O(nShards·k) counters TOTAL,
  * independent of stream length — the bounded-state contract.
  */
object StreamHeavyHitters {

  // Parallel arrays, not Map: the streaming state encoder's generated
  // code needs public bean-ish accessors (see the BucketState note in
  // [[StreamDedup]]); private[graft] keeps the API hidden while the
  // JVM class stays public for janino.
  private[graft] case class MGState(items: Array[String],
      weights: Array[Long], seen: Long)

  /** `n_seen` counts every token the shard has processed — monotone
    * per shard, so a consumer of the update stream keeps the row with
    * the highest n_seen per shard as "current". */
  case class ShardCandidates(shard: Int, n_seen: Long,
      candidates: Seq[String])

  /** Per-shard online MG candidates. `tokens` needs a string `token`
    * column; works identically on a batch frame (flatMapGroupsWithState
    * degrades to a per-group fold) and a stream. */
  def mgCandidates(tokens: DataFrame, k: Int = 50,
      nShards: Int = 8): Dataset[ShardCandidates] = {
    val spark = tokens.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[MGState]): Iterator[ShardCandidates] = {
      val buf = new MGBuffer(k)
      var seen = 0L
      if (state.exists) {
        val s = state.get
        seen = s.seen
        var i = 0
        while (i < s.items.length) {
          buf.addCounter(s.items(i), s.weights(i)); i += 1
        }
      }
      rows.foreach { case (_, t) => buf.add(t, 1L); seen += 1 }
      val entries = buf.entries
      state.update(MGState(entries.map(_._1), entries.map(_._2), seen))
      Iterator.single(ShardCandidates(shard, seen, buf.items.sorted.toSeq))
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
