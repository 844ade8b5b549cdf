package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Dedup

/** Streaming near-duplicate detection (SURVEY.md §2 ST8): the MinHash
  * band-bucket plan of [[graft.pipeline.Dedup.minhashPairs]] re-expressed
  * for an unbounded document stream — each arriving doc is checked
  * against the docs already seen in its band buckets, so near-dups are
  * flagged ONLINE, at ingest time, instead of by a nightly batch job.
  *
  * Shape: a narrow per-row signature ([[Dedup.minhashSignatureCol]] —
  * no aggregation, which a stateful streaming query could not put
  * before its stateful operator anyway), a typed flatMap to
  * (band_idx, band_hash) rows, then `flatMapGroupsWithState` keyed by
  * bucket. State per bucket is the (doc_id, signature) list capped at
  * `maxPerBucket` — O(cap) memory and O(cap) comparisons per arrival,
  * the same hot-bucket discipline as the batch path's `maxBucketDf` —
  * and an optional processing-time idle timeout evicts cold buckets,
  * so total state is bounded by the live working set, not the stream's
  * history. Identical hashing end-to-end means stream hits and batch
  * pairs agree exactly (StreamingSpec proves set equality in batch
  * mode, where flatMapGroupsWithState degrades to a per-bucket fold).
  */
object StreamDedup {

  case class BandRow(doc_id: Long, band_idx: Int, band_hash: Long,
      sig: Seq[Long])
  case class DupHit(a_id: Long, b_id: Long, band_idx: Int,
      est_jaccard: Double)
  // sigs is the CONCATENATION of the stored signatures (stride =
  // numHashes) as primitive arrays — the cheapest unsafe-row layout.
  // `private[graft]`, NOT `private`: an object-private Scala class
  // compiles to a non-public JVM class, and the streaming state
  // serializer's GENERATED code (a separate janino class) cannot call
  // its accessors — the failure surfaces as janino's misleading "no
  // applicable constructor/method found for zero actual parameters:
  // ids()". Qualified private keeps the API hidden while staying
  // public in bytecode.
  private[graft] case class BucketState(ids: Array[Long], sigs: Array[Long])

  /** Band rows for each document: the signature rides along so bucket
    * collisions can be verified against the full signature in-state.
    * Same band-hash fold as the batch path: acc·1000003 + (min & 2^32−1)
    * mod 2^32, seeded with the band index. */
  def bandRows(docs: DataFrame, numHashes: Int = 64,
      bands: Int = 16): Dataset[BandRow] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        Dedup.minhashSignatureCol(col("text"), numHashes).as("sig"))
      .as[(Long, Seq[Long])]
      .flatMap { case (id, sig) =>
        (0 until bands).map { b =>
          val bh = sig.slice(b * rows, b * rows + rows)
            .foldLeft(b.toLong)((acc, x) =>
              (acc * 1000003L + (x & 4294967295L)) % 4294967296L)
          BandRow(id, b, bh, sig)
        }
      }
  }

  /** Online near-dup hits: (a_id, b_id, band_idx, est_jaccard) with
    * a_id < b_id, emitted the moment the second doc of a pair lands in
    * a shared band bucket with signature agreement ≥ `threshold`. A
    * pair sharing several buckets fires once per bucket (downstream
    * consumers dedup on (a_id, b_id) — in-stream global dedup would be
    * a second stateful operator for no semantic gain). Works unchanged
    * on a batch frame, where it reduces to per-bucket pair generation —
    * the oracle twin StreamingSpec compares against
    * [[Dedup.minhashPairs]].
    *
    * `idleTimeoutMs` (processing-time bucket eviction) makes the engine
    * re-run micro-batches continuously to check deadlines — pair it
    * with an explicit `Trigger.ProcessingTime(...)` interval in the
    * writeStream, or the default ASAP trigger busy-loops on empty
    * batches. */
  def nearDupHits(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxPerBucket: Int = 100,
      idleTimeoutMs: Option[Long] = None): Dataset[DupHit] = {
    implicit val stEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val outEnc: Encoder[DupHit] = Encoders.product[DupHit]
    implicit val keyEnc: Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    def fn(key: (Int, Long), rows: Iterator[BandRow],
        state: GroupState[BucketState]): Iterator[DupHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val incoming = rows.toSeq.sortBy(_.doc_id)
      var ids = state.getOption.map(_.ids).getOrElse(Array.emptyLongArray)
      var sigs = state.getOption.map(_.sigs).getOrElse(Array.emptyLongArray)
      val out = Seq.newBuilder[DupHit]
      incoming.foreach { r =>
        if (!ids.contains(r.doc_id)) {
          ids.indices.foreach { j =>
            val oid = ids(j)
            val base = j * numHashes
            var eq = 0
            var i = 0
            while (i < numHashes) {
              if (sigs(base + i) == r.sig(i)) eq += 1
              i += 1
            }
            // same 6dp HALF_UP rounding as the batch est_jaccard
            val est = BigDecimal(eq.toDouble / numHashes)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (est >= threshold)
              out += DupHit(math.min(oid, r.doc_id),
                math.max(oid, r.doc_id), key._1, est)
          }
          // bucket full ⇒ newcomers still verify against the stored cap
          // but stop growing state (bounded memory per hot bucket)
          if (ids.length < maxPerBucket) {
            ids = ids :+ r.doc_id
            sigs = sigs ++ r.sig
          }
        }
      }
      state.update(BucketState(ids, sigs))
      idleTimeoutMs.foreach(ms => state.setTimeoutDuration(ms))
      out.result().iterator
    }

    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bandRows(docs, numHashes, bands)
      .groupByKey(r => (r.band_idx, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }
}
