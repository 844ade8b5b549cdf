package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators (SURVEY.md §2 P12–P14): sequence
  * packing (concat-and-chunk), deterministic hash splits, and eval-set
  * decontamination. All pure built-in expressions over fully-specified
  * arithmetic, so each is DuckDB-oracle-checkable.
  */
object Packing {

  /** Concat-and-chunk sequence packing — the standard LLM-pretraining
    * layout: concatenate documents in doc_id order and cut the token
    * stream into fixed `capacity`-token training sequences; a document
    * may span chunks. Returns one row per (document, chunk) overlap:
    * (shard, chunk_idx, doc_id, doc_from, doc_to, chunk_off) where
    * [doc_from, doc_to) are token offsets within the doc and chunk_off
    * is where that slice starts inside the chunk.
    *
    * Scale: a single global ordered cumulative sum would serialize into
    * one window partition, so the stream is sharded by `pmod(doc_id,
    * nShards)` and packed per shard (deterministic, restart-stable —
    * shard count = parallelism). Each shard's window is a partial
    * aggregate over its own partition: no global barrier, no driver
    * state. At 100 TB, nShards scales with the cluster and each chunk
    * id stays stable under re-runs because it derives only from
    * (shard, doc_id order, token counts).
    */
  def packSequences(docs: DataFrame, capacity: Int = 1024, nShards: Int = 8,
      textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"),
      pmod(col("doc_id"), lit(nShards)).cast("long").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = base
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("n_tokens"))
    // every doc has ≥1 token (the tokenizer yields [""] on empty text),
    // so tok_end − 1 ≥ tok_start and the chunk sequence is non-empty
    spans.select(col("shard"), col("doc_id"), col("tok_start"), col("tok_end"),
        explode(sequence(
          expr(s"tok_start div $capacity"),
          expr(s"(tok_end - 1) div $capacity"))).as("chunk_idx"))
      .select(
        col("shard"), col("chunk_idx"), col("doc_id"),
        (greatest(col("tok_start"), col("chunk_idx") * capacity)
          - col("tok_start")).as("doc_from"),
        (least(col("tok_end"), (col("chunk_idx") + 1) * capacity)
          - col("tok_start")).as("doc_to"),
        (greatest(col("tok_start"), col("chunk_idx") * capacity)
          - col("chunk_idx") * capacity).as("chunk_off"))
  }

  /** Deterministic hash-based train/val/test split. The bucket is pure
    * arithmetic — Knuth multiplicative hash mod 2^32, then mod 100 —
    * not an engine hash function, so the assignment is reproducible by
    * ANY system (the point of a split: it must be stable across
    * engines, re-runs and shards). `weights` are integer percents
    * summing to ≤ 100 (a remainder falls into the last split). Narrow
    * per-row transform, no shuffle.
    *
    * doc_id < 2^31 × 2654435761 < 2^63: ANSI-overflow-free. */
  def withSplit(docs: DataFrame, idCol: String = "doc_id",
      weights: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum <= 100,
      "split weights must be percents summing to <= 100")
    val bucket = pmod(col(idCol).cast("long") * lit(2654435761L),
      lit(4294967296L)) % 100
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val label = weights.zip(cum).init.foldRight(lit(weights.last._1)) {
      case (((name, _), hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
    docs.withColumn("split_bucket", bucket).withColumn("split", label)
  }

  /** Eval-set decontamination: flag every corpus doc sharing at least
    * one `k`-token shingle with the benchmark set (the standard n-gram
    * overlap contamination check run before training). Returns
    * (doc_id, n_shared, contaminated) for every corpus doc.
    *
    * Scale: the benchmark side is an eval set — small by definition —
    * so its distinct shingles broadcast and the corpus streams past in
    * one narrow pass (explode + broadcast-semi probe + partial-agg
    * count); the corpus is never shuffled. String shingles (not
    * xxhash64) keep the operator engine-reproducible for the oracle;
    * swap in [[Dedup.shingleHashes]] at 100 TB to move 8-byte keys.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, k: Int = 5,
      textCol: String = "text"): DataFrame = {
    val d = docs.select(col("doc_id"),
      explode(Dedup.shingles(col(textCol), k)).as("sh"))
    val b = benchmark
      .select(explode(Dedup.shingles(col(textCol), k)).as("sh"))
      .distinct()
    val hits = d.join(broadcast(b), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared")) // shingle sets: already distinct
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }
}
