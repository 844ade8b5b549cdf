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

  /** WHOLE-document bin packing by harmonic size classes (SURVEY.md §2
    * P12d, r12; Lee & Lee's harmonic algorithm, JACM 1985 — public).
    * [[packSequences]] SPLITS documents across chunk boundaries (the
    * causal-LM pretraining shape); fine-tuning and any
    * no-cross-document-attention regime need the other contract: each
    * document stays WHOLE in exactly one fixed-capacity bin, padding
    * minimized. Exact first-fit-decreasing is inherently sequential
    * (bin state after doc i depends on all prior placements), so this
    * uses the classic parallelizable approximation: class
    * k = ⌊capacity / n_tokens⌋ (capped at `maxClass`) holds docs with
    * capacity/(k+1) < n_tokens ≤ capacity/k, and each class-k bin
    * takes exactly k docs — fit is GUARANTEED (k docs of size
    * ≤ capacity/k), waste is bounded by the published harmonic ratio
    * (≤ 1.691·OPT asymptotically), and the assignment is pure window
    * arithmetic: (row_number within (shard, class) by doc_id − 1)
    * div k. Docs longer than `capacity` land in singleton bins with
    * `oversize = true` — surfaced, never silently truncated (feed
    * those to [[packSequences]]' splitting contract instead).
    *
    * Output: (shard, size_class, bin_idx, doc_id, n_tokens, bin_fill,
    * oversize) — (shard, size_class, bin_idx) IS the bin key;
    * bin_fill ≤ capacity for every non-oversize bin (spec-asserted).
    *
    * Scale: one narrow projection + two windows partitioned by
    * (shard, class) — shards scale with the cluster exactly as in
    * [[packSequences]]; bin ids derive only from (shard, doc_id
    * order, token counts), so assignments are stable across re-runs
    * and engines (full DuckDB oracle). */
  def packBins(docs: DataFrame, capacity: Int = 1024, nShards: Int = 8,
      maxClass: Int = 16, textCol: String = "text"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(nShards > 0, "nShards must be positive")
    require(maxClass >= 1, "maxClass must be >= 1")
    val base = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"),
      pmod(col("doc_id"), lit(nShards)).cast("long").as("shard"))
    // class 0 = oversize (n_tokens > capacity): singleton bins; the
    // smallest sizes collapse into class maxClass (bins of maxClass
    // docs — the waste bound holds, the window stays bounded)
    val cls = base.withColumn("size_class",
      least(expr(s"$capacity div n_tokens"), lit(maxClass.toLong)))
    val perBin = when(col("size_class") === 0, lit(1L))
      .otherwise(col("size_class"))
    val wRn = Window.partitionBy(col("shard"), col("size_class"))
      .orderBy(col("doc_id"))
    val assigned = cls
      .withColumn("_rn", row_number().over(wRn).cast("long") - 1)
      .withColumn("_k", perBin)
      // `div` (integer division) exists only in SQL text — Column `/`
      // is always fp division (the allPairsCandidates note)
      .withColumn("bin_idx", expr("_rn div _k"))
      .drop("_rn", "_k")
    val wBin = Window.partitionBy(col("shard"), col("size_class"),
      col("bin_idx"))
    assigned
      .withColumn("bin_fill", sum(col("n_tokens")).over(wBin))
      .withColumn("oversize", col("size_class") === 0)
      .select(col("shard"), col("size_class"), col("bin_idx"),
        col("doc_id"), col("n_tokens"), col("bin_fill"), col("oversize"))
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

  /** Deterministic dataset-mixture sampling: per-group keep rates in
    * basis points (1/10000), e.g. "downsample web to 25%, drop srcX,
    * keep the rest" — the standard domain-reweighting step when
    * assembling a training mix. The keep decision is pure arithmetic on
    * the id (Knuth-style multiplicative hash mod 2^32, then mod 10^4)
    * with a DIFFERENT multiplier than [[withSplit]], so mixture
    * sampling is statistically independent of split assignment and
    * reproducible by any engine. Narrow per-row transform, no shuffle.
    *
    * id < 2^31 × 2246822519 < 2^63: ANSI-overflow-free. */
  def sampleMixture(docs: DataFrame, ratesBp: Seq[(String, Int)],
      defaultBp: Int = 10000, idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    require(ratesBp.nonEmpty &&
      (ratesBp.map(_._2) :+ defaultBp).forall(r => r >= 0 && r <= 10000),
      "mixture rates are basis points in [0, 10000]")
    val bucket =
      pmod(col(idCol).cast("long") * lit(2246822519L), lit(4294967296L)) % 10000
    val rate = ratesBp.foldRight(lit(defaultBp): org.apache.spark.sql.Column) {
      case ((g, r), rest) => when(col(groupCol) === g, lit(r)).otherwise(rest)
    }
    docs
      .withColumn("mix_bucket", bucket)
      .withColumn("mix_rate_bp", rate)
      .withColumn("keep", bucket < rate)
  }

  /** Temperature-flattened mixture sampling: where [[sampleMixture]]
    * takes hand-set rates, this DERIVES them from the data — target
    * share of group g ∝ |g|^α (α < 1 flattens the source distribution,
    * the unigram-temperature trick for not letting a giant web crawl
    * drown curated sources), scaled to an expected `budget` docs, rate
    * capped at 1. Two tiny aggregates (group counts, a 1-row denom)
    * and a broadcast join back — the corpus itself never shuffles, and
    * the per-doc keep is the same Knuth-bucket arithmetic as its
    * siblings (fresh multiplier, so temperature ⟂ mixture ⟂ split).
    *
    * Determinism: |g|^α is rounded 6dp per group then summed as
    * DECIMAL(28,6) — exact, order-free addition — so the denominator
    * is bit-identical in any engine/partitioning; the final rate is one
    * double division chain rounded 6dp. The keep compare stays in
    * doubles (bucket < rate·10⁴) — no engine-divergent double→int cast.
    *
    * id < 2^31 × 1540483477 < 2^63: ANSI-overflow-free. */
  def temperatureMixture(docs: DataFrame, alpha: Double, budget: Long,
      idCol: String = "doc_id", groupCol: String = "source"): DataFrame = {
    require(alpha > 0 && alpha <= 1 && budget > 0,
      "need 0 < alpha <= 1 and a positive doc budget")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_group"))
    val denom = counts.agg(
      sum(round(pow(col("n_group"), alpha), 6).cast("decimal(28,6)"))
        .as("denom"))
    val rates = counts.crossJoin(broadcast(denom))
      .withColumn("t_rate", round(
        least(lit(1.0),
          lit(budget.toDouble) * round(pow(col("n_group"), alpha), 6)
            / col("denom").cast("double") / col("n_group")), 6))
      .select(col(groupCol), col("n_group"), col("t_rate"))
    val bucket =
      pmod(col(idCol).cast("long") * lit(1540483477L), lit(4294967296L)) % 10000
    docs.join(broadcast(rates), Seq(groupCol))
      .withColumn("mix_bucket", bucket)
      .withColumn("keep", bucket < col("t_rate") * 10000)
  }

  /** Deterministic epoch upsampling: per-group epoch weights in basis
    * points (10000 = exactly one pass over the group), e.g. "3.2 epochs
    * of wiki, 0.5 of web" — the REPEAT side of mixture assembly
    * ([[sampleMixture]] can only thin a source; epoch weighting over
    * high-quality sources needs copies). Every doc yields
    * `epochs div 10000` whole copies plus one more iff its hash bucket
    * falls under the fractional remainder, so a group's expected volume
    * is `epochs/10000 × |group|` up to the bucket-uniformity bias of
    * `(key mod 2^32) % 10000`: 2^32 % 10000 = 7296, so low buckets are
    * overrepresented by ~1/430k each — negligible for sampling, and
    * kept (rather than fixed-width key ranges) because 10000 does not
    * divide 2^32 and the DuckDB oracle mirrors this exact arithmetic.
    * The decision is pure arithmetic any engine reproduces
    * (multiplier ⟂ [[withSplit]]'s ⟂
    * [[sampleMixture]]'s ⟂ [[quotaSample]]'s). Emits one row per copy
    * with `copy_idx` ∈ [0, n_copies) so downstream shuffles (e.g. a
    * corpus shuffle keyed on hash(doc_id, copy_idx)) can separate the
    * repeats. Narrow per-row explode — zero shuffles; the explode
    * fan-out IS the requested output volume, there is no intermediate
    * blow-up.
    *
    * id < 2^31 × 3266489917 < 2^63: ANSI-overflow-free. */
  def upsampleMixture(docs: DataFrame, epochsBp: Seq[(String, Int)],
      defaultBp: Int = 10000, idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    require(epochsBp.nonEmpty && (epochsBp.map(_._2) :+ defaultBp).forall(_ >= 0),
      "epoch weights are basis points >= 0")
    val bucket =
      pmod(col(idCol).cast("long") * lit(3266489917L), lit(4294967296L)) % 10000
    val eps = epochsBp.foldRight(lit(defaultBp): org.apache.spark.sql.Column) {
      case ((g, e), rest) => when(col(groupCol) === g, lit(e)).otherwise(rest)
    }
    docs
      .withColumn("epoch_bp", eps.cast("long"))
      .withColumn("up_bucket", bucket)
      .withColumn("n_copies",
        expr("epoch_bp div 10000") +
          when(col("up_bucket") < col("epoch_bp") % 10000, lit(1L))
            .otherwise(lit(0L)))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("n_copies") - 1)))
  }

  /** Sliding context windows WITH overlap (stride < window): each doc's
    * token sequence yields windows [i·stride, i·stride + window) —
    * the standard long-document prep where consecutive windows share
    * window − stride tokens so no span loses context at a boundary.
    * [[packSequences]] concatenates docs into fixed chunks; this slices
    * WITHIN docs. Emits (doc_id, win_idx, tok_start, tok_len); window
    * count = (max(n − window, 0) + stride − 1) div stride + 1, all
    * integer arithmetic so any engine reproduces it. Narrow per-row
    * explode — zero shuffles.
    */
  def slidingWindows(docs: DataFrame, window: Int = 64, stride: Int = 48,
      textCol: String = "text"): DataFrame = {
    require(stride > 0 && stride <= window,
      "stride must be in (0, window]")
    docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("n_windows", expr(
        s"(greatest(n_tokens - $window, 0L) + ${stride - 1}) div $stride + 1"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("win_idx"))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * stride).as("tok_start"),
        least(lit(window.toLong), col("n_tokens") - col("win_idx") * stride)
          .as("tok_len"))
  }

  /** Length-bucketed batching (SURVEY.md §2 P12c): group documents into
    * fixed-size batches of similar token length — the dynamic-batching
    * prep that minimizes padding waste (a batch's cost is its LONGEST
    * member; sorting by length first makes batches length-homogeneous).
    * Returns (doc_id, shard, n_tokens, batch_idx, pad_cost) where
    * batch_idx numbers batches within a shard and pad_cost is the
    * padding this doc would incur at its batch's max length.
    *
    * Scale: a single global length sort would serialize; like
    * [[packSequences]], docs shard by `pmod(doc_id, nShards)` and each
    * shard sorts independently (window per shard, nShards scales with
    * the cluster). Deterministic: rank by (n_tokens, doc_id) is a
    * total order any engine reproduces. */
  def batchByLength(docs: DataFrame, batchSize: Int = 8, nShards: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val wb = Window.partitionBy(col("shard"), col("batch_idx"))
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        pmod(col("doc_id"), lit(nShards)).cast("long").as("shard"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("batch_idx",
        expr(s"(row_number() over (partition by shard order by n_tokens, doc_id) - 1) div $batchSize"))
      .withColumn("pad_cost", max(col("n_tokens")).over(wb) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("batch_idx"), col("pad_cost"))
  }

  /** Deterministic quota (stratified) sampling: keep exactly
    * min(nPerGroup, |group|) docs per group, chosen by Knuth-
    * multiplicative hash rank — the "exactly N docs per language/
    * source" curation step ([[sampleMixture]] is its RATE-based
    * sibling). The multiplier is independent of [[withSplit]]'s and
    * [[sampleMixture]]'s, so quota ⟂ split ⟂ mixture. Returns the
    * docs plus (q_rank, kept): q_rank is the exact within-group hash
    * rank for every row that could plausibly make the quota (the
    * "candidate" rows, see below) and NULL for rows provably past it —
    * a rank deep beyond the quota boundary carries no information and
    * pricing it at a corpus-wide sort was this operator's original
    * scale bug.
    *
    * Scale: `source`-like group keys have a handful of distinct values,
    * so a window partitioned by the group key alone sorts a corpus-
    * sized partition per group in ONE task at 100 TB. Instead the
    * Knuth key (uniform on [0, 2^32)) is histogrammed into `nBuckets`
    * equal ranges, the same decomposition as [[selectByBudget]]: the
    * tiny (groups × nBuckets) histogram + a cumulative over it decide
    * wholesale which buckets can still reach rank ≤ nPerGroup; only
    * rows in those candidate buckets (≈ nPerGroup + |group|/nBuckets
    * rows per group) shuffle into the exact-rank window, partitioned by
    * (group, bucket) so no task ever sorts more than one bucket. The
    * non-candidate branch is a narrow broadcast-join + filter — the
    * corpus itself never shuffles. Exact by construction (a candidate
    * bucket's cum_before offsets its local rank to the true global
    * rank), not ε-probabilistic. Hash ties break by id: a total order,
    * reproducible by any engine.
    * id < 2^31 × 2971215073 < 2^63: ANSI-overflow-free. */
  /** Stratified EXACT train/val/test split (SURVEY.md §2 P31) — the
    * proportion-guaranteed sibling of [[withSplit]]: the hash-percent
    * split is only exact in expectation (a 100-doc rare language can
    * land 71/29 instead of 80/20), this one gives every group EXACTLY
    * ⌊n_g·cum_i/100⌋ − ⌊n_g·cum_{i−1}/100⌋ rows per slice — the
    * guarantee an eval set over low-resource strata needs. Membership
    * is decided by each row's EXACT rank under an independent Knuth
    * hash (multiplier 3267000013, ⟂ every other multiplier in the
    * repo), so the split is deterministic, engine-replayable, and
    * uncorrelated with [[withSplit]]'s buckets.
    *
    * Scale: the exact per-group rank uses the [[quotaSample]]
    * two-phase scheme applied to ALL buckets — a (group, key-bucket)
    * histogram (≤ groups×nBuckets rows) broadcasts its cumulative
    * offsets, and in-bucket row_numbers run over ~n/nBuckets-row
    * frames partitioned by (group, bucket) — a full-corpus exact rank
    * with NO global window and NO low-cardinality-key window. Group
    * sizes ride as a broadcast |groups|-row frame. */
  def stratifiedSplit(docs: DataFrame,
      weights: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10),
      groupCol: String = "source", idCol: String = "doc_id",
      nBuckets: Int = 1024): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100 &&
      weights.forall(_._2 > 0),
      "weights must be positive percents summing to exactly 100")
    require(nBuckets > 0 && 4294967296L % nBuckets == 0,
      "nBuckets must be a power of two dividing 2^32")
    val bucketWidth = 4294967296L / nBuckets
    val keyed = docs
      .withColumn("s_key",
        pmod(col(idCol).cast("long") * lit(3267000013L),
          lit(4294967296L)))
      .withColumn("s_bucket", expr(s"s_key div $bucketWidth"))
    val hist = keyed.groupBy(col(groupCol), col("s_bucket"))
      .agg(count(lit(1)).as("s_bcount"))
      .withColumn("s_cum_before", coalesce(
        sum(col("s_bcount")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("s_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("s_bucket"), col("s_cum_before"))
    val ng = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("_ng"))
    val wb = Window.partitionBy(col(groupCol), col("s_bucket"))
      .orderBy(col("s_key"), col(idCol))
    val ranked = keyed.join(broadcast(hist), Seq(groupCol, "s_bucket"))
      .withColumn("strat_rank",
        col("s_cum_before") + row_number().over(wb).cast("long"))
      .join(broadcast(ng), Seq(groupCol))
    // rank ≤ ⌊n_g·cum/100⌋ boundaries — exact integer arithmetic
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val label = weights.zip(cum).init.foldRight(lit(weights.last._1)) {
      case (((name, _), hi), rest) =>
        when(col("strat_rank") <= expr(s"(_ng * $hi) div 100"), name)
          .otherwise(rest)
    }
    ranked.withColumn("split", label)
      .drop("s_key", "s_bucket", "s_cum_before", "_ng")
  }

  def quotaSample(docs: DataFrame, nPerGroup: Int,
      groupCol: String = "source", idCol: String = "doc_id",
      nBuckets: Int = 1024): DataFrame = {
    require(nPerGroup > 0, "nPerGroup must be positive")
    require(nBuckets > 0 && 4294967296L % nBuckets == 0,
      "nBuckets must be a power of two dividing 2^32")
    val bucketWidth = 4294967296L / nBuckets
    val keyed = docs
      .withColumn("q_key",
        pmod(col(idCol).cast("long") * lit(2971215073L), lit(4294967296L)))
      .withColumn("q_bucket", expr(s"q_key div $bucketWidth"))
    // histogram: rows per (group, key-bucket) — partial-agg'd map-side,
    // ≤ groups × nBuckets rows; its per-group cumulative is a window
    // over that tiny frame, never over data
    val hist = keyed.groupBy(col(groupCol), col("q_bucket"))
      .agg(count(lit(1)).as("q_bcount"))
      .withColumn("q_cum_before", coalesce(
        sum(col("q_bcount")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("q_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("q_bucket"), col("q_cum_before"))
    val withCum = keyed.join(broadcast(hist), Seq(groupCol, "q_bucket"))
    // candidate buckets: cum_before < nPerGroup ⇒ some row inside may
    // still rank ≤ nPerGroup; everything past them is decided wholesale
    val wb = Window.partitionBy(col(groupCol), col("q_bucket"))
      .orderBy(col("q_key"), col(idCol))
    val ranked = withCum.filter(col("q_cum_before") < nPerGroup)
      .withColumn("q_rank",
        col("q_cum_before") + row_number().over(wb).cast("long"))
      .withColumn("kept", col("q_rank") <= nPerGroup)
    val rest = withCum.filter(col("q_cum_before") >= nPerGroup)
      .withColumn("q_rank", lit(null).cast("long"))
      .withColumn("kept", lit(false))
    ranked.unionByName(rest).drop("q_key", "q_bucket", "q_cum_before")
  }

  /** Deterministic corpus shuffle + sharding — the last step before a
    * training run: break source/length ordering and write `nShards`
    * balanced shards a dataloader can stream. Each doc gets a
    * pseudo-random `shuffle_key` (odd Knuth multiplier mod 2^32 — a
    * BIJECTION, so no two docs collide and the shuffled order is a true
    * permutation) and `shard = key div (2^32/nShards)`.
    *
    * Scale: the key is uniform on [0, 2^32), so FIXED-WIDTH key ranges
    * are balanced shards by construction — no `repartitionByRange`
    * sampling pass, no sampled (nondeterministic) boundaries, and the
    * within-shard key order is the shuffled order. The plan is one hash
    * exchange on `shard` + an IN-PARTITION sort (global=false): the
    * TeraSort shape without the sampling stage. No task ever sees more
    * than |corpus|/nShards rows; nShards scales with the cluster.
    * Multiplier ⟂ split's ⟂ mixture's ⟂ quota's ⟂ upsample's.
    *
    * id < 2^31 × 668265263 < 2^63: ANSI-overflow-free. */
  def shuffleShards(docs: DataFrame, nShards: Int = 64,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0 && 4294967296L % nShards == 0,
      "nShards must be a power of two dividing 2^32")
    val width = 4294967296L / nShards
    docs
      .withColumn("shuffle_key",
        pmod(col(idCol).cast("long") * lit(668265263L), lit(4294967296L)))
      .withColumn("shard", expr(s"shuffle_key div $width"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(idCol))
  }

  /** Write the [[shuffleShards]] layout to disk — the dataloader-facing
    * deliverable: at most `nShards` parquet files, every shard wholly
    * inside one file, rows inside a file in shuffled (shard,
    * shuffle_key) order, so a training job streams files sequentially
    * and reads a true permutation with zero further shuffling. One
    * write job, no driver-side collection; each task writes its own
    * hash partition (whole shards — a shard never splits across files).
    */
  def writeShards(docs: DataFrame, path: String, nShards: Int = 64,
      idCol: String = "doc_id"): Unit =
    shuffleShards(docs, nShards, idCol)
      .write.mode("overwrite").parquet(path)

  /** Token-budget selection: keep the highest-quality documents whose
    * cumulative token count fits `budgetTokens` — greedy by
    * (quality_score DESC, doc_id) prefix, the canonical "best N tokens"
    * corpus-assembly step.
    *
    * Scale: a naive global running sum serializes into ONE window
    * partition. Instead quality is histogrammed into `nBuckets`: bucket
    * token totals + a cumulative over ≤ nBuckets rows (trivially small)
    * decide full buckets outright, and only the single boundary bucket
    * (~1/nBuckets of the corpus) runs an ordered prefix window. The
    * bucket map floor(q·nBuckets) is monotone in q, so the selected set
    * equals the global greedy prefix exactly — which is what the DuckDB
    * oracle computes with a global window. */
  def selectByBudget(docs: DataFrame, budgetTokens: Long,
      nBuckets: Int = 1000, textCol: String = "text"): DataFrame = {
    val scored = TextAnalysis.withQuality(docs, textCol)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      // a null text scores null quality; its bucket key would be null and
      // the equi-join below would silently drop it — make the behavior
      // explicit (unscorable docs are never selected) and oracle-matchable
      .filter(col("quality_score").isNotNull)
      .withColumn("qb", least(
        floor(col("quality_score") * nBuckets).cast("long"),
        lit(nBuckets - 1L)))
      .persist() // three consumers: histogram + both selection branches
    val buckets = scored.groupBy("qb").agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("cum_before", coalesce(
        sum(col("btoks")).over(Window.orderBy(col("qb").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val full = buckets
      .filter(col("cum_before") + col("btoks") <= budgetTokens)
    val boundary = buckets
      .filter(col("cum_before") < budgetTokens &&
        col("cum_before") + col("btoks") > budgetTokens)
    val fullDocs = scored.join(broadcast(full.select("qb")), Seq("qb"))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val wt = Window.partitionBy(col("qb"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryDocs = scored
      .join(broadcast(boundary.select(col("qb"), col("cum_before"))), Seq("qb"))
      .withColumn("cum", col("cum_before") + sum(col("n_tokens")).over(wt))
      .filter(col("cum") <= budgetTokens)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val out = fullDocs.unionAll(boundaryDocs).localCheckpoint()
    scored.unpersist()
    out
  }

  /** Deterministic WEIGHTED sampling without replacement, `nPerGroup`
    * docs per group with inclusion odds ∝ `weightCol` (SURVEY.md §2
    * P16d) — the importance-sampling sibling of [[quotaSample]]
    * (uniform) and [[temperatureMixture]] (rate-thinning): "keep the
    * 50 highest-value docs per source, value-weighted, reproducibly".
    * Efraimidis–Spirakis exponential sort: each row draws
    * `u ∈ (0,1)` from its Knuth hash and ranks by
    * `es_key = ln(u)/w` DESC — the top-n by that key are exactly a
    * weighted sample without replacement (A-ES, Efraimidis & Spirakis
    * 2006). Returns every row with (es_key, wr_rank, kept).
    *
    * Cross-engine determinism: u = (q+0.5)/2^32 is exact dyadic
    * arithmetic; the single `ln` agrees across libms to ~1 ulp and
    * es_key rounds at 12dp — a grain ~5 orders above the libm
    * disagreement band (§6); ties break by id.
    *
    * Scale: same two-phase decomposition as [[quotaSample]], but the
    * rank key is a double with an exponential-like shape (mass piles
    * near 0 for heavy weights), so equal-WIDTH buckets would put half
    * a group in one bucket. Buckets are equal-RATIO instead:
    * `bucket = floor(ln(−es_key)·8)` — monotone in the rank order, ~8
    * buckets per e-fold, so candidate overshoot stays a constant
    * factor regardless of the weight distribution. The tiny
    * (groups × ~270) histogram decides non-candidate buckets
    * wholesale; only ≈nPerGroup rows per group reach the exact-rank
    * window, partitioned (group, bucket). Exact by construction, not
    * ε-probabilistic.
    *
    * Multiplier 2654435761 (Knuth's 2^32/φ) ⟂ split ⟂ mixture ⟂ quota
    * ⟂ upsample ⟂ shuffle. id < 2^31 × 2654435761 < 2^63: ANSI-safe.
    *
    * The key clamps to ≤ −1e-12 (one 12dp grain below zero): when u is
    * within ~5e-13·w of 1 and w is large (default weight n_chars
    * routinely exceeds the ~233 where this first bites), round(ln(u)/w,
    * 12) lands on exactly 0 — then ln(−es_key) would be NULL/error and
    * the row would silently lose its bucket. Both engines clamp
    * identically, so bucketing and rank order stay engine-agreed. */
  def weightedSample(docs: DataFrame, nPerGroup: Int,
      weightCol: String = "n_chars", groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(nPerGroup > 0, "nPerGroup must be positive")
    val u = (pmod(col(idCol).cast("long") * lit(2654435761L),
      lit(4294967296L)).cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = docs
      .withColumn("es_key",
        least(round(log(u) / greatest(col(weightCol).cast("double"), lit(1.0)),
          12), lit(-1e-12)))
      .withColumn("es_bucket",
        floor(log(-col("es_key")) * lit(8.0)).cast("long"))
    // histogram + cumulative over (groups × buckets) rows, never data;
    // ordering: es_key DESC ⟺ −es_key ASC ⟺ es_bucket ASC
    val hist = keyed.groupBy(col(groupCol), col("es_bucket"))
      .agg(count(lit(1)).as("es_bcount"))
      .withColumn("es_cum_before", coalesce(
        sum(col("es_bcount")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("es_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("es_bucket"), col("es_cum_before"))
    val withCum = keyed.join(broadcast(hist), Seq(groupCol, "es_bucket"))
    val wb = Window.partitionBy(col(groupCol), col("es_bucket"))
      .orderBy(col("es_key").desc, col(idCol))
    val ranked = withCum.filter(col("es_cum_before") < nPerGroup)
      .withColumn("wr_rank",
        col("es_cum_before") + row_number().over(wb).cast("long"))
      .withColumn("kept", col("wr_rank") <= nPerGroup)
    val rest = withCum.filter(col("es_cum_before") >= nPerGroup)
      .withColumn("wr_rank", lit(null).cast("long"))
      .withColumn("kept", lit(false))
    ranked.unionByName(rest).drop("es_bucket", "es_cum_before")
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

  /** Exact-rank fractional bucketing WITHOUT a global sort (SURVEY.md
    * §2 P26; the CCNet head/middle/tail curriculum step over a quality
    * score like [[TextAnalysis.withReferenceXent]]'s): each row gets
    * the bucket its EXACT global rank falls into, but the rank is
    * never computed per row — a histogram of the (discrete, e.g.
    * 4dp-rounded) score decides boundary VALUES by the cumulative-count
    * rank rule (boundary_i = smallest value whose cumulative count
    * reaches ⌈fᵢ·n⌉, the [[TextAnalysis.withLengthOutliers]]
    * lowerMedian idiom), and rows bucket by comparing against the
    * boundaries. Ties share a value and therefore a bucket — the only
    * honest choice when ranks are computed from values alone, and
    * exactly what the oracle replays. NULL scores bucket as
    * 'unscored' rather than polluting the rank space.
    *
    * Scale: one partial-agg'd histogram shuffle (distinct score
    * values, NOT corpus rows) + a cum-sum window over HISTOGRAM rows
    * (bounded by score cardinality — the P8d/P21 precedent) + a
    * broadcast boundary join. No ntile, no global window over the
    * corpus. `fractions` are cumulative upper bounds in basis points,
    * e.g. Seq(("head", 3333), ("middle", 6667)) with the remainder
    * falling to `lastBucket`. */
  def bucketByRank(scored: DataFrame, valueCol: String,
      fractions: Seq[(String, Int)], lastBucket: String = "tail",
      idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty &&
      fractions.map(_._2) == fractions.map(_._2).sorted &&
      fractions.forall(f => f._2 > 0 && f._2 < 10000),
      "fractions must be increasing cumulative basis points in (0, 10000)")
    val hist = scored.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
    val n = hist.agg(sum(col("c")).as("n"))
    // cum-sum over histogram rows only — bounded by score cardinality
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(n))
    // boundary per fraction: smallest v with cum ≥ ceil(f·n / 10000)
    val bounds = fractions.map { case (name, bp) =>
      cum.filter(col("cum") * 10000 >= col("n") * bp)
        .agg(min(col("v")).as("b"))
        .select(lit(name).as("bucket_name"), col("b"))
    }.reduce(_ unionAll _)
      .agg(collect_list(struct(col("bucket_name"), col("b"))).as("bs"))
    val bucket = fractions.reverse.foldLeft(lit(lastBucket)) {
      case (rest, (name, _)) =>
        when(col(valueCol) <=
          element_at(map_from_entries(col("bs")), name), name)
          .otherwise(rest)
    }
    scored.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col(valueCol).isNull, lit("unscored")).otherwise(bucket))
      .drop("bs")
  }
}
