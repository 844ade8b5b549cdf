package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 P6).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k. The probe set is broadcast
  *    (it's small by definition); the corpus streams — one scan, no
  *    shuffle of the corpus. This is the oracle-checkable baseline and
  *    is also the right plan whenever |queries| is small.
  *  - `lshTopK`: random-hyperplane LSH. Corpus is bucketed by sign
  *    pattern (narrow, no shuffle to compute); candidates = corpus rows
  *    sharing a bucket with the query (multi-probe over all 1-bit
  *    neighbors). At 100 TB this turns the scan into a bucket-join that
  *    touches ~(probes/2^bits) of the corpus.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `normCorpus` lets a caller
    * composing several ANN paths (e.g. [[recallVsExact]]) share ONE cached
    * `Dedup.normalized(corpus)` instead of re-deriving it per path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      normCorpus: Option[DataFrame] = None): DataFrame = {
    val c = normCorpus.getOrElse(Dedup.normalized(corpus))
      .select(col("vec_id").as("neighbor_id"), col("v").as("vc"), col("nrm").as("nc"))
    val q = Dedup.normalized(queries)
      .select(col("vec_id").as("query_id"), col("v").as("vq"), col("nrm").as("nq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Hard-negative mining (SURVEY.md §2 P6g) — the contrastive-training
    * consumer of the ANN family: for each query vector, the `k` most
    * COSINE-SIMILAR vectors carrying a DIFFERENT label ("looks alike,
    * isn't") — exactly the negatives that make a contrastive/triplet
    * objective learn boundaries instead of memorizing easy negatives.
    * Same audited shape as [[bruteForceTopK]]: queries broadcast,
    * corpus streams once, label exclusion rides the join condition so
    * same-label rows never score. Exact by construction — this is the
    * oracle-able baseline; at 100 TB generate candidates with the
    * IVF/LSH legs first and re-rank the label-filtered survivors (the
    * [[ivfTopK]] composition), same as the ANN family's scale story. */
  def hardNegatives(embeddings: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    // normalized() carries every input column through, label included
    val c = Dedup.normalized(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("v").as("vc"),
        col("nrm").as("nc"), col("label").as("neighbor_label"))
    val q = Dedup.normalized(queries)
      .select(col("vec_id").as("query_id"), col("v").as("vq"),
        col("nrm").as("nq"), col("label").as("query_label"))
    val scored = c.join(broadcast(q),
        col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic random hyperplanes: `nBits` planes × `dim` components
    * in [-1, 1), seeded — same planes on every executor with zero
    * driver-side state. */
  def planes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Embedding dimensionality: the caller's `dim` when positive, else a
    * one-row probe of `v`. [[graft.functions.DotProduct]] deliberately
    * truncates to the shorter operand (ragged NULL-safety), which means
    * a plane/centroid built for the wrong dim would silently mis-project
    * every vector — so each LSH/IVF/PQ entry point resolves the dim
    * explicitly up front and guards the rows it consumes. */
  private def resolveDim(vecs: DataFrame, dim: Int): Int = {
    if (dim > 0) dim
    else {
      val r = vecs.select(size(col("v")).as("d")).limit(1).collect()
      require(r.nonEmpty, "cannot derive embedding dim from an empty corpus")
      r(0).getInt(0)
    }
  }

  /** Pass-through of `v` that raises on a row whose dimensionality
    * differs from `d` — dotp would silently truncate it instead. */
  private[graft] def vGuard(d: Int): Column =
    when(size(col("v")) === d, col("v"))
      .otherwise(expr(
        s"raise_error('embedding dim mismatch: expected $d, got ' || size(v))")
        .cast("array<double>"))

  /** Sign-pattern bucket id for an embedding (column `v`: array<double>).
    * Each plane projection is the codegen'd [[graft.functions.DotProduct]]
    * against a literal plane array — the HOF form
    * (aggregate∘zip_with) runs interpreted per plane per row
    * (SURVEY.md §4 rule 1). */
  def bucketExpr(ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(graft.functions.dotp(col("v"), array(p.map(lit).toSeq: _*)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  // -------------------------------------------------------------- IVF
  /** K-means centroids over (already normalized) vectors — Lloyd's with
    * deterministic seeded init (k smallest `xxhash64(vec_id, seed)` —
    * a distributed top-k, not a full sort). Each round: broadcast the k
    * centroids, assign by min squared distance (`‖c‖² − 2x·c`, the
    * `‖x‖²` term is constant), recompute means as 64 indexed avg
    * aggregates in ONE partial-agg'd shuffle. Plans are truncated per
    * round with localCheckpoint (see connectedComponents). Returns
    * (cell_id, cv: array<double>, cnorm2). Cells that lose all members
    * drop out (standard Lloyd's behavior).
    *
    * iters=2 default (r5): RecallProbe measures identical downstream
    * ANN recall bands for 2 vs 3 rounds at every tested SF (ivf
    * 0.50–0.66, pq 0.46–0.64), so the default quantizer spends one less
    * full training pass — at 100 TB that is a whole sampled-corpus scan.
    * Raise it for corpora where the cells keep moving. */
  def kmeansCentroids(normVecs: DataFrame, k: Int, iters: Int = 2,
      seed: Long = 42L, trainMod: Int = 4, dim: Int = 0): DataFrame = {
    // The quantizer only needs a REPRESENTATIVE sample: train Lloyd's
    // on a deterministic 1/trainMod hash-sample of the corpus and let
    // the caller assign the full corpus exactly once. At 100 TB this
    // cuts training cost by trainMod× per round with no driver-side
    // sampling state. localCheckpoint: the sample feeds every round
    // (SURVEY §4 rule 5).
    // persist (not localCheckpoint): the training cache is CORPUS-scale
    // (1/trainMod of it) and must be releasable before this returns —
    // a checkpoint's blocks outlive the operator (r6 leak-spec lesson);
    // the stats job below materializes the cache eagerly either way.
    val sampled = normVecs
      .filter(pmod(xxhash64(col("vec_id"), lit(seed + 17)), lit(trainMod)) === 0)
      .persist()
    // One job over the sample does three things: the seed-count guard
    // (a 1/trainMod sample of a small corpus can hold fewer than k
    // vectors, which would silently seed fewer/zero centroids), dim
    // resolution, and the ragged-input check — the indexed avg
    // recompute below silently yields null components for any vector
    // shorter than `dim`, so mismatches must fail loudly.
    val sStats = sampled
      .agg(count(lit(1)), min(size(col("v"))), max(size(col("v")))).head()
    val useFull = sStats.getLong(0) < k
    val train = if (useFull) normVecs.persist() else sampled
    val tStats =
      if (useFull)
        train.agg(count(lit(1)), min(size(col("v"))), max(size(col("v"))))
          .head()
      else sStats
    require(tStats.getLong(0) > 0, "kmeans needs a non-empty corpus")
    val d = if (dim > 0) dim else tStats.getInt(1)
    require(tStats.getInt(1) == d && tStats.getInt(2) == d,
      s"embedding dim mismatch: expected $d, found sizes " +
        s"[${tStats.getInt(1)}, ${tStats.getInt(2)}]")
    // Seed centroids stay LAZY (r17): they feed exactly ONE consumer —
    // round 1's broadcast — so the top-k subplan executes inside that
    // broadcast build instead of paying its own eager-checkpoint job
    // per training (ann_recall runs four trainings; guide §1.2 fixed
    // work). Each ROUND's centroids still checkpoint eagerly below —
    // that truncation is what keeps iteration plans flat.
    var cents = train
      .withColumn("h", xxhash64(col("vec_id"), lit(seed)))
      .orderBy(col("h")).limit(k)
      .select(col("vec_id"), col("v"))
      .withColumn("cell_id",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long"))
      .select(col("cell_id"), col("v").as("cv"))
      .withColumn("cnorm2", graft.functions.dotp(col("cv"), col("cv")))
    (1 to iters).foreach { it =>
      val assigned = assignCells(train, cents)
      // Mean per component as `dim` indexed avg aggregates — ONE partial-
      // agg'd shuffle per round where the posexplode → groupBy(cell,pos)
      // → collect_list+sort form took two plus a sort (r5: the Lloyd's
      // rounds are the dominant fixed cost of ann_recall's audit). The
      // indexed form needs the dimensionality up front — `dim` must
      // match the vectors or the means silently carry nulls.
      // coalesce(1): the centroid frame is k rows — its checkpoint
      // should be one task, not shuffle-partition many.
      // r17 note: chaining the rounds lazily (checkpoint only after the
      // final round) was tried and REVERTED on measurement — ann_ivfpq
      // 5.9 → 7.5-8.9 s, task count UP: the next round's broadcast
      // build re-executes the un-checkpointed aggregation subtree, so
      // the per-round checkpoint is load-bearing, not overhead.
      cents = assigned
        .groupBy(col("cell_id"))
        .agg(array((0 until d).map(i => avg(col("v").getItem(i))): _*).as("cv"))
        .withColumn("cnorm2", graft.functions.dotp(col("cv"), col("cv")))
        .coalesce(1).localCheckpoint()
    }
    // release the corpus-scale training cache; the final round's
    // checkpoint materialized through it, so nothing recomputes. The
    // k-row centroid checkpoint frames stay (plan-truncation
    // artifacts, bounded by iters·k rows — the CC-loop convention).
    sampled.unpersist()
    if (useFull) train.unpersist()
    cents
  }

  /** Nearest-cell assignment: corpus streams once past the broadcast
    * centroid table; `min_by` picks the argmin cell. */
  private[graft] def assignCells(normVecs: DataFrame, cents: DataFrame): DataFrame =
    normVecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell_id"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("v"), col("cv")))
          .as("d"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell_id"), col("d")).as("cell_id"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))

  /** IVF top-k: the k-means cells are the inverted file; each query
    * probes its `nProbe` nearest cells and rescores exactly inside them.
    * At 100 TB the corpus is assigned once (one broadcast-join scan,
    * shuffled by cell on write) and each query touches ~nProbe/k of it.
    * Approximate by construction → rows-only driver check; recall vs
    * the brute-force baseline is asserted in SimilaritySpec. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      seed: Long = 42L, normCorpus: Option[DataFrame] = None,
      dim: Int = 0): DataFrame = {
    val norm = normCorpus.getOrElse(Dedup.normalized(corpus))
    val cents = kmeansCentroids(norm, nCells, iters, seed, dim = dim)
    val assigned = assignCells(norm, cents)
      .select(col("cell_id"), col("vec_id").as("neighbor_id"),
        col("v").as("vc"), col("nrm").as("nc"))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cell_id"))
    val probes = Dedup.normalized(queries).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell_id"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("v"), col("cv")))
          .as("d"))
      .withColumn("cell_rnk", row_number().over(qw))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("cell_id"), col("vec_id").as("query_id"),
        col("v").as("vq"), col("nrm").as("nq"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  // --------------------------------------------------------------- PQ
  /** Per-subspace k-means codebooks for product quantization: the
    * dim-`64` vector splits into `m` subvectors; each subspace gets its
    * own `ks`-code codebook. All `m` subspaces train in the SAME Lloyd's
    * rounds (subspace id is just a grouping column), so the job count is
    * that of ONE k-means regardless of m. Input must carry unit vectors
    * in `v`; returns (sub, code, cv, cnorm2). */
  def pqCodebooks(unitVecs: DataFrame, m: Int = 8, ks: Int = 16,
      iters: Int = 2, seed: Long = 42L, trainMod: Int = 4,
      dim: Int = 0): DataFrame = {
    // Codebooks only need a REPRESENTATIVE sample — the same
    // deterministic 1/trainMod hash-sample kmeansCentroids uses (the
    // full corpus is still pqAssign'ed exactly once by the caller). At
    // 100 TB this divides every training round's scan by trainMod; at
    // bench SF the local timing is noise-equal, and the recall gate is
    // unmoved (r5 RecallProbe: pq 0.46–0.70 sampled vs 0.46–0.64
    // full-corpus across sf0.001/0.01/0.1 — sampling even helps at the
    // small SFs, where fewer degenerate duplicate subvectors seed the
    // codebook). Falls back to the full set when the sample can't seed
    // ks codes per subspace.
    // persist (not localCheckpoint) so the corpus-scale training caches
    // release before return — the kmeansCentroids lifecycle
    val sampled = unitVecs
      .filter(pmod(xxhash64(col("vec_id"), lit(seed + 17)), lit(trainMod)) === 0)
      .persist()
    // same fused guard job as kmeansCentroids: seed count + dim + ragged
    val sStats = sampled
      .agg(count(lit(1)), min(size(col("v"))), max(size(col("v")))).head()
    val useFull = sStats.getLong(0) < ks
    val train = if (useFull) unitVecs.persist() else sampled
    val tStats =
      if (useFull)
        train.agg(count(lit(1)), min(size(col("v"))), max(size(col("v"))))
          .head()
      else sStats
    require(tStats.getLong(0) > 0, "pq codebooks need a non-empty corpus")
    val d = if (dim > 0) dim else tStats.getInt(1)
    require(tStats.getInt(1) == d && tStats.getInt(2) == d,
      s"embedding dim mismatch: expected $d, found sizes " +
        s"[${tStats.getInt(1)}, ${tStats.getInt(2)}]")
    require(d % m == 0,
      s"PQ needs m to divide the embedding dim: dim=$d, m=$m")
    val subvecs = pqSubvectors(train, m, d).persist()
    // deterministic seeds: per subspace, the ks smallest hashes. Lazy
    // like the kmeansCentroids seeds (r17): one consumer — round 1's
    // broadcast — so no eager-checkpoint job of its own.
    var cents = subvecs
      .withColumn("h", xxhash64(col("vec_id"), col("sub"), lit(seed)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("sub")).orderBy(col("h"), col("vec_id"))))
      .filter(col("rk") <= ks)
      .select(col("sub"), col("rk").cast("long").as("code"),
        col("sv").as("cv"))
      .withColumn("cnorm2", graft.functions.dotp(col("cv"), col("cv")))
    (1 to iters).foreach { it =>
      // Same one-shuffle indexed-avg recompute as kmeansCentroids (and
      // the same caveat: `dim` must match the vectors); the m·ks
      // centroid frame checkpoints as a single task (per-round eager —
      // the lazy-chaining variant was measured slower, see
      // kmeansCentroids).
      cents = pqAssign(subvecs, cents)
        .groupBy(col("sub"), col("code"))
        .agg(array((0 until d / m).map(i => avg(col("sv").getItem(i))): _*).as("cv"))
        .withColumn("cnorm2", graft.functions.dotp(col("cv"), col("cv")))
        .coalesce(1).localCheckpoint()
    }
    // release the corpus-scale training caches (final checkpoint has
    // materialized through them); m·ks-row codebook frames stay
    subvecs.unpersist()
    sampled.unpersist()
    if (useFull) train.unpersist()
    cents
  }

  /** (vec_id, sub, sv): the m dim/m-sized slices of `v`. */
  private[graft] def pqSubvectors(vecs: DataFrame, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    vecs.select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $sub + 1, $sub))"))
      .as(Seq("sub", "sv")))
  }

  /** Nearest-code assignment per (vec, subspace): one broadcast join,
    * argmin by `‖c‖² − 2x·c`; the subvector rides along (`first`) so
    * the training loop needs no second join back to the input. */
  private[graft] def pqAssign(subvecs: DataFrame, cents: DataFrame): DataFrame =
    subvecs.join(broadcast(cents), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("sv"), col("code"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("sv"), col("cv")))
          .as("d"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), col("d")).as("code"), first(col("sv")).as("sv"))

  /** IVF-PQ-style ANN: corpus vectors L2-normalize, PQ-encode to `m`
    * codes (m bytes/vector instead of 8·dim — the 100 TB memory path:
    * a 64-dim double corpus compresses 64×), queries score by
    * asymmetric distance (ADC): per query, dot products against every
    * codebook entry form an m×ks lookup table, and a candidate's
    * approximate cosine is the sum of its m table hits — a narrow
    * broadcast join on (sub, code) + partial-agg sum; the raw corpus
    * vectors are never shuffled. The top `shortlistFactor`·k by ADC
    * are then rescored EXACTLY (output-proportional join back to the
    * corpus), the production two-stage shape.
    * Approximate by construction → rows-only driver check; recall vs
    * the brute-force baseline is asserted in SimilaritySpec. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ks: Int = 16, iters: Int = 2, shortlistFactor: Int = 5,
      seed: Long = 42L, normCorpus: Option[DataFrame] = None,
      dim: Int = 0): DataFrame = {
    val norm = normCorpus.getOrElse(Dedup.normalized(corpus))
    val unit = norm
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
    val d = resolveDim(unit, dim)
    val cents = pqCodebooks(unit, m, ks, iters, seed, dim = d)
    val codes = pqAssign(pqSubvectors(unit, m, d), cents)
      .select(col("vec_id"), col("sub"), col("code"))
    // query side guarded like lshTopK: a ragged/wrong-dim query row
    // would otherwise silently truncate in the LUT dots and the exact
    // rescore (dotp truncates to the shorter operand) — r6 advice
    val qunit = Dedup.normalized(queries)
      .withColumn("v", vGuard(d))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
    val lut = pqSubvectors(qunit, m, d)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        graft.functions.dotp(col("sv"), col("cv")).as("pdot"))
    val adc = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adc_score"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id"))
    val shortlist = adc.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val c = norm.select(col("vec_id").as("neighbor_id"),
      col("v").as("vc"), col("nrm").as("nc"))
    val q = Dedup.normalized(queries).select(col("vec_id").as("query_id"),
      vGuard(d).as("vq"), col("nrm").as("nq"))
    val scored = shortlist.join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Classic IVF-PQ — coarse inverted file + RESIDUAL product codes
    * (the IVFADC composition): one Lloyd's trains the coarse quantizer
    * over unit vectors; PQ codebooks train on coarse residuals
    * `u − c(u)`, so the m codes spend their precision on the
    * within-cell detail the coarse centroid already removed — finer
    * than flat PQ at the same m·ks budget, and the standard layout for
    * billion-vector corpora (per vector: one cell id + m codes; raw
    * vectors never shuffle into scoring).
    *
    * Scoring uses that dot products decompose over the residual:
    * q·û ≈ q·c(cell) + Σ_sub LUT[sub, code] — the residual LUT is
    * CELL-INDEPENDENT for dot-product scoring, so one m×ks table per
    * query covers every probed cell (no per-(query,cell) table
    * rebuild). Queries probe `nProbe` nearest cells; ADC runs as a
    * broadcast join over codes restricted to probed cells (~nProbe/
    * nCells of the corpus); the top shortlistFactor·k shortlist is
    * rescored exactly, output-proportional. Approximate by
    * construction → rows-only driver check + audited by ann_recall.
    *
    * Residuals are derived lazily (narrow zip_with after a broadcast
    * join); the index build recomputes them once for codebook sampling
    * and once in the scoring DAG rather than checkpointing a
    * corpus-scale residual table — at 100 TB the rebuild is a narrow
    * scan, the checkpoint would be a full materialization.
    *
    * Defaults (nProbe=6, shortlistFactor=8) from the r6 RecallProbe
    * sweep: recall 0.76/0.64/0.48 at sf0.001/0.01/0.1 — at or above
    * flat [[pqTopK]] (0.70/0.56/0.46) at every SF, where the initial
    * (4, 5) config ceilinged at IVF's 4-probe recall and dropped to
    * 0.28 at sf0.1. ivfpq recall is bounded above by the IVF probe
    * recall at the same nProbe — raise nProbe, not m, when the gap to
    * [[ivfTopK]] is the complaint. */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 6, m: Int = 8, ks: Int = 16,
      iters: Int = 2, shortlistFactor: Int = 8, seed: Long = 42L,
      normCorpus: Option[DataFrame] = None, dim: Int = 0): DataFrame = {
    val norm = normCorpus.getOrElse(Dedup.normalized(corpus))
    val unit = norm
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
      .withColumn("nrm", lit(1.0))
    val d = resolveDim(unit, dim)
    require(d % m == 0, s"PQ needs m to divide the embedding dim: dim=$d, m=$m")
    val cents = kmeansCentroids(unit, nCells, iters, seed, dim = d)
    val resid = assignCells(unit, cents)
      .join(broadcast(cents.select(col("cell_id"), col("cv"))), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        expr("zip_with(v, cv, (x, c) -> x - c)").as("v"))
    val cbs = pqCodebooks(resid.select(col("vec_id"), col("v")), m, ks,
      iters, seed, dim = d)
    // encode: nearest residual code per (vec, subspace), cell_id rides
    // along so ADC can restrict to probed cells without a second join
    val sub = d / m
    val subv = resid.select(col("vec_id"), col("cell_id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $sub + 1, $sub))"))
      .as(Seq("sub", "sv")))
    val codes = subv.join(broadcast(cbs), Seq("sub"))
      .select(col("vec_id"), col("cell_id"), col("sub"), col("code"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("sv"), col("cv")))
          .as("dd"))
      .groupBy(col("vec_id"), col("cell_id"), col("sub"))
      .agg(min_by(col("code"), col("dd")).as("code"))
    // query side guarded like lshTopK (r6 advice): wrong-dim query rows
    // raise instead of silently truncating in probes/LUT/rescore
    val qn = Dedup.normalized(queries).withColumn("v", vGuard(d))
    val qunit = qn
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cell_id"))
    val probes = qunit.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell_id"),
        graft.functions.dotp(col("v"), col("cv")).as("qc"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("v"), col("cv")))
          .as("d"))
      .withColumn("cell_rnk", row_number().over(qw))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cell_id"), col("qc"))
    val lut = pqSubvectors(qunit, m, d)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cbs), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        graft.functions.dotp(col("sv"), col("cv")).as("pdot"))
    val adcScored = codes.join(broadcast(probes), Seq("cell_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((first(col("qc")) + sum(col("pdot"))).as("adc_score"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id"))
    val shortlist = adcScored.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val c = norm.select(col("vec_id").as("neighbor_id"),
      col("v").as("vc"), col("nrm").as("nc"))
    val q = qn.select(col("vec_id").as("query_id"),
      col("v").as("vq"), col("nrm").as("nq"))
    val scored = shortlist.join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** SemDeDup-style semantic near-dup pairs (SURVEY.md §2 P5c): cluster
    * embeddings with the IVF coarse quantizer and compare pairs ONLY
    * within a cluster — the published recipe for semantic dedup at
    * corpus scale (cluster first, pairwise inside clusters), and the
    * k-means sibling of [[cosinePairsLsh]]'s hyperplane bucketing.
    * Emits (a_id, b_id, cos_sim) for within-cluster pairs with cosine
    * ≥ threshold; every emitted pair is exactly rescored, so precision
    * vs the all-pairs baseline is 1 by construction (the driver gate
    * PROVES it cross-engine via n_extra = 0) and only recall depends on
    * the clustering. Feed the pairs to [[Dedup.keepAfterNearDedup]]
    * for the keep decision.
    *
    * Cost at 100 TB: one quantizer training pass (sampled), one assign
    * pass, then a self-join per cell — O(Σ cell²) instead of O(N²),
    * with nCells scaling the bound. The assigned table is persisted
    * across the self-join's two sides and released after the (small)
    * pair set checkpoints, the cosinePairsLsh lifecycle. */
  def semDedupPairs(embeddings: DataFrame, threshold: Double,
      nCells: Int = 16, iters: Int = 2, seed: Long = 42L,
      dim: Int = 0): DataFrame = {
    val norm = Dedup.normalized(embeddings)
    val cents = kmeansCentroids(norm, nCells, iters, seed, dim = dim)
    val assigned = assignCells(norm, cents)
      .select(col("cell_id"), col("vec_id"), col("v"), col("nrm"))
      .persist()
    val a = assigned.select(col("cell_id"), col("vec_id").as("a_id"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cell_id"), col("vec_id").as("b_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val out = a.join(b, Seq("cell_id"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(graft.functions.dotp(col("va"), col("vb"))
          / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .localCheckpoint()
    assigned.unpersist()
    out
  }

  /** Recall audit of every approximate ANN path against the exact
    * brute-force top-k (SURVEY.md §2 P6/P6d `ann_recall`). Emits one row
    * per method: `(method, n_queries, recall)` where `recall` =
    * |approx∩exact| / |exact| over all probes. The normalized corpus is
    * derived ONCE and shared by all four paths (exact + lsh/ivf/pq each
    * re-scan it several times); the exact set is likewise computed once.
    * Each approximate set joins against the exact set (left join + hit
    * flag → one partial-agg count, no collect). The caller turns `recall`
    * into a thresholded boolean for cross-engine verification (the raw
    * ratio is deterministic given the fixed seeds, but only the threshold
    * claim is engine-independent).
    *
    * EAGER: the per-method result is localCheckpoint'd so both caches can
    * be released before returning — a library operator must not leak
    * persisted state past its result (SURVEY §5).
    *
    * `methods` selects which approximate legs to audit (default all
    * four): the per-leg driver gates (ann_ivf/ann_lsh/ann_pq/ann_ivfpq)
    * each audit ONE path so a regression pinpoints its method, while
    * ann_recall keeps the combined four-row audit. */
  def recallVsExact(corpus: DataFrame, queries: DataFrame, k: Int,
      methods: Seq[String] = Seq("ivf", "ivfpq", "lsh", "pq")): DataFrame = {
    require(methods.nonEmpty, "recallVsExact needs at least one method")
    val norm = Dedup.normalized(corpus).persist()
    val exact = bruteForceTopK(corpus, queries, k, Some(norm))
      .select(col("query_id"), col("neighbor_id")).persist()
    def row(name: String, approx: DataFrame): DataFrame =
      exact.join(
          approx.select(col("query_id"), col("neighbor_id"),
            lit(1L).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(
          count_distinct(col("query_id")).as("n_queries"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
        .select(lit(name).as("method"), col("n_queries"), col("recall"))
    // resolve the dim once for all approximate paths (each would
    // otherwise run its own one-row probe against the shared corpus)
    val d = resolveDim(norm, 0)
    def leg(name: String): DataFrame = name match {
      case "ivf" => ivfTopK(corpus, queries, k, normCorpus = Some(norm), dim = d)
      case "ivfpq" => ivfpqTopK(corpus, queries, k, normCorpus = Some(norm), dim = d)
      case "lsh" => lshTopK(corpus, queries, k, normCorpus = Some(norm), dim = d)
      case "pq" => pqTopK(corpus, queries, k, normCorpus = Some(norm), dim = d)
      case other => throw new IllegalArgumentException(
        s"recallVsExact: unknown method '$other'")
    }
    // The legs are INDEPENDENT until the final union (each trains its
    // own quantizer with its own seed lineage), but building them
    // sequentially serializes ~3 small training jobs per leg on the
    // driver — at any scale the cluster sits idle in every job's tail
    // (guide §2.6: overlap independent jobs; Spark's scheduler runs
    // them concurrently, actions were only sequential because this
    // code called them sequentially). Construct the legs concurrently
    // (graft.Par); results are unchanged — every leg is seeded and
    // deterministic, and the union keeps the caller's method order.
    val out = graft.Par
      .frames(methods.map(m => () => row(m, leg(m))): _*)
      .reduce(_.unionAll(_))
      .localCheckpoint()
    exact.unpersist()
    norm.unpersist()
    out
  }

  /** LSH-bucketed cosine near-dup pairs — the scale path for
    * [[Dedup.cosinePairs]] (SURVEY.md §2 P5), same output contract:
    * (a_id, b_id, cos_sim) for pairs with cosine ≥ `threshold`.
    *
    * Candidates are generated by `nTables` independent random-hyperplane
    * tables of `nBits` sign bits (fused single-long key, hot-bucket cap —
    * the simhashCandidates shape), then rescored EXACTLY with the
    * codegen'd dot product, so every emitted pair is a true ≥-threshold
    * pair with the same score the all-pairs baseline computes: precision
    * is 1 by construction and the emitted set is a SUBSET of
    * [[Dedup.cosinePairs]]'s. Recall follows 1−(1−p^b)^L with
    * p = 1−θ/π: at production near-dup thresholds (≥0.9, p ≥ 0.856) a
    * few tables recover ~everything, while moderate-similarity mining
    * (θ near 60°) needs L to grow — the driver gate measures the ratio
    * on this corpus rather than assuming it.
    *
    * Cost at 100 TB: L bucket rows per vector, candidate join bounded by
    * `maxBucketDf`, rescoring output-proportional — the corpus vector
    * arrays are joined back only for distinct candidate ids, never
    * shuffled with the buckets (the r5 minhashPairs lesson). */
  def cosinePairsLsh(embeddings: DataFrame, threshold: Double,
      nBits: Int = 8, nTables: Int = 24, maxBucketDf: Int = 1000,
      seed: Long = 42L, dim: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = Dedup.normalized(embeddings).persist()
    // dim drives the plane table — a wrong value silently zips every
    // projection short (dotp truncates), so it's probed from the data
    // unless given, and every consumed row is guarded
    val d = resolveDim(e, dim)
    // The planes are DATA (a broadcast (tbl, bit, plane) table), not
    // nTables·nBits inlined dotp expressions: the expression form stops
    // compiling past ~64 planes (janino method-size limit → interpreted
    // fallback, observed r5) and hard-caps the table count. One
    // broadcast join + codegen'd dotp + partial-agg bit-OR computes all
    // buckets in a single corpus pass, and nTables scales as rows.
    val planesDf = (0 until nTables).flatMap { t =>
      planes(nBits, d, seed + 101 * t).zipWithIndex.map {
        case (p, b) => (t.toLong, b, p.toSeq)
      }
    }.toDF("tbl", "bit", "plane")
    val bucketed = e.select(col("vec_id"), vGuard(d).as("v"))
      .crossJoin(broadcast(planesDf))
      .select(col("vec_id"), col("tbl"),
        when(graft.functions.dotp(col("v"), col("plane")) > 0,
          expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(lit(0L))
          .as("bit_val"))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(sum(col("bit_val")).as("bucket"))
      .select((col("tbl") * lit(1L << nBits) + col("bucket")).as("ck"),
        col("vec_id"))
      .persist()
    val bucketSizes = bucketed.groupBy("ck")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucketDf))
    val inBuckets = bucketed.join(bucketSizes, Seq("ck"))
    val cand = inBuckets.select(col("ck"), col("vec_id").as("a_id"))
      .join(inBuckets.select(col("ck"), col("vec_id").as("b_id")), Seq("ck"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val va = e.select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
    val vb = e.select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
    val out = cand.join(va, Seq("a_id")).join(vb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(graft.functions.dotp(col("va"), col("vb"))
          / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .localCheckpoint()
    e.unpersist()
    bucketed.unpersist()
    out
  }

  /** LSH top-k: exact rescoring over bucket-colocated candidates.
    *
    * OR-amplified construction (round 4): `nTables` independent hash
    * tables of `nBits` sign bits each, plus 1-bit-flip multi-probe on
    * the query side. A single b-bit table recalls a θ-angle neighbor
    * with probability (1−θ/π)^b — near zero for the moderately-similar
    * neighbors that dominate a real top-10 — while L independent tables
    * recall with 1−(1−p)^L. Corpus cost is L bucket rows per vector;
    * recall/cost tunes via (nBits, nTables).
    *
    * Defaults from the r5 LshTune sweep over (nTables, nBits) ∈
    * {(4,8),(6,8),(8,8),(8,10)} × sf{0.001,0.01,0.1}: (4,8) is the
    * cheapest config holding measured recall ≥ 0.4 at every SF
    * (0.400/0.400/0.420 in 1.5–1.8s, vs 0.48–0.54 in 2.3–3.0s for
    * (6,8)); (8,10) LOSES recall (0.26–0.38) because 10-bit buckets
    * thin out candidates faster than two extra tables replace them. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, nTables: Int = 4, seed: Long = 42L,
      normCorpus: Option[DataFrame] = None, dim: Int = 0): DataFrame = {
    val norm = normCorpus.getOrElse(Dedup.normalized(corpus))
    val d = resolveDim(norm, dim)
    val allPlanes = (0 until nTables).map(t => planes(nBits, d, seed + 101 * t))
    val c = norm
      .withColumn("v", vGuard(d))
      .withColumn("tb", explode(array(allPlanes.zipWithIndex.map {
        case (ps, t) => struct(lit(t).as("tbl"), bucketExpr(ps).as("bucket"))
      }: _*)))
      .select(col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"),
        col("vec_id").as("neighbor_id"), col("v").as("vc"), col("nrm").as("nc"))
    // Base bucket exploded FIRST, then the 1-bit probes XOR the exploded
    // VALUE: each table's nBits dot products are computed once, not once
    // per probe. The previous probe-expands-the-expression form carried
    // nTables·(nBits+1)·nBits dotp literals and overflowed janino's
    // 64 KB method limit at 8 tables (interpreted fallback + a failed
    // compile per run — pure overhead on a 5-row side).
    val q = Dedup.normalized(queries)
      .withColumn("v", vGuard(d))
      .withColumn("tb", explode(array(allPlanes.zipWithIndex.map {
        case (ps, t) => struct(lit(t).as("tbl"), bucketExpr(ps).as("base"))
      }: _*)))
      .withColumn("probe", explode(array(
        (lit(0L) +: (0 until nBits).map(i => lit(1L << i))): _*)))
      .select(col("tb.tbl").as("tbl"),
        col("tb.base").bitwiseXOR(col("probe")).as("bucket"),
        col("vec_id").as("query_id"), col("v").as("vq"), col("nrm").as("nq"))
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Semantic decontamination (SURVEY.md §2 P14b): flag corpus vectors
    * whose best cosine against a benchmark/eval embedding set reaches
    * `threshold` — the embedding-space twin of the shingle-overlap
    * [[graft.pipeline.Packing.decontaminate]], catching paraphrased
    * eval leakage that token n-grams miss. Returns one row per corpus
    * vector: (vec_id, best_bench_id, best_cos, contaminated), with
    * best_bench_id the LOWEST benchmark id among cosine ties (cos is
    * rounded at 6dp BEFORE the argmax, so tie behavior is engine-
    * reproducible — the §6 round-early discipline).
    *
    * Scale: the benchmark side is small by definition (an eval set) and
    * broadcasts; the corpus streams ONCE through the broadcast join and
    * the per-vector argmax partial-aggregates map-side (a single
    * struct-max), so the only shuffle is |corpus| pre-aggregated rows.
    * For benchmark sets too big to broadcast, compose [[ivfTopK]]'s
    * bucketing instead of this exact form. */
  def semanticDecontam(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.44): DataFrame = {
    val c = Dedup.normalized(corpus)
      .select(col("vec_id"), col("v").as("vc"), col("nrm").as("nc"))
    val b = Dedup.normalized(benchmark)
      .select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
    c.join(broadcast(b))
      .select(col("vec_id"), col("b_id"),
        round(graft.functions.dotp(col("vc"), col("vb"))
          / (col("nc") * col("nb")), 6).as("cos_sim"))
      // max over struct(cos, −id): best cosine, ties → lowest bench id
      .groupBy("vec_id")
      .agg(max(struct(col("cos_sim"), (-col("b_id")).as("nid"))).as("m"))
      .select(col("vec_id"), (-col("m.nid")).as("best_bench_id"),
        col("m.cos_sim").as("best_cos"),
        (col("m.cos_sim") >= threshold).as("contaminated"))
  }

  // ------------------------------------------------- PCA (power iter)
  /** Top principal component of an embedding column via power
    * iteration over the DISTRIIBUTED centered Gram matrix (SURVEY.md §2
    * P29) — the embedding-space profiler: the dominant direction, its
    * eigenvalue, and the explained-variance share (how anisotropic is
    * this embedding space; the whitening/debiasing pre-step every
    * embedding pipeline eventually wants).
    *
    * Split exactly like [[kmeansCentroids]]: the O(n·d²) part — Gram
    * accumulation — is distributed (per-vector centered outer products,
    * partial-agg'd into d² cells; only d² rows shuffle), and the O(d²)
    * part — `iters` power-iteration steps — runs on the collected
    * d×d model (the bounded centroid-collect precedent).
    *
    * Cross-engine exactness (the oracle replays EVERY step): values
    * round 6dp into DECIMAL, the mean subtracts as DECIMAL, Gram terms
    * are DECIMAL×DECIMAL (exact, NO per-term rounding — the r9 DSIR
    * lesson: rounding doubles near grid boundaries diverges across
    * engines), matrix-vector products in the iteration are
    * DECIMAL(28,12)×DECIMAL(10,8) = exact DECIMAL(38,20) sums, norms
    * and the Rayleigh quotient are IEEE folds in EXPLICIT index order
    * (replayed with an ordered list_reduce), and the only per-round
    * rounding is the 8dp normalize of d components — a 1e-8 grid,
    * where a shortest-repr boundary collision is ~1e-8-probable per
    * op. Deterministic all-ones/√d init. */
  private def pcaRound8(x: Double): java.math.BigDecimal =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).bigDecimal
  private def pcaRound6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Distributed centered-Gram build + model collect (shared by the
    * PCA family; arithmetic contract documented on
    * [[pcaTopComponent]]). */
  /** Exact centered Gram Σ(x−μ)(x−μ)ᵀ on the 6dp decimal grid. Two
    * narrow passes (r13 — replaced the cent⨝cent self-join the r12
    * verdict flagged): (1) posexplode → per-dimension means (d rows
    * collected, the bounded model collect); (2) ONE pass over the
    * vectors through [[graft.functions.GramAgg]] — each row is centered
    * in micro-units (·10⁶, the exact DECIMAL(18,6) integer grid) by a
    * zip_with against the broadcast-literal μ array, and the aggregate
    * accumulates the d(d+1)/2 upper-triangle products in exact 128-bit
    * partial sums. The shuffle is partitions·d² cells instead of the
    * old plan's N·d element rows, and nothing streams N·d² products.
    * Bit-parity: the result is the same exact integer sum scaled by
    * 10⁻¹², so every downstream eigen value/hash is unchanged
    * (SimilaritySpec pins parity against the self-join oracle). */
  /** The one-pass Gram frame: centered micro-unit vectors through the
    * [[graft.functions.GramAgg]] global aggregate. Package-visible so
    * SimilaritySpec can plan-assert the absence of any join and pin
    * bit-parity against an inline self-join oracle. */
  private[graft] def gramFrame(embeddings: DataFrame, vecCol: String,
      d: Int, muMicroLit: org.apache.spark.sql.Column): DataFrame = {
    // centered micro-unit vector: cast→decimal(18,6) is the SAME 6dp
    // quantization as the μ pass; ·10⁶ in exact decimal, then long
    val cent = expr(
      s"transform($vecCol, x -> cast(cast(round(cast(x as double), 6) " +
        "as decimal(18,6)) * 1000000 as long))")
    embeddings
      .select(zip_with(cent, muMicroLit, (x, m) => x - m).as("c"))
      .agg(graft.functions.gramUpperTriangle(col("c"), d).as("g"))
  }

  private def centeredGram(embeddings: DataFrame,
      vecCol: String): (Int, Array[Array[java.math.BigDecimal]]) = {
    val muRows = embeddings
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("i"),
        round(col("x").cast("double"), 6).cast("decimal(18,6)").as("x6"))
      .groupBy(col("i"))
      .agg(sum(col("x6")).cast("decimal(38,6)").as("sx"),
        count(lit(1)).as("n"))
      .select(col("i"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .as("mu"))
      .collect() // d rows — the bounded model collect
    val d = muRows.length
    require(d > 0, "pca needs a non-empty corpus")
    // μ in micro-units as a plan LITERAL (d longs — broadcast with the
    // task binary, no join): mu has ≤ 6dp so the rounding is exact
    val muMicro = new Array[Long](d)
    muRows.foreach(r => muMicro(r.getInt(0)) = math.round(r.getDouble(1) * 1e6))
    val muLit = lit(muMicro)
    val packed = gramFrame(embeddings, vecCol, d, muLit)
      .head().getSeq[java.math.BigDecimal](0)
    val G = Array.ofDim[java.math.BigDecimal](d, d)
    var cell = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = packed(cell).setScale(12)
        G(i)(j) = v
        G(j)(i) = v
        cell += 1
        j += 1
      }
      i += 1
    }
    (d, G)
  }

  /** `iters` power-iteration rounds on the collected Gram; returns the
    * 8dp unit iterate and its 6dp Rayleigh quotient. */
  private def powerIterate(G: Array[Array[java.math.BigDecimal]],
      d: Int, iters: Int): (Array[java.math.BigDecimal], Double) = {
    // init: uniform direction, normalized and 8dp-quantized like every
    // later iterate (1/√d is exact at d a power of 4, approximate else)
    var v: Array[java.math.BigDecimal] =
      Array.fill(d)(pcaRound8(1.0 / math.sqrt(d.toDouble)))
    (1 to iters).foreach { _ =>
      val w = (0 until d).map { i =>
        (0 until d).foldLeft(java.math.BigDecimal.ZERO) { (acc, j) =>
          acc.add(G(i)(j).multiply(v(j))) // exact decimal, no rounding
        }
      }
      val wD = w.map(_.doubleValue).toArray
      val n2 = wD.foldLeft(0.0)((a, x) => a + x * x) // ordered IEEE fold
      val norm = math.sqrt(n2)
      // zero-variance corpus: Gv = 0 forever — stay on the uniform
      // init instead of dividing 0/0 (λ = 0, share NULL downstream)
      if (norm > 0) v = wD.map(x => pcaRound8(x / norm))
    }
    // Rayleigh quotient with the final iterate
    val wf = (0 until d).map { i =>
      (0 until d).foldLeft(java.math.BigDecimal.ZERO) { (acc, j) =>
        acc.add(G(i)(j).multiply(v(j)))
      }.doubleValue
    }
    val lam = pcaRound6(v.map(_.doubleValue).zip(wf)
      .foldLeft(0.0)((a, p) => a + p._1 * p._2))
    (v, lam)
  }

  def pcaTopComponent(embeddings: DataFrame, iters: Int = 10,
      vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (d, g) = centeredGram(embeddings, vecCol)
    val (v, lam) = powerIterate(g, d, iters)
    val trace = (0 until d).foldLeft(java.math.BigDecimal.ZERO) {
      (acc, i) => acc.add(g(i)(i))
    }.doubleValue
    val explained =
      if (trace > 0) Some(pcaRound6(lam / trace)) else None
    (0 until d).map(i => (i, v(i).doubleValue, lam, explained))
      .toDF("i", "loading", "eigenvalue", "explained_ratio")
  }

  /** Top `nComponents` principal components by DEFLATION (SURVEY.md §2
    * P29c): extract a component with [[pcaTopComponent]]'s exact
    * power iteration, subtract its rank-1 contribution
    * G ← G − λ·vvᵀ, and iterate on the remainder. The deflated Gram
    * re-quantizes to the same DECIMAL(28,12) grid each time — an
    * EXACT decimal operation both engines replay identically (λ is
    * the 6dp quotient, v the 8dp iterate, so λ·vᵢ·vⱼ is an exact
    * scale-22 decimal before the 12dp re-round). Explained shares all
    * divide by the ORIGINAL trace. One distributed Gram build serves
    * every component — deflation is model-side arithmetic. */
  def pcaComponents(embeddings: DataFrame, nComponents: Int = 2,
      iters: Int = 10, vecCol: String = "embedding"): DataFrame = {
    require(nComponents >= 1 && nComponents <= 8,
      "nComponents must be in [1, 8]")
    require(iters >= 1, "need at least one iteration")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (d, g0) = centeredGram(embeddings, vecCol)
    val trace = (0 until d).foldLeft(java.math.BigDecimal.ZERO) {
      (acc, i) => acc.add(g0(i)(i))
    }.doubleValue
    var g = g0
    val out = (1 to nComponents).flatMap { c =>
      val (v, lam) = powerIterate(g, d, iters)
      val explained =
        if (trace > 0) Some(pcaRound6(lam / trace)) else None
      val lam6 = java.math.BigDecimal.valueOf(lam)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      g = Array.tabulate(d, d) { (i, j) =>
        g(i)(j).subtract(lam6.multiply(v(i)).multiply(v(j)))
          .setScale(12, java.math.RoundingMode.HALF_UP)
      }
      (0 until d).map(i => (c, i, v(i).doubleValue, lam, explained))
    }
    out.toDF("component", "i", "loading", "eigenvalue",
      "explained_ratio")
  }

  /** Project every embedding onto the corpus's top principal component
    * (SURVEY.md §2 P29b) — the APPLY half of [[pcaTopComponent]], and
    * the distributed half that actually matters at 100 TB: the model
    * is d numbers, the transform touches every vector. Emits the
    * scalar coordinate along the component, the squared residual off
    * it, and the all-but-the-top debiased share — the
    * Mu & Viswanath (2018) post-processing every embedding pipeline
    * eventually reaches for, and the 1-D coordinate is the cheapest
    * possible semantic sort key for curriculum/sharding.
    *
    * Exactness: the component arrives as 8dp loadings (exact DECIMAL
    * after [[pcaTopComponent]]'s contract), centered values are the
    * same DECIMAL(19,6) the Gram used, the projection is an exact
    * DECIMAL dot product (one cast + 6dp round at the end), and the
    * residual combines ‖c‖² (exact DECIMAL) with the ROUNDED
    * projection so both engines square the same double; clamped at 0
    * (the rounded cross-term can push an exact 0 a hair negative).
    *
    * Scale: the mean and component are d-number broadcasts; the
    * corpus is ONE narrow pass — no shuffle at all (the per-vector
    * fold is a HOF over the zipped arrays). */
  def projectOntoTopComponent(embeddings: DataFrame, iters: Int = 10,
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val comp = pcaTopComponent(embeddings, iters, vecCol)
      .orderBy(col("i"))
      .select(col("loading")).collect().map(_.getDouble(0))
    val d = comp.length
    val ex = embeddings.select(col("vec_id"),
      posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x6", round(col("x").cast("double"), 6)
        .cast("decimal(18,6)"))
    val muRows = ex.groupBy(col("i"))
      .agg(sum(col("x6")).cast("decimal(38,6)").as("sx"),
        count(lit(1)).as("n"))
      .select(col("i"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .as("mu"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    import spark.implicits._
    // tight types: the default BigDecimal encoder is (38,18), and a
    // (38,18)×(38,18) product overflows precision so Spark would
    // TRUNCATE scale — a real 1e-6 divergence the oracle caught
    val model = broadcast((0 until d).map(i =>
        (i, new java.math.BigDecimal(muRows(i)).setScale(6,
          java.math.RoundingMode.HALF_UP),
          new java.math.BigDecimal(comp(i)).setScale(8,
            java.math.RoundingMode.HALF_UP)))
      .toDF("i", "mu6", "v8")
      .select(col("i"), col("mu6").cast("decimal(18,6)").as("mu6"),
        col("v8").cast("decimal(10,8)").as("v8")))
    ex.join(model, Seq("i"))
      .withColumn("_c", col("x6") - col("mu6"))
      .groupBy(col("vec_id"))
      .agg(
        sum((col("_c") * col("v8")).cast("decimal(38,14)"))
          .cast("decimal(38,14)").as("_p"),
        sum((col("_c") * col("_c")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("_n2"))
      .select(col("vec_id"),
        round(col("_p").cast("double"), 6).as("coord"),
        greatest(lit(0.0),
          round(col("_n2").cast("double")
            - round(col("_p").cast("double"), 6)
              * round(col("_p").cast("double"), 6), 6)).as("residual2"))
  }
}
