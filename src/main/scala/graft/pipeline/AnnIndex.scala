package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTENT ANN index (SURVEY.md §2 P6h) — the vector twin of the
  * P2c stored minhash band index, and the embedding-side realization
  * of the reference's import-once-query-many storage contract
  * (python/pyhdk/hdk.py:2313: data imports once, queries hit the
  * stored representation). [[Similarity.ivfTopK]] retrains its coarse
  * quantizer on every call — right for a one-shot audit, wrong for a
  * production serving path where the corpus changes slowly and
  * queries arrive constantly. This module splits the lifecycle:
  *
  *  - [[buildIvf]] trains ONCE (the same [[Similarity.kmeansCentroids]]
  *    construction — identical seeds/arithmetic, so stored ≡ fresh is
  *    spec-assertable) and persists two parquet tables under `root`:
  *    `centroids` (cell_id, cv, cnorm2 — k rows) and `postings`
  *    (vec_id, v, nrm), PARTITIONED BY cell_id — the inverted file IS
  *    the parquet layout, so a probe of nProbe cells reads nProbe/k of
  *    the stored bytes (partition pruning, not a full scan + filter).
  *  - [[ivfQuery]] reads the stored tables and NEVER trains: probe
  *    cells from the broadcast centroid table, score exactly inside
  *    probed postings partitions, top-k per query. Nothing in its plan
  *    is Lloyd's — the bench line for ann_ivf_stored is pure query
  *    cost.
  *  - [[addIvfBatch]] appends a new batch to the postings against the
  *    STORED centroids (assign-only, no retraining — the incremental
  *    contract: daily adds cost one narrow batch scan + an append;
  *    periodic re-training is an explicit rebuild, not a side effect).
  *  - [[buildIvfPq]] / [[ivfpqQuery]]: the same lifecycle split for
  *    the full IVF-PQ layout (coarse cells + residual codebooks +
  *    m-byte codes partitioned by cell) — the billion-vector shape
  *    where ADC scans stored CODES, never raw vectors, and only the
  *    shortlist joins back to postings for the exact rescore.
  *
  * At 100 TB: centroids are k rows (broadcast); postings are the
  * corpus laid out by cell — the one big table, written once, pruned
  * per query batch; a query batch shuffles nothing corpus-sized (the
  * probe table is queries×nProbe rows, broadcast into the postings
  * scan).
  */
object AnnIndex {

  private def cents(root: String) = s"$root/centroids"
  private def posts(root: String) = s"$root/postings"

  /** Train the coarse quantizer on `corpus` and persist the index
    * under `root` (overwrites). Same defaults and deterministic seeds
    * as [[Similarity.ivfTopK]]. */
  def buildIvf(corpus: DataFrame, root: String, nCells: Int = 16,
      iters: Int = 2, seed: Long = 42L, dim: Int = 0): Unit = {
    val norm = Dedup.normalized(corpus).persist()
    val c = Similarity.kmeansCentroids(norm, nCells, iters, seed, dim = dim)
    c.write.mode("overwrite").parquet(cents(root))
    // assign against the WRITTEN table (not the in-memory frame): the
    // stored centroids are the single source of truth every later
    // assignment (addIvfBatch) uses, so a write-time precision issue
    // would surface here, not in production
    val stored = corpus.sparkSession.read.parquet(cents(root))
    Similarity.assignCells(norm, stored)
      .select(col("cell_id"), col("vec_id"), col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(posts(root))
    norm.unpersist()
  }

  /** Assign `batch` to the STORED centroids and append its postings —
    * no retraining. The batch must carry the index's embedding dim
    * (checked in one batch-scan aggregate: a short vector would
    * silently truncate in the dot products).
    *
    * IO10 wiring (r11): every append lands ≥1 small file per touched
    * cell partition, so after N daily adds a probe pays N footer reads
    * per pruned cell — the add path therefore finishes with
    * [[graft.sources.Layout.compactPartitions]] over the postings,
    * rewriting only cells past `maxFilesPerCell` (free when nothing to
    * do; values untouched, so stored ≡ fresh equality is preserved).
    * Pass `maxFilesPerCell = Int.MaxValue` to defer maintenance to an
    * explicit [[compactPostings]] call. */
  def addIvfBatch(batch: DataFrame, root: String,
      maxFilesPerCell: Int = 8): Unit = {
    val spark = batch.sparkSession
    val stored = spark.read.parquet(cents(root))
    val d = stored.select(size(col("cv"))).head().getInt(0)
    val norm = Dedup.normalized(batch)
    val sizes = norm.agg(min(size(col("v"))), max(size(col("v")))).head()
    require(sizes.isNullAt(0) || (sizes.getInt(0) == d && sizes.getInt(1) == d),
      s"batch embedding dim must match the stored index ($d), found " +
        s"[${sizes.getInt(0)}, ${sizes.getInt(1)}]")
    Similarity.assignCells(norm, stored)
      .select(col("cell_id"), col("vec_id"), col("v"), col("nrm"))
      .write.mode("append").partitionBy("cell_id").parquet(posts(root))
    compactPostings(spark, root, maxFilesPerCell)
  }

  /** Explicit IO10 maintenance over the stored postings: compact every
    * cell partition holding more than `maxFilesPerCell` parquet files.
    * Returns the number of cells rewritten (0 = already at fixpoint). */
  def compactPostings(spark: SparkSession, root: String,
      maxFilesPerCell: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Int =
    graft.sources.Layout.compactPartitions(spark, posts(root),
      "cell_id=", maxFilesPerCell, targetBytes)

  private def cbsPath(root: String) = s"$root/codebooks"
  private def codesPath(root: String) = s"$root/codes"

  /** Train + persist the full IVF-PQ layout (the billion-vector
    * production shape): `centroids` (coarse cells), `codebooks`
    * (m·ks residual codes), `codes` (vec_id → cell + m codes,
    * PARTITIONED BY cell_id — m bytes of index per vector is what ADC
    * scans), and the same raw `postings` as [[buildIvf]] for the
    * output-proportional exact rescore. Identical construction/seeds
    * to [[Similarity.ivfpqTopK]] so stored ≡ fresh is exact. */
  def buildIvfPq(corpus: DataFrame, root: String, nCells: Int = 16,
      m: Int = 8, ks: Int = 16, iters: Int = 2, seed: Long = 42L,
      dim: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val norm = Dedup.normalized(corpus).persist()
    val unit = norm
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
      .withColumn("nrm", lit(1.0))
    val d =
      if (dim > 0) dim else unit.select(size(col("v"))).head().getInt(0)
    require(d % m == 0, s"PQ needs m to divide the embedding dim: dim=$d, m=$m")
    val c = Similarity.kmeansCentroids(unit, nCells, iters, seed, dim = d)
    c.write.mode("overwrite").parquet(cents(root))
    val storedC = spark.read.parquet(cents(root))
    val resid = Similarity.assignCells(unit, storedC)
      .join(broadcast(storedC.select(col("cell_id"), col("cv"))),
        Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        expr("zip_with(v, cv, (x, c) -> x - c)").as("v"))
      .persist()
    val cbs = Similarity.pqCodebooks(
      resid.select(col("vec_id"), col("v")), m, ks, iters, seed, dim = d)
    cbs.write.mode("overwrite").parquet(cbsPath(root))
    val storedCbs = spark.read.parquet(cbsPath(root))
    val sub = d / m
    resid.select(col("vec_id"), col("cell_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $sub + 1, $sub))"))
        .as(Seq("sub", "sv")))
      .join(broadcast(storedCbs), Seq("sub"))
      .select(col("vec_id"), col("cell_id"), col("sub"), col("code"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("sv"), col("cv")))
          .as("dd"))
      .groupBy(col("vec_id"), col("cell_id"), col("sub"))
      .agg(min_by(col("code"), col("dd")).as("code"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(codesPath(root))
    Similarity.assignCells(norm, storedC)
      .select(col("cell_id"), col("vec_id"), col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(posts(root))
    resid.unpersist()
    norm.unpersist()
  }

  /** IVF-PQ query from the stored layout — read-only ADC + exact
    * rescore, no training: probes from the broadcast centroids, one
    * residual LUT per query against the stored codebooks, ADC over
    * the codes of probed cells only (partition-pruned), shortlist,
    * exact rescore against the probed postings. Output contract
    * matches [[Similarity.ivfpqTopK]]. */
  def ivfpqQuery(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int = 6, shortlistFactor: Int = 8): DataFrame = {
    val c = spark.read.parquet(cents(root))
    val cbs = spark.read.parquet(cbsPath(root))
    val codes = spark.read.parquet(codesPath(root))
    val p = spark.read.parquet(posts(root))
    val m = cbs.agg(countDistinct(col("sub"))).head().getLong(0).toInt
    val sub = cbs.select(size(col("cv"))).head().getInt(0)
    val d = m * sub
    // wrong-dim query rows raise instead of silently truncating in the
    // LUT dots / rescore — the ivfpqTopK guard discipline
    val qn = Dedup.normalized(queries).withColumn("v", Similarity.vGuard(d))
    val qunit = qn
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cell_id"))
    val probes = qunit.crossJoin(broadcast(c))
      .select(col("vec_id"), col("cell_id"),
        graft.functions.dotp(col("v"), col("cv")).as("qc"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("v"), col("cv")))
          .as("d"))
      .withColumn("cell_rnk", row_number().over(qw))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cell_id"), col("qc"))
    val lut = Similarity.pqSubvectors(qunit, m, d)
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
    val cc = p.select(col("vec_id").as("neighbor_id"),
      col("v").as("vc"), col("nrm").as("nc"))
    val q = qn.select(col("vec_id").as("query_id"),
      col("v").as("vq"), col("nrm").as("nq"))
    val scored = shortlist.join(cc, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Top-k cosine neighbors of `queries` from the stored index —
    * read-only: broadcast the k-row centroid table, pick each query's
    * `nProbe` nearest cells, score exactly inside probed postings
    * partitions (the equi-join on the PARTITION column prunes the
    * scan), top-k per query. Output contract matches
    * [[Similarity.ivfTopK]]: (query_id, neighbor_id, rnk, cos_sim). */
  def ivfQuery(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val c = spark.read.parquet(cents(root))
    val p = spark.read.parquet(posts(root))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cell_id"))
    val probes = Dedup.normalized(queries).crossJoin(broadcast(c))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell_id"),
        (col("cnorm2") - lit(2.0) * graft.functions.dotp(col("v"), col("cv")))
          .as("d"))
      .withColumn("cell_rnk", row_number().over(qw))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("cell_id"), col("vec_id").as("query_id"),
        col("v").as("vq"), col("nrm").as("nq"))
    val scored = p
      .select(col("cell_id"), col("vec_id").as("neighbor_id"),
        col("v").as("vc"), col("nrm").as("nc"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.dotp(col("vq"), col("vc"))
          / (col("nq") * col("nc")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
