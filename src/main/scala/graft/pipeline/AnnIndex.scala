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
    * silently truncate in the dot products). */
  def addIvfBatch(batch: DataFrame, root: String): Unit = {
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
