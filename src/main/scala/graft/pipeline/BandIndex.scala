package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT minhash band-bucket index (SURVEY.md §2 P2c; r12) — the
  * text-near-dup member of the stored-index family, giving the band
  * table the same owned lifecycle its two siblings already have
  * ([[AnnIndex]] for vectors, [[TextIndex]] for BM25; the reference's
  * import-once-query-many storage contract, python/pyhdk/hdk.py:2313).
  * Before r12 the band table was "persisted at ingest" by the CALLER
  * ([[Dedup.minhashBandRows]] returns a frame), so the daily-add
  * small-file pathology and the stored ≡ fresh contract lived in user
  * code; this module owns them:
  *
  *  - [[buildBands]] shingles→minhashes→bands the corpus ONCE (the
  *    exact [[Dedup.minhashBandRows]] construction — same
  *    [[Dedup.affineConstants]] seeds, same band fold, so stored ≡
  *    fresh is spec-assertable) and persists (doc_id, band_hash) rows
  *    PARTITIONED BY band_idx under `root/bands`, plus a one-row
  *    `root/meta` table pinning (num_hashes, bands) — later adds and
  *    probes read the stored parameters, so a build/query parameter
  *    mismatch (which would silently bucket batches differently and
  *    destroy recall) is impossible by construction.
  *  - [[addBandsBatch]] appends a new batch under the NEW-ID ANTI-JOIN
  *    contract: docs whose ids are already indexed are skipped, so
  *    re-ingesting an overlapping crawl slice is idempotent (a
  *    re-added doc would otherwise pair with itself through every
  *    bucket and double its neighbors' candidate counts). The add path
  *    finishes with IO10 compaction ([[graft.sources.Layout
  *    .compactPartitions]]) so N daily appends don't accumulate N
  *    footer reads per band partition.
  *  - [[candidates]] probes TODAY'S batch against the stored table —
  *    re-shingling only the batch, never the corpus (delegates to
  *    [[Dedup.incrementalMinhashCandidates]], including its
  *    hot-bucket `maxBucketDf` guard). Feed the result to
  *    [[Dedup.verifyCandidates]] for the exact-Jaccard decision.
  *
  * At 100 TB: the band table is N·bands fixed-width rows — the ONE
  * corpus-sized artifact, written once and appended narrowly; a daily
  * batch probe shuffles batch·bands rows against it on the
  * (band_idx, band_hash) equi-key, never the corpus text.
  */
object BandIndex {

  private def bandsPath(root: String) = s"$root/bands"
  private def metaPath(root: String) = s"$root/meta"

  /** Read the pinned (num_hashes, bands) parameters of a stored index. */
  def params(spark: SparkSession, root: String): (Int, Int) = {
    val m = spark.read.parquet(metaPath(root)).head()
    (m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"))
  }

  /** Build the band index of `docs` (needs doc_id, text) under `root`
    * (overwrites). Identical construction to [[Dedup.minhashBandRows]]
    * so a stored probe equals a fresh one value-for-value. */
  def buildBands(docs: DataFrame, root: String, numHashes: Int = 64,
      bands: Int = 16): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.minhashBandRows(docs, numHashes, bands)
      .select(col("band_idx"), col("doc_id"), col("band_hash"))
      .write.mode("overwrite").partitionBy("band_idx")
      .parquet(bandsPath(root))
    Seq((numHashes, bands)).toDF("num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(root))
  }

  /** Append `batch` (doc_id, text) to the stored index under the
    * new-id anti-join contract; parameters come from the stored meta,
    * never the caller. Returns the number of NEW docs indexed (0 = the
    * batch was entirely known — a fixpoint re-add writes nothing). */
  def addBandsBatch(batch: DataFrame, root: String,
      maxFilesPerBand: Int = 8): Long = {
    val spark = batch.sparkSession
    val (numHashes, bands) = params(spark, root)
    val stored = spark.read.parquet(bandsPath(root))
    val newDocs = batch
      .join(stored.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint() // count + write below must see ONE snapshot
    val n = newDocs.count()
    if (n > 0) {
      Dedup.minhashBandRows(newDocs, numHashes, bands)
        .select(col("band_idx"), col("doc_id"), col("band_hash"))
        .write.mode("append").partitionBy("band_idx")
        .parquet(bandsPath(root))
      compactBands(spark, root, maxFilesPerBand)
    }
    n
  }

  /** Explicit IO10 maintenance: compact every band_idx partition
    * holding more than `maxFilesPerBand` parquet files. Returns the
    * number of partitions rewritten (0 = already at fixpoint). */
  def compactBands(spark: SparkSession, root: String,
      maxFilesPerBand: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Int =
    graft.sources.Layout.compactPartitions(spark, bandsPath(root),
      "band_idx=", maxFilesPerBand, targetBytes)

  /** DISTINCT (batch_id, index_id) candidate pairs of `batch` against
    * the STORED index — the read path; shingles the batch only. */
  def candidates(spark: SparkSession, root: String, batch: DataFrame,
      maxBucketDf: Int = 1000): DataFrame = {
    val (numHashes, bands) = params(spark, root)
    Dedup.incrementalMinhashCandidates(
      spark.read.parquet(bandsPath(root)), batch,
      numHashes, bands, maxBucketDf)
  }
}
