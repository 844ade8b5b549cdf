package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT BM25 text index (SURVEY.md §2 P18l) — the lexical twin
  * of [[AnnIndex]] and the third member of the stored-index family
  * (P2c minhash bands, P6h IVF postings, this one inverted text):
  * [[TextAnalysis.bm25TopK]] re-derives tf/df/doclen tables from the
  * corpus on every call — right for an audit, wrong for a serving
  * path. The lifecycle splits:
  *
  *  - [[buildBm25]] tokenizes ONCE and persists four tables under
  *    `root`: `postings` (token, doc_id, tf) PARTITIONED BY a
  *    token-hash bucket and SORTED by token within partitions — a
  *    query for a handful of terms prunes to their buckets at the
  *    FILE level and to their row groups via parquet min/max stats;
  *    `doclens` (doc_id, dl); `termstats` (token, df) derived from
  *    the WRITTEN postings (single source of truth); `stats` (1 row:
  *    n_docs, sum_dl, n_dl — exact longs, so avgdl is derived by the
  *    same one division the fresh path computes).
  *  - [[bm25Query]] reads the stored tables and never re-tokenizes:
  *    every integer input (tf, df, dl, N) round-trips parquet
  *    exactly, so the stored score EQUALS the freshly-computed score
  *    bit-for-bit (spec-asserted).
  *  - [[addBm25Batch]] appends the batch's postings/doclens, rebuilds
  *    the token-cardinality termstats from the appended postings, and
  *    advances the 1-row stats — daily adds cost one batch tokenize +
  *    one vocab-sized aggregate, never a corpus re-scan.
  *
  * A NULL-text document produces no token rows and therefore can never
  * be returned, but it still COUNTS toward n_docs (both build and add
  * paths count the full input frame — matching the fresh
  * [[TextAnalysis.bm25TopK]] path, whose N is the corpus row count):
  * idf treats an unreadable document as a document the term did not
  * appear in. Batches passed to [[addBm25Batch]] must contain only NEW
  * doc_ids — re-appending an indexed id would double-count its
  * postings, doclen and n_docs share, so the add path enforces it with
  * an anti-join against the stored doclens and fails loudly.
  */
object TextIndex {

  private def postings(root: String) = s"$root/postings"
  private def doclens(root: String) = s"$root/doclens"
  private def termstats(root: String) = s"$root/termstats"
  private def statsPath(root: String) = s"$root/stats"

  private def tokTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))

  /** Tokenize `docs` and persist the index under `root` (overwrites). */
  def buildBm25(docs: DataFrame, root: String, nBuckets: Int = 64,
      textCol: String = "text"): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    val toks = tokTable(docs, textCol).persist()
    toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("tok_bucket", pmod(xxhash64(col("token")), lit(nBuckets)))
      .repartition(col("tok_bucket"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").partitionBy("tok_bucket")
      .parquet(postings(root))
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(doclens(root))
    toks.unpersist()
    // termstats from the WRITTEN postings — the same frame queries read
    spark.read.parquet(postings(root))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(termstats(root))
    val nDocs = docs.count()
    val dlAgg = spark.read.parquet(doclens(root))
      .agg(coalesce(sum(col("dl")), lit(0L)).as("sum_dl"),
        count(lit(1)).as("n_dl")).head()
    writeStats(spark, root, nDocs, dlAgg.getLong(0), dlAgg.getLong(1))
  }

  private def writeStats(spark: SparkSession, root: String, nDocs: Long,
      sumDl: Long, nDl: Long): Unit = {
    import spark.implicits._
    Seq((nDocs, sumDl, nDl)).toDF("n_docs", "sum_dl", "n_dl")
      .coalesce(1).write.mode("overwrite").parquet(statsPath(root))
  }

  /** Append a new batch — postings/doclens append, termstats rebuild
    * from the appended postings (vocab-sized aggregate), 1-row stats
    * advance. No corpus re-tokenization.
    *
    * IO10 wiring (r11): each append lands ≥1 small file per touched
    * token bucket (and one in the flat doclens dir), so after N daily
    * adds a query pays N footer reads per pruned bucket — the add
    * path finishes with [[graft.sources.Layout.compactPartitions]]
    * over the postings buckets plus a flat-dir compaction of doclens,
    * rewriting only directories past `maxFilesPerBucket` (fixpoint
    * when nothing to do; values untouched, so stored ≡ fresh equality
    * is preserved). Pass `maxFilesPerBucket = Int.MaxValue` to defer
    * maintenance to an explicit [[compactIndex]] call. */
  def addBm25Batch(batch: DataFrame, root: String, nBuckets: Int = 64,
      textCol: String = "text", maxFilesPerBucket: Int = 8): Unit = {
    val spark = batch.sparkSession
    // new-ids-only contract, ENFORCED: a re-appended doc_id would
    // silently double-count its postings, doclen and n_docs share.
    // One semi-join of the stored doclens against the (small) batch id
    // set — broadcast-able, batch-proportional. (A stored doc with NO
    // tokens is absent from doclens and can't be detected here; it
    // also has no postings to double-count — only its n_docs share
    // rides on the caller honoring the contract.)
    val dupIds = spark.read.parquet(doclens(root))
      .join(broadcast(batch.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(dupIds == 0L,
      "addBm25Batch: batch contains doc_ids already present in the " +
        "stored index — batches must contain only new doc_ids " +
        "(re-appending would double-count postings, doclens and n_docs)")
    val toks = tokTable(batch, textCol).persist()
    toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("tok_bucket", pmod(xxhash64(col("token")), lit(nBuckets)))
      .repartition(col("tok_bucket"))
      .sortWithinPartitions("token")
      .write.mode("append").partitionBy("tok_bucket")
      .parquet(postings(root))
    val batchDl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .persist()
    batchDl.write.mode("append").parquet(doclens(root))
    spark.read.parquet(postings(root))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(termstats(root))
    // the 1-row stats round-trip through the driver (bounded), because
    // overwriting a path mid-read of the same path is not a thing
    val prev = spark.read.parquet(statsPath(root)).head()
    val delta = batchDl.agg(coalesce(sum(col("dl")), lit(0L)),
      count(lit(1))).head()
    toks.unpersist(); batchDl.unpersist()
    writeStats(spark, root, prev.getLong(0) + batch.count(),
      prev.getLong(1) + delta.getLong(0), prev.getLong(2) + delta.getLong(1))
    compactIndex(spark, root, maxFilesPerBucket)
  }

  /** Explicit IO10 maintenance over the stored index: compact every
    * token-bucket partition (and the flat doclens directory) holding
    * more than `maxFilesPerDir` parquet files. Returns the number of
    * directories rewritten (0 = already at fixpoint). */
  def compactIndex(spark: SparkSession, root: String,
      maxFilesPerDir: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val nParts = graft.sources.Layout.compactPartitions(spark,
      postings(root), "tok_bucket=", maxFilesPerDir, targetBytes)
    val dlPath = new org.apache.hadoop.fs.Path(doclens(root))
    val fs = dlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nDl = if (fs.exists(dlPath) &&
        fs.listStatus(dlPath).count(_.getPath.getName.endsWith(".parquet"))
          > maxFilesPerDir) {
      graft.sources.Layout.compactFiles(spark, doclens(root), targetBytes)
      1
    } else 0
    nParts + nDl
  }

  /** Top-k BM25 from the stored index — identical output contract and
    * arithmetic to [[TextAnalysis.bm25TopK]]: (doc_id, dl, n_terms,
    * bm25), 6dp-rounded per-term scores summed as DECIMAL(18,6),
    * (score DESC, doc_id) tie rule. The postings scan prunes to the
    * query terms' hash buckets (file level) and token row groups
    * (parquet stats). */
  def bm25Query(spark: SparkSession, root: String, queryTerms: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      nBuckets: Int = 64): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    import spark.implicits._
    // bucket ids of the literal terms: one |terms|-row local job — the
    // partition-pruning literals must be values, not expressions
    val buckets = queryTerms.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nBuckets)).as("b"))
      .distinct().as[Long].collect().toSeq
    val tf = spark.read.parquet(postings(root))
      .filter(col("tok_bucket").isin(buckets: _*))
      .filter(col("token").isin(queryTerms: _*))
      .select(col("doc_id"), col("token"), col("tf"))
    val dfT = spark.read.parquet(termstats(root))
      .filter(col("token").isin(queryTerms: _*))
    val dl = spark.read.parquet(doclens(root))
    val stats = spark.read.parquet(statsPath(root))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_dl")).as("avgdl"))
    val perTerm = tf
      .join(broadcast(dfT), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(log(lit(1.0)
        + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("ndl", round(col("dl") / col("avgdl"), 6))
      .withColumn("tscore", round(
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("ndl"))), 6))
    perTerm
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        sum(col("tscore").cast("decimal(18,6)")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }
}
