package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout control for data skipping (SURVEY.md §2 IO8) —
  * the other half of the 100 TB table story next to hive partitioning
  * (IO6): partitioning prunes directories on ONE low-cardinality key;
  * Z-ORDER clustering makes parquet min/max statistics selective on
  * SEVERAL high-cardinality keys at once, so a reader's pushed filters
  * skip most files/row-groups without any directory structure.
  *
  * `zValue` interleaves the low `bits` of two non-negative integer
  * columns (x₀y₀x₁y₁…) — points close on the Z-curve are close in BOTH
  * dimensions, so a range-sorted write yields files whose per-file
  * min/max boxes tile the plane instead of spanning it. Pure
  * shift/mask arithmetic: codegen-friendly, no UDF.
  */
object Layout {

  /** Morton (Z-curve) interleave of the low `bits` bits of `x` and `y`
    * (both must be non-negative; values ≥ 2^bits fold into the top of
    * the curve via their low bits — callers bucket first if the domain
    * exceeds 2^bits). bits ≤ 31 keeps the result in a positive long. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Range-sort by Z-value and write parquet with bounded file size, so
    * every output file covers a tight box in (xCol, yCol) and its
    * footer min/max statistics let a selective reader skip it. The
    * sort is a range-partitioned total sort — at 100 TB it is one
    * shuffle whose output IS the table layout, amortized over every
    * future selective scan. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      dir: String, maxRecordsPerFile: Long = 100000L,
      bits: Int = 16): Unit =
    df.sort(zValue(col(xCol), col(yCol), bits))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)

  /** Small-file compaction (SURVEY.md §2 IO10) — the table-maintenance
    * pass every streaming/incremental ingest needs: micro-batch
    * writers leave thousands of KB-scale files, and at 100 TB the
    * resulting task-per-file scheduling + footer-per-file reads
    * dominate scan cost long before data volume does. Rewrites `dir`
    * as ⌈totalBytes/targetBytes⌉ files via `coalesce` — a NARROW
    * rewrite (no shuffle: coalesce merges input splits in place, so
    * the job moves each byte once and never repartitions), then an
    * atomic-ish directory swap. Returns the output file count; a
    * directory already at or below the target count is left UNTOUCHED
    * (no rewrite job at all — idempotent maintenance must be free when
    * there is nothing to do).
    *
    * Row-order note: compaction is layout maintenance, not a query —
    * parquet tables carry no order contract, and coalesce preserves
    * within-input order anyway. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent0 = path.getParent
    val old0 = new org.apache.hadoop.fs.Path(parent0,
      "." + path.getName + "__compact_old")
    // Crash RECOVERY (r16 advice): a crash between rename(path, old)
    // and rename(tmp, path) below leaves the sole copy of the data
    // under the rename-aside dir. Restore it FIRST — the old entry
    // behavior deleted `old` unconditionally, so a post-crash append
    // could recreate `path` with only new rows and the next compaction
    // would then destroy the pre-crash rows.
    if (!fs.exists(path) && fs.exists(old0)) fs.rename(old0, path)
    val files = fs.listStatus(path)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nOut >= files.length) return files.length
    // Crash-safe swap (r15 advice): the staging dirs are DOT-prefixed
    // so partition discovery over the enclosing table root ignores
    // them (the old bare 'chunk_idx=N__compact_tmp' sibling made
    // discovery infer chunk_idx as string), and the live directory is
    // renamed ASIDE before the compacted one renames in — a crash in
    // the window leaves the data intact under .<name>__compact_old
    // instead of deleted.
    val parent = path.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent,
      "." + path.getName + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(parent,
      "." + path.getName + "__compact_old")
    fs.delete(tmp, true) // leftovers of a crashed earlier run
    fs.delete(old, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    // report what actually landed (a coalesce target with an empty
    // partition writes fewer files than requested)
    fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Per-partition form of [[compactFiles]] (IO10; r11) — the
    * maintenance pass the STORED-INDEX add paths invoke
    * ([[graft.pipeline.AnnIndex.addIvfBatch]],
    * [[graft.pipeline.TextIndex.addBm25Batch]]): incremental appends
    * land ≥1 small file per touched hive partition
    * (`cell_id=`/`tok_bucket=` directories), and after N daily adds a
    * probe pays N footer reads per pruned partition — exactly the
    * pathology IO10 exists for. Compacts every partition directory
    * under `dir` whose parquet file count exceeds `maxFilesPerPart`
    * (partitions at or under the bound are untouched — idempotent
    * maintenance is free when there is nothing to do, so a second
    * pass is a FIXPOINT). Values are untouched; only the file layout
    * changes, so stored ≡ fresh query equality is preserved by
    * construction. Returns the number of partitions rewritten. */
  def compactPartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String, partPrefix: String, maxFilesPerPart: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(maxFilesPerPart >= 1, "maxFilesPerPart must be positive")
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0
    fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partPrefix))
      .count { part =>
        val n = fs.listStatus(part.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        if (n > maxFilesPerPart) {
          compactFiles(spark, part.getPath.toString, targetBytes)
          true
        } else false
      }
  }

  /** Bucketed + sorted table write (SURVEY.md §2 IO11) — the third
    * leg of the layout family: hive partitioning (IO6) prunes on a
    * LOW-cardinality key, Z-order (IO8) makes min/max skipping work
    * on several keys, and BUCKETING pre-hashes a HIGH-cardinality
    * JOIN key into a fixed number of buckets at write time, so every
    * later equi-join or aggregate on that key runs WITH NO EXCHANGE —
    * the shuffle is paid once at ingest and amortized over every
    * query. This is the explicit co-location story of the 100 TB
    * design (facts bucketed on the join key at ingest; see
    * LayoutSpec's no-Exchange plan proof).
    *
    * Spark constraint, stated rather than hidden: bucket metadata
    * lives in the catalog, so bucketed output is a TABLE
    * (`saveAsTable`), not a bare directory, and both join sides must
    * agree on the bucket count (or be a multiple under AQE's
    * coalescing) for the exchange to be elided. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
