package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style TAR shard ingest/egress (SURVEY.md §2 IO12) — the
  * storage layout large-scale multimodal training actually uses: a
  * corpus of small binary files packed into a few thousand sequential
  * tar shards, each shard read start-to-finish by exactly one worker
  * (no random access, object-store-friendly). This closes the
  * placeholder [[graft.pipeline.Multimodal]]'s scaladoc names — the
  * media SYNTHESIZER stood in for "a production file/tar-shard
  * reader"; this IS that reader (and its writer), on the plain POSIX
  * ustar format, pure JVM.
  *
  * Read path: one `binaryFile` row per shard (Spark assigns shards to
  * tasks — the WebDataset parallelism unit), then a per-partition tar
  * walk explodes entries to (shard, name, bytes) rows. The walk
  * verifies each header's checksum and the terminating zero blocks;
  * a malformed header FAILS LOUDLY with the shard path and offset —
  * a truncated shard must not silently drop its tail records.
  *
  * Write path: deterministic round-robin by a 64-bit key hash (the
  * [[Layout]] discipline: re-running the writer reproduces identical
  * shard membership), each shard streamed as one tar with entries in
  * key order. Entry names carry the record key + extension so the
  * sample's modalities group by basename — the WebDataset convention.
  *
  * At 100 TB: shards are the parallelism AND the IO unit — a reader
  * never seeks, a writer never appends; rebalancing is re-sharding.
  */
object Shards {

  private val BLOCK = 512

  // ----------------------------------------------------------- writer
  /** One ustar header block for `name` with `size` data bytes. */
  private[sources] def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name too long (>100): $name")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(off: Int, width: Int, v: Long): Unit =
      // width-1 octal digits + NUL, zero-padded — the ustar convention
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, name)
    putOctal(100, 8, 420) // mode 0644
    putOctal(108, 8, 0) // uid
    putOctal(116, 8, 0) // gid
    putOctal(124, 12, size)
    putOctal(136, 12, 0) // mtime pinned to 0: deterministic bytes
    put(148, "        ") // chksum field = spaces while summing
    h(156) = '0' // typeflag: regular file
    put(257, "ustar")
    h(262) = 0
    put(263, "00")
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += java.lang.Byte.toUnsignedInt(h(i)); i += 1 }
    // 6 octal digits + NUL + space
    put(148, "%06o".format(sum))
    h(154) = 0
    h(155) = ' '
    h
  }

  private def pad(n: Long): Int =
    ((BLOCK - (n % BLOCK)) % BLOCK).toInt

  /** Serialize (name, bytes) entries into one complete tar stream. */
  private[sources] def tarBytes(
      entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, bytes) =>
      out.write(tarHeader(name, bytes.length.toLong))
      out.write(bytes)
      out.write(new Array[Byte](pad(bytes.length.toLong)))
    }
    out.write(new Array[Byte](2 * BLOCK)) // end-of-archive marker
    out.toByteArray
  }

  /** Parse a complete tar stream into (name, bytes) entries. Checksum
    * or framing violations throw with the byte offset. */
  private[sources] def untar(tar: Array[Byte],
      context: String = "<bytes>"): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    def octal(o: Int, w: Int): Long = {
      var v = 0L
      var i = o
      while (i < o + w && tar(i) != 0 && tar(i) != ' ') {
        require(tar(i) >= '0' && tar(i) <= '7',
          s"tar $context: bad octal digit at byte $i")
        v = v * 8 + (tar(i) - '0')
        i += 1
      }
      v
    }
    while (off + BLOCK <= tar.length) {
      if ((off until off + BLOCK).forall(tar(_) == 0)) {
        // first zero block: require the second, then stop
        require(off + 2 * BLOCK <= tar.length &&
          (off + BLOCK until off + 2 * BLOCK).forall(tar(_) == 0),
          s"tar $context: single zero block at $off (truncated archive)")
        return out.result()
      }
      var stored = 0L
      var sum = 0L
      var i = 0
      while (i < BLOCK) {
        val b = java.lang.Byte.toUnsignedInt(tar(off + i))
        sum += (if (i >= 148 && i < 156) 32 else b)
        i += 1
      }
      stored = octal(off + 148, 8)
      require(stored == sum,
        s"tar $context: header checksum mismatch at byte $off " +
          s"(stored $stored, computed $sum)")
      val nameEnd = {
        var e = off
        while (e < off + 100 && tar(e) != 0) e += 1
        e
      }
      val name = new String(tar, off, nameEnd - off, "UTF-8")
      val size = octal(off + 124, 12)
      val dataStart = off + BLOCK
      require(dataStart + size <= tar.length,
        s"tar $context: entry '$name' data runs past the archive end")
      if (tar(off + 156) == '0' || tar(off + 156) == 0)
        out += ((name,
          java.util.Arrays.copyOfRange(tar, dataStart,
            (dataStart + size).toInt)))
      off = dataStart + size.toInt + pad(size)
    }
    throw new IllegalArgumentException(
      s"tar $context: missing end-of-archive marker")
  }

  /** Write `records` (keyCol: long, nameCol: string entry name,
    * bytesCol: binary) as `nShards` tar shards under `root`
    * (shard-00000.tar …). Membership = key hash mod nShards
    * (deterministic, partitioning-independent); entries within a
    * shard are key-ordered. Returns total records written. */
  def writeTarShards(records: DataFrame, root: String, nShards: Int,
      keyCol: String = "doc_id", nameCol: String = "name",
      bytesCol: String = "media"): Long = {
    require(nShards > 0, "need at least one shard")
    val spark = records.sparkSession
    new java.io.File(root).mkdirs()
    implicit val enc = Encoders.tuple(Encoders.scalaInt,
      Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    val assigned = records.select(
        pmod(xxhash64(col(keyCol)), lit(nShards)).cast("int").as("_shard"),
        col(keyCol).cast("long").as("_key"),
        col(nameCol).as("_name"), col(bytesCol).as("_bytes"))
      .as[(Int, Long, String, Array[Byte])]
      // one partition per shard, entries sorted within: each task
      // streams exactly one tar — the WebDataset write shape
      .repartition(nShards, col("_shard"))
      .sortWithinPartitions(col("_shard"), col("_key"))
    // STREAMED through the Hadoop FS API: one entry in memory at a
    // time, and the scheme (file://, hdfs://, s3a://) comes from the
    // path — the executor-side write works on a cluster, not just
    // local mode. repartition-by-value hash-partitions, so one task
    // may own SEVERAL shard values: the sort makes them consecutive
    // runs, and each run streams to its own tar.
    val counts = assigned.mapPartitions { it =>
      val fsConf = new org.apache.hadoop.conf.Configuration()
      val done = Seq.newBuilder[(Int, Long)]
      var cur = -1
      var os: org.apache.hadoop.fs.FSDataOutputStream = null
      var n = 0L
      def closeCurrent(): Unit = if (os != null) {
        os.write(new Array[Byte](2 * BLOCK))
        os.close()
        os = null
        done += ((cur, n))
      }
      it.foreach { case (s, _, name, b) =>
        if (s != cur) {
          closeCurrent()
          val p = new org.apache.hadoop.fs.Path(root, f"shard-$s%05d.tar")
          os = p.getFileSystem(fsConf).create(p, true)
          cur = s
          n = 0L
        }
        os.write(tarHeader(name, b.length.toLong))
        os.write(b)
        os.write(new Array[Byte](pad(b.length.toLong)))
        n += 1
      }
      closeCurrent()
      done.result().iterator
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)).collect()
    counts.map(_._2).sum
  }

  /** STREAMING ingest of a growing shard directory (SURVEY.md §2
    * ST24): the same per-task tar walk over `readStream` binaryFile —
    * each newly-landed shard becomes one micro-batch input row and
    * explodes to its records exactly once (file-source offsets track
    * seen shards; a re-listed shard is never re-emitted). This is the
    * crawl-append shape: yesterday's corpus is immutable shards,
    * today's crawl lands as new ones, and the downstream pipeline
    * (dedup, quality, decode) consumes records continuously instead
    * of re-scanning the corpus. Same loud corruption contract as the
    * batch walk. */
  def streamTarShards(spark: SparkSession, root: String): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING,
      Encoders.BINARY)
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      // streaming sources require the schema up front; binaryFile's is
      // fixed by the format
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(root)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING,
        Encoders.BINARY))
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        untar(bytes, shard).map { case (n, b) => (shard, n, b) }
      }
      .toDF("shard", "name", "bytes")
  }

  /** Read every tar shard under `root` as (shard, name, bytes) rows —
    * one binaryFile row per shard, per-task tar walk, no shuffle. */
  def readTarShards(spark: SparkSession, root: String): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING,
      Encoders.BINARY)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(root)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING,
        Encoders.BINARY))
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        untar(bytes, shard).map { case (n, b) => (shard, n, b) }
      }
      .toDF("shard", "name", "bytes")
  }
}
