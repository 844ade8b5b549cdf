package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
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
  * Read path: the binaryFile source lists shards and assigns them to
  * tasks (the WebDataset parallelism unit) but only the PATH column is
  * read — the shard bytes never ride a row. Each task opens its shards
  * through the Hadoop FS API and walks the tar as a TRUE STREAM,
  * emitting one (shard, name, bytes) record at a time: task memory is
  * bounded by the single largest ENTRY, never the shard, so a 10 GiB
  * shard streams through a 1 GiB task heap (individual entries are
  * capped at 2 GiB by the JVM array limit — split oversized records
  * upstream). The walk verifies each header's checksum and the
  * terminating zero blocks; a malformed header or early EOF FAILS
  * LOUDLY with the shard name and stream offset — a truncated shard
  * must not silently drop its tail records.
  *
  * Write path: deterministic round-robin by a 64-bit key hash (the
  * [[Layout]] discipline: re-running the writer reproduces identical
  * shard membership), each shard streamed as one tar with entries in
  * key order, optionally rolled into size-bounded parts
  * (`maxShardBytes` — real WebDataset shards are ~100 MB–1 GB
  * SIZE-bounded, not count-bounded). Every file goes through a hidden
  * temp name and an atomic-publish rename, and stale shards from a
  * previous layout are removed first — a re-shard with fewer shards
  * must not leave orphans for the reader's glob to resurrect. Entry
  * names carry the record key + extension so a sample's modalities
  * group by basename — the WebDataset convention.
  *
  * At 100 TB: shards are the parallelism AND the IO unit — a reader
  * never seeks, a writer never appends; rebalancing is re-sharding.
  */
object Shards {

  private val BLOCK = 512

  /** Java-serializable carrier for the session's Hadoop configuration
    * (r15 advice): the per-task tar walk and the shard writer used to
    * build `new Configuration()` on executors, silently dropping
    * everything the session carries — `spark.hadoop.*` entries,
    * s3a/abfs credentials, custom filesystem registrations — so a
    * credentialed object-store root would fail auth on executors while
    * working on the driver. Configuration itself is a Writable, not
    * Serializable; this wrapper ships it through the closure the same
    * way Spark's own file sources ship theirs (a broadcast
    * SerializableConfiguration — that class is `private[spark]`, hence
    * this local twin). */
  private[sources] class SerializableHadoopConf(
      @transient var value: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** The session's effective Hadoop conf (SQL-conf overlays included),
    * wrapped for executor shipping. */
  private def sessionConf(spark: SparkSession): SerializableHadoopConf =
    new SerializableHadoopConf(spark.sessionState.newHadoopConf())

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

  /** INCREMENTAL ustar walk: parse entries off `in` one at a time.
    * Memory is bounded by the largest single entry — the archive can
    * exceed the JVM's 2 GiB array limit (and the task heap) freely;
    * only an individual ENTRY is array-bounded, and an oversized one
    * fails loudly instead of overflowing. Checksum or framing
    * violations throw with the stream offset, and a stream that ends
    * before the two-zero-block end-of-archive marker throws — a
    * truncated shard must not silently drop its tail records. The
    * caller owns closing `in` (exhausting the iterator does not). */
  private[sources] def untarStream(in: InputStream,
      context: String = "<stream>"): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var offset = 0L
      private var finished = false
      private var pending: (String, Array[Byte]) = _

      private def readFully(buf: Array[Byte], what: String): Unit = {
        var n = 0
        while (n < buf.length) {
          val r = in.read(buf, n, buf.length - n)
          require(r >= 0, s"tar $context: stream ended inside $what at " +
            s"byte ${offset + n} (truncated archive)")
          n += r
        }
        offset += buf.length
      }

      private def octal(h: Array[Byte], o: Int, w: Int): Long = {
        var v = 0L
        var i = o
        while (i < o + w && h(i) != 0 && h(i) != ' ') {
          require(h(i) >= '0' && h(i) <= '7',
            s"tar $context: bad octal digit in header field at " +
              s"byte ${offset - BLOCK + i}")
          v = v * 8 + (h(i) - '0')
          i += 1
        }
        v
      }

      private def advance(): Unit =
        while (pending == null && !finished) {
          val headerAt = offset
          val h = new Array[Byte](BLOCK)
          readFully(h, "header")
          if (h.forall(_ == 0)) {
            // first zero block: the marker is TWO — a lone one (or EOF
            // mid-second) is a truncated archive
            val h2 = new Array[Byte](BLOCK)
            var n = 0
            var eof = false
            while (n < BLOCK && !eof) {
              val r = in.read(h2, n, BLOCK - n)
              if (r < 0) eof = true else n += r
            }
            require(!eof && h2.forall(_ == 0),
              s"tar $context: single zero block at $headerAt " +
                "(truncated archive)")
            finished = true
          } else {
            var sum = 0L
            var i = 0
            while (i < BLOCK) {
              val b = java.lang.Byte.toUnsignedInt(h(i))
              sum += (if (i >= 148 && i < 156) 32 else b)
              i += 1
            }
            val stored = octal(h, 148, 8)
            require(stored == sum,
              s"tar $context: header checksum mismatch at byte $headerAt " +
                s"(stored $stored, computed $sum)")
            var e = 0
            while (e < 100 && h(e) != 0) e += 1
            val base = new String(h, 0, e, "UTF-8")
            // POSIX ustar prefix field (bytes 345..500): foreign
            // WebDataset shards with >100-byte member paths store the
            // leading directories here — ignoring it would silently
            // truncate names (r15 advice); our own writer never fills
            // it (tarHeader requires ≤100-byte names). Gated on the
            // POSIX magic "ustar\0" at 257 (r15 advice): GNU-format
            // archives (magic "ustar  " with a space-version) reuse
            // this region for atime/ctime and pre-POSIX/v7 headers
            // leave it undefined — gluing those bytes onto the name
            // would corrupt record keys.
            val posixMagic = h(257) == 'u' && h(258) == 's' &&
              h(259) == 't' && h(260) == 'a' && h(261) == 'r' &&
              h(262) == 0
            var pe = 345
            while (pe < 500 && h(pe) != 0) pe += 1
            val name = if (!posixMagic || pe == 345) base
              else new String(h, 345, pe - 345, "UTF-8") + "/" + base
            val size = octal(h, 124, 12)
            require(size <= Int.MaxValue - 8L,
              s"tar $context: entry '$name' is $size bytes — a single " +
                "entry is bounded by the 2 GiB JVM array limit (the " +
                "SHARD is unbounded; split oversized records upstream)")
            val data = new Array[Byte](size.toInt)
            readFully(data, s"entry '$name'")
            readFully(new Array[Byte](pad(size)), s"padding of '$name'")
            // non-regular entries (dirs, links): consumed, never emitted
            if (h(156) == '0' || h(156) == 0) pending = (name, data)
          }
        }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): (String, Array[Byte]) = {
        advance()
        if (pending == null) throw new NoSuchElementException("untarStream")
        val r = pending
        pending = null
        r
      }
    }

  /** Parse a complete in-memory tar into (name, bytes) entries — the
    * strict-whole-archive convenience over [[untarStream]] (specs,
    * small fixtures). Production readers never call this: the read
    * path streams. */
  private[sources] def untar(tar: Array[Byte],
      context: String = "<bytes>"): Seq[(String, Array[Byte])] =
    untarStream(new ByteArrayInputStream(tar), context).toSeq

  /** Shared per-task walk: open each shard path through the Hadoop FS
    * API (the scheme — file://, hdfs://, s3a:// — comes from the path)
    * and stream-parse it, emitting records incrementally. A task that
    * dies or is cancelled mid-walk closes its open shard through the
    * task-completion listener. */
  private def walkShards(paths: Dataset[String]): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING,
      Encoders.BINARY)
    // the SESSION's Hadoop conf rides the closure to executors — a
    // local `new Configuration()` here would drop spark.hadoop.* and
    // object-store credentials on the task side (r15 advice)
    val confSer = sessionConf(paths.sparkSession)
    paths.mapPartitions { it =>
      val fsConf = confSer.value
      var open: InputStream = null
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (open != null) open.close()
        })
      it.flatMap { pstr =>
        val p = new Path(pstr)
        val shard = p.getName
        val in = new java.io.BufferedInputStream(
          p.getFileSystem(fsConf).open(p), 1 << 16)
        open = in
        untarStream(in, shard).map { case (n, b) => (shard, n, b) } ++ {
          // evaluated once the walk exhausts: close promptly instead of
          // holding the handle until task end
          in.close()
          if (open eq in) open = null
          Iterator.empty
        }
      }
    }.toDF("shard", "name", "bytes")
  }

  /** List every tar shard under `root` as one path row per shard —
    * binaryFile does the distributed listing/assignment, and because
    * only `path` is selected the format never reads the shard bytes
    * into a row (ReadSchema stays struct&lt;path&gt;; asserted in
    * ShardsSpec). */
  private def shardPathRows(load: DataFrame): Dataset[String] =
    load.select(col("path")).as[String](Encoders.STRING)

  /** Write `records` (keyCol: long, nameCol: string entry name,
    * bytesCol: binary) as tar shards under `root`. Membership = key
    * hash mod `nShards` (deterministic, partitioning-independent);
    * entries within a shard are key-ordered. With the default
    * `maxShardBytes` each shard is one `shard-SSSSS.tar`; a finite
    * bound rolls a shard into `shard-SSSSS-PPPP.tar` parts, cutting
    * before the entry that would push the part past the bound (an
    * entry larger than the bound gets a part to itself — split such
    * records upstream). Rolls happen on the key order inside the hash
    * shard, so part boundaries are as deterministic as membership.
    *
    * Publish discipline (r15, hardened per advice): each part streams
    * to a hidden temp name and is renamed into place only when
    * complete, so a reader never sees a HALF-WRITTEN shard (per-file
    * visibility is the guarantee — in-place republish has a brief
    * delete→rename window in which that one file is absent, because
    * HDFS rename won't overwrite). Stale shards from a previous layout
    * are removed only AFTER every new part has published — a failed or
    * killed job leaves the old corpus intact plus some republished
    * shards (deterministic content: re-running the writer converges),
    * never a destroyed-then-half-rebuilt root. Abandoned `.inprogress`
    * temps are swept up front. For a concurrent-reader-safe re-shard,
    * write to a fresh root and swap the pointer. Returns total records
    * written. */
  def writeTarShards(records: DataFrame, root: String, nShards: Int,
      keyCol: String = "doc_id", nameCol: String = "name",
      bytesCol: String = "media",
      maxShardBytes: Long = Long.MaxValue): Long = {
    require(nShards > 0, "need at least one shard")
    require(maxShardBytes >= 3L * BLOCK,
      s"maxShardBytes must hold at least one header+data+marker " +
        s"(${3 * BLOCK} bytes)")
    val rolled = maxShardBytes != Long.MaxValue
    val spark = records.sparkSession
    val rootPath = new Path(root)
    val rootFs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.mkdirs(rootPath)
    // abandoned temps are safe to sweep now; PREEXISTING shards are
    // only snapshotted — deletion of the ones this layout does not
    // republish happens AFTER the write job succeeds, so a failed run
    // never leaves the root with the old corpus already destroyed
    Option(rootFs.globStatus(new Path(rootPath, ".shard-*.inprogress")))
      .foreach(_.foreach(s => rootFs.delete(s.getPath, false)))
    val preexisting = Option(rootFs.globStatus(
        new Path(rootPath, "shard-*.tar")))
      .map(_.map(_.getPath.getName).toSet).getOrElse(Set.empty[String])
    val confSer = sessionConf(spark)
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
    // time, any scheme. repartition-by-value hash-partitions, so one
    // task may own SEVERAL shard values: the sort makes them
    // consecutive runs, and each run streams to its own tar(s).
    val counts = assigned.mapPartitions { it =>
      val fsConf = confSer.value // session conf, not classpath defaults
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val done = Seq.newBuilder[(Int, Long, String)]
      var cur = -1
      var part = 0
      var os: org.apache.hadoop.fs.FSDataOutputStream = null
      var tmp: Path = null
      var dest: Path = null
      var bytesInPart = 0L
      var n = 0L
      def fileName(s: Int, p: Int): String =
        if (rolled) f"shard-$s%05d-$p%04d.tar" else f"shard-$s%05d.tar"
      def openPart(s: Int, p: Int): Unit = {
        dest = new Path(root, fileName(s, p))
        tmp = new Path(root, s".${fileName(s, p)}.$attempt.inprogress")
        os = tmp.getFileSystem(fsConf).create(tmp, true)
        bytesInPart = 0L
        n = 0L
      }
      def closeCurrent(): Unit = if (os != null) {
        os.write(new Array[Byte](2 * BLOCK))
        os.close()
        os = null
        // atomic publish: HDFS rename won't overwrite, so clear the
        // destination first — deterministic content makes any
        // concurrent attempt's bytes identical, last-writer-wins safe
        val fs = tmp.getFileSystem(fsConf)
        if (fs.exists(dest)) fs.delete(dest, false)
        require(fs.rename(tmp, dest), s"failed to publish $tmp -> $dest")
        done += ((cur, n, dest.getName))
      }
      it.foreach { case (s, _, name, b) =>
        val entryBytes = BLOCK.toLong + b.length + pad(b.length.toLong)
        if (s != cur) {
          closeCurrent()
          cur = s
          part = 0
          openPart(s, 0)
        } else if (rolled && bytesInPart > 0 &&
            bytesInPart + entryBytes + 2L * BLOCK > maxShardBytes) {
          closeCurrent()
          part += 1
          openPart(s, part)
        }
        os.write(tarHeader(name, b.length.toLong))
        os.write(b)
        os.write(new Array[Byte](pad(b.length.toLong)))
        bytesInPart += entryBytes
        n += 1
      }
      closeCurrent()
      done.result().iterator
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.STRING)).collect()
    // every part published — NOW retire the previous layout's shards
    // this run did not republish (deferred so a failed job can't
    // destroy the old corpus; see the publish-discipline scaladoc)
    val published = counts.map(_._3).toSet
    (preexisting -- published)
      .foreach(n => rootFs.delete(new Path(rootPath, n), false))
    counts.map(_._2).sum
  }

  /** STREAMING ingest of a growing shard directory (SURVEY.md §2
    * ST24): the file source tracks seen shards (each newly-landed
    * shard is consumed exactly once; a re-listed one is never
    * re-emitted), and the same streaming per-task tar walk as
    * [[readTarShards]] explodes it to records — only the path column
    * rides the source row, so a landing shard costs one entry of task
    * memory, not its full bytes. This is the crawl-append shape:
    * yesterday's corpus is immutable shards, today's crawl lands as
    * new ones, and the downstream pipeline (dedup, quality, decode)
    * consumes records continuously instead of re-scanning the corpus.
    * Same loud corruption contract as the batch walk.
    *
    * `maxFilesPerTrigger` is the ingest BACKPRESSURE knob: a backfill
    * landing 1,000 shards at once becomes bounded micro-batches of at
    * most that many shards instead of one giant batch (exactly-once is
    * the source's offset log either way — proven in ShardsSpec). */
  def streamTarShards(spark: SparkSession, root: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("binaryFile")
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
    val withTrigger = maxFilesPerTrigger
      .fold(reader)(m => reader.option("maxFilesPerTrigger", m))
    walkShards(shardPathRows(withTrigger.load(root)))
  }

  /** Read every tar shard under `root` as (shard, name, bytes) rows —
    * one listing row per shard, per-task streaming tar walk, no
    * shuffle, task memory bounded by one entry. */
  def readTarShards(spark: SparkSession, root: String): DataFrame =
    walkShards(shardPathRows(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(root)))
}
