package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{Tables, TestSpark}
import graft.pipeline.Multimodal

/** WebDataset-style tar shard IO (IO12): real ustar bytes both ways,
  * loud failure on corruption, deterministic shard membership. */
class ShardsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshRoot(name: String): String = {
    val root = graft.GraftSession.scratchDir(name)
    val f = new java.io.File(root)
    if (f.exists()) {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(f)
    }
    root
  }

  test("tarBytes/untar round-trips entries incl. empty and block-aligned sizes") {
    val entries = Seq(
      "a.bin" -> Array.tabulate[Byte](100)(_.toByte),
      "empty.bin" -> Array.emptyByteArray,
      "exact.bin" -> Array.tabulate[Byte](512)(i => (i * 7).toByte),
      ("n" * 100) -> Array.tabulate[Byte](513)(i => (i ^ 0x5a).toByte))
    val tar = Shards.tarBytes(entries.iterator)
    assert(tar.length % 512 == 0, "archives are block-multiples")
    val back = Shards.untar(tar, "spec")
    assert(back.map(_._1) == entries.map(_._1))
    entries.zip(back).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("tarHeader rejects entry names over 100 bytes, loudly") {
    // a >100-byte name would silently corrupt the mode/uid fields
    // (surfacing only as a downstream checksum mismatch) — fail at
    // write time instead (r15 advice)
    val e = intercept[IllegalArgumentException](
      Shards.tarBytes(Iterator(("n" * 101) -> Array[Byte](1))))
    assert(e.getMessage.contains("100"))
  }

  test("untarStream honors the POSIX ustar prefix field (foreign long-path shards)") {
    // our writer never fills prefix (names are required ≤100 bytes),
    // but FOREIGN WebDataset shards split >100-byte member paths
    // across prefix (bytes 345..500) + name — the reader must
    // reassemble them, not silently truncate (r15 advice)
    val data = Array[Byte](7, 8, 9)
    val h = Shards.tarHeader("file.bin", data.length.toLong)
    val prefix = "some/deep/dir".getBytes("US-ASCII")
    System.arraycopy(prefix, 0, h, 345, prefix.length)
    // re-checksum after patching: spaces over the chksum field, sum,
    // then 6 octal digits + NUL + space (the ustar rule)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += java.lang.Byte.toUnsignedInt(b))
    val ck = "%06o".format(sum).getBytes("US-ASCII")
    System.arraycopy(ck, 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '
    val out = new java.io.ByteArrayOutputStream()
    out.write(h)
    out.write(data)
    out.write(new Array[Byte](512 - data.length))
    out.write(new Array[Byte](1024))
    val back = Shards.untar(out.toByteArray, "spec")
    assert(back.map(_._1) == Seq("some/deep/dir/file.bin"))
    assert(java.util.Arrays.equals(back.head._2, data))
  }

  test("SerializableHadoopConf ships session conf entries through java serialization") {
    // the per-task walk/writer must see the SESSION's Hadoop conf
    // (spark.hadoop.*, object-store credentials), not classpath
    // defaults (r15 advice) — assert the carrier round-trips a
    // custom entry the way a task closure would receive it
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.credential", "s3a-secret")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new Shards.SerializableHadoopConf(conf))
    oos.close()
    val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Shards.SerializableHadoopConf]
    assert(back.value.get("graft.test.credential") == "s3a-secret")
  }

  test("untar fails LOUDLY on checksum corruption and truncation") {
    val tar = Shards.tarBytes(Iterator("x.bin" -> Array[Byte](1, 2, 3)))
    val corrupt = tar.clone()
    corrupt(0) = (corrupt(0) ^ 0x01).toByte // damage the name byte
    val e1 = intercept[IllegalArgumentException](
      Shards.untar(corrupt, "spec"))
    assert(e1.getMessage.contains("checksum"))
    val truncated = tar.dropRight(512) // lose half the end marker
    val e2 = intercept[IllegalArgumentException](
      Shards.untar(truncated, "spec"))
    assert(e2.getMessage.contains("truncated") ||
      e2.getMessage.contains("end-of-archive"))
  }

  test("system tar lists our shards (interop), when tar is installed") {
    val bytes = Shards.tarBytes(Iterator(
      "1.ppm" -> Array[Byte](1), "2.ppm" -> Array[Byte](2, 3)))
    val f = java.io.File.createTempFile("graft_shard_interop", ".tar")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    val haveTar = new java.io.File("/usr/bin/tar").exists() ||
      new java.io.File("/bin/tar").exists()
    assume(haveTar, "system tar not installed")
    val out = scala.sys.process.Process(Seq("tar", "-tf", f.getPath)).!!
    assert(out.split("\n").toSeq == Seq("1.ppm", "2.ppm"),
      s"system tar disagreed: $out")
  }

  test("untarStream walks an archive bigger than 2 GiB with one-entry memory") {
    val nEntries = 2100
    val entrySize = 1 << 20 // 1 MiB, block-aligned: no padding
    // the archive is GENERATED lazily — ~2.05 GiB of tar bytes that
    // never exist in memory at once. The point: the walk's input is
    // beyond any single JVM array (the old whole-shard reader could
    // not even represent it) and resident memory stays ~one entry.
    val pieces = new java.util.Enumeration[java.io.InputStream] {
      private var i = 0
      private var marker = false
      def hasMoreElements: Boolean = i < nEntries || !marker
      def nextElement(): java.io.InputStream =
        if (i < nEntries) {
          val h = Shards.tarHeader(f"e$i%05d.bin", entrySize.toLong)
          val data = new Array[Byte](entrySize)
          java.util.Arrays.fill(data, (i % 251).toByte)
          i += 1
          new java.io.SequenceInputStream(
            new java.io.ByteArrayInputStream(h),
            new java.io.ByteArrayInputStream(data))
        } else {
          marker = true
          new java.io.ByteArrayInputStream(new Array[Byte](1024))
        }
    }
    var count = 0L
    var total = 0L
    Shards.untarStream(new java.io.SequenceInputStream(pieces), "huge")
      .foreach { case (name, b) =>
        if (count == 0) assert(name == "e00000.bin" && b(0) == 0)
        count += 1
        total += b.length
      }
    assert(count == nEntries)
    assert(total == nEntries.toLong * entrySize)
    assert(total > Int.MaxValue.toLong,
      "the walked archive must exceed the 2 GiB array bound")
  }

  test("untarStream rejects a single entry past the 2 GiB array bound, loudly") {
    // a header CLAIMING a >2GiB entry must fail at the header, not OOM
    val h = Shards.tarHeader("huge.bin", 3L << 30)
    val e = intercept[IllegalArgumentException](
      Shards.untarStream(new java.io.ByteArrayInputStream(h), "spec").hasNext)
    assert(e.getMessage.contains("2 GiB"))
  }

  test("readTarShards reads only the path column — shard bytes never ride a row") {
    val root = freshRoot("shards_spec_prune")
    new java.io.File(root).mkdirs()
    java.nio.file.Files.write(
      new java.io.File(root, "shard-00000.tar").toPath,
      Shards.tarBytes(Iterator("a.bin" -> Array[Byte](1))))
    val plan = Shards.readTarShards(spark, root)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<path:string>"),
      s"binaryFile must prune content; plan was:\n$plan")
  }

  test("maxShardBytes rolls shards into size-bounded parts, deterministically") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val media = Multimodal.mediaTable(docs)
      .select(col("doc_id"),
        concat(col("doc_id").cast("string"), lit(".ppm")).as("name"),
        col("media"))
    val root = freshRoot("shards_spec_rolled")
    val bound = 64L * 1024
    val n = Shards.writeTarShards(media, root, nShards = 2,
      maxShardBytes = bound)
    val files = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(files.forall(_.getName.matches("shard-\\d{5}-\\d{4}\\.tar")),
      s"rolled naming: ${files.map(_.getName).mkString(",")}")
    assert(files.forall(_.length() <= bound),
      "every part must respect the size bound")
    assert(files.length > 2, "the bound must actually have rolled parts")
    // the rolled layout is still a lossless corpus
    val back = Shards.readTarShards(spark, root)
    assert(back.count() == n && n == media.count())
    val joined = back
      .select(substring_index(col("name"), ".", 1).cast("long")
        .as("doc_id"), col("bytes"))
      .join(media.select(col("doc_id"), col("media")), Seq("doc_id"))
    assert(joined.filter(not(col("bytes") === col("media"))).count() == 0)
    // determinism: same bound, same bytes, same part boundaries
    val before = files.map(f => f.getName ->
      java.nio.file.Files.readAllBytes(f.toPath)).toMap
    Shards.writeTarShards(media, root, nShards = 2, maxShardBytes = bound)
    val after = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(after.map(_.getName).toSeq == before.keys.toSeq.sorted)
    after.foreach { f =>
      assert(java.util.Arrays.equals(before(f.getName),
        java.nio.file.Files.readAllBytes(f.toPath)),
        s"${f.getName} changed on rewrite")
    }
  }

  test("a re-shard removes stale shards from the previous layout") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val media = Multimodal.mediaTable(docs)
      .select(col("doc_id"),
        concat(col("doc_id").cast("string"), lit(".ppm")).as("name"),
        col("media"))
    val root = freshRoot("shards_spec_reshard")
    val n = Shards.writeTarShards(media, root, nShards = 4)
    assert(Shards.readTarShards(spark, root).count() == n)
    // re-shard DOWN: the 4-shard layout's files must not survive to be
    // globbed back in as duplicates
    Shards.writeTarShards(media, root, nShards = 2)
    val files = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.getName).sorted.toSeq
    assert(files.forall(f => f == "shard-00000.tar" || f == "shard-00001.tar"),
      s"stale shards survived: $files")
    assert(Shards.readTarShards(spark, root).count() == n,
      "a re-shard must neither lose nor duplicate records")
  }

  test("streamTarShards maxFilesPerTrigger bounds a backfill into several micro-batches, exactly once") {
    val root = freshRoot("shards_spec_backpressure")
    new java.io.File(root).mkdirs()
    (0 until 6).foreach { i =>
      java.nio.file.Files.write(
        new java.io.File(root, f"shard-$i%05d.tar").toPath,
        Shards.tarBytes(Iterator(s"r$i.bin" -> Array[Byte](i.toByte))))
    }
    val q = Shards.streamTarShards(spark, root, maxFilesPerTrigger = Some(2))
      .select(col("name"))
      .writeStream.format("memory").queryName("shards_backpressure_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("shards_backpressure_out")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == (0 until 6).map(i => s"r$i.bin"),
        s"backfill must arrive exactly once, got $got")
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3,
        s"6 shards at maxFilesPerTrigger=2 must take >=3 batches, took $batches")
    } finally q.stop()
  }

  test("streamTarShards: shards landing across micro-batches emit each record exactly once") {
    val root = freshRoot("shards_spec_stream")
    new java.io.File(root).mkdirs()
    def land(idx: Int, entries: (String, Array[Byte])*): Unit =
      java.nio.file.Files.write(
        new java.io.File(root, f"shard-$idx%05d.tar").toPath,
        Shards.tarBytes(entries.iterator))
    land(0, "a.bin" -> Array[Byte](1), "b.bin" -> Array[Byte](2, 2))
    val q = Shards.streamTarShards(spark, root)
      .select(col("shard"), col("name"),
        length(col("bytes")).as("len"))
      .writeStream.format("memory").queryName("shards_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a new shard lands mid-stream; only ITS records arrive next
      land(1, "c.bin" -> Array[Byte](3, 3, 3))
      q.processAllAvailable()
      val got = spark.table("shards_stream_out")
        .select("name", "len").collect()
        .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      assert(got == Seq(("a.bin", 1), ("b.bin", 2), ("c.bin", 3)),
        s"stream emitted $got")
    } finally q.stop()
  }

  test("streamTarShards: a killed ingester resumes from its checkpoint exactly-once") {
    // the crawl-backfill crash case: shards 0-1 are committed, the
    // ingester dies, shards 2-3 land, a NEW query starts from the same
    // checkpointLocation — the file-source offset log must replay
    // nothing and miss nothing
    val root = freshRoot("shards_spec_recovery")
    val ckpt = freshRoot("shards_spec_recovery_ckpt")
    new java.io.File(root).mkdirs()
    def land(idx: Int): Unit =
      java.nio.file.Files.write(
        new java.io.File(root, f"shard-$idx%05d.tar").toPath,
        Shards.tarBytes(Iterator(s"r$idx.bin" -> Array[Byte](idx.toByte))))
    val sink = scala.collection.concurrent.TrieMap
      .empty[Long, Seq[String]]
    def drainOnce(): Unit = {
      val q = Shards.streamTarShards(spark, root)
        .select(col("name"))
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            sink.put(id, df.collect().map(_.getString(0)).toSeq)
            ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    land(0); land(1)
    drainOnce() // run 1, then "crash"
    land(2); land(3)
    drainOnce() // restart from the offset log
    val got = sink.values.flatten.toSeq.sorted
    assert(got == Seq("r0.bin", "r1.bin", "r2.bin", "r3.bin"),
      s"restart must neither replay nor drop shards: $got")
  }

  test("streaming shards -> PNG decode -> aHash dedup: the crawl-append near-dup loop") {
    // ST24 composed with P11f/P11e end to end ON A STREAM: yesterday's
    // corpus is shard 0; today's crawl (shard 1) re-ingests one image
    // byte-identically — the stateful dedup must recognize it ACROSS
    // micro-batches (hash state crosses the batch cut), while the
    // genuinely new image passes through.
    val root = freshRoot("shards_spec_stream_dedup")
    new java.io.File(root).mkdirs()
    def png(seed: Long): Array[Byte] = Multimodal.synthPng(seed)
    def land(idx: Int, entries: (String, Array[Byte])*): Unit =
      java.nio.file.Files.write(
        new java.io.File(root, f"shard-$idx%05d.tar").toPath,
        Shards.tarBytes(entries.iterator))
    land(0, "3.png" -> png(12345L), "6.png" -> png(67890L))
    val records = Shards.streamTarShards(spark, root)
      .select(substring_index(col("name"), ".", 1).cast("long")
        .as("doc_id"), col("bytes"))
    val q = graft.pipeline.Multimodal.pngAHashes(records)
      .filter(col("crc_ok"))
      .select(col("doc_id"), col("ahash"))
      .dropDuplicates("ahash")
      .writeStream.format("memory").queryName("shards_dedup_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // today's crawl: 9.png duplicates 3.png's bytes, 12.png is new
      land(1, "9.png" -> png(12345L), "12.png" -> png(99999L))
      q.processAllAvailable()
      val kept = spark.table("shards_dedup_stream_out")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(3L, 6L, 12L),
        s"cross-batch near-dup state failed: kept $kept")
    } finally q.stop()
  }

  test("write+read round trip: bytes transparent, membership deterministic, walk distributed") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
    val media = Multimodal.mediaTable(docs)
      .select(col("doc_id"),
        concat(col("doc_id").cast("string"), lit(".ppm")).as("name"),
        col("media"))
    val root = freshRoot("shards_spec")
    val n = Shards.writeTarShards(media, root, nShards = 4)
    assert(n == media.count())
    val files = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".tar")).map(_.getName).sorted
    assert(files.length <= 4 && files.nonEmpty)
    val back = Shards.readTarShards(spark, root)
    assert(back.count() == n)
    // byte transparency: every record equals its source exactly
    val joined = back
      .select(substring_index(col("name"), ".", 1).cast("long")
        .as("doc_id"), col("bytes"))
      .join(media.select(col("doc_id"), col("media")), Seq("doc_id"))
    assert(joined.filter(not(col("bytes") === col("media"))).count() == 0)
    // membership: shard index == pmod(xxhash64(doc_id), 4)
    val wrongShard = back.select(
        substring_index(col("name"), ".", 1).cast("long").as("doc_id"),
        regexp_extract(col("shard"), "shard-(\\d+)", 1).cast("int")
          .as("sidx"))
      .filter(col("sidx") =!= pmod(xxhash64(col("doc_id")), lit(4)))
    assert(wrongShard.count() == 0, "membership must be the key hash")
    // determinism: a second write produces byte-identical shards
    val before = files.map(fn => fn -> java.nio.file.Files.readAllBytes(
      new java.io.File(root, fn).toPath)).toMap
    Shards.writeTarShards(media, root, nShards = 4)
    before.foreach { case (fn, b) =>
      assert(java.util.Arrays.equals(b, java.nio.file.Files.readAllBytes(
        new java.io.File(root, fn).toPath)), s"$fn changed on rewrite")
    }
  }
}
