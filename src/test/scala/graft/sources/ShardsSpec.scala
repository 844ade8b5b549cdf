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
