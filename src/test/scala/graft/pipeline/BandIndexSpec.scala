package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class BandIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

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

  private def docs = Tables.load(spark, TestSpark.sf, "documents")

  test("stored band probe answers EXACTLY like fresh incrementalMinhashCandidates") {
    val index = docs.filter(pmod(col("doc_id"), lit(10)) < 6)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
    val root = freshRoot("bandindex_spec_eq")
    BandIndex.buildBands(index, root)
    // sorted both sides (the r10 multi-row-parity rule)
    val stored = BandIndex.candidates(spark, root, batch)
      .as[(Long, Long)].collect().sorted.toSeq
    val fresh = Dedup.incrementalMinhashCandidates(
        Dedup.minhashBandRows(index), batch)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(stored == fresh,
      "the persisted band table must reproduce the fresh band rows " +
        "value-for-value (same seeds, same fold, exact parquet round-trip)")
    assert(stored.nonEmpty)
  }

  test("meta pins the build parameters: non-default build probes with its own (numHashes, bands)") {
    val index = docs.filter(pmod(col("doc_id"), lit(10)) < 6)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
    val root = freshRoot("bandindex_spec_meta")
    BandIndex.buildBands(index, root, numHashes = 32, bands = 8)
    assert(BandIndex.params(spark, root) == ((32, 8)))
    val stored = BandIndex.candidates(spark, root, batch)
      .as[(Long, Long)].collect().sorted.toSeq
    val fresh = Dedup.incrementalMinhashCandidates(
        Dedup.minhashBandRows(index, numHashes = 32, bands = 8), batch,
        numHashes = 32, bands = 8)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(stored == fresh,
      "the probe must read the STORED parameters — a caller-side " +
        "default (64, 16) here would bucket the batch differently")
  }

  test("addBandsBatch honors the new-id anti-join contract and is a fixpoint on re-add") {
    val part1 = docs.filter(pmod(col("doc_id"), lit(10)) < 4)
    val part2 = docs.filter(pmod(col("doc_id"), lit(10)).between(4, 5))
    val root = freshRoot("bandindex_spec_add")
    BandIndex.buildBands(part1, root)
    // overlapping add: part1 ∪ part2 — only part2's ids are new
    val n1 = BandIndex.addBandsBatch(
      docs.filter(pmod(col("doc_id"), lit(10)) < 6), root)
    assert(n1 == part2.count(), s"only new ids must be indexed, got $n1")
    // the stored table now equals a one-shot build over part1 ∪ part2
    val got = spark.read.parquet(s"$root/bands")
      .select(col("doc_id"), col("band_idx"), col("band_hash"))
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val oneShot = Dedup
      .minhashBandRows(docs.filter(pmod(col("doc_id"), lit(10)) < 6))
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got == oneShot,
      "incremental add must equal the one-shot build row-for-row")
    // fixpoint: re-adding the same slice indexes nothing and changes nothing
    val n2 = BandIndex.addBandsBatch(
      docs.filter(pmod(col("doc_id"), lit(10)) < 6), root)
    assert(n2 == 0L)
    val after = spark.read.parquet(s"$root/bands")
      .select(col("doc_id"), col("band_idx"), col("band_hash"))
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(after == oneShot, "a fixpoint re-add must write nothing")
  }

  test("ensureBands rebuilds on a stale fingerprint, is a no-op when fresh, and tracks adds") {
    val part1 = docs.filter(pmod(col("doc_id"), lit(10)) < 4)
    val part2 = docs.filter(pmod(col("doc_id"), lit(10)).between(4, 5))
    val root = freshRoot("bandindex_spec_stale")
    // absent → build; same docs again → recognized fresh, no rebuild
    assert(BandIndex.ensureBands(part1, root))
    assert(!BandIndex.ensureBands(part1, root))
    // the dataset "regenerated in place" (different id set, same root):
    // the fingerprint mismatch must force a rebuild, and the rebuilt
    // index must answer like a fresh one over the NEW corpus
    assert(BandIndex.ensureBands(part2, root))
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
    val stored = BandIndex.candidates(spark, root, batch)
      .as[(Long, Long)].collect().sorted.toSeq
    val fresh = Dedup.incrementalMinhashCandidates(
        Dedup.minhashBandRows(part2), batch)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(stored == fresh, "post-rebuild probe must match a fresh index")
    // a parameter change alone is also staleness
    assert(BandIndex.ensureBands(part2, root, numHashes = 32, bands = 8))
    // incremental adds keep the fingerprint current: after an add, the
    // UNION corpus is recognized as fresh (no spurious rebuild)
    val root2 = freshRoot("bandindex_spec_stale2")
    BandIndex.buildBands(part1, root2)
    BandIndex.addBandsBatch(part2, root2)
    assert(!BandIndex.ensureBands(part1.unionByName(part2), root2),
      "add must fold new ids into the stored fingerprint")
  }

  test("IO10 compaction after N deferred adds: fewer files, identical candidates, fixpoint") {
    val root = freshRoot("bandindex_spec_compact")
    def bandFiles(): Map[String, Int] = {
      val base = new java.io.File(s"$root/bands")
      base.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("band_idx="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    BandIndex.buildBands(docs.filter(pmod(col("doc_id"), lit(10)) === 0),
      root)
    // three deferred-maintenance adds accumulate small files per band
    (1 to 3).foreach { r =>
      BandIndex.addBandsBatch(
        docs.filter(pmod(col("doc_id"), lit(10)) === r), root,
        maxFilesPerBand = Int.MaxValue)
    }
    val before = bandFiles()
    assert(before.values.exists(_ > 1),
      s"adds should have accumulated files per band: $before")
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
    def answers() = BandIndex.candidates(spark, root, batch)
      .as[(Long, Long)].collect().sorted.toSeq
    val preCompact = answers()
    val n1 = BandIndex.compactBands(spark, root, maxFilesPerBand = 1)
    assert(n1 > 0, "first compaction must rewrite the accumulated bands")
    assert(bandFiles().values.forall(_ <= 1),
      s"bands not compacted: ${bandFiles()}")
    assert(answers() == preCompact,
      "compaction is layout maintenance — candidates must not change")
    assert(BandIndex.compactBands(spark, root, maxFilesPerBand = 1) == 0,
      "second pass must be a fixpoint")
    // the WIRED path: an add with the bound enabled leaves bands at it
    BandIndex.addBandsBatch(
      docs.filter(pmod(col("doc_id"), lit(10)) === 4), root,
      maxFilesPerBand = 1)
    assert(bandFiles().values.forall(_ <= 1),
      s"wired add must compact past the bound: ${bandFiles()}")
  }
}
