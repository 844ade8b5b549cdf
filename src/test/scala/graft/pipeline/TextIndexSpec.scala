package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class TextIndexSpec extends AnyFunSuite {
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

  private val terms = Seq("spark", "hash", "window")

  test("stored BM25 answers EXACTLY like the fresh bm25TopK") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val root = freshRoot("bm25_spec_eq")
    TextIndex.buildBm25(docs, root)
    val stored = TextIndex.bm25Query(spark, root, terms, k = 20)
      .select("doc_id", "dl", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    val fresh = TextAnalysis.bm25TopK(docs, terms, k = 20)
      .select("doc_id", "dl", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stored == fresh)
    assert(stored.nonEmpty)
  }

  test("incremental add: half-build + half-add EQUALS one-shot build") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val root = freshRoot("bm25_spec_incr")
    TextIndex.buildBm25(docs.filter(col("doc_id") % 2 === 0), root)
    TextIndex.addBm25Batch(docs.filter(col("doc_id") % 2 =!= 0), root)
    val rootFull = freshRoot("bm25_spec_full")
    TextIndex.buildBm25(docs, rootFull)
    def q(r: String) = TextIndex.bm25Query(spark, r, terms, k = 20)
      .select("doc_id", "dl", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(q(root) == q(rootFull))
    // stats advanced exactly, not approximately
    val a = spark.read.parquet(s"$root/stats").head()
    val b = spark.read.parquet(s"$rootFull/stats").head()
    assert((a.getLong(0), a.getLong(1), a.getLong(2)) ==
      ((b.getLong(0), b.getLong(1), b.getLong(2))))
  }

  test("IO10 compaction of the index after N adds: fewer files, " +
      "identical answers, fixpoint on the second pass") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val root = freshRoot("bm25_spec_compact")
    def bucketFiles(): Map[String, Int] = {
      val base = new java.io.File(s"$root/postings")
      base.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("tok_bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    TextIndex.buildBm25(docs.filter(col("doc_id") % 4 === 0), root,
      nBuckets = 8)
    (1 to 3).foreach { r =>
      TextIndex.addBm25Batch(docs.filter(col("doc_id") % 4 === r), root,
        nBuckets = 8, maxFilesPerBucket = Int.MaxValue)
    }
    val before = bucketFiles()
    assert(before.values.exists(_ > 1),
      s"adds should have accumulated files per bucket: $before")
    def answers() = TextIndex
      .bm25Query(spark, root, terms, k = 20, nBuckets = 8)
      .select("doc_id", "dl", "n_terms", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    val preCompact = answers()
    val n1 = TextIndex.compactIndex(spark, root, maxFilesPerDir = 1)
    assert(n1 > 0, "first compaction must rewrite the accumulated dirs")
    assert(bucketFiles().values.forall(_ <= 1),
      s"buckets not compacted: ${bucketFiles()}")
    assert(answers() == preCompact,
      "compaction is layout maintenance — answers must not change")
    assert(TextIndex.compactIndex(spark, root, maxFilesPerDir = 1) == 0)
  }

  test("query plan is read-only and bucket-pruned — no tokenization") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val root = freshRoot("bm25_spec_plan")
    TextIndex.buildBm25(docs, root)
    val plan = TextIndex.bm25Query(spark, root, terms, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      "postings scan should prune token-hash buckets:\n" + plan)
    assert(!plan.contains("split("),
      "tokenization leaked into the stored query path:\n" + plan)
  }
}
