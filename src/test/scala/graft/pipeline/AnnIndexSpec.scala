package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class AnnIndexSpec extends AnyFunSuite {
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

  test("stored IVF index answers EXACTLY like a freshly-trained ivfTopK") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_eq")
    AnnIndex.buildIvf(emb, root)
    val q = emb.filter(col("vec_id") < 8)
    val stored = AnnIndex.ivfQuery(spark, root, q, k = 10)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    val fresh = Similarity.ivfTopK(emb, q, 10)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(stored == fresh,
      "persisted index must reproduce the fresh training bit-for-bit " +
        "(same seeds, same arithmetic, exact parquet round-trip)")
    assert(stored.nonEmpty)
  }

  test("addIvfBatch appends assign-only postings: incremental == one-shot assignment") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_incr")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.buildIvf(half1, root)
    AnnIndex.addIvfBatch(half2, root)
    // expected: the FULL corpus assigned to the half1-trained stored
    // centroids in one shot (append must be a pure union, no recluster)
    val cents = spark.read.parquet(s"$root/centroids")
    val expected = Similarity
      .assignCells(Dedup.normalized(emb), cents)
      .select(col("cell_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val got = spark.read.parquet(s"$root/postings")
      .select(col("cell_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // and the combined index serves queries over BOTH halves
    val res = AnnIndex.ivfQuery(spark, root,
      emb.filter(col("vec_id") < 5), k = 10)
    assert(res.filter(col("neighbor_id") % 2 =!= 0).count() > 0,
      "batch-added vectors must be retrievable")
  }

  test("stored IVF-PQ answers EXACTLY like a freshly-trained ivfpqTopK") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_ivfpq")
    AnnIndex.buildIvfPq(emb, root)
    val q = emb.filter(col("vec_id") < 8)
    val stored = AnnIndex.ivfpqQuery(spark, root, q, k = 10)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    val fresh = Similarity.ivfpqTopK(emb, q, 10)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(stored == fresh)
    assert(stored.nonEmpty)
  }

  test("addIvfBatch rejects a wrong-dimension batch loudly") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_dim")
    AnnIndex.buildIvf(emb, root)
    val bad = Seq((900001L, Array(0.1f, 0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.addIvfBatch(bad, root)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("IO10 compaction of the postings after N adds: fewer files, " +
      "identical answers, fixpoint on the second pass") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_compact")
    def cellFiles(): Map[String, Int] = {
      val base = new java.io.File(s"$root/postings")
      base.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    AnnIndex.buildIvf(emb.filter(col("vec_id") % 4 === 0), root)
    // three deferred-maintenance adds accumulate small files per cell
    (1 to 3).foreach { r =>
      AnnIndex.addIvfBatch(emb.filter(col("vec_id") % 4 === r), root,
        maxFilesPerCell = Int.MaxValue)
    }
    val before = cellFiles()
    assert(before.values.exists(_ > 1),
      s"adds should have accumulated files per cell: $before")
    val q = emb.filter(col("vec_id") < 8)
    def answers() = AnnIndex.ivfQuery(spark, root, q, k = 10)
      .select("query_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    val preCompact = answers()
    val n1 = AnnIndex.compactPostings(spark, root, maxFilesPerCell = 1)
    assert(n1 > 0, "first compaction must rewrite the accumulated cells")
    assert(cellFiles().values.forall(_ <= 1),
      s"cells not compacted: ${cellFiles()}")
    assert(answers() == preCompact,
      "compaction is layout maintenance — answers must not change")
    // fixpoint: a second pass finds nothing to do
    assert(AnnIndex.compactPostings(spark, root, maxFilesPerCell = 1) == 0)
    // and the WIRED path: an add with the bound enabled leaves every
    // touched cell at or under it
    AnnIndex.addIvfBatch(
      emb.filter(col("vec_id") % 4 === 1)
        .withColumn("vec_id", col("vec_id") + lit(10000000L)),
      root, maxFilesPerCell = 1)
    assert(cellFiles().values.forall(_ <= 1),
      s"wired add must compact past the bound: ${cellFiles()}")
  }

  test("ivfQuery is read-only: its plan scans the stored tables, no training") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val root = freshRoot("annindex_spec_plan")
    AnnIndex.buildIvf(emb, root)
    val plan = AnnIndex.ivfQuery(spark, root,
        emb.filter(col("vec_id") < 5), k = 10)
      .queryExecution.executedPlan.toString
    // the postings scan must be the partitioned parquet layout (cell_id
    // is a partition column, so probing prunes at the file level)
    assert(plan.contains("PartitionFilters") ||
      plan.toLowerCase.contains("dynamicpruning"),
      "postings scan should carry partition-level pruning:\n" + plan)
    // no aggregate over corpus vectors = no Lloyd's round in the plan;
    // the only aggregation the query needs is... none — probes and
    // top-k are windows + joins. A HashAggregate here would mean a
    // training step leaked in. (distinct/partial aggs of the tiny
    // centroid read are fine; corpus-scale ones are not — assert none.)
    assert(!plan.contains("avg("),
      "centroid recomputation (Lloyd's) leaked into the query plan:\n" + plan)
  }
}
