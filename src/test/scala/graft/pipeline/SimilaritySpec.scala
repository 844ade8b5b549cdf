package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.{Tables, TestSpark}

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("brute-force top-k: k results per query, ranked by similarity") {
    val res = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val byQuery = res.select("query_id", "rnk", "cos_sim")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        "cos_sim must be non-increasing in rank")
    }
  }

  test("lsh top-k results are a subset of plausible neighbors with correct scores") {
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 50)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH returned nothing")
    // every LSH hit that also appears in the exact top-50 must agree on score
    lsh.foreach { case (q, n, c) =>
      exact.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // OR-amplified multi-table LSH must recover >= half of the exact top-10
    val exact10 = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hit = exact10.count { case (q, n) => lsh.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"LSH recall too low: $hit of ${exact10.length}")
  }

  test("ivf top-k: correct scores and reasonable recall vs exact") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact10 = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact10.map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty, "IVF returned nothing")
    // scores must agree exactly with brute force wherever they overlap
    ivf.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // probing half the cells should recover >= half of the exact top-10
    val hit = exact10.count { case (q, n, _) => ivf.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"IVF recall too low: $hit of ${exact10.length}")
  }

  test("pq top-k: exact rerank scores and reasonable recall vs exact") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact10 = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact10.map { case (q, n, c) => (q, n) -> c }.toMap
    val pq = Similarity.pqTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(pq.length == 30, s"expected 10 results × 3 queries, got ${pq.length}")
    // the final stage is an exact rescore: overlapping pairs must agree
    pq.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // an ADC shortlist of 5k candidates should recover >= half of top-10
    val hit = exact10.count { case (q, n, _) => pq.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"PQ recall too low: $hit of ${exact10.length}")
  }

  test("identical vector is its own nearest neighbor when duplicated") {
    val e = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0), k = 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(top1._1 == 1L && math.abs(top1._2 - 1.0) < 1e-9)
  }
}
