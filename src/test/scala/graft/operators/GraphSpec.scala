package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("pageRank: star graph — hub dominates, leaves tie, mass sums to 1") {
    // undirected star 1–2, 1–3: deg(1)=2, deg(2)=deg(3)=1, N=3
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 1)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    // one hand-computed iteration from r0 = 1/3:
    //   r(1) = 0.15/3 + 0.85·(1/3 + 1/3)        = 0.616666666667
    //   r(2) = r(3) = 0.15/3 + 0.85·(1/3 / 2)   = 0.191666666667
    assert(math.abs(r(1L) - 0.61666667) < 1e-6, s"hub ${r(1L)}")
    assert(r(2L) == r(3L), "symmetric leaves tie exactly")
    // output ranks round at 8dp, so 3 nodes can drift the sum ~1.5e-8
    assert(math.abs(r.values.sum - 1.0) < 2e-8, "rank is a distribution")
  }

  test("pageRank: regular graph stays uniform at any depth") {
    // 4-cycle: every node deg 2 — PageRank must stay 1/4 each round
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 4)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    assert(r.size == 4)
    assert(r.values.forall(v => math.abs(v - 0.25) < 1e-9), r.toString)
  }

  test("pageRank: more in-links means more rank after convergence steps") {
    // node 100 linked by 5 spokes; node 200 by 1
    val edges = (Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (5L, 100L), (6L, 200L))).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    assert(r(100L) > r(200L))
    assert(math.abs(r.values.sum - 1.0) < 1e-8)
  }
}
