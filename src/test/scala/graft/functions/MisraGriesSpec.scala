package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MisraGriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("guarantee: items with freq > n/k survive eviction and merge") {
    // 10,000 tokens: "hot" 15%, "warm" 6%, the rest unique fillers —
    // far more distinct items than counters, so eviction churns
    // constantly, and 8 partitions force partial-buffer merges.
    val rows = new scala.util.Random(7).shuffle(
      Seq.fill(1500)("hot") ++ Seq.fill(600)("warm") ++
        (0 until 7900).map(i => s"f$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("t")
    val cands = df.agg(heavyHitterCandidates($"t", 20).as("c"))
      .head.getSeq[String](0)
    // n/k = 5%: both hot (15%) and warm (6%) MUST be present
    assert(cands.contains("hot") && cands.contains("warm"))
    assert(cands.size <= 20, s"summary exceeded k: ${cands.size}")
    // output is sorted for determinism
    assert(cands == cands.sorted)
  }

  test("grouped: per-group summaries stay independent") {
    val df = (Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y")) ++
      (0 until 30).map(i => ("a", s"fa$i")) ++
      (0 until 30).map(i => ("b", s"fb$i"))).toDF("g", "t")
    val got = df.groupBy($"g")
      .agg(heavyHitterCandidates($"t", 4).as("c"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("a").contains("x") && !got("a").contains("y"))
    assert(got("b").contains("y") && !got("b").contains("x"))
  }

  test("exact when distinct items fit in k counters") {
    val df = Seq("p", "q", "p", "r", "p", "q").toDF("t")
    val cands = df.agg(heavyHitterCandidates($"t", 10).as("c"))
      .head.getSeq[String](0)
    assert(cands.sorted == Seq("p", "q", "r"))
  }

  test("property: batch-weight add ≡ repeated unit adds (randomized)") {
    // MGBuffer.add's batch-decrement loop claims equivalence to feeding
    // the item w times with weight 1. Drive both buffers through the
    // same random stream (small alphabet + small k so eviction churns)
    // and require identical surviving (item, weight) counters after
    // every single operation — not just at the end.
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(4)
      val batch = new MGBuffer(k)
      val unit = new MGBuffer(k)
      for (step <- 1 to 400) {
        val item = s"i${rnd.nextInt(12)}"
        val w = 1L + rnd.nextInt(9)
        batch.add(item, w)
        (1L to w).foreach(_ => unit.add(item, 1L))
        assert(batch.entries.sortBy(_._1).toSeq ==
          unit.entries.sortBy(_._1).toSeq,
          s"diverged at seed=$seed step=$step k=$k item=$item w=$w")
      }
    }
  }

  test("non-string input rejected at analysis time") {
    val df = Seq(1, 2, 3).toDF("v")
    val e = intercept[Exception] {
      df.agg(heavyHitterCandidates($"v", 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
