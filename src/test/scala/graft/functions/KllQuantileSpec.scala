package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class KllQuantileSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("exact below capacity: no compaction, quantiles are stream elements at the right rank") {
    val k = 64
    val vals = new scala.util.Random(3).shuffle((1 to 50).map(_.toDouble))
    val sk = vals.toDF("v").agg(kllSketch($"v", k).as("sk"))
    val got = sk.select(
      kllQuantile($"sk", 0.5).as("p50"),
      kllQuantile($"sk", 0.02).as("p02"),
      kllQuantile($"sk", 1.0).as("p100")).head()
    assert(got.getDouble(0) == 25.0) // first cum >= 0.5*50
    assert(got.getDouble(1) == 1.0)
    assert(got.getDouble(2) == 50.0)
  }

  test("weights sum to n through compaction and partial-agg merges") {
    val n = 10000
    val df = spark.sparkContext
      .parallelize((0 until n).map(i => ((i * 2654435761L) % 100000).toDouble), 16)
      .toDF("v")
    val sk = df.agg(kllSketch($"v", 32).as("sk")).head.getSeq[Double](0)
    val total = sk.grouped(2).map(_(1)).sum
    assert(total == n.toDouble, s"summary mass $total != $n")
    // the summary is genuinely bounded: far fewer entries than n
    assert(sk.length / 2 < 32 * 16, s"summary size ${sk.length / 2}")
  }

  test("rank error within the deterministic n*L/k bound on a churny merged stream") {
    val n = 20000
    val k = 64
    val rnd = new scala.util.Random(17)
    val vals = Array.fill(n)(rnd.nextDouble() * 1e6)
    val df = spark.sparkContext.parallelize(vals.toSeq, 16).toDF("v")
    val skRow = df.agg(kllSketch($"v", k).as("sk"))
    val phis = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val ests = skRow.select(phis.map(p =>
      kllQuantile($"sk", p).as(s"p$p")): _*).head()
    val sorted = vals.sorted
    val levels = math.ceil(math.log(n.toDouble / k) / math.log(2)).max(1) + 1
    val bound = n * levels / k
    phis.zipWithIndex.foreach { case (phi, i) =>
      val est = ests.getDouble(i)
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - phi * n) <= bound,
        s"phi=$phi: rank $rank vs target ${phi * n}, bound $bound")
    }
  }

  test("grouped sketches independent; estimates land inside each group's range") {
    val df = ((0 until 500).map(i => ("lo", i.toDouble)) ++
      (0 until 500).map(i => ("hi", 10000.0 + i))).toDF("g", "v")
    val got = df.groupBy($"g").agg(kllSketch($"v", 16).as("sk"))
      .select($"g", kllQuantile($"sk", 0.5).as("p50"))
      .as[(String, Double)].collect().toMap
    assert(got("lo") >= 0.0 && got("lo") < 500.0)
    assert(got("hi") >= 10000.0 && got("hi") < 10500.0)
  }
}
