package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CountMinSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 256

  test("never undercounts, overcounts within e/w bound on a churny stream") {
    // 8,000 tokens, zipf-ish: a few heavy items + a long unique tail,
    // 8 partitions so partial sketches genuinely merge.
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      Seq.fill(900)("alpha") ++ Seq.fill(500)("beta") ++
        Seq.fill(120)("gamma") ++ (0 until 6480).map(i => s"tail$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("t")
    val sk = df.agg(cmsSketch($"t", D, W).as("sk"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val probes = Seq("alpha", "beta", "gamma", "tail7", "absent-item")
    val ests = sk.select(probes.map(p =>
      cmsPointEstimate($"sk", p, D, W).as(p)): _*).head()
    probes.zipWithIndex.foreach { case (p, i) =>
      val est = ests.getLong(i)
      val ex = exact.getOrElse(p, 0L)
      assert(est >= ex, s"$p: CMS undercounted ($est < $ex)")
      assert(est <= ex + math.ceil(math.E / W * n).toLong,
        s"$p: overcount beyond e/w*N bound ($est vs $ex, n=$n)")
    }
  }

  test("merge is exact counter addition: sharded == whole-stream sketch") {
    val rows = (0 until 500).map(i => s"x${i % 37}")
    val whole = rows.toDF("t")
      .agg(cmsSketch($"t", D, W)).head.getSeq[Long](0)
    val sharded = spark.sparkContext.parallelize(rows, 7).toDF("t")
      .agg(cmsSketch($"t", D, W)).head.getSeq[Long](0)
    assert(whole == sharded,
      "CMS must be partitioning-independent (counter addition commutes)")
  }

  test("grouped sketches stay independent and estimates are exact when sparse") {
    val df = (Seq.fill(40)(("a", "hot")) ++ Seq.fill(25)(("b", "cold")) ++
      Seq.fill(3)(("a", "rare"))).toDF("g", "t")
    val sk = df.groupBy($"g").agg(cmsSketch($"t", D, W).as("sk"))
    val got = sk.select($"g",
        cmsPointEstimate($"sk", "hot", D, W).as("hot"),
        cmsPointEstimate($"sk", "cold", D, W).as("cold"),
        cmsPointEstimate($"sk", "rare", D, W).as("rare"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, h, c, r) => g -> ((h, c, r)) }.toMap
    // 2-3 distinct items in 256 buckets x 4 rows: no collisions, exact
    assert(got("a") == ((40L, 0L, 3L)))
    assert(got("b") == ((0L, 25L, 0L)))
  }

  test("rollup by zip_with addition equals one-shot sketch") {
    val rows = (0 until 300).map(i => (s"p${i % 3}", s"tok${i % 29}"))
    val parts = rows.toDF("p", "t")
      .groupBy($"p").agg(cmsSketch($"t", D, W).as("sk"))
    val rolled = parts.agg(aggregate(collect_list($"sk"),
        array_repeat(lit(0L), D * W),
        (acc, x) => zip_with(acc, x, (a, b) => a + b)).as("sk"))
      .head.getSeq[Long](0)
    val oneShot = rows.toDF("p", "t")
      .agg(cmsSketch($"t", D, W)).head.getSeq[Long](0)
    assert(rolled == oneShot,
      "partition-sketch rollup must equal the one-shot corpus sketch")
  }
}
