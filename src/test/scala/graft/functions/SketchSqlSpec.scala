package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch family at the SQL surface (GraftExtensions registers
  * misra_gries / count_min / kll alongside topk/bottomk/dotp/eqcount):
  * proofs mirror each sketch's contract — CMS is order-independent so
  * SQL must equal the DataFrame facade bitwise; MG candidates are
  * order-dependent lower-bound summaries so SQL is held to the
  * guarantee (superset of true heavy hitters, ≤ k counters); KLL is
  * derandomized so on a pinned partition layout SQL equals the facade
  * exactly.
  */
class SketchSqlSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tokens = (1 to 400).map { i =>
    val t = if (i % 3 == 0) "alpha" else if (i % 5 == 0) "beta" else s"rare$i"
    (i.toLong, t)
  }.toDF("id", "tok")

  test("count_min in SQL equals the DataFrame facade exactly") {
    tokens.createOrReplaceTempView("cms_in")
    val viaSql = spark.sql("SELECT count_min(tok, 3, 64) AS s FROM cms_in")
      .as[Seq[Long]].head()
    val viaDf = tokens.agg(cmsSketch(col("tok"), 3, 64).as("s"))
      .as[Seq[Long]].head()
    assert(viaSql == viaDf)
    // and the point estimate over the SQL sketch upper-bounds truth
    val est = spark.sql("SELECT count_min(tok, 3, 64) AS s FROM cms_in")
      .select(cmsPointEstimate(col("s"), "alpha", 3, 64).as("e"))
      .as[Long].head()
    assert(est >= 133, s"alpha occurs 133 times, estimate $est")
  }

  test("misra_gries in SQL keeps the frequency guarantee on a multi-partition frame") {
    tokens.repartition(8).createOrReplaceTempView("mg_in")
    val cand = spark.sql("SELECT misra_gries(tok, 10) AS c FROM mg_in")
      .as[Seq[String]].head()
    // freq > n/k = 40: alpha (133) and beta (53) must both survive
    assert(cand.size <= 10)
    assert(cand.contains("alpha") && cand.contains("beta"), cand.toString)
  }

  test("kll in SQL equals the DataFrame facade on a pinned layout") {
    val vals = (1 to 1000).map(i => ((i * 37 % 1000).toDouble, i))
      .toDF("v", "id").repartition(1)
    vals.createOrReplaceTempView("kll_in")
    val viaSql = spark.sql("SELECT kll(v, 64) AS s FROM kll_in")
      .as[Seq[Double]].head()
    val viaDf = vals.agg(kllSketch(col("v"), 64).as("s"))
      .as[Seq[Double]].head()
    assert(viaSql == viaDf)
    val q50 = spark.sql("SELECT kll(v, 64) AS s FROM kll_in")
      .select(kllQuantile(col("s"), 0.5).as("q")).as[Double].head()
    assert(math.abs(q50 - 500.0) < 100, s"median estimate $q50")
  }

  test("sketch SQL functions reject non-literal parameters loudly") {
    tokens.createOrReplaceTempView("mg_err")
    val e = intercept[Exception] {
      spark.sql("SELECT misra_gries(tok, id) FROM mg_err").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }
}
