package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("langid: stopword-heavy english vs CJK gate") {
    val df = Seq(
      (0L, "the cat is on the mat and it is a good cat"),
      (1L, "der hund ist nicht ein kleiner hund und der ist gut"),
      (2L, "你好世界这是一个测试")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(df).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "en")
    assert(got(1L) == "de")
    assert(got(2L) == "zh")
  }

  test("quality: ratios computed as specified") {
    val df = Seq((0L, "the quick fox. it runs!")).toDF("doc_id", "text")
    val r = TextAnalysis.withQuality(df)
      .select("n_chars_", "n_tokens", "punct_ratio", "stop_ratio")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 23L)
    assert(r._2 == 5L) // the quick fox. it runs!
    assert(math.abs(r._3 - 2.0 / 23) < 1e-6)
    assert(math.abs(r._4 - 2.0 / 5) < 1e-6) // "the", "it"
  }

  test("token counts: ws vs bpe-ish segmentation") {
    val df = Seq((0L, "hello world42 x!y")).toDF("doc_id", "text")
    val r = TextAnalysis.withTokenCounts(df)
      .select("ws_tokens", "bpeish_tokens").as[(Long, Long)].head()
    assert(r._1 == 3L)
    // hello | world | 42 | x | ! | y
    assert(r._2 == 6L)
  }

  test("fingerprint: deterministic and order-sensitive") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = TextAnalysis.withFingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }
}
