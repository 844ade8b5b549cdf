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

  test("pii: emails, ips, phone runs counted and masked") {
    val df = Seq(
      (0L, "contact alice@example.com or bob.smith+x@mail.co today"),
      (1L, "server at 10.0.0.1 and 192.168.1.255 up"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withPiiRedaction(df)
      .select("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(0L)._2 == 2 && r(0L)._5 == "contact <EMAIL> or <EMAIL> today")
    assert(r(1L)._3 == 2 && r(1L)._5 == "server at <IP> and <IP> up")
    assert(r(2L)._4 == 1 && r(2L)._5 == "call <PHONE> now")
    assert(r(3L)._2 == 0 && r(3L)._3 == 0 && r(3L)._4 == 0
      && r(3L)._5 == "clean text with no pii at all")
  }

  test("repetition: dup-token and top-bigram ratios") {
    val df = Seq(
      (0L, "a a a a"),          // 1 distinct of 4 tokens; bigram "a a" ×3
      (1L, "w x y z"),          // all distinct; each bigram unique
      (2L, "solo")              // 1 token, no bigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetition(df)
      .as[(Long, Double, Double)].collect().map(x => x._1 -> x).toMap
    assert(math.abs(r(0L)._2 - 0.75) < 1e-6)
    assert(math.abs(r(0L)._3 - 1.0) < 1e-6)
    assert(math.abs(r(1L)._2 - 0.0) < 1e-6)
    assert(math.abs(r(1L)._3 - (1.0 / 3)) < 1e-4)
    assert(math.abs(r(2L)._2 - 0.0) < 1e-6)
    assert(math.abs(r(2L)._3 - 0.0) < 1e-6)
  }
}
