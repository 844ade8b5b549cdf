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

  test("vocabulary: frequency-then-token rank, capped, ids dense from 0") {
    val df = Seq(
      (0L, "b b b a a c"),
      (1L, "a d b")
    ).toDF("doc_id", "text")
    // counts: a=3, b=4, c=1, d=1 → rank: b(0), a(1), c(2), d(3)
    val v = TextAnalysis.vocabulary(df, vocabSize = 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(v == Seq((0L, "b", 4L), (1L, "a", 3L), (2L, "c", 1L)))
  }

  test("withLengthOutliers: lower-median/MAD from histograms, MAD=0 safe") {
    def doc(id: Long, src: String, n: Int) =
      (id, (1 to n).map(_ => "w").mkString(" "), src)
    val df = Seq(
      doc(0, "a", 5), doc(1, "a", 5), doc(2, "a", 6), doc(3, "a", 7),
      doc(4, "a", 100), // lengths [5,5,6,7,100]: med=6 (rank 3), MAD=1
      doc(5, "b", 4), doc(6, "b", 4), doc(7, "b", 4) // constant: MAD=0
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.withLengthOutliers(df)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    got.filter(_._2 == "a").foreach { r =>
      assert(r._4 == 6L && r._5 == 1L, s"median/MAD wrong: $r")
    }
    // only the 100-token doc exceeds 3.5 robust z-units (0.6745·94/1)
    assert(got.filter(_._2 == "a").map(g => g._1 -> g._6).toMap ==
      Map(0L -> false, 1L -> false, 2L -> false, 3L -> false, 4L -> true))
    // a constant-length group has MAD 0 and must flag nothing
    got.filter(_._2 == "b").foreach { r =>
      assert(r._4 == 4L && r._5 == 0L && !r._6, s"MAD=0 mishandled: $r")
    }
  }

  test("corpusStats: exact percentiles by rank rule, dup counts, lang diversity") {
    def doc(id: Long, n: Int, lang: String, text: String = null) =
      (id, Option(text).getOrElse((1 to n).map(i => s"t$i").mkString(" ")),
        lang, "s")
    // token lengths [2,3,3,4,6,10] (docs 3 and 5 share a 3-token text):
    // tc=6 → p10 rank (6+9)//10=1 → 2; p50 rank (6+1)//2=3 → 3;
    // p90 rank (54+9)//10=6 → 10. One planted exact dup pair.
    val df = Seq(
      doc(0, 2, "en"), doc(1, 4, "en"), doc(2, 6, "fr"),
      doc(3, 8, "en", "same text twice"), doc(4, 10, "de"),
      doc(5, 8, "en", "same text twice")
    ).toDF("doc_id", "text", "lang", "source")
    val row = TextAnalysis.corpusStats(df)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .head()
    assert(row._1 == "s" && row._2 == 6L)
    assert(row._4 == 2L, s"p10 ${row._4}")
    assert(row._5 == 3L, s"p50 ${row._5}")
    assert(row._6 == 10L, s"p90 ${row._6}")
    assert(row._7 == 1L, s"n_exact_dup ${row._7}")
    assert(row._8 == 3L, s"n_langs ${row._8}")
    assert(row._9 > 0.0)
  }

  test("tfidfTopK: hand-computed scores, rank order, token tiebreak") {
    val df = Seq((0L, "a a b"), (1L, "b c"), (2L, "c c d")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(df, vocabSize = 10)
    val got = TextAnalysis.tfidfTopK(df, vocab, k = 3)
      .orderBy("doc_id", "tfidf_rank")
      .as[(Long, String, Long, Long, Double, Long)].collect()
    // N=3; df: a 1, b 2, c 2, d 1; idf_rare = ln(4/2)+1, idf_common = ln(4/3)+1
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r3(x: Double) = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rare = r6(math.log(4.0 / 2.0) + 1.0)
    val common = r6(math.log(4.0 / 3.0) + 1.0)
    assert(got.map(g => (g._1, g._2, g._6)).toSeq == Seq(
      (0L, "a", 1L), (0L, "b", 2L),
      (1L, "b", 1L), (1L, "c", 2L), // tie at tf=1, df=2 → token order
      (2L, "c", 1L), (2L, "d", 2L)))
    val byKey = got.map(g => (g._1, g._2) -> g._5).toMap
    assert(byKey((0L, "a")) == r3(2 * rare))   // tf=2, rare token
    assert(byKey((1L, "b")) == r3(1 * common))
    assert(byKey((2L, "d")) == r3(1 * rare))
  }

  test("encodeTokens: document order preserved, OOV as -1, counts right") {
    val df = Seq(
      (0L, "b b b a a c"),
      (1L, "a d b")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(df, vocabSize = 3) // b,a,c — d is OOV
    val enc = TextAnalysis.encodeTokens(df, vocab)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(enc(0) == ((0L, 6L, 0L, "0,0,0,1,1,2")))
    assert(enc(1) == ((1L, 3L, 1L, "1,-1,0")))
  }

  test("bigram xent: add-one smoothed ln probabilities, hand-computed") {
    val df = Seq(
      (0L, "a b a b"),
      (1L, "a c"),
      (2L, "x")          // <2 tokens → no bigrams, null xent
    ).toDF("doc_id", "text")
    // unigrams: a=3, b=2, c=1, x=1 → V=4
    // bigrams: "a b"=2, "b a"=1, "a c"=1
    def lp(c12: Long, c1: Long) =
      BigDecimal(math.log((c12 + 1.0) / (c1 + 4.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp0 = BigDecimal(-(lp(2, 3) + lp(1, 2) + lp(2, 3)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = BigDecimal(-lp(1, 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val got = TextAnalysis.withBigramXent(df)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect()
    assert(got(0)._2 == 3L && math.abs(got(0)._3.get - exp0) < 1e-9)
    assert(got(1)._2 == 1L && math.abs(got(1)._3.get - exp1) < 1e-9)
    assert(got(2)._2 == 0L && got(2)._3.isEmpty)
    // operator must not leak persisted state past its own checkpointed
    // result (SURVEY §5 rule)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.size <= 1,
      s"withBigramXent leaked ${leaked.size} persisted RDDs")
  }

  test("winnowing: matches reference selection incl. rightmost-tie rule") {
    // scala reference implementation of the paper's algorithm
    def poly(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 4294967296L)
    def ref(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val ts = text.trim.toLowerCase.split("\\s+").toSeq
      if (ts.size < k) Set.empty
      else {
        val hs = (0 to ts.size - k).map(i => poly(ts.slice(i, i + k).mkString(" ")))
        (0 to math.max(hs.size - w, 0)).map { q =>
          val win = hs.zipWithIndex.slice(q, q + w)
          val m = win.map(_._1).min
          (win.filter(_._1 == m).map(_._2).max.toLong, m) // rightmost min
        }.toSet
      }
    }
    val texts = Seq(
      (0L, "a b a b a b c d a b"),       // repeats → hash ties
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "x y"),                        // < k tokens → nothing
      (3L, "p q r"))                      // exactly one shingle
    val got = TextAnalysis.winnowFingerprints(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    texts.foreach { case (id, txt) =>
      val r = ref(txt, 3, 4)
      assert(got.getOrElse(id, Set.empty) == r, s"doc $id")
    }
    // coverage guarantee: every w-window of shingle positions holds a
    // selected position (this is winnowing's whole point)
    val sel1 = got(1L).map(_._1)
    val nk = texts(1)._2.split(" ").length - 3 + 1
    (0 to nk - 4).foreach { q =>
      assert(sel1.exists(p => p >= q && p < q + 4), s"window $q uncovered")
    }
  }

  test("gopherRules: each rule rejects independently, keep is the conjunction") {
    val docs = Seq(
      // passes all rules: 6 words (minWords=5 below), mean len in
      // bounds, all alpha, two distinct stopwords
      (0L, "the quick brown fox and turtle"),
      (1L, "the cat"),                          // too few words
      (2L, "the xx of 11 22 33"),               // alpha_frac 3/6 = 0.5
      (3L, "zz yy xx ww vv uu"),                // zero stopwords
      (4L, "a bb supercalifragilisticexpialidocious " +
        "pneumonoultramicroscopicsilicovolcanoconiosis the of") // mean len > 10
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withGopherRules(docs, minWords = 5)
      .select("doc_id", "gopher_keep")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> false,
      3L -> false, 4L -> false))
    val r0 = TextAnalysis.withGopherRules(docs, minWords = 5)
      .filter($"doc_id" === 0L)
      .select("n_words", "mean_word_len", "alpha_frac", "n_stop_distinct")
      .as[(Long, Double, Double, Long)].head()
    // "the quick brown fox and turtle": 25 chars over 6 words, rounded 6dp
    assert(r0 == ((6L, 4.166667, 1.0, 2L)))
  }

  test("winnowPairs: shared token run found, disjoint docs not paired") {
    val common = "one two three four five six seven eight"
    val df = Seq(
      (0L, s"alpha beta $common gamma delta"),
      (1L, s"epsilon zeta $common eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi rho")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(df, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(pairs.head._3 >= 1L)
  }

  test("classifier score: deterministic, bounded, keep matches score") {
    val df = Seq((0L, "alpha beta gamma"), (1L, "zq xv wk"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.withClassifierScore(df)
      .select("doc_id", "quality_score", "clf_keep")
      .as[(Long, Double, Boolean)].collect()
    assert(got.forall(r => r._2 > 0.0 && r._2 < 1.0))
    assert(got.forall(r => r._3 == (r._2 >= 0.5)))
    // same text twice scores identically
    val again = TextAnalysis.withClassifierScore(df)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(got.map(r => (r._1, r._2)).toMap == again)
  }

  test("bpeMergePairs: counts adjacent char pairs, ordered cut") {
    val df = Seq((0L, "aab aab ab"), (1L, "x")).toDF("doc_id", "text")
    // pairs: "aab" -> aa, ab (x2 docs' tokens: aab aab => aa,ab twice),
    // "ab" -> ab; "x" has no pair
    val got = TextAnalysis.bpeMergePairs(df, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 2L, "ab" -> 3L))
  }

  test("bpeTrain: learns merges round by round on re-paired symbols") {
    // vocab: ab:2, ac:1, low:2, lower:1
    // round 1 pairs: 'a b':2, 'a c':1, 'l o':3, 'o w':3, 'w e':1,
    //   'e r':1 → top = 'l o' (cnt 3, tie beats 'o w' lexically)
    // round 2 (low→[lo,w], lower→[lo,w,e,r]): 'lo w':3 top
    // round 3: 'a b':2 top ('low' now one symbol; 'lo w' merged away)
    val df = Seq((0L, "ab ab ac low"), (1L, "low lower"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, nMerges = 3)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "l o", 3L), (2, "lo w", 3L), (3, "a b", 2L)))
  }

  test("bpeTrain: greedy left-to-right on overlapping same-char runs") {
    // 'aaaa': round-1 pairs 'a a' ×3; greedy merge → [aa, aa] (not
    // [aa, a, a]); round 2 must therefore find 'aa aa', not 'aa a'
    val df = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, nMerges = 2)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", 3L), (2, "aa aa", 1L)))
  }

  test("bpeTrain: stops early when every word is a single symbol") {
    val df = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, nMerges = 5)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a b", 2L)))
  }

  test("bpeTrainBatched: batchK=1 equals sequential bpeTrain bit-for-bit") {
    // the batched trainer inherits the oracled sequential trainer's
    // correctness through this equality — with batchK=1 the greedy
    // non-interacting selection degenerates to top-1 and the
    // simultaneous fold to the single-pair fold
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val seq8 = TextAnalysis.bpeTrain(docs, nMerges = 8)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    val bat8 = TextAnalysis.bpeTrainBatched(docs, nMerges = 8, batchK = 1)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(bat8 == seq8)
  }

  test("bpeTrainBatched: runs past the 30-merge bound to exhaustion, deterministically") {
    // nMerges=1000 on the corpus vocabulary (~31 words, ≤107 reachable
    // merges): the trainer must terminate at the true fixpoint — more
    // than the old bound, fewer than the cap — and re-running must
    // reproduce the identical table (seeded, partitioning-independent)
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val t1 = TextAnalysis.bpeTrainBatched(docs, nMerges = 1000,
        batchK = 16)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(t1.size > 30 && t1.size < 1000,
      s"expected exhaustion between 30 and 1000 merges, got ${t1.size}")
    val t2 = TextAnalysis.bpeTrainBatched(docs, nMerges = 1000,
        batchK = 16)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(t1 == t2, "batched training must be deterministic")
    // within any one run, a merged pair never repeats (each rule is
    // learned once)
    assert(t1.map(_._2).distinct.size == t1.size)
  }

  test("bpeTrainBatched: selected merges within a round never interact") {
    // 'aaaa bb cc': round-1 counts are 'a a':3, 'b b':1, 'c c':1 —
    // all pairwise non-interacting, so ONE round learns all three
    // (sequential would need three rounds); the fold must apply them
    // simultaneously without cross-talk
    val df = Seq((0L, "aaaa bb cc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainBatched(df, nMerges = 3, batchK = 8)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", 3L), (2, "b b", 1L), (3, "c c", 1L)))
    // interaction guard: 'ab' shares symbols with 'a a' and 'b b' —
    // in 'aab ab', round-1 top pairs 'a b':2 and 'a a':1 INTERACT
    // (shared 'a'), so round 1 learns only 'a b'; 'a a' must wait for
    // round 2's recount (where 'aab' is now [a, ab] and 'a a' is gone
    // — 'a ab' is the true next pair)
    val df2 = Seq((0L, "aab ab")).toDF("doc_id", "text")
    val got2 = TextAnalysis.bpeTrainBatched(df2, nMerges = 2, batchK = 8)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    val seq2 = TextAnalysis.bpeTrain(df2, nMerges = 2)
      .orderBy("merge_rank").as[(Int, String, Long)].collect().toSeq
    assert(got2 == seq2,
      s"interacting candidates must defer to the recount: $got2 vs $seq2")
  }

  test("bm25TopK: tf saturation, idf discrimination, length norm") {
    val df = Seq(
      (0L, "spark spark spark pad pad pad"), // tf=3 on 'spark'
      (1L, "spark pad pad pad pad pad"),     // tf=1, same length
      (2L, "hash pad pad pad pad pad"),      // rarer term (df=1)
      (3L, "pad pad pad pad pad pad"),       // no query term → absent
      (4L, "spark pad")                      // tf=1, SHORT doc
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(df, Seq("spark", "hash"), k = 10)
      .select("doc_id", "n_terms", "bm25")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(!r.contains(3L), "doc without any query term is absent")
    // higher tf scores higher at equal length and term
    assert(r(0L)._3 > r(1L)._3)
    // rarer term (df 1 of 5) outranks the common one (df 3 of 5) at tf=1
    assert(r(2L)._3 > r(1L)._3)
    // shorter doc outranks longer at same tf/term (length normalization)
    assert(r(4L)._3 > r(1L)._3)
    assert(r(0L)._2 == 1L && r.values.forall(_._2 == 1L))
  }

  test("bm25TopK: multi-term scores sum and k cuts the tail") {
    val df = Seq(
      (0L, "spark hash join"),
      (1L, "spark pad pad"),
      (2L, "hash pad pad")
    ).toDF("doc_id", "text")
    val all = TextAnalysis.bm25TopK(df, Seq("spark", "hash"), k = 10)
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toMap
    assert(all(0L) == 2L && all(1L) == 1L && all(2L) == 1L)
    val top1 = TextAnalysis.bm25TopK(df, Seq("spark", "hash"), k = 1)
      .select("doc_id").as[Long].collect()
    assert(top1.toSeq == Seq(0L), "two matched terms outrank one")
  }

  test("bpeEncode: learned merges apply in order, n_syms tracks compression") {
    // 'abab' dominates: merge 1 fuses the most frequent adjacent pair,
    // later merges build on it; every token here is fully mergeable so
    // 4 merges collapse 'abab' to ONE symbol.
    val df = Seq(
      (0L, "abab abab ab"),
      (1L, "ab cd abab")
    ).toDF("doc_id", "text")
    val enc1 = TextAnalysis.bpeEncode(df, nMerges = 1)
      .select("doc_id", "n_tokens", "n_syms", "encoded")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // after merge 1 ("a b" -> "ab"): 'abab' = [ab, ab], 'ab' = [ab]
    assert(enc1(0L) == ((0L, 3L, 5L, "ab ab ab ab ab")))
    assert(enc1(1L)._4 == "ab c d ab ab" || enc1(1L)._4 == "ab cd ab ab",
      s"got ${enc1(1L)._4}") // 'cd' merges only if "c d" won a round
    val enc3 = TextAnalysis.bpeEncode(df, nMerges = 3)
      .select("doc_id", "n_syms").as[(Long, Long)].collect().toMap
    assert(enc3(0L) < enc1(0L)._3,
      "more merges must not increase the symbol count")
    // every doc's symbol stream concatenates to its original characters
    val flat = TextAnalysis.bpeEncode(df, nMerges = 2)
      .select("doc_id", "encoded").as[(Long, String)].collect().toMap
    assert(flat(0L).replace(" ", "") == "ababababab",
      "symbols must spell the original tokens back")
  }

  test("hybridRrfTopK: fusion rewards docs both legs surface") {
    // docs: 0 matches lexically AND is the dense query's neighbor;
    // 1 only lexical; 2 only dense-near; 3 neither.
    val docs = Seq(
      (0L, "spark spark pad"),
      (1L, "spark pad pad"),
      (2L, "pad pad pad"),
      (3L, "other other other")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (9L, Array(1.0f, 0.05f), 0) // the query vector
    ).toDF("vec_id", "embedding", "label")
    val r = TextAnalysis.hybridRrfTopK(docs, emb, Seq("spark"),
        queryVecId = 9L, k = 4, kLeg = 3)
      .select("doc_id", "lex_rank", "den_rank", "rrf_score")
      .as[(Long, Int, Int, Double)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    // doc 0: in both legs → two terms; docs 1/2: one leg each
    assert(byId(0L)._2 > 0 && byId(0L)._3 > 0)
    assert(byId(0L)._4 > byId(1L)._4 && byId(0L)._4 > byId(2L)._4,
      "doc surfaced by both retrievers must outrank single-leg docs")
    assert(byId(1L)._3 == -1 || byId(1L)._3 > 0) // absent leg encodes -1
    assert(!byId.contains(3L) ||
      (byId(3L)._2 == -1 && byId(3L)._3 > 0) ||
      (byId(3L)._2 > 0 && byId(3L)._3 == -1) ||
      (byId(3L)._2 > 0 && byId(3L)._3 > 0))
  }

  test("distributionDrift: zero for identical groups, positive and symmetric-bounded otherwise") {
    val df = Seq(
      (0L, "a b c d", "s1"), (1L, "a b c d", "s2"), // identical dists
      (2L, "x x x x", "s3")                          // disjoint tokens
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.distributionDrift(df)
      .select("source_a", "source_b", "js_div")
      .as[(String, String, Double)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(r.size == 3, "all unordered pairs present")
    assert(r(("s1", "s2")) == 0.0, "identical smoothed dists → JS 0")
    assert(r(("s1", "s3")) > 0.0 && r(("s1", "s3")) <= math.log(2.0) + 1e-9,
      "JS is positive and bounded by ln 2")
    assert(r(("s1", "s3")) == r(("s2", "s3")),
      "s1 and s2 have the same distribution, so same drift vs s3")
  }

  test("distributionPsi: baseline-anchored drift with verdict bands") {
    val df = Seq(
      (0L, "a b c d", "base"), (1L, "a b c d", "same"),
      (2L, "x x x x", "far")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.distributionPsi(df, baseline = "base")
      .select("source", "psi", "verdict")
      .as[(String, Double, String)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r.keySet == Set("same", "far"), "baseline itself not scored")
    assert(r("same") == ((0.0, "stable")),
      "identical smoothed distributions → PSI 0")
    assert(r("far")._1 > 0.25 && r("far")._2 == "shifted",
      s"disjoint vocabulary must land in the shifted band: ${r("far")}")
    // PSI is asymmetric in principle but always >= 0
    assert(r.values.forall(_._1 >= 0.0))
    // a missing baseline fails loudly instead of reading as "no drift"
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.distributionPsi(df, baseline = "nope").collect()
    }
    assert(e.getMessage.contains("baseline"))
  }

  test("importanceWeights: target-domain text outranks off-domain text") {
    // target slice talks about medicine; raw corpus mixes in sports.
    // A held-out medical doc must get a HIGHER log-weight than the
    // sports doc, and an empty doc scores NULL with 0 features.
    val docs = Seq(
      (0L, "the patient received a clinical dose of the trial drug", true),
      (1L, "clinical trial patients received the dose twice daily", true),
      (2L, "the clinical trial reported patient outcomes for the drug", false),
      (3L, "the striker scored twice and the match ended in a draw", false),
      (4L, "", false)
    ).toDF("doc_id", "text", "is_tgt")
    val got = TextAnalysis.withImportanceWeights(docs, "is_tgt",
        nBuckets = 512)
      .select("doc_id", "n_feats", "log_weight")
      .as[(Long, Long, Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(got(2L)._2.get > got(3L)._2.get,
      s"medical ${got(2L)} must outrank sports ${got(3L)}")
    // weight of target members is the highest of all (they ARE the model)
    assert(got(0L)._2.get > got(3L)._2.get)
    // feature count = unigrams + bigrams = 10 + 9 for doc 0
    assert(got(0L)._1 == 19L)
    // empty doc: split('', '\\s+') yields one empty token -> 1 unigram
    // feature, matching the fingerprint family's convention
    assert(got(4L)._1 == 1L)
  }
}
