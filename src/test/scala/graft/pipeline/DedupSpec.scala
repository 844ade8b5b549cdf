package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class DedupSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  // 50 distinct tokens → near-dup (one token changed) has 3-gram
  // jaccard ≈ 47/53 ≈ 0.89, far from any threshold boundary.
  private val base = (1 to 50).map(i => s"word$i").mkString(" ")
  private def docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("word25", "changed")), // near dup of 0
    (3L, (1 to 50).map(i => s"other$i").mkString(" ")),
    (4L, (1 to 50).map(i => s"unrel$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("exactKept keeps lowest doc_id per identical text") {
    val kept = Dedup.exactKept(docs).orderBy("doc_id").collect()
    // docs 0 and 1 are identical → group keeps 0; others are unique
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 2L, 3L, 4L))
    val dupGroup = kept.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("doc_id") == 0L, "kept id must be the min of the group")
  }

  test("minhash finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair missed")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)), "near dup pair missed")
    assert(!pairs.contains((3L, 4L)), "unrelated docs flagged")
  }

  test("simhash: identical docs at distance 0, near dups closer than unrelated") {
    // 50 distinct tokens; near-dup differs by one token → jaccard ≈ 0.89
    val long = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = long.replace("tok25", "changed")
    val other = (1 to 50).map(i => s"other$i").mkString(" ")
    val df = Seq((0L, long), (1L, long), (2L, near), (3L, other)).toDF("doc_id", "text")
    val sims = Dedup.simhashed(df).as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L), "identical docs must have identical simhash")
    val hamNear = java.lang.Long.bitCount(sims(0L) ^ sims(2L))
    val hamFar = java.lang.Long.bitCount(sims(0L) ^ sims(3L))
    assert(hamNear < hamFar, s"near=$hamNear should be < far=$hamFar")
  }

  test("simhashed packPer variants agree; packPer=4 fails loudly on long docs") {
    val long = (1 to 50).map(i => s"tok$i").mkString(" ")
    val df = Seq((0L, long), (1L, long.replace("tok25", "x"))).toDF("doc_id", "text")
    // all pack widths produce byte-identical fingerprints on safe input
    val s2 = Dedup.simhashed(df, packPer = 2).as[(Long, Long)].collect().toMap
    val s1 = Dedup.simhashed(df, packPer = 1).as[(Long, Long)].collect().toMap
    val s4 = Dedup.simhashed(df, packPer = 4).as[(Long, Long)].collect().toMap
    assert(s1 == s2 && s2 == s4)
    // a ≥2^15-shingle doc must raise, not silently overflow the 16-bit
    // vote fields (book-length corpora exist; wrong fingerprints don't
    // announce themselves)
    val book = (0 until 33000).map(i => s"w$i").mkString(" ")
    val bdf = Seq((0L, book)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.simhashed(bdf, packPer = 4).collect()
    }
    assert(e.getMessage.contains("packPer=4") ||
      Option(e.getCause).exists(_.getMessage.contains("packPer=4")))
    // the scale-safe default still fingerprints the same doc fine
    assert(Dedup.simhashed(bdf, packPer = 2).count() == 1)
  }

  test("ngram jaccard matches hand-computed value") {
    val a = "a b c d"
    val b = "a b c e"
    // shingles(k=3): {a b c, b c d} vs {a b c, b c e} → J = 1/3
    val df = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val j = Dedup.ngramJaccardPairs(df, threshold = 0.0)
      .select("jaccard").as[Double].head()
    assert(math.abs(j - 1.0 / 3.0) < 1e-6)
  }

  test("allPairsJaccard: exact pair relation equals brute force, recall 1") {
    // hostile mix: exact dup, near dup, overlap chains with varied
    // lengths (exercises the length filter), plus unrelated noise
    val corpus = (Seq(
      (0L, base),
      (1L, base),
      (2L, base.replace("word25", "changed")),
      (3L, (1 to 25).map(i => s"word$i").mkString(" ")), // half of 0
      (4L, (1 to 60).map(i => s"word$i").mkString(" ")), // superset of 0
      (5L, (1 to 50).map(i => s"other$i").mkString(" "))
    ) ++ (10L to 29L).map(i =>
      (i, (1 to 40).map(j => s"n${i}x$j").mkString(" ")))).toDF("doc_id", "text")
    val got = Dedup.allPairsJaccard(corpus, threshold = 0.5)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // brute force over the same hashed shingle sets
    val sets = corpus.select(col("doc_id"),
        Dedup.shingleHashes(col("text")).as("sh"))
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toSet)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = math.rint(inter.toDouble / (sa.size + sb.size - inter) * 1e6) / 1e6
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(want.nonEmpty && want.exists(_._3 < 1.0),
      "fixture must contain exact AND proper near pairs")
    assert(got == want, s"got=$got want=$want")
  }

  test("allPairsJaccard: tau 0.8 exact relation equals brute force (positional filter keeps recall)") {
    val corpus = (Seq(
      (0L, base),
      (1L, base),
      (2L, base.replace("word25", "changed")), // j ~ 0.85 at tau 0.8
      (3L, base.replace("word10", "x").replace("word40", "y")) // lower j
    ) ++ (10L to 24L).map(i =>
      (i, (1 to 40).map(j => s"m${i}w$j").mkString(" ")))).toDF("doc_id", "text")
    val got = Dedup.allPairsJaccard(corpus, threshold = 0.8)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val sets = corpus.select(col("doc_id"),
        Dedup.shingleHashes(col("text")).as("sh"))
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toSet)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = math.rint(inter.toDouble / (sa.size + sb.size - inter) * 1e6) / 1e6
      if j >= 0.8
    } yield (a, b, j)).toSet
    assert(want.exists(_._3 < 1.0), "fixture must have a proper near pair at 0.8")
    assert(got == want, s"got=$got want=$want")
  }

  test("allPairsJaccard: randomized corpora x thresholds equal brute force") {
    // seeded sweep: hostile vocab sizes (tiny → everything resembles
    // everything) and thresholds on both sides of the prefix/positional
    // boundary arithmetic; any lost candidate shows as a missing pair
    val rnd = new scala.util.Random(42)
    for ((vocab, tau) <- Seq((8, 0.35), (8, 0.8), (40, 0.5), (40, 0.92),
        (15, 0.65))) {
      val corpus = (0L until 30L).map { i =>
        val n = 5 + rnd.nextInt(30)
        val base = (0 until n).map(_ => s"w${rnd.nextInt(vocab)}")
        (i, base.mkString(" "))
      }.toDF("doc_id", "text")
      val got = Dedup.allPairsJaccard(corpus, threshold = tau)
        .select("a_id", "b_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val sets = corpus.select(col("doc_id"),
          Dedup.shingleHashes(col("text")).as("sh"))
        .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toSet)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        j = math.rint(inter.toDouble / (sa.size + sb.size - inter) * 1e6) / 1e6
        if j >= tau
      } yield (a, b, j)).toSet
      assert(got == want,
        s"vocab=$vocab tau=$tau: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("allPairsJaccard: threshold 1.0 keeps only identical sets") {
    val got = Dedup.allPairsJaccard(docs, threshold = 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("connected components merge transitive near-dup chains") {
    // edges: 0-1, 1-2 (chain), 5-6; 3,4 isolated
    val ids = (0L to 6L).map(i => Tuple1(i)).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    val kept = Dedup.keepAfterNearDedup(ids, pairs)
      .as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L))
  }

  test("end-to-end: minhash pairs → keep decision drops dups") {
    val kept = Dedup.keepAfterNearDedup(
      docs, Dedup.minhashPairs(docs, threshold = 0.5))
      .as[Long].collect().toSet
    // 0,1,2 form one near-dup component → keep 0; 3 and 4 survive
    assert(kept == Set(0L, 3L, 4L))
  }

  test("dup-shingle fraction: hand-computed fractions and flag threshold") {
    val corpus = Seq(
      (0L, "a b c d e"),           // all 3 shingles shared with doc 1
      (1L, "a b c d e"),           // exact copy
      (2L, "x y z w q"),           // fully unique
      (3L, "a b c u1 u2 u3")       // 1 of 4 shingles ("a b c") duplicated
    ).toDF("doc_id", "text")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val res = Dedup.withDupShingleFraction(corpus, k = 3, flagThreshold = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(res.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(res(0) == ((0L, 3L, 3L, 1.0, true)), "exact dup: every shingle shared")
    assert(res(1) == ((1L, 3L, 3L, 1.0, true)))
    assert(res(2) == ((2L, 3L, 0L, 0.0, false)), "unique doc shares nothing")
    assert(res(3) == ((3L, 4L, 1L, 0.25, false)), "1 of 4 shingles duplicated")
    // operator must not leak persisted state past its result (SURVEY §5
    // rule): the result's own localCheckpoint block is the only survivor
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.size <= 1,
      s"withDupShingleFraction leaked ${leaked.size} persisted RDDs")
  }

  test("scrubDuplicateSpans: shared runs cut, order kept, clean doc intact") {
    val shared = "s1 s2 s3 s4"  // 4-token run shared by docs 0 and 1
    val df = Seq(
      (0L, s"a b $shared c d"),
      (1L, s"e f $shared g h"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(df, k = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    // the duplicated 4-gram covers exactly tokens s1..s4 in both docs
    assert(got(0) == ((0L, 8L, 4L, "a b c d")))
    assert(got(1) == ((1L, 8L, 4L, "e f g h")))
    assert(got(2) == ((2L, 8L, 0L, "p q r s t u v w")))
  }

  test("scrubDuplicateSpans: overlapping starts merge their coverage") {
    // docs share a 5-token run => two overlapping duplicated 4-grams;
    // coverage is the union [0,5), not double-counted
    val df = Seq(
      (0L, "x1 x2 x3 x4 x5 tailA"),
      (1L, "x1 x2 x3 x4 x5 tailB")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(df, k = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((0L, 6L, 5L, "taila")))
    assert(got(1) == ((1L, 6L, 5L, "tailb")))
  }

  test("bagKept: order-shuffled copies collapse, different multisets don't") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta"),   // same multiset, different order
      (2L, "alpha beta beta"),    // different multiplicity
      (3L, "Alpha  beta gamma")   // case/whitespace-normalized dup of 0
    ).toDF("doc_id", "text")
    val got = Dedup.bagKept(df)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 3L), (2L, 1L)))
  }

  test("withMaxDupRun: merged interval length, zero for clean docs") {
    // docs 0/1 share a 6-token run => dup 4-gram starts 2,3,4 merge to
    // one interval [2, 8) = 6 tokens; doc 2 is clean
    val df = Seq(
      (0L, "a b x1 x2 x3 x4 x5 x6 c"),
      (1L, "d e x1 x2 x3 x4 x5 x6 f"),
      (2L, "p q r s t u v w z")
    ).toDF("doc_id", "text")
    val got = Dedup.withMaxDupRun(df, k = 4)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 6L), (1L, 6L), (2L, 0L)))
  }

  test("withMaxDupRun: disjoint islands don't merge") {
    // shared 4-gram at the start AND at the end, 4 unique tokens apart:
    // two islands of 4, max is 4 — not 12
    val df = Seq(
      (0L, "h1 h2 h3 h4 m1 m2 m3 m4 t1 t2 t3 t4"),
      (1L, "h1 h2 h3 h4 n1 n2 n3 n4 t1 t2 t3 t4")
    ).toDF("doc_id", "text")
    val got = Dedup.withMaxDupRun(df, k = 4)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 4L), (1L, 4L)))
  }

  test("cosine pairs: identical vectors similarity 1") {
    val e = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.cosinePairs(e, threshold = 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("incrementalKept: batch deduped against the index and itself") {
    val index = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"), // dup of index doc 1
      (11L, "delta"),      // fresh → keep
      (12L, "delta"),      // in-batch dup of 11
      (13L, "gamma"),      // dup of index doc 2
      (14L, "epsilon")     // fresh → keep
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalKept(index, batch)
      .select("doc_id", "dup_in_index", "dup_in_batch", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r(10L) == ((true, false, false)))
    assert(r(11L) == ((false, false, true)))
    assert(r(12L) == ((false, true, false)))
    assert(r(13L) == ((true, false, false)))
    assert(r(14L) == ((false, false, true)))
    // equivalence: survivors = exactKept(index ∪ batch) ∩ batch
    val full = Dedup.exactKept(index.union(batch))
      .select("doc_id").as[Long].collect().toSet
    val kept = r.filter(_._2._3).keySet
    assert(kept == full.filter(_ >= 10L))
  }

  test("incrementalMinhashCandidates: planted near-dup found via the " +
      "stored index, disjoint batch doc is not") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    val index = Seq(
      (1L, base),
      (2L, "completely different words about database query engines " +
        "and columnar execution with vectorized operators")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // near-copy of index doc 1 (one token changed)
      (10L, base.replace("tonight", "today")),
      (11L, "unrelated text on mountain weather patterns snow wind " +
        "and the slow cold river under winter ice")
    ).toDF("doc_id", "text")
    val indexBands = Dedup.minhashBandRows(index).localCheckpoint()
    val cands = Dedup.incrementalMinhashCandidates(indexBands, batch)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((10L, 1L)), s"planted pair missing: $cands")
    assert(!cands.exists(_._1 == 11L), s"disjoint doc matched: $cands")
    // batch cost shape: the index side never re-shingles — the operator
    // consumes ONLY the stored band rows for the index corpus
    val verified = Dedup.verifyCandidates(index.union(batch),
      cands.toSeq.toDF("a_id", "b_id").select(
        col("a_id"), col("b_id")), threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(verified.exists(v => v._2 == 10L || v._1 == 10L))
  }

  test("dedupLines strips corpus-repeated segments, keeps order") {
    val boiler = "accept our cookies"
    val lined = Seq(
      (0L, s"$boiler\nunique alpha\nmid section\n$boiler"),
      (1L, s"$boiler\nunique beta"),
      (2L, s"unique gamma\n$boiler"),
      (3L, "all original\nnothing shared"),
      (4L, boiler) // boilerplate-only doc → empty clean_text
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(lined, minDup = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // boiler appears 5 times across the corpus (>= 3) → dropped
    // everywhere; every other line is unique → kept, original order
    assert(out == Seq(
      (0L, "unique alpha\nmid section", 2L, 2L),
      (1L, "unique beta", 1L, 1L),
      (2L, "unique gamma", 1L, 1L),
      (3L, "all original\nnothing shared", 2L, 0L),
      (4L, "", 0L, 1L)))
    // idempotent: the cleaned corpus has no segment at minDup anymore
    val again = Dedup.dedupLines(
        lined.select(col("doc_id"),
          org.apache.spark.sql.functions.lit("x").as("unused"))
          .join(Dedup.dedupLines(lined, minDup = 3), Seq("doc_id"))
          .select(col("doc_id"), col("clean_text").as("text")),
        minDup = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(again.forall(_._4 == 0L), "second pass must drop nothing")
  }

  test("dedupLines honors a custom delimiter") {
    val segd = Seq(
      (0L, "dup seg. uniq one. dup seg"),
      (1L, "dup seg. uniq two")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(segd, delim = ". ", minDup = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    // "dup seg" occurs 3 times (the trailing copy in doc 0 has no
    // following delimiter, so it splits out identically)
    assert(out(0)._2 == "uniq one" && out(1)._2 == "uniq two")
  }

  // a deliberately SATURATED vocabulary: every doc is a 20-token window
  // of one 40-token cycle, so only 40 trigram types exist and the
  // median shingle df is ~45 (≫ the 32 boundary) — the regime where the
  // exact prefix filter stops filtering. Window offsets step by 4
  // (gcd(4,40)=4 ⇒ 10 distinct offsets, docs i and i+10 identical), so
  // the TRUE τ=0.8 pair relation is exactly the identical-text groups:
  // the closest DISTINCT windows differ by 4 tokens and overlap at
  // jaccard 14/22 ≈ 0.64, safely below τ.
  private def saturatedDocs = (0 until 100).map { i =>
    val off = (i * 4) % 40
    (i.toLong, (0 until 20).map(j => s"t${(off + j) % 40}").mkString(" "))
  }.toDF("doc_id", "text")

  test("nearDedupAuto: band route fires on a saturated vocabulary, " +
      "kept set equals the exact leg") {
    val sat = saturatedDocs
    // 1. the probe detects the regime
    val med = Dedup.medianShingleDf(Dedup.shingleTable(sat))
    assert(med > 32, s"planted corpus must be saturated, median df $med")
    // 2. auto (which routes to bands here) keeps exactly what the
    //    forced-exact leg keeps — the routing changed the PLAN, not
    //    the contract
    val auto = Dedup.nearDedupAuto(sat, threshold = 0.8)
      .as[Long].collect().sorted.toSeq
    val exact = Dedup.nearDedupAuto(sat, threshold = 0.8,
      strategy = "exact").as[Long].collect().sorted.toSeq
    val bandsF = Dedup.nearDedupAuto(sat, threshold = 0.8,
      strategy = "bands").as[Long].collect().sorted.toSeq
    assert(auto == exact, "auto keep set must equal the exact keep set")
    assert(auto == bandsF, "auto must BE the band leg in this regime")
    // 3. the kept set is the planted truth: one survivor per
    //    identical-window group (10 distinct offsets ⇒ the 10 lowest
    //    doc_ids survive)
    assert(auto == (0L until 10L).toSeq)
  }

  test("nearDedupAuto stays on the exact leg for a Zipf-ish corpus") {
    // the standard spec corpus: distinct tokens per doc → median df 1
    val d = docs
    assert(Dedup.medianShingleDf(Dedup.shingleTable(d)) <= 32)
    val auto = Dedup.nearDedupAuto(d, threshold = 0.8)
      .as[Long].collect().sorted.toSeq
    val exact = Dedup.keepAfterNearDedup(d,
        Dedup.allPairsJaccard(d, threshold = 0.8))
      .as[Long].collect().sorted.toSeq
    assert(auto == exact)
  }

  test("nearDedupKeepBest: highest score wins its cluster, ties break " +
      "to the smaller id, NULL scores lose, singletons keep themselves") {
    val clusterText = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = Seq[(Long, String, java.lang.Double)](
      (1L, clusterText, 5.0),   // cluster {1,2,3,5}: 2 and 3 tie at 9
      (2L, clusterText, 9.0),   //   → 2 wins (smaller id)
      (3L, clusterText, 9.0),
      (5L, clusterText, null),  //   NULL ranks worst
      (4L, "one two three four five six seven eight", 0.0), // singleton
      (6L, "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        -3.0),                  // cluster {6,7}: −1 beats −3
      (7L, "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        -1.0))
    val d = rows.toDF("doc_id", "text", "q")
    val kept = Dedup.nearDedupKeepBest(d, "q", threshold = 0.8,
        strategy = "exact")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 4L, 7L), s"got $kept")
    // min-id keep on the same corpus differs — the score genuinely
    // drives the decision
    val minId = Dedup.nearDedupAuto(d, threshold = 0.8,
      strategy = "exact").as[Long].collect().sorted.toSeq
    assert(minId == Seq(1L, 4L, 6L))
    // deterministic across runs
    assert(Dedup.nearDedupKeepBest(d, "q", threshold = 0.8,
      strategy = "exact").as[Long].collect().sorted.toSeq == kept)
  }
}
