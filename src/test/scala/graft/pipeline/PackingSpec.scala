package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class PackingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("packSequences: slices cover each doc exactly and chunks never overflow") {
    val capacity = 256
    val packed = Packing.packSequences(docs, capacity = capacity, nShards = 4)
      .persist()
    // per-doc coverage: slices are contiguous from 0 to n_tokens
    val perDoc = packed.groupBy("doc_id")
      .agg(sum(col("doc_to") - col("doc_from")).as("covered"),
        min(col("doc_from")).as("first"), max(col("doc_to")).as("last"))
    val withN = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"))
    assert(withN.filter(col("covered") =!= col("n_tokens")
      || col("first") =!= 0 || col("last") =!= col("n_tokens")).count() == 0,
      "every token of every doc must land in exactly one chunk slice")
    // per-chunk budget: total tokens in a chunk never exceed capacity,
    // and every chunk except each shard's last is exactly full
    val perChunk = packed.groupBy("shard", "chunk_idx")
      .agg(sum(col("doc_to") - col("doc_from")).as("fill"))
    assert(perChunk.filter(col("fill") > capacity).count() == 0)
    val lastChunk = perChunk.groupBy("shard").agg(max("chunk_idx").as("chunk_idx"))
    val full = perChunk.join(lastChunk, Seq("shard", "chunk_idx"), "left_anti")
    assert(full.filter(col("fill") =!= capacity).count() == 0,
      "concat-and-chunk leaves no gaps: all non-final chunks are full")
    // chunk_off is consistent: slice fits inside [chunk_off, capacity]
    assert(packed.filter(
      col("chunk_off") + (col("doc_to") - col("doc_from")) > capacity).count() == 0)
    packed.unpersist()
  }

  test("packSequences: a doc longer than capacity spans multiple chunks") {
    val longDoc = Seq((0L, ("tok " * 700).trim), (1L, "a b c")).toDF("doc_id", "text")
    val packed = Packing.packSequences(longDoc, capacity = 256, nShards = 1)
      .orderBy("chunk_idx", "doc_id")
      .collect()
    val doc0 = packed.filter(_.getAs[Long]("doc_id") == 0L)
    assert(doc0.length == 3, "700 tokens at capacity 256 → 3 chunks")
    assert(doc0.map(r => r.getAs[Long]("doc_to") - r.getAs[Long]("doc_from"))
      .toSeq == Seq(256L, 256L, 188L))
    // doc 1 starts mid-chunk right after doc 0's tail
    val doc1 = packed.filter(_.getAs[Long]("doc_id") == 1L).head
    assert(doc1.getAs[Long]("chunk_idx") == 2L && doc1.getAs[Long]("chunk_off") == 188L)
  }

  test("packBins: fit guaranteed, class arithmetic, oversize singletons, every doc once") {
    val capacity = 64
    val packed = Packing.packBins(docs, capacity = capacity, nShards = 4,
      maxClass = 8).persist()
    // every doc assigned exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // the harmonic guarantee: a non-oversize bin NEVER overflows
    assert(packed.filter(!col("oversize") &&
      col("bin_fill") > capacity).count() == 0,
      "class-k bins hold k docs of size <= capacity/k — fit is by construction")
    // a class-k bin holds at most k docs (exactly k except the last
    // bin of each (shard, class))
    val binSizes = packed.filter(!col("oversize"))
      .groupBy("shard", "size_class", "bin_idx")
      .agg(count(lit(1)).as("n_docs"))
    assert(binSizes.filter(col("n_docs") > col("size_class")).count() == 0)
    // class membership: capacity/(k+1) < n_tokens <= capacity/k for
    // classes 1..maxClass-1 (maxClass absorbs the tail)
    val bad = packed.filter(!col("oversize") && col("size_class") < 8 &&
      (col("n_tokens") > expr(s"$capacity div size_class") ||
        col("n_tokens") <= expr(s"$capacity div (size_class + 1)")))
    assert(bad.count() == 0, "harmonic class bounds violated")
    // oversize docs are singleton bins, flagged
    val over = packed.filter(col("oversize"))
    assert(over.filter(col("n_tokens") <= capacity).count() == 0)
    assert(over.filter(col("bin_fill") =!= col("n_tokens")).count() == 0,
      "an oversize doc owns its bin alone")
    packed.unpersist()
    // determinism: two runs produce identical assignments (sorted —
    // the r10 multi-row-parity rule)
    def runIt() = Packing.packBins(docs, capacity = capacity,
        nShards = 4, maxClass = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(runIt() == runIt())
  }

  test("withSplit: deterministic, stable fractions, honors weights") {
    val split = Packing.withSplit(docs).select("doc_id", "split")
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"))
    // multiplicative hashing spreads uniformly: 80/10/10 ± a few points
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.06)
    // deterministic: re-running yields the identical assignment
    val again = Packing.withSplit(docs).select("doc_id", "split")
    assert(split.except(again).count() == 0 && again.except(split).count() == 0)
  }

  test("sampleMixture: rates honored per group, deterministic, split-independent") {
    val rates = Seq("src0" -> 0, "src1" -> 10000)
    val mixed = Packing.sampleMixture(docs, rates, defaultBp = 5000)
    // rate 0 drops every src0 doc; rate 10000 keeps every src1 doc
    assert(mixed.filter(col("source") === "src0" && col("keep")).count() == 0)
    assert(mixed.filter(col("source") === "src1" && !col("keep")).count() == 0)
    // the default 50% rate keeps roughly half of the remaining sources
    val rest = mixed.filter(!col("source").isin("src0", "src1"))
    val frac = rest.filter(col("keep")).count().toDouble / rest.count()
    assert(math.abs(frac - 0.5) < 0.1, s"default keep rate $frac far from 0.5")
    // deterministic: identical assignment on re-run
    val again = Packing.sampleMixture(docs, rates, defaultBp = 5000)
    assert(mixed.select("doc_id", "keep")
      .except(again.select("doc_id", "keep")).count() == 0)
    // independent multiplier from withSplit: keep-rate inside the train
    // split ≈ overall keep-rate (a shared multiplier would correlate them)
    val both = Packing.withSplit(
      Packing.sampleMixture(docs, Seq("none" -> 0), defaultBp = 5000))
    val overall = both.filter(col("keep")).count().toDouble / both.count()
    val train = both.filter(col("split") === "train")
    val trainFrac = train.filter(col("keep")).count().toDouble / train.count()
    assert(math.abs(overall - trainFrac) < 0.1,
      s"keep rate in train split $trainFrac vs overall $overall")
  }

  test("upsampleMixture: copy counts match epoch weights, deterministic, mixture-independent") {
    val up = Packing.upsampleMixture(docs,
      epochsBp = Seq("src0" -> 25000, "src1" -> 0), defaultBp = 7500).persist()
    // epoch 0 drops every src1 doc entirely
    assert(up.filter(col("source") === "src1").count() == 0)
    // 2.5 epochs: every src0 doc appears 2 or 3 times, mean ≈ 2.5
    val perDoc = up.filter(col("source") === "src0")
      .groupBy("doc_id").count()
    assert(perDoc.filter(col("count") < 2 || col("count") > 3).count() == 0)
    val src0Docs = docs.filter(col("source") === "src0").count()
    val src0Rows = up.filter(col("source") === "src0").count()
    assert(math.abs(src0Rows.toDouble / src0Docs - 2.5) < 0.15,
      s"src0 volume ${src0Rows.toDouble / src0Docs} far from 2.5 epochs")
    // copy_idx is a dense 0..n_copies-1 per doc
    val dense = up.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min("copy_idx").as("lo"), max("copy_idx").as("hi"))
    assert(dense.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count() == 0)
    // deterministic re-run
    val again = Packing.upsampleMixture(docs,
      epochsBp = Seq("src0" -> 25000, "src1" -> 0), defaultBp = 7500)
    assert(up.except(again).count() == 0 && again.except(up).count() == 0)
    // multiplier ⟂ sampleMixture's: the fractional-copy decision at 0.75
    // epochs is uncorrelated with a 50% downsample keep decision
    val both = Packing.sampleMixture(docs, Seq("none" -> 0), defaultBp = 5000)
      .filter(!col("source").isin("src0", "src1"))
      .join(up.groupBy("doc_id").agg(max("n_copies").as("nc")),
        Seq("doc_id"), "left")
      .withColumn("nc", coalesce(col("nc"), lit(0L)))
    val kept = both.filter(col("keep"))
    val extraKept = kept.filter(col("nc") === 1).count().toDouble / kept.count()
    val all = both.filter(col("nc") === 1).count().toDouble / both.count()
    assert(math.abs(extraKept - all) < 0.1,
      s"fractional-copy rate within mixture-kept docs $extraKept vs overall $all")
    up.unpersist()
  }

  test("shuffleShards: bijective permutation, balanced shards, deterministic") {
    val sh = Packing.shuffleShards(docs, nShards = 16).persist()
    // bijection: no two docs share a shuffle key, none are lost
    assert(sh.count() == docs.count())
    assert(sh.select("shuffle_key").distinct().count() == docs.count())
    // shard = key div width, consistent
    assert(sh.filter(
      col("shard") =!= expr(s"shuffle_key div ${4294967296L / 16}")).count() == 0)
    // uniform key ⇒ balanced fixed-width shards (500 docs / 16 shards
    // ≈ 31 each; allow generous binomial spread)
    val counts = sh.groupBy("shard").count()
      .agg(min("count").as("lo"), max("count").as("hi"))
      .head()
    assert(counts.getAs[Long]("hi") <= 3 * counts.getAs[Long]("lo"),
      s"shards unbalanced: $counts")
    // deterministic re-run
    val again = Packing.shuffleShards(docs, nShards = 16)
    assert(sh.select("doc_id", "shuffle_key", "shard")
      .except(again.select("doc_id", "shuffle_key", "shard")).count() == 0)
    // the shuffled order genuinely breaks doc_id order: the permutation
    // has no long sorted runs (any 100-doc prefix of key order would
    // keep < half its pairs id-adjacent)
    val prefix = sh.orderBy("shuffle_key").limit(100)
      .select("doc_id").collect().map(_.getLong(0))
    val adjacent = prefix.sliding(2).count(p => p(1) == p(0) + 1)
    assert(adjacent < 50, s"shuffle left $adjacent id-adjacent pairs in 100")
    sh.unpersist()
    intercept[IllegalArgumentException](Packing.shuffleShards(docs, nShards = 100))
  }

  test("writeShards: whole shards per file, shuffled order inside each file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Packing.writeShards(docs, dir, nShards = 8)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
      assert(files.nonEmpty && files.length <= 8,
        s"expected <= 8 shard files, got ${files.length}")
      // a shard never splits across files, and within a file rows are
      // in (shard, shuffle_key) order — the dataloader's read order
      val shardToFile = scala.collection.mutable.Map[Long, String]()
      var total = 0L
      for (f <- files) {
        val rows = spark.read.parquet(f)
          .select("shard", "shuffle_key").collect()
        total += rows.length
        val pairs = rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("shuffle_key")))
        assert(pairs.sameElements(pairs.sortBy(identity)),
          s"file $f not in (shard, shuffle_key) order")
        pairs.map(_._1).distinct.foreach { s =>
          assert(!shardToFile.get(s).exists(_ != f),
            s"shard $s split across ${shardToFile.getOrElse(s, "?")} and $f")
          shardToFile(s) = f
        }
      }
      assert(total == docs.count(), "write lost or duplicated rows")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("slidingWindows: full coverage, correct overlap, short docs get one window") {
    val d = Seq(
      (0L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 2 windows
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")),  // 30 tokens → 1 window
      (2L, (1 to 64).map(i => s"t$i").mkString(" "))   // exactly window → 1
    ).toDF("doc_id", "text")
    val w = Packing.slidingWindows(d, window = 64, stride = 48)
      .orderBy("doc_id", "win_idx")
      .as[(Long, Long, Long, Long)].collect()
    assert(w.toSeq == Seq(
      (0L, 0L, 0L, 64L), (0L, 1L, 48L, 52L), // overlap 16, covers to 100
      (1L, 0L, 0L, 30L),
      (2L, 0L, 0L, 64L)))
    // invariants: windows tile each doc with stride spacing and cover
    // every token (last window ends exactly at n_tokens)
    val last0 = w.filter(_._1 == 0L).last
    assert(last0._3 + last0._4 == 100L)
  }

  test("batchByLength: length-homogeneous fixed-size batches, pad cost right") {
    // one shard so the batching is fully hand-checkable
    val d = (0L until 10L).map { i =>
      (i, (1 to (10 + i.toInt * 10)).map(_ => "w").mkString(" "))
    }.toDF("doc_id", "text")
    val b = Packing.batchByLength(d, batchSize = 4, nShards = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // lengths 10,20,...,100 ascending with doc_id → batches [0..3],
    // [4..7], [8..9]; batch maxes 40, 80, 100
    assert(b.map(_._4).toSeq == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L, 2L))
    assert(b.map(_._5).toSeq ==
      Seq(30L, 20L, 10L, 0L, 30L, 20L, 10L, 0L, 10L, 0L))
    // every batch except a shard's last is exactly full
    val sizes = b.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 4, 1L -> 4, 2L -> 2))
    // sharded runs cover every doc exactly once
    val sharded = Packing.batchByLength(docs, batchSize = 8, nShards = 4)
    assert(sharded.count() == docs.count())
    assert(sharded.select("doc_id").distinct().count() == docs.count())
  }

  test("stratifiedSplit: exact per-group proportions, determinism, bucket invariance") {
    // group sizes 10 and 7 under 80/10/10: 10 → 8/1/1;
    // 7 → boundaries ⌊5.6⌋=5, ⌊6.3⌋=6, 7 → 5/1/1 — EXACT, where the
    // hash split can only promise this in expectation
    val rows = (1 to 10).map(i => (i.toLong, "big")) ++
      (11 to 17).map(i => (i.toLong, "small"))
    val df = rows.toDF("doc_id", "source")
    val got = Packing.stratifiedSplit(df)
      .groupBy("source", "split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("big", "train") -> 8L, ("big", "val") -> 1L,
      ("big", "test") -> 1L, ("small", "train") -> 5L,
      ("small", "val") -> 1L, ("small", "test") -> 1L))
    // deterministic across runs and invariant to the bucket count
    val a = Packing.stratifiedSplit(df).orderBy("doc_id")
      .select("doc_id", "strat_rank", "split")
      .as[(Long, Long, String)].collect().toSeq
    val b = Packing.stratifiedSplit(df, nBuckets = 1).orderBy("doc_id")
      .select("doc_id", "strat_rank", "split")
      .as[(Long, Long, String)].collect().toSeq
    assert(a == b)
    // ranks are a permutation of 1..n_g within each group
    val ranks = Packing.stratifiedSplit(df)
      .filter(col("source") === "big").select("strat_rank")
      .as[Long].collect().sorted.toSeq
    assert(ranks == (1L to 10L))
    // weights must sum to 100
    intercept[IllegalArgumentException] {
      Packing.stratifiedSplit(df, weights = Seq("train" -> 80))
    }
  }

  test("quotaSample: exact per-group quotas, deterministic, hash-shuffled order") {
    val q = Packing.quotaSample(docs, nPerGroup = 10)
    // every group keeps exactly min(10, |group|)
    val perGroup = q.groupBy("source")
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(perGroup.nonEmpty)
    perGroup.foreach { case (src, kept, n) =>
      assert(kept == math.min(10L, n), s"group $src kept $kept of $n")
    }
    // candidate ranks form a dense 1..m prefix per group covering the
    // quota (m ≥ min(10, n)); everything past the candidate buckets is
    // (null rank, kept = false)
    val badRank = q.filter(col("q_rank").isNotNull).groupBy("source")
      .agg(count(lit(1)).as("m"), min(col("q_rank")).as("mn"),
        max(col("q_rank")).as("mx"), count_distinct(col("q_rank")).as("dr"))
      .filter(col("mn") =!= 1L || col("mx") =!= col("m") ||
        col("dr") =!= col("m")).count()
    assert(badRank == 0, "candidate q_rank is not a dense 1..m prefix")
    val shortGroup = q.filter(col("q_rank").isNotNull).groupBy("source")
      .agg(count(lit(1)).as("m")).join(q.groupBy("source")
        .agg(count(lit(1)).as("n")), Seq("source"))
      .filter(col("m") < least(lit(10L), col("n"))).count()
    assert(shortGroup == 0, "candidate prefix shorter than the quota")
    assert(q.filter(col("q_rank").isNull && col("kept")).count() == 0)
    // the exact global rank of every candidate row must match a plain
    // full-corpus ranking — the histogram offsets reproduce it exactly
    val keyCol = pmod(col("doc_id") * lit(2971215073L), lit(4294967296L))
    val globalRank = docs.withColumn("g_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(keyCol, col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("g_rank"))
    val mismatch = q.filter(col("q_rank").isNotNull)
      .join(globalRank, Seq("doc_id"))
      .filter(col("q_rank") =!= col("g_rank")).count()
    assert(mismatch == 0, "bucketed rank diverges from the global rank")
    // deterministic across runs
    val again = Packing.quotaSample(docs, nPerGroup = 10)
    assert(q.select("doc_id", "q_rank").except(
      again.select("doc_id", "q_rank")).count() == 0)
    // the hash actually shuffles: kept set differs from "first 10 by id"
    val keptIds = q.filter(col("kept")).select("doc_id")
    val lowIds = docs.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("r") <= 10).select("doc_id")
    assert(keptIds.except(lowIds).count() > 0,
      "hash rank degenerated to doc_id order")
  }

  test("selectByBudget equals the global greedy prefix and respects the budget") {
    import org.apache.spark.sql.expressions.Window
    val budget = 10000L
    val sel = Packing.selectByBudget(docs, budget).persist()
    // the bucketed plan must equal the single-global-window greedy prefix
    val scored = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .filter(col("quality_score").isNotNull)
    val w = Window.orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = scored.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget).drop("cum")
    assert(sel.except(global).count() == 0 && global.except(sel).count() == 0,
      "bucketed selection diverges from the global greedy prefix")
    // budget is a hard ceiling and the selection is non-trivial
    val total = sel.agg(sum("n_tokens")).head().getLong(0)
    assert(total <= budget && total > 0)
    assert(sel.count() < docs.count(), "budget must actually cut the corpus")
    sel.unpersist()
    // degenerate bucketing (everything in one boundary bucket) agrees too
    val oneBucket = Packing.selectByBudget(docs, budget, nBuckets = 1)
    assert(oneBucket.except(global).count() == 0
      && global.except(oneBucket).count() == 0)
    // a budget above the corpus total selects every scorable doc
    val all = Packing.selectByBudget(docs, budgetTokens = 1000000000L)
    assert(all.count() == scored.count())
  }

  test("decontaminate: planted benchmark overlap is flagged, clean docs are not") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "something about the quick brown fox jumps over a fence"),
      (1L, "completely unrelated text with no overlap at all here"),
      (2L, "the quick brown fox jumps over the lazy dog exactly")
    ).toDF("doc_id", "text")
    val res = Packing.decontaminate(corpus, bench, k = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    assert(res.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(res(0)._3, "doc 0 shares 'the quick brown fox jumps'")
    assert(!res(1)._3, "doc 1 shares nothing")
    assert(res(2)._3 && res(2)._2 >= 4, "doc 2 shares many 5-grams")
  }

  test("temperatureMixture: flattened data-derived rates, cap, determinism") {
    // 90/10 skew, alpha=0.5, budget 50: share ∝ sqrt(n) gives the small
    // group 25% of the budget => rate 1.25 capped at 1.0; big group
    // gets 50*0.75/90 ≈ 0.416667
    val docs = ((0 until 90).map(i => (i.toLong, "big")) ++
      (90 until 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val r = Packing.temperatureMixture(docs, alpha = 0.5, budget = 50)
      .select("doc_id", "source", "t_rate", "keep")
      .as[(Long, String, Double, Boolean)].collect()
    val bySrc = r.groupBy(_._2)
    assert(bySrc("small").forall(x => x._3 == 1.0 && x._4),
      "capped rate keeps the whole small group")
    val bigRate = bySrc("big").head._3
    assert(math.abs(bigRate - 50.0 * 0.75 / 90) < 1e-4, s"got $bigRate")
    val kept = bySrc("big").count(_._4)
    assert(kept > 20 && kept < 55, s"kept $kept of 90 at rate ~0.417")
    // deterministic: re-run produces the identical keep set
    val again = Packing.temperatureMixture(docs, alpha = 0.5, budget = 50)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(r.map(x => (x._1, x._4)).toMap == again)
  }

  test("weightedSample: two-phase equals the global A-ES window exactly") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", (i % 7 + 1) * 40)
    }.toDF("doc_id", "source", "n_chars")
    val got = Packing.weightedSample(df, nPerGroup = 10)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    // reference: the same es_key ranked by one full window per group
    val u = (pmod(col("doc_id") * lit(2654435761L), lit(4294967296L))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val ref = df
      .withColumn("es_key",
        round(log(u) / greatest(col("n_chars").cast("double"), lit(1.0)), 12))
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("es_key").desc, col("doc_id"))))
      .filter(col("r") <= 10).select("doc_id").as[Long].collect().toSet
    assert(got == ref)
    assert(got.size == 20, "10 per group, 2 groups")
  }

  test("weightedSample: heavier docs are sampled proportionally more") {
    // weights 1 vs 9: across many rows the heavy class should dominate
    val df = (1 to 2000).map { i =>
      (i.toLong, "g", if (i % 2 == 0) 9 else 1)
    }.toDF("doc_id", "source", "n_chars")
    val kept = Packing.weightedSample(df, nPerGroup = 200)
      .filter(col("kept"))
      .select("doc_id").as[Long].collect()
    val heavy = kept.count(_ % 2 == 0)
    // E[heavy] ≈ 180 of 200 (9:1 odds); even a loose bound proves the
    // weighting is live and directional
    assert(heavy > 140, s"heavy=$heavy of ${kept.length}")
    // kept honors the exact quota
    assert(kept.length == 200)
  }

  test("bucketByRank: exact tercile boundaries, ties share a bucket, NULL unscored") {
    // 9 distinct values ×10 rows each + 5 NULLs; tercile boundaries
    // land exactly at value 3 (cum 30 ≥ ceil(0.3333·90)=30) and 7
    val rows = (for {
      v <- 1 to 9; i <- 1 to 10
    } yield ((v * 100 + i).toLong, Some(v.toDouble))) ++
      (1 to 5).map(i => (9000L + i, Option.empty[Double]))
    val df = rows.toDF("doc_id", "score")
    val out = Packing.bucketByRank(df, "score",
        Seq(("head", 3333), ("middle", 6667)))
      .select(col("doc_id"), col("score"), col("bucket"))
      .as[(Long, Option[Double], String)].collect()
    out.foreach { case (_, s, b) =>
      s match {
        case None => assert(b == "unscored")
        case Some(v) if v <= 3.0 => assert(b == "head", s"v=$v b=$b")
        case Some(v) if v <= 7.0 => assert(b == "middle", s"v=$v b=$b")
        case Some(v) => assert(b == "tail", s"v=$v b=$b")
      }
    }
    // all rows of a tied value share one bucket
    assert(out.filter(_._2.contains(3.0)).map(_._3).distinct.length == 1)
  }
}
