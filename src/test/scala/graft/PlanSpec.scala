package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale-shape assertions: these test the PLAN, not the rows — the
  * properties that decide whether a query survives a 100× scale-up.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("filters are pushed down to the parquet scan (q02)") {
    val p = plan("q02_filter_proj")
    // plan text truncates the filter list — assert it is non-empty
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("scan schema is pruned to referenced columns (q02)") {
    val p = plan("q02_filter_proj")
    // lineitem has 11 columns; q02 needs 6 — returnflag must not be read
    assert(!p.contains("l_returnflag"), "unpruned scan:\n" + p)
  }

  test("dimension joins broadcast (q03, q05)") {
    assert(plan("q03_join").contains("BroadcastHashJoin"))
    val p5 = plan("q05_join_multi")
    assert(p5.contains("BroadcastHashJoin"))
  }

  test("aggregations are partial (map-side combine) (q01)") {
    val p = plan("q01_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final HashAggregate:\n" + p)
  }

  test("custom TopKAgg partial-aggregates via ObjectHashAggregate (q21)") {
    val p = plan("q21_topk")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final ObjectHashAggregate:\n" + p)
  }

  test("Misra-Gries summary partial-aggregates; verify joins, never cartesian (P18d)") {
    val p = plan("heavy_hitters")
    // the MG sketch must combine map-side: k counters shuffle per task,
    // never the token stream
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final ObjectHashAggregate:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "candidate verify must stay an equi-join:\n" + p)
  }

  test("CMS and KLL sketches partial-aggregate map-side (P18j/P18k)") {
    // the whole point of a mergeable sketch: d*w counters (CMS) or a
    // bounded summary (KLL) shuffle per map task, never the row stream
    val pc = plan("cms_counts")
    assert("ObjectHashAggregate".r.findAllIn(pc).length >= 2,
      "CMS must combine map-side:\n" + pc)
    val pk = plan("kll_quantiles")
    assert("ObjectHashAggregate".r.findAllIn(pk).length >= 2,
      "KLL must combine map-side:\n" + pk)
    assert(!pk.contains("CartesianProduct"), pk)
  }

  test("drift pair join is an equi-join on token; totals broadcast (P23)") {
    val p = plan("text_drift")
    // the V×S² pair table comes from a token equi-join of two aligned
    // frames, never a cartesian; the per-source totals ride broadcast
    assert(!p.contains("CartesianProduct"),
      "pair generation must equi-join on token:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "totals/vocab-size frames must broadcast:\n" + p)
    // the final JS rollup partial-aggregates map-side
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("BPE encode looks up a broadcast word map; reassembly is one doc_id agg (P18h)") {
    val p = plan("text_bpe_encode")
    assert(p.contains("BroadcastHashJoin"),
      "word→syms table must broadcast (vocab-scale lookup):\n" + p)
    assert(!p.contains("Window"), "no window in reassembly:\n" + p)
  }

  test("MERGE is one equi-join pass — no cartesian, no window (R16)") {
    val p = plan("q51_merge")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), "non-equi merge join:\n" + p)
    assert(!p.contains("Window"), "MERGE must not need a window:\n" + p)
  }

  test("resample windows partition on the high-cardinality key (R17)") {
    val p = plan("q52_resample")
    // the ffill window must be keyed by user_id — a keyless (global)
    // window would serialize the whole grid into one task
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .toSeq
    assert(winLines.nonEmpty, p)
    assert(winLines.forall(_.contains("user_id")),
      "ffill window not partitioned by the key:\n" + p)
  }

  test("funnel stages join without cartesian products, windows stay keyed (R19/R22)") {
    val p55 = plan("q55_funnel")
    assert(!p55.contains("CartesianProduct") &&
      !p55.contains("BroadcastNestedLoop"),
      "funnel must stay equi-keyed on user_id:\n" + p55)
    val p58 = plan("q58_transitions")
    val winLines = p58.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("user_id")),
      "transition lag window not keyed by user_id:\n" + p58)
  }

  test("temperature mixture broadcasts the rate table; corpus never sort-merges (P16c)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val p = graft.pipeline.Packing
      .temperatureMixture(docs, alpha = 0.5, budget = 300)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "rates must broadcast-join back to the corpus:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "corpus must not shuffle for the rate join:\n" + p)
  }

  test("max-dup-run islands window is keyed by doc_id (P15c)") {
    // The operator checkpoints its result (truncating the inspectable
    // plan), so probe the islands-window shape it builds: both the lag
    // and the running sum must partition on the high-cardinality doc id
    // — an unkeyed window here would serialize every duplicated start
    // in the corpus into one task.
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val starts = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val probe = starts
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
    val p = probe.queryExecution.executedPlan.toString
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("doc_id")),
      "island windows must partition on doc_id:\n" + p)
    assert(p.contains("hashpartitioning(doc_id"),
      "window exchange not hashed on doc_id:\n" + p)
  }

  test("whole-stage codegen covers the q01 pipeline") {
    // materialize so AQE finalizes the physical plan with codegen spans
    val df = SparkEntry.queries("q01_agg")(spark, TestSpark.sf)
    df.collect()
    // "*(n)" is the compact WholeStageCodegen marker in plan toString
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("sort+limit uses TakeOrderedAndProject, not a global sort (q04)") {
    val p = plan("q04_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("lateral limit decorrelates to WindowGroupLimit + hash join (q41)") {
    val p = plan("q41_lateral")
    // a cartesian/BNL here would be the 100TB failure mode
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), "cartesian lateral:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "BNL lateral:\n" + p)
  }

  test("candidate exact-verify is equi-joined, never cartesian") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val cands = graft.pipeline.Dedup.minhashPairs(docs, threshold = 0.2)
    // inspect the verify plan BEFORE its localCheckpoint truncates it
    val sh = graft.pipeline.Dedup.shingleTable(docs)
    val pairKeys = cands.select(col("a_id"), col("b_id"))
    val probe = pairKeys
      .join(sh.withColumnRenamed("doc_id", "a_id"), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("h")), Seq("b_id", "h"))
    val p = probe.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "verify join degenerated:\n" + p)
  }

  test("stream-stream attribution joins on the user key, not cross (q44)") {
    val p = plan("q44_stream_attr")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mixture sampling is a narrow map — zero shuffles (P16)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val p = graft.pipeline.Packing
      .sampleMixture(docs, Seq("src0" -> 2500), defaultBp = 5000)
      .queryExecution.executedPlan.toString
    // at 100 TB this operator must stream: any Exchange is a regression
    assert(!p.contains("Exchange"), "sampleMixture shuffles:\n" + p)
  }

  test("epoch upsampling is a narrow explode — zero shuffles (P16b)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val p = graft.pipeline.Packing
      .upsampleMixture(docs, Seq("src0" -> 25000), defaultBp = 7500)
      .queryExecution.executedPlan.toString
    // same contract as P16: the copy fan-out is a Generate over a
    // narrow map — any Exchange would shuffle the corpus to duplicate it
    assert(!p.contains("Exchange"), "upsampleMixture shuffles:\n" + p)
    assert(p.contains("Generate"), "expected the copy explode:\n" + p)
  }

  test("dup-shingle fraction partial-aggregates and equi-joins (P15)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val df = graft.pipeline.Dedup.withDupShingleFraction(docs)
    // the operator checkpoints its (small) result; assert on the
    // pre-checkpoint shape the same way the verify-join test does
    val sh = docs.select(col("doc_id"),
      explode(graft.pipeline.Dedup.shingles(col("text"))).as("sh"))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val probe = sh.join(freq, Seq("sh")).groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    val p = probe.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "frequency agg not partial:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "join degenerated:\n" + p)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_shingles", "n_dup", "dup_frac", "flagged"))
  }

  test("AQE splits a planted skewed join partition (SURVEY §5 skew defense)") {
    // q40 proves saltedJoin CORRECTNESS; this proves the claimed default
    // defense actually fires: a 100:1-skewed fact key under a forced
    // sort-merge join must come out of adaptive planning with the hot
    // partition split (skew=true), not one straggler task.
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // test-scale thresholds: the hot partition is ~MBs, not the
      // production 256 MB default
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      import spark.implicits._
      val fact = spark.range(0, 200000L).select(
        when(col("id") < 150000L, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 1000L).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = fact.join(dim, Seq("k"))
      // AQE finalizes THIS plan only when THIS dataset executes (count()
      // or foreach would plan and adapt a derived query instead). Only
      // the hot key matches the dim side: 150k narrow rows.
      assert(joined.collect().length == 150000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "adaptive plan did not mark the skewed join:\n" + p)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective fact-fact join") {
    // the 100 TB mechanism for fact⨝filtered-fact: the selective side's
    // join keys become a bloom filter evaluated INSIDE the big side's
    // scan stage, so most of the fact table never reaches the shuffle
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val li = Tables.load(spark, TestSpark.sf, "lineitem")
      val ord = Tables.load(spark, TestSpark.sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "no runtime bloom filter injected on the fact side:\n" + p)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("quota sampling never windows the corpus by the group key alone (P20)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val q = graft.pipeline.Packing.quotaSample(docs, nPerGroup = 50)
    val p = q.queryExecution.executedPlan.toString
    // the exact-rank window must be co-partitioned by the key bucket —
    // a window partitioned by `source` alone sorts a corpus-sized
    // partition per group in one task at 100 TB, the exact shape this
    // operator's histogram decomposition exists to avoid
    assert(p.contains("Window"), p)
    assert("hashpartitioning\\(source#\\d+, q_bucket".r
      .findFirstIn(p).isDefined,
      "rank window not bucket-co-partitioned:\n" + p)
    assert("hashpartitioning\\(source#\\d+, 32\\)".r.findFirstIn(p).isEmpty,
      "found a window partitioned by the group key alone:\n" + p)
    // the histogram side must partial-aggregate map-side and broadcast
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "bucket histogram not partial-aggregated:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "histogram not broadcast back onto the corpus:\n" + p)
  }

  test("histogram order-statistic windows consume aggregates, not the corpus (P8d/P21)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    for (df <- Seq(
        graft.pipeline.TextAnalysis.withLengthOutliers(docs),
        graft.pipeline.TextAnalysis.corpusStats(docs))) {
      val plan = df.queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.nonEmpty, "expected a cumulative window in the plan")
      // every window's input must be a histogram (an Aggregate below
      // it), never raw corpus rows — the low-cardinality group key
      // would otherwise serialize a corpus-sized sort into one task
      windows.foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          "window consumes un-aggregated corpus rows:\n" + w)
      }
    }
  }

  test("corpus shuffle is one exchange + in-partition sort, never a global sort (P22)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val sh = graft.pipeline.Packing.shuffleShards(docs, nShards = 16)
    val p = sh.queryExecution.executedPlan.toString
    // one hash exchange on the shard key — NOT range partitioning (which
    // would add a sampling pass) and NOT a single partition
    assert(p.contains("hashpartitioning(shard"),
      "shuffle not hash-partitioned by shard:\n" + p)
    assert(!p.contains("rangepartitioning"),
      "unexpected sampling-based range partition:\n" + p)
    // the sort must be local to each shard's partition: a global sort
    // here would serialize the corpus through Spark's boundary sampling
    // for no benefit (fixed-width ranges are the boundaries)
    assert("Sort \\[.*\\], false".r.findFirstIn(p).isDefined,
      "expected an in-partition (global=false) sort:\n" + p)
    assert("Sort \\[.*\\], true".r.findFirstIn(p).isEmpty,
      "found a global sort:\n" + p)
  }

  test("budget selection's boundary window is bucket-partitioned (P17)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    // Reconstruct the boundary-branch shape (the operator checkpoints
    // its result, truncating the inspectable plan): the ordered-prefix
    // window must be PARTITIONED by the bucket key — an unpartitioned
    // running sum here is exactly the single-partition serialization
    // the histogram decomposition exists to avoid.
    val scored = graft.pipeline.TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .filter(col("quality_score").isNotNull)
      .withColumn("qb", floor(col("quality_score") * 1000).cast("long"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("qb"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    val probe = scored.withColumn("cum", sum(col("n_tokens")).over(wt))
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(qb"),
      "boundary window not partitioned by bucket:\n" + p)
  }

  test("CC pointer-jump self-join reuses the hash-min subtree's exchanges (r16 design)") {
    // connectedComponents (Graph.scala) stopped checkpointing the
    // hash-min frame mid-round in r16: the jump self-join references
    // the same canonical subtree on both sides and relies on
    // ReuseExchange / AQE stage reuse to compute the neighbor-min
    // shuffle ONCE per round. That assumption is load-bearing (without
    // reuse every round pays the edge⋈labels aggregation twice), so pin
    // it: reconstruct one round's step frame exactly as the loop builds
    // it and assert the finalized adaptive plan carries a reused
    // exchange/stage. Disabling spark.sql.exchange.reuse makes this
    // test fail — which is the point.
    val edges = spark.range(0, 2000L)
      .select(col("id").as("src"), ((col("id") * 7 + 3) % 2000L).as("dst"))
    val bidir = edges.union(edges.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint()
    val labels = bidir.groupBy(col("src").as("node_id"))
      .agg(min(col("dst")).as("nbr_min"))
      .select(col("node_id"),
        least(col("node_id"), col("nbr_min")).as("component"))
      .localCheckpoint()
    val neighborMin = bidir
      .join(labels, bidir("dst") === labels("node_id"))
      .groupBy(bidir("src").as("node_id"))
      .agg(min(col("component")).as("nbr_min"))
    val hashMin = labels.join(neighborMin, Seq("node_id"), "left")
      .select(col("node_id"), col("component"),
        least(col("component"), coalesce(col("nbr_min"), col("component")))
          .as("mid"))
    val parents = hashMin.select(col("node_id").as("p_id"),
      col("mid").as("p_comp"))
    val step = hashMin.join(parents, col("mid") === col("p_id"))
      .select(col("node_id"), col("component"),
        least(col("mid"), col("p_comp")).as("next_component"))
    // AQE finalizes THIS plan only when THIS dataset executes
    step.collect()
    val p = step.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      "pointer-jump self-join did not reuse the hash-min exchange " +
        "(each CC round would pay the neighbor-min shuffle twice):\n" + p)
  }
}

/** Partitioned parquet layout (SURVEY.md §2 IO6): the write side of a
  * 100 TB deployment — export partitioned by a low-cardinality key,
  * then prove the read side prunes partitions AT PLAN TIME (the scan
  * must never touch the other keys' directories) while data filters
  * still push into the parquet reader. */
class ParquetLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("partitionBy write → plan-time partition pruning + pushed data filter") {
    val dir = graft.GraftSession.scratchDir("events_by_type")
    val events = Tables.load(spark, TestSpark.sf, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val subdirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(subdirs.count(_.startsWith("event_type=")) >= 2,
      s"expected hive-style partition dirs, got: ${subdirs.mkString(",")}")
    val back = spark.read.parquet(dir)
      .filter(col("event_type") === "click" && col("value") > 0)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") &&
      !p.contains("PartitionFilters: []"),
      "partition filter did not reach the scan:\n" + p)
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(value"),
      "data filter not pushed into parquet:\n" + p)
    // layout change must not change answers
    val expected = events
      .filter(col("event_type") === "click" && col("value") > 0).count()
    assert(back.count() == expected)
  }
}

/** CSV ingest (SURVEY.md §2 IO2) — reference: hdk.py:2229 import_csv
  * (header / delimiter / skip_rows / explicit schema). */
class CsvSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("csv roundtrip preserves rows and schema") {
    val dir = graft.GraftSession.scratchDir("csv_roundtrip")
    val src = Tables.load(spark, TestSpark.sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(src.schema)
      .csv(dir)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val a = src.orderBy("n_nationkey").collect()
    val b = back.orderBy("n_nationkey").collect()
    assert(a.sameElements(b))
  }

  test("csv options: custom delimiter and skipped malformed rows") {
    val dir = graft.GraftSession.scratchDir("csv_opts")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id|name\n1|alpha\n2|beta\nnot_an_int|gamma\n")
    val df = spark.read
      .option("header", "true").option("delimiter", "|")
      .option("mode", "DROPMALFORMED")
      .schema("id INT, name STRING")
      .csv(dir)
    // collect() forces full-row parsing (count() alone may skip field
    // parsing under CSV column pruning and not detect malformed rows)
    assert(df.collect().length == 2)
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("triangles wedge closure is equi-joined, never cartesian (R26)") {
    val p = plan("q63_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "triangle closure must be an equi-join on (lo, hi):\n" + p)
    // per-node counts partial-aggregate before the shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("all-pairs join carries no cartesian and partial-aggregates the verify (P4c)") {
    // the public operator eagerly checkpoints (leaving a bare Scan
    // ExistingRDD behind), so lock the candidate stage directly
    val tok = graft.pipeline.Dedup.shingleTable(
      Tables.load(spark, TestSpark.sf, "documents"))
    val p = graft.pipeline.Dedup.allPairsCandidates(tok, 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "prefix-token candidate join must be an equi-join:\n" + p)
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "df count + per-doc prefix build must partial-aggregate:\n" + p)
  }

  test("global-window lint: every unpartitioned window is config-bounded") {
    // An unpartitioned Window serializes its whole input into ONE task
    // — fine for a k-row frame, fatal for a corpus. This lint walks
    // EVERY locked query's optimized plan and demands each
    // empty-partition Window be provably bounded: either a Limit sits
    // below it in the same plan (self-evidently k rows), or the query
    // is in the explicit aggregate-bounded allowlist below, where the
    // window input is an aggregate over a config-bounded key. A new
    // global window anywhere else fails this test until justified here.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Window => LWindow, GlobalLimit, LocalLimit, LogicalPlan}
    // window input = aggregate at config-bounded cardinality:
    val aggBounded = Map(
      "select_budget" ->
        "cum-sum over the nBuckets(=20) quality-bucket aggregate (Packing.selectByBudget)",
      "quality_buckets" ->
        "cum-count over the distinct-rounded-score histogram aggregate (Packing.bucketByRank)",
      "q76_ks" ->
        "bucket-offset cum-sum over the ≤nBuckets(=1024)+2 coarse-bucket aggregate (Stats.rankedHistogram)",
      "q77_mwu" ->
        "bucket-offset cum-sum over the ≤nBuckets(=1024)+2 coarse-bucket aggregate (Stats.rankedHistogram)",
      "q78_spearman" ->
        "bucket-offset cum-sum over the ≤nBuckets(=1024)+2 coarse-bucket aggregate (Stats.rankMap ×2)",
      "q81_kendall" ->
        "cum-sum over the distinct-x-axis aggregate of the dominance grid (Stats.kendallTau — the A14 bounded-grid contract: |X|=50 quantities here; an unbounded axis must be width_bucket-discretized first, as q81's y axis is)",
      "q118_wilcoxon" ->
        "bucket-offset cum-sum over the ≤nBuckets(=1024) |d|-histogram aggregate (Stats.wilcoxonSignedRank — the q76/q77 rankedHistogram shape)",
      "q123_bh_fdr" ->
        "rank + reverse running-min over ONE ROW PER HYPOTHESIS — experiment-design-bounded (hundreds to thousands of tests), never corpus-bounded; NULL p's are excluded before the window (Stats.bhFdr, R63)",
      "q135_mwu_fdr" ->
        "the same bhFdr hypothesis-frame windows as q123, fed by the per-cohort MWU fan-out (17 rows here; cohort-count-bounded by design)")
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    var found = 0
    def sweep(name: String, lp: LogicalPlan): Unit = lp.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        found += 1
        val limitBelow = w.child.collectFirst {
          case _: GlobalLimit => (); case _: LocalLimit => ()
        }.isDefined
        if (!limitBelow && !aggBounded.contains(name))
          violations += s"$name: unpartitioned window over unbounded input: " +
            w.simpleString(60)
      case _ =>
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try sweep(name, fn(spark, TestSpark.sf).queryExecution.optimizedPlan)
      catch { case e: Throwable =>
        violations += s"$name: failed to plan (${e.getMessage})"
      }
    }
    assert(violations.isEmpty,
      "unbounded global windows found:\n" + violations.mkString("\n"))
    // the matcher must not be vacuous: the allowlisted shapes exist
    assert(found >= 2, s"lint found only $found unpartitioned windows — matcher broken?")
    // negative control: a corpus-sized global window IS flagged
    val bad = Tables.load(spark, TestSpark.sf, "documents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    sweep("negative_control", bad.queryExecution.optimizedPlan)
    assert(violations.exists(_.startsWith("negative_control")),
      "lint failed to flag a deliberately unbounded global window")
  }

  test("media KEEP decisions ride edge builders, never the complete pair relation (r15 lint)") {
    // the r14 verdict's structural ask: the quadratic shape that once
    // rode multimodal_videodup_keep — a member-level self-join with
    // hash equality AND a doc_id < doc_id member inequality (the
    // complete intra-group pair expansion, O(N²) on an identical-media
    // flood) — must never reappear in a KEEP-family plan. The
    // REPORTING keys (multimodal_phash / _audiodup / _videodup) emit
    // the complete relation deliberately (output-proportional by
    // contract); the lint walks only the decision keys.
    def quadraticJoins(
        df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists { c =>
              val s = c.toString
              val hashEq =
                "(fhash|ahash)#\\d+L? = (fhash|ahash)#\\d+".r
                  .findFirstIn(s).isDefined
              val idLt = "doc_id#\\d+L? < doc_id#\\d+".r
                .findFirstIn(s).isDefined
              hashEq && idLt
            } => j.condition.get.toString
      }
    val keepKeys = Seq("shards_phash_keep", "multimodal_videodup_keep",
      "multimodal_audiodup_keep")
    keepKeys.foreach { k =>
      val quad = quadraticJoins(SparkEntry.queries(k)(spark, TestSpark.sf))
      assert(quad.isEmpty,
        s"$k carries a quadratic complete-pair self-join: ${quad.mkString("; ")}")
    }
    // the matcher must not be vacuous: the complete relation's intra
    // self-join (the exact shape the keep path abandoned) IS flagged
    import spark.implicits._
    val hashes = Seq((1L, 7L), (2L, 7L)).toDF("doc_id", "ahash")
    val bad = graft.pipeline.Multimodal.hashPairs(hashes, maxHamming = 3)
    assert(quadraticJoins(bad).nonEmpty,
      "lint failed to flag the complete pair relation's intra self-join")
  }

  test("multimodal resize stays narrow — zero exchanges (P11c)") {
    // orderBy is the query's presentation sort; the OPERATOR itself
    // must not shuffle
    val p = graft.pipeline.Multimodal.resizeImages(
        Tables.load(spark, TestSpark.sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "resize must not shuffle:\n" + p)
  }
}
