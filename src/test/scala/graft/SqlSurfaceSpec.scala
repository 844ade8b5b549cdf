package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected TABLE functions (GraftExtensions.injectTableFunction)
  * are thin delegates: `FROM graft_funnel(...)` must be the SAME
  * Catalyst plan the DataFrame operator builds, not a second
  * implementation — the reference is SQL-first (pyhdk hdk.py:2456) and
  * this is the parity contract for its analytics families (verdict r8
  * next-round #8).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  Tables.registerAll(spark, TestSpark.sf)

  test("graft_funnel SQL path optimizes to the operator's plan") {
    val sqlPlan = spark
      .sql("SELECT * FROM graft_funnel('events', 'view,click,purchase', '7 days')")
      .queryExecution.optimizedPlan
    val opPlan = graft.operators.Funnel
      .funnel(spark.table("events"), Seq("view", "click", "purchase"),
        "7 days")
      .queryExecution.optimizedPlan
    assert(sqlPlan.sameResult(opPlan),
      s"SQL and operator funnel plans diverge:\n$sqlPlan\nvs\n$opPlan")
  }

  test("graft_ohlc SQL path optimizes to the operator's plan") {
    val sqlPlan = spark
      .sql("SELECT * FROM graft_ohlc('events', 'user_id', 'ts', 'value', 'event_id', 'hour')")
      .queryExecution.optimizedPlan
    val opPlan = graft.operators.TimeJoins
      .ohlcBars(spark.table("events"), "user_id", "ts", "value",
        "event_id", "hour")
      .queryExecution.optimizedPlan
    assert(sqlPlan.sameResult(opPlan))
  }

  test("graft_pagerank SQL path reproduces the operator's result") {
    // pageRank materializes its edge frame via localCheckpoint, so the
    // two plans root at distinct LogicalRDDs and sameResult cannot
    // apply; the contract here is value equality on a pinned graph.
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_edges AS
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        CAST(o_custkey % 50 + 100000 AS BIGINT) AS dst
      FROM orders WHERE o_orderkey % 7 = 0""")
    val viaSql = spark
      .sql("SELECT * FROM graft_pagerank('sqs_edges', 2, 0.85) ORDER BY node_id")
      .collect().toSeq
    val viaOp = graft.operators.Graph
      .pageRank(spark.table("sqs_edges"), iters = 2, d = 0.85)
      .orderBy(col("node_id")).collect().toSeq
    assert(viaSql == viaOp)
  }

  test("a filter outside graft_ohlc pushes below the aggregate") {
    val df = spark.sql("""SELECT * FROM
      graft_ohlc('events', 'user_id', 'ts', 'value', 'event_id', 'day')
      WHERE user_id % 3 = 0""")
    val agg = df.queryExecution.optimizedPlan
      .collectFirst { case a: Aggregate => a }
    assert(agg.isDefined, "no Aggregate in the ohlc plan")
    val pushed = agg.get.collectFirst {
      case f: Filter if f.condition.references.map(_.name)
        .exists(_ == "user_id") => f
    }
    assert(pushed.isDefined,
      "the user_id filter did not push through the TVF's aggregate:\n" +
        df.queryExecution.optimizedPlan)
  }

  test("table functions reject malformed arguments") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_funnel('events', 'only_one_step', '7 days')")
        .collect()
    }
    assert(e1.getMessage.contains("at least two steps") ||
      e1.getCause != null)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_pagerank('events', 99, 0.85)").collect()
    }
    assert(e2.getMessage.contains("iters") || e2.getCause != null)
  }

  // ---- r10 widened surface: the graph family, the hypothesis-test
  // family, and winsorize. LAZY operators (welch/ols/winsorize) get the
  // strongest contract — sameResult plan equality; operators that
  // materialize internally (every iterative graph op, and the tests
  // built on checkpointed histograms) root at distinct LogicalRDDs, so
  // their contract is value equality on a pinned input (the
  // graft_pagerank precedent).

  test("graft_welch / graft_ols / graft_winsorize optimize to the operator's plan") {
    val sqlW = spark
      .sql("SELECT * FROM graft_welch('events', 'event_type', 'view', 'click', 'value')")
      .queryExecution.optimizedPlan
    val opW = graft.operators.Stats
      .welchTTest(spark.table("events"), "event_type", "view", "click",
        "value")
      .queryExecution.optimizedPlan
    assert(sqlW.sameResult(opW))
    val sqlO = spark
      .sql("SELECT * FROM graft_ols('lineitem', 'l_linestatus', 'l_quantity', 'l_extendedprice')")
      .queryExecution.optimizedPlan
    val opO = graft.operators.Stats
      .linearFit(spark.table("lineitem"), "l_linestatus", "l_quantity",
        "l_extendedprice")
      .queryExecution.optimizedPlan
    assert(sqlO.sameResult(opO))
    val sqlZ = spark
      .sql("SELECT * FROM graft_winsorize('lineitem', 'l_returnflag', 'l_tax', 0.1, 0.9)")
      .queryExecution.optimizedPlan
    val opZ = graft.operators.Quality
      .winsorize(spark.table("lineitem"), "l_returnflag", "l_tax",
        0.1, 0.9)
      .queryExecution.optimizedPlan
    assert(sqlZ.sameResult(opZ))
  }

  test("graph family SQL paths reproduce the operators' results") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_g AS
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        CAST(o_custkey % 50 + 100000 AS BIGINT) AS dst
      FROM orders WHERE o_orderkey % 7 = 0""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_gw AS
      SELECT src, dst, dst % 5 + 1 AS w FROM sqs_g""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_src AS
      SELECT min(src) AS node_id FROM sqs_g""")
    val g = spark.table("sqs_g")
    def same(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql).collect().toSeq
      val viaOp = op.collect().toSeq
      assert(viaSql == viaOp, s"SQL/operator divergence for: $sql")
    }
    same("SELECT * FROM graft_components('sqs_g', 40) ORDER BY node_id",
      graft.operators.Graph.connectedComponents(g, 40)
        .orderBy(col("node_id")))
    same("SELECT * FROM graft_kcore('sqs_g', 2, 40) ORDER BY node_id",
      graft.operators.Graph.kCore(g, 2, 40).orderBy(col("node_id")))
    same("SELECT * FROM graft_bfs('sqs_g', 'sqs_src', true, 40) ORDER BY node_id",
      graft.operators.Graph.bfsHops(g, spark.table("sqs_src"), true, 40)
        .orderBy(col("node_id")))
    same("SELECT * FROM graft_sssp('sqs_gw', 'sqs_src', true, 60) ORDER BY node_id",
      graft.operators.Graph.weightedShortestPaths(spark.table("sqs_gw"),
        spark.table("sqs_src"), true, 60).orderBy(col("node_id")))
    same("SELECT * FROM graft_hits('sqs_g', 2) ORDER BY node_id",
      graft.operators.Graph.hits(g, 2).orderBy(col("node_id")))
    same("SELECT * FROM graft_linkpred('sqs_g', 20, 10000) " +
        "ORDER BY node_u, node_v",
      graft.operators.Graph.linkPredict(g, 20, 10000)
        .orderBy(col("node_u"), col("node_v")))
  }

  test("hypothesis-test family SQL paths reproduce the operators' results") {
    def same(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql).collect().toSeq
      val viaOp = op.collect().toSeq
      assert(viaSql == viaOp, s"SQL/operator divergence for: $sql")
    }
    val ev = spark.table("events")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_chi AS
      SELECT event_type, CAST(user_id % 4 AS BIGINT) AS band FROM events""")
    same("SELECT * FROM graft_chi2('sqs_chi', 'event_type', 'band') " +
        "ORDER BY event_type, band",
      graft.operators.Stats.chiSquare(spark.table("sqs_chi"),
        "event_type", "band")
        .orderBy(col("event_type"), col("band")))
    same("SELECT * FROM graft_ks('events', 'event_type', 'click', 'view', 'value')",
      graft.operators.Stats.ksTest(ev, "event_type", "click", "view",
        "value"))
    same("SELECT * FROM graft_mwu('events', 'event_type', 'click', 'view', 'value')",
      graft.operators.Stats.mannWhitney(ev, "event_type", "click",
        "view", "value"))
    // the k-group members (r10): anovaF is a lazy plan → sameResult;
    // kruskalWallis materializes internally (range probe +
    // checkpoints) → pinned-input value equality
    val sqlA = spark
      .sql("SELECT * FROM graft_anova('events', 'event_type', 'value')")
      .queryExecution.optimizedPlan
    val opA = graft.operators.Stats.anovaF(ev, "event_type", "value")
      .queryExecution.optimizedPlan
    assert(sqlA.sameResult(opA))
    same("SELECT * FROM graft_kw('events', 'event_type', 'value')",
      graft.operators.Stats.kruskalWallis(ev, "event_type", "value"))
    val sqlL = spark
      .sql("SELECT * FROM graft_levene('events', 'event_type', 'value')")
      .queryExecution.optimizedPlan
    val opL = graft.operators.Stats
      .brownForsythe(ev, "event_type", "value")
      .queryExecution.optimizedPlan
    assert(sqlL.sameResult(opL))
  }

  test("pipeline family: graft_drift plan-equal, graft_dedup_keep value-equal") {
    // distributionDrift is a lazy plan → the strongest (sameResult)
    // contract applies; nearDedupAuto materializes internally (probe +
    // checkpointed legs) → pinned-input value equality
    val sqlD = spark
      .sql("SELECT * FROM graft_drift('documents', 'text', 'lang')")
      .queryExecution.optimizedPlan
    val opD = graft.pipeline.TextAnalysis
      .distributionDrift(spark.table("documents"), "text", "lang")
      .queryExecution.optimizedPlan
    assert(sqlD.sameResult(opD))
    val viaSql = spark
      .sql("SELECT * FROM graft_dedup_keep('documents', 0.8) ORDER BY doc_id")
      .collect().toSeq
    val viaOp = graft.pipeline.Dedup
      .nearDedupAuto(spark.table("documents"), 0.8)
      .orderBy(col("doc_id")).collect().toSeq
    assert(viaSql == viaOp)
    // PSI probes its baseline internally → pinned-input value equality
    val psiSql = spark
      .sql("SELECT * FROM graft_psi('documents', 'text', 'lang', 'en') " +
        "ORDER BY source")
      .collect().toSeq
    val psiOp = graft.pipeline.TextAnalysis
      .distributionPsi(spark.table("documents"), "text", "lang", "en")
      .orderBy(col("source")).collect().toSeq
    assert(psiSql == psiOp)
  }

  test("classifier-QA / agreement / FDR family SQL paths match the operators") {
    val ev = spark.table("events")
    // lazy operators → strongest (sameResult) contract
    def planEq(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val sqlPlan = spark.sql(sql).queryExecution.optimizedPlan
      val opPlan = op.queryExecution.optimizedPlan
      assert(sqlPlan.sameResult(opPlan), s"plan divergence for: $sql")
    }
    planEq("SELECT * FROM graft_auc('events', 'event_type', 'user_id', 'value')",
      graft.operators.Stats.rocAuc(ev, "event_type", "user_id", "value"))
    planEq("SELECT * FROM graft_mcnemar('events', 'value', 'user_id')",
      graft.operators.Stats.mcnemar(ev, "value", "user_id"))
    planEq("SELECT * FROM graft_partial_corr('lineitem', 'l_quantity', 'l_tax', 'l_discount')",
      graft.operators.Stats.partialCorr(spark.table("lineitem"),
        "l_quantity", "l_tax", "l_discount"))
    planEq("SELECT * FROM graft_mwu_by_key('events', 'user_id', 'event_type', 'click', 'view', 'value')",
      graft.operators.Stats.mannWhitneyByKey(ev, "user_id",
        "event_type", "click", "view", "value"))
    planEq("SELECT * FROM graft_gini('events', 'event_type', 'value')",
      graft.operators.Stats.giniConcentration(ev, "event_type", "value"))
    planEq("SELECT * FROM graft_calibration('events', 'event_type', 'user_id', 'value', 10)",
      graft.operators.Stats.calibration(ev, "event_type", "user_id",
        "value", 10))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_ps AS
      SELECT event_id, CAST(user_id % 97 + 1 AS DOUBLE) / 100.0 AS p
      FROM events""")
    planEq("SELECT * FROM graft_bh_fdr('sqs_ps', 'event_id', 'p', 0.05)",
      graft.operators.Stats.bhFdr(spark.table("sqs_ps"), "event_id",
        "p", 0.05))
    // operators that materialize internally (probe/checkpoint) →
    // pinned-input value equality (the graft_pagerank precedent)
    def same(sql: String, op: org.apache.spark.sql.DataFrame): Unit =
      assert(spark.sql(sql).collect().toSeq == op.collect().toSeq,
        s"SQL/operator divergence for: $sql")
    same("SELECT * FROM graft_wilcoxon('events', 'value', 'user_id')",
      graft.operators.Stats.wilcoxonSignedRank(ev, "value", "user_id"))
    same("SELECT * FROM graft_kappa('sqs_chi', 'event_type', 'band')",
      graft.operators.Stats.cohensKappa(spark.table("sqs_chi"),
        "event_type", "band"))
    same("SELECT * FROM graft_friedman('events', 'user_id', 'event_type', 'value')",
      graft.operators.Stats.friedman(ev, "user_id", "event_type",
        "value"))
    same("SELECT * FROM graft_cochran('events', 'user_id', 'event_type', 'value')",
      graft.operators.Stats.cochranQ(ev, "user_id", "event_type",
        "value"))
    same("SELECT * FROM graft_fleiss('sqs_chi', 'band', 'event_type', 4)",
      graft.operators.Stats.fleissKappa(spark.table("sqs_chi"),
        "band", "event_type", 4))
    same("SELECT * FROM graft_cramer('sqs_chi', 'event_type', 'band')",
      graft.operators.Stats.cramersV(spark.table("sqs_chi"),
        "event_type", "band"))
    same("SELECT * FROM graft_cronbach('events', 'user_id', 'event_type', 'value')",
      graft.operators.Stats.cronbachAlpha(ev, "user_id", "event_type",
        "value"))
  }

  // ---- r11 widened surface: the time-series family (the last family
  // with zero SQL routes), the correlation family, linkage,
  // change-data and retrieval eval. Same contract split as r10: lazy
  // operators → sameResult; internally-materializing ones
  // (persist/checkpoint/probe roots) → pinned-input value equality.

  test("r11 time-series TVFs optimize to the operators' plans") {
    import graft.operators.TimeJoins
    val ev = spark.table("events")
    def planEq(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val sqlPlan = spark.sql(sql).queryExecution.optimizedPlan
      val opPlan = op.queryExecution.optimizedPlan
      assert(sqlPlan.sameResult(opPlan), s"plan divergence for: $sql")
    }
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_asof_l AS
      SELECT event_id, user_id, ts, value AS p_val FROM events
      WHERE event_type = 'purchase'""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_asof_r AS
      SELECT user_id, ts, max(value) AS c_val, ts AS c_ts FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts""")
    planEq(
      "SELECT * FROM graft_asof('sqs_asof_l', 'sqs_asof_r', 'user_id', 'ts', 'c_ts,c_val')",
      TimeJoins.asofJoin(spark.table("sqs_asof_l"),
        spark.table("sqs_asof_r"), "user_id", "ts", Seq("c_ts", "c_val")))
    planEq(
      "SELECT * FROM graft_resample('events', 'user_id', 'ts', 'value', 'event_id', 'hour')",
      TimeJoins.resampleFfill(ev, "user_id", "ts", "value", "event_id",
        "hour"))
    planEq(
      "SELECT * FROM graft_ewma('events', 'user_id', 'ts', 'value', 'event_id', 0.25D, 10)",
      TimeJoins.ewma(ev, "user_id", "ts", "value", "event_id", 0.25, 10))
    planEq(
      "SELECT * FROM graft_twap('events', 'user_id', 'ts', 'value', 'event_id')",
      TimeJoins.twap(ev, "user_id", "ts", "value", "event_id"))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_series AS
      SELECT event_type,
        unix_micros(date_trunc('hour', ts)) div 3600000000 AS hr,
        CAST(count(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2""")
    planEq(
      "SELECT * FROM graft_cusum('sqs_series', 'event_type', 'hr', 'value', 0.5D, 5.0D)",
      TimeJoins.cusum(spark.table("sqs_series"), "event_type", "hr",
        "value", 0.5, 5.0))
    planEq(
      "SELECT * FROM graft_acf('sqs_series', 'event_type', 'hr', 'value', 3)",
      TimeJoins.acf(spark.table("sqs_series"), "event_type", "hr",
        "value", maxLag = 3))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_series2 AS
      SELECT event_type,
        unix_micros(date_trunc('hour', ts)) div 3600000000 AS hr,
        CAST(count(*) AS DOUBLE) AS x,
        CAST(count(CASE WHEN value > 50.0 THEN 1 END) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2""")
    planEq(
      "SELECT * FROM graft_ccf('sqs_series2', 'event_type', 'hr', 'x', 'y', 2)",
      TimeJoins.ccf(spark.table("sqs_series2"), "event_type", "hr",
        "x", "y", maxLag = 2))
    planEq(
      "SELECT * FROM graft_seasonal('sqs_series', 'event_type', 'hr', 'value', 5)",
      TimeJoins.seasonalDecompose(spark.table("sqs_series"),
        "event_type", "hr", "value", period = 5))
    planEq(
      "SELECT * FROM graft_holt('events', 'user_id', 'ts', 'value', 'event_id', 0.5D, 0.25D, 2)",
      TimeJoins.holtSmooth(ev, "user_id", "ts", "value", "event_id",
        alpha = 0.5, beta = 0.25, horizon = 2))
    planEq(
      "SELECT * FROM graft_zscore('events', 'user_id', 'ts', 'value', 'event_id', 10, 3, 2.5D)",
      TimeJoins.rollingZScore(ev, "user_id", "ts", "value", "event_id",
        span = 10, minObs = 3, threshold = 2.5))
    planEq(
      "SELECT * FROM graft_retention('events')",
      graft.operators.Funnel.retention(ev))
    planEq(
      "SELECT * FROM graft_transitions('events')",
      graft.operators.Funnel.transitions(ev))
    // keyProfile materializes internally → pinned-input value equality
    // (sorted: multi-row output)
    assert(spark
      .sql("SELECT * FROM graft_skew('events', 'event_type', 3, 2.0D)")
      .collect().toSeq.sortBy(_.toString) ==
      graft.operators.Skew.keyProfile(ev, Seq("event_type"), topK = 3,
        saltThreshold = 2.0).collect().toSeq.sortBy(_.toString))
  }

  test("r12 pipeline-assembly TVFs optimize to the operators' plans") {
    import graft.pipeline.{Packing, TextAnalysis}
    val docs = spark.table("documents")
    def planEq(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val sqlPlan = spark.sql(sql).queryExecution.optimizedPlan
      val opPlan = op.queryExecution.optimizedPlan
      assert(sqlPlan.sameResult(opPlan), s"plan divergence for: $sql")
    }
    planEq(
      "SELECT * FROM graft_mix('documents', 'src1:7500,src2:1000', 3000)",
      Packing.sampleMixture(docs,
        Seq("src1" -> 7500, "src2" -> 1000), defaultBp = 3000))
    planEq(
      "SELECT * FROM graft_split('documents', 'doc_id', 'train:70,val:15,test:15')",
      Packing.withSplit(docs, "doc_id",
        Seq("train" -> 70, "val" -> 15, "test" -> 15)))
    planEq(
      "SELECT * FROM graft_pack('documents', 512, 4)",
      Packing.packSequences(docs, capacity = 512, nShards = 4))
    planEq(
      "SELECT * FROM graft_pack_bins('documents', 512, 4, 8)",
      Packing.packBins(docs, capacity = 512, nShards = 4, maxClass = 8))
    planEq(
      "SELECT * FROM graft_quota('documents', 25)",
      Packing.quotaSample(docs, nPerGroup = 25))
    planEq(
      "SELECT * FROM graft_bm25_topk('documents', 'data join stream', 15)",
      TextAnalysis.bm25TopK(docs, Seq("data", "join", "stream"), k = 15))
    // graft_profile carries TWO count-distincts, and the optimizer's
    // distinct-rewrite numbers its FILTER groups by hash-map iteration
    // order — exprId-dependent, so two analyses of the SAME construction
    // can land mirror-ordered aggregate lists that sameResult cannot
    // unify (measured: the flip reproduces only under concurrent
    // suites' interleaved exprId allocation). Value equality is the
    // honest contract here (sorted: multi-row output).
    assert(spark
      .sql("SELECT * FROM graft_profile('lineitem', 'l_partkey,l_suppkey')")
      .collect().toSeq.sortBy(_.toString) ==
      graft.operators.Quality.profile(spark.table("lineitem"),
        Seq("l_partkey", "l_suppkey")).collect().toSeq.sortBy(_.toString))
  }

  test("r11 correlation / change-data / retrieval TVFs match the operators") {
    import graft.operators.{Merge, Stats}
    def planEq(sql: String, op: org.apache.spark.sql.DataFrame): Unit = {
      val sqlPlan = spark.sql(sql).queryExecution.optimizedPlan
      val opPlan = op.queryExecution.optimizedPlan
      assert(sqlPlan.sameResult(opPlan), s"plan divergence for: $sql")
    }
    planEq(
      "SELECT * FROM graft_benford('orders', 'o_totalprice', 1)",
      Stats.benford(spark.table("orders"), "o_totalprice", scale = 1))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_prev AS
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_next AS
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 3 <> 1""")
    planEq(
      "SELECT * FROM graft_snapshot_diff('sqs_prev', 'sqs_next', 'o_orderkey')",
      Merge.snapshotDiff(spark.table("sqs_prev"),
        spark.table("sqs_next"), Seq("o_orderkey")))
    planEq(
      "SELECT * FROM graft_scd2('sqs_prev', 'o_custkey', 'o_orderkey', 'o_totalprice')",
      Merge.historize(spark.table("sqs_prev"), Seq("o_custkey"),
        "o_orderkey", Seq("o_totalprice")))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_ranked AS
      SELECT event_type, event_id, CAST(value AS DOUBLE) AS score,
        CAST(pmod(user_id, 3) AS BIGINT) AS rel
      FROM events WHERE value IS NOT NULL""")
    planEq(
      "SELECT * FROM graft_ndcg('sqs_ranked', 'event_type', 'event_id', 'score', 'rel', 10)",
      Stats.ndcgAtK(spark.table("sqs_ranked"), "event_type", "event_id",
        "score", "rel", k = 10))
    planEq(
      "SELECT * FROM graft_retrieval_eval('sqs_ranked', 'event_type', 'event_id', 'score', 'rel', 10)",
      Stats.retrievalEval(spark.table("sqs_ranked"), "event_type",
        "event_id", "score", "rel", k = 10))
    planEq(
      "SELECT * FROM graft_map('sqs_ranked', 'event_type', 'event_id', 'score', 'rel')",
      Stats.averagePrecision(spark.table("sqs_ranked"), "event_type",
        "event_id", "score", "rel"))
    // materializing operators (persisted/checkpointed roots) →
    // pinned-input value equality, sorted (multi-row outputs)
    def same(sql: String, op: org.apache.spark.sql.DataFrame): Unit =
      assert(spark.sql(sql).collect().toSeq.sortBy(_.toString) ==
        op.collect().toSeq.sortBy(_.toString),
        s"SQL/operator divergence for: $sql")
    same("SELECT * FROM graft_mutual_info('lineitem', 'l_returnflag', 'l_linestatus')",
      graft.operators.Stats.mutualInformation(spark.table("lineitem"),
        "l_returnflag", "l_linestatus"))
    same("SELECT * FROM graft_spearman('lineitem', 'l_quantity', 'l_tax')",
      graft.operators.Stats.spearman(spark.table("lineitem"),
        "l_quantity", "l_tax"))
    same("SELECT * FROM graft_kendall('lineitem', 'l_linenumber', 'l_quantity')",
      graft.operators.Stats.kendallTau(spark.table("lineitem"),
        "l_linenumber", "l_quantity"))
    same("SELECT * FROM graft_mann_kendall('events', 'user_id', 'ts', 'value', 'event_id')",
      graft.operators.Stats.mannKendall(spark.table("events"),
        "user_id", "ts", "value", "event_id"))
    same("SELECT * FROM graft_theil_sen('events', 'user_id', 'ts', 'value')",
      graft.operators.Stats.theilSen(spark.table("events"),
        "user_id", "ts", "value"))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_dirty AS
      SELECT doc_id AS dirty_id,
        regexp_replace(trim(text), '^\\S+\\s+', '') AS text
      FROM documents WHERE doc_id % 5 = 1""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_clean AS
      SELECT doc_id AS clean_id, text FROM documents""")
    same("SELECT * FROM graft_er_match('sqs_dirty', 'sqs_clean', 0.5D)",
      graft.operators.Linkage.matchEntities(spark.table("sqs_dirty"),
        spark.table("sqs_clean"), threshold = 0.5))
    spark.sql("""CREATE OR REPLACE TEMP VIEW sqs_ed AS
      SELECT doc_id AS id, substring(lower(text), 1, 16) AS s
      FROM documents""")
    same("SELECT * FROM graft_editdist('sqs_ed', 'id', 's', 1)",
      graft.operators.Linkage.editDistancePairs(spark.table("sqs_ed"),
        "id", "s", k = 1))
  }

  test("r11 table functions reject malformed arguments") {
    val cases = Seq(
      "SELECT * FROM graft_asof('events', 'events', 'user_id', 'ts')", // arity
      "SELECT * FROM graft_ewma('events', 'user_id', 'ts', 'value', 'event_id', 'a', 10)", // non-num alpha
      "SELECT * FROM graft_holt('events', 'user_id', 'ts', 'value', 'event_id', 0.5D, 0.25D, 'two')", // non-int horizon
      "SELECT * FROM graft_cusum('events', 'user_id', 'ts', 'value', 0.5D)", // arity
      "SELECT * FROM graft_seasonal('events', 'user_id', 'ts', 'value', 'daily')", // non-int period
      "SELECT * FROM graft_theil_sen('events', 'user_id', 'ts')", // arity
      "SELECT * FROM graft_er_match('documents', 'documents')", // arity
      "SELECT * FROM graft_editdist('documents', 'doc_id', 'text', 'one')", // non-int k
      "SELECT * FROM graft_snapshot_diff('orders', 'orders')", // arity
      "SELECT * FROM graft_dedup_keep_best('documents', 'n_chars')", // arity
      "SELECT * FROM graft_retention('events', 'extra')", // arity
      "SELECT * FROM graft_zscore('events', 'user_id', 'ts', 'value', 'event_id', 'ten', 3, 2.5D)", // non-int span
      "SELECT * FROM graft_skew('orders', 'o_orderpriority', 3)", // arity
      "SELECT * FROM graft_ndcg('events', 'event_type', 'event_id', 'value', 'user_id', 0.5D)") // non-int k
    cases.foreach { q =>
      val e = intercept[Exception] { spark.sql(q).collect() }
      assert(e != null, s"expected rejection for: $q")
    }
  }

  test("r10-continuation table functions reject malformed arguments") {
    val cases = Seq(
      "SELECT * FROM graft_auc('events', 'event_type', 'user_id')",  // arity
      "SELECT * FROM graft_kappa('events', 'event_type')",           // arity
      "SELECT * FROM graft_calibration('events', 'k', 'y', 's', 'x')", // non-int
      "SELECT * FROM graft_bh_fdr('events', 'event_id', 'value', 'a')", // non-num
      "SELECT * FROM graft_friedman('events', 'user_id', 'event_type')") // arity
    cases.foreach { q =>
      val e = intercept[Exception] { spark.sql(q).collect() }
      assert(e != null, s"expected rejection for: $q")
    }
  }

  test("widened table functions reject malformed arguments") {
    val cases = Seq(
      "SELECT * FROM graft_components('events')",         // arity
      "SELECT * FROM graft_kcore('events', 'two', 40)",   // non-int k
      "SELECT * FROM graft_bfs('events', 'events', 'yes', 40)", // non-bool
      "SELECT * FROM graft_welch('events', 'event_type', 'a', 'b')", // arity
      "SELECT * FROM graft_winsorize('lineitem', 'l_returnflag', 'l_tax', 'lo', 0.9)", // non-num
      "SELECT * FROM graft_kw('events', 'event_type')",     // arity
      "SELECT * FROM graft_anova('events', 'event_type', 'value', 4)", // arity
      "SELECT * FROM graft_read_shards('a', 'b')", // arity (r13 IO12)
      "SELECT * FROM graft_mix('documents', 'src1:7a', 3000)", // bad rate
      "SELECT * FROM graft_split('documents', 'doc_id', 'train80')") // bad rate
    cases.foreach { q =>
      val e = intercept[Exception] { spark.sql(q).collect() }
      assert(e != null, s"expected rejection for: $q")
    }
  }
}
