package graft.builder

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-style query API mirroring pyhdk's QueryBuilder vocabulary
  * (reference: python/pyhdk/hdk.py `HDK`/`QueryNodeAPI`,
  * omniscidb/QueryBuilder/QueryBuilder.h) so a reference user can
  * switch with their call-shape intact. Every method is a thin
  * declarative wrapper over DataFrame — the plan still flows through
  * Catalyst untouched.
  *
  * {{{
  * val hdk = new GraftBuilder(spark, "/root/testdata/sf0.01")
  * hdk.scan("lineitem")
  *    .filter(col("l_quantity") > 10)
  *    .agg(Seq("l_returnflag"), "count", "sum(l_quantity) as sum_qty")
  *    .sort(("sum_qty", "desc"))
  *    .run()
  * }}}
  */
class GraftBuilder(spark: SparkSession, dir: String,
    configKnobs: Seq[(String, Any)] = Nil) {

  /** pyhdk.init(**kwargs) parity: config knobs in the reference's
    * vocabulary are applied to the session at construction
    * (ConfigBuilder.cpp names; see [[graft.GraftConfig]]). */
  val configReport: Seq[graft.GraftConfig.Mapping] =
    graft.GraftConfig(spark, configKnobs: _*)

  /** hdk.py:2556 `scan` — leaf node over a stored table. */
  def scan(table: String): QueryNode =
    new QueryNode(Tables.load(spark, dir, table), Some(table))

  /** hdk.py:2313 `import_parquet` — returns the table's scan node. */
  def importParquet(path: String, tableName: String,
      fragmentSize: Option[Long] = None): QueryNode =
    new QueryNode(graft.sources.Importer.importParquet(
      spark, path, tableName, fragmentSize), Some(tableName))

  /** hdk.py:2229 `import_csv`. */
  def importCsv(path: String, tableName: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      header: Boolean = true, delimiter: String = ",",
      skipRows: Int = 0, fragmentSize: Option[Long] = None): QueryNode =
    new QueryNode(graft.sources.Importer.importCsv(spark, path, tableName,
      schema, header, delimiter, skipRows, fragmentSize), Some(tableName))

  /** hdk.py:2361 `import_arrow` — one standard Arrow IPC stream. */
  def importArrow(bytes: Array[Byte], tableName: String,
      fragmentSize: Option[Long] = None): QueryNode =
    new QueryNode(graft.sources.Importer.importArrowIpc(
      spark, bytes, tableName, fragmentSize), Some(tableName))

  /** hdk.py:2416 `import_pydict` — in-memory columns (nulls/Option,
    * numeric, boolean, string, date/timestamp/decimal). */
  def importColumns(tableName: String, columns: (String, Seq[Any])*): QueryNode =
    new QueryNode(graft.sources.Importer.importColumns(
      spark, tableName, columns: _*), Some(tableName))

  /** hdk.py:2169 `drop_table`. */
  def dropTable(name: String): Unit =
    graft.sources.Importer.dropTable(spark, name)

  /** hdk.py:2456 `sql` — the SQL frontend over all registered tables. */
  def sql(query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(query)
  }

  /** hdk.py:2130 `create_table` — empty table with the given schema
    * (HDK type names or Spark DDL); returns its scan node. */
  def createTable(name: String, schema: Seq[(String, String)]): QueryNode =
    new QueryNode(
      graft.sources.Importer.createTable(spark, name, schema), Some(name))

  /** hdk.py:2652 `const` — literal expression, optionally cast to an
    * HDK-named type. */
  def const(value: Any, cstType: Option[String] = None): Column = {
    val c = lit(value)
    cstType.fold(c)(t => c.cast(graft.sources.Importer.hdkType(t)))
  }

  /** hdk.py:2708 `date` — date literal from ISO string. */
  def date(value: String): Column = to_date(lit(value))

  /** hdk.py:2750 `timestamp` — timestamp literal from ISO string. */
  def timestamp(value: String): Column = to_timestamp(lit(value))

  /** hdk.py:2729 `time` — HDK has a TIME type; Spark doesn't, so time
    * literals are seconds-of-day (the representation our EXTRACT
    * time-of-day queries use). */
  def time(value: String): Column = {
    val p = value.split(':')
    require(p.length == 3, s"time literal must be HH:MM:SS, got '$value'")
    lit(p(0).toInt * 3600 + p(1).toInt * 60 + p(2).toInt)
  }

  /** hdk.py:2578 `type` — parse an HDK type name to a Spark type. */
  def typeOf(typeStr: String): org.apache.spark.sql.types.DataType =
    graft.sources.Importer.hdkType(typeStr)
}

/** hdk.py:1924 `column_info` result: name, Spark type, nullability. */
case class ColumnInfo(name: String,
    dataType: org.apache.spark.sql.types.DataType, nullable: Boolean)

/** hdk.py:1539 QueryNodeAPI analogue. Immutable; every op returns a new
  * node wrapping the extended logical plan. `tableName` is set only on
  * scan leaves (derived nodes have no stored-table identity, matching
  * the reference). */
class QueryNode(val df: DataFrame, val tableName: Option[String] = None) {

  /** hdk.py:1540 `proj` — column names or (alias, expression) pairs. */
  def proj(cols: String*): QueryNode =
    new QueryNode(df.select(cols.map(col): _*))

  def projExprs(exprs: (String, Column)*): QueryNode =
    new QueryNode(df.select(exprs.map { case (n, c) => c.as(n) }: _*))

  /** hdk.py:1832 `filter`. */
  def filter(conds: Column*): QueryNode =
    new QueryNode(conds.foldLeft(df)(_ filter _))

  /** hdk.py:1606 `agg` — group keys by name plus aggregates in the
    * reference's string mini-language: `count`, `fn(col)`,
    * `count_distinct(col)`, `approx_quantile(col, p)`, `quantile(col,
    * p)`, `topk(col, k)`, `bottomk(col, k)`, `corr(a, b)`; an optional
    * ` as alias` suffix overrides the generated name. */
  def agg(groupKeys: Seq[String], aggs: String*): QueryNode = {
    val parsed = aggs.map(AggParser.parse)
    new QueryNode(df.groupBy(groupKeys.map(col): _*)
      .agg(parsed.head, parsed.tail: _*))
  }

  /** hdk.py:1747 `join` — equi-join on same-named or paired columns. */
  def join(rhs: QueryNode, cols: Seq[String], how: String = "inner"): QueryNode =
    new QueryNode(df.join(rhs.df, cols, how))

  def joinOn(rhs: QueryNode, lhsCols: Seq[String], rhsCols: Seq[String],
      how: String): QueryNode = {
    val cond = lhsCols.zip(rhsCols)
      .map { case (l, r) => df(l) === rhs.df(r) }
      .reduce(_ && _)
    new QueryNode(df.join(rhs.df, cond, how))
  }

  /** hdk.py:1747 `join` with an arbitrary boolean condition (the
    * reference's `cond=` form) — build it from `lhs.ref`/`rhs.ref`
    * columns, e.g. `a.joinOn(b, a.ref("x") >= b.ref("lo") && a.ref("x")
    * < b.ref("hi"))`. Non-equi conditions plan as broadcast-nested-loop
    * when one side is small, range join otherwise — same physical menu
    * as [[graft.operators.TimeJoins]]. */
  def joinOn(rhs: QueryNode, cond: Column, how: String = "inner"): QueryNode =
    new QueryNode(df.join(rhs.df, cond, how))

  /** hdk.py:1679 `sort` — (field, "asc"|"desc") pairs + limit/offset. */
  def sort(fields: (String, String)*): QueryNode =
    new QueryNode(df.orderBy(fields.map {
      case (f, "desc") => col(f).desc
      case (f, _) => col(f).asc
    }: _*))

  def limit(n: Int, offset: Int = 0): QueryNode =
    new QueryNode(if (offset > 0) df.offset(offset).limit(n) else df.limit(n))

  /** hdk.py:1865 `ref` — column reference off this node. */
  def ref(c: String): Column = df(c)

  // ---- event-sequence analytics (SURVEY §2 R19/R20/R22 at the builder
  // surface): the ClickHouse windowFunnel/retention vocabulary the
  // reference's users run as chained self-joins (RelCompound stages)
  // becomes one chain step here. Thin wrappers over
  // [[graft.operators.Funnel]], so the builder path and the operator
  // path produce THE SAME Catalyst plan (QueryBuilderSpec asserts the
  // results coincide; the q60 driver query oracles the builder chain).

  /** Sequential conversion funnel over this node's event relation:
    * deepest step of `steps` reached in order within `window` of the
    * anchoring first step — see [[graft.operators.Funnel.funnel]]. */
  def funnel(steps: Seq[String], window: String = "7 days",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): QueryNode =
    new QueryNode(graft.operators.Funnel.funnel(
      df, steps, window, userCol, tsCol, typeCol))

  /** Weekly cohort retention matrix — see
    * [[graft.operators.Funnel.retention]]. */
  def retention(userCol: String = "user_id",
      tsCol: String = "ts"): QueryNode =
    new QueryNode(graft.operators.Funnel.retention(df, userCol, tsCol))

  /** First-order event-type transition counts — see
    * [[graft.operators.Funnel.transitions]]. */
  def transitions(userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): QueryNode =
    new QueryNode(graft.operators.Funnel.transitions(
      df, userCol, tsCol, typeCol, tieCol))

  /** Fixed-round PageRank over this node's (src, dst) edge relation —
    * see [[graft.operators.Graph.pageRank]]. */
  def pageRank(iters: Int = 3, damping: Double = 0.85): QueryNode =
    new QueryNode(graft.operators.Graph.pageRank(df, iters, damping))

  /** Connected components over this node's (src, dst) edge relation —
    * see [[graft.operators.Graph.connectedComponents]]. */
  def components(maxIters: Int = 40): QueryNode =
    new QueryNode(graft.operators.Graph.connectedComponents(df, maxIters))

  /** Exact per-node triangle counts + clustering coefficient over this
    * node's (src, dst) edge relation — see
    * [[graft.operators.Graph.triangles]]. */
  def triangles(): QueryNode =
    new QueryNode(graft.operators.Graph.triangles(df))

  /** k-core extraction over this node's (src, dst) edge relation —
    * see [[graft.operators.Graph.kCore]]. */
  def kCore(k: Int, maxIters: Int = 40): QueryNode =
    new QueryNode(graft.operators.Graph.kCore(df, k, maxIters))

  /** Link-prediction candidate scoring over this node's (src, dst)
    * edge relation — see [[graft.operators.Graph.linkPredict]] (r10). */
  def linkPredict(topN: Int = 100, maxCenterDegree: Int = 10000,
      minCommonNeighbors: Int = 1): QueryNode =
    new QueryNode(graft.operators.Graph.linkPredict(df, topN,
      maxCenterDegree, minCommonNeighbors))

  /** Single-source BFS hop distances from `sources` — see
    * [[graft.operators.Graph.bfsHops]]. */
  def bfsHops(sources: QueryNode, undirected: Boolean = true,
      maxIters: Int = 40): QueryNode =
    new QueryNode(graft.operators.Graph
      .bfsHops(df, sources.df, undirected, maxIters))

  /** Weighted shortest paths from `sources` — see
    * [[graft.operators.Graph.weightedShortestPaths]]. */
  def weightedShortestPaths(sources: QueryNode,
      undirected: Boolean = true, maxIters: Int = 60): QueryNode =
    new QueryNode(graft.operators.Graph
      .weightedShortestPaths(df, sources.df, undirected, maxIters))

  /** Degree assortativity — see
    * [[graft.operators.Graph.assortativity]]. */
  def assortativity(): QueryNode =
    new QueryNode(graft.operators.Graph.assortativity(df))

  /** HITS hubs/authorities — see [[graft.operators.Graph.hits]]. */
  def hits(iters: Int = 3): QueryNode =
    new QueryNode(graft.operators.Graph.hits(df, iters))

  /** Edit-distance similarity self-join — see
    * [[graft.operators.Linkage.editDistancePairs]]. */
  def editDistancePairs(idCol: String, strCol: String,
      k: Int = 2): QueryNode =
    new QueryNode(graft.operators.Linkage
      .editDistancePairs(df, idCol, strCol, k))

  /** Top principal component of this node's embedding column — see
    * [[graft.pipeline.Similarity.pcaTopComponent]]. */
  def pcaTopComponent(iters: Int = 10,
      vecCol: String = "embedding"): QueryNode =
    new QueryNode(graft.pipeline.Similarity
      .pcaTopComponent(df, iters, vecCol))

  /** Project embeddings onto the top component — see
    * [[graft.pipeline.Similarity.projectOntoTopComponent]]. */
  def projectOntoTopComponent(iters: Int = 10,
      vecCol: String = "embedding"): QueryNode =
    new QueryNode(graft.pipeline.Similarity
      .projectOntoTopComponent(df, iters, vecCol))

  /** Top-k principal components by deflation — see
    * [[graft.pipeline.Similarity.pcaComponents]]. */
  def pcaComponents(nComponents: Int = 2, iters: Int = 10,
      vecCol: String = "embedding"): QueryNode =
    new QueryNode(graft.pipeline.Similarity
      .pcaComponents(df, nComponents, iters, vecCol))

  /** OHLC downsampling of this node's observations — see
    * [[graft.operators.TimeJoins.ohlcBars]]. */
  def ohlc(keyCol: String, tsCol: String, valCol: String, tieCol: String,
      unit: String = "hour"): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .ohlcBars(df, keyCol, tsCol, valCol, tieCol, unit))

  /** Time-weighted average per key — see
    * [[graft.operators.TimeJoins.twap]]. */
  def twap(keyCol: String, tsCol: String, valCol: String,
      tieCol: String): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .twap(df, keyCol, tsCol, valCol, tieCol))

  /** Rolling z-score anomaly flags — see
    * [[graft.operators.TimeJoins.rollingZScore]]. */
  def anomalyZScores(keyCol: String, tsCol: String, valCol: String,
      tieCol: String, span: Int = 20, minObs: Int = 5,
      threshold: Double = 3.0): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .rollingZScore(df, keyCol, tsCol, valCol, tieCol, span, minObs,
        threshold))

  /** Classical additive seasonal decomposition — see
    * [[graft.operators.TimeJoins.seasonalDecompose]]. */
  def seasonalDecompose(keyCol: String, tCol: String, valCol: String,
      period: Int = 24): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .seasonalDecompose(df, keyCol, tCol, valCol, period))

  /** CUSUM mean-shift detection — see
    * [[graft.operators.TimeJoins.cusum]]. */
  def cusum(keyCol: String, tCol: String, valCol: String,
      slack: Double = 0.5, threshold: Double = 5.0): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .cusum(df, keyCol, tCol, valCol, slack, threshold))

  /** Autocorrelation at lags 1..maxLag — see
    * [[graft.operators.TimeJoins.acf]]. */
  def acf(keyCol: String, tCol: String, valCol: String,
      maxLag: Int = 5): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .acf(df, keyCol, tCol, valCol, maxLag))

  /** Lead-lag cross-correlation at lags ±maxLag — see
    * [[graft.operators.TimeJoins.ccf]]. */
  def ccf(keyCol: String, tCol: String, xCol: String, yCol: String,
      maxLag: Int = 5): QueryNode =
    new QueryNode(graft.operators.TimeJoins
      .ccf(df, keyCol, tCol, xCol, yCol, maxLag))

  // ----- change-data family at the builder surface (r9): diff derives
  // the changeset, upsert applies it, historize versions it — the same
  // delegation discipline as the funnel/graph/time-series methods

  /** I/U/D changeset between this node (prev) and `next` — see
    * [[graft.operators.Merge.snapshotDiff]]. */
  def snapshotDiff(next: QueryNode, keys: Seq[String]): QueryNode =
    new QueryNode(graft.operators.Merge.snapshotDiff(df, next.df, keys))

  /** Keyed upsert of `changes` into this node — see
    * [[graft.operators.Merge.upsert]]. */
  def upsert(changes: QueryNode, keys: Seq[String]): QueryNode =
    new QueryNode(graft.operators.Merge.upsert(df, changes.df, keys))

  /** SCD2 versioning of this node's change log — see
    * [[graft.operators.Merge.historize]]. */
  def historize(keys: Seq[String], tsCol: String,
      tieCols: Seq[String]): QueryNode =
    new QueryNode(graft.operators.Merge.historize(df, keys, tsCol, tieCols))

  /** Declarative data-quality audit — see
    * [[graft.operators.Quality.audit]]. */
  def audit(rules: Seq[graft.operators.Quality.Rule]): QueryNode =
    new QueryNode(graft.operators.Quality.audit(df, rules))

  /** Entity resolution of this node's dirty records against `clean` —
    * see [[graft.operators.Linkage.matchEntities]]. */
  def matchEntities(clean: QueryNode, threshold: Double = 0.5,
      strategy: String = "auto"): QueryNode =
    new QueryNode(graft.operators.Linkage
      .matchEntities(df, clean.df, threshold, strategy))

  /** Auto-routed near-dup keep decision over this node's
    * (doc_id, text) — see [[graft.pipeline.Dedup.nearDedupAuto]]
    * (r10: probe-selected exact-prefix vs minhash-band legs). */
  def nearDedupAuto(threshold: Double = 0.8,
      strategy: String = "auto"): QueryNode =
    new QueryNode(graft.pipeline.Dedup
      .nearDedupAuto(df, threshold, strategy))

  /** Quality-aware keep decision (r11): highest-`scoreCol` member per
    * near-dup component — see
    * [[graft.pipeline.Dedup.nearDedupKeepBest]]. */
  def nearDedupKeepBest(scoreCol: String, threshold: Double = 0.8,
      strategy: String = "auto"): QueryNode =
    new QueryNode(graft.pipeline.Dedup
      .nearDedupKeepBest(df, scoreCol, threshold, strategy))

  // ----- hypothesis-testing family at the builder surface (r9)

  /** Chi-square independence — see [[graft.operators.Stats.chiSquare]]. */
  def chiSquare(aCol: String, bCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.chiSquare(df, aCol, bCol))

  /** Welch's t-test — see [[graft.operators.Stats.welchTTest]]. */
  def welchTTest(groupCol: String, gA: String, gB: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.welchTTest(df, groupCol, gA, gB,
      valCol))

  /** Kruskal–Wallis H across all group levels — see
    * [[graft.operators.Stats.kruskalWallis]] (r10). */
  def kruskalWallis(groupCol: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.kruskalWallis(df, groupCol, valCol))

  /** One-way ANOVA F across all group levels — see
    * [[graft.operators.Stats.anovaF]] (r10). */
  def anovaF(groupCol: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.anovaF(df, groupCol, valCol))

  /** Brown–Forsythe variance-homogeneity test — see
    * [[graft.operators.Stats.brownForsythe]] (r10). */
  def brownForsythe(groupCol: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.brownForsythe(df, groupCol,
      valCol))

  /** Wilcoxon signed-rank over paired columns — see
    * [[graft.operators.Stats.wilcoxonSignedRank]] (r10). */
  def wilcoxonSignedRank(xCol: String, yCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.wilcoxonSignedRank(df, xCol,
      yCol))

  /** Holt linear-trend smoothing with h-step forecast — see
    * [[graft.operators.TimeJoins.holtSmooth]] (r10). */
  def holtSmooth(keyCol: String, tsCol: String, valCol: String,
      tieCol: String, alpha: Double = 0.3, beta: Double = 0.1,
      horizon: Int = 1): QueryNode =
    new QueryNode(graft.operators.TimeJoins.holtSmooth(df, keyCol,
      tsCol, valCol, tieCol, alpha, beta, horizon))

  /** Partial correlation controlling for a third column — see
    * [[graft.operators.Stats.partialCorr]] (r10). */
  def partialCorr(xCol: String, yCol: String, zCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.partialCorr(df, xCol, yCol,
      zCol))

  /** Per-key Mann-Whitney U — see
    * [[graft.operators.Stats.mannWhitneyByKey]] (r10). */
  def mannWhitneyByKey(keyCol: String, groupCol: String, gA: String,
      gB: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.mannWhitneyByKey(df, keyCol,
      groupCol, gA, gB, valCol))

  /** Fleiss' kappa multi-rater agreement — see
    * [[graft.operators.Stats.fleissKappa]] (r10). */
  def fleissKappa(itemCol: String, categoryCol: String,
      ratersPerItem: Int): QueryNode =
    new QueryNode(graft.operators.Stats.fleissKappa(df, itemCol,
      categoryCol, ratersPerItem))

  /** Cramér's V contingency effect size — see
    * [[graft.operators.Stats.cramersV]] (r10). */
  def cramersV(aCol: String, bCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.cramersV(df, aCol, bCol))

  /** Cronbach's alpha internal consistency — see
    * [[graft.operators.Stats.cronbachAlpha]] (r10). */
  def cronbachAlpha(blockCol: String, itemCol: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.cronbachAlpha(df, blockCol,
      itemCol, valCol))

  /** Cochran's Q over binary complete blocks — see
    * [[graft.operators.Stats.cochranQ]] (r10). */
  def cochranQ(blockCol: String, treatmentCol: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.cochranQ(df, blockCol,
      treatmentCol, valCol))

  /** Friedman complete-block rank test — see
    * [[graft.operators.Stats.friedman]] (r10). */
  def friedman(blockCol: String, treatmentCol: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.friedman(df, blockCol,
      treatmentCol, valCol))

  /** Lorenz/Gini concentration index per key — see
    * [[graft.operators.Stats.giniConcentration]] (r10). */
  def giniConcentration(keyCol: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.giniConcentration(df, keyCol,
      valCol))

  /** Benjamini–Hochberg FDR step-up over a hypotheses frame — see
    * [[graft.operators.Stats.bhFdr]] (r10). */
  def bhFdr(idCol: String, pCol: String,
      alpha: Double = 0.05): QueryNode =
    new QueryNode(graft.operators.Stats.bhFdr(df, idCol, pCol, alpha))

  /** Average precision per query over a ranked candidate frame — see
    * [[graft.operators.Stats.averagePrecision]] (r10). */
  def averagePrecision(queryCol: String, docCol: String,
      scoreCol: String, relCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.averagePrecision(df, queryCol,
      docCol, scoreCol, relCol))

  /** Per-key classifier calibration summary (Brier + ECE) — see
    * [[graft.operators.Stats.calibration]] (r10). */
  def calibration(keyCol: String, labelCol: String, scoreCol: String,
      nBins: Int = 10): QueryNode =
    new QueryNode(graft.operators.Stats.calibration(df, keyCol,
      labelCol, scoreCol, nBins))

  /** Reliability bins behind [[calibration]] — see
    * [[graft.operators.Stats.reliabilityBins]] (r10). */
  def reliabilityBins(keyCol: String, labelCol: String,
      scoreCol: String, nBins: Int = 10): QueryNode =
    new QueryNode(graft.operators.Stats.reliabilityBins(df, keyCol,
      labelCol, scoreCol, nBins))

  /** McNemar paired-binary marginal-homogeneity test — see
    * [[graft.operators.Stats.mcnemar]] (r10). */
  def mcnemar(xCol: String, yCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.mcnemar(df, xCol, yCol))

  /** Cohen's kappa inter-annotator agreement — see
    * [[graft.operators.Stats.cohensKappa]] (r10). */
  def cohensKappa(aCol: String, bCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.cohensKappa(df, aCol, bCol))

  /** Per-key ROC-AUC + Gini of binary-classifier scores — see
    * [[graft.operators.Stats.rocAuc]] (r10). */
  def rocAuc(keyCol: String, labelCol: String, scoreCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.rocAuc(df, keyCol, labelCol,
      scoreCol))

  /** Binary-relevance retrieval metrics at k — see
    * [[graft.operators.Stats.retrievalEval]] (r10). */
  def retrievalEval(queryCol: String, docCol: String, scoreCol: String,
      relCol: String, k: Int): QueryNode =
    new QueryNode(graft.operators.Stats.retrievalEval(df, queryCol,
      docCol, scoreCol, relCol, k))

  /** Token-distribution PSI vs a baseline group — see
    * [[graft.pipeline.TextAnalysis.distributionPsi]] (r10). */
  def distributionPsi(textCol: String = "text",
      groupCol: String = "source",
      baseline: String = "baseline"): QueryNode =
    new QueryNode(graft.pipeline.TextAnalysis.distributionPsi(df,
      textCol, groupCol, baseline))

  /** Two-sample Kolmogorov–Smirnov — see [[graft.operators.Stats.ksTest]]. */
  def ksTest(groupCol: String, gA: String, gB: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.ksTest(df, groupCol, gA, gB, valCol))

  /** Mann–Whitney U — see [[graft.operators.Stats.mannWhitney]]. */
  def mannWhitney(groupCol: String, gA: String, gB: String,
      valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.mannWhitney(df, groupCol, gA, gB,
      valCol))

  /** Spearman rank correlation — see [[graft.operators.Stats.spearman]]. */
  def spearman(xCol: String, yCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.spearman(df, xCol, yCol))

  /** Kendall tau-b — see [[graft.operators.Stats.kendallTau]]. */
  def kendallTau(xCol: String, yCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.kendallTau(df, xCol, yCol))

  /** Mann-Kendall trend test per key — see
    * [[graft.operators.Stats.mannKendall]]. */
  def mannKendall(keyCol: String, tsCol: String, valCol: String,
      tieCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.mannKendall(df, keyCol, tsCol,
      valCol, tieCol))

  /** Theil–Sen robust slope per key — see
    * [[graft.operators.Stats.theilSen]]. */
  def theilSen(keyCol: String, tsCol: String, valCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.theilSen(df, keyCol, tsCol,
      valCol))

  /** Per-group OLS fit — see [[graft.operators.Stats.linearFit]]. */
  def linearFit(keyCol: String, xCol: String, yCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.linearFit(df, keyCol, xCol, yCol))

  /** One-pass correlation matrix — see
    * [[graft.operators.Stats.corrMatrix]]. */
  def corrMatrix(cols: String*): QueryNode =
    new QueryNode(graft.operators.Stats.corrMatrix(df, cols))

  /** Mutual information between two categorical columns — see
    * [[graft.operators.Stats.mutualInformation]]. */
  def mutualInformation(aCol: String, bCol: String): QueryNode =
    new QueryNode(graft.operators.Stats.mutualInformation(df, aCol, bCol))

  /** Quantile winsorization — see
    * [[graft.operators.Quality.winsorize]]. */
  def winsorize(keyCol: String, valCol: String, pLow: Double = 0.05,
      pHigh: Double = 0.95): QueryNode =
    new QueryNode(graft.operators.Quality
      .winsorize(df, keyCol, valCol, pLow, pHigh))

  /** Benford first-digit conformance — see
    * [[graft.operators.Stats.benford]]. */
  def benford(valCol: String, scale: Int = 2): QueryNode =
    new QueryNode(graft.operators.Stats.benford(df, valCol, scale))

  /** hdk.py:32 `rename` is expression-level (`.as`); this node-level
    * variant renames columns in bulk. */
  def rename(mapping: (String, String)*): QueryNode =
    new QueryNode(df.withColumnsRenamed(mapping.toMap))

  /** hdk.py:1588 `refragmented_view` — HDK's fragment size is Spark's
    * partition count: repartition and (optionally) register a view.
    * Sized from plan-stat bytes, not a `count()` scan (see
    * [[graft.sources.Importer.estimateParts]]). */
  def refragmentedView(fragmentSize: Long, name: Option[String] = None): QueryNode = {
    val re = df.repartition(
      graft.sources.Importer.estimateParts(df, fragmentSize))
    name.foreach { n =>
      graft.Tables.invalidate(re.sparkSession, n)
      re.createOrReplaceTempView(n)
    }
    new QueryNode(re)
  }

  /** hdk.py:1973 `schema`. */
  def schema: org.apache.spark.sql.types.StructType = df.schema

  /** hdk.py:1905 `size` — row count of this node's relation. HDK reads
    * it from fragment metadata; Spark has no free row count on an
    * arbitrary plan, so this runs the (column-pruned, count-only)
    * query — an explicit user action, like `df.count()`. */
  def size: Long = df.count()

  /** hdk.py:1924 `column_info` — metadata for one column by name. */
  def columnInfo(column: String): ColumnInfo = {
    val f = df.schema(column)
    ColumnInfo(f.name, f.dataType, f.nullable)
  }

  /** hdk.py:1992 `run` — in Spark the plan is lazy; run returns the
    * DataFrame whose actions execute it. A returned DataFrame can be
    * wrapped back into a QueryNode to keep building (the reference's
    * run-on-results pattern, test_pyhdk_api.py test_run_on_res). */
  def run(): DataFrame = df

  /** Result-accessor parity (test_pyhdk_api.py test_head/tail/shape/
    * row): driver-side peeks at a (small) result, like the reference's
    * ExecutionResult helpers. `head` stays lazy (a limited node);
    * `tail`/`row`/`shape` are actions by nature. */
  def head(n: Int = 5): QueryNode = new QueryNode(df.limit(n))

  def tail(n: Int = 5): Array[org.apache.spark.sql.Row] = df.tail(n)

  def row(i: Int): org.apache.spark.sql.Row = {
    val rows = df.limit(i + 1).collect()
    require(rows.length > i, s"row $i out of range (${rows.length} rows)")
    rows(i)
  }

  /** (rows, columns) — `shape` triggers a count like `size`. */
  def shape: (Long, Int) = (df.count(), df.columns.length)

  /** ResultSet→Arrow analogue (ResultSetArrowConversion): execute and
    * return ONE standard Arrow IPC stream of the result. */
  def toArrow: Array[Byte] =
    org.apache.spark.sql.GraftShim.toArrowIpcStream(df)

  /** Config.just_explain analogue (hdk.py:2089): the plan this node
    * would execute, without executing it. */
  def explainString(mode: String = "formatted"): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))
}

/** Parser for the reference's aggregate strings (hdk.py:1606 doc). */
private[builder] object AggParser {
  private val WithAlias = """(?i)(.+?)\s+as\s+(\w+)""".r
  private val Fn1 = """(\w+)\s*\(\s*([\w.]+)\s*\)""".r
  private val Fn2 = """(\w+)\s*\(\s*([\w.]+)\s*,\s*([\w.+-]+)\s*\)""".r
  private val Fn3 = """(\w+)\s*\(\s*([\w.]+)\s*,\s*([\w.+-]+)\s*,\s*(\w+)\s*\)""".r

  def parse(s: String): Column = s.trim match {
    case WithAlias(e, alias) => parse(e).as(alias)
    case "count" => count(lit(1)).as("count")
    case Fn1(fn, c) => named(fn.toLowerCase, c, fn1(fn.toLowerCase, c))
    case Fn2(fn, c, arg) => named(fn.toLowerCase, c, fn2(fn.toLowerCase, c, arg))
    case Fn3(fn, c, arg, mode) =>
      named(fn.toLowerCase, c, fn3(fn.toLowerCase, c, arg, mode.toLowerCase))
    case other => sys.error(s"unsupported aggregate: '$other'")
  }

  private def named(fn: String, c: String, col: Column): Column =
    col.as(s"${c.replace('.', '_')}_$fn")

  private def fn1(fn: String, c: String): Column = fn match {
    case "count" => count(col(c))
    case "count_distinct" => countDistinct(col(c))
    case "approx_count_distinct" => approx_count_distinct(col(c))
    case "sum" => sum(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
    case "avg" => avg(col(c))
    case "stddev" => stddev_samp(col(c))
    case "sample" | "single_value" => first(col(c))
    case other => sys.error(s"unsupported aggregate function: '$other'")
  }

  private def fn2(fn: String, c: String, arg: String): Column = fn match {
    case "quantile" => expr(s"percentile($c, $arg)")
    case "approx_quantile" => percentile_approx(col(c), lit(arg.toDouble), lit(1000))
    case "topk" | "top_k" => graft.functions.topk(col(c), arg.toInt)
    case "bottomk" | "bottom_k" => graft.functions.bottomk(col(c), arg.toInt)
    case "corr" => corr(col(c), col(arg))
    case other => sys.error(s"unsupported aggregate function: '$other'")
  }

  /** `quantile(col, p, interpolation)` — the reference's third argument
    * (hdk.py:226-253): all five kQuantile interpolation modes
    * (OpTypeEnums.h:117), computed with the same explicit index math as
    * q19c so builder results match the oracled engine path exactly.
    * Repeated collect_list occurrences dedup to ONE aggregate buffer in
    * Spark's planner (identical agg expressions are computed once). */
  private def fn3(fn: String, c: String, arg: String, mode: String): Column = fn match {
    case "quantile" =>
      val xs = s"sort_array(collect_list($c))"
      val idx = s"((size($xs) - 1) * $arg)"
      def at(i: String) = s"element_at($xs, cast($i as int) + 1)"
      mode match {
        case "lower" => expr(at(s"floor($idx)"))
        case "higher" => expr(at(s"ceil($idx)"))
        // floor(x+0.5) avoids round-half mode differences (q19c)
        case "nearest" => expr(at(s"floor($idx + 0.5)"))
        case "midpoint" =>
          expr(s"(${at(s"floor($idx)")} + ${at(s"ceil($idx)")}) / 2")
        case "linear" =>
          expr(s"""${at(s"floor($idx)")} + ($idx - floor($idx))
                   * (${at(s"ceil($idx)")} - ${at(s"floor($idx)")})""")
        case other => sys.error(s"unsupported interpolation: '$other'")
      }
    case other => sys.error(s"unsupported aggregate function: '$other'")
  }
}
