package graft.builder

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftConfig, TestSpark}

/** Mirrors the shape of the reference's QueryBuilderTest.cpp basics. */
class QueryBuilderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def hdk = new GraftBuilder(spark, TestSpark.sf)

  test("scan → filter → agg → sort → run") {
    val out = hdk.scan("lineitem")
      .filter(col("l_quantity") > 10)
      .agg(Seq("l_returnflag"), "count", "sum(l_quantity) as sum_qty",
        "avg(l_extendedprice)", "count_distinct(l_partkey)")
      .sort(("l_returnflag", "asc"))
      .run().collect()
    assert(out.length == 3)
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("l_returnflag", "count", "sum_qty", "l_extendedprice_avg", "l_partkey_count_distinct"))
  }

  test("join via builder matches DataFrame join") {
    val o = hdk.scan("orders")
    val joined = hdk.scan("customer")
      .joinOn(o, Seq("c_custkey"), Seq("o_custkey"), "inner")
      .agg(Seq("c_mktsegment"), "count")
      .sort(("c_mktsegment", "asc"))
      .run().collect()
    assert(joined.length == 5)
  }

  test("proj + limit + offset") {
    val rows = hdk.scan("orders")
      .proj("o_orderkey", "o_totalprice")
      .sort(("o_totalprice", "desc"), ("o_orderkey", "asc"))
      .limit(5, offset = 2)
      .run().collect()
    assert(rows.length == 5)
    assert(rows.head.schema.fieldNames.toSeq == Seq("o_orderkey", "o_totalprice"))
  }

  test("quantile / topk aggregate strings") {
    val r = hdk.scan("lineitem")
      .agg(Seq("l_returnflag"), "quantile(l_quantity, 0.5)", "topk(l_extendedprice, 3)")
      .sort(("l_returnflag", "asc"))
      .run().collect()
    assert(r.head.getSeq[Double](2).length == 3)
  }

  test("quantile(col, p, interpolation) — all five kQuantile modes (hdk.py:226)") {
    val t = graft.sources.Importer.importColumns(spark, "qint_t",
      "g" -> Seq(1, 1, 1, 1, 1), "x" -> Seq(10.0, 20.0, 30.0, 40.0, 50.0))
    val r = new QueryNode(t).agg(Seq("g"),
      "quantile(x, 0.37, lower) as lo",
      "quantile(x, 0.37, higher) as hi",
      "quantile(x, 0.37, nearest) as near",
      "quantile(x, 0.37, midpoint) as mid",
      "quantile(x, 0.37, linear) as lin").run().head()
    // idx = (5-1)*0.37 = 1.48 → lower xs[1]=20, higher xs[2]=30,
    // nearest floor(1.98)=1 → 20, midpoint 25, linear 20 + 0.48·10 = 24.8
    assert(r.getDouble(1) == 20.0)
    assert(r.getDouble(2) == 30.0)
    assert(r.getDouble(3) == 20.0)
    assert(r.getDouble(4) == 25.0)
    assert(math.abs(r.getDouble(5) - 24.8) < 1e-9)
    val e = intercept[RuntimeException] {
      new QueryNode(t).agg(Seq("g"), "quantile(x, 0.5, cubic)")
    }
    assert(e.getMessage.contains("unsupported interpolation"))
    graft.sources.Importer.dropTable(spark, "qint_t")
  }

  test("joinOn with an arbitrary Column condition (hdk.py:1747 cond=)") {
    val n = hdk.scan("nation")
    val r = hdk.scan("region")
    val cnt = n.joinOn(r,
        n.ref("n_regionkey") === r.ref("r_regionkey") &&
          n.ref("n_nationkey") > lit(10))
      .agg(Seq(), "count").run().head().getLong(0)
    assert(cnt == 14L) // nation keys 11..24, each matching exactly one region
  }

  test("unsupported aggregate raises a clear error") {
    val e = intercept[RuntimeException] {
      hdk.scan("lineitem").agg(Seq("l_returnflag"), "median(l_quantity)")
    }
    assert(e.getMessage.contains("unsupported aggregate"))
  }

  test("sql frontend") {
    val n = hdk.sql("SELECT count(*) AS n FROM region").head().getLong(0)
    assert(n == 5)
  }

  test("custom functions callable from SQL (GraftExtensions)") {
    graft.Tables.registerAll(spark, graft.TestSpark.sf)
    val r = spark.sql(
      """SELECT topk(l_quantity, 2) AS t, bottomk(l_quantity, 2) AS b,
         eqcount(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS ec,
         round(dotp(array(1.0D, 2.0D), array(3.0D, 4.0D)), 6) AS dp
         FROM lineitem""").head()
    assert(r.getSeq[Double](0).length == 2)
    assert(r.getSeq[Double](1).length == 2)
    assert(r.getInt(2) == 2)
    assert(r.getDouble(3) == 11.0)
  }

  test("rename and refragmented view") {
    val node = hdk.scan("nation")
      .rename("n_name" -> "nation_name")
      .refragmentedView(10, Some("nation_refrag"))
    assert(node.schema.fieldNames.contains("nation_name"))
    // partition count comes from the byte-stat estimator (no count()
    // scan) — assert it repartitioned into a sane band
    assert(node.df.rdd.getNumPartitions >= 1 &&
      node.df.rdd.getNumPartitions <= 32)
    assert(spark.sql("SELECT count(*) AS n FROM nation_refrag")
      .head().getLong(0) == 25)
  }

  test("window expressions via over/order_by builder (hdk.py:1456,1488)") {
    // mirrors the reference doc examples: count().over(a) and
    // percent_rank().order_by(a)
    val t = graft.sources.Importer.importColumns(spark, "win_t",
      "a" -> Seq(4, 2, 1, 3, 5), "g" -> Seq(1, 2, 1, 2, 1))
    val node = new QueryNode(t)
    val out = node.projExprs(
      "a" -> node.ref("a"),
      Wins.count.over(node.ref("g")).as("count"),
      Wins.percentRank.orderBy(node.ref("a")).as("prk"))
      .sort(("a", "asc"))
      .run().collect()
    // sorted by a: (1,g=1),(2,g=2),(3,g=2),(4,g=1),(5,g=1)
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 2L, 3L, 3L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    val sums = node.projExprs(
      "g" -> node.ref("g"),
      Wins.sum(node.ref("a")).over(node.ref("g")).as("gsum"))
      .sort(("g", "asc")).run().collect()
    assert(sums.map(r => (r.getInt(0), r.getLong(1))).distinct.toSeq ==
      Seq((1, 10L), (2, 5L)))
    graft.sources.Importer.dropTable(spark, "win_t")
  }

  test("builder importers: parquet/columns/arrow + dropTable + config knobs") {
    val b = new GraftBuilder(spark, TestSpark.sf,
      configKnobs = Seq("bigint_count" -> true))
    assert(b.configReport.exists(_.isInstanceOf[GraftConfig.Structural]))
    val pq = b.importParquet(s"${TestSpark.sf}/region.parquet", "b_region")
    assert(pq.tableName.contains("b_region") && pq.size == 5L)
    val mem = b.importColumns("b_mem", "k" -> Seq(1, 2), "v" -> Seq("x", "y"))
    assert(mem.size == 2L)
    val arrowed = b.importArrow(mem.toArrow, "b_arrow")
    assert(arrowed.size == 2L)
    assert(spark.sql("SELECT count(*) FROM b_arrow").head().getLong(0) == 2)
    Seq("b_region", "b_mem", "b_arrow").foreach(b.dropTable)
    assert(!spark.catalog.tableExists("b_arrow"))
  }

  test("createTable registers an empty schema'd table (hdk.py:2130)") {
    val node = hdk.createTable("created_t",
      Seq("id" -> "int", "val1" -> "int64", "val2" -> "text"))
    assert(node.tableName.contains("created_t"))
    assert(node.size == 0L)
    assert(node.schema.map(_.dataType.typeName) ==
      Seq("integer", "long", "string"))
    assert(spark.sql("SELECT count(*) FROM created_t").head().getLong(0) == 0)
    graft.sources.Importer.dropTable(spark, "created_t")
  }

  test("literal constructors: const/date/time/timestamp/type (hdk.py:2578-2771)") {
    val b = hdk
    val row = b.scan("region").limit(1)
      .projExprs(
        "c" -> b.const(7, Some("int64")),
        "d" -> b.date("1997-03-15"),
        "ts" -> b.timestamp("1997-03-15 12:30:45"),
        "t" -> b.time("12:30:45"))
      .run().head()
    assert(row.getLong(0) == 7L)
    assert(row.getDate(1).toString == "1997-03-15")
    assert(row.getTimestamp(2).toString.startsWith("1997-03-15 12:30:45"))
    assert(row.getInt(3) == 12 * 3600 + 30 * 60 + 45)
    assert(b.typeOf("text") == org.apache.spark.sql.types.StringType)
    assert(b.typeOf("fp64") == org.apache.spark.sql.types.DoubleType)
  }

  test("result accessors head/tail/shape/row and run-on-results") {
    val node = hdk.scan("nation").sort(("n_nationkey", "asc"))
    assert(node.shape == (25L, node.schema.length))
    assert(node.head(3).size == 3L)
    assert(node.row(0).getAs[Number]("n_nationkey").longValue == 0L)
    assert(node.tail(2).length == 2)
    // run-on-results: wrap a run() output and keep building
    val res = node.filter(col("n_regionkey") === 1).run()
    val n2 = new QueryNode(res).agg(Seq(), "count").run().head().getLong(0)
    assert(n2 == 5L)
  }

  test("analytics at the builder surface: funnel/retention/transitions" +
      " coincide with the operator path") {
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
    val bf = hdk.scan("events")
      .funnel(Seq("view", "click"), window = "2 days").run()
    val of = graft.operators.Funnel.funnel(ev, Seq("view", "click"), "2 days")
    assert(bf.exceptAll(of).isEmpty && of.exceptAll(bf).isEmpty)
    val br = hdk.scan("events").retention().run()
    val or = graft.operators.Funnel.retention(ev)
    assert(br.exceptAll(or).isEmpty && or.exceptAll(br).isEmpty)
    val bt = hdk.scan("events").transitions().run()
    val ot = graft.operators.Funnel.transitions(ev)
    assert(bt.exceptAll(ot).isEmpty && ot.exceptAll(bt).isEmpty)
    // and the chain keeps composing: funnel output into the agg
    // mini-language
    val levels = hdk.scan("events")
      .funnel(Seq("view", "click"), window = "2 days")
      .agg(Seq("level"), "count")
      .sort(("level", "asc")).run().collect()
    assert(levels.map(_.getInt(0)).toSeq == levels.map(_.getInt(0)).sorted.toSeq)
    assert(levels.map(_.getLong(1)).sum == bf.count())
  }

  test("explainString returns the plan without executing (hdk.py:2089)") {
    val s = hdk.scan("nation").filter(col("n_nationkey") > 5).explainString()
    assert(s.contains("Physical Plan"))
    assert(s.contains("PushedFilters"))
  }

  test("node metadata: size, columnInfo, tableName (hdk.py:1905,1924,1949)") {
    val node = hdk.scan("nation")
    assert(node.tableName.contains("nation"))
    assert(node.size == 25L)
    val ci = node.columnInfo("n_name")
    assert(ci.name == "n_name")
    assert(ci.dataType == org.apache.spark.sql.types.StringType)
    // derived nodes lose stored-table identity
    assert(node.filter(col("n_nationkey") > 5).tableName.isEmpty)
  }

  test("graph analytics at the builder surface coincide with the operator path") {
    // derive a small edge relation through the builder chain itself
    val edges = hdk.scan("orders")
      .joinOn(hdk.scan("lineitem"), Seq("o_orderkey"), Seq("l_orderkey"),
        "inner")
      .projExprs(
        ("src", col("o_custkey").cast("long") * 2),
        ("dst", col("l_suppkey").cast("long") * 2 + 1))
    val eDf = edges.run()
    val bp = edges.pageRank(iters = 2).run()
    val op = graft.operators.Graph.pageRank(eDf, iters = 2)
    assert(bp.exceptAll(op).isEmpty && op.exceptAll(bp).isEmpty)
    val bc = edges.components().run()
    val oc = graft.operators.Graph.connectedComponents(eDf)
    assert(bc.exceptAll(oc).isEmpty && oc.exceptAll(bc).isEmpty)
    val bt = edges.triangles().run()
    val ot = graft.operators.Graph.triangles(eDf)
    assert(bt.exceptAll(ot).isEmpty && ot.exceptAll(bt).isEmpty)
    val bk = edges.kCore(k = 2).run()
    val ok = graft.operators.Graph.kCore(eDf, k = 2)
    assert(bk.exceptAll(ok).isEmpty && ok.exceptAll(bk).isEmpty)
    val bb = edges.bfsHops(edges.projExprs(("node_id", min(col("src")))))
      .run()
    val ob = graft.operators.Graph.bfsHops(eDf,
      eDf.select(min(col("src")).as("node_id")))
    assert(bb.exceptAll(ob).isEmpty && ob.exceptAll(bb).isEmpty)
    val ba = edges.assortativity().run()
    val oa = graft.operators.Graph.assortativity(eDf)
    assert(ba.collect().toSeq == oa.collect().toSeq)
    val bh = edges.hits().run()
    val oh = graft.operators.Graph.hits(eDf)
    assert(bh.exceptAll(oh).isEmpty && oh.exceptAll(bh).isEmpty)
    val bl = edges.linkPredict(topN = 20).run()
    val ol = graft.operators.Graph.linkPredict(eDf, topN = 20)
    assert(bl.exceptAll(ol).isEmpty && ol.exceptAll(bl).isEmpty)
    // and composes onward: top-degree nodes through the mini-language
    val top = edges.triangles().sort(("deg", "desc"), ("node_id", "asc"))
      .limit(5).run().collect()
    assert(top.length == 5)
  }

  test("time-series analytics at the builder surface coincide with the operator path") {
    val ev = hdk.scan("events")
      .filter(col("user_id") % 7 === 0)
    val evDf = ev.run()
    val bo = ev.ohlc("user_id", "ts", "value", "event_id").run()
    val oo = graft.operators.TimeJoins
      .ohlcBars(evDf, "user_id", "ts", "value", "event_id")
    assert(bo.exceptAll(oo).isEmpty && oo.exceptAll(bo).isEmpty)
    val bw = ev.twap("user_id", "ts", "value", "event_id").run()
    val ow = graft.operators.TimeJoins
      .twap(evDf, "user_id", "ts", "value", "event_id")
    assert(bw.exceptAll(ow).isEmpty && ow.exceptAll(bw).isEmpty)
    val bz = ev.anomalyZScores("user_id", "ts", "value", "event_id").run()
    val oz = graft.operators.TimeJoins
      .rollingZScore(evDf, "user_id", "ts", "value", "event_id")
    assert(bz.exceptAll(oz).isEmpty && oz.exceptAll(bz).isEmpty)
    val bh = ev.holtSmooth("user_id", "ts", "value", "event_id").run()
    val oh = graft.operators.TimeJoins
      .holtSmooth(evDf, "user_id", "ts", "value", "event_id")
    assert(bh.exceptAll(oh).isEmpty && oh.exceptAll(bh).isEmpty)
    val series = ev.projExprs(
        ("user_id", col("user_id")),
        ("hr", expr("unix_micros(date_trunc('hour', ts)) div 3600000000")))
      .agg(Seq("user_id", "hr"), "count")
      .projExprs(
        ("user_id", col("user_id")), ("hr", col("hr")),
        ("value", col("count").cast("double")))
    val bs = series.seasonalDecompose("user_id", "hr", "value",
      period = 5).run()
    val os = graft.operators.TimeJoins
      .seasonalDecompose(series.run(), "user_id", "hr", "value",
        period = 5)
    assert(bs.exceptAll(os).isEmpty && os.exceptAll(bs).isEmpty)
    val bc = series.cusum("user_id", "hr", "value").run()
    val oc = graft.operators.TimeJoins
      .cusum(series.run(), "user_id", "hr", "value")
    assert(bc.exceptAll(oc).isEmpty && oc.exceptAll(bc).isEmpty)
    val bacf = series.acf("user_id", "hr", "value", maxLag = 3).run()
    val oacf = graft.operators.TimeJoins
      .acf(series.run(), "user_id", "hr", "value", maxLag = 3)
    assert(bacf.exceptAll(oacf).isEmpty && oacf.exceptAll(bacf).isEmpty)
    // and composes onward through the mini-language
    val top = ev.ohlc("user_id", "ts", "value", "event_id")
      .sort(("n_obs", "desc"), ("user_id", "asc"), ("bucket", "asc"))
      .limit(3).run().collect()
    assert(top.length == 3)
  }

  test("change-data family at the builder surface coincides with the operator path") {
    val prev = hdk.scan("orders")
      .proj("o_orderkey", "o_custkey", "o_totalprice")
    val next = prev.filter(col("o_orderkey") % 11 =!= 3)
      .projExprs(("o_orderkey", col("o_orderkey")),
        ("o_custkey", col("o_custkey")),
        ("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice"))))
    val bd = prev.snapshotDiff(next, Seq("o_orderkey")).run()
    val od = graft.operators.Merge
      .snapshotDiff(prev.run(), next.run(), Seq("o_orderkey"))
    assert(bd.exceptAll(od).isEmpty && od.exceptAll(bd).isEmpty)
    // diff∘upsert round-trips through the builder too
    val up = prev.upsert(prev.snapshotDiff(next, Seq("o_orderkey")),
      Seq("o_orderkey")).run()
    assert(up.exceptAll(next.run()).isEmpty &&
      next.run().exceptAll(up).isEmpty)
    val bh = hdk.scan("orders").filter(col("o_custkey") % 50 === 0)
      .historize(Seq("o_custkey"), "o_orderdate", Seq("o_orderkey")).run()
    val oh = graft.operators.Merge.historize(
      hdk.scan("orders").filter(col("o_custkey") % 50 === 0).run(),
      Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
    assert(bh.exceptAll(oh).isEmpty && oh.exceptAll(bh).isEmpty)
  }

  test("audit and hypothesis tests at the builder surface coincide with the operator path") {
    import graft.operators.Quality
    val rules = Seq(Quality.NotNull("o_custkey"),
      Quality.InRange("o_totalprice", 0.0, 1e6))
    val ba = hdk.scan("orders").audit(rules).run()
    val oa = Quality.audit(hdk.scan("orders").run(), rules)
    assert(ba.exceptAll(oa).isEmpty && oa.exceptAll(ba).isEmpty)
    val ev = hdk.scan("events")
    val bw = ev.welchTTest("event_type", "click", "purchase", "value").run()
    val ow = graft.operators.Stats
      .welchTTest(ev.run(), "event_type", "click", "purchase", "value")
    assert(bw.collect().toSeq == ow.collect().toSeq)
    val bk = ev.ksTest("event_type", "click", "purchase", "value").run()
    val ok = graft.operators.Stats
      .ksTest(ev.run(), "event_type", "click", "purchase", "value")
    assert(bk.collect().toSeq == ok.collect().toSeq)
    val bm = ev.mannWhitney("event_type", "click", "purchase", "value").run()
    val om = graft.operators.Stats
      .mannWhitney(ev.run(), "event_type", "click", "purchase", "value")
    assert(bm.collect().toSeq == om.collect().toSeq)
    val bs = hdk.scan("lineitem").spearman("l_quantity", "l_extendedprice")
      .run()
    val os = graft.operators.Stats
      .spearman(hdk.scan("lineitem").run(), "l_quantity", "l_extendedprice")
    assert(bs.collect().toSeq == os.collect().toSeq)
    val bt = hdk.scan("lineitem").kendallTau("l_quantity", "l_linenumber")
      .run()
    val ot = graft.operators.Stats
      .kendallTau(hdk.scan("lineitem").run(), "l_quantity", "l_linenumber")
    assert(bt.collect().toSeq == ot.collect().toSeq)
    val bkw = ev.kruskalWallis("event_type", "value").run()
    val okw = graft.operators.Stats
      .kruskalWallis(ev.run(), "event_type", "value")
    assert(bkw.collect().toSeq == okw.collect().toSeq)
    val bav = ev.anovaF("event_type", "value").run()
    val oav = graft.operators.Stats.anovaF(ev.run(), "event_type", "value")
    assert(bav.collect().toSeq == oav.collect().toSeq)
    val bbf = ev.brownForsythe("event_type", "value").run()
    val obf = graft.operators.Stats
      .brownForsythe(ev.run(), "event_type", "value")
    assert(bbf.collect().toSeq == obf.collect().toSeq)
    val bmn = ev.mcnemar("value", "user_id").run()
    val omn = graft.operators.Stats.mcnemar(ev.run(), "value", "user_id")
    assert(bmn.collect().toSeq == omn.collect().toSeq)
    val bpc = hdk.scan("lineitem")
      .partialCorr("l_quantity", "l_extendedprice", "l_tax").run()
    val opc = graft.operators.Stats.partialCorr(
      hdk.scan("lineitem").run(), "l_quantity", "l_extendedprice",
      "l_tax")
    assert(bpc.collect().toSeq == opc.collect().toSeq)
    val bmw = ev.mannWhitneyByKey("user_id", "event_type", "click",
      "view", "value").run()
    val omw = graft.operators.Stats.mannWhitneyByKey(ev.run(),
      "user_id", "event_type", "click", "view", "value")
    assert(bmw.collect().toSeq.sortBy(_.getLong(0)) ==
      omw.collect().toSeq.sortBy(_.getLong(0)))
    val bfk = ev.fleissKappa("user_id", "event_type", 3).run()
    val ofk = graft.operators.Stats.fleissKappa(ev.run(), "user_id",
      "event_type", 3)
    assert(bfk.collect().toSeq == ofk.collect().toSeq)
    val bcv = ev.cramersV("event_type", "props").run()
    val ocv = graft.operators.Stats.cramersV(ev.run(), "event_type",
      "props")
    assert(bcv.collect().toSeq == ocv.collect().toSeq)
    val bca = ev.cronbachAlpha("user_id", "event_type", "value").run()
    val oca = graft.operators.Stats.cronbachAlpha(ev.run(), "user_id",
      "event_type", "value")
    assert(bca.collect().toSeq == oca.collect().toSeq)
    val bcq = ev.cochranQ("user_id", "event_type", "value").run()
    val ocq = graft.operators.Stats.cochranQ(ev.run(), "user_id",
      "event_type", "value")
    assert(bcq.collect().toSeq == ocq.collect().toSeq)
    val bfr = ev.friedman("user_id", "event_type", "value").run()
    val ofr = graft.operators.Stats.friedman(ev.run(), "user_id",
      "event_type", "value")
    assert(bfr.collect().toSeq == ofr.collect().toSeq)
    val bgc = ev.giniConcentration("event_type", "value").run()
    val ogc = graft.operators.Stats.giniConcentration(ev.run(),
      "event_type", "value")
    assert(bgc.collect().toSeq.sortBy(_.getString(0)) ==
      ogc.collect().toSeq.sortBy(_.getString(0)))
    val bfd = ev.proj("event_id", "value")
      .bhFdr("event_id", "value", alpha = 0.5).run()
    val ofd = graft.operators.Stats.bhFdr(
      ev.proj("event_id", "value").run(), "event_id", "value", 0.5)
    assert(bfd.collect().toSeq.sortBy(_.getLong(0)) ==
      ofd.collect().toSeq.sortBy(_.getLong(0)))
    val bap = ev.averagePrecision("event_type", "event_id", "value",
      "user_id").run()
    val oap = graft.operators.Stats.averagePrecision(ev.run(),
      "event_type", "event_id", "value", "user_id")
    assert(bap.collect().toSeq.sortBy(_.getString(0)) ==
      oap.collect().toSeq.sortBy(_.getString(0)))
    val bcal = ev.calibration("event_type", "user_id", "value").run()
    val ocal = graft.operators.Stats.calibration(ev.run(), "event_type",
      "user_id", "value")
    assert(bcal.collect().toSeq.sortBy(_.getString(0)) ==
      ocal.collect().toSeq.sortBy(_.getString(0)))
    val brb = ev.reliabilityBins("event_type", "user_id", "value").run()
    val orb = graft.operators.Stats.reliabilityBins(ev.run(),
      "event_type", "user_id", "value")
    assert(brb.collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1))) ==
      orb.collect().toSeq.sortBy(r => (r.getString(0), r.getLong(1))))
    val bck = ev.cohensKappa("event_type", "props").run()
    val ock = graft.operators.Stats.cohensKappa(ev.run(), "event_type",
      "props")
    assert(bck.collect().toSeq == ock.collect().toSeq)
    val bwx = ev.wilcoxonSignedRank("value", "user_id").run()
    val owx = graft.operators.Stats.wilcoxonSignedRank(ev.run(),
      "value", "user_id")
    assert(bwx.collect().toSeq == owx.collect().toSeq)
    // keyed outputs are MULTI-ROW: two executions of the same groupBy
    // plan can return rows in different partition-completion order
    // under concurrent suites, so both sides must sort (the r10
    // test-hygiene rule — unsorted versions of these three asserts
    // were the QueryBuilderSpec full-suite flake).
    val bau = ev.rocAuc("event_type", "user_id", "value").run()
    val oau = graft.operators.Stats.rocAuc(ev.run(), "event_type",
      "user_id", "value")
    assert(bau.collect().toSeq.sortBy(_.toString) ==
      oau.collect().toSeq.sortBy(_.toString))
    val bre = ev.retrievalEval("event_type", "user_id", "value",
      "value", 5).run()
    val ore = graft.operators.Stats.retrievalEval(ev.run(), "event_type",
      "user_id", "value", "value", 5)
    assert(bre.collect().toSeq.sortBy(_.toString) ==
      ore.collect().toSeq.sortBy(_.toString))
    val docs = hdk.scan("documents")
    val bps = docs.distributionPsi("text", "source", "src0").run()
    val ops = graft.pipeline.TextAnalysis.distributionPsi(docs.run(),
      "text", "source", "src0")
    assert(bps.collect().toSeq.sortBy(_.toString) ==
      ops.collect().toSeq.sortBy(_.toString))
  }

  test("r9-continuation builder methods all coincide with their operators") {
    def same(b: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame): Unit =
      assert(b.exceptAll(o).isEmpty && o.exceptAll(b).isEmpty)
    val li = hdk.scan("lineitem").filter(col("l_orderkey") % 31 === 0)
    val liDf = li.run()
    same(li.linearFit("l_returnflag", "l_quantity", "l_extendedprice").run(),
      graft.operators.Stats.linearFit(liDf, "l_returnflag",
        "l_quantity", "l_extendedprice"))
    same(li.corrMatrix("l_quantity", "l_extendedprice", "l_discount").run(),
      graft.operators.Stats.corrMatrix(liDf,
        Seq("l_quantity", "l_extendedprice", "l_discount")))
    same(li.mutualInformation("l_returnflag", "l_linestatus").run(),
      graft.operators.Stats.mutualInformation(liDf, "l_returnflag",
        "l_linestatus"))
    same(li.winsorize("l_returnflag", "l_extendedprice").run(),
      graft.operators.Quality.winsorize(liDf, "l_returnflag",
        "l_extendedprice"))
    val series = hdk.scan("events").filter(col("user_id") % 11 === 0)
      .projExprs(("k", col("user_id")),
        ("t", expr("unix_micros(ts)")),
        ("x", col("value").cast("double")),
        ("y", expr("cast(pmod(event_id, 97) as double)")))
    val sDf = series.run().dropDuplicates("k", "t")
    val sNode = series.run().dropDuplicates("k", "t")
    same(new graft.builder.QueryNode(sNode)
        .ccf("k", "t", "x", "y", maxLag = 2).run(),
      graft.operators.TimeJoins.ccf(sDf, "k", "t", "x", "y", maxLag = 2))
    val docs = hdk.scan("documents")
      .projExprs(("id", col("doc_id")),
        ("s", expr("substring(lower(text), 1, 16)")))
    same(docs.editDistancePairs("id", "s", k = 1).run(),
      graft.operators.Linkage.editDistancePairs(docs.run(), "id", "s",
        k = 1))
    val edges = hdk.scan("orders")
      .filter(col("o_orderkey") % 13 === 0)
      .projExprs(("src", col("o_custkey")),
        ("dst", expr("o_custkey % 50 + 100000")),
        ("w", expr("o_orderkey % 5 + 1")))
    val eDf = edges.run()
    same(edges.weightedShortestPaths(
        edges.projExprs(("node_id", min(col("src"))))).run(),
      graft.operators.Graph.weightedShortestPaths(eDf,
        eDf.select(min(col("src")).as("node_id"))))
    val emb = hdk.scan("embeddings").filter(col("vec_id") < 300)
    same(emb.pcaTopComponent().run(),
      graft.pipeline.Similarity.pcaTopComponent(emb.run()))
  }

  test("nearDedupAuto at the builder surface coincides with the pipeline") {
    def same(b: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame): Unit =
      assert(b.exceptAll(o).isEmpty && o.exceptAll(b).isEmpty)
    val docs = hdk.scan("documents").filter(col("doc_id") % 3 === 0)
    same(docs.nearDedupAuto(threshold = 0.8).run(),
      graft.pipeline.Dedup.nearDedupAuto(docs.run(), threshold = 0.8))
    same(docs.nearDedupKeepBest("n_chars", threshold = 0.8).run(),
      graft.pipeline.Dedup.nearDedupKeepBest(docs.run(), "n_chars",
        threshold = 0.8))
  }
}
