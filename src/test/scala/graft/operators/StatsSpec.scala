package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("chiSquare: perfect independence scores 0") {
    // balanced 2x2: every expected equals its observed
    val t = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "a1" else "a2", if (i % 4 < 2) "b1" else "b2"))
      .toDF("a", "b")
    val out = Stats.chiSquare(t, "a", "b")
      .select("chi2", "dof").as[(Double, Long)].head()
    assert(out == ((0.0, 1L)))
  }

  test("chiSquare: diagonal dependence includes zero-observed cells") {
    // 5 (a1,b1) + 5 (a2,b2): the true chi2 is n = 10, HALF of which
    // comes from the two zero-observed off-diagonal cells — an
    // observed-cells-only implementation reports 5
    val t = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2")))
      .toDF("a", "b")
    val rows = Stats.chiSquare(t, "a", "b")
    assert(rows.count() == 4) // full grid, not 2 observed cells
    val out = rows.select("chi2", "dof").as[(Double, Long)].head()
    assert(out == ((10.0, 1L)))
    val zeroCells = rows.filter(col("observed") === 0).count()
    assert(zeroCells == 2)
  }

  test("chiSquare: NULL categories are out of scope, not margin ghosts") {
    // same balanced 2x2 as the independence case, plus NULL-category
    // rows in both columns — they must neither occupy cells nor
    // inflate margins/n_total/dof, so chi2 stays exactly 0
    val base = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "a1" else "a2", if (i % 4 < 2) "b1" else "b2"))
      .map { case (a, b) => (Option(a), Option(b)) }
    val noisy = base ++ Seq((None, Option("b1")), (Option("a1"), None),
      (None: Option[String], None: Option[String]))
    val rows = Stats.chiSquare(noisy.toDF("a", "b"), "a", "b")
    assert(rows.count() == 4) // 2x2 grid, no NULL rows/cols
    val out = rows.select("chi2", "dof").as[(Double, Long)].head()
    assert(out == ((0.0, 1L)))
    assert(rows.agg(org.apache.spark.sql.functions.sum("observed"))
      .as[Long].head() == 40L) // NULL rows not counted anywhere
  }

  test("ksTest: identical samples score D=0; disjoint samples score D=1") {
    val same = (1 to 30).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val s = Stats.ksTest(same, "g", "a", "b", "v")
      .select("d_stat", "reject_05").as[(Option[Double], Option[Boolean])]
      .head()
    assert(s == ((Some(0.0), Some(false))))
    val disjoint = ((1 to 30).map(i => ("a", i.toDouble)) ++
      (31 to 60).map(i => ("b", i.toDouble))).toDF("g", "v")
    val d = Stats.ksTest(disjoint, "g", "a", "b", "v")
      .select("d_stat", "c_stat", "reject_05")
      .as[(Option[Double], Option[Double], Option[Boolean])].head()
    assert(d._1.contains(1.0) && d._3.contains(true))
  }

  test("ksTest: empty group yields NULL statistics, not a verdict") {
    val t = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r = Stats.ksTest(t, "g", "a", "b", "v")
      .select("n_b", "d_stat", "reject_05")
      .as[(Long, Option[Double], Option[Boolean])].head()
    assert(r == ((0L, None, None)))
  }

  test("ksTest: exact D against a hand computation with ties") {
    // a: {1,1,2,3}, b: {2,3,3,4} → ECDF diffs at 1:(.5-0), 2:(.75-.25),
    // 3:(1-.75), 4:(1-1) → D = 0.5 at v=1 and v=2
    val t = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = Stats.ksTest(t, "g", "a", "b", "v")
      .select("d_stat").as[Option[Double]].head()
    assert(r.contains(0.5))
  }

  test("ksTest: two-phase bucket decomposition equals the 1-bucket path") {
    val t = graft.Tables.load(spark, graft.TestSpark.sf, "events")
    def run(b: Int) = Stats.ksTest(t, "event_type", "click", "purchase",
        "value", nBuckets = b)
      .select("n_a", "n_b", "d_stat", "c_stat")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(run(1024) == run(1)) // offsets + in-bucket sums == one window
  }

  test("mannWhitney: exact U and tie-corrected z against hand computation") {
    // a: {1,2,3}, b: {2,4,5}: pooled midranks 1→1, 2→2.5, 3→4, 4→5,
    // 5→6; ΣR_a = 1+2.5+4 = 7.5 → U_a = 7.5 − 6 = 1.5
    val t = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 5.0)).toDF("g", "v")
    val r = Stats.mannWhitney(t, "g", "a", "b", "v")
      .select("u_stat", "z_stat").as[(Option[Double], Option[Double])]
      .head()
    assert(r._1.contains(1.5))
    // z = (U − μ)/σ, μ = 4.5, σ² = (9/12)·(7 − 6/30) = 5.1
    val z = BigDecimal((1.5 - 4.5) / math.sqrt(0.75 * (7.0 - 6.0 / 30.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._2.contains(z))
  }

  test("mannWhitney: all-identical values yield NULL z (zero variance)") {
    val t = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val r = Stats.mannWhitney(t, "g", "a", "b", "v")
      .select("u_stat", "z_stat").as[(Option[Double], Option[Double])]
      .head()
    assert(r._1.contains(2.0)) // U = ΣR_a − 6 = (2.5+2.5) − 3 = 2
    assert(r._2.isEmpty)
  }

  test("spearman: monotone=1, reversed=-1, ties via midranks, constant NULL") {
    val mono = (1 to 20).map(i => (i.toDouble, (i * i).toDouble))
      .toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").select("rho")
      .as[Option[Double]].head().contains(1.0))
    val rev = (1 to 20).map(i => (i.toDouble, (21 - i).toDouble))
      .toDF("x", "y")
    assert(Stats.spearman(rev, "x", "y").select("rho")
      .as[Option[Double]].head().contains(-1.0))
    // hand case with ties: x = 1,2,2,3 ; y = 10,20,20,40 → rho = 1
    // (identical tie structure, same rank vectors)
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    assert(Stats.spearman(tied, "x", "y").select("rho")
      .as[Option[Double]].head().contains(1.0))
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").select("rho")
      .as[Option[Double]].head().isEmpty)
  }

  test("linearFit: exact line recovered, noise drops r2, degenerate NULLs") {
    // group a: y = 2x + 1 exactly; group b: constant x; group c:
    // constant y (slope 0, r2 NULL)
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0), ("a", 4.0, 9.0),
      ("b", 5.0, 1.0), ("b", 5.0, 2.0),
      ("c", 1.0, 4.0), ("c", 2.0, 4.0), ("c", 3.0, 4.0)
    ).toDF("k", "x", "y")
    val got = Stats.linearFit(df, "k", "x", "y")
      .select("k", "n", "slope", "intercept", "r2")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((4L, Some(2.0), Some(1.0), Some(1.0))))
    assert(got("b") == ((2L, None, None, None)), "constant x has no fit")
    assert(got("c") == ((3L, Some(0.0), Some(4.0), None)),
      "constant y: flat line fits, but r2 is undefined")
  }

  test("corrMatrix: perfect/anti/constant pairs in one pass, listwise deletion") {
    val df = Seq(
      (1.0, 2.0, -1.0, 7.0),
      (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0),
      (4.0, 8.0, -4.0, 7.0)
    ).toDF("a", "b", "c", "k")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c", "k"))
      .select("col_x", "col_y", "n", "corr")
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == ((4L, Some(1.0))))
    assert(got(("a", "c")) == ((4L, Some(-1.0))))
    assert(got(("b", "c")) == ((4L, Some(-1.0))))
    assert(got(("a", "k"))._2.isEmpty, "constant column has no corr")
    // a NULL anywhere drops the whole row (shared n across all pairs)
    val withNull = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(2.0), Some(4.0), None),
      (Some(3.0), Some(6.0), Some(3.0))
    ).toDF("a", "b", "c")
    val n2 = Stats.corrMatrix(withNull, Seq("a", "b", "c"))
      .select("n").as[Long].collect()
    assert(n2.forall(_ == 2L), s"listwise deletion: $n2")
    // plan: everything folds into ONE aggregate
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val plan = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan
    assert(plan.collect { case ag: Aggregate => ag }.size == 1,
      s"one-pass matrix must be one Aggregate:\n$plan")
  }

  test("mutualInformation: identity=ln2, independence=0, degenerate NULL") {
    // perfectly dependent 2-symbol pair: MI = H = ln 2, normalized 1
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val gd = Stats.mutualInformation(dep, "a", "b")
      .select("mi_nats", "normalized_mi")
      .as[(Double, Option[Double])].head()
    assert(gd._1 == 0.693147 && gd._2.contains(1.0), gd.toString)
    // balanced independent grid: every cell ratio is exactly 1 → MI 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val gi = Stats.mutualInformation(ind, "a", "b")
      .select("mi_nats", "normalized_mi")
      .as[(Double, Option[Double])].head()
    assert(gi._1 == 0.0 && gi._2.contains(0.0), gi.toString)
    // a constant column carries zero entropy → MI 0, normalized NULL
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val gc = Stats.mutualInformation(const, "a", "b")
      .select("mi_nats", "normalized_mi")
      .as[(Double, Option[Double])].head()
    assert(gc._1 == 0.0 && gc._2.isEmpty, gc.toString)
  }

  test("linearFit plan: one Aggregate, zero joins and windows (one shuffle)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0)).toDF("k", "x", "y")
    val plan = Stats.linearFit(df, "k", "x", "y")
      .queryExecution.optimizedPlan
    assert(plan.collect { case a: Aggregate => a }.size == 1,
      s"all five moments must fold into ONE aggregate:\n$plan")
    assert(plan.collect { case j: Join => j }.isEmpty,
      s"no join belongs in a single-pass fit:\n$plan")
    assert(!plan.toString.contains("Window"),
      s"no window belongs in a single-pass fit:\n$plan")
  }

  test("kendall: concordant=1, discordant=-1, hand tie case, constant NULL") {
    val mono = (1 to 10).map(i => (i.toDouble, (i * 3).toDouble))
      .toDF("x", "y")
    assert(Stats.kendallTau(mono, "x", "y").select("tau")
      .as[Option[Double]].head().contains(1.0))
    val rev = (1 to 10).map(i => (i.toDouble, (11 - i).toDouble))
      .toDF("x", "y")
    assert(Stats.kendallTau(rev, "x", "y").select("tau")
      .as[Option[Double]].head().contains(-1.0))
    // hand case: (1,1),(1,2),(2,3) → P=2, Q=0, n0=3·2=6 (doubled),
    // n1 = 2·1 = 2 (x tie), n2 = 0 → tau = 2·2/√(4·6) = 0.816497
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    assert(Stats.kendallTau(tied, "x", "y").select("tau")
      .as[Option[Double]].head().contains(0.816497))
    // a tie in BOTH axes: (1,1),(2,2),(2,2),(3,1) →
    // pairs: (1,1)-(2,2)×2 concordant, (1,1)-(3,1) tied y,
    // (2,2)-(2,2) tied both, (2,2)-(3,1)×2 discordant →
    // P=2, Q=2, n1m=2, n2m=2+2=4, n0m=12 → tau = 0
    val both = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 2.0), (3.0, 1.0))
      .toDF("x", "y")
    assert(Stats.kendallTau(both, "x", "y").select("tau")
      .as[Option[Double]].head().contains(0.0))
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Stats.kendallTau(const, "x", "y").select("tau")
      .as[Option[Double]].head().isEmpty)
    // NULL rows are out of scope, single row → NULL
    val one = Seq((Some(1.0), Some(1.0)), (None, Some(2.0)))
      .toDF("x", "y")
    assert(Stats.kendallTau(one, "x", "y").select("tau")
      .as[Option[Double]].head().isEmpty)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("ndcgAtK: perfect ranking is 1, misranking penalized, no-rel NULL") {
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = Seq(
      // q1: score order C,A,B but rel order A,B,C — misranked
      ("q1", 1L, 10.0, 3L), // A
      ("q1", 2L, 5.0, 2L),  // B
      ("q1", 3L, 20.0, 0L), // C
      // q2: score order == rel order — perfect
      ("q2", 4L, 9.0, 2L), ("q2", 5L, 1.0, 1L),
      // q3: nothing relevant
      ("q3", 6L, 4.0, 0L)
    ).toDF("q", "doc", "score", "rel")
    val got = Stats.ndcgAtK(t, "q", "doc", "score", "rel", k = 10)
      .select("q", "dcg", "idcg", "ndcg")
      .as[(String, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val lg = (x: Int) => math.log(x) / math.log(2)
    val dcg1 = r6(r12(0.0) + r12(7.0 / lg(3)) + r12(3.0 / lg(4)))
    val idcg1 = r6(r12(7.0 / lg(2)) + r12(3.0 / lg(3)) + r12(0.0))
    assert(got("q1") == ((dcg1, idcg1, Some(r6(dcg1 / idcg1)))))
    assert(got("q1")._3.get < 1.0)
    assert(got("q2")._3.contains(1.0))
    assert(got("q3") == ((0.0, 0.0, None)))
  }

  test("retrievalEval: precision/recall/rr hand cases with honest NULLs") {
    val t = Seq(
      // q1 score order: d1(50) d2(40) d3(30) d4(20) d5(10); relevant
      // at ranks 2 and 5 → at k=3: p=1/3, r=1/2, rr=1/2
      ("q1", 1L, 50.0, 0L), ("q1", 2L, 40.0, 1L), ("q1", 3L, 30.0, 0L),
      ("q1", 4L, 20.0, 0L), ("q1", 5L, 10.0, 1L),
      // q2: first relevant at rank 4 > k → rr 0.0, recall 0
      ("q2", 6L, 9.0, 0L), ("q2", 7L, 8.0, 0L), ("q2", 8L, 7.0, 0L),
      ("q2", 9L, 6.0, 2L),
      // q3: nothing relevant → recall/rr NULL, precision 0
      ("q3", 10L, 1.0, 0L)
    ).toDF("q", "doc", "score", "rel")
    val got = Stats.retrievalEval(t, "q", "doc", "score", "rel", k = 3)
      .select("q", "n_rel", "rel_at_k", "precision_k", "recall_k", "rr_k")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("q1") == ((2L, 1L, 0.333333, Some(0.5), Some(0.5))))
    assert(got("q2") == ((1L, 0L, 0.0, Some(0.0), Some(0.0))))
    assert(got("q3") == ((0L, 0L, 0.0, None, None)))
  }

  test("benford: integer digit extraction, all nine digits, scope") {
    // values whose first digits are 1,1,2,9 after 2dp scaling; zero
    // and negative-magnitude handling: 0 excluded, -3.5 counts as 3
    val t = Seq(1.23, 15000.0, 0.02, 9.99, -3.5, 0.0).toDF("v")
    val got = Stats.benford(t, "v")
      .select("digit", "observed", "n_total")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == (1 to 9).toSet) // full grid, zero digits too
    assert(got.values.forall(_._2 == 5L)) // 0.0 out of scope
    assert(got(1) == ((2L, 5L))) // 1.23 and 15000
    assert(got(2) == ((1L, 5L))) // 0.02 → 2
    assert(got(3) == ((1L, 5L))) // |-3.5| → 3
    assert(got(9) == ((1L, 5L)))
    assert(got(4)._1 == 0L)
    // exact powers of ten stay in their own decade (the log10 trap)
    val p = Stats.benford(Seq(10.0, 100.0, 1000.0).toDF("v"), "v")
      .select("digit", "observed").as[(Int, Long)].collect().toMap
    assert(p(1) == 3L)
  }

  test("welchTTest: hand-checked groups and degenerate guards") {
    val t = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 10.0), ("g2", 14.0)).toDF("g", "v")
    val r = Stats.welchTTest(t, "g", "g1", "g2", "v")
      .as[(Long, Long, Double, Double, Double, Double,
        Option[Double], Option[Double])].head()
    // means 2 and 12; vars 1 and 8; se² = 1/3 + 8/2 = 4.333333
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3 == 2.0 && r._4 == 12.0)
    assert(r._5 == 1.0 && r._6 == 8.0)
    assert(r._7.contains(BigDecimal(-10.0 / math.sqrt(1.0 / 3 + 4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // singleton group → NULL verdict, not a fabricated t
    val s = Stats.welchTTest(
        Seq(("g1", 1.0), ("g1", 2.0), ("g2", 5.0)).toDF("g", "v"),
        "g", "g1", "g2", "v")
      .select("t_stat").as[Option[Double]].head()
    assert(s.isEmpty)
    // zero variance in BOTH groups → NULL (division by zero guarded)
    val z = Stats.welchTTest(
        Seq(("g1", 4.0), ("g1", 4.0), ("g2", 9.0), ("g2", 9.0))
          .toDF("g", "v"),
        "g", "g1", "g2", "v")
      .select("t_stat").as[Option[Double]].head()
    assert(z.isEmpty)
  }

  test("mannKendall: hand-computed S, tie correction, trend labels") {
    def series(k: String, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong, i.toLong, v) }
    val df = (
      series("up", Seq(1, 2, 3, 4, 5, 6, 7, 8)) ++     // S=28, z>1.96
      series("down", Seq(5, 4, 3, 2, 1)) ++            // S=-10, z=-2.2045
      series("tied", Seq(1, 2, 2, 3)) ++               // S=5, ties t=2
      series("flat", Seq(3, 3, 3)) ++                  // var_num = 0
      series("one", Seq(42))                           // n < 2
    ).toDF("k", "t", "i", "v")
    val got = Stats.mannKendall(df, "k", "t", "v", "i")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          Option(r.getString(4))))).toMap
    // up: S = C(8,2) = 28, var = 8*7*21/18 = 65.333, z = 27/8.0829
    assert(got("up")._2 == 28L && got("up")._4.contains("increasing"))
    assert(got("up")._3.contains(3.340384))
    // down: S=-10, var = 5*4*15/18 = 16.667, z = -9/4.0825 = -2.204541
    assert(got("down") == ((5L, -10L, Some(-2.204541), Some("decreasing"))))
    // tied: S=5, var_num = 4*3*13 - 2*1*9 = 138, z = 4/sqrt(138/18)
    val zTied = 4.0 / math.sqrt(138.0 / 18.0)
    assert(got("tied") == ((4L, 5L,
      Some(BigDecimal(zTied).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble), Some("no_trend"))))
    // degenerate: all-equal values and single observations → NULL z
    assert(got("flat") == ((3L, 0L, None, None)))
    assert(got("one") == ((1L, 0L, None, None)))
  }

  test("theilSen: hand-computed medians, outlier immunity, ts-tie pairs") {
    import org.apache.spark.sql.functions.{expr => sexpr}
    val day = 86400000000L
    val rows = Seq(
      ("a", 0L, 0.0), ("a", day, 10.0), ("a", 2 * day, 14.0),
      ("a", 3 * day, 120.0),                 // outlier point
      ("b", 0L, 0.0), ("b", day, 1.0), ("b", 2 * day, 4.0),
      ("c", 5L, 1.0), ("c", 5L, 9.0)         // same-ts pair: excluded
    ).toDF("k", "us", "v")
      .select(col("k"), sexpr("timestamp_micros(us)").as("ts"), col("v"))
    val got = Stats.theilSen(rows, "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // a: slopes/day sorted [4,7,10,40,55,106] → (10+40)/2 = 25
    assert(got("a") == ((4L, 6L, Some(25.0))))
    // b: slopes [1,2,3] → 2 (an OLS fit of a would be outlier-dragged)
    assert(got("b") == ((3L, 3L, Some(2.0))))
    // c: the only pair shares a timestamp → no valid slope
    assert(got("c") == ((2L, 0L, None)))
  }

  test("mannKendall at the builder surface coincides with the operator") {
    val spark2 = spark
    val ev = new graft.builder.GraftBuilder(spark2, graft.TestSpark.sf)
      .scan("events").filter(col("user_id") % 9 === 0)
    val b = ev.mannKendall("user_id", "ts", "value", "event_id").run()
    val o = Stats.mannKendall(ev.run(), "user_id", "ts", "value",
      "event_id")
    assert(b.exceptAll(o).isEmpty && o.exceptAll(b).isEmpty)
    val bs = ev.theilSen("user_id", "ts", "value").run()
    val os = Stats.theilSen(ev.run(), "user_id", "ts", "value")
    assert(bs.exceptAll(os).isEmpty && os.exceptAll(bs).isEmpty)
  }

  test("mannKendall plan: no pair-enumeration join (every join pure-equi)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, LessThan, Or}
    val ev = graft.Tables.load(spark, graft.TestSpark.sf, "events")
      .filter(col("user_id") % 9 === 0)
    val (frame, cells) =
      Stats.mannKendallFrame(ev, "user_id", "ts", "value", "event_id")
    val joins = frame.queryExecution.optimizedPlan
      .collect { case j: Join => j }
    assert(joins.nonEmpty)
    // the r9 form enumerated ordered pairs through a key self-join whose
    // condition carried (ta < tb OR (ta = tb AND ia < ib)) — the r10
    // grid plan must have NO non-equi join anywhere
    joins.foreach { j =>
      j.condition.foreach { c =>
        val nonEqui = c.collect {
          case e: LessThan => e: Any
          case e: GreaterThan => e: Any
          case e: Or => e: Any
        }
        assert(nonEqui.isEmpty, s"non-equi join condition survived: $c")
      }
    }
    org.apache.spark.sql.GraftShim.releaseCheckpoint(cells)
  }

  /** Capture WARN+ log lines emitted by `loggerName` while `body` runs. */
  private def captureWarnings(loggerName: String)(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val app = new AbstractAppender("graft-capture-" + System.nanoTime(),
        null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.WARN))
          buf.synchronized { buf += e.getMessage.getFormattedMessage }
    }
    app.start()
    val logger = LogManager.getLogger(loggerName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prevLevel = logger.getLevel
    logger.addAppender(app)
    logger.setLevel(Level.WARN)
    try body
    finally {
      logger.removeAppender(app); logger.setLevel(prevLevel); app.stop()
    }
    buf.toSeq
  }

  test("theilSen: bounded-group probe warns past warnGroupSize") {
    val big = (0 until 64).map(i => ("hot", i.toLong * 86400000000L,
      i.toDouble)) :+ (("cold", 0L, 1.0))
    val df = big.toDF("k", "us", "v")
      .select(col("k"), org.apache.spark.sql.functions
        .expr("timestamp_micros(us)").as("ts"), col("v"))
    // 64-observation hot key vs warnGroupSize 32 → the probe must warn
    val warned = captureWarnings("graft.operators.Stats") {
      Stats.theilSen(df, "k", "ts", "v", warnGroupSize = 32).collect()
    }
    assert(warned.exists(_.contains("observations")),
      s"expected the bounded-group warning, got: $warned")
    // under the boundary: silent (the probe must not cry wolf)
    val quiet = captureWarnings("graft.operators.Stats") {
      Stats.theilSen(df, "k", "ts", "v", warnGroupSize = 100).collect()
    }
    assert(!quiet.exists(_.contains("observations")))
    // and the result is identical either way (the probe never reroutes)
    val a = Stats.theilSen(df, "k", "ts", "v", warnGroupSize = 32)
    val b = Stats.theilSen(df, "k", "ts", "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("theilSen sampled leg: bounded pairs, planted trend recovered, " +
      "exact coincidence under the cap, probe retired") {
    val day = 86400000000L
    // 200-point series with slope 3/day plus 12 wild outliers — the
    // shape Sen exists for; the sampled subseries median must land on
    // the planted slope (pairwise slopes between on-trend points are
    // exactly 3.0, and on-trend pairs dominate any subsample)
    val rows = (0 until 200).map { i =>
      val v = if (i % 17 == 0) 1000.0 + i else 3.0 * i
      ("hot", i.toLong * day, v)
    } :+ (("cold", 0L, 1.0)) :+ (("cold", day, 4.0))
    val df = rows.toDF("k", "us", "v")
      .select(col("k"), org.apache.spark.sql.functions
        .expr("timestamp_micros(us)").as("ts"), col("v"))
    // maxPairsPerKey 450 → m = 30 sampled observations, ≤ 435 pairs
    val sampled = Stats.theilSen(df, "k", "ts", "v",
        strategy = "sampled", maxPairsPerKey = 450)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val (nHot, pHot, sHot) = sampled("hot")
    assert(nHot == 30 && pHot <= 450,
      s"sampled sizes out of bound: n=$nHot pairs=$pHot")
    assert(sHot.exists(s => math.abs(s - 3.0) < 0.2),
      s"planted slope 3.0 not recovered: $sHot")
    // a key at or under the cap passes through whole → sampled ≡ exact
    assert(sampled("cold") == ((2L, 1L, Some(3.0))))
    // determinism: the hash-ranked subsample reproduces run-to-run
    val again = Stats.theilSen(df, "k", "ts", "v",
      strategy = "sampled", maxPairsPerKey = 450)
    assert(again.collect().toSeq.sortBy(_.getString(0)) ==
      Stats.theilSen(df, "k", "ts", "v", strategy = "sampled",
        maxPairsPerKey = 450).collect().toSeq.sortBy(_.getString(0)))
    // probe retired on the sampled path: a key far past warnGroupSize
    // stays silent
    val quiet = captureWarnings("graft.operators.Stats") {
      Stats.theilSen(df, "k", "ts", "v", warnGroupSize = 32,
        strategy = "sampled", maxPairsPerKey = 450).collect()
    }
    assert(!quiet.exists(_.contains("observations")),
      s"sampled path must not warn: $quiet")
    // unknown strategy rejected loudly
    val e = intercept[IllegalArgumentException] {
      Stats.theilSen(df, "k", "ts", "v", strategy = "approx")
    }
    assert(e.getMessage.contains("strategy"))
  }

  test("kruskalWallis: textbook no-tie three-group case") {
    // a={1,2,3} b={4,5,6} c={7,8,9}: ranks 1..9, R=6/15/24 →
    // H = 12/90·(12+75+192) − 30 = 7.2, no tie correction
    val t = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0),
      ("c", 7.0), ("c", 8.0), ("c", 9.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(t, "g", "v")
      .select("n_groups", "n_total", "h_stat", "dof")
      .as[(Long, Long, Double, Long)].head()
    assert(r == ((3L, 9L, 7.2, 2L)))
  }

  test("kruskalWallis: hand-computed tie-corrected case") {
    // a=[1,1,2] b=[2,3,3]: midranks 1.5/3.5/5.5 → R_a=6.5, R_b=14.5,
    // H_raw=3.047619, ties 3·(2³−2)=18 → corr=1−18/210 →
    // H = 3.047619/0.914286 = 3.333333
    val t = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 2.0), ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(t, "g", "v")
      .select("h_stat").as[Double].head()
    assert(r == 3.333333)
  }

  test("kruskalWallis: degenerate inputs are honest NULLs") {
    // all values identical → zero tie-corrected denominator
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Stats.kruskalWallis(const, "g", "v")
      .filter(col("h_stat").isNull).count() == 1)
    // a single group → k−1 = 0 dof, no test
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(one, "g", "v")
      .select("h_stat", "dof").as[(Option[Double], Long)].head()
    assert(r == ((None, 0L)))
    // NULL group/value rows are out of scope — H unchanged
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .map { case (g, v) => (Option(g), Option(v)) }
    val noisy = base ++ Seq((None, Option(9.0)), (Option("a"), None))
    val clean = Stats.kruskalWallis(base.toDF("g", "v"), "g", "v")
      .select("h_stat").as[Double].head()
    val dirty = Stats.kruskalWallis(noisy.toDF("g", "v"), "g", "v")
      .select("h_stat").as[Double].head()
    assert(clean == dirty)
  }

  test("kruskalWallis: bucketed prefix sums equal the 1-bucket path") {
    val t = (1 to 200).map(i => (s"g${i % 4}", (i * 37 % 23).toDouble))
      .toDF("g", "v")
    val a = Stats.kruskalWallis(t, "g", "v").collect().toSeq
    val b = Stats.kruskalWallis(t, "g", "v", nBuckets = 1).collect().toSeq
    assert(a == b)
  }

  test("anovaF: textbook three-group case") {
    // means 2/3/4, grand 3 → SSB=6; each group SSW=2 → SSW=6;
    // F = (6/2)/(6/6) = 3, eta² = 0.5
    val t = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 3.0), ("c", 4.0), ("c", 5.0)).toDF("g", "v")
    val r = Stats.anovaF(t, "g", "v")
      .select("n_groups", "n_total", "ss_between", "ss_within", "f_stat",
        "dof_between", "dof_within", "eta_sq")
      .as[(Long, Long, Double, Double, Double, Long, Long, Double)].head()
    assert(r == ((3L, 9L, 6.0, 6.0, 3.0, 2L, 6L, 0.5)))
  }

  test("brownForsythe: location shift scores zero, spread difference fires") {
    // same spread, shifted location: identical |v − median| patterns →
    // ss_between exactly 0 (the reason BF uses deviations, not values)
    val shifted = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 5.0), ("b", 101.0), ("b", 102.0), ("b", 103.0), ("b", 104.0),
      ("b", 105.0)).toDF("g", "v")
    val rs = Stats.brownForsythe(shifted, "g", "v")
      .select("ss_between", "f_stat").as[(Double, Double)].head()
    assert(rs == ((0.0, 0.0)))
    // wide group vs tight group: a real spread difference
    val spread = Seq(("a", 0.0), ("a", 5.0), ("a", 10.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val rw = Stats.brownForsythe(spread, "g", "v")
      .select("ss_between", "f_stat", "eta_sq")
      .as[(Double, Option[Double], Option[Double])].head()
    assert(rw._1 > 0 && rw._2.exists(_ > 0) && rw._3.exists(_ > 0.3),
      s"spread difference must register: $rw")
  }

  test("anovaF: degenerate inputs are honest NULLs") {
    // zero within-group variance → F NULL but eta² = 1 (all variance
    // is between groups)
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val rf = Stats.anovaF(flat, "g", "v")
      .select("f_stat", "eta_sq").as[(Option[Double], Double)].head()
    assert(rf == ((None, 1.0)))
    // a single group → no between-group question to ask
    val one = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    assert(Stats.anovaF(one, "g", "v")
      .filter(col("f_stat").isNull).count() == 1)
  }

  test("wilcoxonSignedRank: hand-computed tie case and empty input") {
    // d = {+1, -2, +3, +3, 0}: zero drops (n_zero=1), |d| ranks are
    // 1,2,3.5,3.5 → W+ = 1 + 3.5 + 3.5 = 8, ties Σ(t³−t)=6,
    // z = (8−5)/√(4·5·9/24 − 6/48) = 1.1047
    val df = Seq((2.0, 1.0), (1.0, 3.0), (5.0, 2.0), (4.0, 1.0),
      (7.0, 7.0)).toDF("x", "y")
    val r = Stats.wilcoxonSignedRank(df, "x", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Boolean])]
      .head()
    assert(r == ((4L, 1L, Some(8.0), Some(1.1047), Some(false))))
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val e = Stats.wilcoxonSignedRank(empty, "x", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Boolean])]
      .head()
    assert(e == ((0L, 0L, None, None, None)))
    // bucketing invisible: 1-bucket ≡ default on a spread of values
    val big = (1 to 150).map(i => (i * 1.0, (i % 13) * 2.0)).toDF("x", "y")
    assert(Stats.wilcoxonSignedRank(big, "x", "y").collect().toSeq ==
      Stats.wilcoxonSignedRank(big, "x", "y", nBuckets = 1)
        .collect().toSeq)
  }

  test("mcnemar: hand-computed discordance, no-disagreement NULL, NULL scope") {
    // 10 both-pass, 6 x-only (b), 2 y-only (c), 4 both-fail:
    // chi2 = (|6-2|-1)²/8 = 9/8 = 1.125, not rejected
    val rows = Seq.fill(10)((1, 1)) ++ Seq.fill(6)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(4)((0, 0))
    val r = Stats.mcnemar(rows.toDF("x", "y"),
      "x", "y").as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .head()
    assert(r == ((22L, 6L, 2L, Some(1.125), Some(false))))
    // heavy asymmetry rejects: b=20, c=1 → (19-1)²/21 = 15.428571
    val asym = Seq.fill(20)((1, 0)) ++ Seq.fill(1)((0, 1))
    val a = Stats.mcnemar(asym.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].head()
    assert(a == ((21L, 20L, 1L, Some(15.428571), Some(true))))
    // perfect agreement: b+c=0 → chi2 honestly NULL
    val agree = Seq.fill(5)((1, 1)) ++ Seq.fill(5)((0, 0))
    val g = Stats.mcnemar(agree.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].head()
    assert(g == ((10L, 0L, 0L, None, None)))
    // a NULL on either side drops the pair entirely
    val withNull = Seq((Some(1), Some(1)), (None, Some(1)),
      (Some(0), None)).toDF("x", "y")
    assert(Stats.mcnemar(withNull, "x", "y")
      .select("n_pairs").as[Long].head() == 1L)
  }

  test("cohensKappa: textbook 2x2, chance-level, constant raters") {
    // classic Cohen example: 20 (y,y), 5 (y,n), 10 (n,y), 15 (n,n)
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Stats.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(r == ((50L, 35L, Some(0.7), Some(0.5), Some(0.4))))
    // independence at the marginal rates → kappa exactly 0
    val chance = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "y" else "n", if (i % 4 < 2) "y" else "n"))
    val c = Stats.cohensKappa(chance.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(c == ((40L, 20L, Some(0.5), Some(0.5), Some(0.0))))
    // both raters constant on the same label: pe = 1 → kappa NULL
    val const = Seq.fill(8)(("y", "y"))
    val k = Stats.cohensKappa(const.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(k == ((8L, 8L, Some(1.0), Some(1.0), None)))
    // disjoint label sets: pe = 0, po = 0 → kappa 0/…= 0
    val disj = Seq.fill(4)(("y", "x"))
    val d = Stats.cohensKappa(disj.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(d == ((4L, 0L, Some(0.0), Some(0.0), Some(0.0))))
  }

  test("averagePrecision: hand case, perfect ranking, no-rel NULL, tie order") {
    // q1 ranked by score desc: rel at positions 1,3,5 →
    // AP = (1 + 2/3 + 3/5)/3 = 0.755556 at the 12dp-term/6dp ladder
    val q1 = Seq(("q1", 1L, 5.0, 1), ("q1", 2L, 4.0, 0),
      ("q1", 3L, 3.0, 1), ("q1", 4L, 2.0, 0), ("q1", 5L, 1.0, 1))
    // q2: both relevant docs on top → AP = 1; q3: nothing relevant
    val rows = (q1 ++ Seq(("q2", 1L, 9.0, 1), ("q2", 2L, 8.0, 1),
      ("q2", 3L, 7.0, 0), ("q3", 1L, 5.0, 0)))
      .toDF("q", "doc", "score", "rel")
    val got = Stats.averagePrecision(rows, "q", "doc", "score", "rel")
      .select("q", "n_docs", "n_rel", "ap")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("q1") == ((5L, 3L, Some(0.755556))))
    assert(got("q2") == ((3L, 2L, Some(1.0))))
    assert(got("q3") == ((1L, 0L, None)))
    // score ties break on doc ASC: doc 1 rel, doc 2 not, same score →
    // rel sits at position 1 → AP = 1; flipping ids puts it at 2 → 0.5
    val tie = Seq(("t", 1L, 5.0, 1), ("t", 2L, 5.0, 0))
      .toDF("q", "doc", "score", "rel")
    assert(Stats.averagePrecision(tie, "q", "doc", "score", "rel")
      .select("ap").as[Option[Double]].head().contains(1.0))
    val tie2 = Seq(("t", 2L, 5.0, 1), ("t", 1L, 5.0, 0))
      .toDF("q", "doc", "score", "rel")
    assert(Stats.averagePrecision(tie2, "q", "doc", "score", "rel")
      .select("ap").as[Option[Double]].head().contains(0.5))
  }

  test("reliabilityBins + calibration: hand case with edge clamping") {
    // nBins=2 over [0,1]: bin1 = {0.2(n),0.4(p)} mean .3 frac .5 gap .2
    // bin2 = {0.6(p),0.8(p),1.0(n)} mean .8 frac .666667 gap .133333
    val rows = Seq(("k", 0.2, 0), ("k", 0.4, 1), ("k", 0.8, 1),
      ("k", 0.6, 1), ("k", 1.0, 0)).toDF("k", "s", "y")
    val bins = Stats.reliabilityBins(rows, "k", "y", "s", nBins = 2)
      .select("bin", "n", "n_pos", "mean_score", "frac_pos", "gap")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(bins(1L) == ((2L, 1L, 0.3, 0.5, 0.2)))
    assert(bins(2L) == ((3L, 2L, 0.8, 0.666667, 0.133333)))
    // brier = (0.04+0.36+0.04+0.16+1.0)/5 = 0.32
    // ece = (2·0.2 + 3·0.133333)/5 = 0.16
    val cal = Stats.calibration(rows, "k", "y", "s", nBins = 2)
      .select("n", "n_pos", "brier", "ece")
      .as[(Long, Long, Double, Double)].head()
    assert(cal == ((5L, 3L, 0.32, 0.16)))
    // out-of-range scores clamp into edge bins, never drop
    val oor = Seq(("k", -0.1, 0), ("k", 1.03, 1)).toDF("k", "s", "y")
    val ob = Stats.reliabilityBins(oor, "k", "y", "s", nBins = 2)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    assert(ob == Map(1L -> 1L, 2L -> 1L))
  }

  test("friedman: textbook 6.5, tie correction 2.0, drops, degenerates") {
    // 4 complete blocks, 3 treatments, C always ranks 3:
    // R = (5,7,12) → chi2 = 12/(4·3·4)·218 − 48 = 6.5
    val base = Seq(
      (1, "A", 10.0), (1, "B", 20.0), (1, "C", 30.0),
      (2, "A", 1.0), (2, "B", 2.0), (2, "C", 3.0),
      (3, "A", 5.0), (3, "B", 4.0), (3, "C", 6.0),
      (4, "A", 7.0), (4, "B", 8.0), (4, "C", 9.0))
    val r = Stats.friedman(base.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(r == ((4L, 0L, 3L, Some(6.5), Some(2L))))
    // one tied block: ranks (1.5, 1.5, 3) → uncorr 1.5, c = 1 − 6/24,
    // chi2 = 2.0 (the scipy-documented correction)
    val tied = Seq((1, "A", 1.0), (1, "B", 1.0), (1, "C", 2.0))
    val t = Stats.friedman(tied.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(t == ((1L, 0L, 3L, Some(2.0), Some(2L))))
    // incomplete and duplicated blocks drop; the complete ones score
    val mixed = base ++ Seq((5, "A", 1.0), (5, "B", 2.0)) ++
      Seq((6, "A", 1.0), (6, "A", 2.0), (6, "B", 3.0), (6, "C", 4.0))
    val m = Stats.friedman(mixed.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(m == ((4L, 2L, 3L, Some(6.5), Some(2L))))
    // all-tied blocks: correction hits 0 → honest NULL
    val flat = Seq((1, "A", 5.0), (1, "B", 5.0), (1, "C", 5.0))
    val f = Stats.friedman(flat.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(f._4.isEmpty)
    // single treatment: k < 2 → NULL chi2, dof 0
    val k1 = Seq((1, "A", 1.0), (2, "A", 2.0))
    val o = Stats.friedman(k1.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(o == ((2L, 0L, 1L, None, Some(0L))))
  }

  test("mannWhitneyByKey: per-key hand case, degenerate keys, global equivalence") {
    // key s replays the global hand case (U=1.5); key t all-identical
    // values (zero variance → NULL z); key o has only group a
    val rows = Seq(("s", "a", 1.0), ("s", "a", 2.0), ("s", "a", 3.0),
      ("s", "b", 2.0), ("s", "b", 4.0), ("s", "b", 5.0),
      ("t", "a", 5.0), ("t", "a", 5.0), ("t", "b", 5.0), ("t", "b", 5.0),
      ("o", "a", 1.0), ("o", "a", 2.0)).toDF("k", "g", "v")
    val got = Stats.mannWhitneyByKey(rows, "k", "g", "a", "b", "v")
      .select("k", "n_a", "n_b", "u_stat", "z_stat")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("s")._3.contains(1.5))
    val z = BigDecimal((1.5 - 4.5) / math.sqrt(0.75 * (7.0 - 6.0 / 30.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("s")._4.contains(z))
    assert(got("t") == ((2L, 2L, Some(2.0), None)))
    assert(got("o") == ((2L, 0L, None, None)))
    // a single-key frame reproduces the GLOBAL operator bit-for-bit
    val ev = graft.Tables.load(spark, graft.TestSpark.sf, "events")
    val keyed = Stats.mannWhitneyByKey(
        ev.withColumn("one", org.apache.spark.sql.functions.lit(1)),
        "one", "event_type", "click",
        "purchase", "value")
      .select("n_a", "n_b", "u_stat", "z_stat", "reject_05")
      .collect().toSeq
    val global = Stats.mannWhitney(ev, "event_type", "click",
        "purchase", "value")
      .select("n_a", "n_b", "u_stat", "z_stat", "reject_05")
      .collect().toSeq
    assert(keyed == global)
  }

  test("fleissKappa: hand 1/3, unanimity 1, single-category NULL, drops") {
    // 4 items × 3 raters over {a,b}: A=28, B=72 → P̄=2/3, P̄e=1/2,
    // κ = (2/3 − 1/2)/(1/2) = 0.333333
    val hand = Seq((1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "a"),
      (2, "b"), (3, "b"), (3, "b"), (3, "b"), (4, "a"), (4, "b"),
      (4, "b"))
    val h = Stats.fleissKappa(hand.toDF("i", "c"), "i", "c", 3)
      .select("n_items", "n_dropped", "n_categories", "p_bar", "p_e",
        "kappa")
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head()
    assert(h == ((4L, 0L, 2L, Some(0.666667), Some(0.5),
      Some(0.333333))))
    // unanimous items over two categories: perfect agreement
    val unam = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
    assert(Stats.fleissKappa(unam.toDF("i", "c"), "i", "c", 2)
      .select("kappa").as[Option[Double]].head().contains(1.0))
    // every rating one category: p_e = 1 → honest NULL
    val mono = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"))
    assert(Stats.fleissKappa(mono.toDF("i", "c"), "i", "c", 2)
      .select("kappa").as[Option[Double]].head().isEmpty)
    // wrong panel size drops, the rest still scores
    val mixed = hand ++ Seq((5, "a"), (5, "b"))
    val m = Stats.fleissKappa(mixed.toDF("i", "c"), "i", "c", 3)
      .select("n_items", "n_dropped", "kappa")
      .as[(Long, Long, Option[Double])].head()
    assert(m == ((4L, 1L, Some(0.333333))))
  }

  test("partialCorr: hand 0.464986, identity-control 1, saturated-control NULL") {
    // x/y both ride a shared trend z plus own structure — the partial
    // strips z's share: r_xy=.940256, r_xz=.956183, r_yz=.931589 →
    // r_xy·z = 0.464986 on the agreed 6dp operands
    val hand = Seq((1.0, 2.0, 1.0), (2.0, 1.0, 1.0), (3.0, 3.0, 2.0),
      (4.0, 4.0, 2.0), (5.0, 5.0, 3.0), (6.0, 7.0, 3.0))
      .toDF("x", "y", "z")
    val h = Stats.partialCorr(hand, "x", "y", "z")
      .select("n", "r_xy", "r_partial")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(h == ((6L, Some(0.940256), Some(0.464986))))
    // y = x with a weak control: numerator and denominator coincide →
    // partial exactly 1 regardless of the control's strength
    val ident = Seq((1.0, 1.0, 1.0), (2.0, 2.0, 1.0), (3.0, 3.0, 2.0),
      (4.0, 4.0, 2.0)).toDF("x", "y", "z")
    assert(Stats.partialCorr(ident, "x", "y", "z")
      .select("r_partial").as[Option[Double]].head().contains(1.0))
    // z IS x: the control saturates (r_xz = 1) → 0/0, honest NULL
    val sat = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 2.0), (3.0, 5.0, 3.0),
      (4.0, 9.0, 4.0)).toDF("x", "y", "z")
    assert(Stats.partialCorr(sat, "x", "y", "z")
      .select("r_partial").as[Option[Double]].head().isEmpty)
  }

  test("cramersV: perfect association 1, independence 0, degenerate NULL") {
    val perfect = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2")))
      .toDF("a", "b")
    val p = Stats.cramersV(perfect, "a", "b")
      .select("n_total", "chi2", "cramers_v")
      .as[(Long, Double, Option[Double])].head()
    assert(p == ((10L, 10.0, Some(1.0))))
    val indep = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "a1" else "a2", if (i % 4 < 2) "b1" else "b2"))
      .toDF("a", "b")
    assert(Stats.cramersV(indep, "a", "b").select("cramers_v")
      .as[Option[Double]].head().contains(0.0))
    // single-category side: min(r,c)−1 = 0 → V undefined, not ∞
    val degen = Seq(("a1", "b1"), ("a2", "b1")).toDF("a", "b")
    assert(Stats.cramersV(degen, "a", "b").select("cramers_v")
      .as[Option[Double]].head().isEmpty)
  }

  test("cronbachAlpha: duplicate items 1, hand 0.888889, guards") {
    // two identical items: Σvar = 2v, var_total = 4v → α = 1
    val dup = (1 to 4).flatMap(i =>
      Seq((i, "A", i.toDouble), (i, "B", i.toDouble)))
    val d = Stats.cronbachAlpha(dup.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(d == ((4L, 0L, 2L, Some(1.0))))
    // hand case: A = 1,2,3,4; B = 1,3,2,4 → Σvar = 10/3, var_t = 6,
    // α = 2·(1 − 5/9) = 0.888889
    val hand = Seq((1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0),
      (4, "A", 4.0), (1, "B", 1.0), (2, "B", 3.0), (3, "B", 2.0),
      (4, "B", 4.0))
    val h = Stats.cronbachAlpha(hand.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(h == ((4L, 0L, 2L, Some(0.888889))))
    // anti-correlated items: totals constant → zero total variance NULL
    val anti = (1 to 4).flatMap(i =>
      Seq((i, "A", i.toDouble), (i, "B", 5.0 - i)))
    assert(Stats.cronbachAlpha(anti.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double])].head()._4.isEmpty)
    // incomplete blocks drop; single item k<2 → NULL
    val mixed = hand ++ Seq((5, "A", 9.0))
    val m = Stats.cronbachAlpha(mixed.toDF("b", "g", "v"), "b", "g", "v")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(m == ((4L, 1L, 2L, Some(0.888889))))
  }

  test("cochranQ: textbook 4.666667, drops, no-variation NULL") {
    // blocks × treatments (A,B,C): C=(3,4,1), R=(2,2,1,3), N=8
    // Q = 2·(3·26 − 64)/(24 − 18) = 28/6 = 4.666667
    val base = Seq(
      (1, "A", 1), (1, "B", 1), (1, "C", 0),
      (2, "A", 1), (2, "B", 1), (2, "C", 0),
      (3, "A", 0), (3, "B", 1), (3, "C", 0),
      (4, "A", 1), (4, "B", 1), (4, "C", 1))
    val r = Stats.cochranQ(base.toDF("b", "g", "x"), "b", "g", "x")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(r == ((4L, 0L, 3L, Some(4.666667), Some(2L))))
    // incomplete + duplicated blocks drop, the rest still scores
    val mixed = base ++ Seq((5, "A", 1)) ++
      Seq((6, "A", 1), (6, "A", 0), (6, "B", 1), (6, "C", 0))
    val m = Stats.cochranQ(mixed.toDF("b", "g", "x"), "b", "g", "x")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(m == ((4L, 2L, 3L, Some(4.666667), Some(2L))))
    // every block uniform (all-pass or all-fail): denominator 0 → NULL
    val flat = Seq((1, "A", 1), (1, "B", 1), (2, "A", 0), (2, "B", 0))
    val f = Stats.cochranQ(flat.toDF("b", "g", "x"), "b", "g", "x")
      .as[(Long, Long, Long, Option[Double], Option[Long])].head()
    assert(f == ((2L, 0L, 2L, None, Some(1L))))
  }

  test("giniConcentration: even=0, maximal=(n-1)/n, hand 0.25, guards") {
    val df = (Seq.fill(4)(("e", 5.0)) ++
      Seq(("m", 0.0), ("m", 0.0), ("m", 0.0), ("m", 10.0)) ++
      Seq(("h", 1.0), ("h", 2.0), ("h", 3.0), ("h", 4.0)) ++
      Seq(("neg", -1.0), ("neg", 5.0)) ++
      Seq(("z", 0.0), ("z", 0.0))).toDF("k", "v")
    val got = Stats.giniConcentration(df, "k", "v")
      .select("k", "n", "total", "gini")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("e") == ((4L, 20.0, Some(0.0))))
    assert(got("m") == ((4L, 10.0, Some(0.75)))) // (n-1)/n, one holder
    assert(got("h") == ((4L, 10.0, Some(0.25)))) // 2·30/(4·10) − 5/4
    assert(got("neg")._3.isEmpty, "negative values leave gini undefined")
    assert(got("z")._3.isEmpty, "zero total leaves gini undefined")
    // bucketing invisible
    val big = (1 to 300).map(i => ("k", (i % 37) * 1.5)).toDF("k", "v")
    assert(Stats.giniConcentration(big, "k", "v").collect().toSeq ==
      Stats.giniConcentration(big, "k", "v", nBuckets = 1)
        .collect().toSeq)
  }

  test("twoSidedNormalP: A&S ladder against hand-replayed values") {
    // values replay the exact ladder: exp rounded 12dp FIRST, fixed
    // Horner form, 6dp result — z=1.96 lands on the textbook 0.05
    val zs = Seq(("a", Some(0.0)), ("b", Some(1.0)), ("c", Some(1.96)),
      ("d", Some(-1.96)), ("e", Some(2.5)), ("f", Some(3.0)),
      ("g", None)).toDF("id", "z")
    val got = zs.select(col("id"),
      Stats.twoSidedNormalP(col("z")).as("p"))
      .as[(String, Option[Double])].collect().toMap
    assert(got("a").contains(1.0) && got("b").contains(0.317311))
    assert(got("c").contains(0.049996) && got("d").contains(0.049996))
    assert(got("e").contains(0.012419) && got("f").contains(0.0027))
    assert(got("g").isEmpty)
  }

  test("bhFdr: step-up adjustment, monotonization, cap, NULL exclusion") {
    // m=5, raws 5p/i = .05,.05,.05,.05,.2 → first four adjust to .05
    val ps = Seq(("h1", 0.01), ("h2", 0.02), ("h3", 0.03),
      ("h4", 0.04), ("h5", 0.2)).toDF("id", "p")
    val got = Stats.bhFdr(ps, "id", "p")
      .select("id", "rank", "adj_p", "reject")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("h1") == ((1L, 0.05, true)))
    assert(got("h4") == ((4L, 0.05, true)))
    assert(got("h5") == ((5L, 0.2, false)))
    // monotonization: rank-1's raw 1.0 inherits rank-2's smaller 0.9;
    // the NULL hypothesis neither ranks nor inflates m
    val ps2 = Seq(("x", Some(0.9)), ("y", None), ("z", Some(0.5)))
      .toDF("id", "p")
    val g2 = Stats.bhFdr(ps2, "id", "p")
      .select("id", "rank", "adj_p")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(g2 == Map("z" -> ((1L, 0.9)), "x" -> ((2L, 0.9))))
    // the top raw m·p_m/m = p_m bounds every running min ≤ 1 (the cap
    // is belt-and-braces): raws 2.7/1.425/0.99 all monotonize to 0.99
    val big = Seq(("a", 0.9), ("b", 0.95), ("c", 0.99)).toDF("id", "p")
    assert(Stats.bhFdr(big, "id", "p").select("adj_p")
      .as[Double].collect().forall(_ == 0.99))
  }

  test("rocAuc: perfect, reversed, and tie-aware hand case") {
    // key p: pos {3,4} all above neg {1,2} → AUC 1, gini 1
    // key r: pos {1,2} all below neg {3,4} → AUC 0, gini -1
    // key t: pos {1,2,3}, neg {1,2} → concordance 4 of 6 → 2/3
    val df = Seq(
      ("p", 1, 3.0), ("p", 1, 4.0), ("p", 0, 1.0), ("p", 0, 2.0),
      ("r", 1, 1.0), ("r", 1, 2.0), ("r", 0, 3.0), ("r", 0, 4.0),
      ("t", 1, 1.0), ("t", 1, 2.0), ("t", 1, 3.0),
      ("t", 0, 1.0), ("t", 0, 2.0)).toDF("k", "lab", "s")
    val got = Stats.rocAuc(df, "k", "lab", "s")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("p") == ((2L, 2L, Some(1.0), Some(1.0))))
    assert(got("r") == ((2L, 2L, Some(0.0), Some(-1.0))))
    assert(got("t") == ((3L, 2L, Some(0.666667), Some(0.333333))))
  }

  test("rocAuc: one-class keys are honest NULLs; bucketing is invisible") {
    val onecls = Seq(("a", 1, 1.0), ("a", 1, 2.0)).toDF("k", "lab", "s")
    val r = Stats.rocAuc(onecls, "k", "lab", "s")
      .select("auc", "gini").as[(Option[Double], Option[Double])].head()
    assert(r == ((None, None)))
    // 1-bucket path ≡ default bucketing on a spread of distinct scores
    val big = (1 to 200).map(i => ("g", i % 3, i * 0.5 + (i % 7)))
      .toDF("k", "lab", "s")
    val a = Stats.rocAuc(big, "k", "lab", "s").collect().toSeq
    val b = Stats.rocAuc(big, "k", "lab", "s", nBuckets = 1)
      .collect().toSeq
    assert(a == b)
  }

  test("grain: grain<=0 is bitwise today's behavior across the histogram family") {
    import org.apache.spark.sql.{functions => F}
    val df = (1 to 400).map { i =>
      ("k" + (i % 3), if (i % 2 == 0) "A" else "B", i % 5,
        math.sin(i.toDouble) * 10 + i * 0.01)
    }.toDF("k", "g", "lab", "v")
    def sorted(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(_.toString).sorted.toSeq
    assert(sorted(Stats.rocAuc(df, "k", "lab", "v", grain = 0.0)) ==
      sorted(Stats.rocAuc(df, "k", "lab", "v")))
    assert(sorted(Stats.ksTest(df, "g", "A", "B", "v", grain = -1.0)) ==
      sorted(Stats.ksTest(df, "g", "A", "B", "v")))
    assert(sorted(Stats.mannWhitney(df, "g", "A", "B", "v", grain = 0.0)) ==
      sorted(Stats.mannWhitney(df, "g", "A", "B", "v")))
    assert(sorted(Stats.mannWhitneyByKey(df, "k", "g", "A", "B", "v",
        grain = 0.0)) ==
      sorted(Stats.mannWhitneyByKey(df, "k", "g", "A", "B", "v")))
    val nn = df.withColumn("v", F.abs(F.col("v")))
    assert(sorted(Stats.giniConcentration(nn, "k", "v", grain = 0.0)) ==
      sorted(Stats.giniConcentration(nn, "k", "v")))
  }

  test("grain: quantized statistic EQUALS the caller pre-rounding the column") {
    import org.apache.spark.sql.{functions => F}
    val g = 0.25
    val df = (1 to 300).map { i =>
      ("k" + (i % 2), if (i % 2 == 0) "A" else "B", i % 4,
        math.cos(i.toDouble) * 3 + i * 0.003)
    }.toDF("k", "g", "lab", "v")
    val pre = df.withColumn("v",
      F.round(F.col("v") / F.lit(g), 0) * F.lit(g))
    def sorted(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(_.toString).sorted.toSeq
    assert(sorted(Stats.rocAuc(df, "k", "lab", "v", grain = g)) ==
      sorted(Stats.rocAuc(pre, "k", "lab", "v")))
    assert(sorted(Stats.ksTest(df, "g", "A", "B", "v", grain = g)) ==
      sorted(Stats.ksTest(pre, "g", "A", "B", "v")))
    assert(sorted(Stats.mannWhitney(df, "g", "A", "B", "v", grain = g)) ==
      sorted(Stats.mannWhitney(pre, "g", "A", "B", "v")))
    assert(sorted(Stats.mannWhitneyByKey(df, "k", "g", "A", "B", "v",
        grain = g)) ==
      sorted(Stats.mannWhitneyByKey(pre, "k", "g", "A", "B", "v")))
    val nn = df.withColumn("v", F.abs(F.col("v")))
    val nnPre = nn.withColumn("v",
      F.round(F.col("v") / F.lit(g), 0) * F.lit(g))
    assert(sorted(Stats.giniConcentration(nn, "k", "v", grain = g)) ==
      sorted(Stats.giniConcentration(nnPre, "k", "v")))
    // and the quantization actually coarsens: a continuous domain
    // collapses to ≤ a handful of grid points per unit interval
    val distinctRaw = df.select("v").distinct().count()
    val distinctQ = pre.select("v").distinct().count()
    assert(distinctQ < distinctRaw,
      s"grain must shrink the value vocabulary ($distinctQ vs $distinctRaw)")
  }
}
