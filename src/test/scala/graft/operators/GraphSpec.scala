package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("pageRank: star graph — hub dominates, leaves tie, mass sums to 1") {
    // undirected star 1–2, 1–3: deg(1)=2, deg(2)=deg(3)=1, N=3
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 1)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    // one hand-computed iteration from r0 = 1/3:
    //   r(1) = 0.15/3 + 0.85·(1/3 + 1/3)        = 0.616666666667
    //   r(2) = r(3) = 0.15/3 + 0.85·(1/3 / 2)   = 0.191666666667
    assert(math.abs(r(1L) - 0.61666667) < 1e-6, s"hub ${r(1L)}")
    assert(r(2L) == r(3L), "symmetric leaves tie exactly")
    // output ranks round at 8dp, so 3 nodes can drift the sum ~1.5e-8
    assert(math.abs(r.values.sum - 1.0) < 2e-8, "rank is a distribution")
  }

  test("pageRank: regular graph stays uniform at any depth") {
    // 4-cycle: every node deg 2 — PageRank must stay 1/4 each round
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 4)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    assert(r.size == 4)
    assert(r.values.forall(v => math.abs(v - 0.25) < 1e-9), r.toString)
  }

  test("pageRank: edge derivation executes once, not once per superstep") {
    // The edge frame is usually derived (fact join + distinct); the
    // operator must localCheckpoint it before the loop so that lineage
    // runs ONCE. A partition-level accumulator on the input counts
    // executions: the bidirectional union scans the input twice in its
    // single materialization job (two union branches), so one pass adds
    // at most 2·rows; re-execution per superstep would add
    // 2·rows·(iters+1) or more.
    val execs = spark.sparkContext.longAccumulator("edgeExecs")
    val raw = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val edges = spark.createDataFrame(
      spark.sparkContext.parallelize(raw, 1).map { p =>
        execs.add(1); org.apache.spark.sql.Row(p._1, p._2)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType))))
    val r = Graph.pageRank(edges, iters = 4).collect()
    assert(r.length == 4)
    assert(execs.value <= 2L * raw.length,
      s"edge lineage re-executed: $execs adds for ${raw.length} rows")
  }

  test("connectedComponents: chains, isolates excluded, min labels") {
    // two chains (0-1-2-3, 10-11) and a self-contained pair (20-21)
    val edges = Seq((1L, 0L), (1L, 2L), (2L, 3L), (11L, 10L), (20L, 21L))
      .toDF("src", "dst")
    val r = Graph.connectedComponents(edges)
      .select("node_id", "component").as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L, 20L, 21L))
    assert(Seq(0L, 1L, 2L, 3L).forall(r(_) == 0L), r.toString)
    assert(r(10L) == 10L && r(11L) == 10L)
    assert(r(20L) == 20L && r(21L) == 20L)
  }

  test("connectedComponents: deep path converges within diameter rounds") {
    // a 12-node path: min label must walk the whole chain
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val r = Graph.connectedComponents(edges, maxIters = 20)
      .select("component").as[Long].collect()
    assert(r.length == 12 && r.forall(_ == 0L))
  }

  test("triangles: K4 plus a pendant — exact counts and coefficients") {
    // K4 on {0,1,2,3} (4 triangles, each node in 3) + pendant 3–9.
    // Duplicate and reversed listings plus a self-loop must all be
    // canonicalized away.
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val edges = (k4 ++ Seq((3L, 9L), (9L, 3L), (1L, 0L), (2L, 2L)))
      .toDF("src", "dst")
    val r = Graph.triangles(edges)
      .select("node_id", "deg", "n_triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 9L))
    assert(r(0L) == ((3L, 3L, 1.0)) && r(1L) == ((3L, 3L, 1.0))
      && r(2L) == ((3L, 3L, 1.0)), r.toString)
    // node 3 has deg 4 (K4 + pendant): 3 triangles of C(4,2)=6 wedges
    assert(r(3L) == ((4L, 3L, 0.5)), r.toString)
    assert(r(9L) == ((1L, 0L, 0.0)), r.toString)
  }

  test("triangles: triangle-free bipartite graph counts zero") {
    val edges = (for { l <- 0L to 2L; r <- 10L to 12L } yield (l, r))
      .toDF("src", "dst")
    val out = Graph.triangles(edges).select("n_triangles").as[Long].collect()
    assert(out.length == 6 && out.forall(_ == 0L))
  }

  test("triangles: per-node counts sum to 3x the global triangle total") {
    // random-ish deterministic graph: i—(i*7+3)%20 and i—(i*5+1)%20
    val edges = (0L until 20L)
      .flatMap(i => Seq((i, (i * 7 + 3) % 20), (i, (i * 5 + 1) % 20)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val per = Graph.triangles(edges)
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .as[Long].head()
    assert(per % 3 == 0, s"per-node triangle mass $per not divisible by 3")
  }

  test("pageRank: more in-links means more rank after convergence steps") {
    // node 100 linked by 5 spokes; node 200 by 1
    val edges = (Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (5L, 100L), (6L, 200L))).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3)
      .select("node_id", "rank").as[(Long, Double)].collect().toMap
    assert(r(100L) > r(200L))
    assert(math.abs(r.values.sum - 1.0) < 1e-8)
  }

  test("kCore: cascading peel — chain strips one node per round") {
    // triangle {1,2,3} + path 3-4-5-6: for k=2 the path peels from the
    // tail one node per round (6, then 5, then 4) — three cascading
    // rounds before the fixpoint, the behavior a single-pass degree
    // filter cannot reproduce
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1 keeps everything (degrees are all >= 1 already)
    assert(Graph.kCore(edges, k = 1).count() == 6)
    // k=3 dissolves the graph entirely: the triangle's nodes have
    // degree 2 once the tail is gone
    assert(Graph.kCore(edges, k = 3).count() == 0)
  }

  test("kCore: duplicate, reversed and self-loop edges canonicalize") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L),
      (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2).as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("assortativity: star -1, path -0.5, regular graph NULL") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(Graph.assortativity(star).select("assortativity")
      .as[Option[Double]].head().contains(-1.0))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.assortativity(path).select("assortativity")
      .as[Option[Double]].head().contains(-0.5))
    // 4-cycle: every degree 2 — zero variance, honest NULL
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    assert(Graph.assortativity(cyc).select("assortativity")
      .as[Option[Double]].head().isEmpty)
    // duplicates/reversals/self-loops canonicalize like the rest of
    // the graph family
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (1L, 4L))
      .toDF("src", "dst")
    assert(Graph.assortativity(messy).select("assortativity")
      .as[Option[Double]].head().contains(-1.0))
  }

  test("hits: hub/authority separation on a bipartite hand graph") {
    // 1→3, 2→3, 1→4: node 3 is the strong authority (two in-links),
    // node 1 the strong hub (points at both authorities). Hand-rolled
    // 3 rounds of max-normalized mutual reinforcement:
    //   r3: auth(4) = 1/1.625 = 0.61538462, hub(2) = 1/(1+0.61538462)
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges).as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 1.0 && got(3L)._2 == 1.0, "maxima normalize to 1")
    assert(got(3L)._1 == 0.0 && got(4L)._1 == 0.0,
      "pure authorities have hub 0")
    assert(got(1L)._2 == 0.0 && got(2L)._2 == 0.0,
      "pure hubs have authority 0")
    assert(got(4L)._2 == 0.61538462, s"auth(4) = ${got(4L)._2}")
    assert(got(2L)._1 == 0.61904762, s"hub(2) = ${got(2L)._1}")
  }

  test("bfsHops: min-hop distances, shortcut wins, unreachable absent") {
    // 1—2—3—4 path plus shortcut 1—4; island 9—10 is unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val src = Seq(Tuple1(1L)).toDF("node_id")
    val got = Graph.bfsHops(edges, src).as[(Long, Long)].collect().toMap
    // 4 is at hop 1 via the shortcut, NOT 3 via the path
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("bfsHops: directed mode follows edge direction only") {
    // 1→2→3 and 3→1: from 1, directed reaches 2 then 3; node 0←1? no,
    // 0→1 points INTO the source so 0 stays unreached
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (0L, 1L))
      .toDF("src", "dst")
    val src = Seq(Tuple1(1L)).toDF("node_id")
    val dir = Graph.bfsHops(edges, src, undirected = false)
      .as[(Long, Long)].collect().toMap
    assert(dir == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    val undir = Graph.bfsHops(edges, src).as[(Long, Long)].collect().toMap
    assert(undir == Map(1L -> 0L, 2L -> 1L, 0L -> 1L, 3L -> 1L))
  }

  test("weightedShortestPaths: cheap detour beats the direct edge") {
    // 1—2 costs 10 direct, but 1—3—2 costs 1+2=3; island 9—10 absent
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L),
      (9L, 10L, 1L)).toDF("src", "dst", "w")
    val src = Seq(Tuple1(1L)).toDF("node_id")
    val got = Graph.weightedShortestPaths(edges, src)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 3L -> 1L, 2L -> 3L))
    // directed: 2→1 edge direction blocks the return path
    val dir = Seq((2L, 1L, 5L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val gd = Graph.weightedShortestPaths(dir, src, undirected = false)
      .as[(Long, Long)].collect().toMap
    assert(gd == Map(1L -> 0L, 3L -> 1L))
    // a longer-hop but cheaper path needs MORE rounds than BFS depth:
    // 1→5 direct 100 vs 1→2→3→4→5 at 1 each
    val chain = Seq((1L, 5L, 100L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (4L, 5L, 1L)).toDF("src", "dst", "w")
    val gc = Graph.weightedShortestPaths(chain, src)
      .as[(Long, Long)].collect().toMap
    assert(gc(5L) == 4L, s"cheap 4-hop path wins: $gc")
  }

  test("bfsHops: multi-source takes the nearest source") {
    // sources 1 and 5 on a path 1—2—3—4—5: node 3 is 2 from both,
    // node 4 is 1 from source 5 (not 3 from source 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val src = Seq(Tuple1(1L), Tuple1(5L)).toDF("node_id")
    val got = Graph.bfsHops(edges, src).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("linkPredict: path endpoints score through the shared middle") {
    // a—b—c: the one candidate is (a, c) via center b (deg 2):
    // cn=1, jaccard=1/(1+1−1)=1, aa=1/ln 2, pa=1·1
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.linkPredict(edges)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(got.size == 1)
    val (u, v, cn, jac, aa, pa) = got.head
    assert((u, v, cn, jac, pa) == ((1L, 3L, 1L, 1.0, 1L)))
    assert(aa == 1.442695) // round(1/round(ln 2, 12), 12) → 6dp
  }

  test("linkPredict: 4-cycle diagonals each collect both centers") {
    // square 1-2-3-4-1: candidates are the two diagonals, each with
    // cn=2 (both opposite corners), jaccard 2/(2+2−2)=1, aa=2/ln 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.linkPredict(edges)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.keySet == Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) == ((2L, 1.0, 2.88539)))
    // a complete triangle has NO non-adjacent pairs → empty result
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.linkPredict(tri).count() == 0)
  }

  test("linkPredict: hub cap excludes the center loudly; topN cuts deterministically") {
    // star: center 9 with 4 leaves — all 6 leaf pairs are candidates
    // through the deg-4 center; capping below 4 removes them all and
    // warns
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
      .toDF("src", "dst")
    assert(Graph.linkPredict(star).count() == 6)
    var capped = -1L
    val warned = captureWarnings("graft.operators.Graph") {
      capped = Graph.linkPredict(star, maxCenterDegree = 3).count()
    }
    assert(capped == 0)
    assert(warned.exists(_.contains("maxCenterDegree")),
      s"expected the hub-cap warning, got: $warned")
    // topN=2 on the star keeps the 2 smallest pairs (equal aa → pair
    // tiebreak)
    val top = Graph.linkPredict(star, topN = 2)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSeq
    assert(top == Seq((1L, 2L), (1L, 3L)))
  }

  test("linkPredict: minCommonNeighbors drops the 1-shared-neighbor floor") {
    // path 1—2—3 gives (1,3) cn=1; square 5-6-7-8-5 gives two
    // diagonals with cn=2. Threshold 2 keeps only the diagonals.
    val edges = Seq((1L, 2L), (2L, 3L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L)).toDF("src", "dst")
    val all = Graph.linkPredict(edges)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(all == Set((1L, 3L), (5L, 7L), (6L, 8L)))
    val filtered = Graph.linkPredict(edges, minCommonNeighbors = 2)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(filtered == Set((5L, 7L), (6L, 8L)))
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
}
