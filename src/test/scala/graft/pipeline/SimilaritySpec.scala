package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.{Tables, TestSpark}

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("brute-force top-k: k results per query, ranked by similarity") {
    val res = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val byQuery = res.select("query_id", "rnk", "cos_sim")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        "cos_sim must be non-increasing in rank")
    }
  }

  test("lsh top-k results are a subset of plausible neighbors with correct scores") {
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 50)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH returned nothing")
    // every LSH hit that also appears in the exact top-50 must agree on score
    lsh.foreach { case (q, n, c) =>
      exact.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // Default config must hold the ann_recall driver gate (recall ≥ 0.3).
    // The r5 sweep picked (nTables=4, nBits=8) as the cheapest config
    // with ≥0.4 measured recall across SFs — asserting ≥0.5 here would
    // pin the old, 2.4× costlier 8-table default, not the contract.
    val exact10 = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hit = exact10.count { case (q, n) => lsh.exists(r => r._1 == q && r._2 == n) }
    assert(hit * 10 >= exact10.length * 3,
      s"LSH recall below the 0.3 gate: $hit of ${exact10.length}")
    // OR-amplification must actually amplify: more tables, no less recall
    val lsh8 = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 10,
        nTables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hit8 = exact10.count { case (q, n) => lsh8.contains((q, n)) }
    assert(hit8 >= hit,
      s"8-table recall $hit8 below 4-table recall $hit — amplification broken")
  }

  test("ivf top-k: correct scores and reasonable recall vs exact") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact10 = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact10.map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty, "IVF returned nothing")
    // scores must agree exactly with brute force wherever they overlap
    ivf.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // probing half the cells should recover >= half of the exact top-10
    val hit = exact10.count { case (q, n, _) => ivf.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"IVF recall too low: $hit of ${exact10.length}")
  }

  test("pq top-k: exact rerank scores and reasonable recall vs exact") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact10 = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact10.map { case (q, n, c) => (q, n) -> c }.toMap
    val pq = Similarity.pqTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(pq.length == 30, s"expected 10 results × 3 queries, got ${pq.length}")
    // the final stage is an exact rescore: overlapping pairs must agree
    pq.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // an ADC shortlist of 5k candidates should recover >= half of top-10
    val hit = exact10.count { case (q, n, _) => pq.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"PQ recall too low: $hit of ${exact10.length}")
  }

  test("ivfpq top-k: exact rerank scores and at least flat-PQ-grade recall") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact10 = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact10.map { case (q, n, c) => (q, n) -> c }.toMap
    val ivfpq = Similarity.ivfpqTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(ivfpq.length == 30,
      s"expected 10 results × 3 queries, got ${ivfpq.length}")
    // the final stage is an exact rescore: overlapping pairs must agree
    ivfpq.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
    }
    // residual codes spend precision inside the probed cells — the
    // composed path must hold the same recall grade as flat PQ
    val hit = exact10.count { case (q, n, _) =>
      ivfpq.exists(r => r._1 == q && r._2 == n) }
    assert(hit >= exact10.length / 2,
      s"IVF-PQ recall too low: $hit of ${exact10.length}")
  }

  test("semanticDecontam: planted leak flagged, orthogonal not, ties take lowest id") {
    def v(f: Int => Float) = Array.tabulate(4)(f)
    val bench = Seq(
      (0L, v(_ => 0.5f)),                              // all-ones direction
      (1L, v(i => if (i % 2 == 0) 1.0f else -1.0f)))   // alternating
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (100L, v(_ => 2.0f)),                            // parallel to bench 0
      (101L, v(i => if (i % 2 == 0) -3.0f else 3.0f)), // anti-parallel to 1
      (102L, v(i => if (i < 2) 1.0f else -1.0f)))      // ⊥ to both (cos 0)
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontam(corpus, bench, threshold = 0.9)
      .orderBy("vec_id").as[(Long, Long, Double, Boolean)].collect()
    assert(got(0) == ((100L, 0L, 1.0, true)))
    // anti-parallel: best cos is 0.0 vs bench 0... both benches give 0
    // for 102; the tie must resolve to the LOWEST bench id
    assert(got(2)._2 == 0L && math.abs(got(2)._3) < 1e-9 && !got(2)._4)
    assert(!got(1)._4, "anti-parallel vector must not be flagged")
  }

  test("identical vector is its own nearest neighbor when duplicated") {
    val e = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0), k = 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(top1._1 == 1L && math.abs(top1._2 - 1.0) < 1e-9)
  }

  test("cosinePairsLsh: planted near-dups all recovered, output subset of exact, no leak") {
    // 200 random base vectors + 20 planted near-dups (base + 1% noise,
    // cosine ≈ 0.999). At the production near-dup regime the 1−(1−p^b)^L
    // math gives per-pair recall ~1−1e-15 for (8 bits, 16 tables), so
    // recall 1 here is the math working, not luck; random pairs at
    // dim 64 concentrate near cos 0 and stay far below the threshold.
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val dups = (0L until 20L).map { i =>
      (200L + i, base(i.toInt)._2.map(x => x + rnd.nextFloat() * 0.02f - 0.01f))
    }
    val e = (base ++ dups).toDF("vec_id", "embedding")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val lsh = Similarity.cosinePairsLsh(e, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.size <= 1,
      s"cosinePairsLsh leaked ${leaked.size} persisted RDDs")
    val exact = Dedup.cosinePairs(e, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    // every planted pair is in the exact set and LSH recovers all of it
    assert(exact.map(p => (p._1, p._2)).toSet == (0L until 20L).map(i => (i, 200L + i)).toSet)
    assert(lsh.toSet == exact.toSet,
      s"LSH pairs ${lsh.length} != exact pairs ${exact.length} at near-dup threshold")
  }

  test("non-64-dim corpora run every LSH/IVF/PQ path; ragged input fails loudly") {
    // 16-dim deterministic corpus — every path must project with
    // 16-component planes/centroids, not silently zip short at a
    // hard-coded 64 (dotp truncates to the shorter operand)
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val c16 = vecs.toDF("vec_id", "embedding")
    val q16 = c16.filter(col("vec_id") < 2)
    val exact = Similarity.bruteForceTopK(c16, q16, k = 5)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    assert(exact.nonEmpty)
    for (res <- Seq(
        Similarity.lshTopK(c16, q16, k = 5, nTables = 8),
        Similarity.ivfTopK(c16, q16, k = 5, nCells = 4, nProbe = 4),
        Similarity.pqTopK(c16, q16, k = 5, m = 4, ks = 8),
        Similarity.ivfpqTopK(c16, q16, k = 5, nCells = 4, nProbe = 4,
          m = 4, ks = 8))) {
      val rows = res.select("query_id", "neighbor_id", "cos_sim")
        .as[(Long, Long, Double)].collect()
      assert(rows.nonEmpty, "approximate path returned nothing at dim 16")
      // exact rescoring: any hit inside the exact top-5 agrees on score
      rows.foreach { case (q, n, c) =>
        exact.get((q, n)).foreach(ec => assert(math.abs(ec - c) < 1e-9))
      }
    }
    // cosinePairsLsh recovers a planted 16-dim exact dup
    val dup = c16.unionAll(Seq((100L, vecs.head._2)).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosinePairsLsh(dup, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100L),
      "planted 16-dim dup not recovered")
    // a ragged row must raise, not silently truncate every projection
    val ragged = (vecs :+ (100L, Array.fill(8)(0.5))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Similarity.lshTopK(ragged, q16, k = 5).collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("dim mismatch"))
    // default nCells=16 > the 1/4 sample of 41 vectors, so kmeans trains
    // on the full corpus and its fused stats job sees the ragged row
    val e2 = intercept[Exception] {
      Similarity.ivfTopK(ragged, q16, k = 5)
    }
    assert(e2.getMessage.contains("dim mismatch"))
    // m must divide the (probed) dim
    val e3 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(c16, q16, k = 5, m = 5)
    }
    assert(e3.getMessage.contains("divide"))
    // a ragged QUERY row must raise too (r7: the PQ paths guard the
    // query frames like lshTopK, instead of truncating LUT dots)
    def msg(e: Exception) =
      e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    val raggedQ = Seq((0L, Array.fill(8)(0.5))).toDF("vec_id", "embedding")
    val e4 = intercept[Exception] {
      Similarity.pqTopK(c16, raggedQ, k = 5, m = 4, ks = 8).collect()
    }
    assert(msg(e4).contains("dim mismatch"))
    val e5 = intercept[Exception] {
      Similarity.ivfpqTopK(c16, raggedQ, k = 5, nCells = 4, nProbe = 4,
        m = 4, ks = 8).collect()
    }
    assert(msg(e5).contains("dim mismatch"))
  }

  test("semDedupPairs: planted near-dups recovered in-cluster, precision 1, keep works") {
    // same planted corpus as the cosinePairsLsh case: at the near-dup
    // regime (cos ≈ 0.999) a pair's two members assign to the same
    // k-means cell (their centroid distances differ by the noise), so
    // the within-cluster comparison recovers the pairs the clustering
    // exists to localize
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val dups = (0L until 20L).map { i =>
      (200L + i, base(i.toInt)._2.map(x => x + rnd.nextFloat() * 0.02f - 0.01f))
    }
    val e = (base ++ dups).toDF("vec_id", "embedding")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val semDf = Similarity.semDedupPairs(e, threshold = 0.95)
    val sem = semDf.as[(Long, Long, Double)].collect()
    // allowed survivors: the checkpointed result + the quantizer's
    // k-row per-round centroid frames (plan-truncation artifacts, the
    // CC-loop convention). The CORPUS-scale training cache must be
    // gone — kmeansCentroids releases it before returning (r6).
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.size <= 4, s"semDedupPairs leaked ${leaked.size} RDDs")
    val exact = Dedup.cosinePairs(e, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    assert(sem.toSet.subsetOf(exact.toSet), "precision must be 1")
    assert(sem.length >= 18,
      s"within-cluster recall collapsed: ${sem.length} of ${exact.length}")
    // composed keep decision drops exactly one member per found pair
    val kept = Dedup.keepAfterNearDedup(
      e.select(col("vec_id").as("doc_id")), semDf)
      .as[Long].collect().toSet
    assert(kept.size == 220 - sem.length)
    sem.foreach { case (a, b, _) => assert(kept(a) && !kept(b)) }
  }

  test("cosinePairsLsh: subset-with-equal-scores of the all-pairs baseline on real data") {
    val lsh = Similarity.cosinePairsLsh(emb, threshold = 0.44)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.cosinePairs(emb, threshold = 0.44)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted ${(lsh -- exact).size} pairs not in the exact set")
    assert(lsh.nonEmpty, "LSH found nothing at the moderate threshold")
  }

  test("pcaTopComponent: planted dominant direction recovered, unit norm, variance share") {
    // points on the diagonal of dims (0,1) with ±spread, tiny jitter in
    // dim 2: the top component must be ≈ ±(1/√2, 1/√2, 0) with nearly
    // all variance explained
    val pts = (0 until 40).map { n =>
      val t = (n - 19.5) / 4.0
      (n.toLong, Seq(t.toFloat, t.toFloat,
        (if (n % 2 == 0) 0.001f else -0.001f)))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(pts)
      .orderBy("i")
      .select("loading", "eigenvalue", "explained_ratio")
      .as[(Double, Double, Option[Double])].collect()
    val loadings = got.map(_._1)
    val nrm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-6, s"unit norm, got $nrm")
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(loadings(0)) - inv) < 1e-3, loadings.toSeq)
    assert(math.abs(math.abs(loadings(1)) - inv) < 1e-3, loadings.toSeq)
    assert(math.abs(loadings(2)) < 1e-3, loadings.toSeq)
    assert(loadings(0) * loadings(1) > 0, "dims 0/1 co-vary positively")
    assert(got.head._3.exists(_ > 0.999),
      s"diagonal line explains ~everything, got ${got.head._3}")
    assert(got.head._2 > 0, "positive eigenvalue")
    // degenerate: all-identical vectors → zero trace → NULL share
    val const = (0 until 5).map(n =>
      (n.toLong, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val gc = Similarity.pcaTopComponent(const)
      .select("explained_ratio").as[Option[Double]].collect()
    assert(gc.forall(_.isEmpty), "zero-variance corpus has no share")
  }

  test("pcaComponents: deflation yields a near-orthogonal second direction") {
    // dominant diagonal in dims (0,1), secondary variance on dim 2:
    // component 1 ≈ ±(1,1,0)/√2, component 2 ≈ ±(0,0,1)
    val pts = (0 until 40).map { n =>
      val t = (n - 19.5) / 4.0
      val u = if (n % 4 < 2) 0.8 else -0.8
      (n.toLong, Seq(t.toFloat, t.toFloat, u.toFloat))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaComponents(pts, nComponents = 2)
      .orderBy("component", "i")
      .select("component", "loading", "eigenvalue", "explained_ratio")
      .as[(Int, Double, Double, Option[Double])].collect()
    val c1 = got.filter(_._1 == 1).map(_._2)
    val c2 = got.filter(_._1 == 2).map(_._2)
    val inv = 1.0 / math.sqrt(2.0)
    // 10 power iterations leave ~2% cross-leakage at this eigen-gap —
    // direction recovery is asserted at that honesty level
    assert(math.abs(math.abs(c1(0)) - inv) < 1e-2 &&
      math.abs(c1(2)) < 0.05, s"c1 on the diagonal: ${c1.toSeq}")
    assert(math.abs(math.abs(c2(2)) - 1.0) < 0.05 &&
      math.abs(c2(0)) < 0.05, s"c2 on axis 2: ${c2.toSeq}")
    val dot = c1.zip(c2).map(p => p._1 * p._2).sum
    assert(math.abs(dot) < 0.05, s"near-orthogonal, dot=$dot")
    val e1 = got.find(_._1 == 1).get
    val e2 = got.find(_._1 == 2).get
    assert(e1._3 > e2._3 && e2._3 > 0, "eigenvalues descend, both real")
    assert(e1._4.get > e2._4.get && e2._4.get > 0.0,
      s"shares descend: ${e1._4} > ${e2._4}")
  }

  test("gramFrame: bit-parity with the exact-integer Gram oracle, no join in the plan") {
    // The parity oracle is the EXACT Σ c·cᵀ over the 6dp micro-unit
    // grid, computed driver-side in BigInteger — the same arithmetic
    // DuckDB's pcaOracle CTE performs (its decimal(19,6)² products are
    // exact). NOTE this is deliberately NOT the r12 cent⨝cent Spark
    // plan: there c was decimal(19,6), so c·c hit precision 39 and
    // Spark rescaled every product to 11dp — the one place the two
    // engines' Grams silently disagreed at the 1e-10 level. The r13
    // 128-bit aggregate is exact, i.e. equal to the DuckDB side.
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    // μ exactly as centeredGram derives it
    val muRows = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("i"),
        round(col("x").cast("double"), 6).cast("decimal(18,6)").as("x6"))
      .groupBy("i")
      .agg(sum(col("x6")).cast("decimal(38,6)").as("sx"),
        count(lit(1)).as("n"))
      .select(col("i"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .as("mu"))
      .collect()
    val d = muRows.length
    val muMicro = new Array[Long](d)
    muRows.foreach(r =>
      muMicro(r.getInt(0)) = math.round(r.getDouble(1) * 1e6))
    // centered micro-unit vectors, collected (bounded: N·d longs at
    // test SF), then the exact BigInteger outer-product sum
    val centRows = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr("cast(cast(round(cast(x as double), 6) as decimal(18,6)) " +
          "* 1000000 as long)").as("xm"))
      .collect()
    val byVec = centRows.groupBy(_.getLong(0))
    val exact = Array.ofDim[java.math.BigInteger](d, d)
    for (i <- 0 until d; j <- i until d)
      exact(i)(j) = java.math.BigInteger.ZERO
    byVec.values.foreach { rows =>
      val c = new Array[Long](d)
      rows.foreach(r => c(r.getInt(1)) = r.getLong(2) - muMicro(r.getInt(1)))
      for (i <- 0 until d; j <- i until d)
        exact(i)(j) = exact(i)(j).add(java.math.BigInteger.valueOf(c(i))
          .multiply(java.math.BigInteger.valueOf(c(j))))
    }
    val frame = Similarity.gramFrame(emb, "embedding", d, lit(muMicro))
    assert(!frame.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      "the one-pass Gram must contain NO join:\n" +
        frame.queryExecution.optimizedPlan.toString)
    val packed = frame.head().getSeq[java.math.BigDecimal](0)
    assert(packed.length == d * (d + 1) / 2)
    var cell = 0
    for (i <- 0 until d; j <- i until d) {
      val want = new java.math.BigDecimal(exact(i)(j), 12)
      assert(packed(cell).setScale(12) == want,
        s"Gram cell ($i,$j): agg=${packed(cell)} exact=$want")
      cell += 1
    }
  }

  test("projectOntoTopComponent: coordinates recover the line, residual the jitter") {
    val pts = (0 until 40).map { n =>
      val t = (n - 19.5) / 4.0
      (n.toLong, Seq(t.toFloat, t.toFloat,
        (if (n % 2 == 0) 0.001f else -0.001f)))
    }.toDF("vec_id", "embedding")
    val got = Similarity.projectOntoTopComponent(pts)
      .orderBy("vec_id")
      .select("vec_id", "coord", "residual2")
      .as[(Long, Double, Double)].collect()
    // the diagonal line: coord(n) = ±(t·√2), monotone in n; residual²
    // holds only the ±0.001 jitter (≈1e-6)
    val coords = got.map(_._2)
    val mono = coords.zip(coords.tail)
    assert(mono.forall(p => p._2 > p._1) || mono.forall(p => p._2 < p._1),
      "coordinates are monotone along the planted line")
    val expect = math.abs((0 - 19.5) / 4.0) * math.sqrt(2.0)
    assert(math.abs(math.abs(coords.head) - expect) < 1e-2,
      s"endpoint coordinate ~${expect}, got ${coords.head}")
    assert(got.forall(_._3 < 1e-4),
      s"residual is jitter-sized, max ${got.map(_._3).max}")
    assert(got.forall(_._3 >= 0.0), "clamped at zero")
  }
}
