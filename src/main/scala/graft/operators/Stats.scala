package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Statistical hypothesis tests as plan-level operators (SURVEY.md §2
  * R35/R36) — the "is this difference real" layer every experiment
  * dashboard and data-drift monitor needs on top of the descriptive
  * aggregates (q19's moments, P23's divergence). Both tests follow the
  * §6 cross-engine discipline: counts exact, each derived quantity a
  * single IEEE operation on exactly-agreed (or grain-rounded) inputs,
  * sums of rounded terms accumulated as DECIMAL — order-free.
  */
object Stats extends org.apache.spark.internal.Logging {

  /** Pearson chi-square test of independence between two categorical
    * columns. Returns the full contingency diagnostic — one row per
    * A×B grid cell (zero-observed cells included — they still carry
    * their expected-count evidence): (a, b, observed, expected, term)
    * plus the
    * denormalized verdict columns (chi2, dof) — the shape an
    * experiment review actually reads (WHICH cells drive the
    * statistic), not just the scalar.
    *
    * NULL categories are OUT OF SCOPE and filtered up front: a NULL
    * is "category unknown", not a category, so it can neither occupy
    * a grid cell nor inflate the margins/dof. (Without the filter a
    * NULL group would contribute to row/col totals while the
    * equi-joined grid silently zeroes its observed count — the worst
    * of both.) Rows with a NULL in either column simply don't enter
    * n_total; audit NULL rates separately with [[Quality.audit]].
    *
    * Scale: ONE partial-agg'd shuffle builds the contingency cells;
    * margins, totals, and the statistic all run at CELL cardinality
    * (bounded by |A|·|B| — category counts, not rows) and join back by
    * broadcast. expected rounds 6dp from exact integer margins; each
    * cell term rounds 12dp; chi2 = 6dp round of the DECIMAL(38,12)
    * term sum — no float-summation order anywhere. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
      .localCheckpoint()
    val rowTot = cells.groupBy(col(aCol))
      .agg(sum(col("observed")).as("row_tot"))
    val colTot = cells.groupBy(col(bCol))
      .agg(sum(col("observed")).as("col_tot"))
    val totals = cells.agg(
      sum(col("observed")).as("n_total"),
      countDistinct(col(aCol)).as("_na"),
      countDistinct(col(bCol)).as("_nb"))
    // the FULL A×B grid, not just observed cells: a zero-observed cell
    // still contributes (0−expected)²/expected — dropping zeros would
    // understate the statistic exactly when dependence is strongest
    val withE = rowTot.crossJoin(colTot)
      .join(cells, Seq(aCol, bCol), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("expected",
        round(col("row_tot").cast("double") * col("col_tot") /
          col("n_total"), 6))
      // (o−e)² squares by MULTIPLICATION, not pow: x·x is correctly
      // rounded IEEE in every engine, while libm pow(x, 2) is not — a
      // last-ulp pow difference survives the 12dp round whenever the
      // term magnitude exceeds ~1e3 (the r11 benford SQL-twin oracle
      // caught exactly that)
      .withColumn("term",
        round((col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"), 12))
    val stat = withE.agg(
      round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
        .as("chi2"))
    withE
      .crossJoin(broadcast(stat))
      .withColumn("dof", ((col("_na") - 1) * (col("_nb") - 1)).cast("long"))
      .select(col(aCol), col(bCol), col("observed"), col("expected"),
        col("term"), col("chi2"), col("dof"))
  }

  /** Mutual information between two categorical columns (SURVEY.md §2
    * R52) — the information-theoretic sibling of [[chiSquare]]: χ²
    * asks "is there dependence", MI answers "how many nats of one
    * column the other reveals" — the feature-relevance ranking signal
    * ([[corrMatrix]] for categories). Also emits the normalized
    * variant MI/√(H(A)·H(B)) ∈ [0, 1].
    *
    * Only OBSERVED cells contribute (0·ln 0 = 0, so zero cells drop
    * out exactly — the opposite of χ²'s zero-cell rule, and why this
    * aggregate needs no grid). NULL categories are out of scope, as
    * in [[chiSquare]]. Exactness: every p is a ratio of exact counts;
    * each ln term rounds 12dp (the single-transcendental §6 rule) and
    * weights by the exact integer count before the DECIMAL(38,12)
    * sum; the final divisions round 6dp. Degenerate single-category
    * columns give MI 0 and a NULL normalized score (zero entropy).
    *
    * Scale: one (a, b) cell aggregate (partial-agg'd), two
    * marginal aggregates over cells, broadcast-able joins back, one
    * 1-row result. */
  def mutualInformation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("nab"))
      .localCheckpoint()
    val aTot = cells.groupBy(col(aCol)).agg(sum(col("nab")).as("na"))
    val bTot = cells.groupBy(col(bCol)).agg(sum(col("nab")).as("nb"))
    val tot = cells.agg(sum(col("nab")).as("n"))
    val dec = "decimal(38,12)"
    // Σ n_ab · ln(n_ab·N / (n_a·n_b)) — exact integer ratio per term
    val mi = cells
      .join(aTot, Seq(aCol)).join(bTot, Seq(bCol))
      .crossJoin(broadcast(tot))
      .select((col("nab").cast(dec) *
        round(F.log(col("nab").cast("double") * col("n") /
          (col("na").cast("double") * col("nb"))), 12)
          .cast(dec)).cast(dec).as("term"))
      .agg(coalesce(sum(col("term")), lit(0).cast(dec)).as("_mi"))
    def entropy(tcol: DataFrame, cnt: String) = tcol
      .crossJoin(broadcast(tot))
      .select((col(cnt).cast(dec) *
        round(F.log(col(cnt).cast("double") / col("n")), 12).cast(dec))
        .cast(dec).as("t"))
      .agg(coalesce(sum(col("t")), lit(0).cast(dec)).as("_h"))
    val m = mi.crossJoin(entropy(aTot, "na").withColumnRenamed("_h", "_ha"))
      .crossJoin(entropy(bTot, "nb").withColumnRenamed("_h", "_hb"))
      .crossJoin(broadcast(tot))
    val nD = col("n").cast("double")
    val miD = col("_mi").cast("double") / nD
    val ha = -col("_ha").cast("double") / nD
    val hb = -col("_hb").cast("double") / nD
    m.select(col("n"),
      round(miD, 6).as("mi_nats"),
      when(ha > 0 && hb > 0, round(miD / sqrt(ha * hb), 6))
        .as("normalized_mi"))
  }

  /** Benford first-significant-digit conformance (SURVEY.md §2 R37) —
    * the fraud/data-entry screen: naturally-occurring magnitudes put
    * digit d first with probability log10(1+1/d); fabricated or
    * truncated data doesn't. One row per digit 1–9 (all nine — a
    * digit that never occurs is evidence, the [[chiSquare]] zero-cell
    * rule) with observed/expected counts and shares, plus the
    * chi-square statistic (dof 8) denormalized.
    *
    * Digit extraction is INTEGER arithmetic, not log10: values scale
    * by 10^`scale` and round to exact longs, and the first digit is
    * the first character of the integer's decimal string — identical
    * in any engine, where a log10-based floor misassigns exact powers
    * of ten to the wrong decade on one libm but not another.
    * Non-positive values are out of scope (Benford is about
    * magnitudes), and so are positives below half the resolution —
    * |v| < 0.5·10^−scale rounds to a scaled integer of 0 and is
    * excluded with them (at the default scale=2 that is values under
    * 0.005: they have no first significant digit at this resolution).
    * Both exclusions surface via n_total vs the table's row count.
    *
    * Scale: one partial-agg'd 9-bucket shuffle; everything after is
    * 9-row arithmetic. Expected counts 6dp from the exact n, terms
    * 12dp, chi2 = 6dp round of the DECIMAL(38,12) sum. */
  def benford(df: DataFrame, valCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0, "scale must be non-negative")
    val ints = df
      .select(round(abs(col(valCol)) * math.pow(10, scale), 0)
        .cast("long").as("_v"))
      .filter(col("_v") > 0)
    val counts = ints
      .select(substring(col("_v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val grid = digits.join(counts, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(
        counts.agg(sum(col("observed")).as("n_total"))))
      .withColumn("exp_p",
        round(F.log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("expected", round(col("exp_p") * col("n_total"), 6))
      .withColumn("obs_p",
        round(col("observed").cast("double") / col("n_total"), 6))
      // multiplication, not pow — the chiSquare term discipline
      .withColumn("term",
        round((col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"), 12))
    val stat = grid.agg(
      round(sum(col("term").cast("decimal(38,12)")).cast("double"), 6)
        .as("chi2"))
    grid.crossJoin(broadcast(stat))
      .withColumn("dof", lit(8L))
      .select(col("digit"), col("observed"), col("expected"),
        col("obs_p"), col("exp_p"), col("term"), col("chi2"),
        col("dof"), col("n_total"))
  }

  /** NDCG@k over per-query ranked results (SURVEY.md §2 P27) — the
    * retrieval-quality metric that closes the loop on the BM25 / RRF /
    * ANN candidate generators: not "what did we retrieve" but "how
    * good was the ORDER". Standard exponential gain 2^rel − 1,
    * log2(rank+1) discount, both the score ranking's DCG and the
    * ideal (rel-sorted) IDCG truncated at `k`; ndcg = dcg/idcg, NULL
    * when the query has no relevant docs (idcg 0) — honest, not 0.
    *
    * Determinism: both rankings tie-break on the doc id; discount
    * terms round 12dp (log2 agrees across libms to ~1 ulp — the §6
    * single-transcendental rule) and sum as DECIMAL(38,12); ndcg is
    * one 6dp-rounded IEEE division.
    *
    * Scale: ONE shuffle on the (high-cardinality) query key carrying
    * both row_number orders; the aggregate is partial-agg'd. Input is
    * a candidate-set frame (k-proportional per query), never the
    * corpus. */
  def ndcgAtK(ranked: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(docCol))
    val gain = pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)
    val terms = ranked
      .withColumn("_rs", row_number().over(wS))
      .withColumn("_ri", row_number().over(wI))
      .withColumn("_dterm", when(col("_rs") <= k,
        round(gain / log2(col("_rs") + lit(1.0)), 12)).otherwise(lit(0.0)))
      .withColumn("_iterm", when(col("_ri") <= k,
        round(gain / log2(col("_ri") + lit(1.0)), 12)).otherwise(lit(0.0)))
    terms.groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("_dterm").cast("decimal(38,12)")).cast("double"), 6)
          .as("dcg"),
        round(sum(col("_iterm").cast("decimal(38,12)")).cast("double"), 6)
          .as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 6)))
  }

  /** Binary-relevance retrieval metrics @k over per-query ranked
    * results (SURVEY.md §2 P27b) — the companions every eval harness
    * reports next to [[ndcgAtK]]'s graded metric: precision@k ("how
    * clean is the page"), recall@k ("how much of the relevant set
    * surfaced"), and reciprocal rank@k ("how far down is the first
    * hit" — the per-query term of MRR; average the column for MRR
    * itself). One row per query: (query, n_docs, n_rel, rel_at_k,
    * precision_k, recall_k, rr_k). A doc is relevant iff `relCol` > 0.
    * Honest NULLs: recall and rr are NULL for a query with NO relevant
    * docs (0 would read as a failed retrieval of a retrievable set);
    * rr is 0.0 when relevant docs exist but none ranked ≤ k.
    *
    * Determinism: ranking tie-breaks on the doc id; every metric is
    * ONE IEEE division of exact integers rounded 6dp. Scale: the
    * [[ndcgAtK]] contract — one shuffle on the high-cardinality query
    * key, partial-agg'd aggregate, candidate-proportional input. */
  def retrievalEval(ranked: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val rel = col(relCol).cast("double") > 0
    ranked
      .withColumn("_rs", row_number().over(wS))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(rel, 1L).otherwise(0L)).as("n_rel"),
        sum(when(rel && col("_rs") <= k, 1L).otherwise(0L)).as("rel_at_k"),
        min(when(rel, col("_rs"))).as("_fr"))
      .select(col(queryCol), col("n_docs"), col("n_rel"), col("rel_at_k"),
        round(col("rel_at_k").cast("double") / k, 6).as("precision_k"),
        when(col("n_rel") > 0,
          round(col("rel_at_k").cast("double") / col("n_rel"), 6))
          .as("recall_k"),
        when(col("n_rel") === 0, lit(null).cast("double"))
          .when(col("_fr") <= k, round(lit(1.0) / col("_fr"), 6))
          .otherwise(lit(0.0)).as("rr_k"))
  }

  /** Friedman rank test over a complete block design (SURVEY.md §2
    * R65) — the REPEATED-MEASURES member of the k-group family:
    * [[kruskalWallis]] compares k INDEPENDENT groups, this one asks
    * "across blocks that each saw all k treatments, do the treatments
    * rank differently" (the k-variant A/B readout where every user
    * tried every variant). Blocks missing a treatment, or holding
    * duplicate observations of one, are DROPPED and counted in
    * `n_dropped` — an incomplete block has no within-block ranking.
    * One row: (n_blocks, n_dropped, k_treatments, chi2, dof) with the
    * tie-corrected statistic χ² = [12/(nk(k+1))·ΣR_j² − 3n(k+1)] /
    * [1 − Σ(t³−t)/(n(k³−k))] (the standard midrank correction, the
    * scipy-documented public form); honest NULL under k<2, no valid
    * blocks, or all-tied blocks (correction 0).
    *
    * Exactness: within-block doubled midranks 2r = 2·before+t+1 are
    * exact integers (the [[mannWhitney]] trick at block scope);
    * per-treatment doubled rank sums accumulate DECIMAL(38,0)
    * order-free; each R_j² term is UNROUNDED IEEE on those integers
    * summed by the ORDERED treatment fold (the [[kruskalWallis]]
    * discipline); the tie sum is exact DECIMAL(38,0); χ² is one IEEE
    * ladder rounded 6dp.
    *
    * Scale: one (block, treatment) shuffle for validity + one
    * (block, value) histogram shuffle; within-block windows are
    * k-BOUNDED frames (a valid block holds exactly k rows), never
    * corpus-bounded; treatments fold at k rows. */
  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
      valCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val obs = df
      .filter(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(blockCol).as("b"), col(treatmentCol).as("g"),
        col(valCol).cast("double").as("v"))
      .localCheckpoint()
    val kTot = obs.agg(countDistinct(col("g")).as("_k"))
    val perB = obs.groupBy(col("b"))
      .agg(count(lit(1)).as("_nb"), countDistinct(col("g")).as("_db"))
      .crossJoin(broadcast(kTot))
    val validB = perB.filter(col("_nb") === col("_k") &&
      col("_db") === col("_k")).select(col("b"))
    val dropped = perB.filter(!(col("_nb") === col("_k") &&
      col("_db") === col("_k")))
      .agg(count(lit(1)).as("n_dropped"))
    val v = obs.join(validB, Seq("b"), "left_semi")
    // within-block midranks over the ≤k distinct values
    val gh = v.groupBy(col("b"), col("v")).agg(count(lit(1)).as("t"))
    val wIn = W.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, -1)
    val ranked = gh.withColumn("bef",
      coalesce(sum(col("t")).over(wIn), lit(0L)))
      .withColumn("r2",
        (col("bef").cast(dec) * 2 + col("t") + 1).cast(dec))
    val rows = v.join(ranked.select(col("b"), col("v"), col("r2")),
      Seq("b", "v"))
    val perG = rows.groupBy(col("g"))
      .agg(sum(col("r2")).cast(dec).as("_r2s"))
    // ΣR_j² = Σ (r2s/2)² — unrounded IEEE on exact integers, summed by
    // the ordered treatment fold (k structs, never rows)
    val srr = perG
      .select(struct(col("g").as("g"),
        (col("_r2s").cast("double") * col("_r2s").cast("double")
          / 4.0).as("t")).as("gt"))
      .agg(aggregate(sort_array(collect_list(col("gt"))), lit(0.0),
        (acc, x) => acc + x.getField("t")).as("_srr"))
    val nB = validB.agg(count(lit(1)).as("n_blocks"))
    val ties = gh.agg(coalesce(sum(
      (col("t").cast(dec) * col("t") * col("t") - col("t")).cast(dec)),
      lit(0).cast(dec)).as("_tie3"))
    val out = nB.crossJoin(broadcast(dropped))
      .crossJoin(broadcast(kTot)).crossJoin(broadcast(srr))
      .crossJoin(broadcast(ties))
    val nD = col("n_blocks").cast("double")
    val kD = col("_k").cast("double")
    val uncorr = lit(12.0) * col("_srr") / (nD * kD * (kD + 1.0)) -
      lit(3.0) * nD * (kD + 1.0)
    val corr = lit(1.0) - col("_tie3").cast("double") /
      (nD * (kD * kD * kD - kD))
    val res = out.select(col("n_blocks"), col("n_dropped"),
      col("_k").as("k_treatments"),
      when(col("_k") >= 2 && col("n_blocks") > 0 && corr > 0,
        round(uncorr / corr, 6)).as("chi2"),
      when(col("_k") >= 1, (col("_k") - 1).cast("long")).as("dof"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(obs)
    res
  }

  /** Fleiss' kappa multi-rater agreement (SURVEY.md §2 R71) — the
    * k-RATER extension of [[cohensKappa]] and the real labeling-QA
    * standard: n raters label every item (crowd annotation, model
    * ensembles voting a category), and kappa measures agreement
    * beyond the chance the pooled category distribution guarantees.
    * Input is one row per RATING (item, category); items with a
    * rating count ≠ `ratersPerItem` DROP into n_dropped (Fleiss
    * requires a fixed panel size — the [[friedman]] contract). One
    * row: (n_items, n_dropped, n_raters, n_categories, p_bar, p_e,
    * kappa); honestly NULL when p_e = 1 (all ratings one category).
    *
    * Exactness: kappa clears EVERY fraction — with A = Σ_ij n_ij²,
    * B = Σ_j c_j², N items, n raters:
    * κ = [(A−Nn)·N²n² − B·Nn(n−1)] / [(N²n² − B)·Nn(n−1)] — both
    * sides exact DECIMAL(38,0) integers, ONE IEEE division rounded
    * 6dp (the [[cohensKappa]]/[[cochranQ]] discipline); p_bar/p_e
    * display-round 6dp from the same integers.
    *
    * Scale: one (item, category) cell shuffle, one per-item validity
    * pass that aggregates away, category totals at |C| rows. */
  def fleissKappa(df: DataFrame, itemCol: String, categoryCol: String,
      ratersPerItem: Int): DataFrame = {
    require(ratersPerItem >= 2, "ratersPerItem must be >= 2")
    val dec = "decimal(38,0)"
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("i"),
        col(categoryCol).cast("string").as("c"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val perI = cells.groupBy(col("i"))
      .agg(sum(col("m")).as("_ni"),
        sum((col("m").cast(dec) * col("m")).cast(dec)).cast(dec)
          .as("_sq"))
    val valid = perI.filter(col("_ni") === ratersPerItem)
    val dropped = perI.filter(col("_ni") =!= ratersPerItem)
      .agg(count(lit(1)).as("n_dropped"))
    val iAgg = valid.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("_sq")), lit(0).cast(dec)).cast(dec).as("_a"))
    val cAgg = cells.join(valid.select(col("i")), Seq("i"), "left_semi")
      .groupBy(col("c")).agg(sum(col("m")).as("_cj"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum((col("_cj").cast(dec) * col("_cj")).cast(dec)),
          lit(0).cast(dec)).cast(dec).as("_b"))
    val out = iAgg.crossJoin(broadcast(dropped))
      .crossJoin(broadcast(cAgg))
    val nI = col("n_items").cast(dec)
    val n = lit(ratersPerItem).cast(dec)
    val nn = (nI * n).cast(dec)
    // κ numerator/denominator as exact integers
    val num = ((col("_a") - nn) * nn * nn -
      col("_b") * nn * (n - 1)).cast(dec)
    val den = ((nn * nn - col("_b")) * nn * (n - 1)).cast(dec)
    val res = out.select(col("n_items"), col("n_dropped"),
      lit(ratersPerItem.toLong).as("n_raters"), col("n_categories"),
      when(col("n_items") > 0,
        round((col("_a") - nn).cast("double") /
          (nn * (n - 1)).cast("double"), 6)).as("p_bar"),
      when(col("n_items") > 0,
        round(col("_b").cast("double") /
          (nn * nn).cast("double"), 6)).as("p_e"),
      when(col("n_items") > 0 && den =!= lit(0).cast(dec),
        round(num.cast("double") / den.cast("double"), 6)).as("kappa"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(cells)
    res
  }

  /** Partial correlation of x and y CONTROLLING for z (SURVEY.md §2
    * R70) — the confounder-aware member of the correlation family:
    * [[corrMatrix]] reports raw pairwise r's, this one asks "does x
    * still track y once z's influence is removed" (the classic
    * spurious-correlation check before a feature is credited):
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). One row:
    * (n, r_xy, r_xz, r_yz, r_partial); honestly NULL when any input r
    * is undefined or a control correlation is ±1 (z explains
    * everything — the partial is 0/0).
    *
    * Exactness: the three r's come from [[corrMatrix]]'s OWN
    * listwise-deleted single-Aggregate frame (one implementation, its
    * exact-decimal-moment ladder already oracle-proven, and all three
    * share the same n by construction); the partial is ONE IEEE
    * expression on those agreed 6dp operands rounded 6dp.
    *
    * Scale: exactly [[corrMatrix]]'s one partial-agg'd pass — the
    * pivot runs over 3 rows. */
  def partialCorr(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    val m = corrMatrix(df, Seq(xCol, yCol, zCol))
    val agg = m.agg(
      max(col("n")).as("n"),
      max(when(col("col_x") === xCol && col("col_y") === yCol,
        col("corr"))).as("r_xy"),
      max(when(col("col_x") === xCol && col("col_y") === zCol,
        col("corr"))).as("r_xz"),
      max(when(col("col_x") === yCol && col("col_y") === zCol,
        col("corr"))).as("r_yz"))
    val denom = (lit(1.0) - col("r_xz") * col("r_xz")) *
      (lit(1.0) - col("r_yz") * col("r_yz"))
    agg.select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
      when(col("r_xy").isNotNull && col("r_xz").isNotNull &&
        col("r_yz").isNotNull && denom > 0,
        round((col("r_xy") - col("r_xz") * col("r_yz")) / sqrt(denom),
          6)).as("r_partial"))
  }

  /** Cramér's V effect size for a contingency table (SURVEY.md §2
    * R68) — the MAGNITUDE companion of [[chiSquare]]: χ² says whether
    * dependence exists (and grows with n even for trivial effects), V
    * = √(χ²/(n·(min(r,c)−1))) ∈ [0,1] says how STRONG it is —
    * comparable across tables and sample sizes, the number a feature-
    * relevance ranking actually sorts by. One row:
    * (n_total, n_a, n_b, chi2, dof, cramers_v); V honestly NULL when
    * either column is single-category (min−1 = 0) or the table is
    * empty.
    *
    * Exactness: chi2/dof come from [[chiSquare]]'s OWN frame (one
    * implementation — its 12dp-term/6dp ladder is already
    * oracle-proven); V is ONE IEEE expression (sqrt of a ratio of
    * agreed operands) rounded 6dp.
    *
    * Scale: [[chiSquare]]'s cell-grid cost plus one |A|·|B|-row
    * aggregate — nothing beyond the grid rule. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val tot = cells.agg(
      coalesce(sum(col("observed")), lit(0L)).as("n_total"),
      countDistinct(col(aCol)).as("n_a"),
      countDistinct(col(bCol)).as("n_b"))
    val stat = chiSquare(df, aCol, bCol)
      .select(col("chi2"), col("dof")).limit(1)
    val minDim = least(col("n_a"), col("n_b"))
    tot.crossJoin(broadcast(stat))
      .select(col("n_total"), col("n_a"), col("n_b"), col("chi2"),
        col("dof"),
        when(col("n_total") > 0 && minDim >= 2,
          round(sqrt(col("chi2") /
            (col("n_total").cast("double") * (minDim - 1))), 6))
          .as("cramers_v"))
  }

  /** Cronbach's alpha internal-consistency coefficient (SURVEY.md §2
    * R69) — the scale-reliability readout of the agreement family:
    * [[cohensKappa]] asks whether two raters agree, alpha asks
    * whether k ITEMS (rubric questions, quality sub-scores, ensemble
    * members) measure the same construct — the gate before averaging
    * them into one score. Complete blocks only (a block = one subject
    * scored on all k items; incomplete/duplicated blocks DROP into
    * `n_dropped`, the [[friedman]] contract). One row: (n_blocks,
    * n_dropped, k_items, alpha) with
    * α = k/(k−1)·(1 − Σ_j var_j / var_total), var over blocks
    * (sample, n−1), var_total over per-block sums.
    *
    * Exactness: values round 6dp and ride as SCALE-0 v·1e6 integers
    * (the [[anovaF]] trick); per-item and per-block-total moments are
    * exact DECIMAL(38,0); each variance numerator n·Σx²−(Σx)² is
    * UNROUNDED IEEE on those integers, the item sum folds in item
    * order (k structs); alpha is one ladder rounded 6dp — honest NULL
    * under k<2, n<2, or zero total variance.
    *
    * Scale: one (block, item) validity shuffle, one partial-agg'd
    * item-moment pass (k rows), one per-block total pass that
    * aggregates away. */
  def cronbachAlpha(df: DataFrame, blockCol: String, itemCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v6i = (round(col(valCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast(dec)
    val obs = df
      .filter(col(blockCol).isNotNull && col(itemCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(blockCol).as("b"), col(itemCol).as("g"),
        v6i.as("x"))
      .localCheckpoint()
    val kTot = obs.agg(countDistinct(col("g")).as("_k"))
    val perB = obs.groupBy(col("b"))
      .agg(count(lit(1)).as("_nb"), countDistinct(col("g")).as("_db"),
        sum(col("x")).cast(dec).as("_t"))
      .crossJoin(broadcast(kTot))
    val okB = col("_nb") === col("_k") && col("_db") === col("_k")
    val blocks = perB.filter(okB).select(col("b"), col("_t"))
      .localCheckpoint()
    val dropped = perB.filter(!okB)
      .agg(count(lit(1)).as("n_dropped"))
    val nB = blocks.agg(count(lit(1)).as("n_blocks"),
      coalesce(sum(col("_t")), lit(0).cast(dec)).as("_ts"),
      coalesce(sum((col("_t") * col("_t")).cast(dec)),
        lit(0).cast(dec)).as("_tq"))
    // per-item moments over valid blocks — variance numerators stay
    // unrounded IEEE on exact integers, summed by the item-order fold
    val items = obs.join(blocks.select(col("b")), Seq("b"), "left_semi")
      .groupBy(col("g"))
      .agg(sum(col("x")).cast(dec).as("_s"),
        sum((col("x") * col("x")).cast(dec)).cast(dec).as("_q"))
    val itemSums = items
      .select(struct(col("g").as("g"),
        col("_s").cast("double").as("s"),
        col("_q").cast("double").as("q")).as("gt"))
      .agg(
        aggregate(sort_array(collect_list(col("gt"))), lit(0.0),
          (acc, x) => acc + x.getField("q") * 1.0e-12).as("_sumq"),
        aggregate(sort_array(collect_list(col("gt"))), lit(0.0),
          (acc, x) => acc + (x.getField("s") * 1.0e-6) *
            (x.getField("s") * 1.0e-6)).as("_sumss"))
    val res0 = nB.crossJoin(broadcast(dropped))
      .crossJoin(broadcast(kTot)).crossJoin(broadcast(itemSums))
    val nD = col("n_blocks").cast("double")
    val kD = col("_k").cast("double")
    // Σ_j var_j = (n·Σ_jΣx² − Σ_j(Σx)²)/(n(n−1)) at the 1e-6 value
    // grain; var_total from the per-block totals at the same grain
    val sumVar = (nD * col("_sumq") - col("_sumss")) / (nD * (nD - 1.0))
    val varTot = (nD * (col("_tq").cast("double") * 1.0e-12) -
      (col("_ts").cast("double") * 1.0e-6) *
        (col("_ts").cast("double") * 1.0e-6)) / (nD * (nD - 1.0))
    val ok = col("_k") >= 2 && col("n_blocks") >= 2 && varTot > 0
    val res = res0.select(col("n_blocks"), col("n_dropped"),
      col("_k").as("k_items"),
      when(ok, round(kD / (kD - 1.0) * (lit(1.0) - sumVar / varTot), 6))
        .as("alpha"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(obs)
    org.apache.spark.sql.GraftShim.releaseCheckpoint(blocks)
    res
  }

  /** Cochran's Q test over a complete block design of BINARY outcomes
    * (SURVEY.md §2 R67) — the k-treatment extension of [[mcnemar]] and
    * the binary sibling of [[friedman]]: every block (user, document,
    * item) saw all k treatments (rule variants, model versions), each
    * outcome is pass/fail, and the test asks whether pass rates differ
    * across treatments. Blocks missing a treatment or holding
    * duplicates DROP into `n_dropped` (the [[friedman]] contract). One
    * row: (n_blocks, n_dropped, k_treatments, q_stat, dof). An outcome
    * is "pass" when `valCol` > 0.
    *
    * Exactness: Q clears every fraction —
    * (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²) with C_j the per-treatment
    * and R_i the per-block pass counts — so BOTH sides are exact
    * DECIMAL(38,0) integers and Q is ONE IEEE division rounded 6dp
    * (the [[cohensKappa]] discipline). Zero denominator (no
    * within-block variation anywhere) is honestly NULL.
    *
    * Scale: one (block, treatment) shuffle for validity, then two
    * partial-agg'd passes (per-block and per-treatment counts); the
    * treatment side is k rows, the block side aggregates away. */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val obs = df
      .filter(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(blockCol).as("b"), col(treatmentCol).as("g"),
        when(col(valCol).cast("double") > 0, 1L).otherwise(0L).as("x"))
      .localCheckpoint()
    val kTot = obs.agg(countDistinct(col("g")).as("_k"))
    val perB = obs.groupBy(col("b"))
      .agg(count(lit(1)).as("_nb"), countDistinct(col("g")).as("_db"),
        sum(col("x")).as("_r"))
      .crossJoin(broadcast(kTot))
    val okB = col("_nb") === col("_k") && col("_db") === col("_k")
    val blocks = perB.filter(okB)
    val dropped = perB.filter(!okB)
      .agg(count(lit(1)).as("n_dropped"))
    val bAgg = blocks.agg(count(lit(1)).as("n_blocks"),
      coalesce(sum(col("_r")), lit(0L)).as("_n"),
      coalesce(sum((col("_r").cast(dec) * col("_r")).cast(dec)),
        lit(0).cast(dec)).as("_rr"))
    val gAgg = obs.join(blocks.select(col("b")), Seq("b"), "left_semi")
      .groupBy(col("g")).agg(sum(col("x")).as("_c"))
      .agg(coalesce(sum((col("_c").cast(dec) * col("_c")).cast(dec)),
        lit(0).cast(dec)).as("_cc"))
    val out = bAgg.crossJoin(broadcast(dropped))
      .crossJoin(broadcast(kTot)).crossJoin(broadcast(gAgg))
    val k = col("_k").cast(dec)
    val n = col("_n").cast(dec)
    val num = ((k - 1) * (k * col("_cc") - n * n)).cast(dec)
    val den = (k * n - col("_rr")).cast(dec)
    val res = out.select(col("n_blocks"), col("n_dropped"),
      col("_k").as("k_treatments"),
      when(col("_k") >= 2 && col("n_blocks") > 0 &&
        den =!= lit(0).cast(dec),
        round(num.cast("double") / den.cast("double"), 6)).as("q_stat"),
      when(col("_k") >= 1, (col("_k") - 1).cast("long")).as("dof"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(obs)
    res
  }

  /** Lorenz/Gini concentration index of `valCol` per key (SURVEY.md §2
    * R64) — the inequality readout of a corpus: "how concentrated is
    * token volume across documents / sources / shards" (0 = perfectly
    * even, →1 = one row holds everything). NOT [[rocAuc]]'s
    * rank-comparison gini (2·AUC−1) — this is the Lorenz-curve area
    * over a non-negative measure. One row per key:
    * (key, n, total, gini) with G = (2·Σ i·x_(i))/(n·Σx) − (n+1)/n
    * over ascending-sorted values. Keys with any negative value emit
    * NULL gini (the Lorenz construction is undefined there — honest,
    * not clamped); zero-total keys NULL too.
    *
    * Exactness: values round 6dp and ride as SCALE-0 integers v·1e6
    * (the [[anovaF]] single-rounding trick); a run of t equal values
    * starting after `before` smaller ones contributes the EXACT
    * integer x·(t·before + t(t+1)/2) to Σi·x — tie-order-free by
    * construction; both sums are DECIMAL(38,0), G is one IEEE ladder
    * rounded 6dp.
    *
    * Scale: rows collapse to (key, distinct value) in ONE partial-agg'd
    * shuffle; cumulative-below is the keyed two-phase bucket scheme
    * ([[rocAuc]]'s) — no global sort, no unbounded per-key frame. */
  def giniConcentration(df: DataFrame, keyCol: String, valCol: String,
      nBuckets: Int = 1024, grain: Double = 0.0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val v = quantize(col(valCol).cast("double"), grain)
    val v6i = (round(v, 6).cast("decimal(18,6)") * 1000000).cast(dec)
    val hist = df
      .filter(col(keyCol).isNotNull && v.isNotNull)
      .groupBy(col(keyCol).as("k"), v6i.as("x"))
      .agg(count(lit(1)).as("t"))
    val rng = hist.groupBy(col("k"))
      .agg(min(col("x")).as("_lo"), max(col("x")).as("_hi"))
    val hb = hist.join(rng, Seq("k"))
      .withColumn("bkt", when(col("_lo") === col("_hi"), lit(1L))
        .otherwise(width_bucket(col("x").cast("double"),
          col("_lo").cast("double"), col("_hi").cast("double"),
          lit(nBuckets))))
      .drop("_lo", "_hi")
    val wOff = W.partitionBy(col("k")).orderBy(col("bkt"))
      .rowsBetween(W.unboundedPreceding, -1)
    val offs = hb.groupBy(col("k"), col("bkt"))
      .agg(sum(col("t")).as("bn"))
      .select(col("k"), col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off"))
    val wIn = W.partitionBy(col("k"), col("bkt")).orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, 0)
    val before = (col("off") + sum(col("t")).over(wIn) - col("t"))
      .cast(dec)
    val tC = col("t").cast(dec)
    // doubled Σi·x (2·t·before + t(t+1) is always an even-safe exact
    // integer — no decimal halving, the doubled-midrank discipline)
    val agg = hb.join(offs, Seq("k", "bkt"))
      .select(col("k"), col("x"), col("t"),
        (col("x") * (tC * before * 2 + tC * (tC + 1))).cast(dec)
          .as("_ix2"),
        (col("x") * tC).cast(dec).as("_sx"),
        when(col("x") < 0, 1L).otherwise(0L).as("_neg"))
      .groupBy(col("k"))
      .agg(sum(col("t")).as("n"),
        sum(col("_ix2")).cast(dec).as("_s12"),
        sum(col("_sx")).cast(dec).as("_s"),
        sum(col("_neg")).as("_nneg"))
    val nD = col("n").cast("double")
    val ok = col("_nneg") === 0 && col("_s").cast("double") > 0
    agg.select(col("k").as(keyCol), col("n"),
      round(col("_s").cast("double") / 1.0e6, 6).as("total"),
      when(ok, round(
        col("_s12").cast("double") /
          (nD * col("_s").cast("double")) - (nD + 1.0) / nD, 6))
        .as("gini"))
  }

  /** Two-sided normal p-value from an (already-rounded) z statistic —
    * the bridge between this file's z-emitting tests ([[mannKendall]],
    * [[mannWhitney]], [[wilcoxonSignedRank]]) and [[bhFdr]]'s
    * multiple-testing correction, which needs p's, not z's. Uses the
    * classic Abramowitz–Stegun 26.2.17 rational approximation
    * (|error| < 7.5e-8 — beyond the 6dp emission grain), public
    * formula. The ONE transcendental (exp) rounds 12dp FIRST (the
    * [[graft.operators.Graph.linkPredict]] ln discipline — libm's
    * last ulp is not cross-engine agreed), then a fixed-form Horner
    * polynomial on agreed operands; result rounds 6dp. */
  def twoSidedNormalP(z: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val pdf = round(exp(lit(-0.5) * az * az), 12) /
      lit(2.5066282746310002) // √(2π) to double precision
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    when(z.isNotNull, round(lit(2.0) * pdf * poly, 6))
  }

  /** Benjamini–Hochberg FDR correction (SURVEY.md §2 R63) — the step
    * a user runs AFTER fanning any of this file's tests across many
    * slices ("which of these 500 segments' trends survive multiple
    * testing"): controls the expected fraction of false discoveries
    * at `alpha` instead of Bonferroni's family-wise over-kill. One
    * row per hypothesis: (id, p_value, rank, adj_p, reject) with
    * adj_p = min_{j≥i}(m·p_j/j) capped at 1 (the standard step-up
    * monotonization) and reject = adj_p ≤ alpha. NULL p's are
    * excluded and don't consume rank slots (an untested hypothesis is
    * not evidence).
    *
    * Exactness: ranks are exact integers under the deterministic
    * (p, id) order; each raw term m·p/i is UNROUNDED fixed-form IEEE
    * (the running min must compare exact doubles — rounding first
    * could flip a near-tie differently per engine); only the final
    * capped adj_p rounds 6dp, and the verdict compares the ROUNDED
    * value.
    *
    * Scale: the frame is ONE HYPOTHESIS PER ROW — bounded by the
    * experiment design (hundreds to thousands), never by the corpus
    * the tests ran over; the two global windows (rank, reverse
    * running-min) run over those m rows only, the same bounded-frame
    * contract as the bucket-offset windows. */
  def bhFdr(df: DataFrame, idCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = df.filter(col(pCol).isNotNull)
      .select(col(idCol), col(pCol).cast("double").as("p_value"))
    val m = base.agg(count(lit(1)).as("_m"))
    val wRank = W.orderBy(col("p_value"), col(idCol))
    val wMin = W.orderBy(col("p_value").desc, col(idCol).desc)
      .rowsBetween(W.unboundedPreceding, 0)
    val raw = (col("_m").cast("double") * col("p_value")) / col("rank")
    val adj = round(least(min(raw).over(wMin), lit(1.0)), 6)
    base.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("adj_p", adj)
      .select(col(idCol), col("p_value"), col("rank"), col("adj_p"),
        (col("adj_p") <= alpha).as("reject"))
  }

  /** Average precision per query (SURVEY.md §2 P27c) — the
    * area-under-the-PR-curve companion of [[retrievalEval]]'s point
    * metrics and the per-query term of MAP: AP = (1/n_rel)·Σ over
    * relevant positions i of precision@i, under the deterministic
    * (score DESC, doc ASC) order every retrieval metric here shares.
    * One row per query: (query, n_docs, n_rel, ap); ap is honestly
    * NULL when the query has no relevant docs (undefined, not 0). A
    * doc is relevant iff `relCol` > 0.
    *
    * Exactness: each precision@i is an integer ratio rounded 12dp
    * (term magnitude ≤ 1) into a DECIMAL(38,12) order-free sum — the
    * [[ndcgAtK]] term discipline; ap is ONE IEEE division of that
    * decimal by n_rel rounded 6dp.
    *
    * Scale: ONE window shuffle on the high-cardinality query key over
    * the k-proportional candidate frame (both running columns share a
    * single WindowExec), then a partial-agg'd per-query aggregate —
    * input is candidates, never the corpus. */
  def averagePrecision(ranked: DataFrame, queryCol: String,
      docCol: String, scoreCol: String, relCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wS = W.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
      .rowsBetween(W.unboundedPreceding, 0)
    val rel = col(relCol).cast("double") > 0
    val ri = when(rel, 1L).otherwise(0L)
    ranked
      .withColumn("_rs", count(lit(1)).over(wS))
      .withColumn("_cr", sum(ri).over(wS))
      .withColumn("_term", when(rel,
        round(col("_cr").cast("double") / col("_rs"), 12)
          .cast("decimal(38,12)")))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(ri).as("n_rel"),
        coalesce(sum(col("_term")), lit(0).cast("decimal(38,12)"))
          .as("_s"))
      .select(col(queryCol), col("n_docs"), col("n_rel"),
        when(col("n_rel") > 0,
          round(col("_s").cast("double") / col("n_rel"), 6)).as("ap"))
  }

  /** Reliability (calibration) bins of a probabilistic classifier per
    * key (SURVEY.md §2 P30) — the companion diagnostic to [[rocAuc]]:
    * AUC says the scores RANK well, this one says whether score 0.8
    * actually means 80% positive. Scores bin into `nBins` equal-width
    * cells of [0,1] (out-of-range scores clamp into the edge bins —
    * documented, not dropped: a miscalibrated model emitting 1.03 is
    * exactly what this monitor must surface); per (key, bin):
    * (n, n_pos, mean_score, frac_pos, gap).
    *
    * Exactness: scores round 6dp and accumulate as DECIMAL(38,6)
    * (order-free); mean_score/frac_pos are ONE IEEE division each
    * rounded 6dp; gap = \|mean−frac\| is one expression on those
    * agreed rounded operands, 6dp.
    *
    * Scale: ONE partial-agg'd (key, bin) shuffle — the output is
    * keys×nBins rows, never the corpus. */
  def reliabilityBins(df: DataFrame, keyCol: String, labelCol: String,
      scoreCol: String, nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val s = col(scoreCol).cast("double")
    val s6 = round(s, 6).cast("decimal(18,6)")
    val pos = col(labelCol).cast("double") > 0
    val bin = least(greatest(
      width_bucket(s, lit(0.0), lit(1.0), lit(nBins)), lit(1L)),
      lit(nBins.toLong))
    val perBin = df
      .filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(col(keyCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
        sum(s6).cast("decimal(38,6)").as("_ss"))
    val mean = round(col("_ss").cast("double") / col("n"), 6)
    val frac = round(col("n_pos").cast("double") / col("n"), 6)
    perBin.select(col(keyCol), col("bin"), col("n"), col("n_pos"),
      mean.as("mean_score"), frac.as("frac_pos"),
      round(abs(mean - frac), 6).as("gap"))
  }

  /** Per-key calibration summary (SURVEY.md §2 P30): Brier score +
    * expected calibration error over [[reliabilityBins]]'s cells —
    * the one-row-per-segment readout a pipeline gates on ("the quality
    * model is 0.04 ECE on src3, trust its 0.9 threshold").
    *
    * Exactness: brier's (s−y)² terms are EXACT DECIMAL(38,12) squares
    * of the 6dp score grain (y ∈ {0,1}), order-free summed, ONE
    * division rounded 6dp; ece clears its inner division — Σ_b
    * n_b·|mean_b − frac_b| with the bin means/fracs re-cast to exact
    * DECIMAL(18,6) after their agreed 6dp round, so the numerator is
    * an exact DECIMAL(38,6) and ece is ONE division rounded 6dp.
    *
    * Scale: the [[reliabilityBins]] shuffle plus one raw partial-agg'd
    * key pass — two corpus passes, keys×nBins intermediate rows. */
  def calibration(df: DataFrame, keyCol: String, labelCol: String,
      scoreCol: String, nBins: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("double")
    val s6 = round(s, 6).cast("decimal(18,6)")
    val pos = col(labelCol).cast("double") > 0
    val y = when(pos, lit(1).cast("decimal(18,6)"))
      .otherwise(lit(0).cast("decimal(18,6)"))
    val sqErr = ((s6 - y) * (s6 - y)).cast("decimal(38,12)")
    val perKey = df
      .filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
        sum(sqErr).cast("decimal(38,12)").as("_se"))
    val bins = reliabilityBins(df, keyCol, labelCol, scoreCol, nBins)
      .select(col(keyCol), col("n").as("_bn"),
        (col("mean_score").cast("decimal(18,6)") -
          col("frac_pos").cast("decimal(18,6)")).as("_d"))
      .groupBy(col(keyCol))
      .agg(sum((col("_bn").cast("decimal(18,0)") * abs(col("_d")))
        .cast("decimal(38,6)")).cast("decimal(38,6)").as("_en"))
    perKey.join(bins, Seq(keyCol))
      .select(col(keyCol), col("n"), col("n_pos"),
        round(col("_se").cast("double") / col("n"), 6).as("brier"),
        round(col("_en").cast("double") / col("n"), 6).as("ece"))
  }

  /** Per-key ROC-AUC (+ Gini) of a binary classifier's scores — the
    * quality gate every learned data-pipeline filter (quality model,
    * toxicity model, langid confidence) needs per segment before its
    * threshold is trusted: (key, n_pos, n_neg, auc, gini). A row is
    * positive when `labelCol` > 0; `auc` is the exact
    * tie-aware probability P(score_pos > score_neg) + ½P(=) computed
    * by rank-sum — never a sampled estimate. Keys where either class
    * is empty report NULL auc (undefined, not 0.5 — reference
    * semantics: hdk surfaces NULL for undefined aggregates, e.g.
    * omniscidb RelAlgTranslator null-propagating agg lowering).
    *
    * Exactness: the doubled concordance count 2·Σ_v n_pos(v)·(below(v)
    * + ½·n_neg(v)) is an INTEGER accumulated in DECIMAL(38,0) —
    * order-free, tie terms exact; auc/gini are ONE agreed IEEE
    * division of that integer by 2·n_pos·n_neg, rounded 6dp (§6
    * ladder).
    *
    * Scale: the score histogram collapses rows to (key, distinct
    * score) in ONE partial-agg'd shuffle; cumulative-below is the
    * two-phase bucketed scheme ([[mannWhitney]]'s rankedHistogram,
    * keyed): per-key bucket offsets via a ≤`nBuckets`-row window per
    * key, then in-bucket cumulative windows partitioned by
    * (key, bucket) — no global sort, no unbounded per-key frame. */
  def rocAuc(df: DataFrame, keyCol: String, labelCol: String,
      scoreCol: String, nBuckets: Int = 1024,
      grain: Double = 0.0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val v = quantize(col(scoreCol).cast("double"), grain)
    val pos = col(labelCol).cast("double") > 0
    val hist = df
      .filter(v.isNotNull && col(labelCol).isNotNull)
      .groupBy(col(keyCol).as("k"), v.as("v"))
      .agg(sum(when(pos, 1L).otherwise(0L)).as("np"),
        sum(when(!pos, 1L).otherwise(0L)).as("nn"))
    val rng = hist.groupBy(col("k"))
      .agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"))
    val hb = hist.join(rng, Seq("k"))
      .withColumn("bkt", when(col("_lo") === col("_hi"), lit(1L))
        .otherwise(width_bucket(col("v"), col("_lo"), col("_hi"),
          lit(nBuckets))))
      .drop("_lo", "_hi")
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = hb.groupBy(col("k"), col("bkt"))
      .agg(sum(col("nn")).as("bn"))
      .select(col("k"), col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off_n"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("bkt")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dec = "decimal(38,0)"
    val below = (col("off_n") + sum(col("nn")).over(wIn) - col("nn"))
      .cast(dec)
    val agg = hb.join(offs, Seq("k", "bkt"))
      .select(col("k"), col("np"), col("nn"), below.as("below"))
      .groupBy(col("k"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np").cast(dec) * (col("below") * 2 + col("nn")))
          .as("_num2"))
    val defined = col("n_pos") > 0 && col("n_neg") > 0
    val num = col("_num2").cast("double")
    agg.select(col("k").as(keyCol), col("n_pos"), col("n_neg"),
      when(defined, round(num /
        (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"),
      when(defined, round(num /
        (lit(1.0) * col("n_pos") * col("n_neg")) - 1.0, 6)).as("gini"))
  }

  /** Brown–Forsythe variance-homogeneity test of `valCol` across ALL
    * levels of `groupCol` (SURVEY.md §2 R58; Levene's test with median
    * centers — the robust standard) — the GATEKEEPER run before
    * trusting [[anovaF]]'s equal-variance assumption or choosing
    * [[welchTTest]] over the pooled t: it asks whether the groups'
    * SPREADS differ, by running one-way ANOVA on each observation's
    * absolute deviation from its group MEDIAN (medians, not means, so
    * heavy tails don't fake a variance difference). Output is
    * [[anovaF]]'s frame over the deviations — a significant F says
    * "spreads differ"; a pure location shift scores ss_between = 0.
    *
    * Exactness: group medians use the engine-aligned exact
    * `percentile` ≡ quantile_cont pair rounded 6dp (the
    * [[graft.operators.Quality.winsorize]] idiom); deviations are one
    * agreed IEEE subtraction of 6dp-grain doubles; everything after is
    * [[anovaF]]'s exact-moment contract.
    *
    * Scale: one per-group exact-percentile aggregate (the honest sort
    * cost of exact medians — [[Quality.winsorize]]'s note applies) +
    * a group-keyed join + the [[anovaF]] single shuffle. */
  def brownForsythe(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol).as("_bf_g"), col(valCol).cast("double").as("_bf_v"))
    val med = base.groupBy(col("_bf_g"))
      .agg(round(expr("percentile(_bf_v, 0.5)"), 6).as("_bf_med"))
    val dev = base.join(med, Seq("_bf_g"))
      .select(col("_bf_g").as("g"),
        abs(round(col("_bf_v"), 6) - col("_bf_med")).as("adev"))
    anovaF(dev, "g", "adev")
  }

  /** Welch's two-sample t-test (unequal variances) of `valCol` between
    * the `gA` and `gB` levels of `groupCol`. One row: group sizes,
    * 6dp means and sample variances, the 4dp t statistic and 4dp
    * Welch–Satterthwaite degrees of freedom. NULL t/dof when either
    * group has < 2 observations or both variances are zero — honest,
    * not a fabricated verdict.
    *
    * Scale: ONE aggregate over ONE scan — both groups' moments ride as
    * conditional aggregates in the same partial-agg'd pass (the
    * Quality.audit fold idiom); nothing shuffles but the 1-row result.
    * t and dof are IEEE arithmetic on the 6dp-ROUNDED moments (the q19
    * stddev discipline), so the verdict is engine-exact. */
  def welchTTest(df: DataFrame, groupCol: String, gA: String, gB: String,
      valCol: String): DataFrame = {
    val inA = col(groupCol) === gA
    val inB = col(groupCol) === gB
    val v = col(valCol).cast("double")
    val agg = df.agg(
      count(when(inA, 1)).as("n_a"),
      count(when(inB, 1)).as("n_b"),
      round(avg(when(inA, v)), 6).as("mean_a"),
      round(avg(when(inB, v)), 6).as("mean_b"),
      round(var_samp(when(inA, v)), 6).as("var_a"),
      round(var_samp(when(inB, v)), 6).as("var_b"))
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    agg
      .withColumn("t_stat",
        when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
          round((col("mean_a") - col("mean_b")) / sqrt(sa + sb), 4)))
      .withColumn("dof",
        when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
          round(pow(sa + sb, 2) /
            (pow(sa, 2) / (col("n_a") - 1) +
              pow(sb, 2) / (col("n_b") - 1)), 4)))
  }

  /** The QUANTIZE-TO-GRAIN contract as CODE (r12; previously a §2
    * caveat): the histogram statistics family ([[rocAuc]], [[ksTest]],
    * [[mannWhitney]], [[mannWhitneyByKey]], [[giniConcentration]])
    * collapses rows to DISTINCT values, so a continuous double domain
    * (|V| ≈ n) degenerates their sub-linear regime to linear. A
    * classifier score or measured value always HAS a real measurement
    * grain (the model emits float32 probabilities meaningful to ~3-4
    * digits; a price has cents); `grain > 0` rounds the value to that
    * grain (v → round(v/grain)·grain) BEFORE the histogram, making the
    * sub-linear regime a parameter instead of a caveat. `grain <= 0`
    * (default) keeps today's exact distinct-value behavior bit-for-bit.
    * The statistic is then the exact statistic OF THE QUANTIZED scores
    * — identical to the caller pre-rounding the column (spec-asserted),
    * honest about what a grain means rather than a hidden approximation
    * of the raw-score statistic. Quantized legs are scale legs: keep
    * oracled keys at grain 0 (a /-then-· double roundtrip is engine-
    * deterministic per run but not a cross-engine agreed grid). */
  private def quantize(v: org.apache.spark.sql.Column, grain: Double)
      : org.apache.spark.sql.Column =
    if (grain <= 0.0) v else round(v / lit(grain), 0) * lit(grain)

  /** Shared exact-rank machinery for the two rank tests ([[ksTest]],
    * [[mannWhitney]]): per DISTINCT value of `valCol`, the two groups'
    * counts and INCLUSIVE cumulative counts in value order — computed
    * WITHOUT a global sort or a corpus-sized single-partition window.
    * Two-phase prefix sum (the [[graft.pipeline.Packing.selectByBudget]]
    * decomposition): the value histogram buckets by `width_bucket`
    * into ≤ nBuckets+2 ORDER-ALIGNED coarse buckets, per-bucket totals
    * get a (bucket-bounded) cumulative offset, and within-bucket
    * running sums add to the broadcast offsets — exact global ranks,
    * every window either bucket-bounded or partitioned by bucket.
    * Returns (v, n_a, n_b, cum_a, cum_b) — all exact longs. */
  private def rankedHistogram(df: DataFrame, groupCol: String, gA: String,
      gB: String, valCol: String, nBuckets: Int,
      grain: Double = 0.0): DataFrame = {
    val v = quantize(col(valCol).cast("double"), grain)
    val hist = df
      .filter((col(groupCol) === gA || col(groupCol) === gB) && v.isNotNull)
      .groupBy(v.as("v"))
      .agg(
        sum(when(col(groupCol) === gA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(groupCol) === gB, 1L).otherwise(0L)).as("n_b"))
      .persist()
    val rng = hist.agg(min(col("v")), max(col("v"))).head()
    val bkt =
      if (rng.isNullAt(0) || rng.getDouble(0) == rng.getDouble(1)) lit(1L)
      else width_bucket(col("v"), lit(rng.getDouble(0)),
        lit(rng.getDouble(1)), lit(nBuckets))
    val hb = hist.withColumn("bkt", bkt)
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = hb.groupBy("bkt")
      .agg(sum(col("n_a")).as("ba"), sum(col("n_b")).as("bb"))
      .select(col("bkt"),
        coalesce(sum(col("ba")).over(wOff), lit(0L)).as("off_a"),
        coalesce(sum(col("bb")).over(wOff), lit(0L)).as("off_b"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = hb.join(broadcast(offs), Seq("bkt"))
      .select(col("v"), col("n_a"), col("n_b"),
        (col("off_a") + sum(col("n_a")).over(wIn)).as("cum_a"),
        (col("off_b") + sum(col("n_b")).over(wIn)).as("cum_b"))
      .localCheckpoint()
    hist.unpersist()
    out
  }

  /** Two-sample Kolmogorov–Smirnov test of `valCol` between the `gA`
    * and `gB` levels of `groupCol` (SURVEY.md §2 R38) — the
    * DISTRIBUTION-shape member of the testing family: χ² compares
    * categories, Welch compares means, this one asks whether the two
    * samples' whole ECDFs differ. One row: group sizes, the 6dp D
    * statistic, the 4dp scaled statistic c = D·√(n_a·n_b/(n_a+n_b)),
    * and the α=0.05 verdict (c > 1.358, the asymptotic two-sample
    * critical value). NULL statistics when either group is empty.
    *
    * Exactness: D's maximization runs over INTEGER cross-products —
    * max |cum_a·n_b − cum_b·n_a| as DECIMAL(38,0), divided by n_a·n_b
    * once at the end (6dp) — so no float ECDF subtraction can wobble
    * the argmax across engines.
    *
    * Scale: one histogram shuffle at distinct-value cardinality, then
    * the [[rankedHistogram]] two-phase prefix sum (no global sort, no
    * unbounded global window), one max aggregate. */
  def ksTest(df: DataFrame, groupCol: String, gA: String, gB: String,
      valCol: String, nBuckets: Int = 1024,
      grain: Double = 0.0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val rh = rankedHistogram(df, groupCol, gA, gB, valCol, nBuckets, grain)
    val dec = "decimal(38,0)"
    val totals = rh.agg(
      coalesce(sum(col("n_a")), lit(0L)).as("_ta"),
      coalesce(sum(col("n_b")), lit(0L)).as("_tb"))
    // the cross-product trick needs GROUP TOTALS per row, not the
    // per-value histogram counts — broadcast the 1-row totals in
    val dnum = rh.crossJoin(broadcast(totals))
      .agg(max(abs(col("cum_a").cast(dec) * col("_tb").cast(dec)
        - col("cum_b").cast(dec) * col("_ta").cast(dec))).as("_dnum"))
    totals.crossJoin(dnum)
      .select(col("_ta").as("n_a"), col("_tb").as("n_b"), col("_dnum"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("_dnum").cast("double")
            / (col("n_a").cast("double") * col("n_b")), 6)).as("d_stat"))
      .withColumn("c_stat",
        when(col("d_stat").isNotNull,
          round(col("d_stat") * sqrt(col("n_a").cast("double") * col("n_b")
            / (col("n_a") + col("n_b"))), 4)))
      .withColumn("reject_05",
        when(col("c_stat").isNotNull, col("c_stat") > 1.358))
  }

  /** Mann–Whitney U test (Wilcoxon rank-sum) of `valCol` between the
    * `gA` and `gB` levels of `groupCol` (SURVEY.md §2 R39) — the
    * nonparametric companion of [[welchTTest]]: compares RANKS, so
    * outliers and non-normality don't poison the verdict. One row:
    * group sizes, U (gA's statistic, exact to the tie-midrank 0.5
    * grain), the 4dp normal-approximation z WITH tie correction, and
    * the α=0.05 verdict. NULL z when either group is empty or the
    * tie-corrected variance is zero (all values identical).
    *
    * Exactness: midranks never materialize as floats — the doubled
    * rank sum 2·ΣR_a = Σ_v n_a(v)·(2·before(v) + t(v) + 1) is exact
    * integer arithmetic over the histogram (before = items strictly
    * less, t = tied count), as is the tie term Σ(t³−t); z is IEEE
    * arithmetic on those exact integers, rounded 4dp.
    *
    * Scale: identical to [[ksTest]] — histogram + two-phase prefix
    * sum, one final aggregate. */
  def mannWhitney(df: DataFrame, groupCol: String, gA: String, gB: String,
      valCol: String, nBuckets: Int = 1024,
      grain: Double = 0.0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val rh = rankedHistogram(df, groupCol, gA, gB, valCol, nBuckets, grain)
    val dec = "decimal(38,0)"
    val t = (col("n_a") + col("n_b")).cast(dec)
    val before = (col("cum_a") + col("cum_b")).cast(dec) - t
    val agg = rh.agg(
      coalesce(sum(col("n_a")), lit(0L)).as("n_a"),
      coalesce(sum(col("n_b")), lit(0L)).as("n_b"),
      coalesce(sum(col("n_a").cast(dec) * (before * 2 + t + 1)),
        lit(0L).cast(dec)).as("_r2a"),
      coalesce(sum(t * t * t - t), lit(0L).cast(dec)).as("_ties"))
    val n = col("n_a") + col("n_b")
    val u2 = col("_r2a") - (col("n_a").cast(dec) * (col("n_a") + 1))
    val mu2 = col("n_a").cast(dec) * col("n_b")
    val varU = col("n_a").cast("double") * col("n_b") / 12.0 *
      ((n + 1).cast("double") -
        col("_ties").cast("double") / (n.cast("double") * (n - 1)))
    agg
      .withColumn("u_stat",
        when(col("n_a") > 0 && col("n_b") > 0,
          u2.cast("double") / 2.0))
      .withColumn("z_stat",
        when(col("n_a") > 0 && col("n_b") > 0 && n > 1 && varU > 0,
          round((u2 - mu2).cast("double") / 2.0 / sqrt(varU), 4)))
      .withColumn("reject_05",
        when(col("z_stat").isNotNull, abs(col("z_stat")) > 1.96))
      .select(col("n_a"), col("n_b"), col("u_stat"), col("z_stat"),
        col("reject_05"))
  }

  /** Per-key Mann–Whitney U (SURVEY.md §2 R72) — [[mannWhitney]]
    * fanned across segments: one (n_a, n_b, u_stat, z_stat,
    * reject_05) row PER KEY, the shape a slice-wise A/B readout
    * produces and [[bhFdr]] exists to correct ("which of these 500
    * segments' shifts survive multiple testing" — compose with
    * [[twoSidedNormalP]] on the emitted z). Same semantics, tie
    * handling, and rounding ladder as the global operator.
    *
    * Exactness: the doubled rank sum and tie term are exact
    * DECIMAL(38,0) integers per key (the [[mannWhitney]] ladder
    * verbatim); z one IEEE expression rounded 4dp; single-class or
    * zero-variance keys honest NULLs.
    *
    * Scale: rows collapse to (key, distinct value) in ONE partial-
    * agg'd shuffle; cumulative-below is the keyed two-phase bucket
    * scheme ([[rocAuc]]'s) — no global sort, no unbounded per-key
    * frame. */
  def mannWhitneyByKey(df: DataFrame, keyCol: String, groupCol: String,
      gA: String, gB: String, valCol: String,
      nBuckets: Int = 1024, grain: Double = 0.0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val v = quantize(col(valCol).cast("double"), grain)
    val hist = df
      .filter(col(keyCol).isNotNull && v.isNotNull &&
        col(groupCol).isin(gA, gB))
      .groupBy(col(keyCol).as("k"), v.as("v"))
      .agg(sum(when(col(groupCol) === gA, 1L).otherwise(0L)).as("na"),
        sum(when(col(groupCol) === gB, 1L).otherwise(0L)).as("nb"))
    val rng = hist.groupBy(col("k"))
      .agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"))
    val hb = hist.join(rng, Seq("k"))
      .withColumn("bkt", when(col("_lo") === col("_hi"), lit(1L))
        .otherwise(width_bucket(col("v"), col("_lo"), col("_hi"),
          lit(nBuckets))))
      .drop("_lo", "_hi")
    val wOff = W.partitionBy(col("k")).orderBy(col("bkt"))
      .rowsBetween(W.unboundedPreceding, -1)
    val offs = hb.groupBy(col("k"), col("bkt"))
      .agg(sum(col("na") + col("nb")).as("bt"))
      .select(col("k"), col("bkt"),
        coalesce(sum(col("bt")).over(wOff), lit(0L)).as("off"))
    val wIn = W.partitionBy(col("k"), col("bkt")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, 0)
    val t = (col("na") + col("nb")).cast(dec)
    val before = (col("off") +
      sum(col("na") + col("nb")).over(wIn)).cast(dec) - t
    val agg = hb.join(offs, Seq("k", "bkt"))
      .select(col("k"), col("na"), col("nb"),
        (col("na").cast(dec) * (before * 2 + t + 1)).cast(dec)
          .as("_r2t"),
        (t * t * t - t).cast(dec).as("_t3"))
      .groupBy(col("k"))
      .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
        coalesce(sum(col("_r2t")), lit(0L).cast(dec)).as("_r2a"),
        coalesce(sum(col("_t3")), lit(0L).cast(dec)).as("_ties"))
    val n = col("n_a") + col("n_b")
    val u2 = col("_r2a") - (col("n_a").cast(dec) * (col("n_a") + 1))
    val mu2 = col("n_a").cast(dec) * col("n_b")
    val varU = col("n_a").cast("double") * col("n_b") / 12.0 *
      ((n + 1).cast("double") -
        col("_ties").cast("double") / (n.cast("double") * (n - 1)))
    agg
      .withColumn("u_stat",
        when(col("n_a") > 0 && col("n_b") > 0,
          u2.cast("double") / 2.0))
      .withColumn("z_stat",
        when(col("n_a") > 0 && col("n_b") > 0 && n > 1 && varU > 0,
          round((u2 - mu2).cast("double") / 2.0 / sqrt(varU), 4)))
      .withColumn("reject_05",
        when(col("z_stat").isNotNull, abs(col("z_stat")) > 1.96))
      .select(col("k").as(keyCol), col("n_a"), col("n_b"),
        col("u_stat"), col("z_stat"), col("reject_05"))
  }

  /** Doubled-midrank map of a single value column: (v, r2) with
    * r2 = 2·before(v) + t(v) + 1 — an exact INTEGER for every value,
    * ties included (midrank ·2). Same two-phase bucket prefix-sum as
    * [[rankedHistogram]]; distinct-value cardinality output. */
  /** Wilcoxon signed-rank test over PAIRED observations — the "did
    * the treatment move each subject" twin of [[mannWhitney]]'s
    * independent-samples U (the before/after experiment readout, e.g.
    * per-document quality score before vs after a cleaning pass).
    * One row: (n_pairs, n_zero, w_plus, z_stat, reject_05). The
    * difference is ONE agreed IEEE subtraction `xCol − yCol` (cast
    * double); zero differences drop per the classic Wilcoxon
    * procedure and are reported as `n_zero`, |d| gets midranks, and
    * W+ sums the ranks of positive differences. z uses the
    * normal approximation with the exact tie correction
    * Σ(t³−t)/48.
    *
    * Exactness: 2·W+ and the tie sum are INTEGERS accumulated in
    * DECIMAL(38,0) (doubled-midrank trick, order-free); z is built
    * from those integers in one agreed IEEE expression and rounded
    * 4dp, w_plus is the exact halved integer.
    *
    * Scale: one partial-agg'd shuffle to the distinct-|d| histogram,
    * then the same two-phase bucketed cumulative as [[mannWhitney]]
    * (≤`nBuckets` offset rows broadcast, in-bucket windows) — no
    * global sort of the data. */
  def wilcoxonSignedRank(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val d = col(xCol).cast("double") - col(yCol).cast("double")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(d.as("d"))
    val nZero = base.filter(col("d") === 0.0)
      .agg(count(lit(1))).head().getLong(0)
    val hist = base.filter(col("d") =!= 0.0)
      .groupBy(abs(col("d")).as("v"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("np"))
      .persist()
    val rng = hist.agg(min(col("v")), max(col("v"))).head()
    val bkt =
      if (rng.isNullAt(0) || rng.getDouble(0) == rng.getDouble(1)) lit(1L)
      else width_bucket(col("v"), lit(rng.getDouble(0)),
        lit(rng.getDouble(1)), lit(nBuckets))
    val hb = hist.withColumn("bkt", bkt)
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = hb.groupBy("bkt").agg(sum(col("n")).as("bn"))
      .select(col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dec = "decimal(38,0)"
    val r2 = (lit(2) * (col("off") + sum(col("n")).over(wIn) - col("n"))
      + col("n") + 1).cast(dec)
    val nC = col("n").cast(dec)
    val agg = hb.join(broadcast(offs), Seq("bkt"))
      .select(col("n"), col("np"), r2.as("r2"), (nC * nC * nC - nC).as("t3"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_pairs"),
        coalesce(sum(col("np").cast(dec) * col("r2")),
          lit(0L).cast(dec)).as("_w2"),
        coalesce(sum(col("t3")), lit(0L).cast(dec)).as("_ties"))
    hist.unpersist()
    val n = col("n_pairs").cast(dec)
    val varW = col("n_pairs").cast("double") * (col("n_pairs") + 1) *
      (lit(2) * col("n_pairs") + 1) / 24.0 -
      col("_ties").cast("double") / 48.0
    agg
      .withColumn("n_zero", lit(nZero))
      .withColumn("w_plus",
        when(col("n_pairs") > 0, col("_w2").cast("double") / 2.0))
      .withColumn("z_stat",
        when(col("n_pairs") > 0 && varW > 0,
          round((col("_w2") * 2 - n * (n + 1)).cast("double") /
            (lit(4.0) * sqrt(varW)), 4)))
      .withColumn("reject_05",
        when(col("z_stat").isNotNull, abs(col("z_stat")) > 1.96))
      .select(col("n_pairs"), col("n_zero"), col("w_plus"),
        col("z_stat"), col("reject_05"))
  }

  private def rankMap(vals: DataFrame, nBuckets: Int): DataFrame = {
    val hist = vals.groupBy(col("v")).agg(count(lit(1)).as("n")).persist()
    val rng = hist.agg(min(col("v")), max(col("v"))).head()
    val bkt =
      if (rng.isNullAt(0) || rng.getDouble(0) == rng.getDouble(1)) lit(1L)
      else width_bucket(col("v"), lit(rng.getDouble(0)),
        lit(rng.getDouble(1)), lit(nBuckets))
    val hb = hist.withColumn("bkt", bkt)
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = hb.groupBy("bkt").agg(sum(col("n")).as("bn"))
      .select(col("bkt"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = hb.join(broadcast(offs), Seq("bkt"))
      .select(col("v"),
        // before = off + (in-bucket cum − n); r2 = 2·before + n + 1
        (lit(2) * (col("off") + sum(col("n")).over(wIn) - col("n"))
          + col("n") + 1).as("r2"))
      .localCheckpoint()
    hist.unpersist()
    out
  }

  /** Spearman rank correlation between two numeric columns (SURVEY.md
    * §2 A13) — the tie-aware, outlier-proof complement of A9's Pearson
    * `corr`. Rows with a NULL in either column are out of scope. One
    * row: (n, rho) with rho 6dp, NULL when n < 2 or either column is
    * constant (zero rank variance).
    *
    * Exactness (the cross-engine problem Pearson-on-doubles has):
    * ranks are DOUBLED midranks — exact integers even under ties — and
    * every moment (Σr, Σr², Σrxry) accumulates as DECIMAL(38,0), so
    * both engines agree on every intermediate EXACTLY; rho is one IEEE
    * expression over those integers (the doubling cancels), rounded
    * 6dp. No float summation order anywhere.
    *
    * Scale: two [[rankMap]] histograms (distinct-value cardinality,
    * two-phase prefix sums — no global sort), two equi-joins back to
    * the rows (broadcast-able rank maps), ONE partial-agg'd moment
    * aggregate. */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .persist()
    // r17: the two rank maps are independent and each checkpoints
    // eagerly — build them concurrently (guide §2.6, graft.Par)
    val Seq(rx0, ry0) = graft.Par.frames(
      () => rankMap(rows.select(col("x").as("v")), nBuckets),
      () => rankMap(rows.select(col("y").as("v")), nBuckets))
    val rx = rx0.select(col("v").as("x"), col("r2").as("rx"))
    val ry = ry0.select(col("v").as("y"), col("r2").as("ry"))
    val dec = "decimal(38,0)"
    val m = rows.join(rx, Seq("x")).join(ry, Seq("y"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(col("rx").cast(dec)), lit(0).cast(dec)).as("_sx"),
        coalesce(sum(col("ry").cast(dec)), lit(0).cast(dec)).as("_sy"),
        coalesce(sum(col("rx").cast(dec) * col("rx")), lit(0).cast(dec))
          .as("_sxx"),
        coalesce(sum(col("ry").cast(dec) * col("ry")), lit(0).cast(dec))
          .as("_syy"),
        coalesce(sum(col("rx").cast(dec) * col("ry")), lit(0).cast(dec))
          .as("_sxy"))
      .localCheckpoint()
    rows.unpersist()
    // the 1-row moment frame is materialized; the two rank-map
    // checkpoints (distinct-value cardinality) are dead weight now
    org.apache.spark.sql.GraftShim.releaseCheckpoint(rx)
    org.apache.spark.sql.GraftShim.releaseCheckpoint(ry)
    val n = col("n").cast(dec)
    val vx = (n * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    val vy = (n * col("_syy") - col("_sy") * col("_sy")).cast("double")
    val cov = (n * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    m.select(col("n"),
      when(col("n") >= 2 && vx > 0 && vy > 0,
        round(cov / sqrt(vx * vy), 6)).as("rho"))
  }

  /** Per-group OLS linear fit (SURVEY.md §2 R45) — slope, intercept,
    * and R² of y on x within each group: the trend estimator behind
    * "is this metric drifting and how fast", and the regression member
    * of the correlation family ([[spearman]]/[[kendallTau]] ask IF the
    * two move together; this one asks by HOW MUCH).
    *
    * One partial-agg'd pass: x and y round 6dp into DECIMAL(18,6),
    * every moment (Σx, Σy, Σxy, Σx², Σy²) accumulates as
    * DECIMAL(38,12) (exact, order-free); slope = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²) is ONE IEEE division of exactly-agreed operands
    * rounded 6dp, the intercept reuses the ROUNDED slope (so both
    * engines compose the same doubles), R² = cov²/(vx·vy) rounded 6dp.
    * NULL fit when n < 2 or x is constant; R² additionally NULL when
    * y is constant. Rows with a NULL in either column are out of
    * scope.
    *
    * Scale: ONE shuffle on the group key with map-side combine; the
    * output is one row per group. No window, no join. */
  def linearFit(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,12)"
    val x6 = round(col(xCol).cast("double"), 6).cast("decimal(18,6)")
    val y6 = round(col(yCol).cast("double"), 6).cast("decimal(18,6)")
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol), x6.as("_x"), y6.as("_y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x").cast(dec)).cast(dec).as("_sx"),
        sum(col("_y").cast(dec)).cast(dec).as("_sy"),
        sum((col("_x") * col("_y")).cast(dec)).cast(dec).as("_sxy"),
        sum((col("_x") * col("_x")).cast(dec)).cast(dec).as("_sxx"),
        sum((col("_y") * col("_y")).cast(dec)).cast(dec).as("_syy"))
    val nD = col("n").cast("double")
    val cov = (col("_sxy").cast("double") * nD
      - col("_sx").cast("double") * col("_sy").cast("double"))
    val vx = (col("_sxx").cast("double") * nD
      - col("_sx").cast("double") * col("_sx").cast("double"))
    val vy = (col("_syy").cast("double") * nD
      - col("_sy").cast("double") * col("_sy").cast("double"))
    m.select(col(keyCol), col("n"),
      when(col("n") >= 2 && vx > 0, round(cov / vx, 6)).as("slope"),
      when(col("n") >= 2 && vx > 0,
        round((col("_sy").cast("double")
          - round(cov / vx, 6) * col("_sx").cast("double")) / nD, 6))
        .as("intercept"),
      when(col("n") >= 2 && vx > 0 && vy > 0,
        round(cov * cov / (vx * vy), 6)).as("r2"))
  }

  /** Full pairwise Pearson correlation matrix in ONE pass (SURVEY.md
    * §2 R51) — the profiling surface behind every feature-selection
    * triage: A9's `corr` answers one pair per aggregate, this one
    * computes all k(k−1)/2 pairs from a single partial-agg'd scan
    * (k sums + k squares + the pair products in one Aggregate — the
    * Quality.audit fold idiom at matrix width).
    *
    * Listwise deletion: rows with a NULL in ANY requested column are
    * out of scope, so every pair shares the same n and the matrix is
    * positive-semidefinite-consistent. Exactness: values round 6dp
    * into DECIMAL, every moment accumulates DECIMAL(38,12)
    * (order-free), each correlation is ONE IEEE expression over
    * agreed operands rounded 6dp; NULL for a constant column.
    *
    * Scale: one scan, one 1-row aggregate, k²-bounded output. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val dec = "decimal(38,12)"
    // internal aliases key on the column INDEX, not the name: distinct
    // legal inputs like Seq("a", "b_c", "a_b", "c") would otherwise
    // collide on a name-concatenated alias (_sp_a_b_c twice) and throw
    // an ambiguous-reference AnalysisException despite passing the
    // distinct-columns require
    val c6 = cols.indices.map(i =>
      i -> round(col(cols(i)).cast("double"), 6).cast("decimal(18,6)")).toMap
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggs =
      cols.indices.map(i => sum(c6(i).cast(dec)).cast(dec).as(s"_s_$i")) ++
      cols.indices.map(i => sum((c6(i) * c6(i)).cast(dec)).cast(dec)
        .as(s"_ss_$i")) ++
      pairs.map { case (i, j) =>
        sum((c6(i) * c6(j)).cast(dec)).cast(dec).as(s"_sp_${i}_$j") }
    val m = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast("double")
    def v(i: Int) = col(s"_ss_$i").cast("double") * nD -
      col(s"_s_$i").cast("double") * col(s"_s_$i").cast("double")
    val rows = pairs.map { case (i, j) =>
      val cov = col(s"_sp_${i}_$j").cast("double") * nD -
        col(s"_s_$i").cast("double") * col(s"_s_$j").cast("double")
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        when(col("n") >= 2 && v(i) > 0 && v(j) > 0,
          round(cov / sqrt(v(i) * v(j)), 6)).as("corr"))
    }
    m.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("n"), col("p.corr"))
  }

  /** Kendall tau-b rank correlation (SURVEY.md §2 A14) — the
    * concordant-vs-discordant-PAIRS member of the correlation family
    * ([[spearman]] compares rank values; this one counts inversions,
    * the statistic behind "how often do the two orderings agree?").
    * Rows with a NULL in either column are out of scope.
    *
    * Exact in O(|X|·|Y|) instead of O(n²): concordant/discordant pair
    * counts come from 2D CUMULATIVE counts over the full value grid
    * (the [[chiSquare]] full-grid contract — at least one column should
    * be bounded-cardinality; discretize an unbounded one first, e.g.
    * width_bucket). With cum = Σ_{x'≤x,y'≤y}, cx = Σ_{x'≤x} at this y,
    * cy = Σ_{y'≤y} at this x, inclusion-exclusion gives the strictly
    * below-left mass LT = cum − cx − cy + n and the below-right mass
    * GL = (TX − tx) − (cum − cy); then P = Σ n·LT, Q = Σ n·GL count
    * each pair exactly once. tau_b = 2(P−Q)/√((n0−n1)(n0−n2)) on the
    * DOUBLED tie terms n0 = n(n−1), n1 = Σ tx(tx−1), n2 = Σ ty(ty−1).
    * Every moment is DECIMAL(38,0) (order-free, engine-exact); tau is
    * ONE IEEE expression rounded 6dp. NULL when n < 2 or either column
    * is constant (zero pair variance).
    *
    * Scale: one (x,y) cell aggregate (partial-agg'd — rows collapse
    * map-side), a |X|×|Y| grid cross join, windows partitioned by the
    * OTHER axis (frames bounded by axis cardinality, never by n), one
    * final 1-row moment aggregate. Raw rows shuffle exactly once. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
    val cells = rows.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn")).localCheckpoint()
    val grid = cells.select(col("x")).distinct()
      .crossJoin(cells.select(col("y")).distinct())
      .join(cells, Seq("x", "y"), "left")
      .na.fill(0L, Seq("cn"))
    val wX = W.partitionBy(col("y")).orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wY = W.partitionBy(col("x")).orderBy(col("y"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wTx = W.orderBy(col("x")) // distinct-x frame: |X| rows, bounded
      .rowsBetween(W.unboundedPreceding, 0)
    val cum2d = grid
      .withColumn("cx", sum(col("cn")).over(wX))
      .withColumn("cy", sum(col("cn")).over(wY))
      .withColumn("cum", sum(col("cx")).over(wY))
    val xTot = cells.groupBy(col("x")).agg(sum(col("cn")).as("tx"))
      .withColumn("txc", sum(col("tx")).over(wTx))
    val dec = "decimal(38,0)"
    val marg = cells.select(col("x"), col("cn"))
      .groupBy(col("x")).agg(sum(col("cn")).as("t"))
      .agg(coalesce(sum(col("t").cast(dec) * (col("t") - 1)),
        lit(0).cast(dec)).as("n1m"))
      .crossJoin(cells.select(col("y"), col("cn"))
        .groupBy(col("y")).agg(sum(col("cn")).as("t"))
        .agg(coalesce(sum(col("t").cast(dec) * (col("t") - 1)),
          lit(0).cast(dec)).as("n2m")))
    val pq = cum2d.filter(col("cn") > 0)
      .join(broadcast(xTot), Seq("x"))
      .select(col("cn").cast(dec).as("cn"),
        (col("cum") - col("cx") - col("cy") + col("cn")).cast(dec)
          .as("lt"),
        ((col("txc") - col("tx")) - (col("cum") - col("cy"))).cast(dec)
          .as("gl"))
      .agg(coalesce(sum(col("cn") * col("lt")), lit(0).cast(dec)).as("p"),
        coalesce(sum(col("cn") * col("gl")), lit(0).cast(dec)).as("q"),
        coalesce(sum(col("cn")), lit(0).cast(dec)).as("n"))
    val m = pq.crossJoin(marg).localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(cells)
    val n0m = (col("n") * (col("n") - 1)).cast("decimal(38,0)")
    val den = (n0m - col("n1m")).cast("double") *
      (n0m - col("n2m")).cast("double")
    m.select(col("n").cast("long").as("n"),
      when(col("n") >= 2 && den > 0,
        round(lit(2.0) * (col("p") - col("q")).cast("double") /
          sqrt(den), 6)).as("tau"))
  }

  /** Theil–Sen robust slope per key (SURVEY.md §2 R54) — the magnitude
    * companion of [[mannKendall]] (MK answers IS the series drifting;
    * Sen's estimator answers HOW FAST, immune to outliers that wreck
    * an OLS fit): the median over all i<j pairs of the pairwise slope
    * (vⱼ−vᵢ)/(tⱼ−tᵢ), reported in value-units per DAY. Pairs at the
    * same timestamp are excluded (undefined slope, the standard
    * convention). Returns (keyCol, n, n_pairs, sen_slope); NULL slope
    * when no valid pair exists.
    *
    * Cross-engine determinism: each pairwise slope is ONE IEEE
    * expression on exact operands (6dp-decimal values, exact µs
    * deltas), both engines sort the identical doubles and pick the
    * same middle element(s) — the even case averages the two middles
    * (one more IEEE op), the result rounds 6dp, and a `+ 0.0` guard
    * canonicalizes a −0.0 median so the engines cannot differ on the
    * sign of zero.
    *
    * Scale: the median-of-all-pairwise-slopes is inherently PAIRWISE —
    * unlike [[mannKendall]] (rewritten over the grid, r10) there is no
    * cell-space shortcut, so this operator keeps the per-key O(nₖ²)
    * bounded-group contract and now MEASURES it (the
    * [[graft.pipeline.Dedup.allPairsJaccard]] probe-and-warn
    * discipline): one max-group-size aggregate up front, and a LOUD
    * warning past `warnGroupSize` observations in any key — beyond it
    * the per-key slope list (nₖ²/2 doubles collected and sorted in one
    * task) stops fitting executor memory long before the join finishes.
    * Cap or window a key's history first (e.g. last-90-days per
    * entity); the operator stays exact because the caller asked for
    * the exact median.
    *
    * `strategy = "sampled"` (r11) is the labeled scale leg: a
    * deterministic hash-ranked subsample of m observations per key
    * (the largest m with m(m−1)/2 ≤ maxPairsPerKey) bounds the pair
    * mass at maxPairsPerKey
    * regardless of key size (a hot key cannot detonate), and the
    * result is the exact Sen median OF THE SUBSERIES — the standard
    * subsample estimator, with n/n_pairs honestly reporting the
    * sampled sizes. Keys with ≤ m observations pass through whole, so
    * the sampled leg coincides with exact there. The probe warning is
    * retired on this path (nothing to warn about — the bound is by
    * construction). */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, warnGroupSize: Int = 2000,
      strategy: String = "exact",
      maxPairsPerKey: Int = 500000): DataFrame = {
    require(Set("exact", "sampled")(strategy),
      s"theilSen: unknown strategy '$strategy' (exact | sampled)")
    require(maxPairsPerKey >= 1, "maxPairsPerKey must be positive")
    val obs0 = df
      .filter(col(valCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        col(valCol).as("v"))
    // strategy = "sampled" (r11; the scale leg the exact default
    // cannot offer — median-of-pairwise-slopes has no cell-space
    // shortcut): a DETERMINISTIC hash-ranked subsample of
    // OBSERVATIONS per key, m rows (largest m with m(m−1)/2 ≤
    // maxPairsPerKey), keeps the per-key pair mass ≤ maxPairsPerKey
    // by construction — sampling
    // observations bounds the pairs WITHOUT enumerating them (pair-
    // level sampling would first materialize the O(n²) join it exists
    // to avoid). The estimate is the EXACT Sen median of the sampled
    // subseries (labeled approximate: n/n_pairs report the sampled
    // sizes); xxhash64 ranking makes the subsample reproducible
    // run-to-run and engine-independent. Keys at or under m are
    // passed through whole, so sampled ≡ exact there (spec-asserted).
    val obs = if (strategy == "sampled") {
      // largest m with m(m-1)/2 <= maxPairsPerKey — the ceil(sqrt(2P))
      // form (r11) could exceed the cap for small P (P=5 gave m=4 →
      // 6 pairs), breaking the "≤ maxPairsPerKey by construction"
      // contract; the quadratic-root floor keeps it strict (m ≥ 2
      // always, so a 2-row key still yields its one pair)
      val m = math.max(2,
        math.floor((1.0 + math.sqrt(1.0 + 8.0 * maxPairsPerKey)) / 2.0)
          .toInt)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"))
        .orderBy(xxhash64(col("k"), col("us"), col("v")), col("us"),
          col("v"))
      obs0.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= m).drop("_rk")
    } else obs0
    // regime probe: ONE partial-agg'd aggregate (key-cardinality) —
    // NULL-safe on an empty frame (the allPairsJaccard guard). The
    // sampled leg is bounded by construction, so the probe (and its
    // warning) applies to the exact path only.
    if (strategy == "exact") {
      val maxRow = obs.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head()
      val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      if (maxN > warnGroupSize)
        logWarning(s"theilSen: largest key holds $maxN observations — " +
          s"the exact median enumerates ~${maxN * maxN / 2} pairwise " +
          "slopes for that key in one task (O(n_k^2) by construction). " +
          "Cap or window each key's history before calling (the " +
          "bounded-group contract), raise warnGroupSize to silence, " +
          "or switch to strategy=\"sampled\" for the bounded " +
          "approximate estimate.")
    }
    val l = obs.select(col("k"), col("us").as("ua"), col("v").as("va"))
    val r = obs.select(col("k"), col("us").as("ub"), col("v").as("vb"))
    val pairs = l.join(r, Seq("k"))
      .filter(col("ua") < col("ub"))
      .select(col("k"),
        ((col("vb") - col("va")) * lit(86400000000.0) /
          (col("ub") - col("ua")).cast("double")).as("slope"))
    val g = pairs.groupBy(col("k"))
      .agg(sort_array(collect_list(col("slope"))).as("ss"),
        count(lit(1)).as("n_pairs"))
    val m = col("n_pairs")
    val mid = when(m % 2 === 0,
      (element_at(col("ss"), (m / 2).cast("int")) +
        element_at(col("ss"), (m / 2 + 1).cast("int"))) / 2.0)
      .otherwise(element_at(col("ss"), ((m + 1) / 2).cast("int")))
    val nk = obs.groupBy(col("k")).agg(count(lit(1)).as("n"))
    nk.join(g, Seq("k"), "left")
      .select(col("k").as(keyCol), col("n"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        (round(mid, 6) + 0.0).as("sen_slope"))
  }

  /** Mann-Kendall monotonic-trend test per key (SURVEY.md §2 R53) —
    * the non-parametric "is this series drifting" answer a metrics
    * warehouse runs per entity: S = Σ_{i<j} sgn(vⱼ − vᵢ) over the
    * (tsCol, tieCol)-ordered series, tie-corrected variance
    * Var(S)·18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the
    * continuity-corrected z = (S∓1)/√Var(S). Returns
    * (keyCol, n, s, z, trend) with trend ∈ increasing/decreasing/
    * no_trend at the 5% two-sided level (|z| > 1.96), NULL z for
    * degenerate series (n < 2 or zero variance).
    *
    * S is computed WITHOUT enumerating pairs (r10 rewrite; the r9 form
    * self-joined each key's series — O(nₖ²) join rows, 10¹² for one
    * 1M-observation key): S is exactly the Kendall concordance count
    * P − Q between the (tsCol, tieCol) order and the value, so the
    * [[kendallTau]] cumulative-grid identity applies per key. Cells =
    * one row per observed (key, ts, tie, v); the per-key grid (distinct
    * time points × distinct values, nₖ·|Vₖ| rows) carries 2D cumulative
    * counts via windows whose frames are bounded by ONE axis each, and
    * inclusion-exclusion yields the strictly-earlier-and-smaller (LT)
    * and strictly-earlier-and-larger (GL) masses; S = Σ cn·(LT − GL).
    * The quadratic survives only when a key's values are ALL distinct
    * (|Vₖ| = nₖ) — discretize the value (its measurement grain) for
    * such series; repeated values, the common telemetry shape, make
    * the grid nₖ·|Vₖ| ≪ nₖ².
    *
    * Pairs tied on BOTH (tsCol, tieCol) are simultaneous observations:
    * their mutual pairs contribute 0 to S (the standard tied-time
    * convention; the grid excludes them exactly as the r9 pair filter
    * did) while still counting in n and the value-tie variance term —
    * make tieCol a per-row-unique column (an event id) when strict
    * total order matters.
    *
    * Everything up to z is exact integer/decimal arithmetic, so both
    * engines agree bit-for-bit; z is ONE IEEE expression on agreed
    * operands, rounded 6dp (§6 discipline) — trend classifies the
    * ROUNDED z so the label can never straddle an engine boundary.
    *
    * Scale: one cell aggregate (partial-agg'd — raw rows shuffle
    * once), a per-key grid join, windows partitioned by
    * (key, other-axis) — never an unpartitioned window — and
    * key-cardinality final joins. NO key self-join at row cardinality
    * (StatsSpec plan-asserts every join is pure-equi). */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val (frame, cells) = mannKendallFrame(df, keyCol, tsCol, valCol, tieCol)
    // materialize the key-cardinality result, then release the cell
    // checkpoint (the kendallTau lifecycle — blocks must not outlive
    // the call)
    val out = frame.localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(cells)
    out
  }

  /** The lazily-planned frame behind [[mannKendall]] plus its cell
    * checkpoint — package-visible so StatsSpec can assert the plan
    * shape (every join pure-equi: no ordered-pair enumeration join)
    * before the public operator's eager materialization hides it. */
  private[graft] def mannKendallFrame(df: DataFrame, keyCol: String,
      tsCol: String, valCol: String,
      tieCol: String): (DataFrame, DataFrame) = {
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val obs = df
      .filter(col(valCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"),
        col(tieCol).as("i"), col(valCol).as("v"))
    // one row per observed (k, time-point, value) — the kendallTau cell
    // table with x = the composite (t, i) time axis
    val cells = obs.groupBy(col("k"), col("t"), col("i"), col("v"))
      .agg(count(lit(1)).as("cn")).localCheckpoint()
    // per-key grid: distinct time points × distinct values; tx/txc ride
    // on the time-point side (per-x totals + cumulative-over-x)
    val wTx = W.partitionBy(col("k")).orderBy(col("t"), col("i"))
      .rowsBetween(W.unboundedPreceding, 0)
    val xs = cells.groupBy(col("k"), col("t"), col("i"))
      .agg(sum(col("cn")).as("tx"))
      .withColumn("txc", sum(col("tx")).over(wTx))
    val vs = cells.select(col("k"), col("v")).distinct()
    val grid = xs.join(vs, Seq("k"))
      .join(cells, Seq("k", "t", "i", "v"), "left")
      .na.fill(0L, Seq("cn"))
    val wX = W.partitionBy(col("k"), col("v")).orderBy(col("t"), col("i"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wY = W.partitionBy(col("k"), col("t"), col("i")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, 0)
    val cum2d = grid
      .withColumn("cx", sum(col("cn")).over(wX))
      .withColumn("cy", sum(col("cn")).over(wY))
      .withColumn("cum", sum(col("cx")).over(wY))
    // LT = strictly-earlier, strictly-smaller mass; GL = strictly-
    // earlier, strictly-larger — each ordered pair owned once by its
    // later element, time-tied and value-tied pairs excluded exactly
    val s = cum2d.filter(col("cn") > 0)
      .select(col("k"), (col("cn").cast(dec) *
        ((col("cum") - col("cx") - col("cy") + col("cn")) -
          ((col("txc") - col("tx")) - (col("cum") - col("cy"))))
          .cast(dec)).cast(dec).as("sc"))
      .groupBy(col("k"))
      .agg(sum(col("sc")).cast(dec).cast("long").as("s"))
    val ties = obs.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum((col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .cast(dec)).cast(dec).as("tie_term"))
    val nk = obs.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val varNum = ((col("n").cast(dec) * (col("n") - 1).cast(dec) *
      (col("n") * 2 + 5).cast(dec)).cast(dec) - col("tie_term"))
      .cast(dec)
    val z = when(col("n") >= 2 && varNum > 0,
      round(
        when(col("s") > 0, (col("s") - 1).cast("double"))
          .when(col("s") < 0, (col("s") + 1).cast("double"))
          .otherwise(lit(0.0)) /
          sqrt(varNum.cast("double") / 18.0), 6))
    val frame = nk.join(s, Seq("k"), "left").join(ties, Seq("k"))
      .select(col("k").as(keyCol), col("n"),
        coalesce(col("s"), lit(0L)).as("s"), z.as("z"),
        when(z.isNull, lit(null).cast("string"))
          .when(z > 1.96, "increasing")
          .when(z < -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
    (frame, cells)
  }

  /** Kruskal–Wallis H test of `valCol` across ALL levels of `groupCol`
    * (SURVEY.md §2 R55) — the k-group extension of [[mannWhitney]]:
    * "do ANY of these segments' value distributions differ", asked on
    * ranks so outliers and non-normality can't poison the verdict.
    * One row: (n_groups, n_total, h_stat, dof) with H tie-corrected
    * and rounded 6dp, dof = k−1. NULL H when k < 2 or all values are
    * identical (zero tie-corrected denominator). Rows with a NULL
    * group or value are out of scope ([[chiSquare]]'s rule).
    *
    * Exactness: per-group doubled rank sums 2·ΣR_g =
    * Σ_v n_g(v)·(2·before(v)+t(v)+1) are exact integers over the
    * value histogram (the [[mannWhitney]] identity, one histogram for
    * ALL groups); each group's R_g²/n_g term is UNROUNDED IEEE on
    * those exactly-agreed integers — rank-sum-scale doubles must NOT
    * round (the §6 large-magnitude round hazard) — summed as an
    * ORDERED fold over the group-sorted k-element term list (the
    * [[graft.pipeline.Similarity.pcaTopComponent]] explicit-order
    * discipline, replayable by any engine); the tie term Σ(t³−t) is
    * exact DECIMAL(38,0); H composes the agreed values in one IEEE
    * ladder rounded 6dp at test-statistic magnitude.
    *
    * Scale: one (group, value) histogram shuffle (partial-agg'd),
    * value-cardinality "strictly before" counts via the
    * [[rankedHistogram]] two-phase bucket prefix sum (no global sort,
    * no unbounded global window), then everything at group
    * cardinality. */
  def kruskalWallis(df: DataFrame, groupCol: String, valCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val v = col(valCol).cast("double")
    val gh = df
      .filter(col(groupCol).isNotNull && v.isNotNull)
      .groupBy(col(groupCol).as("g"), v.as("v"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val vt = gh.groupBy(col("v")).agg(sum(col("n")).as("t")).persist()
    val rng = vt.agg(min(col("v")), max(col("v"))).head()
    val bkt =
      if (rng.isNullAt(0) || rng.getDouble(0) == rng.getDouble(1)) lit(1L)
      else width_bucket(col("v"), lit(rng.getDouble(0)),
        lit(rng.getDouble(1)), lit(nBuckets))
    val hb = vt.withColumn("bkt", bkt)
    val wOff = W.orderBy(col("bkt")).rowsBetween(W.unboundedPreceding, -1)
    val offs = hb.groupBy("bkt").agg(sum(col("t")).as("bt"))
      .select(col("bkt"),
        coalesce(sum(col("bt")).over(wOff), lit(0L)).as("off"))
    val wIn = W.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(W.unboundedPreceding, 0)
    val before = hb.join(broadcast(offs), Seq("bkt"))
      .select(col("v"), col("t"),
        (col("off") + sum(col("t")).over(wIn) - col("t")).as("before"))
      .localCheckpoint()
    vt.unpersist()
    // doubled per-group rank sums — exact integers under any ties
    val perG = gh.join(before, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n_g"),
        sum(col("n").cast(dec) *
          (col("before").cast(dec) * 2 + col("t") + 1)).cast(dec).as("r2"))
    // Σ_g R_g²/n_g with R_g = r2_g/2: each term is UNROUNDED IEEE on
    // exactly-agreed integers (rounding a rank-sum-scale double is the
    // cross-engine hazard — §6), summed as an ORDERED fold over the
    // group-sorted term list (the P29 explicit-order discipline); k is
    // category-bounded (the chiSquare grid rule), so the list holds k
    // structs, never rows
    val moments = perG
      .select(col("n_g"), struct(col("g").as("g"),
        (col("r2").cast("double") * col("r2").cast("double")
          / (col("n_g").cast("double") * 4.0)).as("t")).as("gt"))
      .agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(col("n_g")), lit(0L)).as("n_total"),
        aggregate(sort_array(collect_list(col("gt"))), lit(0.0),
          (acc, x) => acc + x.getField("t")).as("srr"))
    val ties = before.agg(
      coalesce(sum((col("t").cast(dec) * col("t") * col("t") - col("t"))
        .cast(dec)), lit(0).cast(dec)).as("tie3"))
    val n = col("n_total").cast("double")
    val hraw = lit(12.0) * col("srr") / (n * (n + lit(1.0))) -
      lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) - col("tie3").cast("double") / (n * n * n - n)
    moments.crossJoin(broadcast(ties))
      .select(col("n_groups"), col("n_total"),
        when(col("n_groups") >= 2 && col("n_total") > col("n_groups") &&
          corr > 0, round(hraw / corr, 6)).as("h_stat"),
        when(col("n_groups") >= 1, (col("n_groups") - 1).cast("long"))
          .as("dof"))
  }

  /** One-way ANOVA F test of `valCol` across ALL levels of `groupCol`
    * (SURVEY.md §2 R56) — the k-group extension of [[welchTTest]]'s
    * mean comparison (classical equal-variance form): partitions total
    * variance into between-group and within-group sums of squares and
    * asks whether the group means explain more than noise. One row:
    * (n_groups, n_total, ss_between, ss_within, f_stat, dof_between,
    * dof_within, eta_sq) — eta² = SSB/(SSB+SSW) is the effect size an
    * experiment readout quotes next to the verdict. NULL F when k < 2,
    * N ≤ k, or zero within-group variance. NULL groups/values out of
    * scope.
    *
    * Exactness: values round 6dp then ride as SCALE-0 integers v·1e6
    * (single-rounding double conversion — see the in-body note);
    * per-group n/Σv/Σv² accumulate as exact DECIMAL(38,0) (one
    * partial-agg'd shuffle — the
    * [[linearFit]] moment discipline); each group's mean is ONE IEEE
    * division of agreed operands rounded 6dp (data magnitude — safe);
    * SSB terms n_g·(m_g−m)² and SSW terms Σv²−(Σv)²/n_g are UNROUNDED
    * single IEEE expressions (sums-of-squares sit at aggregate
    * magnitude, where rounding is the §6 cross-engine hazard) summed
    * as an ORDERED fold over the group-sorted k-element list;
    * ss_between/ss_within emit those exact IEEE doubles; F rounds 4dp
    * and eta² 6dp at statistic magnitude.
    *
    * Scale: ONE partial-agg'd group shuffle; everything after runs at
    * group cardinality (k rows), one row out. */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    // values ride as SCALE-0 integers v·1e6 (exact decimals): a
    // scale-0 DECIMAL(38,0)→double conversion is a SINGLE rounding on
    // every engine, where a scale-12 decimal converts in two steps
    // (integer→double, ÷10¹²) on some engines — a real 1-ulp
    // divergence this operator's oracle caught at aggregate magnitude
    val v6i = (round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
      * 1000000).cast("decimal(38,0)")
    val perG = df
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(v6i).cast("decimal(38,0)").as("s_g"),
        sum((v6i * v6i).cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("q_g"))
    val tot = perG.agg(
      count(lit(1)).as("n_groups"),
      coalesce(sum(col("n_g")), lit(0L)).as("n_total"),
      coalesce(sum(col("s_g")), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("s_tot"))
    val gm = round(col("s_tot").cast("double")
      / (col("n_total").cast("double") * 1.0e6), 6)
    val mg = round(col("s_g").cast("double")
      / (col("n_g").cast("double") * 1.0e6), 6)
    // per-group SSB/SSW terms: UNROUNDED IEEE on agreed operands (the
    // group means round 6dp at DATA magnitude, which is safe; the
    // sums-of-squares are aggregate-magnitude, where rounding is the
    // cross-engine hazard — §6), summed as an ORDERED fold over the
    // group-sorted list; SSW clamps the float residue a constant
    // group can leave
    val terms = perG.crossJoin(broadcast(tot))
      .select(col("n_groups"), col("n_total"),
        struct(col("g").as("g"),
          (col("n_g").cast("double") * (mg - gm) * (mg - gm)).as("sb"),
          greatest(col("q_g").cast("double") / 1.0e12 -
            (col("s_g").cast("double") / 1.0e6)
              * (col("s_g").cast("double") / 1.0e6)
              / col("n_g"), lit(0.0)).as("sw")).as("gt"))
    val agg = terms.groupBy(col("n_groups"), col("n_total"))
      .agg(sort_array(collect_list(col("gt"))).as("_l"))
      .select(col("n_groups"), col("n_total"),
        aggregate(col("_l"), lit(0.0),
          (acc, x) => acc + x.getField("sb")).as("_ssb"),
        aggregate(col("_l"), lit(0.0),
          (acc, x) => acc + x.getField("sw")).as("_ssw"))
    val k = col("n_groups").cast("double")
    val n = col("n_total").cast("double")
    val fOk = col("n_groups") >= 2 && col("n_total") > col("n_groups") &&
      col("_ssw") > 0
    agg.select(col("n_groups"), col("n_total"),
      col("_ssb").as("ss_between"),
      col("_ssw").as("ss_within"),
      when(fOk, round((col("_ssb") / (k - lit(1.0))) /
        (col("_ssw") / (n - k)), 4)).as("f_stat"),
      (col("n_groups") - 1).cast("long").as("dof_between"),
      (col("n_total") - col("n_groups")).cast("long").as("dof_within"),
      when(col("n_groups") >= 2 && (col("_ssb") + col("_ssw")) > 0,
        round(col("_ssb") / (col("_ssb") + col("_ssw")), 6)).as("eta_sq"))
  }

  /** McNemar test of marginal homogeneity over PAIRED binary outcomes
    * (SURVEY.md §2 R61) — the categorical twin of
    * [[wilcoxonSignedRank]]: two classifiers (or a before/after rule
    * pair) judge the SAME items, and the test asks whether they
    * disagree symmetrically. Only the discordant cells matter:
    * b = #(x pass, y fail), c = #(x fail, y pass); the
    * continuity-corrected statistic is χ² = (|b−c|−1)²/(b+c), 1 dof,
    * rejected at 3.841459. An outcome is "pass" when the column > 0;
    * rows with either side NULL are out of scope. One row:
    * (n_pairs, n_xy, n_yx, chi2, reject_05) — chi2 honestly NULL when
    * b+c = 0 (no disagreement ⇒ nothing to test, not "χ²=0 keep").
    *
    * Exactness: b and c are exact longs from one aggregate; χ² is ONE
    * agreed IEEE expression on those integers rounded 6dp; the verdict
    * compares the ROUNDED statistic (the [[graft.pipeline.TextAnalysis]]
    * PSI band discipline).
    *
    * Scale: a single partial-agg'd full pass, one row out — no
    * shuffle wider than the final 1-row combine. */
  def mcnemar(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val xp = col(xCol).cast("double") > 0
    val yp = col(yCol).cast("double") > 0
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(xp && !yp, 1L).otherwise(0L)), lit(0L))
          .as("n_xy"),
        coalesce(sum(when(!xp && yp, 1L).otherwise(0L)), lit(0L))
          .as("n_yx"))
    val b = col("n_xy").cast("double")
    val c = col("n_yx").cast("double")
    val chi2 = round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c), 6)
    agg.select(col("n_pairs"), col("n_xy"), col("n_yx"),
      when(col("n_xy") + col("n_yx") > 0, chi2).as("chi2"),
      when(col("n_xy") + col("n_yx") > 0, chi2 > 3.841459)
        .as("reject_05"))
  }

  /** Cohen's kappa inter-annotator agreement (SURVEY.md §2 R62) — the
    * labeling-QA readout of a training-data pipeline: two raters (or a
    * model vs a human pass) assign categorical labels to the same
    * items, and kappa measures agreement BEYOND the chance level their
    * marginal label distributions already guarantee. One row:
    * (n_pairs, n_agree, po, pe, kappa) with po = observed agreement,
    * pe = Σ_c margA(c)·margB(c)/n², kappa = (po−pe)/(1−pe) read on the
    * Landis–Koch bands. Rows with either label NULL are out of scope
    * (an unlabeled item is not a disagreement). kappa is honestly NULL
    * when pe = 1 (both raters constant on the same label — agreement
    * beyond chance is undefined, not 0 or 1).
    *
    * Exactness: kappa's ratio clears its denominators —
    * (n·Σdiag − Σ_c ra_c·rb_c) / (n² − Σ_c ra_c·rb_c) — so BOTH sides
    * are exact DECIMAL(38,0) integers and kappa is ONE IEEE division
    * rounded 6dp; po/pe display-round 6dp from the same integers.
    *
    * Scale: one (a,b) contingency shuffle; margins and the pe sum run
    * at label-grid cardinality (the [[chiSquare]] grid rule) — the
    * cells table is |A|·|B| rows, never the corpus. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cont = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val ra = cont.groupBy(col("a")).agg(sum(col("n")).as("ra"))
    val rb = cont.groupBy(col("b")).agg(sum(col("n")).as("rb"))
    // chance-agreement mass Σ_c ra_c·rb_c over the SHARED label set —
    // labels one rater never uses contribute 0 (inner join)
    val pe2 = ra.join(rb, col("a") === col("b"))
      .agg(coalesce(sum((col("ra").cast(dec) * col("rb")).cast(dec)),
        lit(0).cast(dec)).as("_pe2"))
    val tot = cont.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_pairs"),
      coalesce(sum(when(col("a") === col("b"), col("n"))
        .otherwise(0L)), lit(0L)).as("n_agree"))
    val out = tot.crossJoin(broadcast(pe2))
    val n = col("n_pairs").cast(dec)
    // exact integer numerator/denominator — kappa is ONE division
    val num = (n * col("n_agree") - col("_pe2")).cast(dec)
    val den = (n * n - col("_pe2")).cast(dec)
    val res = out.select(col("n_pairs"), col("n_agree"),
      when(col("n_pairs") > 0,
        round(col("n_agree").cast("double") / col("n_pairs"), 6)).as("po"),
      when(col("n_pairs") > 0, round(col("_pe2").cast("double") /
        (col("n_pairs").cast("double") * col("n_pairs")), 6)).as("pe"),
      when(col("n_pairs") > 0 && den =!= lit(0).cast(dec),
        round(num.cast("double") / den.cast("double"), 6)).as("kappa"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(cont)
    res
  }
}
