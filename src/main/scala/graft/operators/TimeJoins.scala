package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference's users reach for but neither HDK
  * nor stock Spark ships as a single operator: as-of join and
  * interval/range join. Both are composed from shuffle-friendly
  * primitives (union+window, bucket equi-join) rather than
  * broadcast-nested-loop, so they scale to fact-sized inputs.
  */
object TimeJoins extends org.apache.spark.internal.Logging {

  /** As-of join: for every left row, the single right row with the
    * greatest `tsCol` satisfying right.ts <= left.ts within the same
    * `keyCol` (LEFT OUTER semantics — unmatched left rows keep nulls).
    *
    * Implementation: tag both sides, union, and take a running
    * `last(ignoreNulls)` of the right payload over
    * (key ORDER BY ts, tag) — right rows sort before left rows at equal
    * ts, giving inclusive `<=`. ONE shuffle on the key, no join node at
    * all; at 100 TB this is strictly cheaper than the sort-merge
    * band-join rewrite.
    *
    * `rightCols` are emitted with an `asof_` prefix. Right rows should
    * be unique per (key, ts) — pre-aggregate if not, or ties are
    * resolved arbitrarily (same caveat as DuckDB's ASOF JOIN).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct filled by ONE
    // last(ignoreNulls) window — per-column fills would mix values from
    // different right rows whenever a payload column is NULL (each
    // column's "last non-null" can come from a different row), which is
    // not as-of-join semantics.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left.withColumn("_tag", lit(1))
      .withColumn("_asof", lit(null).cast(payloadType))
    val r0 = right.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("_tag")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightCols.map(col): _*).cast(payloadType).as("_asof"))): _*)
    val u = l.unionByName(r0)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col("_asof").getField(c).as(s"asof_$c"))): _*)
  }

  /** Range (interval) join with NO equi-key: points matched to every
    * interval [startCol, endCol) that contains them.
    *
    * The naive plan is a broadcast-nested-loop (O(N·M)). Instead each
    * interval explodes into the `bucketSeconds`-wide epoch bins it
    * covers (bounded fan-out when intervals are bounded), points map to
    * their single bin, and the match becomes a plain shuffle equi-join
    * on the bin plus an exact refine filter — O(N + M·span/bucket)
    * shuffle rows, the standard scalable interval-join shape.
    */
  def rangeJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds)
    val iv = intervals.withColumn("_bin", explode(sequence(
      unix_timestamp(col(startCol)).divide(b).cast("long"),
      // end is exclusive, but a point in the end bin can still precede it
      unix_timestamp(col(endCol)).divide(b).cast("long"))))
    val pt = points.withColumn("_bin",
      unix_timestamp(col(pointTs)).divide(b).cast("long"))
    pt.join(iv, Seq("_bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bin")
  }

  /** Time-series resample + forward fill: regularize an irregular
    * observation stream onto a fixed `unit` grid per key — every key
    * gets one row per grid step between its first and last observation,
    * carrying the latest observed value at-or-before that step (the
    * gap-filling half of the as-of join family; what a feature-store
    * backfill or a metrics downsampler runs).
    *
    * Plan shape (all key-parallel, nothing global):
    *  1. last observation per (key, bucket) — ONE partial-agg'd
    *     `max_by` over the deterministic (ts, tie) order, so duplicate
    *     timestamps resolve identically in any engine;
    *  2. per-key span (min/max bucket) — partial-agg'd;
    *  3. the grid is a narrow `sequence()` explode off the span row —
    *     fan-out equals the emitted grid, no intermediate blow-up;
    *  4. grid LEFT JOIN step-1 on (key, bucket), then one
    *     `last(ignoreNulls)` window per key ordered by bucket.
    * Shuffles hash on the KEY (high-cardinality), windows hold one
    * key's grid (span/unit rows) — no low-cardinality partition grows
    * with the corpus, so the shape survives 100×. Observation ts is
    * compared at microsecond precision (`unix_micros`) to stay
    * engine-reproducible against nanosecond sources.
    */
  def resampleFfill(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, unit: String = "hour"): DataFrame = {
    val b = obs.select(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"),
      unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"), col(valCol))
    val lastPerBucket = b.groupBy(col(keyCol), col("bucket"))
      .agg(max_by(col(valCol), struct(col("_us"), col("_tie"))).as("v_last"))
    val grid = b.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col(keyCol),
        explode(sequence(col("_b0"), col("_b1"), expr(s"interval 1 $unit")))
          .as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerBucket, Seq(keyCol, "bucket"), "left")
      .withColumn("v_ffill", last(col("v_last"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("bucket"), col("v_ffill"))
  }

  /** Exponentially weighted moving average over the trailing `span`
    * observations per key, ordered by (tsCol, tieCol):
    * ewma_i = Σ_j (1−α)^(i−j)·v_j / Σ_j (1−α)^(i−j), j over the frame —
    * the bias-corrected ("adjust=true") form. The frame truncation
    * makes the state bounded: each row's value is a pure fold over its
    * own ROWS-frame list, so the only data movement is the one window
    * shuffle on the HIGH-cardinality key. The numerator is a single
    * left fold `a·(1−α)+x` (identical FP order in any engine); the
    * denominator is the closed-form geometric sum (1−(1−α)^n)/α.
    * Rounded to 6dp so the last-ulp of `pow`/`exp` libm differences
    * cannot leak cross-engine.
    */
  def ewma(obs: DataFrame, keyCol: String, tsCol: String, valCol: String,
      tieCol: String, alpha: Double = 0.1, span: Int = 20): DataFrame = {
    require(alpha > 0 && alpha < 1 && span >= 1, "need 0<alpha<1, span>=1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    val q = 1 - alpha
    obs
      .withColumn("_vs", collect_list(col(valCol)).over(w))
      .withColumn("ewma",
        round(expr(s"aggregate(_vs, cast(0 as double), (a, x) -> a * $q + x)")
          / ((lit(1.0) - pow(lit(q), size(col("_vs")))) / alpha), 6))
      .drop("_vs")
  }

  /** Holt linear-trend (double exponential) smoothing per key
    * (SURVEY.md §2 R66) — the forecasting baseline of the time-series
    * family: [[ewma]] smooths a LEVEL, this one carries level AND
    * trend so it can extrapolate ("where is this metric heading in h
    * steps" — capacity planning, drift projection). Standard Hyndman
    * FPP form: l₁ = y₁, b₁ = y₂−y₁, then for t ≥ 2
    * l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}; one summary row per key:
    * (key, n, level, trend, forecast) with forecast = l_n + h·b_n.
    * Keys with a single observation report level only (a 1-point
    * trend is undefined — honest NULLs).
    *
    * Exactness: the recurrence is a LEFT FOLD in explicit (ts, tie)
    * order — both engines execute the identical IEEE sequence, so the
    * unrounded l/b agree bit-for-bit (the ewma/bpeTrain ordered-fold
    * discipline); only the emitted level/trend/forecast round 6dp. α,
    * β and their complements embed as shortest-repr literals, which
    * round-trip to the same doubles in any engine.
    *
    * Scale: ONE partial-agg'd key shuffle; each key's series rides as
    * one array (the bounded-series contract — a recurrence is
    * inherently sequential per key, the parallelism is ACROSS keys).
    * A count probe warns loudly past `warnSeriesSize` (the theilSen
    * discipline) — beyond it one key's history stops fitting a task. */
  def holtSmooth(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, alpha: Double = 0.3,
      beta: Double = 0.1, horizon: Int = 1,
      warnSeriesSize: Int = 1000000): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "need 0<alpha<1, 0<beta<1")
    require(horizon >= 1, "horizon must be >= 1")
    val base = obs
      .filter(col(valCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"),
        struct(col(tsCol).as("t"), col(tieCol).as("i"),
          col(valCol).cast("double").as("v")).as("o"))
    val maxRow = base.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxN > warnSeriesSize)
      logWarning(s"holtSmooth: largest key holds $maxN observations — " +
        "one key's full series must fit a single task (the recurrence " +
        "is sequential per key). Resample or window each key's " +
        "history first, or raise warnSeriesSize to silence.")
    val q = 1 - alpha
    val r = 1 - beta
    val g = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        expr("transform(array_sort(collect_list(o)), x -> x.v)")
          .as("_vs"))
    // left fold over y₂..y_n in explicit order; the n ≥ 2 guard keeps
    // ANSI element_at in bounds
    val st = expr(
      s"""IF(size(_vs) >= 2,
        aggregate(slice(_vs, 2, size(_vs) - 1),
          named_struct('l', element_at(_vs, 1),
            'b', element_at(_vs, 2) - element_at(_vs, 1)),
          (acc, x) -> named_struct(
            'l', $alpha * x + $q * (acc.l + acc.b),
            'b', $beta * (($alpha * x + $q * (acc.l + acc.b)) - acc.l)
              + $r * acc.b)),
        named_struct('l', cast(null as double),
          'b', cast(null as double)))""")
    g.withColumn("_st", st)
      .select(col("k").as(keyCol), col("n"),
        when(col("n") === 1, round(element_at(col("_vs"), 1), 6))
          .otherwise(round(col("_st.l"), 6)).as("level"),
        round(col("_st.b"), 6).as("trend"),
        round(col("_st.l") + lit(horizon.toDouble) * col("_st.b"), 6)
          .as("forecast"))
  }

  /** Rolling z-score anomaly flag (SURVEY.md §2 R27; the alerting
    * sibling of [[ewma]]'s smoothing): each observation scored against
    * the trailing `span` observations STRICTLY BEFORE it — the frame
    * excludes the current row, so an outlier cannot dilute its own
    * baseline, and the first rows of a key score NULL rather than
    * against a fabricated window. z rounds 4dp from 6dp-rounded
    * mean/std (the q19 stddev discipline); NULL when fewer than
    * `minObs` prior rows or zero variance — emitted honestly instead
    * of a fake 0. `flagged` = |z| > `threshold` on the rounded z, so
    * the boolean is engine-exact.
    *
    * Scale: one window shuffle on the HIGH-cardinality key; the frame
    * is ROWS-bounded (O(span) state per row), never RANGE over a
    * low-cardinality key. */
  def rollingZScore(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, span: Int = 20, minObs: Int = 5,
      threshold: Double = 3.0): DataFrame = {
    require(span >= minObs && minObs >= 2, "need span >= minObs >= 2")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-span, -1)
    val mean6 = round(avg(col(valCol)).over(w), 6)
    val sd6 = round(stddev_samp(col(valCol)).over(w), 6)
    val nPrev = count(col(valCol)).over(w)
    val z = when(nPrev >= minObs && sd6 > 0,
      round((col(valCol) - mean6) / sd6, 4))
    obs
      .withColumn("roll_n", nPrev)
      .withColumn("z", z)
      .withColumn("flagged",
        coalesce(abs(col("z")) > threshold, lit(false)))
  }

  /** OHLC bars (SURVEY.md §2 R32): per key and `unit` time bucket, the
    * open/high/low/close/count summary — the downsample every
    * time-series dashboard and feature pipeline reads instead of raw
    * ticks. Open/close are the FIRST/LAST value in (ts, tie) order;
    * ties pinned on `tieCol` so the picks are engine-deterministic.
    *
    * Scale: ONE partial-agg'd shuffle on the (high-cardinality key,
    * bucket) pair — open/close ride as `min`/`max` over a
    * (us, tie, value) struct (lexicographic struct ordering; (us, tie)
    * is unique per row so the value never tiebreaks), high/low/count
    * are plain aggregates in the SAME aggregate. No window: map-side
    * combine keeps per-bucket state O(1), so a hot key's ticks
    * collapse before they shuffle — the reason this beats the
    * row_number formulation the oracle replays. */
  def ohlcBars(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, unit: String = "hour"): DataFrame = {
    val us = unix_micros(col(tsCol))
    obs
      .withColumn("bucket", date_trunc(unit, col(tsCol)))
      .withColumn("_ord", struct(us.as("u"), col(tieCol).as("t"),
        col(valCol).as("v")))
      .groupBy(col(keyCol), col("bucket"))
      .agg(
        min(col("_ord")).getField("v").as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(col("_ord")).getField("v").as("close"),
        count(lit(1)).as("n_obs"))
  }

  /** Time-weighted average (SURVEY.md §2 R33) — the irregular-series
    * mean where each observation counts for how LONG it held, not how
    * often it was sampled (a value observed once that held for an hour
    * outweighs ten ticks in a millisecond): Σ vᵢ·Δtᵢ / Σ Δtᵢ with
    * Δtᵢ = time to the next observation; the last observation carries
    * no weight (its holding period is unobserved — counting it would
    * fabricate data). NULL for keys with < 2 observations or a zero
    * span: honest, not a fake simple mean.
    *
    * Cross-engine determinism: values round 6dp, weights are exact µs
    * integers, the weighted sum accumulates as DECIMAL(38,6) (exact,
    * order-free), and the single IEEE division of two exactly-agreed
    * operands rounds 6dp (§6 discipline).
    *
    * Scale: one lead window + one partial-agg'd groupBy, both on the
    * HIGH-cardinality key. */
  def twap(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    obs
      .withColumn("_us", us)
      .withColumn("_dt", lead(col("_us"), 1).over(w) - col("_us"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_obs"),
        (max(col("_us")) - min(col("_us"))).as("span_us"),
        sum((round(col(valCol), 6).cast("decimal(18,6)") *
          col("_dt").cast("decimal(20,0)")).cast("decimal(38,6)"))
          .as("_ws"))
      .withColumn("twap",
        when(col("span_us") > 0,
          round(col("_ws").cast("double") /
            col("span_us").cast("double"), 6)))
      .drop("_ws")
  }

  /** Cross-correlation function between two series on the same key
    * (SURVEY.md §2 R49) — the LEAD-LAG question [[acf]] can't ask:
    * does x at time t predict y at time t+l? r_xy(l) for
    * l ∈ [−maxLag, maxLag], normalized by the full-series standard
    * deviations (the Box–Jenkins sample CCF), so a peak at positive l
    * reads "x leads y by l steps".
    *
    * Same exactness contract as [[acf]]: 6dp DECIMAL deviations,
    * DECIMAL(38,12) product sums, one IEEE division per lag rounded
    * 6dp, NULL on zero variance or no pairs. All 2·maxLag+1 shifted
    * columns ride ONE WindowExec; the series shuffles twice total. */
  def ccf(obs: DataFrame, keyCol: String, tCol: String,
      xCol: String, yCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val W = org.apache.spark.sql.expressions.Window
    val wOrd = W.partitionBy(col(keyCol)).orderBy(col(tCol))
    def mean(c: String, alias: String) = obs
      .groupBy(col(keyCol))
      .agg(sum(round(col(c), 6).cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("_s"),
        count(lit(1)).as("_n"))
      .select(col(keyCol),
        round(col("_s").cast("double") / col("_n").cast("double"), 6)
          .as(alias))
    val dev = obs
      .join(mean(xCol, "_mx"), Seq(keyCol))
      .join(mean(yCol, "_my"), Seq(keyCol))
      .withColumn("_dx",
        round(round(col(xCol), 6) - col("_mx"), 6).cast("decimal(18,6)"))
      .withColumn("_dy",
        round(round(col(yCol), 6) - col("_my"), 6).cast("decimal(18,6)"))
    val lagged = (-maxLag to maxLag).foldLeft(dev) { (df, l) =>
      val c = if (l >= 0) lead(col("_dy"), l).over(wOrd)
        else lag(col("_dy"), -l).over(wOrd)
      df.withColumn(s"_dy$l", c)
    }
    val stacked = lagged.select(col(keyCol), col("_dx"),
      explode(array((-maxLag to maxLag).map(l =>
        struct(lit(l).as("lag"), col(s"_dy$l").as("dl"))): _*)).as("s"))
      .select(col(keyCol), col("_dx"), col("s.lag").as("lag"),
        col("s.dl").as("_dl"))
    val den = dev.groupBy(col(keyCol))
      .agg(sum((col("_dx") * col("_dx")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("_sxx"),
        sum((col("_dy") * col("_dy")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("_syy"))
    stacked
      .groupBy(col(keyCol), col("lag"))
      .agg(count(col("_dl")).as("n_pairs"),
        sum((col("_dx") * col("_dl")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("_sp"))
      .join(den, Seq(keyCol))
      .select(col(keyCol), col("lag"), col("n_pairs"),
        when(col("n_pairs") > 0 && col("_sxx") > 0 && col("_syy") > 0,
          round(col("_sp").cast("double") /
            sqrt(col("_sxx").cast("double") * col("_syy").cast("double")),
            6)).as("ccf"))
  }

  /** Classical additive seasonal decomposition (SURVEY.md §2 R40):
    * value = trend + seasonal + residual per series key — the
    * time-series triage every metrics pipeline runs before alerting on
    * a raw number (is the spike a trend break, or just Tuesday?).
    *
    * Textbook construction (Hyndman & Athanasopoulos, FPP §6.3 —
    * public knowledge; the reference has no decomposition operator):
    * trend is the centered moving average over one full `period` (odd
    * period → plain ±h window; even period → the standard 2×m MA with
    * half-weighted endpoints, i.e. (x₋ₕ/2 + Σ₋ₕ₊₁..ₕ₋₁ x + xₕ/2)/p);
    * seasonal is the per-phase mean of the detrended values, centered
    * so one period's seasonal effects sum to ~0; residual is what's
    * left. Phase is CALENDAR-ANCHORED — `tCol` mod period on an
    * integer bucket index — so a gap in the series cannot rotate every
    * later observation into the wrong phase (a row_number phase
    * would). Trend windows are ROWS-based and emitted only where the
    * full period is present: edges and gap-adjacent rows get honest
    * NULLs, never a partial-window fabrication. Input should be a
    * regular (densified) series — [[resampleFfill]] is the upstream
    * densifier when it isn't.
    *
    * Cross-engine determinism (§6 discipline): values round 6dp and
    * accumulate as DECIMAL(38,6) inside every window/group sum (exact,
    * order-free), each mean is ONE IEEE division of exactly-agreed
    * operands rounded 6dp, and the final subtractions are IEEE ops on
    * exact 6dp operands — bit-equal in any engine.
    *
    * Scale: two window passes over the series key (ROWS-bounded
    * O(period) frames plus one lag/lead pair), one (key, phase)
    * partial-agg'd groupBy whose output is keys×period rows, a
    * period-bounded per-key window on that tiny frame, and one join
    * back on (key, phase) that AQE broadcasts. Parallelism is the
    * number of series; a single series never shuffles twice.
    */
  /** One-sided CUSUM mean-shift detection (SURVEY.md §2 R42; Page
    * 1954, public textbook) — the CHANGE-POINT member of the
    * monitoring family: [[rollingZScore]] flags single outliers, this
    * one accumulates small persistent drifts until they cross h.
    *
    * The textbook recursion S_i = max(0, S_{i−1} + (x_i − μ − k)) is
    * NOT a window function — but its closed form is: with
    * C_i = Σ_{j≤i} (x_j − μ − k), S_i = C_i − min(0, C_1..C_i). Both
    * prefix sums are key-partitioned cumulative windows, so the whole
    * detector is two window passes, no recursion, no UDF. The downward
    * side runs the same identity on −x. μ is the per-key series mean
    * (two-pass: one aggregate + broadcast join); `slack` k and
    * threshold `h` are in value units.
    *
    * Cross-engine exactness: x rounds 6dp into DECIMAL cumulative sums
    * (exact, order-free along the mandatory (t) window order), μ is
    * one IEEE division rounded 6dp, C_i = round(Σx − i·(μ+k), 6) is
    * IEEE on exactly-agreed operands, and min/max over agreed doubles
    * are exact — every emitted number is bit-equal in any engine.
    *
    * Scale: one aggregate + two window passes, all partitioned by the
    * series key; frames are cumulative (running state O(1) per row).
    */
  def cusum(obs: DataFrame, keyCol: String, tCol: String,
      valCol: String, slack: Double = 0.5,
      threshold: Double = 5.0, target: Option[Double] = None): DataFrame = {
    // (key, t) must be unique — the cumulative windows below have no
    // tie-break, and a tied t would make the running sums order-defined.
    // `target` = the classic SPC mode (monitor vs a KNOWN process mean
    // — the causal form the streaming twin can replay online); None =
    // retrospective mode, μ estimated per key from the full series.
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(W.unboundedPreceding, 0)
    val k6 = math.rint(slack * 1e6) / 1e6
    val withMu = target match {
      case Some(t0) =>
        obs.withColumn("_mu", lit(math.rint(t0 * 1e6) / 1e6))
      case None =>
        val mu = obs
          .groupBy(col(keyCol))
          .agg(sum(round(col(valCol), 6).cast("decimal(18,6)"))
              .cast("decimal(38,6)").as("_sx"),
            count(lit(1)).as("_n"))
          .select(col(keyCol),
            round(col("_sx").cast("double") / col("_n").cast("double"), 6)
              .as("_mu"))
        obs.join(mu, Seq(keyCol))
    }
    val withC = withMu
      .withColumn("_i", count(lit(1)).over(wCum))
      .withColumn("_cs",
        sum(round(col(valCol), 6).cast("decimal(18,6)")).over(wCum)
          .cast("decimal(38,6)"))
      .withColumn("c_up",
        round(col("_cs").cast("double")
          - col("_i") * (col("_mu") + lit(k6)), 6))
      .withColumn("c_dn",
        round(-col("_cs").cast("double")
          + col("_i") * (col("_mu") - lit(k6)), 6))
    withC
      .withColumn("cusum_up",
        round(col("c_up") - least(lit(0.0), min(col("c_up")).over(wCum)),
          6))
      .withColumn("cusum_dn",
        round(col("c_dn") - least(lit(0.0), min(col("c_dn")).over(wCum)),
          6))
      .withColumn("flagged",
        col("cusum_up") > threshold || col("cusum_dn") > threshold)
      .drop("_mu", "_i", "_cs", "c_up", "c_dn")
  }

  /** Autocorrelation function at lags 1..`maxLag` per series key
    * (SURVEY.md §2 R43) — the seasonality/memory diagnostic that tells
    * you WHICH period [[seasonalDecompose]] should use and whether
    * [[ewma]]'s smoothing is even warranted. Standard estimator:
    * r(l) = Σᵢ (xᵢ−x̄)(xᵢ₊ₗ−x̄) / Σᵢ (xᵢ−x̄)² with the full-series mean
    * and denominator (the Box–Jenkins convention — denominators do NOT
    * shrink with the lag).
    *
    * Cross-engine exactness: deviations d = round(x6 − x̄6, 6) are IEEE
    * on exactly-agreed operands; every product d·d_lag accumulates as
    * DECIMAL(38,12) (exact, order-free); acf = ONE IEEE division
    * rounded 6dp. NULL when the series is constant (zero variance) or
    * the lag has no pairs.
    *
    * Scale: one aggregate for the mean, ONE lag-window pass producing
    * all maxLag shifted columns in a single WindowExec (then a stack
    * explode), one (key, lag) partial-agg'd aggregate. The series
    * shuffles twice (mean join + window), never per-lag. */
  def acf(obs: DataFrame, keyCol: String, tCol: String,
      valCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val wOrd = W.partitionBy(col(keyCol)).orderBy(col(tCol))
    val mu = obs
      .groupBy(col(keyCol))
      .agg(sum(round(col(valCol), 6).cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("_sx"),
        count(lit(1)).as("_n"))
      .select(col(keyCol),
        round(col("_sx").cast("double") / col("_n").cast("double"), 6)
          .as("_mu"))
    val dev = obs.join(mu, Seq(keyCol))
      .withColumn("_d",
        round(round(col(valCol), 6) - col("_mu"), 6)
          .cast("decimal(18,6)"))
    val lagged = (1 to maxLag).foldLeft(dev) { (df, l) =>
      df.withColumn(s"_d$l", lag(col("_d"), l).over(wOrd))
    }
    val stacked = lagged.select(col(keyCol), col("_d"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"), col(s"_d$l").as("dl"))): _*)).as("s"))
      .select(col(keyCol), col("_d"), col("s.lag").as("lag"),
        col("s.dl").as("_dl"))
    val den = dev.groupBy(col(keyCol))
      .agg(sum((col("_d") * col("_d")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").as("_ss"))
    stacked
      .groupBy(col(keyCol), col("lag"))
      .agg(count(col("_dl")).as("n_pairs"),
        sum((col("_d") * col("_dl")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("_sp"))
      .join(den, Seq(keyCol))
      .select(col(keyCol), col("lag"), col("n_pairs"),
        when(col("n_pairs") > 0 && col("_ss") > 0,
          round(col("_sp").cast("double") / col("_ss").cast("double"), 6))
          .as("acf"))
  }

  /** Exact HALF_UP(numer6/den) at 6dp, as a double. `numer6` is a
    * DECIMAL(*,6) exact value, `den` a positive integral column. The
    * quotient rounds via INTEGER arithmetic at micros scale — numer·1e6
    * is an exact integer, and the half-away-from-zero division
    * (2|M|+den) div (2·den) uses the pmod trick so the only decimal
    * division ever executed has an exactly-divisible numerator, which
    * every engine's scale/rounding rule maps to the same integer. A
    * plain round(numer/den, 6) is NOT cross-engine safe: when the
    * rational sits exactly on a .5e-6 boundary (common — per-phase
    * sums over 3–4 rows), Java's shortest-repr HALF_UP and DuckDB's
    * exact-binary round diverge by 1e-6 (the §6 hazard this operator's
    * r11 SQL-twin oracle caught on the odd-period branch). */
  private def roundDiv6(numer6: Column, den: Column): Column = {
    val m = (numer6 * lit(1000000)).cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    val num = abs(m) * 2 + d
    val d2 = d * 2
    val q = ((num - pmod(num, d2)) / d2).cast("decimal(38,0)")
    when(m < 0, -q).otherwise(q).cast("double") / lit(1e6)
  }

  def seasonalDecompose(obs: DataFrame, keyCol: String, tCol: String,
      valCol: String, period: Int = 24): DataFrame = {
    require(period >= 3, "period must be >= 3")
    val h = period / 2
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val v6 = round(col(valCol), 6).cast("decimal(18,6)")
    val trend =
      if (period % 2 == 1) {
        val w = wOrd.rowsBetween(-h, h)
        // count AND span: a ROWS frame slides blindly across a gap, so
        // both conditions are needed for "period CONSECUTIVE buckets"
        when(count(col("_v6")).over(w) === period &&
            max(col(tCol)).over(w) - min(col(tCol)).over(w)
              === period - 1,
          roundDiv6(sum(col("_v6")).over(w).cast("decimal(38,6)"),
            lit(period)))
      } else {
        // 2×m MA: double every weight so the accumulator stays integral
        // in DECIMAL — (2·Σ inner + lo + hi) / 2p, rounded exactly.
        val wIn = wOrd.rowsBetween(-(h - 1), h - 1)
        val lo = lag(col("_v6"), h).over(wOrd)
        val hi = lead(col("_v6"), h).over(wOrd)
        when(count(col("_v6")).over(wIn) === period - 1 &&
            max(col(tCol)).over(wIn) - min(col(tCol)).over(wIn)
              === period - 2 &&
            lag(col(tCol), h).over(wOrd) === col(tCol) - h &&
            lead(col(tCol), h).over(wOrd) === col(tCol) + h,
          roundDiv6((sum(col("_v6")).over(wIn).cast("decimal(38,6)") * 2 +
            lo + hi).cast("decimal(38,6)"), lit(2 * period)))
      }
    val withTrend = obs
      .withColumn("_v6", v6)
      .withColumn("trend", trend)
      .withColumn("phase", pmod(col(tCol), lit(period)))
    val seasRaw = withTrend
      .filter(col("trend").isNotNull)
      .withColumn("_det",
        round(col("_v6").cast("double") - col("trend"), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(keyCol), col("phase"))
      .agg(sum(col("_det")).cast("decimal(38,6)").as("_ds"),
        count(lit(1)).as("_dn"))
      .withColumn("_seas_raw", roundDiv6(col("_ds"), col("_dn")))
    val wKey = Window.partitionBy(col(keyCol)) // ≤ period rows per key
    val seasonal = seasRaw
      .withColumn("_mean",
        roundDiv6(sum(col("_seas_raw").cast("decimal(18,6)")).over(wKey)
            .cast("decimal(38,6)"),
          count(lit(1)).over(wKey)))
      .select(col(keyCol), col("phase"),
        round(col("_seas_raw") - col("_mean"), 6).as("seasonal"))
    withTrend
      .join(seasonal, Seq(keyCol, "phase"), "left")
      .withColumn("residual",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          round(col("_v6").cast("double") - col("trend")
            - col("seasonal"), 6)))
      .drop("_v6")
  }
}
