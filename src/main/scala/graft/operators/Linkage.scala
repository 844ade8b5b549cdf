package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Entity resolution / record linkage ACROSS relations (SURVEY.md §2
  * R28) — the warehouse job the within-table dedup family (P4c) can't
  * express: every dirty record matched to its best-scoring candidate
  * in a clean registry, NULL when nothing clears the threshold. The
  * reference serves this class through repeated relational self-joins;
  * here candidate BLOCKING is a measured two-regime switch and the
  * exact verify + argmax are regime-independent:
  *
  *  - **prefix leg** (exact, the default regime): the prefix-filter
  *    machinery of [[graft.pipeline.Dedup.allPairsJaccard]]
  *    generalized to TWO sides — both relations' shingle tables share
  *    ONE df order (computed over the union; any common total order
  *    satisfies the prefix-filter principle), candidates come only
  *    from cross-side prefix collisions, and the length + PPJoin
  *    positional filters apply with the same integer basis-point
  *    arithmetic. Above the threshold the candidate set has RECALL 1,
  *    so the blocked argmax EQUALS the exact full-cross-product argmax
  *    — which is precisely what the oracle computes with no blocking.
  *
  *  - **band leg** (the saturated-vocabulary escape hatch): at low τ
  *    on a df-saturated vocabulary the prefix principle stops
  *    filtering — prefix length ≈ sz·(1−τ)+1 covers half of every
  *    record at τ=0.5, and when most tokens are high-df the collision
  *    mass approaches the cross product (the r8 5×-probe finding:
  *    exponent 0.90, the steepest in the repo). The escape is to stop
  *    blocking on CONTENT frequency and block on SIMILARITY instead:
  *    the P2c minhash band index ([[Dedup.minhashBandRows]]'s exact
  *    construction — same [[Dedup.affineConstants]], same band fold,
  *    so a stored registry index is reusable here) built over both
  *    sides, cross-side bucket collisions only, hot buckets capped.
  *    Banding is probabilistic: with the 64-hash/32-band (r=2)
  *    default, a true τ=0.5 best match collides in ≥1 of 32 bands
  *    with probability 1−(1−0.5²)³² ≈ 0.9999 (and higher above τ), so
  *    the blocked argmax equals the exact argmax except with
  *    vanishing probability — the P2b/P2c recall discipline, spec-
  *    asserted band-vs-prefix on the driver corpus.
  *
  * The regime is SELECTED BY MEASUREMENT, not configuration: the df
  * saturation probe is the MEDIAN df over the union df table (the
  * table the prefix leg orders by anyway) — one token-cardinality
  * aggregate, nearly free. On a Zipf vocabulary (real text) most
  * token TYPES are rare, so the median df sits at 1–2 no matter how
  * big the head dfs get, and the prefix leg keeps recall-1 exactness;
  * on a saturated vocabulary the median tracks occurrences/vocab and
  * grows without bound. Measured on the er_match shape: median 2 at
  * sf0.01 (prefix mass 4/record), 12 at sf0.1 (33/record, legs
  * equal-cost), 59 on the 5× GenScale twin (192/record, the r8
  * blow-up) — the default threshold 32 sits mid-regime.
  *
  * Tie rule: best match = (jaccard 6dp DESC, clean id ASC), exact in
  * both engines.
  *
  * Scale: no cross product anywhere — one df groupBy over both token
  * tables, per-record prefix slices (or N·bands fixed-width band
  * rows), a blocking equi-join, an output-proportional exact verify,
  * one argmax partial-agg keyed by the high-cardinality dirty id.
  */
object Linkage extends org.apache.spark.internal.Logging {

  /** `dirty` needs (dirty_id, text); `clean` needs (clean_id, text).
    * Returns one row per dirty record: (dirty_id, match_id, sim) with
    * NULLs when no clean record reaches `threshold`.
    *
    * `strategy`: "auto" (measured switch, default), "prefix" (force
    * the exact leg), "bands" (force the minhash leg). */
  def matchEntities(dirty: DataFrame, clean: DataFrame,
      threshold: Double = 0.5, strategy: String = "auto",
      medianDfThreshold: Int = 32,
      numHashes: Int = 64, bands: Int = 32,
      maxBucketDf: Int = 2000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    require(Set("auto", "prefix", "bands")(strategy),
      s"unknown strategy '$strategy'")
    val tauBp = math.round(threshold * 10000).toInt
    val dTok = dirty.select(col("dirty_id").as("rid"),
        explode(Dedup.shingleHashes(col("text"))).as("h"))
      .persist()
    val cTok = clean.select(col("clean_id").as("rid"),
        explode(Dedup.shingleHashes(col("text"))).as("h"))
      .persist()
    // per-record shingle counts — both legs' size filter needs them
    def sizes(tok: DataFrame): DataFrame =
      tok.groupBy("rid").agg(count(lit(1)).as("sz"))

    // token-cardinality, consumed by the probe AND the prefix leg's
    // two sides — without the persist it recomputes per consumer
    val dfTab = dTok.select("h").unionAll(cTok.select("h"))
      .groupBy("h").agg(count(lit(1)).as("df")).persist()

    val cand: DataFrame = {
      def prefixSide(tok: DataFrame): DataFrame =
        tok.join(dfTab, Seq("h"))
          .groupBy("rid")
          .agg(sort_array(collect_list(struct(col("df"), col("h"))))
            .as("ord"), count(lit(1)).as("sz"))
          .withColumn("p",
            (col("sz") - floor((col("sz") * tauBp + lit(9999)) / lit(10000.0))
              + 1).cast("int"))
          .select(col("rid"), col("sz"),
            posexplode(slice(col("ord"), lit(1), col("p"))))
          .select(col("rid"), col("sz"), col("col.h").as("h"),
            (col("pos") + 1).as("rn"))

      val useBands = strategy match {
        case "prefix" => false
        case "bands" => true
        case _ =>
          // the MEASURED regime decision: median df over the shared df
          // table — one aggregate at token-type cardinality (see the
          // object scaladoc for why the MEDIAN is the right saturation
          // statistic and how the default threshold was calibrated).
          // A NULL median (both inputs empty / all-NULL text) defaults
          // to the exact prefix leg — the recall-1 choice, and the one
          // that costs nothing on an empty token table.
          val medRow = dfTab.agg(expr("median(df)")).head()
          !medRow.isNullAt(0) && medRow.getDouble(0) > medianDfThreshold
      }

      if (!useBands) {
        val pd = prefixSide(dTok).persist()
        val pc = prefixSide(cTok).persist()
        val c = pd
          .select(col("h"), col("rid").as("d_id"), col("sz").as("sz_d"),
            col("rn").as("rn_d"))
          .join(pc.select(col("h"), col("rid").as("c_id"),
            col("sz").as("sz_c"), col("rn").as("rn_c")), Seq("h"))
          .filter(col("sz_c") * 10000 >= col("sz_d") * tauBp
            && col("sz_d") * 10000 >= col("sz_c") * tauBp)
          .filter(lit(1) + least(col("sz_d") - col("rn_d"),
              col("sz_c") - col("rn_c"))
            >= ceil((col("sz_d") + col("sz_c")) * tauBp
              / lit((10000 + tauBp).toDouble)))
          .select("d_id", "c_id", "sz_d", "sz_c").distinct()
          .localCheckpoint()
        pd.unpersist(); pc.unpersist()
        c
      } else {
        // minhash band blocking: the P2c index construction on both
        // sides (identical constants/fold — a registry that persisted
        // minhashBandRows at ingest is joinable here unre-shingled)
        def bandSide(tok: DataFrame): DataFrame = {
          val sh = tok.withColumnRenamed("rid", "doc_id")
          Dedup.sigBandRows(
            Dedup.minhashSignatures(sh, numHashes = numHashes,
              shingled = Some(sh)),
            numHashes, bands)
        }
        val dB = bandSide(dTok)
        val cB = bandSide(cTok).persist()
        // degenerate-bucket guard on the registry side (the
        // incrementalMinhashCandidates cap): a bucket holding half the
        // registry blocks nothing and would explode the join
        val cool = cB.groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("n")).filter(col("n") <= maxBucketDf)
          .select("band_idx", "band_hash")
        val c = dB.select(col("band_idx"), col("band_hash"),
            col("doc_id").as("d_id"))
          .join(cB.join(cool, Seq("band_idx", "band_hash"))
            .select(col("band_idx"), col("band_hash"),
              col("doc_id").as("c_id")),
            Seq("band_idx", "band_hash"))
          .select("d_id", "c_id").distinct()
          .join(sizes(dTok).select(col("rid").as("d_id"),
            col("sz").as("sz_d")), Seq("d_id"))
          .join(sizes(cTok).select(col("rid").as("c_id"),
            col("sz").as("sz_c")), Seq("c_id"))
          // the same lossless length filter the prefix leg applies
          .filter(col("sz_c") * 10000 >= col("sz_d") * tauBp
            && col("sz_d") * 10000 >= col("sz_c") * tauBp)
          .select("d_id", "c_id", "sz_d", "sz_c")
          .localCheckpoint()
        cB.unpersist()
        c
      }
    }

    // exact verify + argmax — identical for both legs
    val inter = cand.select("d_id", "c_id")
      .join(dTok.select(col("rid").as("d_id"), col("h")), Seq("d_id"))
      .join(cTok.select(col("rid").as("c_id"), col("h")), Seq("c_id", "h"))
      .groupBy("d_id", "c_id").agg(count(lit(1)).as("inter"))
    val best = cand.join(inter, Seq("d_id", "c_id"))
      .select(col("d_id"), col("c_id"),
        round(col("inter").cast("double") /
          (col("sz_d") + col("sz_c") - col("inter")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      // argmax: sim DESC then clean id ASC, as one struct max
      .groupBy("d_id")
      .agg(max(struct(col("sim"), (-col("c_id")).as("nc"))).as("m"))
      .select(col("d_id"),
        (-col("m.nc")).as("match_id"), col("m.sim").as("sim"))
    val out = dirty.select(col("dirty_id"))
      .join(best.withColumnRenamed("d_id", "dirty_id"), Seq("dirty_id"),
        "left")
      .localCheckpoint()
    dTok.unpersist()
    dfTab.unpersist()
    cTok.unpersist()
    out
  }

  /** Edit-distance similarity self-join (SURVEY.md §2 R47; the
    * PassJoin segment scheme, Li/Deng/Feng EDBT 2011 — public): all
    * id pairs whose strings are within Levenshtein distance `k`,
    * WITHOUT the n² cross join. [[matchEntities]] and the
    * [[graft.pipeline.Dedup]] family block on token sets — this is
    * the CHARACTER-level metric they can't express (typos, OCR noise,
    * ID transcription errors).
    *
    * Blocking (recall 1 by pigeonhole): each INDEX string of length L
    * splits into k+1 contiguous segments; k edits can touch at most k
    * of them, so one segment survives verbatim in any string within
    * distance k, displaced by at most the net indel count ∈ [−k, k].
    * Each PROBE string of length M therefore emits, for every source
    * length L ∈ [M−k, M+k] and segment index i, the substrings of the
    * (L, i) segment length at positions p_i(L)±k. Candidates join on
    * the exact (L, i, substring) key; the verify is one codegen'd
    * `levenshtein` per DISTINCT candidate pair — output-proportional
    * when segments are selective.
    *
    * Honest regime note (the [[matchEntities]] df-saturation
    * discipline): selectivity is the SEGMENTS' entropy. On strings
    * sharing a long constant prefix (ID columns like "Customer#…"),
    * the prefix segment degenerates to a full length-block and the
    * candidate mass approaches n² — same answer, no speedup. Since
    * r10 this regime is MEASURED, not just documented: the probe is
    * the df-WEIGHTED mean bucket size Σdf²/Σdf over the index's
    * (length, segment-idx, substring) keys — exactly the expected
    * collision count an index row meets, so it tracks the candidate
    * mass directly where a plain median would be drowned by the many
    * unique suffix keys. One aggregate over the n·(k+1)-row index
    * table the operator builds anyway; diverse strings score ~1, a
    * shared constant prefix pushes the statistic toward the
    * per-length group size, and past `warnSegmentDf` the operator
    * WARNS loudly (the allPairsJaccard discipline — the caller asked
    * for exact recall, so the plan stays exact, but the quadratic
    * candidate mass is no longer silent). Strings
    * shorter than k+1 produce empty segments that match by length
    * alone (the correct brute-force fallback for tiny strings).
    *
    * Scale: index O(n·(k+1)) rows, probe O(n·(k+1)(2k+1)²) rows
    * (distinct-deduped), one equi-join on the segment key, one
    * distinct pair frame, one narrow verify. No window, no iteration.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      k: Int = 2, warnSegmentDf: Int = 16): DataFrame = {
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    val k1 = k + 1
    // ids keep their ORIGINAL type end to end: an id cast (the r9 form
    // cast idCol to long) silently NULLs non-numeric ids — common in
    // entity resolution ("Customer#000001") — and the s_id =!= t_id
    // filter then drops every candidate, returning an empty result
    // instead of failing. least/greatest only need an orderable type,
    // which every Spark atomic type is.
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull && col("id").isNotNull)
      .localCheckpoint() // two consumers: index and probe
    def segStart(iExpr: String, lExpr: String) =
      s"(($iExpr * $lExpr) div $k1)"
    val segLen = (i: String, l: String) =>
      s"(${segStart(s"($i + 1)", l)} - ${segStart(i, l)})"
    // ids ONLY ride the candidate join and distinct (r13 — the r5
    // minhashPairs lesson applied here): the strings come back via two
    // narrow id joins AFTER the pair set is deduped, so the dominant
    // shuffle (candidate pairs, which the EditDistProbe measured
    // saturating toward n² on low-entropy corpora) carries 16 bytes
    // per row instead of two 32-char strings. Measured at the 25×
    // probe tier: 90.8 → 45.0 s steady (exponent 1.04 → 0.88),
    // identical result set.
    val idx = base.select(col("id").as("s_id"),
      length(col("s")).as("l"),
      explode(expr(
        s"""transform(sequence(0, $k), i -> named_struct(
             'gi', i,
             'sub', substring(s, ${segStart("i", "length(s)")} + 1,
               ${segLen("i", "length(s)")})))""")).as("seg"))
      .select(col("s_id"), col("l"),
        col("seg.gi").as("gi"), col("seg.sub").as("sub"))
    // segment-entropy probe: Σdf²/Σdf = the expected collision count
    // per index row (NULL-safe on an empty input, the family guard)
    val medRow = idx.groupBy(col("l"), col("gi"), col("sub"))
      .agg(count(lit(1)).as("df"))
      .agg((sum(col("df") * col("df")).cast("double") / sum(col("df")))
        .as("wdf")).head()
    val medDf = if (medRow.isNullAt(0)) 0.0 else medRow.getDouble(0)
    if (medDf > warnSegmentDf)
      logWarning(f"editDistancePairs: df-weighted segment bucket size " +
        f"$medDf%.0f " +
        "is in the shared-prefix/low-entropy regime — segment blocking " +
        "degenerates toward a length-block and the candidate mass " +
        "approaches n^2 (same exact answer, no speedup). Strip the " +
        "shared prefix (or block on a higher-entropy slice) before " +
        "calling, or raise warnSegmentDf to silence.")
    val probe = base.select(col("id").as("t_id"),
      explode(expr(
        s"""flatten(flatten(
             transform(sequence(greatest(length(s) - $k, 0), length(s) + $k),
               L -> transform(sequence(0, $k), i ->
                 filter(
                   transform(sequence(${segStart("i", "L")} - $k,
                       ${segStart("i", "L")} + $k),
                     p -> named_struct('l', L, 'gi', i, 'p', p,
                       'sub', substring(s, p + 1, ${segLen("i", "L")}))),
                   x -> x.p >= 0
                     and x.p + ${segLen("i", "L")} <= length(s))))))"""))
        .as("pr"))
      .select(col("t_id"), col("pr.l").as("l"),
        col("pr.gi").as("gi"), col("pr.sub").as("sub"))
      .distinct() // same substring at several shifts → one probe key
    val pairs = idx.join(probe, Seq("l", "gi", "sub"))
      .filter(col("s_id") =!= col("t_id"))
      .select(
        least(col("s_id"), col("t_id")).as("a_id"),
        greatest(col("s_id"), col("t_id")).as("b_id"))
      .distinct()
    val out = pairs
      .join(base.select(col("id").as("a_id"), col("s").as("a_s")),
        Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("s").as("b_s")),
        Seq("b_id"))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .filter(col("dist") <= k)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(base)
    out
  }
}
