package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as join/aggregate rounds — the Pregel
  * pattern expressed in DataFrames (each superstep = one edge⋈rank
  * join + one destination-keyed aggregate), the same decomposition
  * GraphX/Pregel lower to but kept in Catalyst so AQE, codegen, and
  * shuffle reuse all apply. The reference serves this class through
  * repeated self-joins over its relational layer (omniscidb
  * QueryEngine RelAlgExecutor re-entrant execution); a native
  * fixed-point operator is deliberately NOT introduced — a bounded
  * unrolled loop of standard shuffles is the plan a 1000-executor
  * cluster wants.
  */
object Graph extends org.apache.spark.internal.Logging {

  /** PageRank over an undirected edge list, a fixed number of
    * power-iteration rounds (damping `d`):
    * `r'(v) = (1−d)/N + d · Σ_{u→v} r(u)/deg(u)`.
    * `edges` needs (src, dst) — each undirected edge listed ONCE; both
    * directions are derived. Returns (node_id, rank) for every node,
    * rank rounded 8dp.
    *
    * Cross-engine determinism: every per-edge contribution rounds at
    * 12dp and the per-node sum runs as DECIMAL(20,12) — exact and
    * order-free, so no float-summation ordering can diverge between
    * engines (the [[graft.pipeline.Packing.temperatureMixture]]
    * decimal-sum idiom); the damping update is then a single double
    * expression on the exact sum, re-rounded 12dp per round.
    *
    * Scale: per round, ONE shuffle — ranks join edges on src (ranks =
    * one row per node: broadcast-able until the node set itself is
    * huge, after which AQE falls back to a hash join co-partitioned
    * with the NEXT round's dst aggregate), then a partial-agg'd
    * groupBy(dst). Degrees are computed once and ride inside the rank
    * frame, so no second join per round. Iterations are UNROLLED
    * (fixed `iters`, the bounded-analytics contract) with a
    * localCheckpoint per round to truncate lineage — the
    * [[graft.pipeline.Dedup]] connected-components discipline.
    *
    * The bidirectional edge frame itself is localCheckpoint'd ONCE
    * before the loop: `edges` is usually derived (a fact join +
    * distinct), and without materialization every superstep — and the
    * degree pass — would re-execute that full lineage. At 100 TB that
    * is iters+1 re-scans and re-shuffles of the fact tables; with the
    * checkpoint the derivation runs exactly once and each round reads
    * the materialized (src, dst) blocks. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      d: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val deg = bidir.groupBy(col("src").as("node_id"))
      .agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("node_id"), col("deg"), col("n_nodes"),
        round(lit(1.0) / col("n_nodes"), 12).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = bidir
        .join(ranks.withColumnRenamed("node_id", "src"), Seq("src"))
        .select(col("dst").as("node_id"),
          round(col("rank") / col("deg"), 12)
            .cast("decimal(20,12)").as("contrib"))
      val sums = contrib.groupBy("node_id")
        .agg(sum(col("contrib")).as("in_mass"))
      val next = ranks.select(col("node_id"), col("deg"), col("n_nodes"))
        .join(sums, Seq("node_id"))
        .select(col("node_id"), col("deg"), col("n_nodes"),
          round(lit(1.0 - d) / col("n_nodes")
            + lit(d) * col("in_mass").cast("double"), 12).as("rank"))
        .localCheckpoint()
      // eager checkpoint: next is materialized, so the previous
      // round's blocks can retire (the r9 25× loop-lifecycle rule)
      org.apache.spark.sql.GraftShim.releaseCheckpoint(ranks)
      ranks = next
    }
    ranks.select(col("node_id"), col("deg"), round(col("rank"), 8).as("rank"))
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation WITH pointer jumping: every node starts as
    * its own label; each round a node takes the minimum label among
    * itself and its neighbors (hash-to-min), then chases its label's
    * label (pointer doubling); stop when no label changes (or
    * `maxIters`). Returns (node_id, component) for every node WITH at
    * least one edge — component = min node id in the group. Callers
    * with isolated entities re-attach them with a left join + coalesce
    * (see [[graft.pipeline.Dedup.connectedComponents]], which
    * delegates here — the dedup keep decision and the relational graph
    * query run ONE implementation).
    *
    * Why the jump step: one-hop min-label alone needs O(diameter)
    * rounds — measured 19 rounds on the sf0.1 territory-sharded order
    * graph (long chains), and a 100 TB graph's diameter is unbounded.
    * Labels only ever DECREASE and always hold a node id of the same
    * component, so `label(label(v))` is both safe and ≤ `label(v)`;
    * composing it with hash-to-min roughly doubles propagation
    * distance per round (measured: 19 → 15 rounds on the same graph;
    * deep-path spec converges well inside the diameter). The trade is
    * scale-honest: each saved round removes a full EDGE shuffle, and
    * the jump adds only a LABEL-frame self-join (one row per node —
    * the small frame of the round); at sf0.1 the extra per-round jobs
    * roughly offset the saved rounds, at real scale edges ≫ labels.
    * r16: the hash-min frame is NOT checkpointed mid-round — the jump
    * self-join references the same canonical subtree twice and
    * ReuseExchange/AQE stage reuse computes the neighbor shuffle once
    * per round (pinned by PlanSpec), one materialize-everything job
    * fewer per round.
    * (A second chained jump was tried and reverted: it sent Catalyst's
    * size-in-bytes stats estimation into multi-thousand-bit BigInt
    * products at sf0.1 — planning time swamped execution.)
    * Lineage: labels and edges localCheckpoint per round (the
    * [[pageRank]] materialization discipline); the convergence probe
    * rides the SAME frame as the update, so it costs a count, not a
    * second join. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 40): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // r16: round 1 folded into the init — against IDENTITY labels the
    // neighbor-min is just min(dst) per src (no join at all), and every
    // edge-bearing node appears as src in bidir, so the node set is the
    // same frame the old distinct() built. One full edge⋈labels round
    // removed for free.
    var labels = org.apache.spark.sql.GraftShim.statsBarrier(
      bidir.groupBy(col("src").as("node_id"))
        .agg(min(col("dst")).as("nbr_min"))
        .select(col("node_id"),
          least(col("node_id"), col("nbr_min")).as("component"))
        .localCheckpoint())
    var iter = 1
    var converged = false
    while (iter < maxIters && !converged) {
      val neighborMin = bidir
        .join(labels, bidir("dst") === labels("node_id"))
        .groupBy(bidir("src").as("node_id"))
        .agg(min(col("component")).as("nbr_min"))
      val t0 = System.nanoTime()
      val hashMin = labels.join(neighborMin, Seq("node_id"), "left")
        .select(col("node_id"), col("component"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("mid"))
      // pointer jump: label(label(v)) under THIS round's mapping — mid
      // always holds a node id (labels start as ids and only move by
      // least() over other labels), so the inner join is total.
      // r16: the hash-min frame is NO LONGER checkpointed mid-round —
      // the jump self-join references the same canonical subtree on
      // both sides, and ReuseExchange/AQE stage reuse computes the
      // neighbor shuffle once. That removes one materialize-everything
      // job per round (measured: 15×(hashmin 0.30 + jump 0.15 + count
      // 0.06) → 14×(step 0.42 + count 0.05) at sf0.1, q62 9.6 → 7.2 s
      // steady). A second chained jump was re-tried under the stats
      // barrier and measured round-count-neutral — the convergence
      // tail is graph-hop-bound, not label-tree-bound — so it stays
      // out.
      val parents = hashMin.select(col("node_id").as("p_id"),
        col("mid").as("p_comp"))
      // stats barrier (GraftShim scaladoc): the jump self-join squares
      // the propagated sizeInBytes each round — without the barrier,
      // plan-time BigInt arithmetic doubles in bit-length per
      // iteration and dominates wall time by round ~16 (measured 5×
      // probe: 0.13 s → 23.8 s per jump on FLAT data)
      val step = org.apache.spark.sql.GraftShim.statsBarrier(
        hashMin.join(parents, col("mid") === col("p_id"))
          .select(col("node_id"), col("component"),
            least(col("mid"), col("p_comp")).as("next_component"))
          .localCheckpoint())
      val t2 = System.nanoTime()
      val changed = step.filter(col("next_component") =!= col("component"))
        .count()
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        println(f"[cc] iter=$iter changed=$changed step=${(t2 - t0) / 1e9}%.2f count=${(System.nanoTime() - t2) / 1e9}%.2f s parts=${step.rdd.getNumPartitions}")
      // step is materialized (eager checkpoint + the count above) —
      // release the previous labels so checkpoint blocks don't
      // accumulate across rounds (the r9 25× kCore lesson, applied to
      // the whole loop family)
      org.apache.spark.sql.GraftShim.releaseCheckpoint(labels)
      labels = step.select(col("node_id"), col("next_component").as("component"))
      converged = changed == 0
      iter += 1
    }
    // an unconverged cutoff silently returns min-so-far labels, which
    // are NOT components — at scale that's a wrong answer dressed as a
    // result, so it must be loud (callers with a known-shallow graph
    // can still lower maxIters deliberately)
    if (!converged)
      logWarning(s"connectedComponents: not converged after $maxIters " +
        "rounds; labels are an upper approximation")
    labels
  }

  /** k-core extraction — the maximal subgraph where every node keeps
    * degree ≥ k — by iterative peeling (Matula & Beck 1983): drop all
    * nodes below degree k, recompute degrees on the surviving
    * subgraph, repeat to fixpoint. The fourth member of the graph
    * family ([[pageRank]] = centrality, [[connectedComponents]] =
    * reachability, [[triangles]] = local density, this one =
    * engagement/robustness — "the subcommunity that remains after
    * every marginal participant cascades out"). Returns (node_id,
    * core_deg) for the surviving nodes; core_deg ≥ k by construction.
    *
    * Peeling is inherently iterative (removing one node can strand its
    * neighbors — a chain peels one node per round), so the loop runs
    * the [[connectedComponents]] discipline verbatim: canonical edges
    * localCheckpoint ONCE (the input is usually a derived fact join
    * that must not re-execute), the live edge set localCheckpoints per
    * round behind a stats barrier, and the convergence probe rides the
    * SAME materialized frame as the update (a count, not a second
    * join). Per round: ONE partial-agg'd degree shuffle + two
    * node-frame semi joins — the edge frame only ever SHRINKS, so
    * round cost is monotone non-increasing; at 100 TB the first round
    * dominates and is exactly one degree aggregation over the edge
    * list. An unconverged maxIters cutoff returns a SUPERSET of the
    * k-core (peeling monotonically removes) and warns loudly — the
    * CC non-convergence contract. */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 40): DataFrame = {
    require(k >= 1, "k must be at least 1")
    var live = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()
    var nLive = live.count()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val keep = live.select(col("u").as("node_id"))
        .unionAll(live.select(col("v").as("node_id")))
        .groupBy("node_id").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("node_id"))
      val step = org.apache.spark.sql.GraftShim.statsBarrier(
        live
          .join(keep.select(col("node_id").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node_id").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
          .localCheckpoint())
      val after = step.count()
      // release the PREVIOUS round's checkpoint blocks: step has
      // materialized (eager checkpoint + the count above), so the old
      // frame is dead weight — at 25× scale the accumulated rounds
      // otherwise fill the storage pool and every later round pays
      // eviction churn (r9 probe: 9.9 s → 69–155 s at 25×, exponent
      // 1.21 with the leak, sub-linear without)
      org.apache.spark.sql.GraftShim.releaseCheckpoint(live)
      live = step
      converged = after == nLive
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        println(s"[kcore] iter=$iter edges=$nLive -> $after")
      nLive = after
      iter += 1
    }
    if (!converged)
      logWarning(s"kCore: not converged after $maxIters rounds; " +
        "result is a superset of the true k-core")
    live.select(col("u").as("node_id"))
      .unionAll(live.select(col("v").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("core_deg"))
  }

  /** Exact triangle counting + local clustering coefficient over an
    * undirected edge list — the third member of the graph family
    * (pageRank = centrality, connectedComponents = reachability,
    * triangles = local density). Returns one row per node WITH at
    * least one edge: (node_id, deg, n_triangles, clustering) where
    * clustering = 2·tri / (deg·(deg−1)) rounded 6dp (0.0 when
    * deg < 2). Self-loops and duplicate/reversed edge listings are
    * canonicalized away first.
    *
    * Algorithm: DEGREE-ORIENTED wedge closure (the MapReduce-era
    * standard, Suri & Vassilvitskii "Counting Triangles and the Curse
    * of the Last Reducer", WWW'11). Orient every canonical edge from
    * the (deg, id)-smaller endpoint to the larger; each triangle
    * {a<b<c} in that total order then appears EXACTLY once as wedge
    * (a→b, a→c) closed by oriented edge b→c — no per-triangle dedup,
    * no ÷6. The payoff is the fan-out bound: after orientation the
    * out-degree of ANY node is O(√m) (a node of degree d > √m only
    * points at nodes of degree ≥ d, and there are < 2√m of those), so
    * the wedge self-join — the quadratic step that kills naive
    * triangle counting on skewed graphs — generates O(m^{3/2}) rows
    * worst-case instead of Σ deg², star hubs included. That bound is
    * exactly why this survives a web-scale graph whose top hub has
    * 10^8 neighbors.
    *
    * Plan shape: canonical edges and the oriented table are each
    * localCheckpoint'd (canon feeds degree + orientation; oriented
    * feeds BOTH wedge legs and the closure probe — three consumers,
    * and the input `edges` is usually a derived fact join that must
    * not re-execute). The wedge order tie-breaks by (hi_deg, hi) so
    * the self-join emits each unordered wedge once; closure is one
    * equi-join on the composite (lo, hi) key; per-node counts explode
    * the three corners and partial-agg map-side. Cross-engine: all
    * counts are integers, the coefficient is a single IEEE division
    * on exact integers + one 6dp round — engine-identical. */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("u").as("node_id"))
      .unionAll(canon.select(col("v").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("deg"))
    // orient u—v from the (deg, id)-smaller endpoint; carry the head's
    // degree so the wedge self-join can order its two legs without a
    // second degree join
    val oriented = canon
      .join(deg.select(col("node_id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node_id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv")
            || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(col("du") < col("dv")
            || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("hi"),
        greatest(col("du"), col("dv")).as("hi_deg"))
      .localCheckpoint()
    val w1 = oriented.select(col("lo"), col("hi").as("b"),
      col("hi_deg").as("db"))
    val w2 = oriented.select(col("lo"), col("hi").as("c"),
      col("hi_deg").as("dc"))
    val wedges = w1.join(w2, Seq("lo"))
      .filter(col("db") < col("dc")
        || (col("db") === col("dc") && col("b") < col("c")))
    val tri = wedges.join(
        oriented.select(col("lo").as("b"), col("hi").as("c")),
        Seq("b", "c"))
      .select(col("lo").as("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node_id"), "left")
      .select(col("node_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1.0))), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Link-prediction candidate scoring over an undirected edge list
    * (SURVEY.md §2 R57; Liben-Nowell & Kleinberg CIKM'03, public) —
    * the FORWARD-looking member of the graph family: triangles
    * measures the closure that exists, this one ranks the closures
    * most likely to appear next (recommendation candidates, knowledge-
    * graph completion, "people you may know"). Scores every
    * NON-adjacent pair sharing at least one neighbor with the three
    * classic neighborhood heuristics and returns the top `topN` by
    * Adamic–Adar; `minCommonNeighbors` (default 1 = keep all) drops
    * the single-shared-neighbor noise floor BEFORE the anti-join and
    * ranking — on a co-occurrence graph that floor is routinely ~90%
    * of the candidate mass, so the threshold is the practical lever
    * between "every conceivable pair" and "the pairs worth ranking": (node_u, node_v, common_neighbors, jaccard,
    * adamic_adar, pref_attach).
    *
    * Candidates are wedge collisions: adjacency self-joined on the
    * center, existing edges removed by one anti-join — candidate mass
    * is Σ_w deg_w², and a single web-scale hub makes that quadratic,
    * so centers above `maxCenterDegree` are EXCLUDED with a LOUD
    * warning (the standard practice: a huge hub's evidence is the
    * weakest — 1/ln(deg) — and its wedge set the most expensive;
    * pairs whose ONLY shared neighbor is such a hub won't surface).
    * With the cap, candidate mass is ≤ cap·2m — linear in edges.
    *
    * Cross-engine: counts and degrees exact; each AA term rounds the
    * transcendental FIRST (ln(deg) 12dp — libm last-ulp differences
    * are real) then one agreed IEEE reciprocal rounded 12dp into a
    * DECIMAL(38,12) sum — order-free; jaccard is one IEEE division of
    * exact integers 6dp; ranking compares the EXACT decimal AA (ties
    * broken by the pair), so the topN cut is deterministic.
    *
    * Scale: canonical edges + degrees + capped adjacency each
    * localCheckpoint once; the wedge self-join and the (a, b, dw)
    * count aggregate are the only fat shuffles, both on hashed high-
    * cardinality keys (the wedge-mass aggregate is a primitive long
    * count; the exact decimal sum runs on the collapsed frame); the
    * final ranking is TakeOrderedAndProject, never a global sort. */
  def linkPredict(edges: DataFrame, topN: Int = 100,
      maxCenterDegree: Int = 10000,
      minCommonNeighbors: Int = 1): DataFrame = {
    require(topN > 0, "topN must be positive")
    require(maxCenterDegree >= 2, "maxCenterDegree must be >= 2")
    require(minCommonNeighbors >= 1, "minCommonNeighbors must be >= 1")
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("u").as("node_id"))
      .unionAll(canon.select(col("v").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val dropped = deg.filter(col("deg") > maxCenterDegree).count()
    if (dropped > 0) logWarning(
      s"linkPredict: $dropped wedge centers exceed maxCenterDegree=" +
        s"$maxCenterDegree and are excluded from candidate generation " +
        "— pairs whose only shared neighbors are such hubs will not " +
        "surface, and Adamic-Adar totals omit their (weakest) " +
        "1/ln(deg) terms. Raise maxCenterDegree to trade candidate " +
        "mass for completeness.")
    val adjC = canon.select(col("u").as("w"), col("v").as("x"))
      .unionAll(canon.select(col("v").as("w"), col("u").as("x")))
      .join(deg.select(col("node_id").as("w"), col("deg").as("dw")),
        Seq("w"))
      .filter(col("dw") <= maxCenterDegree)
      .localCheckpoint()
    val wedges = adjC.select(col("w"), col("dw"), col("x").as("a"))
      .join(adjC.select(col("w"), col("x").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
    // AA term: round the transcendental FIRST, then one agreed IEEE
    // reciprocal, 12dp — an exact DECIMAL(38,12). The aggregate over
    // the wedge mass is TWO-STAGE (r12): stage 1 counts wedges per
    // (a, b, dw) — a primitive codegen count, no per-wedge BigDecimal
    // boxing (the r11-measured GC-churn driver at the 25×-probe's
    // 57.8M-row wedge mass); stage 2 sums cnt·term as DECIMAL(38,12)
    // over the COLLAPSED frame (≤ one row per distinct common-neighbor
    // degree per pair), so the exact decimal sum has 38-digit headroom
    // and no long-overflow bound at all — a pair's wedge count is
    // limited only by its endpoints' (uncapped) degrees, which the
    // r11 single-stage 1e12-scaled long sum could overflow past
    // ~6.4e6 common neighbors.
    // type discipline: inv ∈ (0, 1/ln 2] fits decimal(14,12); cnt as
    // decimal(20,0) → product decimal(35,12) (35 = 20+14+1 ≤ 38, so
    // NO precision-loss adjustment — a wider operand pair would get
    // its scale silently cut to 6) and sum decimal(38,12), both exact
    val inv = round(lit(1.0) / round(
      org.apache.spark.sql.functions.log(col("dw").cast("double")), 12), 12)
      .cast("decimal(14,12)")
    // aggregate BEFORE the adjacency anti-join: the pair aggregate
    // shrinks the wedge mass ~3× (cn wedges per pair collapse to one
    // row), and the dropped adjacent pairs are at most m rows of the
    // aggregated frame — so the anti-join moves the small frame, not
    // the wedge stream
    val scored = wedges
      .groupBy(col("a"), col("b"), col("dw"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("cnt")).as("common_neighbors"),
        sum(col("cnt").cast("decimal(20,0)") * inv).as("_aa"))
      .filter(col("common_neighbors") >= minCommonNeighbors)
      .withColumn("_aa", col("_aa").cast("decimal(38,12)"))
      .join(canon.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
    // cut to topN FIRST (TakeOrderedAndProject over the pair frame —
    // the ranking needs only the aggregate's own columns), THEN join
    // degrees for the display metrics: the deg joins touch topN rows,
    // never the candidate-pair millions
    scored
      .orderBy(col("_aa").desc, col("a"), col("b"))
      .limit(topN)
      .join(deg.select(col("node_id").as("a"), col("deg").as("da")),
        Seq("a"))
      .join(deg.select(col("node_id").as("b"), col("deg").as("db")),
        Seq("b"))
      .select(col("a").as("node_u"), col("b").as("node_v"),
        col("common_neighbors"),
        round(col("common_neighbors").cast("double") /
          (col("da") + col("db") - col("common_neighbors")), 6)
          .as("jaccard"),
        round(col("_aa").cast("double"), 6).as("adamic_adar"),
        (col("da") * col("db")).cast("long").as("pref_attach"),
        col("_aa").as("_ord"))
      .orderBy(col("_ord").desc, col("node_u"), col("node_v"))
      .drop("_ord")
  }

  /** HITS hubs and authorities (SURVEY.md §2 R46; Kleinberg 1999,
    * public) — the DIRECTED prestige decomposition [[pageRank]]'s
    * single score can't express: a node can point AT all the right
    * places (hub) without being pointed at (authority). Fixed
    * `iters` mutual-reinforcement rounds: auth(v) = Σ_{u→v} hub(u),
    * hub(u) = Σ_{u→v} auth(v), each renormalized by its MAX.
    *
    * Max-normalization is chosen over the L2 norm deliberately: max
    * over exact DECIMAL sums is itself exact, so each round is one
    * IEEE division of exactly-agreed operands rounded 8dp — no sqrt,
    * no float summation anywhere, and the oracle replays every round
    * bit-for-bit (the [[pageRank]] decimal-contribution idiom, one
    * step stronger).
    *
    * Scale: per round two shuffles (edges⋈hub grouped by dst, then
    * edges⋈auth grouped by src), both partial-agg'd; the score frame
    * is one row per node (broadcast-able until the node set is huge);
    * eager checkpoint + release per round (the 25× loop-lifecycle
    * rule). Nodes with no in-edges hold auth 0, no out-edges hub 0 —
    * structural zeros, not NULLs. */
  def hits(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct()
    var scores = nodes
      .select(col("node_id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val authSum = e
        .join(scores.select(col("node_id").as("src"), col("hub")),
          Seq("src"))
        .groupBy(col("dst").as("node_id"))
        .agg(sum(col("hub").cast("decimal(28,8)"))
          .cast("decimal(38,8)").as("_as"))
      val maxA = authSum.agg(max(col("_as")).as("_ma"))
      val withAuth = scores.select(col("node_id"), col("hub"))
        .join(authSum, Seq("node_id"), "left")
        .crossJoin(broadcast(maxA))
        .select(col("node_id"), col("hub"),
          coalesce(round(col("_as").cast("double")
            / col("_ma").cast("double"), 8), lit(0.0)).as("auth"))
      val hubSum = e
        .join(withAuth.select(col("node_id").as("dst"), col("auth")),
          Seq("dst"))
        .groupBy(col("src").as("node_id"))
        .agg(sum(col("auth").cast("decimal(28,8)"))
          .cast("decimal(38,8)").as("_hs"))
      val maxH = hubSum.agg(max(col("_hs")).as("_mh"))
      val next = withAuth.select(col("node_id"), col("auth"))
        .join(hubSum, Seq("node_id"), "left")
        .crossJoin(broadcast(maxH))
        .select(col("node_id"),
          coalesce(round(col("_hs").cast("double")
            / col("_mh").cast("double"), 8), lit(0.0)).as("hub"),
          col("auth"))
        .localCheckpoint()
      org.apache.spark.sql.GraftShim.releaseCheckpoint(scores)
      scores = next
    }
    scores
  }

  /** Weighted single-source shortest paths (SURVEY.md §2 R48) — the
    * COST-graded companion of [[bfsHops]]: minimum total edge weight
    * from any source, for non-negative integer weights. Bellman–Ford
    * with FRONTIER relaxation: each round relaxes only edges leaving
    * nodes whose distance improved last round (the delta-stepping
    * shape without the bucket machinery), so a settled region stops
    * costing anything. Rounds ≤ the edge count of the longest
    * shortest path; convergence is the improved-count probe and a
    * maxIters cutoff is LOUD.
    *
    * Exact longs end to end — nothing to round. Unreached nodes are
    * absent, not ∞-sentineled. Loop discipline as [[bfsHops]]:
    * statsBarrier, eager checkpoints, previous round's blocks
    * released the moment the next materializes.
    *
    * Scale: per round one edges⋈frontier shuffle (∝ frontier degree
    * sum) + one min-aggregate + one label-sized merge join. `edges`
    * needs (src, dst, w); `sources` is a 1-column id frame. */
  def weightedShortestPaths(edges: DataFrame, sources: DataFrame,
      undirected: Boolean = true, maxIters: Int = 60): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("w").cast("long"))
    val adj = (if (undirected)
        fwd.union(edges.select(col("dst").as("src"),
          col("src").as("dst"), col("w").cast("long")))
      else fwd).localCheckpoint()
    // r16: one materialization per round instead of two — the relax
    // output FULL-OUTER-merges into the label frame with an _improved
    // flag, so the merged frame, the convergence probe, and the next
    // frontier all ride ONE checkpointed frame (the frontier is a
    // filter over materialized blocks, not its own job). Measured on
    // q88 at sf0.1: 11.6 → ~7 s steady; at scale it removes a full
    // dist-frame write per round. Values are unchanged: the merge
    // computes exactly min(old dist, best relaxation).
    var dist = sources.select(col(sources.columns.head).as("node_id"))
      .distinct()
      .withColumn("dist", lit(0L))
      .withColumn("_improved", lit(true))
      .localCheckpoint()
    var frontier = dist.select(col("node_id"), col("dist"))
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val relax = adj.join(frontier, adj("src") === frontier("node_id"))
        .select(adj("dst").as("node_id"),
          (frontier("dist") + adj("w")).as("nd"))
        .groupBy("node_id").agg(min(col("nd")).as("nd"))
      val merged = org.apache.spark.sql.GraftShim.statsBarrier(
        dist.select(col("node_id"), col("dist").as("od"))
          .join(relax, Seq("node_id"), "full_outer")
          .select(col("node_id"),
            least(coalesce(col("nd"), col("od")),
              coalesce(col("od"), col("nd"))).as("dist"),
            (col("od").isNull ||
              (col("nd").isNotNull && col("nd") < col("od")))
              .as("_improved"))
          .localCheckpoint())
      val nImproved = merged.filter(col("_improved")).count()
      org.apache.spark.sql.GraftShim.releaseCheckpoint(dist)
      dist = merged
      frontier = merged.filter(col("_improved"))
        .select(col("node_id"), col("dist"))
      done = nImproved == 0
      iter += 1
    }
    if (!done && iter >= maxIters)
      logWarning(s"weightedShortestPaths: still improving after " +
        s"$maxIters rounds; distances may be upper bounds")
    dist.select(col("node_id"), col("dist"))
  }

  /** Degree assortativity coefficient (SURVEY.md §2 R44; Newman 2002,
    * public) — do high-degree nodes attach to high-degree nodes? The
    * one-number mixing summary that separates social-style graphs
    * (r > 0) from infrastructure/biology-style hubs-to-leaves graphs
    * (r < 0), and the sanity probe to run before trusting
    * [[pageRank]]/[[kCore]] structure on a derived edge set.
    *
    * r = Pearson correlation of (deg(u), deg(v)) over the DIRECTED
    * expansion of the canonical undirected edge set (each edge counted
    * in both orientations — the standard estimator, which also makes
    * the two marginals identical so one set of moments suffices).
    * Degrees are exact integers: every moment is DECIMAL(38,0)
    * (order-free, engine-exact); r is ONE IEEE expression rounded 6dp,
    * NULL for a degree-regular graph (zero variance).
    *
    * Scale: canonicalize + degree count (one shuffle), two hash joins
    * of the edge list against the node-sized degree frame, ONE
    * partial-agg'd 1-row moment aggregate. No window, no iteration. */
  def assortativity(edges: DataFrame): DataFrame = {
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("u").as("node_id"))
      .unionAll(canon.select(col("v").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("deg"))
    val bidir = canon.select(col("u").as("a"), col("v").as("b"))
      .unionAll(canon.select(col("v").as("a"), col("u").as("b")))
    val dec = "decimal(38,0)"
    val m = bidir
      .join(deg.select(col("node_id").as("a"), col("deg").as("da")),
        Seq("a"))
      .join(deg.select(col("node_id").as("b"), col("deg").as("db")),
        Seq("b"))
      .agg(count(lit(1)).as("n_ends"),
        coalesce(sum(col("da").cast(dec)), lit(0).cast(dec)).as("_s1"),
        coalesce(sum(col("da").cast(dec) * col("da")), lit(0).cast(dec))
          .as("_s2"),
        coalesce(sum(col("da").cast(dec) * col("db")), lit(0).cast(dec))
          .as("_s11"))
      .localCheckpoint()
    org.apache.spark.sql.GraftShim.releaseCheckpoint(canon)
    val n = col("n_ends").cast(dec)
    val cov = (n * col("_s11") - col("_s1") * col("_s1")).cast("double")
    val vr = (n * col("_s2") - col("_s1") * col("_s1")).cast("double")
    m.select(col("n_ends"),
      when(col("n_ends") >= 2 && vr > 0,
        round(cov / vr, 6)).as("assortativity"))
  }

  /** Single-source BFS hop distance (SURVEY.md §2 R41) — the reachability
    * question [[connectedComponents]] answers yes/no to, graded by HOW
    * FAR: `dist` = minimum hop count from any source node; unreached
    * nodes are simply absent (no fabricated ∞ sentinel).
    *
    * Frontier BFS as join rounds: each round joins ONLY the current
    * frontier against the edge frame (shuffle ∝ frontier degree sum,
    * not the whole graph — the reason this beats a dist-relaxation
    * rewrite that re-joins every labeled node every round), anti-joins
    * the expansion against the settled set, and unions the survivors
    * in at dist = round. Rounds = eccentricity of the source set,
    * each round one edge join + one label-sized anti join.
    *
    * Loop discipline (the [[connectedComponents]] rules): the edge
    * frame localCheckpoints ONCE; frontier and settled frames
    * localCheckpoint per round behind a statsBarrier (an anti-join of
    * two checkpointed frames still compounds propagated stats), and
    * the previous round's blocks are released as soon as the next
    * materializes. The convergence probe (frontier count) rides the
    * frame the union needs anyway.
    *
    * `sources` is a 1-column frame of node ids — an aggregate or
    * filter, never a collected literal, so the plan stays distributed.
    * Exact integers only: nothing to round. */
  def bfsHops(edges: DataFrame, sources: DataFrame,
      undirected: Boolean = true, maxIters: Int = 40): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    val adj = (if (undirected)
        fwd.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      else fwd).localCheckpoint()
    // r16: the settled set ACCUMULATES as a lazy union of the per-round
    // checkpointed frontiers instead of being re-unioned and
    // re-checkpointed every round. Settled rows are immutable once
    // written (a node's first reach IS its BFS distance), so the old
    // merged-frame rebuild re-wrote O(rounds·|V|) rows for nothing; the
    // anti-join reads the same rows either way. One checkpoint + one
    // count per round remain. The union plan grows by one leg per
    // round — bounded by maxIters and flat, so plan-time stats stay
    // additive (no statsBarrier squaring). A caller raising maxIters
    // far beyond the default should re-compact the union every ~32
    // rounds (one checkpoint) to keep the plan bounded; no declared
    // query needs that.
    var settledAll = sources
      .select(col(sources.columns.head).as("node_id"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var frontier = settledAll
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val next = org.apache.spark.sql.GraftShim.statsBarrier(
        adj.join(frontier, adj("src") === frontier("node_id"))
          .select(adj("dst").as("node_id")).distinct()
          .join(settledAll, Seq("node_id"), "left_anti")
          .withColumn("dist", lit(iter + 1L))
          .localCheckpoint())
      if (next.count() > 0) {
        settledAll = settledAll.union(next)
        frontier = next
      } else {
        org.apache.spark.sql.GraftShim.releaseCheckpoint(next)
        done = true
      }
      iter += 1
    }
    if (!done && iter >= maxIters)
      logWarning(s"bfsHops: frontier still live after $maxIters rounds; " +
        "distances beyond the cutoff are absent")
    settledAll
  }
}
