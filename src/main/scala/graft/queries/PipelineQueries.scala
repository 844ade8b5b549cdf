package graft.queries

import graft.{Q, Tables}
import graft.pipeline.{Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators as driver-verifiable queries
  * (SURVEY.md §2 P1–P11). Where the operator is SQL-expressible the
  * DuckDB oracle mirrors the exact arithmetic (same tokenization, same
  * double-precision fold order) so hashes match bit-for-bit.
  */
object PipelineQueries {

  private val stopListSql = TextAnalysis.stopEn.mkString("['", "','", "']")

  // P1: exact dedup — sha256 identity, keep lowest doc_id per group.
  private val dedupExact = Q(
    "dedup_exact",
    (s, d) =>
      Dedup.exactKept(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_copies"), col("text_hash"))
        .orderBy(col("doc_id")),
    Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
      sha256(text) AS text_hash
      FROM documents GROUP BY sha256(text) ORDER BY doc_id"""))

  // P1b: bag-of-words dedup — identity = sha256 of the sorted token
  // multiset; catches token-shuffled/templated copies exact dedup
  // misses, same one-shuffle hash-groupBy plan. Both engines sort
  // ASCII tokens in binary order and join with single spaces.
  private val dedupBag = Q(
    "dedup_bag",
    (s, d) =>
      Dedup.bagKept(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_copies"), col("bag_hash"))
        .orderBy(col("doc_id")),
    Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
      sha256(array_to_string(list_sort(
        string_split_regex(trim(lower(text)), '\s+')), ' ')) AS bag_hash
      FROM documents
      GROUP BY sha256(array_to_string(list_sort(
        string_split_regex(trim(lower(text)), '\s+')), ' '))
      ORDER BY doc_id"""))

  /** DuckDB CTE chain computing the EXACT n-gram Jaccard pair relation
    * `pairs(a_id, b_id, jaccard ≥ threshold)` — the independent exact
    * twin the minhash/simhash gates score against. Mirrors
    * [[graft.pipeline.Dedup.ngramJaccardPairs]] (3-token shingles,
    * df ≤ 100 cap) and the dedup_ngram oracle, hoisted so three keys
    * share one definition. */
  private def ngramPairsCte(threshold: Double): String =
    s"""tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
      kept AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (SELECT * FROM (
        SELECT a_id, b_id,
          round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id)
      WHERE jaccard >= $threshold)"""

  // P2: MinHash + LSH banding. The raw candidate-pair set is
  // hash-function-specific, so the DRIVER claim is the (precision,
  // recall) gate of the banded candidates against the exact n-gram
  // Jaccard ≥ 0.5 pair relation (which dedup_ngram's oracle computes
  // independently in DuckDB): GateProbe r13 measured recall = precision
  // = 1.0 at sf0.001/0.01/0.1 vs the 0.7 gates. The full banding path
  // still runs — the gate consumes its output; raw pair-set checks
  // live in DedupSpec.
  private val dedupMinhash = Q(
    "dedup_minhash",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      // one shingle pass serves BOTH legs (candidates + exact twin) —
      // the shingleTable composition contract; both consume it eagerly
      // (each localCheckpoints its pairs), so unpersist here is safe.
      // r17: the legs are independent until the gate join and each runs
      // eager jobs — build them CONCURRENTLY (guide §2.6, Par.frames).
      val sh = Dedup.shingleTable(docs).persist()
      val Seq(cand0, exact0) = graft.Par.frames(
        () => Dedup.minhashPairs(docs, threshold = 0.5,
          shingled = Some(sh)),
        () => Dedup.ngramJaccardPairs(docs, threshold = 0.5,
          shingled = Some(sh)))
      val cand = cand0.select(col("a_id"), col("b_id"), lit(1L).as("c"))
      val exact = exact0.select(col("a_id"), col("b_id"), lit(1L).as("e"))
      sh.unpersist()
      cand.join(exact, Seq("a_id", "b_id"), "full_outer")
        .agg(
          coalesce(sum(col("e")), lit(0L)).as("n_exact"),
          coalesce(sum(col("c")), lit(0L)).as("n_cand"),
          coalesce(sum(col("c") * col("e")), lit(0L)).as("n_inter"))
        .select(col("n_exact"),
          (col("n_inter") >= col("n_exact") * 0.7).as("recall_ok"),
          (col("n_inter") >= col("n_cand") * 0.7).as("precision_ok"))
    },
    Some(s"""WITH ${ngramPairsCte(0.5)}
      SELECT CAST(count(*) AS BIGINT) AS n_exact,
        TRUE AS recall_ok, TRUE AS precision_ok FROM pairs"""))

  // P3: SimHash hamming pairs. Hamming distance over a specific 64-bit
  // fingerprint has no engine-independent twin, so the DRIVER claim is
  // the quality gate vs exact n-gram Jaccard: candidates must recover
  // ≥ 0.5 of the exact ≥ 0.8 pairs (GateProbe r13: 0.82/0.96/0.91 at
  // sf0.001/0.01/0.1) and ≥ 0.7 of the candidates must be true ≥ 0.5
  // pairs (measured 1.0 at all three SFs). One exact pass serves both:
  // the ≥ 0.8 set is a filter over the ≥ 0.5 relation's jaccard column.
  private val dedupSimhash = Q(
    "dedup_simhash",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      // one shingle pass serves both legs (the dedup_minhash pattern);
      // r17: legs built concurrently (guide §2.6, Par.frames)
      val sh = Dedup.shingleTable(docs).persist()
      val Seq(cand0, exact0) = graft.Par.frames(
        () => Dedup.simhashPairs(docs, maxHamming = 7,
          shingled = Some(sh)),
        () => Dedup.ngramJaccardPairs(docs, threshold = 0.5,
          shingled = Some(sh)))
      val cand = cand0.select(col("a_id"), col("b_id"), lit(1L).as("c"))
      val exact = exact0
        .select(col("a_id"), col("b_id"), col("jaccard"))
      sh.unpersist()
      cand.join(exact, Seq("a_id", "b_id"), "full_outer")
        .agg(
          coalesce(sum(when(col("jaccard") >= 0.8, 1L)), lit(0L))
            .as("n_exact08"),
          coalesce(sum(col("c")), lit(0L)).as("n_cand"),
          coalesce(sum(when(col("c").isNotNull && col("jaccard") >= 0.8,
            1L)), lit(0L)).as("i08"),
          coalesce(sum(when(col("c").isNotNull && col("jaccard").isNotNull,
            1L)), lit(0L)).as("i05"))
        .select(col("n_exact08"),
          (col("i08") >= col("n_exact08") * 0.5).as("recall_ok"),
          (col("i05") >= col("n_cand") * 0.7).as("precision_ok"))
    },
    Some(s"""WITH ${ngramPairsCte(0.5)}
      SELECT CAST(count(*) AS BIGINT) AS n_exact08,
        TRUE AS recall_ok, TRUE AS precision_ok
      FROM pairs WHERE jaccard >= 0.8"""))

  // P4: exact n-gram Jaccard pairs — fully SQL-expressible, oracled.
  private val dedupNgram = Q(
    "dedup_ngram",
    (s, d) =>
      Dedup.ngramJaccardPairs(Tables.load(s, d, "documents"), threshold = 0.5)
        .orderBy(col("a_id"), col("b_id")),
    Some(s"""WITH ${ngramPairsCte(0.5)}
      SELECT a_id, b_id, jaccard FROM pairs ORDER BY a_id, b_id"""))

  // P4c: EXACT all-pairs similarity join via prefix filtering — the
  // oracle computes the complete uncapped pair relation (no df cap, no
  // prefix, no positional filter), so a hash match proves the filtered
  // candidates had recall 1 on every true ≥ 0.8 pair. τ=0.8 is the
  // operating point substring-level dedup actually runs at AND the
  // regime where the prefix+positional filters stay sub-linear on a
  // saturated vocabulary (see allPairsJaccard's threshold-regime
  // scaladoc). Shingling CASE mirrors dedup_ngram; sizes/intersections
  // run over the FULL shingle sets.
  private val dedupAllpairs = Q(
    "dedup_allpairs",
    (s, d) =>
      Dedup.allPairsJaccard(Tables.load(s, d, "documents"), threshold = 0.8)
        .orderBy(col("a_id"), col("b_id")),
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT * FROM (
        SELECT a_id, b_id,
          round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id)
      WHERE jaccard >= 0.8
      ORDER BY a_id, b_id"""))

  // Shared oracle for every near-dup DECISION query: exact-Jaccard
  // pairs closed with a recursive CTE (reachable min == self ⇒ kept).
  private val keepOracleSql = """WITH RECURSIVE tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
      kept AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT a_id, b_id FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
      edges AS (
        SELECT a_id AS a, b_id AS b FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      SELECT src AS doc_id FROM reach
      GROUP BY src HAVING min(dst) = src ORDER BY doc_id"""

  // P4b: the dedup DECISION — connected components over the exact
  // n-gram Jaccard pairs, keep min doc_id per component.
  private val dedupKeep = Q(
    "dedup_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.keepAfterNearDedup(docs, Dedup.ngramJaccardPairs(docs, threshold = 0.5))
        .orderBy(col("doc_id"))
    },
    Some(keepOracleSql))

  // P4d: the EXACT-path end-to-end dedup — keep decision (CC, min id
  // per component) over the all-pairs τ=0.8 EXACT pair relation. The
  // oracle rebuilds the UNCAPPED pair relation (no df cap, no prefix/
  // positional filter) and closes it with the recursive CTE: a missed
  // true pair would change the kept set, so a hash match proves the
  // filtered candidate path lost nothing on the way to the DECISION —
  // the contract users actually consume.
  // the UNCAPPED exact pair relation at `tau` closed with the
  // recursive CTE — shared by dedup_allpairs_keep, dedup_auto_keep AND
  // the SQL-surface q109 (the driver SFs stay in the exact regime, so
  // the auto route's contract is the same kept set)
  private def mkAllpairsKeepOracle(tau: String) = raw"""WITH RECURSIVE tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT a_id, b_id FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= $tau),
      edges AS (
        SELECT a_id AS a, b_id AS b FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      SELECT src AS doc_id FROM reach
      GROUP BY src HAVING min(dst) = src ORDER BY doc_id"""

  private val allpairsKeepOracleSql = mkAllpairsKeepOracle("0.8")

  private val dedupAllpairsKeep = Q(
    "dedup_allpairs_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.keepAfterNearDedup(docs,
          Dedup.allPairsJaccard(docs, threshold = 0.8))
        .orderBy(col("doc_id"))
    },
    Some(allpairsKeepOracleSql))

  // P4e: the AUTO-ROUTED near-dup keep decision (r10) — ONE median-df
  // probe selects the exact prefix leg (Zipf/real-text regime, recall
  // 1) or the minhash band leg (saturated vocabulary, the measured
  // 25×-exponent-0.35 plan) behind the same exact verify and CC keep.
  // The driver corpus is squarely in the exact regime (median df 2 at
  // sf0.01), so the oracle is the SAME uncapped exact pair relation —
  // a hash match proves the auto route made the exact choice AND lost
  // nothing; DedupSpec proves the band route fires on a planted
  // saturated vocabulary with the identical kept set.
  private val dedupAutoKeep = Q(
    "dedup_auto_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.nearDedupAuto(docs, threshold = 0.8).orderBy(col("doc_id"))
    },
    Some(allpairsKeepOracleSql))

  // P4g (r11): the QUALITY-AWARE keep decision — per component keep
  // the highest-scoring member (score DESC, doc_id ASC), not the
  // min id; score = n_chars (the "keep the longest copy" heuristic a
  // crawl dedup actually runs). The oracle closes the same uncapped
  // exact pair relation, labels components min-reachable-id, and
  // replays the (score DESC, doc_id) argmax per component.
  private def mkBestKeepOracle(tau: String) = raw"""WITH RECURSIVE tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT a_id, b_id FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= $tau),
      edges AS (
        SELECT a_id AS a, b_id AS b FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      comp AS (SELECT src AS doc_id, min(dst) AS component
        FROM reach GROUP BY 1),
      scored AS (SELECT c.doc_id, c.component,
          coalesce(CAST(d.n_chars AS DOUBLE), -1e308) AS s
        FROM comp c JOIN documents d USING (doc_id)),
      w AS (SELECT doc_id, row_number() OVER (PARTITION BY component
          ORDER BY s DESC, doc_id) AS rn FROM scored)
      SELECT doc_id FROM w WHERE rn = 1 ORDER BY doc_id"""

  private val dedupBestKeep = Q(
    "dedup_best_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.nearDedupKeepBest(docs, "n_chars", threshold = 0.8)
        .orderBy(col("doc_id"))
    },
    Some(mkBestKeepOracle("0.8")))

  // …and its SQL-surface twin at τ=0.6 (distinct params → own oracle).
  private val dedupBestKeepSql = Q(
    "q158_sql_dedup_best",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT doc_id
        FROM graft_dedup_keep_best('documents', 'n_chars', 0.6D)
        ORDER BY doc_id""")
    },
    Some(mkBestKeepOracle("0.6")))

  // r10: the PIPELINE family at the SQL surface — `FROM
  // graft_dedup_keep('documents', 0.7)` is the whole near-dup keep
  // pipeline (probe-routed candidates + exact verify + CC keep) as a
  // table expression, with τ=0.7 distinct from dedup_auto_keep's 0.8
  // so the key earns its own oracle (same recursive-CTE closure at
  // the new threshold).
  private val dedupKeepSql = Q(
    "q109_sql_dedup_keep",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT doc_id FROM graft_dedup_keep('documents', 0.7)
        ORDER BY doc_id""")
    },
    Some(mkAllpairsKeepOracle("0.7")))

  // r10: drift in SQL over a DERIVED grouping (a doc_id band) —
  // params distinct from both text_drift (source) and text_drift_lang.
  private val driftSql = Q(
    "q110_sql_drift",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""CREATE OR REPLACE TEMP VIEW drift_in AS
        SELECT CAST(doc_id % 4 AS STRING) AS band, text FROM documents""")
      s.sql("""SELECT source_a, source_b, n_a, n_b, js_div
        FROM graft_drift('drift_in', 'text', 'band')
        ORDER BY source_a, source_b""")
    },
    Some("""WITH tok AS (
        SELECT CAST(doc_id % 4 AS VARCHAR) AS grp,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT grp, token FROM tok WHERE token <> ''),
      tc AS (SELECT grp, token, count(*) AS c FROM tnz GROUP BY 1, 2),
      tot AS (SELECT grp, sum(c) AS n FROM tc GROUP BY 1),
      voc AS (SELECT DISTINCT token FROM tc),
      vs AS (SELECT count(*) AS v FROM voc),
      al AS (SELECT token, grp, n, coalesce(c, 0) AS c
        FROM voc CROSS JOIN tot LEFT JOIN tc USING (grp, token)),
      pr AS (SELECT a.grp AS source_a, b.grp AS source_b,
          a.n AS na, b.n AS nb,
          CAST(a.c + 1 AS DOUBLE) / (a.n + v) AS pa,
          CAST(b.c + 1 AS DOUBLE) / (b.n + v) AS pb
        FROM al a JOIN al b ON a.token = b.token AND a.grp < b.grp
        CROSS JOIN vs),
      t2 AS (SELECT source_a, source_b, na, nb,
          CAST(round(pa * round(ln(pa / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS ta,
          CAST(round(pb * round(ln(pb / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS tb
        FROM pr)
      SELECT source_a, source_b, CAST(max(na) AS BIGINT) AS n_a,
        CAST(max(nb) AS BIGINT) AS n_b,
        round(CAST(sum(ta) + sum(tb) AS DOUBLE) / 2, 6) AS js_div
      FROM t2 GROUP BY 1, 2 ORDER BY 1, 2"""))

  // P2b: the MinHash DECISION under the full oracle gate — band-bucket
  // candidates (no estimate threshold), exact-Jaccard verification on
  // candidates only, then the CC keep decision. Matching the exact
  // recursive-CTE oracle PROVES candidate recall is 1 on this corpus
  // (a missed true pair would change the kept set) instead of leaving
  // the whole MinHash path rows-only.
  private val dedupMinhashKeep = Q(
    "dedup_minhash_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      // ONE shingle explode feeds both candidate generation and the
      // exact verify (both stages are materialized before unpersist)
      val sh = Dedup.shingleTable(docs).persist()
      // est threshold 0.2 only prunes band-collision noise before the
      // exact verify: a true jaccard≥0.5 pair's estimate (mean j,
      // sd √(j(1-j)/64) ≈ 0.06) sits ~5σ above it
      val cands = Dedup.minhashPairs(docs, threshold = 0.2,
        shingled = Some(sh))
      val verified = Dedup.verifyCandidates(docs, cands, threshold = 0.5,
        shingled = Some(sh))
      sh.unpersist()
      Dedup.keepAfterNearDedup(docs, verified).orderBy(col("doc_id"))
    },
    Some(keepOracleSql))

  // P2c: INCREMENTAL near-dup — today's batch (doc_id % 10 >= 6) vs the
  // STORED minhash band-bucket index of the already-ingested corpus
  // (doc_id % 10 < 6), the near-dup twin of dedup_incr. r12: the index
  // is the PERSISTENT BandIndex module (build-if-absent, the
  // ann_ivf_stored discipline) — the probe reads the stored parquet
  // band table, re-shingling only the batch; candidates come only from
  // the band join, then the exact-Jaccard verify decides. The oracle
  // recomputes the FULL exact batch×index Jaccard relation in DuckDB —
  // matching it PROVES band-candidate recall 1 on every true ≥0.5
  // cross pair (a missed candidate would lower that batch doc's count)
  // AND that the stored round-trip is value-exact.
  private val dedupMinhashIncr = Q(
    "dedup_minhash_incr",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val index = docs.filter(pmod(col("doc_id"), lit(10)) < 6)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 6)
      val root = graft.GraftSession.scratchDir(
        "band_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      // build-if-absent-or-stale: the fingerprint check catches a
      // regenerated dataset under the same dir (r12 advice), where a
      // bare _SUCCESS probe would silently serve stale buckets
      graft.pipeline.BandIndex.ensureBands(index, root)
      val cands = graft.pipeline.BandIndex.candidates(s, root, batch)
        .select(col("batch_id").as("a_id"), col("index_id").as("b_id"))
      val verified = Dedup.verifyCandidates(docs, cands, threshold = 0.5)
      val perBatch = verified.groupBy(col("a_id").as("doc_id"))
        .agg(count(lit(1)).as("n_index_dups"))
      batch.select(col("doc_id"))
        .join(perBatch, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_index_dups"), lit(0L)).as("n_index_dups"))
        .withColumn("dup_in_index", col("n_index_dups") > 0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
      kept AS (SELECT doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
      inter AS (
        SELECT b.doc_id AS batch_id, a.doc_id AS index_id, count(*) AS i
        FROM kept b JOIN kept a ON b.sh = a.sh
        WHERE b.doc_id % 10 >= 6 AND a.doc_id % 10 < 6
        GROUP BY 1, 2),
      pairs AS (
        SELECT batch_id FROM inter
        JOIN sizes sb ON sb.doc_id = batch_id
        JOIN sizes sa ON sa.doc_id = index_id
        WHERE CAST(i AS DOUBLE) / (sb.sz + sa.sz - i) >= 0.5),
      agg AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY 1)
      SELECT d.doc_id,
        coalesce(agg.n, CAST(0 AS BIGINT)) AS n_index_dups,
        coalesce(agg.n, 0) > 0 AS dup_in_index
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 6) d
      LEFT JOIN agg ON d.doc_id = agg.batch_id
      ORDER BY d.doc_id"""))

  // P3b: the SimHash DECISION under the same gate — chunk-blocked
  // candidates, exact verification, CC keep.
  private val dedupSimhashKeep = Q(
    "dedup_simhash_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val sh = Dedup.shingleTable(docs).persist()
      // hamming ≤ 16 of 64 bits is a loose pre-filter (near-dup pairs
      // at jaccard 0.5 land well under it) that spares the exact
      // verify join the far-pair bulk; the oracle gate proves no true
      // pair is lost
      val cands = Dedup.simhashCandidates(docs, shingled = Some(sh),
        maxHamming = 16)
      val verified = Dedup.verifyCandidates(docs, cands, threshold = 0.5,
        shingled = Some(sh))
      sh.unpersist()
      Dedup.keepAfterNearDedup(docs, verified).orderBy(col("doc_id"))
    },
    Some(keepOracleSql))

  // P5: embedding cosine near-dup (all-pairs baseline at verify SF;
  // LSH path covered by ann_lsh). Double math mirrored on both sides.
  private val dedupCosine = Q(
    "dedup_cosine",
    (s, d) =>
      Dedup.cosinePairs(Tables.load(s, d, "embeddings"), threshold = 0.44)
        .orderBy(col("a_id"), col("b_id")),
    Some("""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
      SELECT * FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      WHERE cos_sim >= 0.44
      ORDER BY a_id, b_id"""))

  // P14b: semantic decontamination — corpus vs benchmark best-cosine
  // with the 6dp round-early argmax; DuckDB recomputes the argmax
  // independently (max + tie-min join), so both the scores and the tie
  // rule are cross-engine proven.
  private val semDecontamQ = Q(
    "semantic_decontam",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.semanticDecontam(
          emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
          threshold = 0.44)
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      p AS (SELECT c.vec_id, b.vec_id AS b_id,
          round(list_dot_product(c.v, b.v) /
            (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
            AS cos_sim
        FROM e c JOIN e b ON c.vec_id >= 20 AND b.vec_id < 20),
      m AS (SELECT vec_id, max(cos_sim) AS best_cos FROM p GROUP BY vec_id)
      SELECT p.vec_id, min(p.b_id) AS best_bench_id, m.best_cos,
        m.best_cos >= 0.44 AS contaminated
      FROM p JOIN m ON p.vec_id = m.vec_id AND p.cos_sim = m.best_cos
      GROUP BY p.vec_id, m.best_cos ORDER BY p.vec_id"""))

  // P5b: the LSH scale path for cosine near-dup, gated like ann_recall.
  // Precision is cross-engine PROVEN: n_extra counts LSH pairs absent
  // from the exact ≥-threshold set (joined on the identical rounded
  // score), and DuckDB asserts it is 0. Recall is the thresholded
  // boolean, gate ≥0.25 (CosLshProbe r5: 0.600/0.500/0.564 at
  // sf0.001/0.01/0.1 with the 24-table × 8-bit default — 2× margin;
  // moderate-similarity mining at θ≈60° is the LSH-hostile regime, and
  // at real near-dup thresholds the planted-pair spec shows recall 1).
  // n_exact is independently DuckDB-computed.
  private val dedupCosineLsh = Q(
    "dedup_cosine_lsh",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val lsh = Similarity.cosinePairsLsh(emb, threshold = 0.44)
      val exact = Dedup.cosinePairs(emb, threshold = 0.44)
      // ONE full-outer join computes all three stats in a single pass —
      // a hit-join + anti-join pair would run the O(N²) exact side twice.
      exact.withColumn("ex", lit(1L))
        .join(lsh.withColumn("ls", lit(1L)),
          Seq("a_id", "b_id", "cos_sim"), "full_outer")
        .agg(
          coalesce(sum(col("ex")), lit(0L)).as("n_exact"),
          coalesce(sum(when(col("ex").isNotNull && col("ls").isNotNull,
            lit(1L)).otherwise(lit(0L))), lit(0L)).as("n_found"),
          coalesce(sum(when(col("ex").isNull, lit(1L)).otherwise(lit(0L))),
            lit(0L)).as("n_extra"))
        .select(col("n_exact"), col("n_extra"),
          (col("n_found") * 4 >= col("n_exact")).as("recall_ok"))
    },
    Some("""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      x AS (
        SELECT count(*) AS n_exact FROM (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            round(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        WHERE cos_sim >= 0.44)
      SELECT n_exact, CAST(0 AS BIGINT) AS n_extra, TRUE AS recall_ok
      FROM x"""))

  // P6: exact ANN baseline — brute-force cosine top-10 for 5 probes.
  private val annTopk = Q(
    "ann_topk",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cos_sim"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      SELECT query_id, neighbor_id, rnk, cos_sim FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_sim,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                     c.vec_id) AS rnk
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5)
      WHERE rnk <= 10
      ORDER BY query_id, rnk"""))

  // P24: deterministic token-dropout augmentation — per-(doc, pos)
  // Knuth arithmetic, bit-identical cross-engine; DuckDB replays the
  // indexed comprehension.
  private val augDropout = Q(
    "aug_dropout",
    (s, d) =>
      TextAnalysis.withTokenDropout(Tables.load(s, d, "documents"),
          dropBp = 1500, epoch = 1)
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      k AS (SELECT doc_id, ts,
          [ts[i] FOR i IN range(1, len(ts) + 1)
           IF ((doc_id * 1048576 + (i - 1) * 1024 + 1) % 2147483648)
              * 2738186381 % 4294967296 % 10000 >= 1500] AS kept
        FROM t)
      SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_tokens,
        CAST(len(kept) AS INTEGER) AS n_kept,
        coalesce(list_aggregate(kept, 'string_agg', ' '), '') AS aug_text
      FROM k ORDER BY doc_id"""))

  // R28: entity resolution across relations — dirty feed = the P24
  // dropout op as the corruption model (8% token drop, epoch 2), clean
  // registry = the documents table; blocked prefix-filter matching on
  // the Spark side vs the oracle's UNBLOCKED full-cross-product argmax
  // — a hash match proves blocking recall 1 above the threshold.
  private val erMatch = Q(
    "er_match",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val dirty = TextAnalysis.withTokenDropout(
          docs.filter(pmod(col("doc_id"), lit(4)) === 0),
          dropBp = 800, epoch = 2)
        .select(col("doc_id").as("dirty_id"), col("aug_text").as("text"))
      val clean = docs.select(col("doc_id").as("clean_id"), col("text"))
      graft.operators.Linkage.matchEntities(dirty, clean, threshold = 0.5)
        .orderBy(col("dirty_id"))
    },
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      dirty AS (SELECT doc_id AS dirty_id,
          [ts[i] FOR i IN range(1, len(ts) + 1)
           IF ((doc_id * 1048576 + (i - 1) * 1024 + 2) % 2147483648)
              * 2738186381 % 4294967296 % 10000 >= 800] AS ks
        FROM t WHERE doc_id % 4 = 0),
      dsh AS (SELECT dirty_id, unnest(CASE WHEN len(ks) < 3
          THEN [list_aggregate(ks, 'string_agg', ' ')]
          ELSE list_distinct([ks[i] || ' ' || ks[i+1] || ' ' || ks[i+2]
                              for i in range(1, len(ks) - 1)]) END) AS sh
        FROM dirty),
      csh AS (SELECT doc_id AS clean_id, unnest(CASE WHEN len(ts) < 3
          THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END) AS sh
        FROM t),
      dsz AS (SELECT dirty_id, count(*) AS sz FROM dsh GROUP BY 1),
      csz AS (SELECT clean_id, count(*) AS sz FROM csh GROUP BY 1),
      inter AS (SELECT d.dirty_id, c.clean_id, count(*) AS i
        FROM dsh d JOIN csh c ON d.sh = c.sh GROUP BY 1, 2),
      sims AS (SELECT dirty_id, clean_id,
          round(CAST(i AS DOUBLE) / (ds.sz + cs.sz - i), 6) AS sim
        FROM inter JOIN dsz ds USING (dirty_id) JOIN csz cs USING (clean_id)),
      ranked AS (SELECT dirty_id, clean_id, sim,
          row_number() OVER (PARTITION BY dirty_id
            ORDER BY sim DESC, clean_id) AS rn
        FROM sims WHERE sim >= 0.5),
      best AS (SELECT dirty_id, clean_id AS match_id, sim
        FROM ranked WHERE rn = 1)
      SELECT d.dirty_id, b.match_id, b.sim
      FROM dirty d LEFT JOIN best b USING (dirty_id)
      ORDER BY d.dirty_id"""))

  // P6g: hard-negative mining — the contrastive-training consumer of
  // the ANN family ("most similar with a DIFFERENT label"); exact
  // baseline path, fully oracled like ann_topk with the label
  // exclusion in the join.
  private val annHardNeg = Q(
    "ann_hardneg",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"),
          col("neighbor_label"), col("rnk"), col("cos_sim"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        FROM e)
      SELECT query_id, neighbor_id, neighbor_label, rnk, cos_sim FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          c.label AS neighbor_label,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_sim,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                     c.vec_id) AS rnk
        FROM n q JOIN n c ON c.label <> q.label
        WHERE q.vec_id < 5)
      WHERE rnk <= 10
      ORDER BY query_id, rnk"""))

  // P6b: LSH-bucketed ANN (the 100 TB path). The top-k artifact is
  // hash-specific, so the DRIVER claim is the per-leg recall gate vs
  // the exact brute-force top-10 (r6–r12 measured 0.40–0.76 across
  // SFs and methods vs the 0.3 gate; seeds fixed → deterministic per
  // dataset). The approximate query path still runs in full — the gate
  // consumes its output. Raw artifact checks live in SimilaritySpec.
  private def annGate(method: String)(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.load(s, d, "embeddings")
    Similarity.recallVsExact(emb, emb.filter(col("vec_id") < 5), k = 10,
        methods = Seq(method))
      .select(col("method"), col("n_queries"),
        (col("recall") >= 0.3).as("recall_ok"))
  }
  private def annGateOracle(method: String): String =
    s"""WITH p AS (SELECT count(DISTINCT vec_id) AS n_queries
        FROM embeddings WHERE vec_id < 5)
      SELECT '$method' AS method, p.n_queries, TRUE AS recall_ok FROM p"""

  private val annLsh = Q("ann_lsh", annGate("lsh"),
    Some(annGateOracle("lsh")))

  // P6c: IVF ANN (k-means inverted file) — same per-leg recall gate.
  private val annIvf = Q("ann_ivf", annGate("ivf"),
    Some(annGateOracle("ivf")))

  // P7: language ID heuristic — deterministic, oracle mirrors the logic.
  private val textLangid = Q(
    "text_langid",
    (s, d) =>
      TextAnalysis.withLangId(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("pred_lang"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (
        SELECT doc_id, text,
          string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      s AS (SELECT doc_id,
        len(list_filter(toks, x -> list_contains(${TextAnalysis.stopEn.mkString("['", "','", "']")}, x))) AS s_en,
        len(list_filter(toks, x -> list_contains(${TextAnalysis.stopDe.mkString("['", "','", "']")}, x))) AS s_de,
        len(list_filter(toks, x -> list_contains(${TextAnalysis.stopEs.mkString("['", "','", "']")}, x))) AS s_es,
        len(list_filter(toks, x -> list_contains(${TextAnalysis.stopFr.mkString("['", "','", "']")}, x))) AS s_fr,
        length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
        length(text) AS ln
        FROM t)
      SELECT doc_id,
        CASE WHEN cjk * 20 > ln THEN 'zh'
          WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang
      FROM s ORDER BY doc_id"""))

  // P8: quality scoring — oracle mirrors every ratio and the score.
  private val textQuality = Q(
    "text_quality",
    (s, d) =>
      TextAnalysis.withQuality(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_chars_"), col("n_tokens"),
          col("punct_ratio"), col("stop_ratio"), col("mean_tok_len"),
          col("quality_score"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (
        SELECT doc_id, text,
          string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      m AS (SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
        len(list_filter(toks, x -> list_contains($stopListSql, x))) AS stops,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mtl
        FROM t)
      SELECT doc_id, n_chars_, n_tokens,
        round(CAST(punct AS DOUBLE) / n_chars_, 6) AS punct_ratio,
        round(CAST(stops AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        round(mtl, 6) AS mean_tok_len,
        round(least(1.0, CAST(n_tokens AS DOUBLE) / 100) * 0.5
          + least(1.0, CAST(stops AS DOUBLE) / n_tokens * 5) * 0.3
          + CASE WHEN mtl BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END, 6) AS quality_score
      FROM m ORDER BY doc_id"""))

  // P8e: Gopher-style hard rule filter — per-rule signals plus the
  // conjunctive keep boolean, decided on 6dp-rounded ratios so the
  // booleans are engine-exact. minWords lowered to 30 for the test
  // corpus (10–99-word docs) so both outcomes are exercised.
  private val textGopher = Q(
    "text_gopher",
    (s, d) =>
      TextAnalysis.withGopherRules(Tables.load(s, d, "documents"),
          minWords = 30)
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("alpha_frac"), col("n_stop_distinct"), col("gopher_keep"))
        .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
        FROM documents),
      m AS (SELECT doc_id,
        CAST(len(ts) AS BIGINT) AS n_words,
        round(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
          / len(ts), 6) AS mean_word_len,
        round(CAST(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
          AS DOUBLE) / len(ts), 6) AS alpha_frac,
        CAST(len(list_filter($stopListSql, s -> list_contains(ts, s)))
          AS BIGINT) AS n_stop_distinct
        FROM tok)
      SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop_distinct,
        (n_words BETWEEN 30 AND 100000
          AND mean_word_len BETWEEN 3.0 AND 10.0
          AND alpha_frac >= 0.8 AND n_stop_distinct >= 2) AS gopher_keep
      FROM m ORDER BY doc_id"""))

  // A11: mergeable distinct-count sketches — per-(source, lang) HLL
  // sketches built once (the stored partial state), then rolled up to
  // per-source estimates by sketch UNION ONLY, never re-touching rows:
  // the algebra that lets 100 TB daily partitions keep distinct counts
  // incrementally. Gated like ann_recall: Spark emits the exact count
  // AND the |est − exact| ≤ 5% boolean its sketch achieves; DuckDB
  // independently recomputes the exact count and asserts the boolean.
  private val sketchRollup = Q(
    "sketch_rollup",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val parts = docs.groupBy(col("source"), col("lang"))
        .agg(expr("hll_sketch_agg(text, 14)").as("sk"))
      val est = parts.groupBy(col("source"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = docs.groupBy(col("source"))
        .agg(countDistinct(col("text")).as("n_exact"))
      est.join(exact, Seq("source"))
        .select(col("source"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("within_tol"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, count(DISTINCT text) AS n_exact,
      CAST(1 AS BOOLEAN) AS within_tol
      FROM documents GROUP BY source ORDER BY source"""))

  // P18d: heavy hitters via the mergeable Misra–Gries sketch + exact
  // verify. The MG aggregate ships ≤k counters per map task (never the
  // token stream) and GUARANTEES every token with frequency > n/k is
  // among its candidates; the exact pass counts ONLY candidate-matching
  // tokens (broadcast semi-join — output-proportional) and applies the
  // threshold, so the final set equals the true heavy hitters and the
  // DuckDB oracle recomputes it directly. At 100 TB this replaces a
  // full every-distinct-token shuffle with k rows + a candidate count.
  private val heavyHitters = Q(
    "heavy_hitters",
    (s, d) => {
      val hhK = 50 // threshold = n/50 = 2% of token occurrences
      val toks = Tables.load(s, d, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val cand = toks
        .agg(graft.functions.heavyHitterCandidates(col("token"), hhK)
          .as("cands"))
        .select(explode(col("cands")).as("token"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(cand), Seq("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
        .crossJoin(broadcast(total))
        .filter(col("n_occurrences") * hhK > col("n_total"))
        .select(col("token"), col("n_occurrences"))
        .orderBy(col("token"))
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tot AS (SELECT count(*) AS n_total FROM tok)
      SELECT token, count(*) AS n_occurrences
      FROM tok, tot GROUP BY token, n_total
      HAVING count(*) * 50 > n_total
      ORDER BY token"""))

  // P18j: Count–Min point-frequency sketch + exact verify — the
  // point-query sibling of heavy_hitters (MG) and the count analogue of
  // sketch_rollup (HLL): per-(source, lang) CMS partials built once
  // (the stored daily-partition state), rolled up per source by PURE
  // COUNTER ADDITION (a zip_with fold — never re-touching rows), then
  // probed for a fixed token set. Gated like sketch_rollup: Spark
  // emits the exact count and the two CMS guarantees its sketch
  // achieves (est ≥ exact always; est ≤ exact + (e/w)·N w.h.p.);
  // DuckDB independently recomputes the exact counts and asserts the
  // booleans. Probe "nosuchtoken" exercises the absent-item case
  // (exact 0, estimate = collision mass only).
  private val cmsCounts = Q(
    "cms_counts",
    (s, d) => {
      import s.implicits._
      val cmsD = 4; val cmsW = 2048
      val probes = Seq("join", "scan", "window", "dup", "nosuchtoken")
      val docs = Tables.load(s, d, "documents")
      val toks = docs.select(col("source"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val parts = toks.groupBy(col("source"), col("lang"))
        .agg(graft.functions.cmsSketch(col("token"), cmsD, cmsW).as("sk"))
      val rolled = parts.groupBy(col("source"))
        .agg(aggregate(collect_list(col("sk")),
          array_repeat(lit(0L), cmsD * cmsW),
          (acc, x) => zip_with(acc, x, (a, b) => a + b)).as("sk"))
      val total = toks.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      val exact = toks.filter(col("token").isin(probes: _*))
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      val est = probes.map(p => when(col("token") === p,
        graft.functions.cmsPointEstimate(col("sk"), p, cmsD, cmsW)))
      total.crossJoin(probes.toDF("token"))
        .join(exact, Seq("source", "token"), "left")
        .na.fill(0L, Seq("c"))
        .join(rolled, Seq("source"))
        .withColumn("est", coalesce(est: _*))
        .select(col("source"), col("token"), col("c").as("n_exact"),
          (col("est") >= col("c")).as("cms_ge"),
          ((col("est") - col("c")).cast("double")
            <= lit(math.E / cmsW) * col("n_total")).as("cms_tol"))
        .orderBy(col("source"), col("token"))
    },
    Some("""WITH tok AS (
        SELECT source,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT source, token FROM tok WHERE token <> ''),
      tot AS (SELECT source FROM tnz GROUP BY 1),
      probes AS (SELECT unnest(
        ['join', 'scan', 'window', 'dup', 'nosuchtoken']) AS token),
      e AS (SELECT source, token, count(*) AS c FROM tnz
        WHERE token IN ('join', 'scan', 'window', 'dup', 'nosuchtoken')
        GROUP BY 1, 2)
      SELECT source, token, CAST(coalesce(c, 0) AS BIGINT) AS n_exact,
        CAST(1 AS BOOLEAN) AS cms_ge, CAST(1 AS BOOLEAN) AS cms_tol
      FROM tot CROSS JOIN probes LEFT JOIN e USING (source, token)
      ORDER BY source, token"""))

  // P18k: KLL quantile sketch + exact verify — the rank/quantile member
  // of the sketch family (HLL=distinct, MG/CMS=frequency, KLL=ranks):
  // per-group bounded summaries built by the native mergeable
  // aggregate, probed for p25/p50/p75, then verified output-
  // proportionally — the estimate's true rank (count ≤/< est, 9 rows
  // against the corpus) must sit within the DETERMINISTIC n·L/k rank
  // bound of the derandomized sketch. Exact quantiles come from the
  // (grp, value) histogram rank rule (the corpus_stats idiom — no
  // per-group sort) and hash-match DuckDB; gates are booleans the
  // oracle asserts, the sketch_rollup discipline.
  private val kllQuantiles = Q(
    "kll_quantiles",
    (s, d) => {
      val kllK = 32
      val docs = Tables.load(s, d, "documents")
        .select(pmod(col("doc_id"), lit(3)).as("grp"), col("n_chars"))
      val sk = docs.groupBy("grp")
        .agg(graft.functions.kllSketch(col("n_chars").cast("double"), kllK)
            .as("sk"),
          count(lit(1)).as("n"))
      val est = sk.select(col("grp"), col("n"),
        explode(array(Seq(0.25, 0.5, 0.75).map(p =>
          struct(lit(p).as("phi"),
            graft.functions.kllQuantile(col("sk"), p).as("est"))): _*))
          .as("pq"))
        .select(col("grp"), col("n"),
          col("pq.phi").as("phi"), col("pq.est").as("est"))
      val ranks = est.join(docs, Seq("grp"))
        .groupBy(col("grp"), col("phi"), col("n"), col("est"))
        .agg(
          sum(when(col("n_chars") < col("est"), 1L).otherwise(0L))
            .as("rank_lo"),
          sum(when(col("n_chars") <= col("est"), 1L).otherwise(0L))
            .as("rank_hi"))
      val hist = docs.groupBy(col("grp"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cc", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("n_chars"))))
      import s.implicits._
      val phis = Seq(0.25, 0.5, 0.75).toDF("phi")
      val exact = cum.crossJoin(broadcast(phis))
        .join(sk.select(col("grp"), col("n").as("n_g")), Seq("grp"))
        .filter(col("cc") >= ceil(col("phi") * col("n_g")))
        .groupBy(col("grp"), col("phi"))
        .agg(min(col("n_chars")).as("q_exact"))
      ranks.join(exact, Seq("grp", "phi"))
        .withColumn("bound", col("n")
          * greatest(ceil(log(2.0, col("n") / lit(kllK))) + 1, lit(1L))
          / lit(kllK))
        .select(col("grp"), col("phi"), col("n"), col("q_exact"),
          ((col("rank_hi") >= col("phi") * col("n") - col("bound"))
            && (col("rank_lo") < col("phi") * col("n") + col("bound")))
            .as("within_bound"))
        .orderBy(col("grp"), col("phi"))
    },
    Some("""WITH d AS (
        SELECT doc_id % 3 AS grp, n_chars FROM documents),
      tot AS (SELECT grp, count(*) AS n FROM d GROUP BY 1),
      h AS (SELECT grp, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
      cum AS (SELECT grp, n_chars,
        sum(c) OVER (PARTITION BY grp ORDER BY n_chars) AS cc FROM h),
      p AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS phi),
      e AS (SELECT grp, phi, min(n_chars) AS q_exact
        FROM cum CROSS JOIN p JOIN tot USING (grp)
        WHERE cc >= ceil(phi * n) GROUP BY 1, 2)
      SELECT grp, phi, n, q_exact, CAST(1 AS BOOLEAN) AS within_bound
      FROM e JOIN tot USING (grp) ORDER BY grp, phi"""))

  // P23: token-distribution drift between sources — pairwise
  // Jensen–Shannon divergence over add-one-smoothed unigram
  // distributions on the shared global vocabulary; the corpus-refresh
  // monitoring dial. One corpus token-count shuffle, then everything at
  // vocab scale. FULL oracle: DuckDB replays the smoothing, the
  // 6dp-rounded ln ratios, the 12dp DECIMAL term sums, and the final
  // ½(KLa+KLb).
  private val textDrift = Q(
    "text_drift",
    (s, d) =>
      TextAnalysis.distributionDrift(Tables.load(s, d, "documents"))
        .orderBy(col("source_a"), col("source_b")),
    Some("""WITH tok AS (
        SELECT source AS grp,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT grp, token FROM tok WHERE token <> ''),
      tc AS (SELECT grp, token, count(*) AS c FROM tnz GROUP BY 1, 2),
      tot AS (SELECT grp, sum(c) AS n FROM tc GROUP BY 1),
      voc AS (SELECT DISTINCT token FROM tc),
      vs AS (SELECT count(*) AS v FROM voc),
      al AS (SELECT token, grp, n, coalesce(c, 0) AS c
        FROM voc CROSS JOIN tot LEFT JOIN tc USING (grp, token)),
      pr AS (SELECT a.grp AS source_a, b.grp AS source_b,
          a.n AS na, b.n AS nb,
          CAST(a.c + 1 AS DOUBLE) / (a.n + v) AS pa,
          CAST(b.c + 1 AS DOUBLE) / (b.n + v) AS pb
        FROM al a JOIN al b ON a.token = b.token AND a.grp < b.grp
        CROSS JOIN vs),
      t2 AS (SELECT source_a, source_b, na, nb,
          CAST(round(pa * round(ln(pa / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS ta,
          CAST(round(pb * round(ln(pb / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS tb
        FROM pr)
      SELECT source_a, source_b, CAST(max(na) AS BIGINT) AS n_a,
        CAST(max(nb) AS BIGINT) AS n_b,
        round(CAST(sum(ta) + sum(tb) AS DOUBLE) / 2, 6) AS js_div
      FROM t2 GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ST18's oracled batch twin (r10): the SAME jsDivergenceFromCounts
  // core the streaming monitor consumes, grouped by LANG (params
  // distinct from text_drift's source grouping) — holds the shared
  // stream/batch semantics under the full DuckDB oracle while
  // StreamingSpec proves streamed ≡ batch bitwise across a microbatch
  // cut.
  private val textDriftLang = Q(
    "text_drift_lang",
    (s, d) =>
      TextAnalysis.distributionDrift(Tables.load(s, d, "documents"),
          groupCol = "lang")
        .orderBy(col("source_a"), col("source_b")),
    Some("""WITH tok AS (
        SELECT lang AS grp,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT grp, token FROM tok WHERE token <> ''),
      tc AS (SELECT grp, token, count(*) AS c FROM tnz GROUP BY 1, 2),
      tot AS (SELECT grp, sum(c) AS n FROM tc GROUP BY 1),
      voc AS (SELECT DISTINCT token FROM tc),
      vs AS (SELECT count(*) AS v FROM voc),
      al AS (SELECT token, grp, n, coalesce(c, 0) AS c
        FROM voc CROSS JOIN tot LEFT JOIN tc USING (grp, token)),
      pr AS (SELECT a.grp AS source_a, b.grp AS source_b,
          a.n AS na, b.n AS nb,
          CAST(a.c + 1 AS DOUBLE) / (a.n + v) AS pa,
          CAST(b.c + 1 AS DOUBLE) / (b.n + v) AS pb
        FROM al a JOIN al b ON a.token = b.token AND a.grp < b.grp
        CROSS JOIN vs),
      t2 AS (SELECT source_a, source_b, na, nb,
          CAST(round(pa * round(ln(pa / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS ta,
          CAST(round(pb * round(ln(pb / ((pa + pb) / 2)), 6), 12)
            AS DECIMAL(28,12)) AS tb
        FROM pr)
      SELECT source_a, source_b, CAST(max(na) AS BIGINT) AS n_a,
        CAST(max(nb) AS BIGINT) AS n_b,
        round(CAST(sum(ta) + sum(tb) AS DOUBLE) / 2, 6) AS js_div
      FROM t2 GROUP BY 1, 2 ORDER BY 1, 2"""))

  // P23b (r10): Population Stability Index of every source against the
  // src0 baseline — the baseline-anchored monitoring dial with the
  // industry verdict bands, same smoothing/rounding ladder as JS.
  private val textPsi = Q(
    "text_psi",
    (s, d) =>
      TextAnalysis.distributionPsi(Tables.load(s, d, "documents"),
          baseline = "src0")
        .orderBy(col("source")),
    Some("""WITH tok AS (
        SELECT source AS grp,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT grp, token FROM tok WHERE token <> ''),
      tc AS (SELECT grp, token, count(*) AS c FROM tnz GROUP BY 1, 2),
      tot AS (SELECT grp, sum(c) AS n FROM tc GROUP BY 1),
      voc AS (SELECT DISTINCT token FROM tc),
      vs AS (SELECT count(*) AS v FROM voc),
      al AS (SELECT token, grp, n, coalesce(c, 0) AS c
        FROM voc CROSS JOIN tot LEFT JOIN tc USING (grp, token)),
      pr AS (SELECT a.grp AS source, a.n AS na, e.n AS ne,
          CAST(a.c + 1 AS DOUBLE) / (a.n + v) AS pa,
          CAST(e.c + 1 AS DOUBLE) / (e.n + v) AS pe
        FROM al a JOIN al e ON a.token = e.token
          AND e.grp = 'src0' AND a.grp <> 'src0'
        CROSS JOIN vs),
      t2 AS (SELECT source, na, ne,
          CAST(round((pa - pe) * round(ln(pa / pe), 6), 12)
            AS DECIMAL(28,12)) AS t
        FROM pr),
      ag AS (SELECT source, CAST(max(ne) AS BIGINT) AS n_base,
          CAST(max(na) AS BIGINT) AS n_source,
          round(CAST(sum(t) AS DOUBLE), 6) AS psi
        FROM t2 GROUP BY 1)
      SELECT source, n_base, n_source, psi,
        CASE WHEN psi < 0.1 THEN 'stable'
          WHEN psi < 0.25 THEN 'moderate'
          ELSE 'shifted' END AS verdict
      FROM ag ORDER BY source"""))

  // P18i: hybrid retrieval — BM25 lexical leg + exact-cosine dense leg
  // fused by Reciprocal Rank Fusion (1/(60+rank), the calibration-free
  // standard). Both legs are engine-deterministic rankings, the fusion
  // terms are exact integer-ratio IEEE divisions, so the fused top-10
  // is FULLY oracled: DuckDB replays BM25 (the text_bm25 CTEs), the
  // dense ranking (the ann_topk CTE for one query), and the fusion.
  private val textRrf = Q(
    "text_rrf",
    (s, d) =>
      TextAnalysis.hybridRrfTopK(
        Tables.load(s, d, "documents"), Tables.load(s, d, "embeddings"),
        Seq("spark", "hash", "window"), queryVecId = 0L, k = 10)
        .orderBy(col("rrf_score").desc, col("doc_id")),
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st),
      bm AS (SELECT doc_id,
          CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
      lex AS (SELECT doc_id, CAST(row_number() OVER
          (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS lex_rank FROM bm),
      ev AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      nv AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ev),
      den AS (SELECT neighbor_id AS doc_id, CAST(rnk AS INTEGER) AS den_rank
        FROM (
          SELECT c.vec_id AS neighbor_id,
            row_number() OVER (ORDER BY
              round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
              c.vec_id) AS rnk
          FROM nv q JOIN nv c ON q.vec_id <> c.vec_id
          WHERE q.vec_id = 0)
        WHERE rnk <= 20),
      f AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
          lex_rank, den_rank,
          round(coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0)
            + coalesce(CAST(1 AS DOUBLE) / (60 + den_rank), 0), 6)
            AS rrf_score
        FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
      SELECT doc_id, coalesce(lex_rank, -1) AS lex_rank,
        coalesce(den_rank, -1) AS den_rank, rrf_score
      FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10"""))

  // P9: token counting — whitespace + BPE-ish regex, oracled.
  private val textTokens = Q(
    "text_tokens",
    (s, d) =>
      TextAnalysis.withTokenCounts(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS bpeish_tokens
      FROM documents ORDER BY doc_id"""))

  // P8b: PII redaction — counts over original text + sequentially
  // masked text; regex subset chosen to evaluate identically in Java
  // regex and DuckDB's RE2.
  private val textPii = Q(
    "text_pii",
    (s, d) =>
      TextAnalysis.withPiiRedaction(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_emails"), col("n_ipv4"),
          col("n_phones"), col("redacted"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
      CAST(len(regexp_extract_all(text, '${TextAnalysis.emailPattern}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(text, '${TextAnalysis.ipv4Pattern}')) AS BIGINT) AS n_ipv4,
      CAST(len(regexp_extract_all(text, '${TextAnalysis.phonePattern}')) AS BIGINT) AS n_phones,
      regexp_replace(regexp_replace(regexp_replace(text,
        '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
        '${TextAnalysis.ipv4Pattern}', '<IP>', 'g'),
        '${TextAnalysis.phonePattern}', '<PHONE>', 'g') AS redacted
      FROM documents ORDER BY doc_id"""))

  // P8c: repetition signals — dup-token ratio + top-bigram share.
  private val textRepetition = Q(
    "text_repetition",
    (s, d) =>
      TextAnalysis.withRepetition(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      u AS (SELECT doc_id,
        round(1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6)
          AS dup_token_ratio FROM t),
      bgl AS (SELECT doc_id,
        unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bg
        FROM t),
      c AS (SELECT doc_id, bg, count(*) AS n FROM bgl GROUP BY 1, 2),
      r AS (SELECT doc_id,
        round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_bigram_ratio
        FROM c GROUP BY 1)
      SELECT u.doc_id, dup_token_ratio,
        coalesce(top_bigram_ratio, 0.0) AS top_bigram_ratio
      FROM u LEFT JOIN r ON u.doc_id = r.doc_id
      ORDER BY u.doc_id"""))

  // P10: rolling-hash fingerprint — now ORACLED: the hash is pure
  // mod-2^32 arithmetic over code points (no engine hash function), so
  // DuckDB reproduces it exactly via nested list_reduce. list_reduce
  // has no init value, so a 0 (or MAX) is prepended as the fold seed.
  private val textFingerprint = Q(
    "text_fingerprint",
    (s, d) =>
      TextAnalysis.withFingerprint(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("fingerprint"), col("win_min_hash"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ts,
            tk -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(tk, '.'),
                  ch -> CAST(unicode(ch) AS BIGINT))),
              (h, cd) -> (h * 31 + cd) % 4294967296))),
          (fp, th) -> (fp * 1000003 + th) % 4294967296) AS fingerprint,
        list_reduce(list_prepend(CAST(9223372036854775807 AS BIGINT),
            list_transform(range(0, greatest(len(ts) - 5, 0) + 1),
              i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(regexp_extract_all(
                      array_to_string(list_slice(ts, i + 1, i + 5), ' '), '.'),
                    ch -> CAST(unicode(ch) AS BIGINT))),
                (h, cd) -> (h * 31 + cd) % 4294967296))),
          (m, wh) -> least(m, wh)) AS win_min_hash
      FROM t ORDER BY doc_id"""))

  // P10b: winnowing fingerprint selection — the DuckDB oracle replays
  // the identical mod-2^32 char polynomial, the identical h·2^21 +
  // (2^21−1−pos) min-key trick, and the identical window sweep, so a
  // selection bug (wrong window bounds, wrong tie rule) hash-fails.
  private val textWinnow = Q(
    "text_winnow",
    (s, d) =>
      TextAnalysis.winnowFingerprints(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      f AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 3),
      kk AS (SELECT doc_id,
        list_transform(range(0, len(ts) - 3 + 1), i ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(
                  array_to_string(list_slice(ts, i + 1, i + 3), ' '), '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296)
          * 2097152 + (2097151 - i)) AS keys
        FROM f),
      s AS (SELECT doc_id,
        list_distinct(list_transform(range(0, greatest(len(keys) - 4, 0) + 1),
          q -> list_min(list_slice(keys, q + 1, q + 4)))) AS sel
        FROM kk)
      SELECT doc_id, 2097151 - (u % 2097152) AS pos, u // 2097152 AS fp
      FROM s, unnest(s.sel) AS un(u)
      ORDER BY doc_id, pos"""))

  // P10c: substring-overlap pairs from shared winnowing fingerprints.
  private val winnowPairsQ = Q(
    "winnow_pairs",
    (s, d) =>
      TextAnalysis.winnowPairs(Tables.load(s, d, "documents"))
        .orderBy(col("d1"), col("d2")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      f AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 3),
      kk AS (SELECT doc_id,
        list_transform(range(0, len(ts) - 3 + 1), i ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(
                  array_to_string(list_slice(ts, i + 1, i + 3), ' '), '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296)
          * 2097152 + (2097151 - i)) AS keys
        FROM f),
      s AS (SELECT doc_id,
        list_distinct(list_transform(range(0, greatest(len(keys) - 4, 0) + 1),
          q -> list_min(list_slice(keys, q + 1, q + 4)))) AS sel
        FROM kk),
      fps AS (SELECT DISTINCT doc_id, u // 2097152 AS fp
        FROM s, unnest(s.sel) AS un(u)),
      rare AS (SELECT fp FROM fps GROUP BY fp
        HAVING count(*) BETWEEN 2 AND 100),
      kept AS (SELECT f2.doc_id, f2.fp FROM fps f2 JOIN rare USING (fp))
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY d1, d2"""))

  // P6d: product-quantization ANN (ADC + exact rerank) — same per-leg
  // recall gate as ann_lsh/ann_ivf.
  private val annPq = Q("ann_pq", annGate("pq"),
    Some(annGateOracle("pq")))

  // P5c: SemDeDup-style semantic near-dup, gated like dedup_cosine_lsh:
  // precision 1 PROVEN cross-engine (n_extra joins found pairs against
  // DuckDB's independent exact ≥-threshold set on identical rounded
  // scores and must be 0); recall is the thresholded boolean. SemProbe
  // r6 at θ=0.44 (the LSH/cluster-hostile moderate regime), nCells=8:
  // recall 0.40/0.45/0.34 at sf0.001/0.01/0.1 vs the 0.25 gate; at real
  // near-dup thresholds identical/near-identical vectors share a cell
  // by construction (SimilaritySpec planted-pair case shows recovery).
  private val semDedup = Q(
    "dedup_semantic",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val sem = Similarity.semDedupPairs(emb, threshold = 0.44, nCells = 8)
      val exact = Dedup.cosinePairs(emb, threshold = 0.44)
      exact.withColumn("ex", lit(1L))
        .join(sem.withColumn("se", lit(1L)),
          Seq("a_id", "b_id", "cos_sim"), "full_outer")
        .agg(
          coalesce(sum(col("ex")), lit(0L)).as("n_exact"),
          coalesce(sum(when(col("ex").isNotNull && col("se").isNotNull,
            lit(1L)).otherwise(lit(0L))), lit(0L)).as("n_found"),
          coalesce(sum(when(col("ex").isNull, lit(1L)).otherwise(lit(0L))),
            lit(0L)).as("n_extra"))
        .select(col("n_exact"), col("n_extra"),
          (col("n_found") >= col("n_exact") * 0.25).as("recall_ok"))
    },
    Some("""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) *
             sqrt(list_dot_product(b.v, b.v))), 6) AS c
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT CAST(count(*) AS BIGINT) AS n_exact,
        CAST(0 AS BIGINT) AS n_extra, TRUE AS recall_ok
      FROM p WHERE c >= 0.44"""))

  // P6f: classic IVF-PQ (coarse inverted file + residual product codes,
  // the IVFADC composition) — same per-leg recall gate as its siblings.
  private val annIvfPq = Q("ann_ivfpq", annGate("ivfpq"),
    Some(annGateOracle("ivfpq")))

  // P6 recall gate: every approximate ANN path audited against the exact
  // top-10 THROUGH the driver gate, not just sbt. The raw recall ratio is
  // engine-reproducible only by rebuilding the LSH/IVF/PQ structures, so
  // the cross-engine claim is the thresholded boolean: recall ≥ 0.3 with
  // wide margin (r6 measured 0.40–0.76 across sf0.001/0.01/0.1 and methods; seeds fixed,
  // so the ratio itself is deterministic per dataset). n_queries is
  // genuinely DuckDB-computed from the probe-set definition.
  private val annRecall = Q(
    "ann_recall",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.recallVsExact(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("method"), col("n_queries"),
          (col("recall") >= 0.3).as("recall_ok"))
        .orderBy(col("method"))
    },
    Some("""WITH p AS (SELECT count(DISTINCT vec_id) AS n_queries
        FROM embeddings WHERE vec_id < 5)
      SELECT m.method, p.n_queries, TRUE AS recall_ok
      FROM (VALUES ('ivf'), ('ivfpq'), ('lsh'), ('pq')) m(method), p
      ORDER BY method"""))

  // P6h: the PERSISTENT IVF index (AnnIndex) — build-once-query-many.
  // The query fn builds the index ONLY when its stored tables are
  // absent (the import-once storage contract), so Bench's warmup pass
  // pays the one-time build and every timed pass measures the pure
  // query path: no Lloyd's anywhere in its plan. Gated like ann_recall
  // (threshold boolean; raw recall is index-specific); stored ≡
  // freshly-trained equality is AnnIndexSpec's claim — putting it here
  // would retrain per call and destroy the query-only bench line.
  private val annIvfStored = Q(
    "ann_ivf_stored",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val root = graft.GraftSession.scratchDir(
        "ann_ivf_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      if (!new java.io.File(s"$root/postings/_SUCCESS").exists())
        graft.pipeline.AnnIndex.buildIvf(emb, root)
      val q = emb.filter(col("vec_id") < 5)
      val stored = graft.pipeline.AnnIndex.ivfQuery(s, root, q, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.bruteForceTopK(emb, q, 10)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(stored.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count_distinct(col("query_id")).as("n_queries"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
        .select(lit("ivf_stored").as("method"), col("n_queries"),
          (col("recall") >= 0.3).as("recall_ok"))
    },
    Some("""WITH p AS (SELECT count(DISTINCT vec_id) AS n_queries
        FROM embeddings WHERE vec_id < 5)
      SELECT 'ivf_stored' AS method, p.n_queries, TRUE AS recall_ok
      FROM p"""))

  // P6h stored IVF-PQ: the same build-once-query-many split for the
  // full production layout (coarse cells + residual codebooks + m-byte
  // codes partitioned by cell). Timed passes measure ADC over STORED
  // codes + the exact shortlist rescore — two trainings in the build,
  // zero in the query.
  private val annIvfPqStored = Q(
    "ann_ivfpq_stored",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val root = graft.GraftSession.scratchDir(
        "ann_ivfpq_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      if (!new java.io.File(s"$root/codes/_SUCCESS").exists())
        graft.pipeline.AnnIndex.buildIvfPq(emb, root)
      val q = emb.filter(col("vec_id") < 5)
      val stored = graft.pipeline.AnnIndex.ivfpqQuery(s, root, q, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.bruteForceTopK(emb, q, 10)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(stored.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count_distinct(col("query_id")).as("n_queries"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
        .select(lit("ivfpq_stored").as("method"), col("n_queries"),
          (col("recall") >= 0.3).as("recall_ok"))
    },
    Some("""WITH p AS (SELECT count(DISTINCT vec_id) AS n_queries
        FROM embeddings WHERE vec_id < 5)
      SELECT 'ivfpq_stored' AS method, p.n_queries, TRUE AS recall_ok
      FROM p"""))

  // P6h incremental: build the index on HALF the corpus, addIvfBatch
  // the other half (assign-only against the stored centroids — no
  // retraining), and gate the combined index's recall. Spark also
  // verifies the incremental postings EQUAL assigning the full corpus
  // to the stored centroids in one shot — the append path must be a
  // pure union, not a re-cluster.
  private val annIvfIncr = Q(
    "ann_ivf_incr",
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val root = graft.GraftSession.scratchDir(
        "ann_ivf_incr_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      if (!new java.io.File(s"$root/built").exists()) {
        graft.pipeline.AnnIndex.buildIvf(
          emb.filter(col("vec_id") % 2 === 0), root)
        graft.pipeline.AnnIndex.addIvfBatch(
          emb.filter(col("vec_id") % 2 =!= 0), root)
        new java.io.File(s"$root/built").createNewFile()
      }
      val q = emb.filter(col("vec_id") < 5)
      val stored = graft.pipeline.AnnIndex.ivfQuery(s, root, q, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
      val exact = Similarity.bruteForceTopK(emb, q, 10)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(stored.select(col("query_id"), col("neighbor_id"),
            lit(1L).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count_distinct(col("query_id")).as("n_queries"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
        .select(lit("ivf_incr").as("method"), col("n_queries"),
          (col("recall") >= 0.3).as("recall_ok"))
    },
    Some("""WITH p AS (SELECT count(DISTINCT vec_id) AS n_queries
        FROM embeddings WHERE vec_id < 5)
      SELECT 'ivf_incr' AS method, p.n_queries, TRUE AS recall_ok
      FROM p"""))

  // P12: concat-and-chunk sequence packing — pure window + integer
  // arithmetic, oracle mirrors the per-shard cumulative sums exactly.
  private val packSequences = Q(
    "pack_sequences",
    (s, d) =>
      Packing.packSequences(Tables.load(s, d, "documents"),
          capacity = 1024, nShards = 8)
        .orderBy(col("shard"), col("chunk_idx"), col("doc_id")),
    Some("""WITH t AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens,
          CAST(doc_id % 8 AS BIGINT) AS shard
        FROM documents),
      s AS (
        SELECT doc_id, shard, n_tokens,
          coalesce(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS tok_start
        FROM t),
      e AS (SELECT *, tok_start + n_tokens AS tok_end FROM s),
      x AS (
        SELECT shard, doc_id, tok_start, tok_end,
          unnest(range(tok_start // 1024, (tok_end - 1) // 1024 + 1))
            AS chunk_idx
        FROM e)
      SELECT shard, chunk_idx, doc_id,
        greatest(tok_start, chunk_idx * 1024) - tok_start AS doc_from,
        least(tok_end, (chunk_idx + 1) * 1024) - tok_start AS doc_to,
        greatest(tok_start, chunk_idx * 1024) - chunk_idx * 1024 AS chunk_off
      FROM x ORDER BY shard, chunk_idx, doc_id"""))

  // P12d (r12): WHOLE-document harmonic bin packing — the no-split
  // twin of pack_sequences (fine-tuning / no-cross-doc-attention
  // regimes). The oracle replays the class arithmetic, the per-class
  // row_number, the k-per-bin division, and the bin fill — a hash
  // match proves the published-algorithm assignment is engine-exact.
  private val packBins = Q(
    "pack_bins",
    (s, d) =>
      Packing.packBins(Tables.load(s, d, "documents"),
          capacity = 1024, nShards = 8)
        .orderBy(col("shard"), col("size_class"), col("bin_idx"),
          col("doc_id")),
    Some("""WITH t AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens,
          CAST(doc_id % 8 AS BIGINT) AS shard
        FROM documents),
      c AS (SELECT *, least(1024 // n_tokens, 16) AS size_class FROM t),
      r AS (SELECT *,
          CAST(row_number() OVER (PARTITION BY shard, size_class
            ORDER BY doc_id) AS BIGINT) - 1 AS rn,
          CASE WHEN size_class = 0 THEN 1 ELSE size_class END AS k
        FROM c),
      a AS (SELECT shard, size_class, rn // k AS bin_idx, doc_id,
          n_tokens
        FROM r)
      SELECT shard, size_class, bin_idx, doc_id, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY shard, size_class, bin_idx)
          AS BIGINT) AS bin_fill,
        size_class = 0 AS oversize
      FROM a ORDER BY shard, size_class, bin_idx, doc_id"""))

  // P13: deterministic hash split — engine-independent arithmetic
  // (Knuth multiplicative mod 2^32), oracled bit-for-bit.
  private val splitTrain = Q(
    "split_train",
    (s, d) =>
      Packing.withSplit(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("split_bucket"), col("split"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100
          AS split_bucket,
        CASE WHEN (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100 < 80
          THEN 'train'
          WHEN (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 % 100 < 90
          THEN 'val' ELSE 'test' END AS split
      FROM documents ORDER BY doc_id"""))

  // P31 (r10): stratified EXACT split — every source gets exactly
  // ⌊n_g·cum/100⌋ boundary-allocated rows per slice under the
  // independent 3267000013 Knuth rank. The oracle computes the same
  // rank with one global window (fine at oracle scale) and the same
  // integer boundaries — a hash match proves the bucketed two-phase
  // rank equals the global rank row-for-row.
  private val splitStrat = Q(
    "split_stratified",
    (s, d) =>
      Packing.stratifiedSplit(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("source"), col("strat_rank"),
          col("split"))
        .orderBy(col("doc_id")),
    Some("""WITH r AS (SELECT doc_id, source,
          (CAST(doc_id AS BIGINT) * 3267000013) % 4294967296 AS sk
        FROM documents),
      rk AS (SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY sk,
            doc_id) AS BIGINT) AS strat_rank,
          count(*) OVER (PARTITION BY source) AS ng
        FROM r)
      SELECT doc_id, source, strat_rank,
        CASE WHEN strat_rank <= (ng * 80) // 100 THEN 'train'
          WHEN strat_rank <= (ng * 90) // 100 THEN 'val'
          ELSE 'test' END AS split
      FROM rk ORDER BY doc_id"""))

  // P14: eval-set decontamination — benchmark = every 97th doc; flag
  // corpus docs sharing any 5-gram shingle with it. Oracle mirrors the
  // shingling (same CASE for short docs) and the overlap count.
  private val textDecontam = Q(
    "text_decontam",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      Packing.decontaminate(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0), bench, k = 5)
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 5 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              || ' ' || ts[i+3] || ' ' || ts[i+4]
                              for i in range(1, len(ts) - 3)]) END AS shs
        FROM tok),
      b AS (SELECT DISTINCT unnest(shs) AS sh FROM shl WHERE doc_id % 97 = 0),
      dd AS (SELECT doc_id, unnest(shs) AS sh FROM shl WHERE doc_id % 97 <> 0),
      hits AS (
        SELECT doc_id, count(*) AS n_shared
        FROM dd JOIN b USING (sh) GROUP BY doc_id)
      SELECT t.doc_id,
        coalesce(n_shared, 0) AS n_shared,
        coalesce(n_shared, 0) > 0 AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) t
      LEFT JOIN hits USING (doc_id)
      ORDER BY doc_id"""))

  // P15: corpus-global duplicate-shingle fraction (MassiveText-style
  // repetition filter across the corpus) — string shingles + count
  // arithmetic only, fully oracled. Shingling CASE mirrors dedup_ngram.
  private val textDupfrac = Q(
    "text_dupfrac",
    (s, d) =>
      Dedup.withDupShingleFraction(Tables.load(s, d, "documents"), k = 3,
          flagThreshold = 0.5)
        .orderBy(col("doc_id")),
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      shl AS (
        SELECT doc_id,
          CASE WHEN len(ts) < 3 THEN [list_aggregate(ts, 'string_agg', ' ')]
          ELSE list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                              for i in range(1, len(ts) - 1)]) END AS shs
        FROM tok),
      sh0 AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
      freq AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh),
      per AS (
        SELECT doc_id, count(*) AS n_shingles,
          count(*) FILTER (WHERE df > 1) AS n_dup
        FROM sh0 JOIN freq USING (sh) GROUP BY doc_id)
      SELECT doc_id, n_shingles, n_dup,
        round(CAST(n_dup AS DOUBLE) / n_shingles, 6) AS dup_frac,
        round(CAST(n_dup AS DOUBLE) / n_shingles, 6) >= 0.5 AS flagged
      FROM per ORDER BY doc_id"""))

  // P15b: duplicate-SPAN scrubbing (Lee et al. substring dedup): every
  // 8-token run occurring >=2 times in the corpus is cut from every
  // document and the survivors re-joined in order. The DuckDB oracle
  // rebuilds positional shingles, the duplicated-start set, and the
  // coverage predicate (NOT EXISTS s: s <= i < s+8) verbatim, then
  // string_aggs the kept tokens back — so span bounds, the coverage
  // off-by-ones, and the reassembly order are all pinned cross-engine.
  private val textScrub = Q(
    "text_scrub",
    (s, d) =>
      Dedup.scrubDuplicateSpans(Tables.load(s, d, "documents"), k = 8)
        .orderBy(col("doc_id")),
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      sh AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+7], ' ') AS sh
        FROM tok, unnest(range(1, greatest(len(ts) - 6, 1))) AS r(i)
        WHERE len(ts) >= 8),
      freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
      st AS (SELECT doc_id, pos FROM sh JOIN freq USING (sh) WHERE df > 1),
      tk AS (
        SELECT doc_id, i - 1 AS pos, ts[i] AS tok
        FROM tok, unnest(range(1, len(ts) + 1)) AS r(i)),
      kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM tk t
        WHERE NOT EXISTS (SELECT 1 FROM st s
          WHERE s.doc_id = t.doc_id AND t.pos >= s.pos
            AND t.pos < s.pos + 8)),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
          string_agg(tok, ' ' ORDER BY pos) AS scrubbed
        FROM kept GROUP BY 1)
      SELECT tok.doc_id, len(ts) AS n_tokens,
        len(ts) - coalesce(n_kept, 0) AS n_removed,
        coalesce(scrubbed, '') AS scrubbed
      FROM tok LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  // P15c: longest duplicated token run per doc — duplicated 8-gram
  // starts merged as intervals (two starts merge iff the next begins at
  // or before the previous run's end); DuckDB replays the identical
  // gaps-and-islands window (brk on pos > prev + 8, running-sum island
  // ids, max-min+8 per island), so the merge rule is pinned.
  private val textMaxdup = Q(
    "text_maxdup",
    (s, d) =>
      Dedup.withMaxDupRun(Tables.load(s, d, "documents"), k = 8)
        .orderBy(col("doc_id")),
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      sh AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+7], ' ') AS sh
        FROM tok, unnest(range(1, greatest(len(ts) - 6, 1))) AS r(i)
        WHERE len(ts) >= 8),
      freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
      st AS (SELECT doc_id, pos FROM sh JOIN freq USING (sh) WHERE df > 1),
      brk AS (
        SELECT doc_id, pos,
          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
              IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id
              ORDER BY pos) + 8 THEN 1 ELSE 0 END AS b
        FROM st),
      isl AS (
        SELECT doc_id, pos,
          sum(b) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM brk),
      runs AS (
        SELECT doc_id, island, max(pos) - min(pos) + 8 AS run_len
        FROM isl GROUP BY 1, 2),
      per AS (SELECT doc_id, max(run_len) AS max_dup_run
        FROM runs GROUP BY 1)
      SELECT d.doc_id,
        CAST(coalesce(per.max_dup_run, 0) AS BIGINT) AS max_dup_run
      FROM documents d LEFT JOIN per USING (doc_id)
      ORDER BY doc_id"""))

  // P8f: hashed-BoW linear quality classifier (fastText shape) with a
  // deterministic arithmetic weight table — DuckDB replays the char
  // polynomial, bucket map, weight formula, FP fold order, and the
  // round-before-compare keep rule.
  private val textClassify = Q(
    "text_classify",
    (s, d) =>
      TextAnalysis.withClassifierScore(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("quality_score"), col("clf_keep"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      w AS (
        SELECT doc_id, list_transform(ts, tk ->
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(tk, '.'),
                  ch -> CAST(unicode(ch) AS BIGINT))),
              (h, cd) -> (h * 31 + cd) % 4294967296)
              % 4096 * 2654435761 % 4294967296 AS DOUBLE)
            / 4294967296 * 2 - 1) AS ws
        FROM t)
      SELECT doc_id,
        round(1.0 / (1.0 + exp(-4.0 *
          list_reduce(list_prepend(CAST(0 AS DOUBLE), ws),
            (a, x) -> a + x) / len(ws))), 6) AS quality_score,
        round(1.0 / (1.0 + exp(-4.0 *
          list_reduce(list_prepend(CAST(0 AS DOUBLE), ws),
            (a, x) -> a + x) / len(ws))), 6) >= 0.5 AS clf_keep
      FROM w ORDER BY doc_id"""))

  // P18e: first BPE merge iteration — top-30 adjacent within-token
  // char-pair frequencies, the merge-candidate table tokenizer training
  // folds in. Deterministic (cnt DESC, pair ASC) boundary.
  private val textBpe = Q(
    "text_bpe",
    (s, d) =>
      TextAnalysis.bpeMergePairs(Tables.load(s, d, "documents"), topK = 30)
        .orderBy(col("cnt").desc, col("pair")),
    Some("""WITH t AS (
        SELECT string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      tok AS (SELECT unnest(ts) AS tk FROM t),
      pr AS (SELECT tk[j:j+1] AS pair
        FROM tok, unnest(range(1, len(tk))) AS r(j))
      SELECT pair, count(*) AS cnt FROM pr GROUP BY 1
      ORDER BY cnt DESC, pair LIMIT 30"""))

  // P18e full loop: 3 rounds of BPE training. The oracle replays every
  // round — pair counts (exact long sums), top-1 by (cnt DESC, pair
  // ASC), and the identical greedy left-fold merge (list_reduce with
  // the same CASE arms as the Spark aggregate() fold) — so the learned
  // merge table must agree bit-for-bit, proving the claimed
  // re-pair-at-vocab-scale per-round cost is what actually runs.
  private val textBpeTrain = Q(
    "text_bpe_train",
    (s, d) =>
      TextAnalysis.bpeTrain(Tables.load(s, d, "documents"), nMerges = 3)
        .orderBy(col("merge_rank")),
    Some("""WITH w AS (
        SELECT tk AS word, count(*) AS n FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tk
          FROM documents) WHERE tk <> '' GROUP BY 1),
      s0 AS (SELECT word, n, string_split(word, '') AS sy FROM w),
      p1 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s0)
        GROUP BY 1),
      t1 AS (SELECT pair, cnt, string_split(pair, ' ')[1] AS sa,
          string_split(pair, ' ')[2] AS sb
        FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      s1 AS (SELECT word, n, string_split(list_reduce(list_prepend('', sy),
          (acc, x) -> CASE WHEN acc = '' THEN x
            WHEN (acc = sa OR ends_with(acc, ' ' || sa)) AND x = sb
              THEN substr(acc, 1, length(acc) - length(sa)) || sa || sb
            ELSE acc || ' ' || x END), ' ') AS sy
        FROM s0 CROSS JOIN t1),
      p2 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s1)
        GROUP BY 1),
      t2 AS (SELECT pair, cnt, string_split(pair, ' ')[1] AS sa,
          string_split(pair, ' ')[2] AS sb
        FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
      s2 AS (SELECT word, n, string_split(list_reduce(list_prepend('', sy),
          (acc, x) -> CASE WHEN acc = '' THEN x
            WHEN (acc = sa OR ends_with(acc, ' ' || sa)) AND x = sb
              THEN substr(acc, 1, length(acc) - length(sa)) || sa || sb
            ELSE acc || ' ' || x END), ' ') AS sy
        FROM s1 CROSS JOIN t2),
      p3 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s2)
        GROUP BY 1),
      t3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1)
      SELECT * FROM (
        SELECT 1 AS merge_rank, pair, cnt FROM t1
        UNION ALL SELECT 2, pair, cnt FROM t2
        UNION ALL SELECT 3, pair, cnt FROM t3)
      ORDER BY merge_rank"""))

  // P18e2 (r15): the SCALE path of BPE training — batched
  // non-overlapping merge selection (TextAnalysis.bpeTrainBatched),
  // run TO VOCABULARY EXHAUSTION with the old 30-merge bound lifted
  // (nMerges=1000 ≫ the corpus's ~107 reachable merges; the run
  // terminates when no pair remains). ROWS-ONLY driver check — the
  // unbounded-round recursion is not one-statement-SQL-expressible —
  // with correctness carried by TextAnalysisSpec instead: batchK=1
  // equals the FULLY-ORACLED sequential bpeTrain bit-for-bit (the
  // batched trainer inherits text_bpe_train's oracle through that
  // equality), the batched run is deterministic across invocations,
  // and exhaustion is a real fixpoint (> 30 merges learned, every
  // word collapsed).
  private val textBpeTrain1k = Q(
    "text_bpe_train1k",
    (s, d) =>
      TextAnalysis.bpeTrainBatched(Tables.load(s, d, "documents"),
          nMerges = 1000, batchK = 32)
        .orderBy(col("merge_rank")),
    None)

  // P18h: BPE ENCODING with the learned merges — the apply-tokenizer
  // step. The oracle replays the full 3-round training (same CTE chain
  // as text_bpe_train) and then applies one MORE fold (s3 = t3's merge
  // applied), joins the final word→symbols table to the positional
  // corpus explode, and reassembles each doc's symbol stream in order —
  // so the encoded output proves both the training replay AND the
  // lookup-based encoding agree bit-for-bit.
  private val textBpeEncode = Q(
    "text_bpe_encode",
    (s, d) =>
      TextAnalysis.bpeEncode(Tables.load(s, d, "documents"), nMerges = 3)
        .orderBy(col("doc_id")),
    Some("""WITH w AS (
        SELECT tk AS word, count(*) AS n FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tk
          FROM documents) WHERE tk <> '' GROUP BY 1),
      s0 AS (SELECT word, n, string_split(word, '') AS sy FROM w),
      p1 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s0)
        GROUP BY 1),
      t1 AS (SELECT string_split(pair, ' ')[1] AS sa,
          string_split(pair, ' ')[2] AS sb
        FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      s1 AS (SELECT word, n, string_split(list_reduce(list_prepend('', sy),
          (acc, x) -> CASE WHEN acc = '' THEN x
            WHEN (acc = sa OR ends_with(acc, ' ' || sa)) AND x = sb
              THEN substr(acc, 1, length(acc) - length(sa)) || sa || sb
            ELSE acc || ' ' || x END), ' ') AS sy
        FROM s0 CROSS JOIN t1),
      p2 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s1)
        GROUP BY 1),
      t2 AS (SELECT string_split(pair, ' ')[1] AS sa,
          string_split(pair, ' ')[2] AS sb
        FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
      s2 AS (SELECT word, n, string_split(list_reduce(list_prepend('', sy),
          (acc, x) -> CASE WHEN acc = '' THEN x
            WHEN (acc = sa OR ends_with(acc, ' ' || sa)) AND x = sb
              THEN substr(acc, 1, length(acc) - length(sa)) || sa || sb
            ELSE acc || ' ' || x END), ' ') AS sy
        FROM s1 CROSS JOIN t2),
      p3 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(sy)),
            j -> sy[j] || ' ' || sy[j + 1])) AS pair FROM s2)
        GROUP BY 1),
      t3 AS (SELECT string_split(pair, ' ')[1] AS sa,
          string_split(pair, ' ')[2] AS sb
        FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
      s3 AS (SELECT word, string_split(list_reduce(list_prepend('', sy),
          (acc, x) -> CASE WHEN acc = '' THEN x
            WHEN (acc = sa OR ends_with(acc, ' ' || sa)) AND x = sb
              THEN substr(acc, 1, length(acc) - length(sa)) || sa || sb
            ELSE acc || ' ' || x END), ' ') AS sy
        FROM s2 CROSS JOIN t3),
      tl AS (SELECT doc_id,
        string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents),
      e AS (SELECT doc_id, unnest(ts) AS w,
        unnest(range(1, len(ts) + 1)) AS pos FROM tl),
      f AS (SELECT doc_id, pos, array_to_string(sy, ' ') AS enc,
          len(sy) AS ns
        FROM e JOIN s3 ON s3.word = e.w WHERE e.w <> '')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(ns) AS BIGINT) AS n_syms,
        string_agg(enc, ' ' ORDER BY pos) AS encoded
      FROM f GROUP BY doc_id ORDER BY doc_id"""))

  // P16c: temperature-flattened mixture sampling — rates DERIVED from
  // group counts (share ∝ |g|^0.5, expected 300-doc budget) instead of
  // hand-set. The denominator sums 6dp-rounded pow values as
  // DECIMAL(28,6) (exact, order-free), so DuckDB reproduces the rate
  // table bit-for-bit, then the same fresh-multiplier Knuth bucket.
  private val mixTemperature = Q(
    "mix_temperature",
    (s, d) =>
      Packing.temperatureMixture(Tables.load(s, d, "documents"),
          alpha = 0.5, budget = 300)
        .select(col("doc_id"), col("source"), col("n_group"), col("t_rate"),
          col("mix_bucket"), col("keep"))
        .orderBy(col("doc_id")),
    Some("""WITH g AS (
        SELECT source, count(*) AS n_group FROM documents GROUP BY 1),
      d AS (
        SELECT sum(CAST(round(pow(n_group, 0.5), 6) AS DECIMAL(28,6)))
          AS denom FROM g),
      r AS (
        SELECT source, n_group,
          round(least(1.0, 300.0 * round(pow(n_group, 0.5), 6)
            / CAST(denom AS DOUBLE) / n_group), 6) AS t_rate
        FROM g, d)
      SELECT doc_id, source, n_group, t_rate,
        (doc_id * 1540483477 % 4294967296) % 10000 AS mix_bucket,
        (doc_id * 1540483477 % 4294967296) % 10000 < t_rate * 10000 AS keep
      FROM documents JOIN r USING (source) ORDER BY doc_id"""))

  // P16: deterministic mixture sampling — downsample src0 to 25%, drop
  // src1, keep src2 whole, halve the rest. Pure Knuth-mod-2^32
  // arithmetic (multiplier independent of split_train's), oracled
  // bit-for-bit.
  private val mixSample = Q(
    "mix_sample",
    (s, d) =>
      Packing.sampleMixture(Tables.load(s, d, "documents"),
          ratesBp = Seq("src0" -> 2500, "src1" -> 0, "src2" -> 10000),
          defaultBp = 5000)
        .select(col("doc_id"), col("source"), col("mix_bucket"),
          col("mix_rate_bp"), col("keep"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source,
        (CAST(doc_id AS BIGINT) * 2246822519) % 4294967296 % 10000
          AS mix_bucket,
        CASE WHEN source = 'src0' THEN 2500
             WHEN source = 'src1' THEN 0
             WHEN source = 'src2' THEN 10000 ELSE 5000 END AS mix_rate_bp,
        (CAST(doc_id AS BIGINT) * 2246822519) % 4294967296 % 10000 <
          CASE WHEN source = 'src0' THEN 2500
               WHEN source = 'src1' THEN 0
               WHEN source = 'src2' THEN 10000 ELSE 5000 END AS "keep"
      FROM documents ORDER BY doc_id"""))

  // P16b: epoch upsampling — the REPEAT side of mixture assembly.
  // Rates exercise all three regimes: whole+fractional copies (2.5
  // epochs of src0), a dropped source (src1 at 0), and a fractional
  // default (0.75). Pure Knuth arithmetic → full oracle.
  private val mixUpsample = Q(
    "mix_upsample",
    (s, d) =>
      Packing.upsampleMixture(Tables.load(s, d, "documents"),
          epochsBp = Seq("src0" -> 25000, "src1" -> 0),
          defaultBp = 7500)
        .select(col("doc_id"), col("source"), col("epoch_bp"),
          col("up_bucket"), col("n_copies"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx")),
    Some("""WITH b AS (
        SELECT doc_id, source,
          (CAST(doc_id AS BIGINT) * 3266489917) % 4294967296 % 10000
            AS up_bucket,
          CAST(CASE WHEN source = 'src0' THEN 25000
               WHEN source = 'src1' THEN 0 ELSE 7500 END AS BIGINT)
            AS epoch_bp
        FROM documents),
      c AS (
        SELECT doc_id, source, epoch_bp, up_bucket,
          epoch_bp // 10000 +
            CASE WHEN up_bucket < epoch_bp % 10000 THEN 1 ELSE 0 END
            AS n_copies
        FROM b)
      SELECT doc_id, source, epoch_bp, up_bucket, n_copies,
        unnest(range(n_copies)) AS copy_idx
      FROM c WHERE n_copies > 0 ORDER BY doc_id, copy_idx"""))

  // P22: corpus shuffle + sharding — the dataloader-facing permutation.
  // The key/shard assignment is pure bijective arithmetic → full
  // oracle; the physical exchange+local-sort shape is PlanSpec-locked.
  private val corpusShuffle = Q(
    "corpus_shuffle",
    (s, d) =>
      Packing.shuffleShards(Tables.load(s, d, "documents"), nShards = 64)
        .select(col("doc_id"), col("shuffle_key"), col("shard"))
        .orderBy(col("shuffle_key"), col("doc_id")),
    Some("""SELECT doc_id,
        (CAST(doc_id AS BIGINT) * 668265263) % 4294967296 AS shuffle_key,
        (CAST(doc_id AS BIGINT) * 668265263) % 4294967296 // 67108864
          AS shard
      FROM documents ORDER BY shuffle_key, doc_id"""))

  // P12b: sliding context windows with overlap — integer arithmetic
  // only, oracled bit-for-bit. window=64/stride=48 so the ~50-token
  // docs genuinely produce 1–2 overlapping windows at every SF.
  private val packWindows = Q(
    "pack_windows",
    (s, d) =>
      Packing.slidingWindows(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id"), col("win_idx")),
    Some("""WITH t AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      w AS (SELECT doc_id, n_tokens,
        (greatest(n_tokens - 64, 0) + 47) // 48 + 1 AS n_windows FROM t),
      e AS (SELECT doc_id, n_tokens,
        unnest(range(0, n_windows)) AS win_idx FROM w)
      SELECT doc_id, win_idx, win_idx * 48 AS tok_start,
        least(64, n_tokens - win_idx * 48) AS tok_len
      FROM e ORDER BY doc_id, win_idx"""))

  // P12c: length-bucketed batching — per-shard rank arithmetic, fully
  // oracled (same total order, same integer division).
  private val packBatches = Q(
    "pack_batches",
    (s, d) =>
      Packing.batchByLength(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id,
          doc_id % 8 AS shard,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      r AS (SELECT doc_id, shard, n_tokens,
        (row_number() OVER (PARTITION BY shard
          ORDER BY n_tokens, doc_id) - 1) // 8 AS batch_idx
        FROM t)
      SELECT doc_id, shard, n_tokens, batch_idx,
        max(n_tokens) OVER (PARTITION BY shard, batch_idx) - n_tokens
          AS pad_cost
      FROM r ORDER BY doc_id"""))

  // P20: quota (stratified) sampling — exactly 10 docs per source by
  // Knuth-hash rank (10 < the ~25 docs/source at verify SF, so the
  // candidate-bucket pruning and the null-rank branch are BOTH
  // exercised). The Spark side ranks ONLY candidate key-buckets
  // (histogram decomposition, Packing.quotaSample); the oracle computes
  // the GLOBAL per-group rank the old-fashioned way and nulls it where
  // the bucket cumulative says "past the quota" — so a bucketing bug
  // (wrong cum offset, wrong bucket boundary) hash-mismatches against
  // an independent global ranking, not against a mirror of itself.
  private val quotaSampleQ = Q(
    "quota_sample",
    (s, d) =>
      Packing.quotaSample(Tables.load(s, d, "documents"), nPerGroup = 10)
        .select(col("doc_id"), col("source"), col("q_rank"), col("kept"))
        .orderBy(col("doc_id")),
    Some("""WITH k AS (
        SELECT doc_id, source,
          (CAST(doc_id AS BIGINT) * 2971215073) % 4294967296 AS q_key
        FROM documents),
      b AS (SELECT doc_id, source, q_key, q_key // 4194304 AS q_bucket
        FROM k),
      h AS (SELECT source, q_bucket, count(*) AS bcount
        FROM b GROUP BY 1, 2),
      c AS (SELECT source, q_bucket,
        coalesce(sum(bcount) OVER (PARTITION BY source ORDER BY q_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS cum_before
        FROM h),
      r AS (SELECT b.doc_id, b.source, c.cum_before,
        CAST(row_number() OVER (PARTITION BY b.source
          ORDER BY b.q_key, b.doc_id) AS BIGINT) AS grank
        FROM b JOIN c USING (source, q_bucket))
      SELECT doc_id, source,
        CASE WHEN cum_before < 10 THEN grank END AS q_rank,
        coalesce(CASE WHEN cum_before < 10 THEN grank END <= 10, false)
          AS kept
      FROM r ORDER BY doc_id"""))

  // P17: token-budget selection — the oracle is the global greedy prefix
  // (quality DESC, doc_id) the bucketed plan must equal exactly; quality
  // arithmetic mirrors text_quality's. Budget 10k ≈ 37% of sf0.01 tokens,
  // so the boundary bucket is genuinely exercised at verify SF.
  private val selectBudget = Q(
    "select_budget",
    (s, d) =>
      Packing.selectByBudget(Tables.load(s, d, "documents"),
          budgetTokens = 10000L)
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (
        SELECT doc_id, text,
          string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        len(list_filter(toks, x -> list_contains($stopListSql, x))) AS stops,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / len(toks) AS mtl
        FROM t),
      q AS (SELECT doc_id, n_tokens,
        round(least(1.0, CAST(n_tokens AS DOUBLE) / 100) * 0.5
          + least(1.0, CAST(stops AS DOUBLE) / n_tokens * 5) * 0.3
          + CASE WHEN mtl BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END, 6)
          AS quality_score
        FROM m),
      c AS (SELECT doc_id, n_tokens, quality_score,
        sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM q WHERE quality_score IS NOT NULL)
      SELECT doc_id, n_tokens, quality_score FROM c
      WHERE cum <= 10000 ORDER BY doc_id"""))

  // P18: deterministic vocabulary — top-200 tokens by (count DESC,
  // token), ids in rank order; fully oracled.
  private val textVocab = Q(
    "text_vocab",
    (s, d) =>
      TextAnalysis.vocabulary(Tables.load(s, d, "documents"), 200)
        .orderBy(col("token_id")),
    Some("""WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      c AS (SELECT token, count(*) AS n_occurrences FROM tok
        WHERE token <> '' GROUP BY token
        ORDER BY n_occurrences DESC, token LIMIT 200)
      SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) - 1
          AS BIGINT) AS token_id,
        token, n_occurrences
      FROM c ORDER BY token_id"""))

  // P18b: token-id encoding over the vocabulary; OOV → −1; ids emitted
  // as a comma-joined string (§6: no array outputs). DuckDB's parallel
  // unnest zips the token list with its positions.
  private val textEncode = Q(
    "text_encode",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      TextAnalysis.encodeTokens(docs, TextAnalysis.vocabulary(docs, 200))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      c AS (SELECT token, count(*) AS n_occurrences FROM tok
        WHERE token <> '' GROUP BY token
        ORDER BY n_occurrences DESC, token LIMIT 200),
      v AS (SELECT CAST(row_number() OVER
          (ORDER BY n_occurrences DESC, token) - 1 AS BIGINT) AS token_id,
        token FROM c),
      tl AS (SELECT doc_id,
        string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents),
      e AS (SELECT doc_id, unnest(ts) AS token,
        unnest(range(1, len(ts) + 1)) AS pos FROM tl),
      j AS (SELECT doc_id, pos, coalesce(v.token_id, -1) AS tid,
        CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END AS oov
        FROM e LEFT JOIN v USING (token))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(oov) AS BIGINT) AS n_oov,
        string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids
      FROM j GROUP BY doc_id ORDER BY doc_id"""))

  // P19: corpus-internal bigram cross-entropy (perplexity proxy) —
  // add-one smoothed ln P(w2|w1); each ln rounded 6dp BEFORE the mean
  // (round-early: libm differences live far below that grain), mean
  // rounded 4dp. Fully oracled.
  // P8d: per-source robust length outliers — lower-median + MAD from a
  // length histogram (exact order statistics with no per-group sort);
  // the oracle recomputes both medians with the identical rank rule.
  private val textOutliers = Q(
    "text_outliers",
    (s, d) =>
      TextAnalysis.withLengthOutliers(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      h AS (SELECT source, n_tokens, count(*) AS c FROM t GROUP BY 1, 2),
      tot AS (SELECT source, sum(c) AS tc FROM h GROUP BY 1),
      cum AS (SELECT source, n_tokens,
        sum(c) OVER (PARTITION BY source ORDER BY n_tokens) AS cc FROM h),
      med AS (SELECT cum.source, min(n_tokens) AS med
        FROM cum JOIN tot USING (source)
        WHERE cc >= (tc + 1) // 2 GROUP BY 1),
      dh AS (SELECT h.source, abs(h.n_tokens - m.med) AS dev, sum(c) AS c
        FROM h JOIN med m ON h.source = m.source GROUP BY 1, 2),
      dcum AS (SELECT source, dev,
        sum(c) OVER (PARTITION BY source ORDER BY dev) AS cc FROM dh),
      mad AS (SELECT dcum.source, min(dev) AS mad
        FROM dcum JOIN tot USING (source)
        WHERE cc >= (tc + 1) // 2 GROUP BY 1)
      SELECT t.doc_id, t.source, t.n_tokens, m.med, a.mad,
        (a.mad > 0 AND
          abs(0.6745 * (t.n_tokens - m.med) / a.mad) > 3.5) AS flagged
      FROM t JOIN med m ON t.source = m.source
      JOIN mad a ON t.source = a.source
      ORDER BY t.doc_id"""))

  // P21: per-source data card — exact histogram percentiles (same rank
  // rule as text_outliers), decimal-exact quality mass, sha256 dup
  // counts, all mirrored arithmetically by DuckDB.
  private val corpusStatsQ = Q(
    "corpus_stats",
    (s, d) =>
      TextAnalysis.corpusStats(Tables.load(s, d, "documents"))
        .orderBy(col("source")),
    Some(s"""WITH t AS (
        SELECT doc_id, source, lang, text,
          string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      m AS (SELECT doc_id, source, lang, text,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          len(list_filter(toks, x -> list_contains($stopListSql, x)))
            AS stops,
          CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / len(toks) AS mtl
        FROM t),
      q AS (SELECT doc_id, source, lang, text, n_tokens,
          round(least(1.0, CAST(n_tokens AS DOUBLE) / 100) * 0.5
            + least(1.0, CAST(stops AS DOUBLE) / n_tokens * 5) * 0.3
            + CASE WHEN mtl BETWEEN 3 AND 10 THEN 0.2 ELSE 0.0 END, 6)
            AS quality_score
        FROM m),
      base AS (SELECT source, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
          count(DISTINCT lang) AS n_langs,
          round(CAST(sum(CAST(quality_score AS DECIMAL(28,6))) AS DOUBLE),
            6) AS quality_sum
        FROM q GROUP BY 1),
      h AS (SELECT source, n_tokens AS v, count(*) AS c FROM q
        GROUP BY 1, 2),
      tot AS (SELECT source, sum(c) AS tc FROM h GROUP BY 1),
      cum AS (SELECT source, v,
        sum(c) OVER (PARTITION BY source ORDER BY v) AS cc FROM h),
      pct AS (SELECT cum.source,
          min(CASE WHEN cc >= (tc + 9) // 10 THEN v END) AS tok_p10,
          min(CASE WHEN cc >= (tc + 1) // 2 THEN v END) AS tok_p50,
          min(CASE WHEN cc >= (9 * tc + 9) // 10 THEN v END) AS tok_p90
        FROM cum JOIN tot USING (source) GROUP BY 1),
      dup AS (SELECT source, CAST(sum(copies - 1) AS BIGINT) AS n_exact_dup
        FROM (
          SELECT source, sha256(text) AS hh, count(*) AS copies
          FROM documents GROUP BY 1, 2) GROUP BY 1)
      SELECT b.source, b.n_docs, b.n_tokens, p.tok_p10, p.tok_p50,
        p.tok_p90, d.n_exact_dup, b.n_langs, b.quality_sum
      FROM base b JOIN pct p USING (source) JOIN dup d USING (source)
      ORDER BY source"""))

  // P18c: TF-IDF keyword extraction over the vocabulary — top-3 tokens
  // per doc by smoothed tf-idf; idf rounds at 6dp and the product at
  // 3dp BEFORE ranking on both sides, so the rank ordering is computed
  // over identical doubles (ties break by token).
  private val textTfidf = Q(
    "text_tfidf",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      TextAnalysis.tfidfTopK(docs, TextAnalysis.vocabulary(docs, 200))
        .orderBy(col("doc_id"), col("tfidf_rank"))
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      voc AS (SELECT token FROM (
        SELECT token, count(*) AS n FROM tnz GROUP BY token
        ORDER BY n DESC, token LIMIT 200)),
      tf AS (SELECT doc_id, token, count(*) AS tf
        FROM tnz JOIN voc USING (token) GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT doc_id, token, tf, df,
          round(tf * round(ln((n_docs + 1.0) / (df + 1.0)) + 1.0, 6), 3)
            AS tfidf
        FROM tf JOIN dfq USING (token) CROSS JOIN nd),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY tfidf DESC, token) AS BIGINT) AS tfidf_rank FROM sc)
      SELECT doc_id, token, tf, df, tfidf, tfidf_rank
      FROM r WHERE tfidf_rank <= 3 ORDER BY doc_id, tfidf_rank"""))

  private val textXent = Q(
    "text_xent",
    (s, d) =>
      TextAnalysis.withBigramXent(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      bgf AS (SELECT doc_id, unnest(ts[1:len(ts)-1]) AS w1,
        unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS b
        FROM t WHERE len(ts) >= 2),
      uc AS (SELECT w1, count(*) AS c1 FROM
        (SELECT unnest(ts) AS w1 FROM t) GROUP BY w1),
      vv AS (SELECT count(*) AS v FROM uc),
      bc AS (SELECT b, count(*) AS c12 FROM bgf GROUP BY b),
      sc AS (SELECT doc_id, round(ln((c12 + 1.0) / (c1 + v)), 6) AS lp
        FROM bgf JOIN bc USING (b) JOIN uc USING (w1) CROSS JOIN vv),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(-avg(lp), 4) AS xent FROM sc GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        a.xent
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""))

  // P25: reference-LM perplexity scoring (CCNet discriminator shape) —
  // the bigram LM trains on the Knuth train-split slice only; every
  // doc scores against it, unseen tokens at the smoothing floor.
  private val textRefXent = Q(
    "text_refxent",
    (s, d) =>
      TextAnalysis.withReferenceXent(Tables.load(s, d, "documents"),
          refPct = 50)
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, (doc_id * 2654435761) % 4294967296 % 100 AS bk,
          string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      bgf AS (SELECT doc_id, bk, unnest(ts[1:len(ts)-1]) AS w1,
        unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS b
        FROM t WHERE len(ts) >= 2),
      uc AS (SELECT w1, count(*) AS c1 FROM
        (SELECT unnest(ts) AS w1 FROM t WHERE bk < 50) GROUP BY w1),
      vv AS (SELECT count(*) AS v FROM uc),
      bc AS (SELECT b, count(*) AS c12 FROM bgf WHERE bk < 50 GROUP BY b),
      sc AS (SELECT doc_id,
          round(ln((coalesce(c12, 0) + 1.0) / (coalesce(c1, 0) + v)), 6)
            AS lp
        FROM bgf LEFT JOIN bc USING (b) LEFT JOIN uc USING (w1)
        CROSS JOIN vv),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(-avg(lp), 4) AS ref_xent FROM sc GROUP BY doc_id)
      SELECT d.doc_id,
        (d.doc_id * 2654435761) % 4294967296 % 100 < 50 AS in_ref,
        coalesce(a.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        a.ref_xent
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""))

  // P26: CCNet head/middle/tail quality curriculum — exact-rank
  // tercile bucketing of the reference-LM score WITHOUT a global sort
  // (histogram rank rule); the oracle recomputes boundaries with the
  // identical cumulative-count rule and CASE.
  private val qualityBuckets = Q(
    "quality_buckets",
    (s, d) => {
      val scored = TextAnalysis.withReferenceXent(
        Tables.load(s, d, "documents"), refPct = 50)
      Packing.bucketByRank(scored, "ref_xent",
          Seq(("head", 3333), ("middle", 6667)))
        .select(col("doc_id"), col("ref_xent"), col("bucket"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (
        SELECT doc_id, (doc_id * 2654435761) % 4294967296 % 100 AS bk,
          string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      bgf AS (SELECT doc_id, bk, unnest(ts[1:len(ts)-1]) AS w1,
        unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS b
        FROM t WHERE len(ts) >= 2),
      uc AS (SELECT w1, count(*) AS c1 FROM
        (SELECT unnest(ts) AS w1 FROM t WHERE bk < 50) GROUP BY w1),
      vv AS (SELECT count(*) AS v FROM uc),
      bc AS (SELECT b, count(*) AS c12 FROM bgf WHERE bk < 50 GROUP BY b),
      sc AS (SELECT doc_id,
          round(ln((coalesce(c12, 0) + 1.0) / (coalesce(c1, 0) + v)), 6)
            AS lp
        FROM bgf LEFT JOIN bc USING (b) LEFT JOIN uc USING (w1)
        CROSS JOIN vv),
      agg AS (SELECT doc_id, round(-avg(lp), 4) AS ref_xent
        FROM sc GROUP BY doc_id),
      scored AS (SELECT d.doc_id, a.ref_xent
        FROM documents d LEFT JOIN agg a USING (doc_id)),
      hist AS (SELECT ref_xent AS v, count(*) AS c FROM scored
        WHERE ref_xent IS NOT NULL GROUP BY 1),
      cum AS (SELECT v, sum(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          (SELECT sum(c) FROM hist) AS n
        FROM hist),
      b1 AS (SELECT min(v) AS b FROM cum WHERE cum * 10000 >= n * 3333),
      b2 AS (SELECT min(v) AS b FROM cum WHERE cum * 10000 >= n * 6667)
      SELECT s.doc_id, s.ref_xent,
        CASE WHEN s.ref_xent IS NULL THEN 'unscored'
             WHEN s.ref_xent <= (SELECT b FROM b1) THEN 'head'
             WHEN s.ref_xent <= (SELECT b FROM b2) THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM scored s ORDER BY s.doc_id"""))

  // P11: multimodal metadata — FULLY oracled (r6). The Spark side
  // synthesizes REAL PPM/WAV/Y4M bytes from a mod-2^32 text seed and
  // parses them back with the real decoders; DuckDB recomputes the
  // expected dims/rates/frame counts from documents.text with pure
  // arithmetic (same rolling hash as text_fingerprint), so a header
  // mis-write OR a parser bug breaks the hash match — the roundtrip is
  // what's being proven.
  private val multimodalMeta = Q(
    "multimodal_meta",
    (s, d) =>
      Multimodal.features(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents),
      m AS (
        SELECT doc_id, doc_id % 3 AS kind,
          4 + seed % 29 AS pw, 4 + (seed // 65536) % 29 AS ph,
          64 + seed % 4096 AS wn, 1 + (seed // 256) % 120 AS vf
        FROM s)
      SELECT doc_id,
        CASE kind WHEN 0 THEN 'image/x-portable-pixmap'
                  WHEN 1 THEN 'audio/wav'
                  ELSE 'video/x-yuv4mpeg' END AS mime,
        CAST(CASE kind
          WHEN 0 THEN 9 + length(CAST(pw AS VARCHAR))
                    + length(CAST(ph AS VARCHAR)) + pw * ph * 3
          WHEN 1 THEN 44 + 2 * wn
          ELSE 30 + vf * 102 END AS BIGINT) AS byte_len,
        CAST(CASE kind WHEN 0 THEN pw WHEN 2 THEN 8 ELSE 0 END
          AS INTEGER) AS width,
        CAST(CASE kind WHEN 0 THEN ph WHEN 2 THEN 8 ELSE 0 END
          AS INTEGER) AS height,
        CAST(CASE kind WHEN 0 THEN 1 WHEN 2 THEN vf ELSE 0 END
          AS INTEGER) AS n_frames,
        CAST(CASE kind WHEN 1 THEN 8000 ELSE 0 END AS INTEGER)
          AS sample_rate,
        CAST(CASE kind WHEN 1 THEN wn ELSE 0 END AS BIGINT) AS n_samples
      FROM m ORDER BY doc_id"""))

  // P11b: video frame sampling — FULLY oracled (r6): the sampled frame
  // indices and the 4:2:0 payload size are arithmetic on the same seed
  // (the frame BYTES are real plane slices; their content is checked by
  // MultimodalSpec, their length here).
  private val multimodalFrames = Q(
    "multimodal_frames",
    (s, d) =>
      Multimodal.sampleFrames(Tables.load(s, d, "documents"), stride = 10)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some("""WITH s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents),
      v AS (SELECT doc_id, 1 + (seed // 256) % 120 AS vf FROM s
        WHERE doc_id % 3 = 2)
      SELECT doc_id,
        CAST(unnest(range(0, vf, 10)) AS INTEGER) AS frame_idx,
        CAST(96 AS BIGINT) AS frame_len
      FROM v ORDER BY doc_id, frame_idx"""))

  // P11c: image resize + pixel-sum feature — FULLY oracled INCLUDING
  // the pixel content: DuckDB replays the synthesizer's 64-bit LCG in
  // HUGEINT arithmetic (a recursive CTE stepping every image's byte
  // stream), picks the nearest-neighbor source indices with the same
  // integer math, and re-derives the resized image's summed-RGB
  // feature. A hash match proves the decode→resize→extract pass is
  // byte-deterministic cross-engine, not just shape-correct.
  private val multimodalResize = Q(
    "multimodal_resize",
    (s, d) =>
      Multimodal.resizeImages(Tables.load(s, d, "documents"), tw = 8, th = 8)
        .select(col("doc_id"), col("src_w"), col("src_h"),
          col("out_w"), col("out_h"), col("out_len"), col("px_sum"))
        .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents),
      m AS (SELECT doc_id, seed, 4 + seed % 29 AS pw,
          4 + (seed // 65536) % 29 AS ph
        FROM s WHERE doc_id % 3 = 0),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), pw * ph * 3 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      pos AS (SELECT m.doc_id,
          3 * (((y.y * ph) // 8) * pw + ((x.x * pw) // 8)) + c.c AS idx
        FROM m, range(8) y(y), range(8) x(x), range(3) c(c)),
      sums AS (SELECT p.doc_id, CAST(sum(b.b) AS BIGINT) AS px_sum
        FROM pos p JOIN bytes b USING (doc_id, idx) GROUP BY 1)
      SELECT m.doc_id, CAST(pw AS INTEGER) AS src_w,
        CAST(ph AS INTEGER) AS src_h,
        CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
        CAST(203 AS BIGINT) AS out_len, sums.px_sum
      FROM m JOIN sums USING (doc_id) ORDER BY m.doc_id"""))

  // P11f: PNG decode (CRC chunk walk + zlib inflate + unfilter) →
  // resize features, FULL-oracled by the same HUGEINT LCG replay as
  // multimodal_resize: the synthesized PNG carries the SAME pixel
  // stream as the PPM path, so DuckDB re-derives the decoded, resized
  // summed-RGB feature — a hash match proves the real decompression
  // path (deflate round-trip, filter reconstruction, CRC verification)
  // is byte-deterministic. The planted corrupt rows (doc_id ≡ 0 mod
  // 97, one IDAT byte flipped post-CRC) must surface as QUARANTINE
  // rows — crc_ok false, error string, NULL features — which the
  // oracle predicts exactly; a dropped row breaks the row-count match.
  private val multimodalPng = Q(
    "multimodal_png",
    (s, d) =>
      Multimodal.pngResizedFeatures(Tables.load(s, d, "documents"),
          tw = 8, th = 8)
        .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents),
      m0 AS (SELECT doc_id, seed, 4 + seed % 29 AS pw,
          4 + (seed // 65536) % 29 AS ph
        FROM s WHERE doc_id % 3 = 0),
      ok AS (SELECT * FROM m0 WHERE doc_id % 97 != 0),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), pw * ph * 3 FROM ok
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      pos AS (SELECT ok.doc_id,
          3 * (((y.y * ph) // 8) * pw + ((x.x * pw) // 8)) + c.c AS idx
        FROM ok, range(8) y(y), range(8) x(x), range(3) c(c)),
      sums AS (SELECT p.doc_id, CAST(sum(b.b) AS BIGINT) AS px_sum
        FROM pos p JOIN bytes b USING (doc_id, idx) GROUP BY 1)
      SELECT m0.doc_id, (m0.doc_id % 97 != 0) AS crc_ok,
        CASE WHEN m0.doc_id % 97 = 0 THEN 'CRC mismatch in IDAT' END
          AS error,
        CASE WHEN m0.doc_id % 97 = 0 THEN NULL
          ELSE CAST(pw AS INTEGER) END AS src_w,
        CASE WHEN m0.doc_id % 97 = 0 THEN NULL
          ELSE CAST(ph AS INTEGER) END AS src_h,
        sums.px_sum
      FROM m0 LEFT JOIN sums USING (doc_id) ORDER BY m0.doc_id"""))

  // P11g: JPEG decode through javax.imageio — the format real crawls
  // contain. Deterministic claims (decode success per the planted
  // truncation rule, header dims from the seed formula) are FULLY
  // oracled; the lossy pixel content is gated by the in-query fidelity
  // boolean (mean luma error ≤ 24 vs the regenerated source — r13
  // measured ≤ 0.25 at q=1.0 grayscale across all three SFs, garbage
  // scores ~85). The quarantine contract (truncated downloads emitted
  // with decode_ok=false, never dropped) is part of the oracle: DuckDB
  // recomputes exactly which rows must be quarantined.
  private val multimodalJpeg = Q(
    "multimodal_jpeg",
    (s, d) =>
      Multimodal.jpegDecodedFeatures(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("decode_ok"), col("src_w"),
          col("src_h"), col("fidelity_ok"))
        .orderBy(col("doc_id")),
    Some("""WITH s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents WHERE doc_id % 3 = 1)
      SELECT doc_id, (doc_id % 89 != 0) AS decode_ok,
        CASE WHEN doc_id % 89 = 0 THEN NULL
          ELSE CAST(4 + seed % 29 AS INTEGER) END AS src_w,
        CASE WHEN doc_id % 89 = 0 THEN NULL
          ELSE CAST(4 + (seed // 65536) % 29 AS INTEGER) END AS src_h,
        CASE WHEN doc_id % 89 = 0 THEN NULL ELSE TRUE END AS fidelity_ok
      FROM s ORDER BY doc_id"""))

  // IO12: WebDataset-style tar shard round trip — the PPM image slice
  // packed into 8 tar shards (Shards.writeTarShards), read back
  // distributed (one binaryFile row per shard, per-task ustar walk
  // with checksum verification), and proven against the oracle on BOTH
  // deterministic axes: byte_len is recomputed by DuckDB from the seed
  // formula (PPM header digits + w·h·3 payload), and bytes_ok is the
  // in-query equality of the shard-stored bytes against a freshly
  // synthesized copy — the storage layer must be byte-transparent.
  private val shardsRoundtrip = Q(
    "shards_roundtrip",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0)
      val media = Multimodal.mediaTable(docs)
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit(".ppm")).as("name"),
          col("media"))
      val root = graft.GraftSession.scratchDir(
        "tar_shards_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      graft.sources.Shards.writeTarShards(media, root, nShards = 8)
      val back = graft.sources.Shards.readTarShards(s, root)
      back.select(
          substring_index(col("name"), ".", 1).cast("long").as("doc_id"),
          length(col("bytes")).cast("long").as("byte_len"),
          col("bytes"))
        .join(media.select(col("doc_id"), col("media").as("orig")),
          Seq("doc_id"))
        .select(col("doc_id"), col("byte_len"),
          (col("bytes") === col("orig")).as("bytes_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents WHERE doc_id % 3 = 0),
      dims AS (SELECT doc_id, 4 + seed % 29 AS w,
          4 + (seed // 65536) % 29 AS h FROM s)
      SELECT doc_id,
        CAST(length('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
            || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
          + w * h * 3 AS BIGINT) AS byte_len,
        TRUE AS bytes_ok
      FROM dims ORDER BY doc_id"""))

  // P11h (r14): the WebDataset dedup loop END TO END — the workload
  // the shard family exists for: PNG media (with planted exact
  // re-ingests AND planted IDAT corruption) written as SIZE-BOUNDED
  // tar shards (IO12's maxShardBytes roll), read back through the
  // streaming tar walk, REAL PNG decode with quarantine (P11f's CRC/
  // inflate/unfilter path — corrupt rows surface as crc_ok=false,
  // never dropped), perceptual aHash on the DECODED pixels (P11e),
  // banded recall-1 candidate join, CC keep decision (P4b's min-id
  // rule). FULLY oracled: DuckDB replays the LCG pixel stream, the
  // hash bits, the brute-force pair set AND closes the components
  // with the recursive reach CTE — a hash match proves the storage
  // layer was byte-transparent, the decoder byte-exact, the banding
  // lossless at the radius, and the keep decision identical. PNG (not
  // JPEG) is the decode leg because it is lossless: a pixel-derived
  // hash stays engine-replayable; the lossy JPEG leg's contract is
  // multimodal_jpeg's fidelity gate.
  private val shardsPhashKeep = Q(
    "shards_phash_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      // plant "same image crawled twice": +999999 ≡ 0 (mod 3) keeps
      // the copies on the image slice (the multimodal_phash idiom)
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val png = Multimodal.pngTable(docs.unionByName(planted))
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit(".png")).as("name"),
          col("media"))
      val root = graft.GraftSession.scratchDir(
        "tar_shards_keep_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      graft.sources.Shards.writeTarShards(png, root, nShards = 8,
        maxShardBytes = 512L * 1024) // the size-bounded WebDataset shape
      val back = graft.sources.Shards.readTarShards(s, root)
        .select(substring_index(col("name"), ".", 1).cast("long")
          .as("doc_id"), col("bytes"))
      val hashed = Multimodal.pngAHashes(back).localCheckpoint()
      val okHashes = hashed.filter(col("crc_ok"))
        .select(col("doc_id"), col("ahash"))
      // the LINEAR keep path (hashDedupEdges): star edges per
      // identical-hash group + one edge per within-radius hash pair —
      // same CC connectivity as the complete pair relation (which the
      // oracle brute-forces), flood-proof at crawl scale
      val edges = Multimodal.hashDedupEdges(okHashes, maxHamming = 3)
      val kept = Dedup.keepAfterNearDedup(
          hashed.filter(col("crc_ok")).select(col("doc_id")), edges)
        .withColumn("keep", lit(true))
      hashed.select(col("doc_id"), col("crc_ok"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("crc_ok"),
          coalesce(col("keep"), lit(false)).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 0),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 4 + seed % 29 AS pw,
          4 + (seed // 65536) % 29 AS ph
        FROM s WHERE doc_id % 3 = 0),
      ok AS (SELECT * FROM m WHERE doc_id % 97 != 0),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), pw * ph * 3 FROM ok
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      pix AS (SELECT ok.doc_id, y.y * 8 + x.x AS p,
          3 * (((y.y * ph) // 8) * pw + ((x.x * pw) // 8)) AS base
        FROM ok, range(8) y(y), range(8) x(x)),
      gray AS (SELECT p.doc_id, p.p, b0.b + b1.b + b2.b AS g
        FROM pix p
        JOIN bytes b0 ON b0.doc_id = p.doc_id AND b0.idx = p.base
        JOIN bytes b1 ON b1.doc_id = p.doc_id AND b1.idx = p.base + 1
        JOIN bytes b2 ON b2.doc_id = p.doc_id AND b2.idx = p.base + 2),
      tot AS (SELECT doc_id, sum(g) AS total FROM gray GROUP BY 1),
      h AS (SELECT g.doc_id,
          CAST(sum(CASE WHEN g.g * 64 > t.total THEN
              CASE WHEN g.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << g.p) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM gray g JOIN tot t USING (doc_id) GROUP BY 1),
      prs AS (SELECT h1.doc_id AS a, h2.doc_id AS b
        FROM h h1 JOIN h h2 ON h1.doc_id < h2.doc_id
        WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 3),
      edges AS (SELECT a, b FROM prs UNION ALL SELECT b, a FROM prs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM ok
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      comp AS (SELECT src AS doc_id, min(dst) AS c FROM reach GROUP BY 1)
      SELECT m.doc_id, (m.doc_id % 97 != 0) AS crc_ok,
        coalesce(m.doc_id = comp.c, FALSE) AS keep
      FROM m LEFT JOIN comp ON m.doc_id = comp.doc_id
      ORDER BY m.doc_id"""))

  // P11d: audio feature extraction — FULLY oracled including the PCM
  // sample content, by the same HUGEINT LCG replay as
  // multimodal_resize: DuckDB regenerates every audio byte, pairs them
  // into little-endian signed 16-bit samples, and recomputes |s| sums
  // and the zero-crossing count with a lag window.
  private val multimodalAudio = Q(
    "multimodal_audio",
    (s, d) =>
      Multimodal.audioFeatures(Tables.load(s, d, "documents"))
        .orderBy(col("doc_id")),
    Some("""WITH RECURSIVE s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM documents),
      m AS (SELECT doc_id, seed, 64 + seed % 4096 AS ns FROM s
        WHERE doc_id % 3 = 1),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), ns * 2 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      smp AS (SELECT lo.doc_id, lo.idx // 2 AS j,
          CASE WHEN lo.b + 256 * hi.b >= 32768
            THEN lo.b + 256 * hi.b - 65536
            ELSE lo.b + 256 * hi.b END AS sv
        FROM bytes lo JOIN bytes hi
          ON hi.doc_id = lo.doc_id AND hi.idx = lo.idx + 1
        WHERE lo.idx % 2 = 0),
      lagd AS (SELECT doc_id, sv,
          lag(sv) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        FROM smp),
      f AS (SELECT doc_id, CAST(sum(abs(sv)) AS BIGINT) AS abs_sum,
          CAST(count(*) FILTER (pv IS NOT NULL
            AND ((sv >= 0) != (pv >= 0))) AS BIGINT) AS zero_crossings
        FROM lagd GROUP BY 1)
      SELECT m.doc_id, CAST(8000 AS INTEGER) AS sample_rate,
        CAST(ns AS BIGINT) AS n_samples, f.abs_sum, f.zero_crossings
      FROM m JOIN f USING (doc_id) ORDER BY m.doc_id"""))

  // P11i (r14): audio near-dup by 64-bit loudness-envelope fingerprint
  // — the AUDIO leg of the near-dup family, completing the modality
  // set (text exact/minhash/simhash/semantic, image aHash, audio
  // this). DuckDB replays the PCM samples (the multimodal_audio LCG
  // CTE), assigns sample j to window floor(j*64/n), re-derives the
  // all-integer above-mean bit (wsum*n > total*wlen), builds the
  // signed 64-bit hash, and brute-forces ALL clip pairs with
  // bit_count(xor) — a hash match proves the distinct-value banding
  // has recall 1 at the radius AND the fingerprint bits are
  // engine-exact. Planted exact re-ingests at +999999 (≡ 0 mod 3,
  // so % 30 == 1 source rows stay on the audio ≡ 1 slice).
  private val multimodalAudiodup = Q(
    "multimodal_audiodup",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 1)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      Multimodal.audioHashPairs(docs.unionByName(planted), maxHamming = 3)
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 1),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 64 + seed % 4096 AS ns FROM s
        WHERE doc_id % 3 = 1),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), ns * 2 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      smp AS (SELECT lo.doc_id, lo.idx // 2 AS j,
          CASE WHEN lo.b + 256 * hi.b >= 32768
            THEN lo.b + 256 * hi.b - 65536
            ELSE lo.b + 256 * hi.b END AS sv
        FROM bytes lo JOIN bytes hi
          ON hi.doc_id = lo.doc_id AND hi.idx = lo.idx + 1
        WHERE lo.idx % 2 = 0),
      win AS (SELECT smp.doc_id, (smp.j * 64) // m.ns AS w,
          abs(smp.sv) AS a
        FROM smp JOIN m USING (doc_id)),
      ws AS (SELECT doc_id, w, sum(a) AS wsum, count(*) AS wlen
        FROM win GROUP BY 1, 2),
      tot AS (SELECT doc_id, sum(wsum) AS t, sum(wlen) AS n
        FROM ws GROUP BY 1),
      h AS (SELECT ws.doc_id,
          CAST(sum(CASE WHEN ws.wsum * tot.n > tot.t * ws.wlen THEN
              CASE WHEN ws.w = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << ws.w) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM ws JOIN tot USING (doc_id) GROUP BY 1)
      SELECT h1.doc_id AS a, h2.doc_id AS b,
        CAST(bit_count(xor(h1.ahash, h2.ahash)) AS BIGINT) AS hamming
      FROM h h1 JOIN h h2 ON h1.doc_id < h2.doc_id
      WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 3
      ORDER BY a, b"""))

  // P11j (r14): video near-dup by per-frame luma aHash — the FOURTH
  // and last near-dup modality. Two videos pair when sampled frames at
  // the SAME position hash within radius; evidence = matched-frame
  // count. The oracle is cheap by construction: the synthesizer seeds
  // each frame independently (seed + frame_idx), so DuckDB replays
  // ONLY the sampled frames' 64 luma bytes (64 LCG steps each), the
  // above-mean bits, the signed hash, and brute-forces all same-
  // position frame pairs — banding recall 1 and engine-exact bits.
  // Planted exact re-ingests at +999999 (%30 == 2 rows stay ≡ 2 mod 3,
  // the video slice).
  private val multimodalVideodup = Q(
    "multimodal_videodup",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 2)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      Multimodal.videoNearDupPairs(docs.unionByName(planted),
          stride = 10, maxHamming = 3, minMatches = 1)
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 2),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 1 + (seed // 256) % 120 AS vf FROM s
        WHERE doc_id % 3 = 2),
      fr AS (SELECT doc_id,
          CAST(unnest(range(0, vf, 10)) AS INTEGER) AS fidx,
          seed + unnest(range(0, vf, 10)) AS fseed
        FROM m),
      gen(doc_id, fidx, i, st) AS (
        SELECT doc_id, fidx, 0, CAST(fseed AS HUGEINT) FROM fr
        UNION ALL
        SELECT doc_id, fidx, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT)
        FROM gen WHERE i < 64),
      yb AS (SELECT doc_id, fidx, i - 1 AS p,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS y
        FROM gen WHERE i > 0),
      tot AS (SELECT doc_id, fidx, sum(y) AS total FROM yb GROUP BY 1, 2),
      fh AS (SELECT yb.doc_id, yb.fidx,
          CAST(sum(CASE WHEN yb.y * 64 > t.total THEN
              CASE WHEN yb.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << yb.p) END
            ELSE 0 END) AS BIGINT) AS fhash
        FROM yb JOIN tot t ON t.doc_id = yb.doc_id AND t.fidx = yb.fidx
        GROUP BY 1, 2),
      prs AS (SELECT f1.doc_id AS a, f2.doc_id AS b,
          CAST(count(*) AS BIGINT) AS n_matched
        FROM fh f1 JOIN fh f2 ON f1.fidx = f2.fidx
          AND f1.doc_id < f2.doc_id
          AND bit_count(xor(f1.fhash, f2.fhash)) <= 3
        GROUP BY 1, 2)
      SELECT a, b, n_matched FROM prs WHERE n_matched >= 1
      ORDER BY a, b"""))

  // P11j-keep (r14; r15 LINEAR edge path): the video DECISION — CC
  // min-id keep, mirroring P11h's image keep. r15 closes the r14
  // verdict's one defect: the keep rides Multimodal.videoDedupEdges
  // (per-(frame_idx, fhash) representative star edges + equal-position
  // rep edges — flood-LINEAR, CC-equivalent at minMatches=1) instead
  // of the quadratic complete pair relation. The oracle still
  // brute-forces the complete pair set and closes it with the
  // recursive reach CTE — a match therefore PROVES the edge builder's
  // connectivity-equivalence claim end to end, not just the hashes.
  private val multimodalVideodupKeep = Q(
    "multimodal_videodup_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 2)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val all = docs.unionByName(planted)
      val vids = all.filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id"))
      val pairs = Multimodal.videoDedupEdges(all, stride = 10,
        maxHamming = 3)
      Dedup.keepAfterNearDedup(vids, pairs)
        .withColumn("keep", lit(true))
        .join(vids, Seq("doc_id"), "right")
        .select(col("doc_id"), coalesce(col("keep"), lit(false)).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 2),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 1 + (seed // 256) % 120 AS vf FROM s
        WHERE doc_id % 3 = 2),
      fr AS (SELECT doc_id,
          CAST(unnest(range(0, vf, 10)) AS INTEGER) AS fidx,
          seed + unnest(range(0, vf, 10)) AS fseed
        FROM m),
      gen(doc_id, fidx, i, st) AS (
        SELECT doc_id, fidx, 0, CAST(fseed AS HUGEINT) FROM fr
        UNION ALL
        SELECT doc_id, fidx, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT)
        FROM gen WHERE i < 64),
      yb AS (SELECT doc_id, fidx, i - 1 AS p,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS y
        FROM gen WHERE i > 0),
      tot AS (SELECT doc_id, fidx, sum(y) AS total FROM yb GROUP BY 1, 2),
      fh AS (SELECT yb.doc_id, yb.fidx,
          CAST(sum(CASE WHEN yb.y * 64 > t.total THEN
              CASE WHEN yb.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << yb.p) END
            ELSE 0 END) AS BIGINT) AS fhash
        FROM yb JOIN tot t ON t.doc_id = yb.doc_id AND t.fidx = yb.fidx
        GROUP BY 1, 2),
      prs AS (SELECT f1.doc_id AS a, f2.doc_id AS b
        FROM fh f1 JOIN fh f2 ON f1.fidx = f2.fidx
          AND f1.doc_id < f2.doc_id
          AND bit_count(xor(f1.fhash, f2.fhash)) <= 3
        GROUP BY 1, 2),
      edges AS (SELECT a, b FROM prs UNION ALL SELECT b, a FROM prs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM m
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      comp AS (SELECT src AS doc_id, min(dst) AS c FROM reach GROUP BY 1)
      SELECT m.doc_id, (m.doc_id = comp.c) AS keep
      FROM m JOIN comp ON m.doc_id = comp.doc_id
      ORDER BY m.doc_id"""))

  // P11i-keep (r15): the audio DECISION — CC min-id keep over the
  // envelope-fingerprint near-dup relation, on the LINEAR edge path
  // from the start (Multimodal.hashDedupEdges applies directly: one
  // 64-bit hash per clip, exactly the image shape). The oracle replays
  // the fingerprint bit-for-bit, brute-forces the complete within-
  // radius pair set and closes it with the recursive reach CTE — a
  // match proves the star+rep edge set is connectivity-identical.
  private val multimodalAudiodupKeep = Q(
    "multimodal_audiodup_keep",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 1)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val all = docs.unionByName(planted)
      val auds = all.filter(pmod(col("doc_id"), lit(3)) === 1)
        .select(col("doc_id"))
      val edges = Multimodal.hashDedupEdges(
        Multimodal.audioFingerprint(all).localCheckpoint(),
        maxHamming = 3)
      Dedup.keepAfterNearDedup(auds, edges)
        .withColumn("keep", lit(true))
        .join(auds, Seq("doc_id"), "right")
        .select(col("doc_id"), coalesce(col("keep"), lit(false)).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 1),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 64 + seed % 4096 AS ns FROM s
        WHERE doc_id % 3 = 1),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), ns * 2 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      smp AS (SELECT lo.doc_id, lo.idx // 2 AS j,
          CASE WHEN lo.b + 256 * hi.b >= 32768
            THEN lo.b + 256 * hi.b - 65536
            ELSE lo.b + 256 * hi.b END AS sv
        FROM bytes lo JOIN bytes hi
          ON hi.doc_id = lo.doc_id AND hi.idx = lo.idx + 1
        WHERE lo.idx % 2 = 0),
      win AS (SELECT smp.doc_id, (smp.j * 64) // m.ns AS w,
          abs(smp.sv) AS a
        FROM smp JOIN m USING (doc_id)),
      ws AS (SELECT doc_id, w, sum(a) AS wsum, count(*) AS wlen
        FROM win GROUP BY 1, 2),
      tot AS (SELECT doc_id, sum(wsum) AS t, sum(wlen) AS n
        FROM ws GROUP BY 1),
      h AS (SELECT ws.doc_id,
          CAST(sum(CASE WHEN ws.wsum * tot.n > tot.t * ws.wlen THEN
              CASE WHEN ws.w = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << ws.w) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM ws JOIN tot USING (doc_id) GROUP BY 1),
      prs AS (SELECT h1.doc_id AS a, h2.doc_id AS b
        FROM h h1 JOIN h h2 ON h1.doc_id < h2.doc_id
        WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 3),
      edges AS (SELECT a, b FROM prs UNION ALL SELECT b, a FROM prs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM m
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      comp AS (SELECT src AS doc_id, min(dst) AS c FROM reach GROUP BY 1)
      SELECT m.doc_id, (m.doc_id = comp.c) AS keep
      FROM m JOIN comp ON m.doc_id = comp.doc_id
      ORDER BY m.doc_id"""))

  // P11e: image near-dup by perceptual aHash — the pixel path of the
  // near-dup family. DuckDB replays the LCG byte stream, the
  // nearest-neighbor gray sums, the integer above-mean threshold, the
  // 64-bit hash (signed two's-complement built term-by-term so bit 63
  // lands exactly on BIGINT), and brute-forces ALL image pairs with
  // bit_count(xor) — a hash match proves the banded candidate join
  // has recall 1 at the radius AND the hash bits are engine-exact.
  private val multimodalPhash = Q(
    "multimodal_phash",
    (s, d) => {
      // the corpus has no duplicate texts, so no two synthesized
      // images are within any sane radius (LCG avalanche) — plant
      // exact re-ingests (the "same image crawled twice" case) at
      // shifted ids; +999999 ≡ 0 (mod 3) keeps them images. The
      // non-zero radius behavior is pixel-level spec-tested
      // (MultimodalSpec perturbation case) — text-level edits cannot
      // make NEAR-dup images, only exact ones.
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      Multimodal.imageHashPairs(docs.unionByName(planted), maxHamming = 3)
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 0),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 4 + seed % 29 AS pw,
          4 + (seed // 65536) % 29 AS ph
        FROM s WHERE doc_id % 3 = 0),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), pw * ph * 3 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      pix AS (SELECT m.doc_id, y.y * 8 + x.x AS p,
          3 * (((y.y * ph) // 8) * pw + ((x.x * pw) // 8)) AS base
        FROM m, range(8) y(y), range(8) x(x)),
      gray AS (SELECT p.doc_id, p.p, b0.b + b1.b + b2.b AS g
        FROM pix p
        JOIN bytes b0 ON b0.doc_id = p.doc_id AND b0.idx = p.base
        JOIN bytes b1 ON b1.doc_id = p.doc_id AND b1.idx = p.base + 1
        JOIN bytes b2 ON b2.doc_id = p.doc_id AND b2.idx = p.base + 2),
      tot AS (SELECT doc_id, sum(g) AS total FROM gray GROUP BY 1),
      h AS (SELECT g.doc_id,
          CAST(sum(CASE WHEN g.g * 64 > t.total THEN
              CASE WHEN g.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << g.p) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM gray g JOIN tot t USING (doc_id) GROUP BY 1)
      SELECT h1.doc_id AS a, h2.doc_id AS b,
        CAST(bit_count(xor(h1.ahash, h2.ahash)) AS BIGINT) AS hamming
      FROM h h1 JOIN h h2 ON h1.doc_id < h2.doc_id
      WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 3
      ORDER BY a, b"""))

  // P11k (r15): INCREMENTAL media near-dup — today's crawled images
  // (doc_id % 10 >= 6 of the image slice, plus planted re-crawls of
  // indexed images) probed against the PERSISTENT perceptual-hash
  // index of the already-ingested corpus (doc_id % 10 < 6), the media
  // twin of dedup_minhash_incr: the index is built once
  // (MediaHashIndex, build-if-absent-or-stale), the probe hashes only
  // the BATCH and reads the corpus as its stored fixed-width artifacts
  // — never re-hashing yesterday's media, which is what makes the ST24
  // crawl-append story hold at 100 TB. The oracle recomputes the FULL
  // exact batch×index hamming relation in DuckDB from replayed pixel
  // streams — matching it proves the stored chunk join has recall 1 at
  // the pinned radius (a missed candidate would lower that batch doc's
  // count) AND the stored hash round-trip is value-exact.
  private val multimodalPhashIncr = Q(
    "multimodal_phash_incr",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val imgs = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val index = imgs.filter(pmod(col("doc_id"), lit(10)) < 6)
      // planted re-crawls of INDEXED images land in today's batch
      // (%30 == 0 ⊂ the index slice; +999999 keeps the image class)
      val planted = imgs.filter(pmod(col("doc_id"), lit(30)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val batch = imgs.filter(pmod(col("doc_id"), lit(10)) >= 6)
        .unionByName(planted)
      val root = graft.GraftSession.scratchDir(
        "phash_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      // ids upstream of the decode (r15 advice): a fresh-index probe
      // fingerprints doc_ids straight off the parquet scan — the
      // indexed corpus is never re-decoded or re-hashed per query
      graft.pipeline.MediaHashIndex.ensure(
        Multimodal.imageAHash(index), root, maxHamming = 3,
        modality = "image", ids = Some(index.select(col("doc_id"))))
      val cands = graft.pipeline.MediaHashIndex.candidates(
        s, root, Multimodal.imageAHash(batch))
      val per = cands.groupBy(col("batch_id").as("doc_id"))
        .agg(count(lit(1)).as("n_index_dups"))
      batch.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_index_dups"), lit(0L)).as("n_index_dups"))
        .withColumn("dup_in_index", col("n_index_dups") > 0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 0),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 4 + seed % 29 AS pw,
          4 + (seed // 65536) % 29 AS ph
        FROM s WHERE doc_id % 3 = 0),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), pw * ph * 3 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      pix AS (SELECT m.doc_id, y.y * 8 + x.x AS p,
          3 * (((y.y * ph) // 8) * pw + ((x.x * pw) // 8)) AS base
        FROM m, range(8) y(y), range(8) x(x)),
      gray AS (SELECT p.doc_id, p.p, b0.b + b1.b + b2.b AS g
        FROM pix p
        JOIN bytes b0 ON b0.doc_id = p.doc_id AND b0.idx = p.base
        JOIN bytes b1 ON b1.doc_id = p.doc_id AND b1.idx = p.base + 1
        JOIN bytes b2 ON b2.doc_id = p.doc_id AND b2.idx = p.base + 2),
      tot AS (SELECT doc_id, sum(g) AS total FROM gray GROUP BY 1),
      h AS (SELECT g.doc_id,
          CAST(sum(CASE WHEN g.g * 64 > t.total THEN
              CASE WHEN g.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << g.p) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM gray g JOIN tot t USING (doc_id) GROUP BY 1),
      bat AS (SELECT doc_id, ahash FROM h
        WHERE doc_id >= 999999 OR doc_id % 10 >= 6),
      ind AS (SELECT doc_id, ahash FROM h
        WHERE doc_id < 999999 AND doc_id % 10 < 6),
      cnt AS (SELECT b.doc_id,
          CAST(count(i.doc_id) AS BIGINT) AS n_index_dups
        FROM bat b LEFT JOIN ind i
          ON bit_count(xor(b.ahash, i.ahash)) <= 3
        GROUP BY 1)
      SELECT doc_id, n_index_dups, n_index_dups > 0 AS dup_in_index
      FROM cnt ORDER BY doc_id"""))

  // P11k, audio leg (r15): the SAME stored-index module over the audio
  // envelope fingerprints — one MediaHashIndex works per modality
  // because every near-dup leg reduces to a (doc_id, 64-bit hash)
  // frame. Index = already-ingested clips, batch = today's crawl plus
  // planted re-crawls of INDEXED clips; the probe hashes only the
  // batch. Oracle: full exact batch×index hamming relation over
  // replayed PCM.
  private val multimodalAudiodupIncr = Q(
    "multimodal_audiodup_incr",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val auds = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      val index = auds.filter(pmod(col("doc_id"), lit(10)) < 6)
      val planted = auds.filter(pmod(col("doc_id"), lit(30)) === 1)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val batch = auds.filter(pmod(col("doc_id"), lit(10)) >= 6)
        .unionByName(planted)
      val root = graft.GraftSession.scratchDir(
        "audiohash_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      // ids upstream of the decode (r15 advice) — see the image leg
      graft.pipeline.MediaHashIndex.ensure(
        Multimodal.audioFingerprint(index), root, maxHamming = 3,
        modality = "audio", ids = Some(index.select(col("doc_id"))))
      val cands = graft.pipeline.MediaHashIndex.candidates(
        s, root, Multimodal.audioFingerprint(batch))
      val per = cands.groupBy(col("batch_id").as("doc_id"))
        .agg(count(lit(1)).as("n_index_dups"))
      batch.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_index_dups"), lit(0L)).as("n_index_dups"))
        .withColumn("dup_in_index", col("n_index_dups") > 0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 1),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 64 + seed % 4096 AS ns FROM s
        WHERE doc_id % 3 = 1),
      gen(doc_id, i, st, n) AS (
        SELECT doc_id, 0, CAST(seed AS HUGEINT), ns * 2 FROM m
        UNION ALL
        SELECT doc_id, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT), n
        FROM gen WHERE i < n),
      bytes AS (SELECT doc_id, i - 1 AS idx,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS b
        FROM gen WHERE i > 0),
      smp AS (SELECT lo.doc_id, lo.idx // 2 AS j,
          CASE WHEN lo.b + 256 * hi.b >= 32768
            THEN lo.b + 256 * hi.b - 65536
            ELSE lo.b + 256 * hi.b END AS sv
        FROM bytes lo JOIN bytes hi
          ON hi.doc_id = lo.doc_id AND hi.idx = lo.idx + 1
        WHERE lo.idx % 2 = 0),
      win AS (SELECT smp.doc_id, (smp.j * 64) // m.ns AS w,
          abs(smp.sv) AS a
        FROM smp JOIN m USING (doc_id)),
      ws AS (SELECT doc_id, w, sum(a) AS wsum, count(*) AS wlen
        FROM win GROUP BY 1, 2),
      tot AS (SELECT doc_id, sum(wsum) AS t, sum(wlen) AS n
        FROM ws GROUP BY 1),
      h AS (SELECT ws.doc_id,
          CAST(sum(CASE WHEN ws.wsum * tot.n > tot.t * ws.wlen THEN
              CASE WHEN ws.w = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << ws.w) END
            ELSE 0 END) AS BIGINT) AS ahash
        FROM ws JOIN tot USING (doc_id) GROUP BY 1),
      bat AS (SELECT doc_id, ahash FROM h
        WHERE doc_id >= 999999 OR doc_id % 10 >= 6),
      ind AS (SELECT doc_id, ahash FROM h
        WHERE doc_id < 999999 AND doc_id % 10 < 6),
      cnt AS (SELECT b.doc_id,
          CAST(count(i.doc_id) AS BIGINT) AS n_index_dups
        FROM bat b LEFT JOIN ind i
          ON bit_count(xor(b.ahash, i.ahash)) <= 3
        GROUP BY 1)
      SELECT doc_id, n_index_dups, n_index_dups > 0 AS dup_in_index
      FROM cnt ORDER BY doc_id"""))

  // P11k, video leg (r15): the FRAME-level stored index — a video is
  // its sequence of frame fingerprints, so the index keeps (doc_id,
  // frame_idx, fhash) members and the probe expands value-level chunk
  // candidates ONLY under the equal-position constraint (the
  // videoNearDupPairs contract against a stored corpus). Today's
  // crawled clips + planted re-crawls of INDEXED clips probe the
  // stored index; yesterday's planes are never re-decoded. Oracle:
  // complete exact batch×index same-position hamming relation over
  // replayed frames.
  private val multimodalVideodupIncr = Q(
    "multimodal_videodup_incr",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val vids = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      val index = vids.filter(pmod(col("doc_id"), lit(10)) < 6)
      val planted = vids.filter(pmod(col("doc_id"), lit(30)) === 2)
        .withColumn("doc_id", col("doc_id") + lit(999999L))
      val batch = vids.filter(pmod(col("doc_id"), lit(10)) >= 6)
        .unionByName(planted)
      val root = graft.GraftSession.scratchDir(
        "videohash_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      // ids upstream of the decode (r15 advice) — see the image leg
      graft.pipeline.MediaHashIndex.ensureFrames(
        Multimodal.videoFrameHashes(index, stride = 10), root,
        maxHamming = 3, stride = 10,
        ids = Some(index.select(col("doc_id"))))
      val cands = graft.pipeline.MediaHashIndex.candidatesFrames(
        s, root, Multimodal.videoFrameHashes(batch, stride = 10))
      val per = cands.groupBy(col("batch_id").as("doc_id"))
        .agg(count(lit(1)).as("n_index_dups"))
      batch.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_index_dups"), lit(0L)).as("n_index_dups"))
        .withColumn("dup_in_index", col("n_index_dups") > 0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 999999, text FROM documents
        WHERE doc_id % 30 = 2),
      s AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(text, '.'),
                ch -> CAST(unicode(ch) AS BIGINT))),
            (h, cd) -> (h * 31 + cd) % 4294967296) AS seed
        FROM docs),
      m AS (SELECT doc_id, seed, 1 + (seed // 256) % 120 AS vf FROM s
        WHERE doc_id % 3 = 2),
      fr AS (SELECT doc_id,
          CAST(unnest(range(0, vf, 10)) AS INTEGER) AS fidx,
          seed + unnest(range(0, vf, 10)) AS fseed
        FROM m),
      gen(doc_id, fidx, i, st) AS (
        SELECT doc_id, fidx, 0, CAST(fseed AS HUGEINT) FROM fr
        UNION ALL
        SELECT doc_id, fidx, i + 1,
          (st * CAST(6364136223846793005 AS HUGEINT)
            + CAST(1442695040888963407 AS HUGEINT))
          % CAST(18446744073709551616 AS HUGEINT)
        FROM gen WHERE i < 64),
      yb AS (SELECT doc_id, fidx, i - 1 AS p,
          CAST(st // CAST(72057594037927936 AS HUGEINT) AS BIGINT) AS y
        FROM gen WHERE i > 0),
      tot AS (SELECT doc_id, fidx, sum(y) AS total FROM yb GROUP BY 1, 2),
      fh AS (SELECT yb.doc_id, yb.fidx,
          CAST(sum(CASE WHEN yb.y * 64 > t.total THEN
              CASE WHEN yb.p = 63 THEN -9223372036854775808
                   ELSE (CAST(1 AS BIGINT) << yb.p) END
            ELSE 0 END) AS BIGINT) AS fhash
        FROM yb JOIN tot t ON t.doc_id = yb.doc_id AND t.fidx = yb.fidx
        GROUP BY 1, 2),
      bat AS (SELECT doc_id, fidx, fhash FROM fh
        WHERE doc_id >= 999999 OR doc_id % 10 >= 6),
      ind AS (SELECT doc_id, fidx, fhash FROM fh
        WHERE doc_id < 999999 AND doc_id % 10 < 6),
      prs AS (SELECT b.doc_id AS bid, i.doc_id AS iid
        FROM bat b JOIN ind i ON b.fidx = i.fidx
          AND bit_count(xor(b.fhash, i.fhash)) <= 3
        GROUP BY 1, 2),
      cnt AS (SELECT bid AS doc_id, CAST(count(*) AS BIGINT) AS n
        FROM prs GROUP BY 1),
      bdocs AS (SELECT doc_id FROM m
        WHERE doc_id >= 999999 OR doc_id % 10 >= 6)
      SELECT d.doc_id,
        coalesce(cnt.n, CAST(0 AS BIGINT)) AS n_index_dups,
        coalesce(cnt.n, 0) > 0 AS dup_in_index
      FROM bdocs d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
      ORDER BY d.doc_id"""))

  // P1c: incremental exact dedup — a new batch (doc_id % 10 >= 6, the
  // "today's crawl" slice) deduped against the already-ingested index
  // (doc_id % 10 < 6) without re-touching index rows: index side
  // reduces to distinct digests, batch side partial-aggs per digest.
  private val dedupIncr = Q(
    "dedup_incr",
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.incrementalKept(
          docs.filter(pmod(col("doc_id"), lit(10)) < 6),
          docs.filter(pmod(col("doc_id"), lit(10)) >= 6))
        .orderBy(col("doc_id"))
    },
    Some("""WITH idx AS (
        SELECT DISTINCT sha256(text) AS text_hash
        FROM documents WHERE doc_id % 10 < 6),
      b AS (SELECT doc_id, sha256(text) AS text_hash
        FROM documents WHERE doc_id % 10 >= 6),
      f AS (SELECT text_hash, min(doc_id) AS first_id FROM b GROUP BY 1)
      SELECT b.doc_id, b.text_hash,
        (i.text_hash IS NOT NULL) AS dup_in_index,
        (b.doc_id > f.first_id) AS dup_in_batch,
        (i.text_hash IS NULL AND b.doc_id = f.first_id) AS keep
      FROM b JOIN f USING (text_hash) LEFT JOIN idx i USING (text_hash)
      ORDER BY b.doc_id"""))

  // P1d: line/segment-level corpus dedup (Dedup.dedupLines) — the
  // CCNet/C4 boilerplate-removal pass. The synthetic corpus has no
  // newlines, so the query derives a paragraph structure both engines
  // replay identically (8-word aligned chunks re-joined by \n), then
  // strips chunks occurring >= 3 times across the corpus. Segments
  // join on md5 in BOTH engines, so the decision set and the
  // reassembled clean_text are byte-exact.
  private val dedupLinesQ = Q(
    "dedup_lines",
    (s, d) => {
      val para = Tables.load(s, d, "documents")
        .select(col("doc_id"), expr(
          """array_join(
               transform(sequence(0,
                   cast(ceil(size(split(text, ' ')) / 8.0) as int) - 1, 1),
                 i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' ')),
               '\n')""").as("text"))
      Dedup.dedupLines(para, "doc_id", "text", "\n", minDup = 3)
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      p AS (SELECT doc_id,
          array_to_string(list_transform(
            range(1, CAST(ceil(len(ws) / 8.0) AS BIGINT) + 1),
            i -> array_to_string(ws[(i-1)*8+1 : i*8], ' ')),
            chr(10)) AS text
        FROM w),
      l AS (SELECT doc_id,
          unnest(string_split(text, chr(10))) AS line,
          unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        FROM p),
      k AS (SELECT md5(line) AS h FROM l GROUP BY 1 HAVING count(*) >= 3),
      f AS (SELECT l.doc_id, l.pos, l.line, (k.h IS NOT NULL) AS dup
        FROM l LEFT JOIN k ON md5(l.line) = k.h)
      SELECT doc_id,
        coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10)
          ORDER BY pos), '') AS clean_text,
        CAST(count(*) FILTER (WHERE NOT dup) AS BIGINT) AS n_kept,
        CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dropped
      FROM f GROUP BY 1 ORDER BY doc_id"""))

  // P16d: weighted sampling without replacement (Efraimidis–Spirakis
  // exponential sort, weight = n_chars) — the oracle replays the
  // equal-ratio log-bucket histogram gate so candidate-bucket rows
  // carry their exact global rank and all others carry NULL, exactly
  // the two-phase plan's output contract (the quota_sample idiom).
  private val mixWeighted = Q(
    "mix_weighted",
    (s, d) =>
      Packing.weightedSample(Tables.load(s, d, "documents"), nPerGroup = 10)
        .select(col("doc_id"), col("source"), col("es_key"),
          col("wr_rank"), col("kept"))
        .orderBy(col("doc_id")),
    Some("""WITH k AS (
        SELECT doc_id, source,
          least(round(ln((((CAST(doc_id AS BIGINT) * 2654435761)
                % 4294967296) + 0.5) / 4294967296.0)
            / greatest(CAST(n_chars AS DOUBLE), 1.0), 12), -1e-12) AS es_key
        FROM documents),
      b AS (SELECT doc_id, source, es_key,
        CAST(floor(ln(-es_key) * 8.0) AS BIGINT) AS es_bucket FROM k),
      h AS (SELECT source, es_bucket, count(*) AS bcount
        FROM b GROUP BY 1, 2),
      c AS (SELECT source, es_bucket,
        coalesce(sum(bcount) OVER (PARTITION BY source ORDER BY es_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS cum_before
        FROM h),
      r AS (SELECT b.doc_id, b.source, b.es_key, c.cum_before,
        CAST(row_number() OVER (PARTITION BY b.source
          ORDER BY b.es_key DESC, b.doc_id) AS BIGINT) AS grank
        FROM b JOIN c USING (source, es_bucket))
      SELECT doc_id, source, es_key,
        CASE WHEN cum_before < 10 THEN grank END AS wr_rank,
        coalesce(CASE WHEN cum_before < 10 THEN grank END <= 10, false)
          AS kept
      FROM r ORDER BY doc_id"""))

  // P18f: BM25 retrieval for a fixed query-term bag — Lucene
  // non-negative idf, k1=1.2, b=0.75; idf/ndl/per-term scores round
  // 6dp and the per-doc sum runs as DECIMAL(18,6) in BOTH engines, so
  // the ranking compares identical values. The oracle mirrors the
  // Scala-side float arithmetic literally ((1.2 + 1.0), (1.0 - 0.75))
  // so both engines evaluate the same double expressions.
  private val textBm25 = Q(
    "text_bm25",
    (s, d) =>
      TextAnalysis.bm25TopK(Tables.load(s, d, "documents"),
          Seq("spark", "hash", "window"), k = 20)
        .orderBy(col("bm25").desc, col("doc_id")),
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st)
      SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 20"""))

  // P18l: the PERSISTENT BM25 index — build-once-query-many for the
  // lexical leg (the text twin of ann_ivf_stored). Build-if-absent, so
  // timed bench passes measure the pure query path: bucket-pruned
  // postings scan + broadcast term stats, no tokenization anywhere.
  // FULL oracle: DuckDB recomputes BM25 from the raw corpus — a hash
  // match proves the stored tf/df/dl/N round-trip is value-exact.
  private val textBm25Stored = Q(
    "text_bm25_stored",
    (s, d) => {
      val root = graft.GraftSession.scratchDir(
        "bm25_index_" + d.replaceAll("[^A-Za-z0-9]", "_"))
      if (!new java.io.File(s"$root/stats/_SUCCESS").exists())
        graft.pipeline.TextIndex.buildBm25(Tables.load(s, d, "documents"),
          root)
      graft.pipeline.TextIndex.bm25Query(s, root,
          Seq("spark", "hash", "window"), k = 20)
        .orderBy(col("bm25").desc, col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st)
      SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 20"""))

  // P27: NDCG@10 of the BM25 ranking against a lexical-containment
  // relevance grading (n_terms — how many distinct query terms the doc
  // holds, 1..3) over the top-50 candidate set. Closes the retrieval
  // loop: text_bm25 generates, this one SCORES the ordering. DuckDB
  // replays the BM25 CTEs, both row_number orders, the 2^rel−1 gains,
  // the 12dp log2 discounts, and the decimal sums.
  private val textNdcg = Q(
    "text_ndcg",
    (s, d) => {
      val ranked = TextAnalysis
        .bm25TopK(Tables.load(s, d, "documents"),
          Seq("spark", "hash", "window"), k = 50)
        .withColumn("query_id", lit("q1"))
      graft.operators.Stats
        .ndcgAtK(ranked, "query_id", "doc_id", "bm25", "n_terms", k = 10)
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st),
      top AS (SELECT doc_id, count(*) AS n_terms,
          CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 50),
      r AS (SELECT *,
          row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rs,
          row_number() OVER (ORDER BY n_terms DESC, doc_id) AS ri
        FROM top),
      t AS (SELECT
          CASE WHEN rs <= 10 THEN round((pow(2.0, n_terms) - 1.0)
            / log2(rs + 1.0), 12) ELSE 0.0 END AS dterm,
          CASE WHEN ri <= 10 THEN round((pow(2.0, n_terms) - 1.0)
            / log2(ri + 1.0), 12) ELSE 0.0 END AS iterm
        FROM r),
      a AS (SELECT count(*) AS n_docs,
          round(CAST(sum(CAST(dterm AS DECIMAL(38,12))) AS DOUBLE), 6)
            AS dcg,
          round(CAST(sum(CAST(iterm AS DECIMAL(38,12))) AS DOUBLE), 6)
            AS idcg
        FROM t)
      SELECT 'q1' AS query_id, n_docs, dcg, idcg,
        CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) END AS ndcg
      FROM a"""))

  // P27b (r10): binary-relevance retrieval metrics @k — precision,
  // recall, reciprocal rank over the same BM25 candidate frame the
  // NDCG gate reads, relevance = matched >= 2 of the 3 query terms.
  private val textMrr = Q(
    "text_mrr",
    (s, d) => {
      val ranked = TextAnalysis
        .bm25TopK(Tables.load(s, d, "documents"),
          Seq("spark", "hash", "window"), k = 50)
        .withColumn("query_id", lit("q1"))
        .withColumn("reli", when(col("n_terms") >= 2, 1L).otherwise(0L))
      graft.operators.Stats
        .retrievalEval(ranked, "query_id", "doc_id", "bm25", "reli",
          k = 10)
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st),
      top AS (SELECT doc_id, count(*) AS n_terms,
          CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 50),
      r AS (SELECT *,
          row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rs,
          CASE WHEN n_terms >= 2 THEN 1 ELSE 0 END AS reli
        FROM top),
      a AS (SELECT count(*) AS nd,
          sum(reli) AS nr,
          sum(CASE WHEN reli = 1 AND rs <= 10 THEN 1 ELSE 0 END) AS rk,
          min(CASE WHEN reli = 1 THEN rs END) AS fr
        FROM r)
      SELECT 'q1' AS query_id, CAST(nd AS BIGINT) AS n_docs,
        CAST(nr AS BIGINT) AS n_rel, CAST(rk AS BIGINT) AS rel_at_k,
        round(CAST(rk AS DOUBLE) / 10, 6) AS precision_k,
        CASE WHEN nr > 0 THEN round(CAST(rk AS DOUBLE) / nr, 6) END
          AS recall_k,
        CASE WHEN nr = 0 THEN NULL
          WHEN fr <= 10 THEN round(1.0 / fr, 6)
          ELSE 0.0 END AS rr_k
      FROM a"""))

  // P27c (r10): average precision per query — the PR-curve companion
  // of text_mrr, over a BM25 candidate frame with DIFFERENT query
  // terms (merge/sort/filter) so the two keys aren't param twins.
  // Precision terms round 12dp into a DECIMAL(38,12) order-free sum.
  private val textMap = Q(
    "text_map",
    (s, d) => {
      val ranked = TextAnalysis
        .bm25TopK(Tables.load(s, d, "documents"),
          Seq("merge", "sort", "filter"), k = 50)
        .withColumn("query_id", lit("q1"))
        .withColumn("reli", when(col("n_terms") >= 2, 1L).otherwise(0L))
      graft.operators.Stats
        .averagePrecision(ranked, "query_id", "doc_id", "bm25", "reli")
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tnz GROUP BY 1),
      st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tnz
        WHERE token IN ('merge', 'sort', 'filter') GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, dl,
          round(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * round(dl / avgdl, 6))),
            6) AS tscore
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
          CROSS JOIN st),
      top AS (SELECT doc_id, count(*) AS n_terms,
          CAST(sum(CAST(tscore AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 50),
      r AS (SELECT doc_id,
          row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rs,
          CASE WHEN n_terms >= 2 THEN 1 ELSE 0 END AS reli
        FROM top),
      c AS (SELECT rs, reli,
          sum(reli) OVER (ORDER BY rs
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
        FROM r),
      a AS (SELECT count(*) AS nd, sum(reli) AS nr,
          coalesce(sum(CASE WHEN reli = 1 THEN
            CAST(round(CAST(cr AS DOUBLE) / rs, 12) AS DECIMAL(38,12))
            END), 0) AS s
        FROM c)
      SELECT 'q1' AS query_id, CAST(nd AS BIGINT) AS n_docs,
        CAST(nr AS BIGINT) AS n_rel,
        CASE WHEN nr > 0 THEN round(CAST(s AS DOUBLE) / nr, 6) END AS ap
      FROM a"""))

  // P28: DSIR importance reweighting — hashed unigram+bigram bag
  // models of a target slice vs the raw corpus; log-ratio weights.
  // The oracle replays the identical mod-2^32 char polynomial, the
  // bucket hashing, both smoothed distributions, and the 6dp/4dp
  // rounding ladder — a hash match proves the whole feature pipeline.
  private val textDsir = Q(
    "text_dsir",
    (s, d) =>
      TextAnalysis.withImportanceWeights(
          Tables.load(s, d, "documents")
            .withColumn("is_tgt", col("source").isin("src0", "src1")),
          "is_tgt")
        .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, source IN ('src0', 'src1') AS in_target,
          string_split_regex(trim(lower(text)), '\s+') AS ts
        FROM documents),
      uf AS (SELECT doc_id, in_target,
          unnest(list_transform(ts, tk ->
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(tk, '.'),
                  ch -> CAST(unicode(ch) AS BIGINT))),
              (h, cd) -> (h * 31 + cd) % 4294967296) % 4096)) AS b
        FROM t),
      bf AS (SELECT doc_id, in_target,
          unnest(list_transform(
            [ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))], bg ->
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(regexp_extract_all(bg, '.'),
                  ch -> CAST(unicode(ch) AS BIGINT))),
              (h, cd) -> (h * 31 + cd) % 4294967296) % 4096)) AS b
        FROM t WHERE len(ts) >= 2),
      f AS (SELECT * FROM uf UNION ALL SELECT * FROM bf),
      rc AS (SELECT b, count(*) AS rc FROM f GROUP BY 1),
      tc AS (SELECT b, count(*) AS tc FROM f WHERE in_target GROUP BY 1),
      tot AS (SELECT count(*) AS rn,
          count(*) FILTER (in_target) AS tn FROM f),
      lp AS (SELECT b,
          round(ln((coalesce(tc, 0) + 1.0) / (tn + 4096.0))
            - ln((rc + 1.0) / (rn + 4096.0)), 6) AS lp
        FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot),
      sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
          CAST(round(sum(CAST(lp AS DECIMAL(18,6))), 4) AS DOUBLE)
            AS log_weight
        FROM f JOIN lp USING (b) GROUP BY 1)
      SELECT d.doc_id, d.source IN ('src0', 'src1') AS in_target,
        coalesce(s.n_feats, CAST(0 AS BIGINT)) AS n_feats, s.log_weight
      FROM documents d LEFT JOIN sc s USING (doc_id)
      ORDER BY d.doc_id"""))

  // P29: top principal component by power iteration — the oracle is
  // GENERATED (the k-core unrolled-oracle precedent): one CTE pair per
  // iteration replaying the exact DECIMAL matrix-vector products and
  // the ordered-list_reduce IEEE norms the driver loop performs.
  private def pcaOracle(iters: Int): String = {
    val head = """WITH exx AS MATERIALIZED (
        SELECT vec_id, CAST(unnest(range(len(embedding))) AS INT) AS i,
          CAST(round(CAST(unnest(embedding) AS DOUBLE), 6)
            AS DECIMAL(18,6)) AS x6
        FROM embeddings),
      mu AS MATERIALIZED (SELECT i,
          CAST(round(CAST(sum(x6) AS DOUBLE) / CAST(count(*) AS DOUBLE),
            6) AS DECIMAL(18,6)) AS mu6
        FROM exx GROUP BY 1),
      cent AS MATERIALIZED (SELECT vec_id, exx.i, x6 - mu6 AS c
        FROM exx JOIN mu ON exx.i = mu.i),
      gram AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
          CAST(CAST(sum(a.c * b.c) AS DECIMAL(38,12))
            AS DECIMAL(28,12)) AS gd
        FROM cent a JOIN cent b ON a.vec_id = b.vec_id
        GROUP BY 1, 2),
      dd AS (SELECT count(*) AS d FROM mu),
      v0 AS MATERIALIZED (SELECT i, CAST(round(1.0 / sqrt(CAST(d AS DOUBLE)), 8)
          AS DECIMAL(10,8)) AS vd FROM mu CROSS JOIN dd)"""
    val rounds = (1 to iters).map { r =>
      s"""
      w$r AS MATERIALIZED (SELECT g.i AS i, sum(g.gd * v${r - 1}.vd) AS w
        FROM gram g JOIN v${r - 1} ON g.j = v${r - 1}.i GROUP BY 1),
      n$r AS (SELECT sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(CAST(w AS DOUBLE) ORDER BY i),
            x -> x * x)), (a, b) -> a + b)) AS nrm FROM w$r),
      v$r AS MATERIALIZED (SELECT i, CAST(round(CAST(w AS DOUBLE) / nrm, 8)
          AS DECIMAL(10,8)) AS vd FROM w$r CROSS JOIN n$r)"""
    }.mkString(",")
    val tail = s""",
      wf AS (SELECT g.i AS i, CAST(sum(g.gd * v$iters.vd) AS DOUBLE)
          AS w
        FROM gram g JOIN v$iters ON g.j = v$iters.i GROUP BY 1),
      pr AS (SELECT v$iters.i AS i,
          CAST(v$iters.vd AS DOUBLE) * wf.w AS p
        FROM v$iters JOIN wf ON v$iters.i = wf.i),
      lam AS (SELECT round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(p ORDER BY i), x -> x)),
          (a, b) -> a + b), 6) AS ev FROM pr),
      tr AS (SELECT CAST(sum(gd) FILTER (i = j) AS DOUBLE) AS trace
        FROM gram)
      SELECT v$iters.i AS i, CAST(v$iters.vd AS DOUBLE) AS loading,
        lam.ev AS eigenvalue,
        CASE WHEN trace > 0 THEN round(lam.ev / trace, 6) END
          AS explained_ratio
      FROM v$iters CROSS JOIN lam CROSS JOIN tr ORDER BY i"""
    head + "," + rounds + tail
  }

  // P29b: the APPLY half — same generated core through v10, then the
  // per-vector exact-decimal projection instead of the model readout.
  private def pcaProjectOracle(iters: Int): String = {
    val core = pcaOracle(iters)
    val cut = core.lastIndexOf("      SELECT v")
    core.substring(0, cut) + s""",
      proj AS (SELECT cent.vec_id,
          CAST(sum(CAST(CAST(cent.c AS DECIMAL(24,6)) * v$iters.vd
            AS DECIMAL(38,14))) AS DECIMAL(38,14)) AS p,
          CAST(sum(CAST(CAST(cent.c AS DECIMAL(20,6)) * cent.c
            AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS n2
        FROM cent JOIN v$iters ON cent.i = v$iters.i GROUP BY 1)
      SELECT vec_id, round(CAST(p AS DOUBLE), 6) AS coord,
        greatest(0.0, round(CAST(n2 AS DOUBLE)
          - round(CAST(p AS DOUBLE), 6) * round(CAST(p AS DOUBLE), 6),
          6)) AS residual2
      FROM proj ORDER BY vec_id"""
  }

  private val embedPca = Q(
    "embed_pca",
    (s, d) =>
      Similarity.pcaTopComponent(Tables.load(s, d, "embeddings"))
        .orderBy(col("i")),
    Some(pcaOracle(10)))

  // P29c: top-2 components by deflation — the same generated core,
  // once per component, with an exact-decimal rank-1 subtraction
  // (λ·v_i·v_j at scale 22, re-rounded HALF_UP to the 12dp Gram grid)
  // between them.
  private def pcaMultiOracle(nComp: Int, iters: Int): String = {
    val core = pcaOracle(iters)
    // keep only the shared model CTEs (exx..dd, v0): every component
    // generates its own suffixed rounds over gram / the deflated
    // gram_c, so the single-component rounds must NOT ride along
    val cut = core.indexOf("w1 AS MATERIALIZED")
    val base = core.substring(0, core.lastIndexOf(",", cut))
    def rounds(c: Int): String = {
      val g = if (c == 1) "gram" else s"gram_$c"
      val v0 = s"""
      v${c}_0 AS (SELECT i, CAST(round(1.0 / sqrt(CAST(d AS DOUBLE)), 8)
          AS DECIMAL(10,8)) AS vd FROM mu CROSS JOIN dd)"""
      val rs = (1 to iters).map { r =>
        s"""
      w${c}_$r AS MATERIALIZED (SELECT g.i AS i,
          sum(g.gd * v${c}_${r - 1}.vd) AS w
        FROM $g g JOIN v${c}_${r - 1} ON g.j = v${c}_${r - 1}.i
        GROUP BY 1),
      n${c}_$r AS (SELECT sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(CAST(w AS DOUBLE) ORDER BY i),
            x -> x * x)), (a, b) -> a + b)) AS nrm FROM w${c}_$r),
      v${c}_$r AS MATERIALIZED (SELECT i,
          CAST(round(CAST(w AS DOUBLE) / nrm, 8) AS DECIMAL(10,8)) AS vd
        FROM w${c}_$r CROSS JOIN n${c}_$r)"""
      }.mkString(",")
      val lam = s""",
      wf_$c AS (SELECT g.i AS i, CAST(sum(g.gd * v${c}_$iters.vd)
          AS DOUBLE) AS w
        FROM $g g JOIN v${c}_$iters ON g.j = v${c}_$iters.i GROUP BY 1),
      pr_$c AS (SELECT v${c}_$iters.i AS i,
          CAST(v${c}_$iters.vd AS DOUBLE) * wf_$c.w AS p
        FROM v${c}_$iters JOIN wf_$c ON v${c}_$iters.i = wf_$c.i),
      lam_$c AS (SELECT round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(p ORDER BY i), x -> x)),
          (a, b) -> a + b), 6) AS ev FROM pr_$c)"""
      val defl = if (c < nComp) s""",
      gram_${c + 1} AS MATERIALIZED (SELECT g.i, g.j,
          CAST(round(g.gd - CAST(l.ev AS DECIMAL(18,6)) * va.vd * vb.vd,
            12) AS DECIMAL(28,12)) AS gd
        FROM $g g JOIN v${c}_$iters va ON g.i = va.i
          JOIN v${c}_$iters vb ON g.j = vb.i
        CROSS JOIN lam_$c l)""" else ""
      v0 + "," + rs + lam + defl
    }
    val legs = (1 to nComp).map { c =>
      s"""SELECT $c AS component, v${c}_$iters.i AS i,
        CAST(v${c}_$iters.vd AS DOUBLE) AS loading,
        lam_$c.ev AS eigenvalue,
        CASE WHEN trace > 0 THEN round(lam_$c.ev / trace, 6) END
          AS explained_ratio
      FROM v${c}_$iters CROSS JOIN lam_$c CROSS JOIN tr0"""
    }.mkString("\n      UNION ALL\n      ")
    base + "," + (1 to nComp).map(rounds).mkString(",") + s""",
      tr0 AS (SELECT CAST(sum(gd) FILTER (i = j) AS DOUBLE) AS trace
        FROM gram)
      """ + legs + "\n      ORDER BY component, i"
  }

  private val embedPca2 = Q(
    "embed_pca2",
    (s, d) =>
      Similarity.pcaComponents(Tables.load(s, d, "embeddings"),
          nComponents = 2)
        .orderBy(col("component"), col("i")),
    Some(pcaMultiOracle(2, 10)))

  private val embedProject = Q(
    "embed_project",
    (s, d) =>
      Similarity.projectOntoTopComponent(Tables.load(s, d, "embeddings"))
        .orderBy(col("vec_id")),
    Some(pcaProjectOracle(10)))

  val all: Seq[Q] = Seq(
    dedupExact, dedupBag, dedupIncr, dedupLinesQ, mixWeighted, textBm25, textBm25Stored, textNdcg, textMrr, textMap,
    dedupMinhash, dedupSimhash, dedupNgram, dedupAllpairs,
    dedupAllpairsKeep, dedupAutoKeep, dedupBestKeep, dedupBestKeepSql,
    dedupKeepSql, driftSql,
    dedupKeep, dedupMinhashIncr,
    dedupMinhashKeep, dedupSimhashKeep, dedupCosine, dedupCosineLsh,
    semDedup, semDecontamQ,
    annTopk, annHardNeg, annLsh, annIvf, annPq, annIvfPq, annRecall,
    annIvfStored, annIvfPqStored, annIvfIncr, erMatch,
    packSequences,
    splitTrain, splitStrat,
    textDecontam, textDupfrac, textScrub, textMaxdup, mixSample,
    mixUpsample, mixTemperature, selectBudget,
    quotaSampleQ, corpusShuffle,
    packWindows, packBatches, packBins,
    textVocab, textEncode, textTfidf, textXent, textRefXent, textDsir,
    qualityBuckets,
    textLangid, textQuality, textGopher, textClassify, sketchRollup,
    heavyHitters, cmsCounts, kllQuantiles, textDrift, textDriftLang, textPsi,
    textRrf,
    textTokens, textBpe, textBpeTrain, textBpeTrain1k, textBpeEncode,
    augDropout,
    textPii, textRepetition, textFingerprint, textWinnow, winnowPairsQ,
    textOutliers, corpusStatsQ,
    embedPca, embedProject, embedPca2,
    multimodalMeta, multimodalFrames, multimodalResize, multimodalAudio,
    multimodalPng, multimodalJpeg, shardsRoundtrip, shardsPhashKeep,
    multimodalAudiodup, multimodalAudiodupKeep,
    multimodalVideodup, multimodalVideodupKeep,
    multimodalPhash, multimodalPhashIncr, multimodalAudiodupIncr,
    multimodalVideodupIncr)
}
