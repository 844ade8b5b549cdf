package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2 P7–P10). All pure built-in expressions — no UDFs —
  * so every operator stays inside whole-stage codegen and scales
  * linearly with no shuffle (narrow, per-row transforms).
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. The canonical tokenization shared by
    * every text operator (and mirrored in the DuckDB oracles). */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish token count: words | digit runs | punctuation runs. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Deterministic token-dropout augmentation (SURVEY.md §2 P24) — the
    * text-augmentation step of a training pipeline ("each epoch sees a
    * slightly different rendition"), made REPRODUCIBLE: the per-token
    * drop decision is pure Knuth arithmetic on (doc_id, position) —
    * multiplier 2738186381, ⟂ every other multiplier in the repo
    * (split 2654435761, mixture 2246822519, quota/upsample/temperature
    * 668265263/3266489917/2971215073) — so the augmented corpus is
    * bit-identical across engines, re-runs, and shards, and a second
    * epoch just changes `epoch` for an independent rendition. Returns
    * every row with (n_tokens, n_kept, aug_text).
    *
    * Overflow discipline (§6): the (doc, pos, epoch) key folds mod 2^31
    * BEFORE the multiplier, so the product stays < 2^62.4 — ANSI-safe.
    * Narrow per-row HOF arithmetic (indexed `filter` lambda), zero
    * shuffles. */
  def withTokenDropout(docs: DataFrame, dropBp: Int = 1000,
      epoch: Int = 0, textCol: String = "text"): DataFrame = {
    require(dropBp >= 0 && dropBp <= 10000, "dropBp in [0, 10000]")
    require(epoch >= 0 && epoch < 1024, "epoch in [0, 1024)")
    val toks = tokens(col(textCol))
    val keep = filter(toks, (_, i) =>
      pmod(pmod(col("doc_id") * 1048576L + i * 1024L + epoch,
          lit(2147483648L)) * lit(2738186381L),
        lit(4294967296L)) % 10000 >= dropBp)
    docs.select(col("doc_id"),
      size(toks).as("n_tokens"),
      size(keep).as("n_kept"),
      array_join(keep, " ").as("aug_text"))
  }

  // Small per-language stopword profiles for the n-gram/stopword langid
  // heuristic. Deterministic and oracle-mirrorable.
  val stopEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with", "that", "it", "as", "at", "by")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "von", "mit", "auf", "im")
  val stopEs = Seq("el", "la", "los", "las", "y", "es", "no", "un", "una", "en", "que", "por", "con", "para")
  val stopFr = Seq("le", "les", "et", "est", "ne", "un", "une", "dans", "que", "pour", "avec", "sur", "pas", "au")

  private def stopHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(stops.toArray), t)))

  /** Language ID: CJK char ratio gate, then stopword-profile argmax with
    * a fixed priority order (en > de > es > fr) on ties. */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val txt = col(textCol)
    val toks = tokens(txt)
    val cjk = length(txt) - length(regexp_replace(txt, "[\\u4e00-\\u9fff]", ""))
    docs
      .withColumn("_s_en", stopHits(toks, stopEn))
      .withColumn("_s_de", stopHits(toks, stopDe))
      .withColumn("_s_es", stopHits(toks, stopEs))
      .withColumn("_s_fr", stopHits(toks, stopFr))
      .withColumn("pred_lang",
        when(cjk * 20 > length(txt), "zh")
          .when(col("_s_en") >= col("_s_de") && col("_s_en") >= col("_s_es") && col("_s_en") >= col("_s_fr"), "en")
          .when(col("_s_de") >= col("_s_es") && col("_s_de") >= col("_s_fr"), "de")
          .when(col("_s_es") >= col("_s_fr"), "es")
          .otherwise("fr"))
      .drop("_s_en", "_s_de", "_s_es", "_s_fr")
  }

  /** Gopher-style RULE filter (SURVEY.md §2 P8e): where [[withQuality]]
    * emits a continuous score, this applies the published hard
    * heuristics — word-count bounds, mean-word-length bounds, minimum
    * fraction of words containing an alphabetic character, minimum
    * number of DISTINCT stopwords present — each as its own column plus
    * the conjunctive `gopher_keep`, so a curation run can report which
    * rule rejected a document. All signals are arithmetic over the
    * shared [[tokens]] list (ratios rounded 6dp, the keep decision made
    * on the ROUNDED values) so any engine reproduces the exact booleans.
    * Narrow per-row transform, zero shuffles. */
  def withGopherRules(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopDistinct: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val meanLen =
      round(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
        / n, 6)
    val alphaFrac =
      round(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n, 6)
    // distinct-stopword count iterates the (tiny) STOP list, probing the
    // token array — 16 array_contains probes, not a distinct over tokens
    val stopsPresent =
      size(filter(lit(stopEn.toArray), s => array_contains(toks, s)))
    docs
      .withColumn("n_words", n.cast("long"))
      .withColumn("mean_word_len", meanLen)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("n_stop_distinct", stopsPresent.cast("long"))
      .withColumn("gopher_keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stop_distinct") >= minStopDistinct)
  }

  /** Quality scoring: length / punctuation / stopword / word-length
    * signals, combined into a [0,1] score. All ratios rounded at 6dp for
    * cross-engine determinism. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val txt = col(textCol)
    val toks = tokens(txt)
    val nChars = length(txt)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(txt, "[.,!?;:]", ""))
    val stops = stopHits(toks, stopEn)
    val meanTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks
    docs
      .withColumn("n_chars_", nChars.cast("long"))
      .withColumn("n_tokens", nToks.cast("long"))
      .withColumn("punct_ratio", round(punct.cast("double") / nChars, 6))
      .withColumn("stop_ratio", round(stops.cast("double") / nToks, 6))
      .withColumn("mean_tok_len", round(meanTokLen, 6))
      .withColumn("quality_score", round(
        least(lit(1.0), nToks.cast("double") / 100) * 0.5
          + least(lit(1.0), stops.cast("double") / nToks * 5) * 0.3
          + when(meanTokLen.between(3, 10), 0.2).otherwise(0.0), 6))
  }

  /** Per-group robust length-outlier flag (SURVEY.md §2 P8d): flag
    * documents whose token count sits further than `z` robust z-units
    * (0.6745·|n−median|/MAD) from their group's median — the standard
    * "drop truncated/concatenated junk per source" curation filter,
    * with median/MAD instead of mean/stddev so the outliers being
    * hunted can't drag the yardstick. Returns (doc_id, group, n_tokens,
    * med, mad, flagged). Median and MAD use the LOWER-median rule
    * (value at rank ceil(total/2)) — pure integer rank arithmetic any
    * engine reproduces, no two-middle averaging.
    *
    * Scale: the group key is low-cardinality (source-like), exactly the
    * shape where a per-group sort/percentile serializes a corpus-sized
    * partition into one task. But token counts live in a SMALL DOMAIN,
    * so both medians come from histograms instead: a (group, n) count
    * table (≤ groups × |length domain| rows), a cumulative window over
    * that tiny frame, and a broadcast join back — the quota_sample /
    * selectByBudget idiom for exact order statistics without a
    * corpus-sized sort. The corpus itself is touched by two narrow
    * passes (count tokens; final flag join). */
  def withLengthOutliers(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", z: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col("doc_id"), col(groupCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val hist = lens.groupBy(col(groupCol), col("n_tokens"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col(groupCol)).agg(sum(col("c")).as("tc"))
    def lowerMedian(h: DataFrame, valueCol: String): DataFrame = {
      val wc = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      h.withColumn("cc", sum(col("c")).over(wc))
        .join(broadcast(tot), Seq(groupCol))
        .filter(col("cc") >= expr("(tc + 1) div 2")) // ceil(tc/2), integer
        .groupBy(col(groupCol))
        .agg(min(col(valueCol)).as(s"med_$valueCol"))
    }
    val med = lowerMedian(hist, "n_tokens")
      .withColumnRenamed("med_n_tokens", "med")
    val devHist = hist.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol), abs(col("n_tokens") - col("med")).as("dev"))
      .agg(sum(col("c")).as("c"))
    val mad = lowerMedian(devHist, "dev").withColumnRenamed("med_dev", "mad")
    lens
      .join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("n_tokens"), col("med"),
        col("mad"),
        (col("mad") > 0 &&
          abs(lit(0.6745) * (col("n_tokens") - col("med")) / col("mad"))
            > z).as("flagged"))
  }

  /** Per-group corpus data card (SURVEY.md §2 P21): the summary table a
    * curation run publishes per source — doc/token volumes, exact
    * token-count percentiles, exact-dup counts, language diversity and
    * a quality mass. One row per group: (group, n_docs, n_tokens,
    * tok_p10, tok_p50, tok_p90, n_exact_dup, n_langs, quality_sum).
    *
    * Determinism & scale, per idiom already proven elsewhere:
    *  - percentiles are EXACT from the (group, n_tokens) histogram via
    *    the rank rule `min v with cum ≥ ceil(q·total)` (integer
    *    arithmetic; the [[withLengthOutliers]] trick) — no per-group
    *    sort, all three quantiles from ONE cumulative;
    *  - quality_sum sums per-doc scores as DECIMAL (order-free exact,
    *    SURVEY §4 rule 6) then rounds once — a double sum would hash-
    *    differ with partition order;
    *  - n_exact_dup = Σ(copies−1) over sha256 groups, one partial-agg'd
    *    shuffle on (group, hash). */
  def corpusStats(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = withQuality(docs, textCol)
    val base = scored.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      count_distinct(col("lang")).as("n_langs"),
      round(sum(col("quality_score").cast("decimal(28,6)")).cast("double"),
        6).as("quality_sum"))
    val hist = scored.groupBy(col(groupCol), col("n_tokens"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col(groupCol)).agg(sum(col("c")).as("tc"))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("n_tokens"))
    val pct = hist.withColumn("cc", sum(col("c")).over(wc))
      .join(broadcast(tot), Seq(groupCol))
      .groupBy(col(groupCol)).agg(
        min(when(col("cc") >= expr("(tc + 9) div 10"), col("n_tokens")))
          .as("tok_p10"),
        min(when(col("cc") >= expr("(tc + 1) div 2"), col("n_tokens")))
          .as("tok_p50"),
        min(when(col("cc") >= expr("(9 * tc + 9) div 10"), col("n_tokens")))
          .as("tok_p90"))
    val dup = docs
      .select(col(groupCol), sha2(col(textCol), 256).as("h"))
      .groupBy(col(groupCol), col("h")).agg(count(lit(1)).as("copies"))
      .groupBy(col(groupCol))
      .agg(sum(col("copies") - 1).as("n_exact_dup"))
    base
      .join(pct, Seq(groupCol))
      .join(dup, Seq(groupCol))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("tok_p10"), col("tok_p50"), col("tok_p90"),
        col("n_exact_dup"), col("n_langs"), col("quality_sum"))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation. */
  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("ws_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("bpeish_tokens",
        size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0))).cast("long"))

  // PII patterns shared by Spark and the DuckDB oracle — kept to the
  // regex subset (POSIX classes, \b) that Java regex and RE2 interpret
  // identically.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\+?[0-9][0-9()\\- ]{5,}[0-9]"

  /** PII redaction: count and mask emails, IPv4s, phone-like digit runs.
    * Counts are over the original text; masking is sequential
    * (email → ip → phone) so the oracle can mirror it exactly. Narrow
    * per-row codegen'd transform — the standard pre-training scrub pass. */
  def withPiiRedaction(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val txt = col(textCol)
    docs
      .withColumn("n_emails",
        size(regexp_extract_all(txt, lit(emailPattern), lit(0))).cast("long"))
      .withColumn("n_ipv4",
        size(regexp_extract_all(txt, lit(ipv4Pattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(txt, lit(phonePattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(txt, emailPattern, "<EMAIL>"),
            ipv4Pattern, "<IP>"),
          phonePattern, "<PHONE>"))
  }

  /** Repetition signals (Gopher/RefinedWeb-style filters): fraction of
    * duplicate whitespace tokens, and the share of the most frequent
    * token bigram. Bigram stats go through explode + two-level groupBy —
    * map-side partial aggregation, no per-doc quadratic HOF. */
  def withRepetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    val uni = base.select(col("doc_id"),
      round(lit(1.0) -
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
        .as("dup_token_ratio"))
    val bigrams = base.select(col("doc_id"),
      explode(expr(
        "slice(zip_with(toks, slice(toks, 2, size(toks)), (x, y) -> concat(x, ' ', y)), 1, size(toks) - 1)"))
        .as("bg"))
    val top = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("n")).cast("double") / sum(col("n")), 6)
        .as("top_bigram_ratio"))
    uni.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_token_ratio"),
        coalesce(col("top_bigram_ratio"), lit(0.0)).as("top_bigram_ratio"))
  }

  /** Document fingerprint: order-sensitive rolling polynomial hash over
    * tokens (Karp–Rabin style), plus a winnowing-style min-hash over
    * 5-token windows. The hash is FULLY SPECIFIED arithmetic, not an
    * engine hash function: token/window hash folds code points as
    * `(h·31 + code) mod 2^32`, the doc fingerprint folds token hashes
    * as `(H·1000003 + th) mod 2^32` — so ANY engine (the DuckDB oracle
    * included) reproduces identical fingerprints, which is the point of
    * shard-stable doc identity across systems at 100 TB. mod-2^32 keeps
    * every intermediate < 2^52: overflow-free in ANSI long arithmetic. */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // (h·31 + codepoint) mod 2^32 over the chars of string expression `s`
    def charPoly(s: String) =
      s"""aggregate(transform(split($s, ''), ch -> cast(ascii(ch) as bigint)),
            0L, (h, cd) -> (h * 31 + cd) % 4294967296)"""
    val toksSql = s"split(trim(lower($textCol)), '\\\\s+')"
    docs
      .withColumn("fingerprint", expr(
        s"""aggregate(transform($toksSql, tk -> ${charPoly("tk")}),
            0L, (fp, th) -> (fp * 1000003 + th) % 4294967296)"""))
      .withColumn("win_min_hash", expr(
        s"""aggregate(
          transform(sequence(0, greatest(size($toksSql) - 5, 0)),
            i -> ${charPoly(s"concat_ws(' ', slice($toksSql, i + 1, 5))")}),
          9223372036854775807L, (m, wh) -> least(m, wh))"""))
  }

  // ------------------------------------------------------- vocabulary
  /** Corpus vocabulary: the `vocabSize` most frequent whitespace tokens,
    * ranked (count DESC, token ASC) — the deterministic id assignment a
    * tokenizer-training step needs (SURVEY.md §2 P18). Returns
    * (token_id, token, n_occurrences) with ids 0..V−1 in rank order.
    *
    * Scale: one explode + partial-agg'd count groupBy (one shuffle on
    * the token key), a TakeOrderedAndProject top-V, and a rank window
    * over V rows only — vocabulary size is a config constant (≤ a few
    * 100k), never corpus-bounded, so the single-partition window is
    * bounded by construction. */
  def vocabulary(docs: DataFrame, vocabSize: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(vocabSize)
      .withColumn("token_id",
        (row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("token")))
          - 1).cast("long"))
      .select(col("token_id"), col("token"), col("n_occurrences"))
  }

  /** Token-id encoding of every document over a [[vocabulary]] — the
    * text→ids step of a training pipeline. OOV tokens encode as −1.
    * Returns (doc_id, n_tokens, n_oov, ids) with `ids` the comma-joined
    * id sequence in document order (string output per the §6 comparator
    * convention: no array columns cross the oracle boundary).
    *
    * Scale: the corpus explodes once and left-joins the BROADCAST vocab
    * (V rows by construction); reassembly is one partial-agg'd groupBy
    * with a per-doc array_sort — no window, no global sort, one
    * shuffle on doc_id. */
  def encodeTokens(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_oov"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("token_id"), lit(-1L)).as("tid")))),
          p => p.getField("tid").cast("string"))).as("ids"))

  /** Per-document TF-IDF keyword extraction over a [[vocabulary]]
    * (SURVEY.md §2 P18c): tf = in-doc count, idf = ln((N+1)/(df+1))+1
    * (the smoothed form), top `k` tokens per doc by (tfidf DESC,
    * token). Returns (doc_id, token, tf, df, tfidf, tfidf_rank).
    *
    * Cross-engine determinism: the idf rounds at 6dp before the
    * product and tfidf at 3dp before ranking (§6 round-early
    * discipline — the transcendental ln agrees across libms far inside
    * 6dp, and tf ≤ doc length keeps the product's error under the 3dp
    * half-grain), so rank order is computed over identical values in
    * any engine; ties break by token.
    *
    * Scale: the corpus explodes once, pre-filtered by the BROADCAST
    * vocab (out-of-vocab tokens never shuffle); tf is one partial-
    * agg'd shuffle on (doc_id, token); df derives from the tf table
    * (≤V rows out) and broadcasts back; N rides as a broadcast 1-row
    * frame, never a driver-side action. The top-k window partitions by
    * doc_id — per-doc groups are ≤V rows on a high-cardinality key. */
  def tfidfTopK(docs: DataFrame, vocab: DataFrame, k: Int = 3,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"))), Seq("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfT), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", round(
        log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0),
        6))
      .withColumn("tfidf", round(col("tf") * col("idf"), 3))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("tfidf_rank", row_number().over(w).cast("long"))
      .filter(col("tfidf_rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf"), col("tfidf_rank"))
  }

  // ------------------------------------------- bigram LM perplexity proxy
  /** Corpus-internal bigram cross-entropy per document (the CCNet-style
    * perplexity quality signal computed WITHOUT an external model;
    * SURVEY.md §2 P19): xent = −mean over the doc's bigrams of
    * ln P(w2|w1), add-one smoothed from corpus-wide counts:
    * P = (c(w1 w2) + 1) / (c(w1) + V), V = |distinct unigrams|.
    * Returns (doc_id, n_bigrams, xent); docs with <2 tokens carry
    * n_bigrams=0 and a null xent.
    *
    * Cross-engine determinism: each ln is rounded at 6dp before the
    * mean (transcendental libm results agree across engines far inside
    * that grain), the mean at 4dp — the §6 round-early discipline.
    *
    * Scale: unigram and bigram count tables are one partial-agg'd
    * shuffle each; scoring joins the bigram table on the pair key and
    * the (vocab-sized, broadcast-able) unigram table on w1; V rides
    * along as a broadcast 1-row frame, never a driver-side action. The
    * exploded bigram table feeds two consumers (its own counts + the
    * scoring join), so it is persisted and released after an eager
    * checkpoint of the (narrow, per-doc) result. */
  def withBigramXent(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col(textCol)).as("ts"))
    val sz = size(col("ts"))
    val bigrams = t
      .filter(sz >= 2)
      .select(col("doc_id"), explode(slice(
        zip_with(col("ts"), slice(col("ts"), lit(2), sz),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("b"))),
        lit(1), sz - 1)).as("s"))
      .select(col("doc_id"), col("s.w1").as("w1"), col("s.b").as("b"))
      .persist()
    val uc = t.select(explode(col("ts")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vv = uc.agg(count(lit(1)).as("v"))
    val bc = bigrams.groupBy("b").agg(count(lit(1)).as("c12"))
    val scored = bigrams
      .join(bc, Seq("b"))
      .join(uc, Seq("w1"))
      .crossJoin(broadcast(vv))
      .select(col("doc_id"),
        round(log((col("c12") + lit(1.0)) / (col("c1") + col("v"))), 6)
          .as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(-avg(col("lp")), 4).as("xent"))
    val out = docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("xent"))
      .localCheckpoint()
    bigrams.unpersist()
    out
  }

  /** Reference-LM perplexity scoring (SURVEY.md §2 P25; the CCNet
    * discriminator shape) — [[withBigramXent]] scores every doc
    * against the WHOLE corpus's own statistics; this one trains the
    * add-one-smoothed bigram LM on a REFERENCE slice only (the Knuth
    * train-split arithmetic of [[Packing.withSplit]], multiplier
    * shared DELIBERATELY: the reference slice IS the train split) and
    * scores EVERY doc against it — "how much does this doc look like
    * the curated data" is the CCNet head/middle/tail quality signal.
    * Unseen words/bigrams fall to the smoothing floor via left joins
    * (ln(1/V) resp. ln((0+1)/(c1+V))) instead of dropping rows — an
    * out-of-domain doc must score WORSE, not shorter. Same rounding
    * discipline as [[withBigramXent]] (lp 6dp before the 4dp mean).
    *
    * Scale: reference counts are token-vocab-scale aggregates; the
    * corpus explodes once; scoring is two hash LEFT joins on token
    * keys + one broadcast 1-row V frame — no window, no corpus
    * self-join. */
  def withReferenceXent(docs: DataFrame, refPct: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(refPct > 0 && refPct <= 100, "refPct in (0, 100]")
    val bucket = pmod(col("doc_id").cast("long") * lit(2654435761L),
      lit(4294967296L)) % 100
    val t = docs.select(col("doc_id"), bucket.as("bk"),
      tokens(col(textCol)).as("ts"))
    val sz = size(col("ts"))
    val bigrams = t.filter(sz >= 2)
      .select(col("doc_id"), col("bk"), explode(slice(
        zip_with(col("ts"), slice(col("ts"), lit(2), sz),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("b"))),
        lit(1), sz - 1)).as("s"))
      .select(col("doc_id"), col("bk"), col("s.w1").as("w1"),
        col("s.b").as("b"))
      .persist()
    val refUni = t.filter(col("bk") < refPct)
      .select(explode(col("ts")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vv = refUni.agg(count(lit(1)).as("v"))
    val refBi = bigrams.filter(col("bk") < refPct)
      .groupBy("b").agg(count(lit(1)).as("c12"))
    val scored = bigrams
      .join(refBi, Seq("b"), "left")
      .join(refUni, Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .select(col("doc_id"),
        round(log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))), 6).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(col("lp")), 4).as("ref_xent"))
    val out = docs.select(col("doc_id"), (bucket < refPct).as("in_ref"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("in_ref"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("ref_xent"))
      .localCheckpoint()
    bigrams.unpersist()
    out
  }

  // ------------------------------------------------------- winnowing
  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    * MOSS algorithm; SURVEY.md §2 P10b): over each document's k-token
    * shingle hashes h₀..h_{nk−1}, every window of `w` consecutive
    * hashes contributes its minimum (ties → RIGHTMOST, the standard
    * rule that minimizes selected fingerprints); the distinct selected
    * (position, hash) pairs are the document's fingerprint set — the
    * guarantee is that any shared run of w+k−1 tokens between two
    * documents shares at least one selected fingerprint, which is what
    * makes this the substring-level dup detector that whole-doc
    * hashing misses. Returns (doc_id, pos, fp), one row per selected
    * fingerprint; docs with fewer than k tokens emit nothing.
    *
    * The shingle hash is the FULLY SPECIFIED mod-2^32 char polynomial
    * of [[withFingerprint]] — engine-reproducible, so the DuckDB
    * oracle recomputes identical fingerprints. The min-with-rightmost-
    * tie is one integer key `h·2^21 + (2^21−1−pos)` (min key ⇒ min
    * hash, then max pos); pos < 2^21 is enforced with an in-plan
    * raise_error, not a silent fold (the ADVICE overflow lesson).
    *
    * Scale: selection is entirely per-document HOF arithmetic — ZERO
    * shuffles, no window functions, narrow codegen'd pass; the only
    * wide stage is the caller's (e.g. [[winnowPairs]]' fp join). */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(w >= 1, "w must be positive")
    def charPoly(s: String) =
      s"""aggregate(transform(split($s, ''), ch -> cast(ascii(ch) as bigint)),
            0L, (h, cd) -> (h * 31 + cd) % 4294967296)"""
    val toksSql = s"split(trim(lower($textCol)), '\\\\s+')"
    docs
      .select(col("doc_id"), expr(toksSql).as("ts"))
      .filter(size(col("ts")) >= k)
      .select(col("doc_id"), expr(
        s"""if(size(ts) - $k >= 2097152,
              raise_error('winnowFingerprints: > 2^21 shingles per doc'),
              transform(sequence(0, size(ts) - $k), i ->
                ${charPoly(s"concat_ws(' ', slice(ts, i + 1, $k))")}
                  * 2097152 + (2097151 - i)))""").as("keys"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence(0, greatest(size(keys) - $w, 0)),
              q -> array_min(slice(keys, q + 1, $w))))""")).as("key"))
      .select(col("doc_id"),
        (lit(2097151L) - col("key") % lit(2097152L)).as("pos"),
        expr("key div 2097152").as("fp"))
  }

  /** Substring-overlap pairs via shared winnowing fingerprints — the
    * cross-document consumer of [[winnowFingerprints]]: document pairs
    * sharing ≥ `minShared` distinct selected fingerprints, i.e. pairs
    * with (at least) that many common ≥(w+k−1)-token runs — partial-
    * plagiarism / boilerplate detection at corpus scale. Returns
    * (d1, d2, n_shared) with d1 < d2.
    *
    * Scale: the fp join is the minhash-band shape — fingerprints with
    * document frequency > `maxDf` are dropped first (boilerplate
    * n-grams are the hot keys, exactly like high-df shingles in
    * [[Dedup.ngramJaccardPairs]]), capping any bucket's pair fan-out
    * at C(maxDf, 2); candidate rows carry only (doc_id, fp). */
  def winnowPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 100,
      textCol: String = "text"): DataFrame = {
    // The fingerprint HOF sweep is the expensive part and the frame is
    // consumed three times (df table + both sides of the self-join) —
    // cache it once, release after materializing (the dupfrac idiom).
    val fps = winnowFingerprints(docs, k, w, textCol)
      .select(col("doc_id"), col("fp")).distinct()
      .persist()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("fp")
    val kept = fps.join(rare, Seq("fp"))
    val out = kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .localCheckpoint()
    fps.unpersist()
    out
  }

  /** Model-based quality scoring, the fastText-classifier shape every
    * production pipeline runs (hashed bag-of-words → linear model →
    * sigmoid), with a DETERMINISTIC weight table so the whole scorer is
    * engine-reproducible arithmetic: token → mod-2^32 char polynomial →
    * bucket h mod nBuckets → weight ((b·2654435761) mod 2^32)/2^32·2−1
    * ∈ [−1,1). score = σ(4·mean weight), rounded 6dp BEFORE the ≥0.5
    * keep decision so libm exp() last-ulp differences cannot flip the
    * boolean. Swapping the arithmetic weights for a trained table is a
    * broadcast join on the bucket id — the plan shape is already the
    * production one.
    *
    * Purely narrow per-row HOF arithmetic: no shuffle, no UDF; the
    * token fold is left-to-right in both engines so the FP sum order is
    * pinned.
    */
  def withClassifierScore(docs: DataFrame, nBuckets: Int = 4096,
      textCol: String = "text"): DataFrame = {
    def charPoly(s: String) =
      s"""aggregate(transform(split($s, ''), ch -> cast(ascii(ch) as bigint)),
            0L, (h, cd) -> (h * 31 + cd) % 4294967296)"""
    val toksSql = s"split(trim(lower($textCol)), '\\\\s+')"
    docs
      .withColumn("_ws", expr(
        s"""transform($toksSql, tk ->
              cast(${charPoly("tk")} % $nBuckets * 2654435761 % 4294967296
                as double) / 4294967296 * 2 - 1)"""))
      .withColumn("quality_score",
        round(lit(1.0) / (lit(1.0) + exp(lit(-4.0) *
          expr("aggregate(_ws, cast(0 as double), (a, x) -> a + x)")
          / size(col("_ws")))), 6))
      .withColumn("clf_keep", col("quality_score") >= 0.5)
      .drop("_ws")
  }

  /** The first BPE tokenizer-training iteration: adjacent within-token
    * character-pair frequencies over the corpus, top `topK` by
    * (count DESC, pair ASC) — the merge-candidate table BPE folds into
    * its vocabulary one pair at a time. Returns (pair, cnt).
    *
    * One pair explode + partial-agg'd count (one shuffle on the 2-char
    * key, trivially partial-aggregable) + TakeOrderedAndProject — the
    * same shape as [[vocabulary]]; the full iterated training loop is
    * this operator re-run on re-paired symbols, each round identical in
    * cost. */
  def bpeMergePairs(docs: DataFrame, topK: Int = 30,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("tk"))
      .select(explode(expr(
        """case when length(tk) < 2 then array()
           else transform(sequence(1, length(tk) - 1),
             j -> substring(tk, j, 2)) end""")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topK)

  /** Full BPE tokenizer TRAINING loop (SURVEY.md §2 P18e): `nMerges`
    * rounds of count-pairs → pick the top pair (count DESC, pair ASC) →
    * greedily merge it left-to-right in every word → repeat on the
    * re-paired symbols. Returns the learned merge table
    * (merge_rank, pair, cnt) — `pair` is the two symbols space-joined,
    * exactly the merges.txt contract of a trained BPE tokenizer.
    * [[bpeMergePairs]] is this loop's first candidate table standalone.
    *
    * The greedy merge is a left-fold with a string accumulator (symbols
    * space-joined; tokens are whitespace-split so symbols never contain
    * a space): if the accumulated repr ends with symbol `a` and the next
    * symbol is `b`, the tail rewrites to the merged symbol, else append.
    * No "just merged" flag is needed — a cascade would require
    * a+b == a, impossible for non-empty b. The identical fold runs in
    * DuckDB (list_reduce with the same CASE arms), so the oracle replays
    * every round bit-for-bit.
    *
    * Scale: the corpus is read ONCE into a word-frequency table; every
    * round after that runs at VOCAB scale (distinct words), not corpus
    * scale — one pair-explode + partial-agg'd sum + TakeOrderedAndProject
    * limit(1), then a narrow per-word fold, localCheckpoint'd per round
    * (SURVEY §4 rule 5: truncate iterative lineage). The per-round
    * driver collect is ONE row (the winning pair — the dim-probe
    * precedent), bounded by `nMerges`. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 3,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainLoop(docs, nMerges, textCol)._1.toDF("merge_rank", "pair", "cnt")
  }

  /** Shared BPE training loop: returns (merge table rows, final
    * word-frequency vocab with its fully-merged `syms` column) so
    * [[bpeTrain]] (the merges.txt surface) and [[bpeEncode]] (the
    * apply-tokenizer surface) run the ONE loop — a merge-rule change
    * cannot drift between them. */
  private def bpeTrainLoop(docs: DataFrame, nMerges: Int,
      textCol: String): (Seq[(Int, String, Long)], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 30, "nMerges must be in [1, 30]")
    // array_remove: Spark's regex split keeps a trailing "" on empty
    // pattern (Java split semantics); DuckDB's string_split does not
    var vocab = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("syms", array_remove(split(col("w"), ""), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      val sy = col("syms")
      val pairsArr = when(size(sy) < 2, array().cast("array<string>"))
        .otherwise(slice(
          zip_with(sy, slice(sy, lit(2), size(sy)),
            (a, b) => concat_ws(" ", a, b)),
          lit(1), size(sy) - 1))
      val top = vocab
        .select(col("n"), explode(pairsArr).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((r, pair, cnt))
        val folded = aggregate(sy, lit(""), (acc, x) =>
          when(acc === "", x)
            .when((acc === lit(a) || acc.endsWith(lit(" " + a)))
                && x === lit(b),
              concat(acc.substr(lit(1), length(acc) - lit(a.length)),
                lit(a + b)))
            .otherwise(concat(acc, lit(" "), x)))
        val next = vocab.withColumn("syms", split(folded, " "))
          .localCheckpoint()
        // eager checkpoint: the previous round's vocab blocks retire
        // (the r9 25×-probe loop-lifecycle rule — vocab is word-table
        // sized, and nMerges rounds of stale copies add up)
        org.apache.spark.sql.GraftShim.releaseCheckpoint(vocab)
        vocab = next
      }
    }
    (merges.toSeq, vocab)
  }

  /** SCALABLE BPE training — BATCHED non-overlapping merge selection
    * (SURVEY.md §2 P18e2, r15; the public scalable-BPE idiom): where
    * [[bpeTrain]] learns ONE merge per round (one 1-row collect each —
    * honest but require-bounded at 30 merges, so it reads like a
    * demonstrator), each round here counts pairs ONCE and folds up to
    * `batchK` MUTUALLY NON-INTERACTING merges simultaneously, so a
    * 1,000-merge vocabulary costs ~1000/batchK pair-count shuffles
    * instead of 1,000.
    *
    * Selection (per round, driver-side over a bounded `8·batchK`-row
    * collect of top candidates by (count DESC, pair ASC)): greedily
    * take a pair (a, b) unless it INTERACTS with an already-selected
    * (a', b') — shares a symbol ({a,b} ∩ {a',b'} ≠ ∅), or one merge's
    * output spells another's operand (a+b ∈ {a',b'} or a'+b' ∈ {a,b}).
    * Non-interaction makes the simultaneous one-pass fold apply each
    * merge EXACTLY as the sequential greedy fold would apply it alone:
    * at any element at most one arm can fire (the b's are distinct),
    * and no arm's rewrite can create or consume another's match. With
    * `batchK = 1` the selection degenerates to the top-1 pair and the
    * fold to [[bpeTrain]]'s — spec-asserted equality, so the batched
    * trainer inherits the sequential one's oracle.
    *
    * The batched SEMANTIC (documented, the standard tradeoff): all
    * merges of a round are ranked against the round's OPENING counts —
    * merge k of a round does not see merges 1..k−1's effect, so the
    * learned table can differ from sequential BPE's beyond the first
    * merge of each round. merge_rank still records the global
    * application order (round-major, rank-minor), which is all
    * [[bpeEncode]]-style consumers need.
    *
    * Scale: rounds ≈ nMerges/batchK, each one pair-explode +
    * partial-agg'd sum + TakeOrderedAndProject over the VOCAB (never
    * the corpus after the first word count), one bounded driver
    * collect, one narrow per-word fold, localCheckpoint'd with eager
    * release (the [[bpeTrain]] loop lifecycle). Returns
    * (merge_rank, pair, cnt) like [[bpeTrain]]. */
  def bpeTrainBatched(docs: DataFrame, nMerges: Int = 1000,
      batchK: Int = 32, textCol: String = "text"): DataFrame = {
    require(nMerges >= 1, "nMerges must be positive")
    require(batchK >= 1, "batchK must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("syms", array_remove(split(col("w"), ""), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val sy = col("syms")
      val pairsArr = when(size(sy) < 2, array().cast("array<string>"))
        .otherwise(slice(
          zip_with(sy, slice(sy, lit(2), size(sy)),
            (a, b) => concat_ws(" ", a, b)),
          lit(1), size(sy) - 1))
      val want = math.min(batchK, nMerges - merges.size)
      val top = vocab
        .select(col("n"), explode(pairsArr).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(8 * want)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy non-interacting selection in rank order
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        val it = top.iterator
        while (selected.size < want && it.hasNext) {
          val row = it.next()
          val Array(a, b) = row.getString(0).split(" ", 2)
          val interacts = selected.exists { case (pa, pb, _) =>
            a == pa || a == pb || b == pa || b == pb ||
              (a + b) == pa || (a + b) == pb ||
              (pa + pb) == a || (pa + pb) == b
          }
          if (!interacts) selected += ((a, b, row.getLong(1)))
        }
        selected.foreach { case (a, b, cnt) =>
          merges += ((merges.size + 1, a + " " + b, cnt))
        }
        // ONE simultaneous fold: arms in rank order; at most one arm
        // matches per element (non-interaction, see scaladoc)
        val folded = aggregate(sy, lit(""), (acc, x) =>
          selected.foldLeft(when(acc === "", x)) {
            case (w, (a, b, _)) =>
              w.when((acc === lit(a) || acc.endsWith(lit(" " + a)))
                  && x === lit(b),
                concat(acc.substr(lit(1), length(acc) - lit(a.length)),
                  lit(a + b)))
          }.otherwise(concat(acc, lit(" "), x)))
        val next = vocab.withColumn("syms", split(folded, " "))
          .localCheckpoint()
        org.apache.spark.sql.GraftShim.releaseCheckpoint(vocab)
        vocab = next
      }
    }
    org.apache.spark.sql.GraftShim.releaseCheckpoint(vocab)
    merges.toSeq.toDF("merge_rank", "pair", "cnt")
  }

  /** BPE ENCODING with the learned merge table (SURVEY.md §2 P18h) —
    * the apply-tokenizer step that turns [[bpeTrain]]'s merges into a
    * per-document symbol stream (what a dataloader actually consumes).
    * Returns (doc_id, n_tokens, n_syms, encoded) where `encoded` is the
    * space-joined symbol sequence in document order (§6 convention: no
    * array columns cross the oracle boundary) and n_syms counts emitted
    * symbols — the compression dial (n_syms/n_tokens falls as merges
    * are added).
    *
    * Key property exploited: after training, every corpus word's merged
    * symbol split already EXISTS in the training vocab's final state —
    * encoding a word the tokenizer was trained on IS a lookup. So the
    * corpus never re-runs the merge fold: the final word→syms table
    * (vocab-scale, distinct words) broadcasts, the corpus explodes once
    * with positions, and reassembly is the [[encodeTokens]] idiom — one
    * partial-agg'd groupBy on doc_id with a per-doc array_sort, no
    * window, no global sort. (Out-of-corpus words at serving time would
    * re-run the fold per distinct unseen word — still vocab-scale.)
    */
  def bpeEncode(docs: DataFrame, nMerges: Int = 3,
      textCol: String = "text"): DataFrame = {
    val (_, vocab) = bpeTrainLoop(docs, nMerges, textCol)
    val wordMap = vocab.select(col("w"),
      concat_ws(" ", col("syms")).as("enc"),
      size(col("syms")).cast("long").as("n_syms_w"))
    docs
      .select(col("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .join(broadcast(wordMap), Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("n_syms_w")).as("n_syms"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          p => p.getField("enc"))).as("encoded"))
  }

  // --------------------------------------------------- BM25 retrieval
  /** BM25 document ranking for a fixed bag of query terms (SURVEY.md §2
    * P18f) — the retrieval scorer behind corpus search / RAG candidate
    * generation, and the lexical sibling of the ANN family. Okapi BM25
    * with the Lucene non-negative idf:
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * `score = Σ_t idf_t · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
    * Returns the top `k` docs by (score DESC, doc_id) with their
    * per-doc token length.
    *
    * Cross-engine determinism: idf rounds 6dp; `dl/avgdl` rounds 6dp
    * (avgdl itself is one exact `sum/count` division); each per-term
    * score rounds 6dp and the per-doc sum runs as DECIMAL(18,6) —
    * exact and order-free, so no float-summation ordering can diverge
    * between engines (§6 round-early discipline, the
    * [[temperatureMixture]] decimal-sum idiom).
    *
    * Scale: the corpus explodes once, immediately filtered to the
    * query terms (a literal IN list — Catalyst folds it into the scan
    * filter, so non-matching tokens never shuffle); tf is one
    * partial-agg'd (doc, term) shuffle over MATCHING tokens only; doc
    * lengths partial-agg on doc_id; df/avgdl/N are term- or 1-row
    * frames that ride as broadcasts. The final top-k is a global
    * orderBy+limit = TakeOrderedAndProject (output-proportional,
    * per-partition heaps), never a window. */
  /** Hybrid retrieval with Reciprocal Rank Fusion (SURVEY.md §2 P18i) —
    * the standard RAG candidate-generation shape: a lexical [[bm25TopK]]
    * leg and a dense exact-cosine leg
    * ([[graft.pipeline.Similarity.bruteForceTopK]]) are fused by
    * `RRF(d) = Σ_legs 1/(kRrf + rank_leg(d))` (Cormode's kRrf=60
    * convention), which rewards documents BOTH retrievers surface
    * without having to calibrate incomparable score scales. Documents
    * table and embeddings table join implicitly by rank only — a doc
    * missing from one leg simply contributes that leg's term as 0.
    * Returns (doc_id, lex_rank, den_rank, rrf_score) top `k` by
    * (rrf_score DESC, doc_id); absent-leg ranks emit as −1 (§6: no
    * nullable ints across the oracle boundary).
    *
    * Determinism: both legs already produce engine-identical rankings
    * (BM25's 6dp-rounded DECIMAL sum; cosine's 6dp round + id
    * tie-break); the fusion terms 1/(kRrf+rank) are exact IEEE
    * divisions of integers — no transcendental, so no rounding is
    * needed before the 6dp display round.
    *
    * Scale: each leg is its own audited scale shape (BM25: IN-folded
    * scan + output-proportional top-k; dense: the ANN family's
    * broadcast-query join). The fusion itself touches 2·kLeg rows — a
    * full-outer join of two k-row frames; the rank windows run over
    * kLeg rows (config-bounded, never corpus-bounded). */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int = 10,
      kLeg: Int = 20, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, queryTerms, kLeg)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val den = Similarity.bruteForceTopK(embeddings,
        embeddings.filter(col("vec_id") === queryVecId), kLeg)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("den_rank"))
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(-1)).as("lex_rank"),
        coalesce(col("den_rank"), lit(-1)).as("den_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(kRrf) + col("den_rank")), lit(0.0)),
          6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Token-distribution DRIFT between corpus groups (SURVEY.md §2 P23)
    * — the data-quality monitor a refreshed training corpus needs:
    * Jensen–Shannon divergence between every pair of per-`groupCol`
    * unigram distributions, add-one smoothed over the shared global
    * vocabulary. JS = ½KL(p‖m) + ½KL(q‖m), m = ½(p+q): symmetric,
    * bounded by ln 2, and zero iff the smoothed distributions agree —
    * the standard "did this source's language shift" dial. Returns one
    * row per unordered pair (source_a < source_b): (source_a, source_b,
    * n_a, n_b, js_div).
    *
    * Determinism: p = (c+1)/(n+V) is an exact integer-ratio IEEE
    * division; each ln ratio rounds 6dp (libm differences live far
    * below), each p·ln term rounds 12dp and sums as DECIMAL(28,12) —
    * exact, order-free (the [[bm25TopK]] decimal-sum idiom); the final
    * ½(KLa+KLb) rounds 6dp.
    *
    * Scale: ONE corpus token-count shuffle (grp, token) — the same
    * front half as every vocabulary pass; everything after runs at
    * VOCAB scale: the aligned table is V×S rows (totals broadcast),
    * the pair join fans each token row out S−1 ways, so the term table
    * is O(V·S²) — S is a config-bounded handful of sources/snapshots,
    * never corpus-bounded. The JS groupBy partial-aggs map-side. */
  def distributionDrift(docs: DataFrame, textCol: String = "text",
      groupCol: String = "source"): DataFrame = {
    val tok = docs.select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    jsDivergenceFromCounts(
      tok.groupBy("grp", "token").agg(count(lit(1)).as("c")))
  }

  /** The JS-divergence core of [[distributionDrift]], over an already-
    * aggregated (grp, token, c) count table — factored out (r10) so
    * the STREAMING consumer ([[graft.streaming.StreamDrift]]) computes
    * drift from its online per-source histograms through the IDENTICAL
    * arithmetic: streamed counts equal batch counts exactly (they are
    * plain sums), so streamed js_div equals batch js_div bit-for-bit
    * by construction. Same determinism and V×S²-scale contract as the
    * public operator. */
  private[graft] def jsDivergenceFromCounts(tc0: DataFrame): DataFrame = {
    val tc = tc0.select(col("grp"), col("token"), col("c"))
    val totals = tc.groupBy("grp").agg(sum(col("c")).as("n"))
    val vocab = tc.select("token").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val aligned = vocab
      .crossJoin(broadcast(totals))
      .join(tc, Seq("grp", "token"), "left")
      .na.fill(0L, Seq("c"))
    val a = aligned.select(col("token"), col("grp").as("source_a"),
      col("c").as("ca"), col("n").as("na"))
    val b = aligned.select(col("token"), col("grp").as("source_b"),
      col("c").as("cb"), col("n").as("nb"))
    a.join(b, Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .crossJoin(broadcast(vsize))
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1).cast("double") / (col("nb") + col("v")))
      .withColumn("ta", round(col("pa")
        * round(log(col("pa") / ((col("pa") + col("pb")) / 2)), 6), 12)
        .cast("decimal(28,12)"))
      .withColumn("tb", round(col("pb")
        * round(log(col("pb") / ((col("pa") + col("pb")) / 2)), 6), 12)
        .cast("decimal(28,12)"))
      .groupBy("source_a", "source_b")
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round((sum(col("ta")) + sum(col("tb"))).cast("double") / 2, 6)
          .as("js_div"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("js_div"))
  }

  /** Population Stability Index of each corpus group AGAINST a named
    * baseline group (SURVEY.md §2 P23b) — the BASELINE-anchored member
    * of the drift family: [[distributionDrift]]'s JS asks "do these
    * two sources differ", PSI asks the monitoring question "how far
    * has each slice moved from the reference distribution", with the
    * industry-standard verdict bands (<0.1 stable, <0.25 moderate,
    * ≥0.25 shifted) decided on the ROUNDED statistic. PSI =
    * Σ (p_a−p_e)·ln(p_a/p_e) over the shared vocabulary, add-one
    * smoothed exactly like JS (so zero-count tokens contribute their
    * honest smoothed evidence instead of ±∞). Returns one row per
    * non-baseline group: (source, n_base, n_source, psi, verdict).
    *
    * Determinism and scale: the [[distributionDrift]] contract
    * verbatim — one (grp, token) count shuffle, vocab-scale alignment,
    * 6dp ln / 12dp term / DECIMAL(28,12) order-free sum / 6dp psi;
    * the baseline column joins every token row once, so the term
    * table is O(V·S), cheaper than JS's pairwise O(V·S²). */
  def distributionPsi(docs: DataFrame, textCol: String = "text",
      groupCol: String = "source",
      baseline: String = "baseline"): DataFrame = {
    val tok = docs.select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    psiFromCounts(
      tok.groupBy("grp", "token").agg(count(lit(1)).as("c")), baseline)
  }

  /** The PSI core over an already-aggregated (grp, token, c) table —
    * factored like [[jsDivergenceFromCounts]] so an online consumer
    * can reuse the identical arithmetic. */
  private[graft] def psiFromCounts(tc0: DataFrame,
      baseline: String): DataFrame = {
    val tc = tc0.select(col("grp"), col("token"), col("c"))
    val totals = tc.groupBy("grp").agg(sum(col("c")).as("n"))
    // a silently-absent baseline would return an empty frame that
    // reads as "no drift" — fail loudly instead (group-scale probe)
    require(!totals.filter(col("grp") === baseline).isEmpty,
      s"distributionPsi: baseline group '$baseline' has no tokens in " +
        "the corpus")
    val vocab = tc.select("token").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val aligned = vocab
      .crossJoin(broadcast(totals))
      .join(tc, Seq("grp", "token"), "left")
      .na.fill(0L, Seq("c"))
    val e = aligned.filter(col("grp") === baseline)
      .select(col("token"), col("c").as("ce"), col("n").as("ne"))
    aligned.filter(col("grp") =!= baseline)
      .select(col("grp").as("source"), col("token"),
        col("c").as("ca"), col("n").as("na"))
      .join(e, Seq("token"))
      .crossJoin(broadcast(vsize))
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("pe", (col("ce") + 1).cast("double") / (col("ne") + col("v")))
      .withColumn("t", round((col("pa") - col("pe"))
        * round(log(col("pa") / col("pe")), 6), 12)
        .cast("decimal(28,12)"))
      .groupBy("source")
      .agg(max(col("ne")).as("n_base"), max(col("na")).as("n_source"),
        round(sum(col("t")).cast("double"), 6).as("psi"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("shifted"))
  }

  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val toks = docs.select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val matching = toks.filter(col("token").isin(queryTerms: _*))
    val tf = matching.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg((sum(col("dl")) / count(lit(1))).as("avgdl")))
    val perTerm = tf
      .join(broadcast(dfT), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(log(lit(1.0)
        + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("ndl", round(col("dl") / col("avgdl"), 6))
      .withColumn("tscore", round(
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("ndl"))), 6))
    perTerm
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        sum(col("tscore").cast("decimal(18,6)")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  // --------------------------------------- DSIR importance reweighting
  /** Data Selection via Importance Resampling weights (SURVEY.md §2
    * P28; Xie et al. 2023, public method) — scores every raw document
    * by how much it LOOKS LIKE a target slice: log w(x) =
    * Σ_features [ln p_target(b) − ln p_raw(b)] over hashed n-gram
    * features, the importance ratio between two bag-of-hashed-ngrams
    * models. The [[withReferenceXent]] CCNet discriminator asks "is
    * this fluent reference-like text"; this one asks the DOMAIN
    * question ("is this medical/legal/wiki-like"), and its weights
    * feed the mixture/selection family (rank by log_weight into
    * [[graft.pipeline.Packing.bucketByRank]], or threshold-keep).
    *
    * Features are unigrams + word bigrams hashed into `nBuckets`
    * buckets with the repo's fully-specified (h·31+cp) mod 2^32
    * polynomial ([[withFingerprint]]'s), so the whole feature pipeline
    * is engine-replayable; both distributions are add-one smoothed
    * over the bucket domain. Per-bucket log-ratios round 6dp (the
    * [[withBigramXent]] ln discipline), per-doc sums accumulate as
    * DECIMAL(38,6) (exact, order-free), log_weight rounds 4dp.
    * `targetCol` is a caller-provided boolean column; docs with no
    * features get n_feats 0 and a NULL weight.
    *
    * Scale: one explode to the feature stream (narrow), two
    * partial-agg'd bucket counts (≤ nBuckets rows each), a broadcast
    * lp-table join back, one per-doc aggregate. The raw corpus
    * shuffles once, on the doc id; the model is nBuckets rows — at
    * 100 TB the target slice is typically tiny and the bucket tables
    * broadcast regardless of corpus size. */
  def withImportanceWeights(docs: DataFrame, targetCol: String,
      nBuckets: Int = 4096, textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    def charPoly(s: String) =
      s"""aggregate(transform(split($s, ''), ch -> cast(ascii(ch) as bigint)),
            0L, (h, cd) -> (h * 31 + cd) % 4294967296)"""
    val toksSql = s"split(trim(lower($textCol)), '\\\\s+')"
    val uniSql = s"transform($toksSql, tk -> ${charPoly("tk")} % $nBuckets)"
    val biSql =
      s"""transform(
           slice(zip_with($toksSql, slice($toksSql, 2, size($toksSql)),
             (a, b) -> concat(a, ' ', b)),
           1, greatest(size($toksSql) - 1, 0)),
           bg -> ${charPoly("bg")} % $nBuckets)"""
    val feats = docs
      .select(col("doc_id"), col(targetCol).as("in_target"),
        explode(expr(s"concat($uniSql, $biSql)")).as("b"))
      .persist()
    val rc = feats.groupBy("b").agg(count(lit(1)).as("rc"))
    val tc = feats.filter(col("in_target")).groupBy("b")
      .agg(count(lit(1)).as("tc"))
    val tot = feats.agg(count(lit(1)).as("rn"),
      count(when(col("in_target"), 1)).as("tn"))
    val lp = rc.join(tc, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
            (col("tn") + lit(nBuckets.toDouble))) -
          log((col("rc") + lit(1.0)) /
            (col("rn") + lit(nBuckets.toDouble))), 6).as("lp"))
    val scored = feats.join(broadcast(lp), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(col("lp").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("_s"))
      // round the exact DECIMAL, then cast: rounding a near-boundary
      // double diverges across engines (Java's shortest-repr BigDecimal
      // vs the true binary value); rounding the decimal is exact both
      .withColumn("log_weight", round(col("_s"), 4).cast("double"))
    val out = docs.select(col("doc_id"), col(targetCol).as("in_target"))
      .join(scored.select(col("doc_id"), col("n_feats"),
        col("log_weight")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("in_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("log_weight"))
      .localCheckpoint()
    feats.unpersist()
    out
  }
}
