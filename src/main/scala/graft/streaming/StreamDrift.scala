package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.TextAnalysis

/** Streaming token-distribution drift monitor (SURVEY.md §2 ST18; the
  * online twin of P23's [[TextAnalysis.distributionDrift]] and the
  * missing alerting consumer the r9 verdict named: "alert when today's
  * crawl distribution shifts" — without waiting for tonight's batch).
  *
  * Shape: documents key by their source; each source's state is its
  * unigram HISTOGRAM (token → count) updated inside
  * `flatMapGroupsWithState` and re-emitted per touched batch. State is
  * VOCAB-bounded — proportional to the source's distinct-token count,
  * never its stream length — with a loud `maxVocab` failsafe (a
  * histogram that outgrows it means the "tokens" are not tokens, e.g.
  * unsplit raw bytes, and silent truncation would corrupt every later
  * divergence).
  *
  * Because the per-source histogram counts are plain sums, the
  * streamed histogram EQUALS the batch token-count table on the same
  * prefix, and [[driftFromHistograms]] feeds the freshest per-source
  * rows through [[TextAnalysis.jsDivergenceFromCounts]] — the SAME
  * arithmetic the batch operator runs — so streamed js_div is
  * bit-for-bit the batch answer on the ingested prefix (spec-proven
  * across a microbatch cut). The batch twin text_drift (and its
  * lang-grouped sibling) hold the shared semantics under the full
  * DuckDB oracle.
  */
object StreamDrift {

  private[graft] case class DriftState(tokens: Map[String, Long],
      seen: Long)

  /** One emission per (source, microbatch): the source's full current
    * histogram as aligned token/count arrays (token-sorted for
    * deterministic output), with monotone `n_seen` so consumers keep
    * the freshest row per source. */
  case class SourceHistogram(source: String, n_seen: Long,
      tokens: Seq[String], counts: Seq[Long])

  /** Per-source online unigram histograms. `docs` needs (source, text)
    * string columns; identical tokenization to the batch operator. */
  def tokenHistograms(docs: DataFrame, textCol: String = "text",
      groupCol: String = "source",
      maxVocab: Int = 1 << 20): Dataset[SourceHistogram] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(source: String, rows: Iterator[(String, String)],
        state: GroupState[DriftState]): Iterator[SourceHistogram] = {
      val m = scala.collection.mutable.HashMap[String, Long]()
      if (state.exists) m ++= state.get.tokens
      var seen = if (state.exists) state.get.seen else 0L
      rows.foreach { case (_, t) =>
        m.update(t, m.getOrElse(t, 0L) + 1L)
        seen += 1L
      }
      if (m.size > maxVocab)
        throw new IllegalStateException(
          s"StreamDrift: source '$source' exceeded maxVocab=$maxVocab " +
            "distinct tokens — state is vocabulary-bounded by contract; " +
            "raise maxVocab only if the token stream is really this wide")
      state.update(DriftState(m.toMap, seen))
      val sorted = m.toSeq.sortBy(_._1)
      Iterator.single(SourceHistogram(source, seen,
        sorted.map(_._1), sorted.map(_._2)))
    }

    docs
      .select(col(groupCol).cast("string").as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Pairwise JS divergence from the FRESHEST per-source histogram
    * rows (the consumer half): explode the aligned arrays back into a
    * (grp, token, c) count table and run the batch operator's own
    * divergence core — one implementation, so streamed and batch
    * js_div cannot drift apart. */
  def driftFromHistograms(hists: DataFrame): DataFrame = {
    val latest = hists
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n_seen").desc)))
      .filter(col("_rn") === 1)
    val tc = latest
      .select(col("source").as("grp"),
        explode(arrays_zip(col("tokens"), col("counts"))).as("tc"))
      .select(col("grp"), col("tc.tokens").as("token"),
        col("tc.counts").as("c"))
    TextAnalysis.jsDivergenceFromCounts(tc)
  }

  /** PSI of every streamed source against the `baseline` source's
    * histogram (the P23b consumer) — same freshest-row selection and
    * count reconstruction as [[driftFromHistograms]], fed through
    * [[TextAnalysis.psiFromCounts]]: one implementation, so streamed
    * psi equals [[TextAnalysis.distributionPsi]] on the ingested
    * prefix bit-for-bit. Fails loudly if the baseline has not streamed
    * yet (the batch operator's missing-baseline contract). */
  def psiFromHistograms(hists: DataFrame, baseline: String): DataFrame = {
    val latest = hists
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n_seen").desc)))
      .filter(col("_rn") === 1)
    val tc = latest
      .select(col("source").as("grp"),
        explode(arrays_zip(col("tokens"), col("counts"))).as("tc"))
      .select(col("grp"), col("tc.tokens").as("token"),
        col("tc.counts").as("c"))
    TextAnalysis.psiFromCounts(tc, baseline)
  }
}
