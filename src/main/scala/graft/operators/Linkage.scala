package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Entity resolution / record linkage ACROSS relations (SURVEY.md §2
  * R28) — the warehouse job the within-table dedup family (P4c) can't
  * express: every dirty record matched to its best-scoring candidate
  * in a clean registry, NULL when nothing clears the threshold. The
  * reference serves this class through repeated relational self-joins;
  * here it is the prefix-filter machinery of
  * [[graft.pipeline.Dedup.allPairsJaccard]] generalized to TWO sides:
  * both relations' shingle tables share ONE df order (computed over
  * the union — any common total order satisfies the prefix-filter
  * principle), candidates come only from cross-side prefix
  * collisions, and the length + PPJoin positional filters apply with
  * the same integer basis-point arithmetic. Above the threshold the
  * candidate set has RECALL 1, so the blocked argmax EQUALS the exact
  * full-cross-product argmax — which is precisely what the oracle
  * computes with no blocking at all.
  *
  * Tie rule: best match = (jaccard 6dp DESC, clean id ASC), exact in
  * both engines.
  *
  * Scale: no cross product anywhere — one df groupBy over both token
  * tables, per-record prefix slices, a prefix-token equi-join, an
  * output-proportional exact verify, one argmax partial-agg keyed by
  * the high-cardinality dirty id.
  */
object Linkage {

  /** `dirty` needs (dirty_id, text); `clean` needs (clean_id, text).
    * Returns one row per dirty record: (dirty_id, match_id, sim) with
    * NULLs when no clean record reaches `threshold`. */
  def matchEntities(dirty: DataFrame, clean: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val tauBp = math.round(threshold * 10000).toInt
    val dTok = dirty.select(col("dirty_id").as("rid"),
        explode(Dedup.shingleHashes(col("text"))).as("h"))
      .persist()
    val cTok = clean.select(col("clean_id").as("rid"),
        explode(Dedup.shingleHashes(col("text"))).as("h"))
      .persist()
    val dfTab = dTok.select("h").unionAll(cTok.select("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))

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

    val cand = prefixSide(dTok)
      .select(col("h"), col("rid").as("d_id"), col("sz").as("sz_d"),
        col("rn").as("rn_d"))
      .join(prefixSide(cTok).select(col("h"), col("rid").as("c_id"),
        col("sz").as("sz_c"), col("rn").as("rn_c")), Seq("h"))
      .filter(col("sz_c") * 10000 >= col("sz_d") * tauBp
        && col("sz_d") * 10000 >= col("sz_c") * tauBp)
      .filter(lit(1) + least(col("sz_d") - col("rn_d"),
          col("sz_c") - col("rn_c"))
        >= ceil((col("sz_d") + col("sz_c")) * tauBp
          / lit((10000 + tauBp).toDouble)))
      .select("d_id", "c_id", "sz_d", "sz_c").distinct()

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
    cTok.unpersist()
    out
  }
}
