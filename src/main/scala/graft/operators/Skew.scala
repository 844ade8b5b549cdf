package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for cluster-scale joins.
  *
  * AQE's runtime skew-join split (on by default in GraftSession) covers
  * sort-merge joins; explicit salting is the deterministic fallback for
  * the pathological case — a join key whose hottest value floods one
  * partition (the reference faces the same issue in its partitioned
  * hash joins, omniscidb/QueryEngine partitioned GroupBy/Join).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a `small` side.
    *
    * The big side gets a deterministic salt in [0, salt) derived from
    * `saltBy` (a column that varies within a join key — e.g. a line
    * number or unique id); the small side is replicated `salt` ways.
    * Same results as `big.join(small, keys)`, but the hot key's rows
    * spread over `salt` partitions instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, saltBy: Column, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt)))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Join-key skew profile (SURVEY.md §2 R34) — the diagnostic you run
    * BEFORE picking a join strategy at scale: is this key safe to
    * shuffle on, or does its hottest value flood one partition? Emits
    * the `topK` heaviest key values with rank plus the distribution
    * stats that decide the strategy: total rows, distinct keys,
    * average rows/key, skew_factor = max/avg, and a
    * `salt_recommended` boolean (skew_factor > `saltThreshold` — the
    * dial for [[saltedJoin]] / AQE's split).
    *
    * Scale: ONE partial-agg'd shuffle builds the key histogram (map-
    * side combine collapses hot keys before they move); everything
    * after runs at KEY cardinality — the global stats are one
    * aggregate over the histogram, the top-k is TakeOrderedAndProject,
    * and the k-row result broadcast-joins the 1-row stats. The
    * histogram localCheckpoints once for its two consumers (stats +
    * top-k) so the corpus scans once.
    *
    * Cross-engine: counts are exact integers; avg and skew_factor are
    * single IEEE divisions of exactly-agreed integers, rounded 6dp;
    * the boolean compares the ROUNDED factor (§6). */
  def keyProfile(df: DataFrame, keyCols: Seq[String], topK: Int = 5,
      saltThreshold: Double = 4.0): DataFrame = {
    require(keyCols.nonEmpty && topK > 0, "need key columns and topK > 0")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val g = counts.agg(
      sum(col("n_rows")).as("n_total"),
      count(lit(1)).as("n_keys"),
      max(col("n_rows")).as("_mx"))
    val ord = col("n_rows").desc +: keyCols.map(col(_).asc)
    val top = counts.orderBy(ord: _*).limit(topK)
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(g))
      .withColumn("share",
        round(col("n_rows").cast("double") / col("n_total"), 6))
      .withColumn("avg_rows",
        round(col("n_total").cast("double") / col("n_keys"), 6))
      .withColumn("skew_factor",
        round(col("_mx").cast("double") * col("n_keys") / col("n_total"), 6))
      .withColumn("salt_recommended", col("skew_factor") > saltThreshold)
      .drop("_mx")
  }
}
