package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert: apply a keyed changeset to a snapshot in one pass —
  * the warehouse maintenance operator (SQL MERGE INTO, SCD type 1).
  * Neither HDK nor stock Spark-without-a-table-format ships it as a
  * single operator; the reference's users run it as the
  * read-modify-write around every HDK table refresh.
  *
  * Semantics per key: a change row with `opCol` = "D" deletes the base
  * row; any other change row replaces it (or inserts it when the key is
  * absent — upsert); keys without a change row pass through unchanged.
  * A delete for an absent key is a no-op. The changeset must be unique
  * per key (standard MERGE precondition — duplicate change keys would
  * make the result order-dependent); `requireUniqueKeys = true` (the
  * default) enforces it in-plan with a count guard instead of silently
  * fanning out the join.
  *
  * Plan shape: ONE full-outer shuffle join on the key — both sides hash
  * partition, AQE broadcasts a small changeset; per-column
  * `CASE WHEN change-side present` projection, no window, no collect.
  * At 100 TB the changeset is typically ≪ the snapshot, so the join is
  * a broadcast and the snapshot never shuffles at all.
  */
object Merge {

  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", requireUniqueKeys: Boolean = true): DataFrame = {
    val dataCols = base.columns.toSeq.filterNot(keys.contains)
    require((keys :+ opCol).forall(changes.columns.contains) &&
      dataCols.forall(changes.columns.contains),
      s"changeset must carry ${keys.mkString(",")}, $opCol and the base columns")
    val guarded =
      if (!requireUniqueKeys) changes
      else {
        // in-plan uniqueness guard: partial-agg'd count per key, raises
        // on the first duplicate instead of silently fanning out. The
        // guard wraps the op column (which every downstream expression
        // consumes) — a standalone guard column would be pruned away.
        val k = changes.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("_n_ch"))
        changes.join(k, keys)
          .withColumn(opCol, when(col("_n_ch") === 1, col(opCol))
            .otherwise(expr(
              "raise_error('MERGE changeset has duplicate keys')")
              .cast("string")))
          .drop("_n_ch")
      }
    val c = guarded.select(
      (keys.map(col) :+ col(opCol).as("_op")) ++
        dataCols.map(n => col(n).as(s"_c_$n")): _*)
    base.join(c, keys, "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select((keys.map(col) ++ dataCols.map(n =>
        when(col("_op").isNotNull, col(s"_c_$n")).otherwise(col(n))
          .as(n))): _*)
  }

  /** Snapshot diff — derive the changeset [[upsert]] consumes from two
    * keyed snapshots (the CDC-extract inverse of MERGE): rows only in
    * `next` emit op "I", rows only in `prev` emit "D", keys present in
    * both with any differing data column emit "U" carrying the NEW
    * values; identical rows emit nothing. `upsert(prev, snapshotDiff
    * (prev, next, keys), keys)` reproduces `next` exactly — the
    * round-trip contract the spec asserts.
    *
    * This is how a warehouse turns "yesterday's table + today's full
    * re-export" into the small changeset everything downstream
    * (incremental dedup indexes, SCD2 history, stream replays) wants:
    * ship ops, not snapshots.
    *
    * Plan shape: ONE full-outer shuffle join on the key (both sides
    * hash-partition once; at 100 TB co-locate by bucketing both
    * snapshots on the key and the Exchange disappears — BucketingSpec's
    * idiom), then a narrow per-column `<=>`-conjunction filter. NULL
    * data values compare with null-safe equality, so NULL→NULL is "no
    * change" and NULL→value is an update — a plain `=!=` would silently
    * drop both. No window, no collect; output is change-proportional.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    val dataCols = prev.columns.toSeq.filterNot(keys.contains)
    require(prev.columns.sorted.sameElements(next.columns.sorted),
      "snapshots must share a schema")
    require(!prev.columns.contains(opCol), s"column $opCol already exists")
    val p = prev.select(
      (keys.map(col) :+ lit(true).as("_in_p")) ++
        dataCols.map(n => col(n).as(s"_p_$n")): _*)
    val n = next.select(
      (keys.map(col) :+ lit(true).as("_in_n")) ++
        dataCols.map(c => col(c).as(s"_n_$c")): _*)
    val same = dataCols
      .map(c => col(s"_p_$c") <=> col(s"_n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    p.join(n, keys, "full_outer")
      .withColumn(opCol,
        when(col("_in_p").isNull, lit("I"))
          .when(col("_in_n").isNull, lit("D"))
          .when(same, lit(null).cast("string"))
          .otherwise(lit("U")))
      .filter(col(opCol).isNotNull)
      .select((keys.map(col) :+ col(opCol)) ++ dataCols.map(c =>
        when(col(opCol) === "D", col(s"_p_$c"))
          .otherwise(col(s"_n_$c")).as(c)): _*)
  }

  /** SCD type-2 historize: turn a keyed change log into versioned
    * history rows — each change becomes a row valid from its own
    * timestamp until the next change of the same key (`valid_to` null
    * and `is_current` true on the latest). The companion to [[upsert]]
    * for consumers who need to query "as of" any past moment instead of
    * only the latest state.
    *
    * Ties on `tsCol` are ordered by `tieCols` so the version chain is
    * deterministic in any engine. One `lead` window partitioned by the
    * (high-cardinality) key — each partition holds one key's change
    * chain, so no task's work grows with the corpus.
    */
  def historize(changes: DataFrame, keys: Seq[String], tsCol: String,
      tieCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
