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
