package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the validation gate a
  * warehouse runs before publishing a table (the Deequ/Great-
  * Expectations shape): NOT NULL, value range, set membership, key
  * uniqueness, referential integrity. One report row per rule:
  * (rule, violations, total, ok).
  *
  * Plays the role HDK users fill with ad-hoc Python sweeps after
  * `import_parquet` (reference: python/pyhdk/hdk.py:2313 — the storage
  * layer validates nothing); here the checks are plan-level so they
  * fuse, push down, and scale.
  *
  * Scale shape — three cost classes, each minimal for its rule kind:
  *  - ALL row-level rules (not-null / range / set) fold into ONE
  *    aggregate over ONE scan regardless of rule count: each rule is a
  *    `sum(violation-indicator)` column in the same partial-agg'd
  *    aggregate, so auditing 40 columns costs one table pass, not 40.
  *    The 1-row result melts into report rows via a narrow
  *    explode-of-struct-array projection (1-row frame — free).
  *  - uniqueness: one partial-agg'd shuffle on the key (map-side
  *    combine collapses each partition's duplicates first);
  *    violations = Σ(n−1) over groups seen more than once — "rows
  *    that would be dropped by a dedup", the actionable number.
  *  - referential integrity: LEFT ANTI join against the dimension's
  *    distinct keys — no explicit broadcast hint: AQE /
  *    autoBroadcastJoinThreshold broadcasts a small dimension (the
  *    usual case, so the fact never shuffles) but a genuinely large
  *    one falls back to a shuffled anti join instead of OOMing the
  *    driver with a forced broadcast.
  * Nothing collects; the report is output-sized (one row per rule).
  */
object Quality {

  sealed trait Rule { def name: String }

  /** `column` must not be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }

  /** Non-null values of `column` must lie in [lo, hi]. NULLs are
    * [[NotNull]]'s business — counting them twice would double-report
    * one defect. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    val name = s"in_range($column,$lo,$hi)"
  }

  /** Non-null values of `column` must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = s"in_set($column)"
  }

  /** `columns` must be unique across the table. */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Every non-null `column` value must exist in `dim.pk` — FK
    * referential integrity. */
  final case class RefIntegrity(column: String, dim: DataFrame, pk: String)
      extends Rule {
    val name = s"ref_integrity($column)"
  }

  /** Run every rule against `df`; returns (rule, violations, total, ok)
    * with `total` = rows the rule examined (all rows for not-null and
    * uniqueness; non-null values for range/set; non-null FK values for
    * referential integrity). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect {
      case r: NotNull => (r.name, col(r.column).isNull, lit(true))
      case r: InRange =>
        (r.name,
          col(r.column).cast("double") < r.lo ||
            col(r.column).cast("double") > r.hi,
          col(r.column).isNotNull)
      case r: InSet =>
        (r.name, !col(r.column).isInCollection(r.values),
          col(r.column).isNotNull)
    }
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        // intermediate columns are indexed, not rule-named: rule names
        // contain '.' and '(' which column resolution would parse
        val aggs = rowRules.zipWithIndex.flatMap {
          case ((_, bad, scope), i) =>
            Seq(
              sum((scope && bad).cast("long")).as(s"_v$i"),
              sum(scope.cast("long")).as(s"_t$i"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(rowRules.zipWithIndex.map {
          case ((n, _, _), i) =>
            struct(lit(n).as("rule"),
              coalesce(col(s"_v$i"), lit(0L)).as("violations"),
              coalesce(col(s"_t$i"), lit(0L)).as("total"))
        }: _*)).as("r")).select(col("r.*")))
      }
    val keyReports = rules.collect { case r: Unique =>
      df.groupBy(r.columns.map(col): _*)
        .agg(count(lit(1)).as("_n"))
        .agg(
          coalesce(sum(when(col("_n") > 1, col("_n") - 1)), lit(0L))
            .as("violations"),
          coalesce(sum(col("_n")), lit(0L)).as("total"))
        .select(lit(r.name).as("rule"), col("violations"), col("total"))
    }
    val fkReports = rules.collect { case r: RefIntegrity =>
      // no broadcast() hint: let AQE / autoBroadcastJoinThreshold pick
      // — a small dim broadcasts anyway, a huge one must not be forced
      // through the driver
      val dimKeys = r.dim.select(col(r.pk).as(r.column)).distinct()
      val checked = df.select(col(r.column)).filter(col(r.column).isNotNull)
      val orphans = checked.join(dimKeys, Seq(r.column), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val totals = checked.agg(count(lit(1)).as("total"))
      orphans.crossJoin(totals)
        .select(lit(r.name).as("rule"), col("violations"), col("total"))
    }
    (rowReport.toSeq ++ keyReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("ok", col("violations") === 0L)
  }

  /** Winsorization at exact per-group quantiles (SURVEY.md §2 R50) —
    * the REPAIR member of the cleaning family: [[audit]] counts the
    * out-of-contract rows, [[graft.pipeline.TextAnalysis]]'s outlier
    * filter drops them, this one CLAMPS them into [q_pLow, q_pHigh]
    * so a heavy tail stops poisoning downstream means without
    * discarding the rows (the standard pre-step before [[audit]]able
    * aggregate contracts, and the classic guard in front of an OLS
    * fit). NULL values pass through untouched and unflagged.
    *
    * Exactness: bounds are exact linear-interpolation percentiles
    * (the q19 engine-aligned pair: Spark `percentile` ≡ DuckDB
    * `quantile_cont`) rounded 6dp, so the clamp compares every raw
    * value against the SAME doubles in both engines; clamped outputs
    * are exactly the rounded bounds, untouched outputs the original
    * values.
    *
    * Scale: one per-group percentile aggregate (group-state ∝
    * distinct values, the q19 contract) + one broadcast-able bounds
    * join back; the fact table shuffles once. */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
      pLow: Double = 0.05, pHigh: Double = 0.95): DataFrame = {
    require(pLow >= 0 && pLow < pHigh && pHigh <= 1,
      "need 0 <= pLow < pHigh <= 1")
    val bounds = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(round(expr(s"percentile($valCol, $pLow)"), 6).as("lo"),
        round(expr(s"percentile($valCol, $pHigh)"), 6).as("hi"))
    val v = col(valCol).cast("double")
    // no broadcast hint: bounds is one row per group, which is tiny
    // for typical groupings but unbounded in general — let the
    // size-based rule / AQE decide (the RefIntegrity advisor lesson)
    df.join(bounds, Seq(keyCol), "left")
      .withColumn("winsorized",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("lo")), col("hi"))))
      .withColumn("clipped",
        coalesce(v < col("lo") || v > col("hi"), lit(false)))
  }

  /** One-pass column profiler (SURVEY.md §2 A12; r12 — extracted from
    * the q54_profile query body verbatim so the `graft_profile` TVF
    * and the DataFrame surface share one implementation): every exact
    * stat (nulls, min, max, decimal-exact mean) for every profiled
    * column in a SINGLE scan + aggregate — the data-card utility for
    * a table you can't afford to re-scan per column at 100 TB. Approx
    * NDV (HLL, 2% rsd) rides in the same pass; the exact NDV it is
    * gated against uses a second expand-based aggregate (the gate's
    * price, not the operator's — production ships the approx). One
    * row per profiled column: (col_name, n_rows, n_nulls, min_v,
    * max_v, mean_v, ndv_exact, ndv_ok).
    *
    * Contract notes (r12 advice): column names must be plain
    * identifiers ([A-Za-z_][A-Za-z0-9_]*) — they are spliced into a
    * selectExpr stack and a quote/dot/space would misbind, so the
    * require below fails loudly instead. mean_v sums values cast to
    * DECIMAL(18,2): exact for currency-scale numerics (the data-card
    * use), but values are ROUNDED to 2dp before summing and a value
    * with > 16 integer digits nulls the sum (non-ANSI cast) — profile
    * wider decimals through a pre-projected alias if that matters. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile: column name '$c' is not a plain identifier"))
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"nn_$c"),
      min(col(c)).as(s"mn_$c"),
      max(col(c)).as(s"mx_$c"),
      sum(col(c).cast("decimal(18,2)")).as(s"sm_$c"),
      approx_count_distinct(col(c), 0.02).as(s"andv_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val ex = df.agg(
      countDistinct(col(cols.head)).as(s"ndv_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"ndv_$c")): _*)
    val st = cols.map(c =>
      s"'$c', nn_$c, mn_$c, mx_$c, sm_$c, andv_$c, ndv_$c")
      .mkString(", ")
    one.crossJoin(ex)
      .selectExpr("n_rows", s"stack(${cols.size}, $st) AS " +
        "(col_name, n_nulls, min_v, max_v, sum_dec, andv, ndv_exact)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        round(col("sum_dec").cast("double")
          / (col("n_rows") - col("n_nulls")), 6).as("mean_v"),
        col("ndv_exact"),
        (abs(col("andv") - col("ndv_exact"))
          <= col("ndv_exact") * 0.05).as("ndv_ok"))
      .orderBy(col("col_name"))
  }
}
