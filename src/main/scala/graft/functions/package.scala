package graft

import org.apache.spark.sql.{Column, GraftShim}

/** Column-level function facade for graft's custom Catalyst expressions —
  * the analogue of `org.apache.spark.sql.functions` for the operators the
  * reference has and Spark lacks (SURVEY.md §2 A7).
  */
package object functions {

  /** k largest values of `c` per group, descending array.
    * Reference: python/pyhdk/hdk.py:301 `top_k`. */
  def topk(c: Column, k: Int): Column =
    GraftShim.column(
      TopKAgg(GraftShim.expression(c), k, ascending = false).toAggregateExpression())

  /** k smallest values of `c` per group, ascending array.
    * Reference: python/pyhdk/hdk.py:328 `bottom_k`. */
  def bottomk(c: Column, k: Int): Column =
    GraftShim.column(
      TopKAgg(GraftShim.expression(c), k, ascending = true).toAggregateExpression())

  /** Misra–Gries heavy-hitter candidates of string column `c` per
    * group: a ≤k-counter mergeable summary guaranteed to contain every
    * item with frequency > n/k (see [[MisraGriesAgg]]); returns the
    * candidate items sorted. Pair with an exact count over the
    * candidates for deterministic frequencies. */
  def heavyHitterCandidates(c: Column, k: Int): Column =
    GraftShim.column(
      MisraGriesAgg(GraftShim.expression(c), k).toAggregateExpression())

  /** Exact centered-Gram accumulator: `c` is a d-dim vector of
    * micro-unit (·10⁶) centered coordinates as array<bigint>; returns
    * the packed upper triangle of Σ c·cᵀ as array<decimal(38,12)>
    * (see [[GramAgg]] for the 128-bit partial-sum algebra). */
  def gramUpperTriangle(c: Column, d: Int): Column =
    GraftShim.column(
      GramAgg(GraftShim.expression(c), d).toAggregateExpression())

  /** Count–Min sketch of string column `c` per group: d·w mergeable
    * counters flattened to array<bigint> (see [[CountMinAgg]]). */
  def cmsSketch(c: Column, depth: Int, width: Int): Column =
    GraftShim.column(
      CountMinAgg(GraftShim.expression(c), depth, width).toAggregateExpression())

  /** Point estimate of literal `item` from a [[cmsSketch]] column:
    * min over the d rows of the counter at that row's bucket. The d
    * bucket indices are computed here (driver side, the item is a
    * literal) so the plan is plain element_at/least arithmetic. */
  def cmsPointEstimate(sketch: Column, item: String, depth: Int,
      width: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, least}
    val cells = (0 until depth).map(r =>
      element_at(sketch, r * width + CountMinAgg.bucket(item, r, width) + 1))
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** KLL quantile sketch of double column `c` per group: bounded
    * (value, weight) summary flattened to array<double>
    * [v₀,w₀,v₁,w₁,…] sorted by value (see [[KllQuantileAgg]]). */
  def kllSketch(c: Column, k: Int): Column =
    GraftShim.column(
      KllQuantileAgg(GraftShim.expression(c), k).toAggregateExpression())

  /** φ-quantile estimate from a [[kllSketch]] column: the first summary
    * value whose cumulative weight reaches φ·W — plain per-row HOF
    * arithmetic (a fold with a (cum, ans, done) struct accumulator),
    * no UDF. */
  def kllQuantile(sketch: Column, phi: Double): Column = {
    import org.apache.spark.sql.functions._
    val n = (size(sketch) / 2).cast("int")
    val idx = sequence(lit(0), n - 1)
    val wTotal = aggregate(idx, lit(0.0),
      (a, i) => a + element_at(sketch, i * 2 + 2))
    val target = lit(phi) * wTotal
    aggregate(idx,
      struct(lit(0.0).as("cum"), lit(Double.NaN).as("ans"),
        lit(false).as("done")),
      (acc, i) => {
        val cum = acc.getField("cum") + element_at(sketch, i * 2 + 2)
        val hit = !acc.getField("done") && cum >= target
        struct(cum.as("cum"),
          when(hit, element_at(sketch, i * 2 + 1))
            .otherwise(acc.getField("ans")).as("ans"),
          (acc.getField("done") || hit).as("done"))
      },
      acc => acc.getField("ans"))
  }

  /** Codegen'd dot product of two double arrays (see [[DotProduct]]). */
  def dotp(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  /** Codegen'd equal-position count of two long arrays (see
    * [[ArrayEqCount]]) — the MinHash signature-agreement kernel. */
  def eqcount(a: Column, b: Column): Column =
    GraftShim.column(ArrayEqCount(GraftShim.expression(a), GraftShim.expression(b)))
}
