package graft.builder

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Window-expression builder mirroring the reference's QueryExpr
  * `.over(partition_keys)` / `.order_by(keys)` (hdk.py:1456,1488):
  * `over` turns an aggregate into its window form and adds partition
  * keys; `order_by` adds ordering (each key a column or
  * (column, "asc"|"desc") pair). Terminal `toColumn`/`as` hand a plain
  * Spark Column back to the builder, so plans still flow through
  * Catalyst untouched.
  *
  * {{{
  * node.projExprs(
  *   "a" -> node.ref("a"),
  *   Wins.count.over(node.ref("a")).as("count"),
  *   Wins.percentRank.orderBy(node.ref("a")).as("prk"))
  * }}}
  */
final case class WinExpr(base: Column,
    partition: Seq[Column] = Nil, order: Seq[Column] = Nil) {

  /** hdk.py:1456 `over` — add partition keys. */
  def over(keys: Column*): WinExpr = copy(partition = partition ++ keys)

  /** hdk.py:1488 `order_by` — add order keys (asc by default). */
  def orderBy(keys: Column*): WinExpr = copy(order = order ++ keys)

  def orderByDesc(keys: Column*): WinExpr =
    copy(order = order ++ keys.map(_.desc))

  def toColumn: Column = {
    val w0 =
      if (partition.nonEmpty) Window.partitionBy(partition: _*)
      else Window.partitionBy()
    val w = if (order.nonEmpty) w0.orderBy(order: _*) else w0
    base.over(w)
  }

  def as(alias: String): (String, Column) = alias -> toColumn
}

/** Factories matching the reference's window-capable aggregates and
  * rank functions (hdk.py:2771-2924 + the agg family that `over`
  * transforms). */
object Wins {
  def count: WinExpr = WinExpr(F.count(F.lit(1)))
  def count(c: Column): WinExpr = WinExpr(F.count(c))
  def sum(c: Column): WinExpr = WinExpr(F.sum(c))
  def min(c: Column): WinExpr = WinExpr(F.min(c))
  def max(c: Column): WinExpr = WinExpr(F.max(c))
  def avg(c: Column): WinExpr = WinExpr(F.avg(c))
  def rowNumber: WinExpr = WinExpr(F.row_number())
  def rank: WinExpr = WinExpr(F.rank())
  def denseRank: WinExpr = WinExpr(F.dense_rank())
  def percentRank: WinExpr = WinExpr(F.percent_rank())
  def cumeDist: WinExpr = WinExpr(F.cume_dist())
  def ntile(n: Int): WinExpr = WinExpr(F.ntile(n))
  def lag(c: Column, n: Int = 1): WinExpr = WinExpr(F.lag(c, n))
  def lead(c: Column, n: Int = 1): WinExpr = WinExpr(F.lead(c, n))
  def firstValue(c: Column): WinExpr = WinExpr(F.first(c))
  def lastValue(c: Column): WinExpr = WinExpr(F.last(c))
}
