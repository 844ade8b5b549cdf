package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayEqCount, DotProduct, TopKAgg}

/** SparkSessionExtensions hook registering graft's custom expressions
  * in the SQL function registry, so `spark.sql` users get `topk`,
  * `bottomk` and `dotp` alongside the built-ins — the same reach the
  * reference gives its SQL frontend for kTopK (Calcite registration in
  * omniscidb/Calcite). Activate via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk"),
      (args: Seq[Expression]) =>
        TopKAgg(args.head, intLit(args(1), "topk"), ascending = false)))
    ext.injectFunction((FunctionIdentifier("bottomk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "bottomk"),
      (args: Seq[Expression]) =>
        TopKAgg(args.head, intLit(args(1), "bottomk"), ascending = true)))
    ext.injectFunction((FunctionIdentifier("dotp"),
      new ExpressionInfo(classOf[DotProduct].getName, "dotp"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("eqcount"),
      new ExpressionInfo(classOf[ArrayEqCount].getName, "eqcount"),
      (args: Seq[Expression]) => ArrayEqCount(args.head, args(1))))
  }
}
