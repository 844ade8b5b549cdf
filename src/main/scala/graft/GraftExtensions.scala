package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayEqCount, CountMinAgg, DotProduct,
  KllQuantileAgg, MisraGriesAgg, TopKAgg}

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
    // the mergeable-sketch family (SURVEY §2 P18d/P18j/P18k) at the
    // SQL surface: same reach the DataFrame facade in graft.functions
    // has, so `spark.sql` pipelines can fold sketches into rollups
    // without leaving SQL
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) =>
        MisraGriesAgg(args.head, intLit(args(1), "misra_gries"))))
    ext.injectFunction((FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
      (args: Seq[Expression]) =>
        CountMinAgg(args.head, intLit(args(1), "count_min"),
          intLit(args(2), "count_min"))))
    ext.injectFunction((FunctionIdentifier("kll"),
      new ExpressionInfo(classOf[KllQuantileAgg].getName, "kll"),
      (args: Seq[Expression]) =>
        KllQuantileAgg(args.head, intLit(args(1), "kll"))))
  }
}
