package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, BindReferences, BinaryArithmetic, BoundReference,
  EvalMode, Expression, Literal, NamedExpression, Add, Multiply, Subtract,
  SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, ProjectExec, SparkPlan,
  UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector,
  WritableColumnVector}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  LongType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Executable proof of the accelerator extension point (SURVEY §1's
  * device-heterogeneity deferral; reference: `Config.device_type`,
  * python/pyhdk/hdk.py:2101, and the LLVM/NVPTX/SPIR-V backends under
  * omniscidb/QueryEngine). The reference compiles each kernel for CPU
  * or GPU behind one declarative plan; Spark's analogue is
  * `injectColumnar`: a [[ColumnarRule]] swaps a physical node for a
  * vectorized implementation and the planner inserts
  * RowToColumnar/ColumnarToRow transitions automatically — the query,
  * the optimizer, and every graft operator stay unchanged, which is
  * exactly the argument SURVEY §1 makes for deferring device targeting
  * to this hook. This file makes the argument executable: a real
  * columnar projection operator (batch-at-a-time arithmetic over
  * ColumnVectors, null-propagating, ANSI-checked) behind a config
  * flag, proven result-identical to the row path in ColumnarSpec.
  *
  * Scope is deliberately a DEMONSTRATOR: +/−/× over int/long/double
  * columns and literals. A production accelerator plugin (or a real
  * GPU backend) would widen the expression coverage, not change the
  * wiring — the rule, transitions, and plan surgery here are the full
  * shape.
  */
object Columnar {
  /** Session flag gating the rule; off by default so the row path (and
    * whole-stage codegen) serves unless a deployment opts in. */
  val EnabledKey = "spark.graft.columnar.enabled"

  private[plans] def supportedType(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == DoubleType

  /** Conservative whitelist: every projected expression must be fully
    * evaluable by the vectorized interpreter, same-typed through each
    * arithmetic node (the analyzer's inserted casts make mixed-type
    * trees fail this check and stay on the row path — honest refusal,
    * not silent wrong answers). TRY eval mode is refused: its
    * null-on-overflow contract is not implemented here. */
  private[plans] def supported(e: Expression): Boolean = e match {
    case a: Alias => supported(a.child)
    case a: AttributeReference => supportedType(a.dataType)
    case l: Literal => supportedType(l.dataType)
    case b @ (_: Add | _: Subtract | _: Multiply) =>
      val ba = b.asInstanceOf[BinaryArithmetic]
      supportedType(ba.dataType) && ba.evalMode != EvalMode.TRY &&
        ba.children.forall(c => c.dataType == ba.dataType && supported(c))
    case _ => false
  }
}

/** Vectorized projection: evaluates each output column batch-at-a-time
  * into fresh OnHeapColumnVectors (inputs are copied, never aliased,
  * so the parquet reader's batch reuse cannot corrupt downstream
  * state). ANSI long arithmetic uses Math.*Exact — overflow still
  * fails the query, with a coarser error message than Spark's
  * (documented demonstrator trade-off).
  */
case class GraftColumnarProjectExec(projectList: Seq[NamedExpression],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def supportsColumnar: Boolean = true

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[org.apache.spark.sql.catalyst.InternalRow] =
    throw new IllegalStateException(
      "GraftColumnarProjectExec is columnar-only; the planner inserts " +
        "a ColumnarToRow transition above it")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val bound = projectList
      .map(BindReferences.bindReference(_, child.output))
    child.executeColumnar().map { batch =>
      val n = batch.numRows()
      val cols = bound.map {
        case a: Alias => eval(a.child, batch, n)
        case e => eval(e, batch, n)
      }
      new ColumnarBatch(cols.toArray[ColumnVector], n)
    }
  }

  private def eval(e: Expression, batch: ColumnarBatch,
      n: Int): WritableColumnVector = e match {
    case b: BoundReference =>
      val out = new OnHeapColumnVector(n, b.dataType)
      val src = batch.column(b.ordinal)
      var i = 0
      b.dataType match {
        case LongType =>
          while (i < n) {
            if (src.isNullAt(i)) out.putNull(i)
            else out.putLong(i, src.getLong(i)); i += 1 }
        case IntegerType =>
          while (i < n) {
            if (src.isNullAt(i)) out.putNull(i)
            else out.putInt(i, src.getInt(i)); i += 1 }
        case DoubleType =>
          while (i < n) {
            if (src.isNullAt(i)) out.putNull(i)
            else out.putDouble(i, src.getDouble(i)); i += 1 }
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      out
    case Literal(v, dt) =>
      val out = new OnHeapColumnVector(n, dt)
      if (v == null) out.putNulls(0, n)
      else dt match {
        case LongType => out.putLongs(0, n, v.asInstanceOf[Long])
        case IntegerType => out.putInts(0, n, v.asInstanceOf[Int])
        case DoubleType => out.putDoubles(0, n, v.asInstanceOf[Double])
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      out
    case ba: BinaryArithmetic =>
      val l = eval(ba.left, batch, n)
      val r = eval(ba.right, batch, n)
      val out = new OnHeapColumnVector(n, ba.dataType)
      val ansi = ba.evalMode == EvalMode.ANSI
      val opL: (Long, Long) => Long = ba match {
        case _: Add => if (ansi) Math.addExact(_, _) else _ + _
        case _: Subtract => if (ansi) Math.subtractExact(_, _) else _ - _
        case _ => if (ansi) Math.multiplyExact(_, _) else _ * _
      }
      val opI: (Int, Int) => Int = ba match {
        case _: Add => if (ansi) Math.addExact(_, _) else _ + _
        case _: Subtract => if (ansi) Math.subtractExact(_, _) else _ - _
        case _ => if (ansi) Math.multiplyExact(_, _) else _ * _
      }
      val opD: (Double, Double) => Double = ba match {
        case _: Add => _ + _
        case _: Subtract => _ - _
        case _ => _ * _
      }
      var i = 0
      ba.dataType match {
        case LongType =>
          while (i < n) {
            if (l.isNullAt(i) || r.isNullAt(i)) out.putNull(i)
            else out.putLong(i, opL(l.getLong(i), r.getLong(i))); i += 1 }
        case IntegerType =>
          while (i < n) {
            if (l.isNullAt(i) || r.isNullAt(i)) out.putNull(i)
            else out.putInt(i, opI(l.getInt(i), r.getInt(i))); i += 1 }
        case DoubleType =>
          while (i < n) {
            if (l.isNullAt(i) || r.isNullAt(i)) out.putNull(i)
            else out.putDouble(i, opD(l.getDouble(i), r.getDouble(i)))
            i += 1 }
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      l.close(); r.close()
      out
    case other =>
      throw new IllegalStateException(
        s"unsupported expression reached the columnar path: $other")
  }
}

/** The injected rule: under the flag, swap every fully-supported
  * ProjectExec for the vectorized node. Runs in preColumnarTransitions,
  * so the planner then places RowToColumnar/ColumnarToRow conversions
  * wherever the neighbors need them — no operator rewrites anywhere
  * else in the engine.
  */
class GraftColumnarRule(session: SparkSession) extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] =
    new Rule[SparkPlan] {
      override def apply(plan: SparkPlan): SparkPlan =
        if (!session.conf.get(Columnar.EnabledKey, "false").toBoolean) plan
        else plan.transformUp {
          case p: ProjectExec
              if p.projectList.nonEmpty &&
                p.projectList.forall(Columnar.supported) =>
            GraftColumnarProjectExec(p.projectList, p.child)
        }
    }
}
