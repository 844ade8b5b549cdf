package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, BindReferences, BinaryArithmetic, BinaryComparison,
  BoundReference, EqualTo, EvalMode, Expression, GreaterThan,
  GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal,
  NamedExpression, Not, Or, Add, Multiply, Subtract, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Max, Min, Partial, Sum}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, FilterExec, ProjectExec,
  SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
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
  * columnar PROJECTION (batch-at-a-time arithmetic over ColumnVectors,
  * null-propagating, ANSI-checked) and, since r10, a real columnar
  * FILTER (vectorized three-valued predicate + batch shrinking — the
  * other scan-adjacent hot-path half a SIMD/GPU plugin substitutes,
  * and the one that exercises SELECTIVE batches through the
  * transitions), both behind a config flag and proven result-identical
  * to the row path in ColumnarSpec.
  *
  * Scope is deliberately a DEMONSTRATOR: +/−/× over int/long/double
  * columns and literals; predicates = comparisons over those plus
  * AND/OR/NOT (Kleene three-valued, matching SQL) and IS [NOT] NULL.
  * A production accelerator plugin (or a real GPU backend) would widen
  * the expression coverage, not change the wiring — the rule,
  * transitions, and plan surgery here are the full shape.
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

  /** Aggregate whitelist for the columnar PARTIAL aggregate (r11 — the
    * scan-adjacent trio's last member, and the op where columnar wins
    * most: map-side combine collapses rows before they shuffle):
    * Partial-mode, non-distinct, unfiltered sum/count/min/max whose
    * child is vectorizable and whose buffer is a single attribute
    * (long/double sums; decimal sums carry an isEmpty flag and refuse).
    * TRY sums refuse — the null-on-overflow contract is not
    * implemented here (the [[supported]] rule). */
  private[plans] def supportedAgg(ae: AggregateExpression): Boolean =
    ae.mode == Partial && !ae.isDistinct && ae.filter.isEmpty &&
      (ae.aggregateFunction match {
        case s: Sum =>
          s.aggBufferAttributes.size == 1 && supported(s.child) &&
            supportedType(s.dataType) &&
            s.evalContext.evalMode != EvalMode.TRY
        case c: Count => c.children.size == 1 && supported(c.children.head)
        case m: Min => supported(m.child) && supportedType(m.dataType)
        case m: Max => supported(m.child) && supportedType(m.dataType)
        case _ => false
      })

  /** Predicate whitelist for the columnar filter: comparisons between
    * same-typed supported value expressions, Kleene AND/OR/NOT, and
    * null tests. EqualNullSafe, IN, and everything else refuse —
    * same honest-refusal contract as [[supported]]. */
  private[plans] def supportedPredicate(e: Expression): Boolean = e match {
    case And(l, r) => supportedPredicate(l) && supportedPredicate(r)
    case Or(l, r) => supportedPredicate(l) && supportedPredicate(r)
    case Not(c) => supportedPredicate(c)
    case IsNull(c) => supported(c)
    case IsNotNull(c) => supported(c)
    case c @ (_: EqualTo | _: LessThan | _: LessThanOrEqual |
        _: GreaterThan | _: GreaterThanOrEqual) =>
      val bc = c.asInstanceOf[BinaryComparison]
      bc.left.dataType == bc.right.dataType &&
        supported(bc.left) && supported(bc.right)
    case _ => false
  }
}

/** The shared batch-at-a-time expression interpreter: evaluates a bound
  * value expression into a fresh OnHeapColumnVector (inputs are copied,
  * never aliased, so the parquet reader's batch reuse cannot corrupt
  * downstream state). ANSI long arithmetic uses Math.*Exact — overflow
  * still fails the query, with a coarser error message than Spark's
  * (documented demonstrator trade-off). Used by both the projection
  * and the filter's comparison operands. */
private[plans] object ColumnarEval {

  def eval(e: Expression, batch: ColumnarBatch,
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

  /** Three-valued predicate result: `value(i)` is meaningful only where
    * `known(i)`; an unknown (SQL NULL) predicate row never passes a
    * filter. */
  final case class Pred(value: Array[Boolean], known: Array[Boolean])

  def evalPredicate(e: Expression, batch: ColumnarBatch, n: Int): Pred =
    e match {
      case And(le, re) =>
        val l = evalPredicate(le, batch, n)
        val r = evalPredicate(re, batch, n)
        val v = new Array[Boolean](n); val k = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          val lf = l.known(i) && !l.value(i)
          val rf = r.known(i) && !r.value(i)
          if (lf || rf) { v(i) = false; k(i) = true }           // false wins
          else if (l.known(i) && r.known(i)) { v(i) = true; k(i) = true }
          else k(i) = false                                     // unknown
          i += 1
        }
        Pred(v, k)
      case Or(le, re) =>
        val l = evalPredicate(le, batch, n)
        val r = evalPredicate(re, batch, n)
        val v = new Array[Boolean](n); val k = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          val lt = l.known(i) && l.value(i)
          val rt = r.known(i) && r.value(i)
          if (lt || rt) { v(i) = true; k(i) = true }            // true wins
          else if (l.known(i) && r.known(i)) { v(i) = false; k(i) = true }
          else k(i) = false
          i += 1
        }
        Pred(v, k)
      case Not(ce) =>
        val c = evalPredicate(ce, batch, n)
        val v = new Array[Boolean](n)
        var i = 0
        while (i < n) { v(i) = !c.value(i); i += 1 }
        Pred(v, c.known)
      case IsNull(ce) =>
        val c = eval(ce, batch, n)
        val v = new Array[Boolean](n); val k = new Array[Boolean](n)
        var i = 0
        while (i < n) { v(i) = c.isNullAt(i); k(i) = true; i += 1 }
        c.close()
        Pred(v, k)
      case IsNotNull(ce) =>
        val c = eval(ce, batch, n)
        val v = new Array[Boolean](n); val k = new Array[Boolean](n)
        var i = 0
        while (i < n) { v(i) = !c.isNullAt(i); k(i) = true; i += 1 }
        c.close()
        Pred(v, k)
      case bc: BinaryComparison =>
        val l = eval(bc.left, batch, n)
        val r = eval(bc.right, batch, n)
        val v = new Array[Boolean](n); val k = new Array[Boolean](n)
        val dt = bc.left.dataType
        def cmpL(a: Long, b: Long): Boolean = bc match {
          case _: EqualTo => a == b
          case _: LessThan => a < b
          case _: LessThanOrEqual => a <= b
          case _: GreaterThan => a > b
          case _ => a >= b
        }
        def cmpD(a: Double, b: Double): Boolean = bc match {
          case _: EqualTo => a == b
          case _: LessThan => a < b
          case _: LessThanOrEqual => a <= b
          case _: GreaterThan => a > b
          case _ => a >= b
        }
        var i = 0
        while (i < n) {
          if (l.isNullAt(i) || r.isNullAt(i)) k(i) = false
          else {
            k(i) = true
            v(i) = dt match {
              case LongType => cmpL(l.getLong(i), r.getLong(i))
              case IntegerType => cmpL(l.getInt(i).toLong, r.getInt(i).toLong)
              case DoubleType => cmpD(l.getDouble(i), r.getDouble(i))
              case other =>
                throw new IllegalStateException(s"unsupported $other")
            }
          }
          i += 1
        }
        l.close(); r.close()
        Pred(v, k)
      case other =>
        throw new IllegalStateException(
          s"unsupported predicate reached the columnar path: $other")
    }

  /** Copy the selected rows of `src` (its type must be a supported
    * type) into a fresh vector of length `m`. */
  def gather(src: ColumnVector, dt: DataType, sel: Array[Int],
      m: Int): WritableColumnVector = {
    val out = new OnHeapColumnVector(m, dt)
    var j = 0
    dt match {
      case LongType =>
        while (j < m) {
          val i = sel(j)
          if (src.isNullAt(i)) out.putNull(j)
          else out.putLong(j, src.getLong(i)); j += 1 }
      case IntegerType =>
        while (j < m) {
          val i = sel(j)
          if (src.isNullAt(i)) out.putNull(j)
          else out.putInt(j, src.getInt(i)); j += 1 }
      case DoubleType =>
        while (j < m) {
          val i = sel(j)
          if (src.isNullAt(i)) out.putNull(j)
          else out.putDouble(j, src.getDouble(i)); j += 1 }
      case other => throw new IllegalStateException(s"unsupported $other")
    }
    out
  }
}

/** Vectorized projection: evaluates each output column batch-at-a-time
  * via [[ColumnarEval]].
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
        case a: Alias => ColumnarEval.eval(a.child, batch, n)
        case e => ColumnarEval.eval(e, batch, n)
      }
      new ColumnarBatch(cols.toArray[ColumnVector], n)
    }
  }
}

/** Vectorized filter: evaluates the predicate batch-at-a-time under
  * SQL's three-valued logic (an unknown predicate row never passes),
  * then SHRINKS the batch — selected rows are gathered into fresh
  * vectors, so a selective filter hands downstream operators compact
  * batches instead of masked ones. This is the transition-wiring case
  * the projection can't exercise: output batches whose row count
  * differs from their input's.
  */
case class GraftColumnarFilterExec(condition: Expression,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def supportsColumnar: Boolean = true

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[org.apache.spark.sql.catalyst.InternalRow] =
    throw new IllegalStateException(
      "GraftColumnarFilterExec is columnar-only; the planner inserts " +
        "a ColumnarToRow transition above it")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val bound = BindReferences.bindReference(condition, child.output)
    val types = child.output.map(_.dataType)
    child.executeColumnar().map { batch =>
      val n = batch.numRows()
      val p = ColumnarEval.evalPredicate(bound, batch, n)
      val sel = new Array[Int](n)
      var m = 0
      var i = 0
      while (i < n) {
        if (p.known(i) && p.value(i)) { sel(m) = i; m += 1 }
        i += 1
      }
      val cols = types.zipWithIndex.map { case (dt, c) =>
        ColumnarEval.gather(batch.column(c), dt, sel, m)
      }
      new ColumnarBatch(cols.toArray[ColumnVector], m)
    }
  }
}

/** Vectorized map-side (Partial) hash aggregate (r11): consumes the
  * whole partition's batches into one insertion-ordered hash of group →
  * aggregate cells, updating each cell in ROW ORDER — exactly the row
  * path's fold, so double sums are BIT-IDENTICAL to HashAggregateExec's
  * partial buffers (emitting per-batch partials instead would re-
  * associate the FP additions). Emits one batch of
  * (group, buffer...) rows whose attributes are the ORIGINAL partial
  * aggregate's output, so the downstream final aggregate consumes it
  * unchanged. ANSI long sums use Math.addExact (overflow still fails
  * the query, with a coarser message — the documented demonstrator
  * trade-off); min/max over doubles use java.lang.Double.compare,
  * Spark's NaN-greatest / −0.0 < 0.0 ordering. Group cardinality is
  * assumed to fit the task (no spill — a production accelerator adds
  * it; the row path keeps serving everything the whitelist refuses).
  */
case class GraftColumnarPartialAggExec(groupAttr: AttributeReference,
    aggs: Seq[AggregateExpression], outAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = outAttrs
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def supportsColumnar: Boolean = true

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[org.apache.spark.sql.catalyst.InternalRow] =
    throw new IllegalStateException(
      "GraftColumnarPartialAggExec is columnar-only; the planner inserts " +
        "a ColumnarToRow transition above it")

  // one descriptor per aggregate, prepared at plan time so the task
  // closure carries plain serializable values
  private case class AggDesc(kind: Int, ansi: Boolean,
      inType: DataType, outType: DataType, bound: Expression)
  private val KSum = 0; private val KCount = 1
  private val KMin = 2; private val KMax = 3

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val groupIdx = child.output.indexWhere(_.exprId == groupAttr.exprId)
    require(groupIdx >= 0, "grouping attribute missing from child output")
    val groupType = groupAttr.dataType
    val descs = aggs.zipWithIndex.map { case (ae, j) =>
      val (kind, ansi, childExpr) = ae.aggregateFunction match {
        case s: Sum =>
          (KSum, s.evalContext.evalMode == EvalMode.ANSI, s.child)
        case c: Count => (KCount, false, c.children.head)
        case m: Min => (KMin, false, m.child)
        case m: Max => (KMax, false, m.child)
        case other =>
          throw new IllegalStateException(s"unsupported aggregate $other")
      }
      AggDesc(kind, ansi, childExpr.dataType, outAttrs(1 + j).dataType,
        BindReferences.bindReference(childExpr, child.output))
    }.toArray
    val outTypes = outAttrs.map(_.dataType).toArray

    child.executeColumnar().mapPartitions { batches =>
      // per-group, per-agg cell: (long acc, double acc, seen-any flag)
      final class Cell {
        var l: Long = 0L; var d: Double = 0.0; var set: Boolean = false
      }
      val NullKey = new Object // partition-local sentinel for the null group
      val groups = scala.collection.mutable
        .LinkedHashMap.empty[Any, Array[Cell]]
      batches.foreach { batch =>
        val n = batch.numRows()
        val gcol = batch.column(groupIdx)
        val acols = descs.map(d => ColumnarEval.eval(d.bound, batch, n))
        var i = 0
        while (i < n) {
          val key: Any =
            if (gcol.isNullAt(i)) NullKey
            else groupType match {
              case LongType => gcol.getLong(i)
              case IntegerType => gcol.getInt(i)
              case DoubleType => gcol.getDouble(i)
              case dt => throw new IllegalStateException(s"unsupported $dt")
            }
          val cells = groups.getOrElseUpdate(key,
            Array.fill(descs.length)(new Cell))
          var j = 0
          while (j < descs.length) {
            val d = descs(j); val c = cells(j); val v = acols(j)
            d.kind match {
              case KCount => if (!v.isNullAt(i)) { c.l += 1L; c.set = true }
              case KSum => if (!v.isNullAt(i)) {
                d.outType match {
                  case DoubleType =>
                    c.d += v.getDouble(i)
                  case LongType =>
                    val x = d.inType match {
                      case IntegerType => v.getInt(i).toLong
                      case _ => v.getLong(i)
                    }
                    c.l = if (d.ansi) Math.addExact(c.l, x) else c.l + x
                  case dt =>
                    throw new IllegalStateException(s"unsupported $dt")
                }
                c.set = true
              }
              case _ => if (!v.isNullAt(i)) { // min/max
                val mn = d.kind == KMin
                d.inType match {
                  case LongType =>
                    val x = v.getLong(i)
                    val cmp = java.lang.Long.compare(x, c.l)
                    if (!c.set || (if (mn) cmp < 0 else cmp > 0)) c.l = x
                  case IntegerType =>
                    val x = v.getInt(i).toLong
                    val cmp = java.lang.Long.compare(x, c.l)
                    if (!c.set || (if (mn) cmp < 0 else cmp > 0)) c.l = x
                  case DoubleType =>
                    val x = v.getDouble(i)
                    val cmp = java.lang.Double.compare(x, c.d)
                    if (!c.set || (if (mn) cmp < 0 else cmp > 0)) c.d = x
                  case dt =>
                    throw new IllegalStateException(s"unsupported $dt")
                }
                c.set = true
              }
            }
            j += 1
          }
          i += 1
        }
        acols.foreach(_.close())
      }
      if (groups.isEmpty) Iterator.empty
      else {
        val m = groups.size
        val vecs = outTypes.map(new OnHeapColumnVector(m, _))
        var r = 0
        groups.foreach { case (key, cells) =>
          if (key.asInstanceOf[AnyRef] eq NullKey) vecs(0).putNull(r)
          else groupType match {
            case LongType => vecs(0).putLong(r, key.asInstanceOf[Long])
            case IntegerType => vecs(0).putInt(r, key.asInstanceOf[Int])
            case DoubleType => vecs(0).putDouble(r, key.asInstanceOf[Double])
            case dt => throw new IllegalStateException(s"unsupported $dt")
          }
          var j = 0
          while (j < descs.length) {
            val d = descs(j); val c = cells(j); val out = vecs(1 + j)
            d.kind match {
              case KCount => out.putLong(r, c.l) // count buffer is non-null 0
              case _ =>
                if (!c.set) out.putNull(r)
                else d.outType match {
                  case LongType => out.putLong(r, c.l)
                  case IntegerType => out.putInt(r, c.l.toInt)
                  case DoubleType => out.putDouble(r, c.d)
                  case dt =>
                    throw new IllegalStateException(s"unsupported $dt")
                }
            }
            j += 1
          }
          r += 1
        }
        Iterator.single(
          new ColumnarBatch(vecs.toArray[ColumnVector], m))
      }
    }
  }
}

/** The injected rule: under the flag, swap every fully-supported
  * ProjectExec/FilterExec for its vectorized node. Runs in
  * preColumnarTransitions, so the planner then places
  * RowToColumnar/ColumnarToRow conversions wherever the neighbors need
  * them — no operator rewrites anywhere else in the engine.
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
          // the filter additionally needs every OUTPUT column gatherable
          // (batch shrinking copies all of them, not just the predicate's)
          case f: FilterExec
              if Columnar.supportedPredicate(f.condition) &&
                f.child.output.forall(a =>
                  Columnar.supportedType(a.dataType)) =>
            GraftColumnarFilterExec(f.condition, f.child)
          // the map-side (Partial) aggregate: single supported grouping
          // attribute, whitelisted aggregate functions, and the
          // pass-through partial output layout (grouping attr + one
          // buffer attr per aggregate, positionally)
          case a: HashAggregateExec
              if a.groupingExpressions.size == 1 &&
                a.groupingExpressions.head.isInstanceOf[AttributeReference] &&
                Columnar.supportedType(
                  a.groupingExpressions.head.dataType) &&
                a.aggregateExpressions.nonEmpty &&
                a.aggregateExpressions.forall(Columnar.supportedAgg) &&
                a.output.size == 1 + a.aggregateExpressions.size &&
                a.output.head.exprId ==
                  a.groupingExpressions.head.asInstanceOf[AttributeReference]
                    .exprId =>
            GraftColumnarPartialAggExec(
              a.groupingExpressions.head.asInstanceOf[AttributeReference],
              a.aggregateExpressions, a.output, a.child)
        }
    }
}
