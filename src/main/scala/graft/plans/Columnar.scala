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
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType,
  DoubleType, IntegerType, LongType, StringType}
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

  /** Grouping keys additionally admit strings (r12 — the TPC-H q01
    * shape groups on l_returnflag/l_linestatus): the key is only read,
    * hashed, and re-emitted, never computed on. */
  private[plans] def supportedGroupType(dt: DataType): Boolean =
    supportedType(dt) || dt == StringType

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
    * child is vectorizable. r12 widens sums to the TPC-H q01 shape:
    * a DECIMAL column sum is accepted with its two-attribute
    * (sum, isEmpty) buffer — the child must be a bare column reference
    * (decimal ARITHMETIC stays on the row path; the interpreter's
    * whitelist is int/long/double). TRY sums refuse — the
    * null-on-overflow contract is not implemented here (the
    * [[supported]] rule). */
  private[plans] def supportedAgg(ae: AggregateExpression): Boolean =
    ae.mode == Partial && !ae.isDistinct && ae.filter.isEmpty &&
      (ae.aggregateFunction match {
        case s: Sum if s.dataType.isInstanceOf[DecimalType] =>
          s.aggBufferAttributes.size == 2 &&
            s.child.isInstanceOf[AttributeReference] &&
            s.child.dataType.isInstanceOf[DecimalType] &&
            s.evalContext.evalMode != EvalMode.TRY
        case s: Sum =>
          s.aggBufferAttributes.size == 1 && supported(s.child) &&
            supportedType(s.dataType) &&
            s.evalContext.evalMode != EvalMode.TRY
        // count needs only NULL-ness, so a bare column reference of ANY
        // type is countable (count(decimal_col), count(string_col));
        // computed children still need the interpreter's whitelist
        case c: Count => c.children.size == 1 &&
          (c.children.head.isInstanceOf[AttributeReference] ||
            supported(c.children.head))
        case m: Min => supported(m.child) && supportedType(m.dataType)
        case m: Max => supported(m.child) && supportedType(m.dataType)
        case _ => false
      })

  /** Buffer width of one whitelisted aggregate in the Partial output
    * layout (decimal sums carry (sum, isEmpty); everything else one). */
  private[plans] def bufferWidth(ae: AggregateExpression): Int =
    ae.aggregateFunction.aggBufferAttributes.size

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
  * Spark's NaN-greatest / −0.0 < 0.0 ordering. r12 widens to the
  * TPC-H q01 SHAPE: up to two grouping attributes (strings admitted
  * as keys), and DECIMAL column sums with the row path's exact
  * two-slot (sum, isEmpty) buffer — accumulation is exact
  * java.math.BigDecimal, so it is bit-identical to the row path's
  * decimal fold in any order. Group cardinality is assumed to fit the
  * task (no spill — a production accelerator adds it; the row path
  * keeps serving everything the whitelist refuses).
  */
case class GraftColumnarPartialAggExec(groupAttrs: Seq[AttributeReference],
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
  // closure carries plain serializable values. `off` = the aggregate's
  // first buffer column in the output layout (decimal sums span two:
  // sum + isEmpty).
  private case class AggDesc(kind: Int, ansi: Boolean,
      inType: DataType, outType: DataType, bound: Expression, off: Int)
  private val KSum = 0; private val KCount = 1
  private val KMin = 2; private val KMax = 3; private val KSumDec = 4

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val groupIdxs = groupAttrs.map { ga =>
      val idx = child.output.indexWhere(_.exprId == ga.exprId)
      require(idx >= 0, "grouping attribute missing from child output")
      idx
    }.toArray
    val groupTypes = groupAttrs.map(_.dataType).toArray
    val nG = groupIdxs.length
    var off = nG
    val descs = aggs.map { ae =>
      val (kind, ansi, childExpr) = ae.aggregateFunction match {
        case s: Sum if s.dataType.isInstanceOf[DecimalType] =>
          (KSumDec, s.evalContext.evalMode == EvalMode.ANSI, s.child)
        case s: Sum =>
          (KSum, s.evalContext.evalMode == EvalMode.ANSI, s.child)
        case c: Count => (KCount, false, c.children.head)
        case m: Min => (KMin, false, m.child)
        case m: Max => (KMax, false, m.child)
        case other =>
          throw new IllegalStateException(s"unsupported aggregate $other")
      }
      // decimal children bypass the int/long/double interpreter at
      // execution time and read the batch column directly (bare
      // references only — the whitelist refuses decimal arithmetic)
      val d = AggDesc(kind, ansi, childExpr.dataType,
        outAttrs(off).dataType,
        BindReferences.bindReference(childExpr, child.output), off)
      off += Columnar.bufferWidth(ae)
      d
    }.toArray
    require(off == outAttrs.size, "partial output layout mismatch")
    val outTypes = outAttrs.map(_.dataType).toArray

    child.executeColumnar().mapPartitions { batches =>
      // per-group, per-agg cell: (long acc, double acc, exact decimal
      // acc, seen-any flag)
      final class Cell {
        var l: Long = 0L; var d: Double = 0.0
        var bd: java.math.BigDecimal = null
        var set: Boolean = false
      }
      val NullKey = new Object // partition-local sentinel for null keys
      val groups = scala.collection.mutable
        .LinkedHashMap.empty[Any, Array[Cell]]
      batches.foreach { batch =>
        val n = batch.numRows()
        val gcols = groupIdxs.map(batch.column)
        // bare-reference children (decimal sums; counts of any-typed
        // columns) read the batch column raw — only computed children
        // go through the int/long/double interpreter
        def rawRef(d: AggDesc): Boolean = d.kind == KSumDec ||
          (d.kind == KCount && d.bound.isInstanceOf[BoundReference] &&
            !Columnar.supportedType(d.inType))
        val acols = descs.map { d =>
          if (rawRef(d)) null else ColumnarEval.eval(d.bound, batch, n)
        }
        val rawCols = descs.map { d =>
          if (rawRef(d))
            batch.column(d.bound.asInstanceOf[BoundReference].ordinal)
          else null
        }
        def keyElem(g: Int, i: Int): Any =
          if (gcols(g).isNullAt(i)) NullKey
          else groupTypes(g) match {
            case LongType => gcols(g).getLong(i)
            case IntegerType => gcols(g).getInt(i)
            case DoubleType => gcols(g).getDouble(i)
            case StringType => gcols(g).getUTF8String(i).toString
            case dt => throw new IllegalStateException(s"unsupported $dt")
          }
        var i = 0
        while (i < n) {
          val key: Any =
            if (nG == 1) keyElem(0, i)
            else (keyElem(0, i), keyElem(1, i))
          val cells = groups.getOrElseUpdate(key,
            Array.fill(descs.length)(new Cell))
          var j = 0
          while (j < descs.length) {
            val d = descs(j); val c = cells(j); val v = acols(j)
            d.kind match {
              case KCount =>
                val src = if (v != null) v else rawCols(j)
                if (!src.isNullAt(i)) { c.l += 1L; c.set = true }
              case KSumDec =>
                val src = rawCols(j)
                if (!src.isNullAt(i)) {
                  val dt = d.inType.asInstanceOf[DecimalType]
                  val x = src.getDecimal(i, dt.precision, dt.scale)
                    .toJavaBigDecimal
                  c.bd = if (c.bd == null) x else c.bd.add(x)
                  c.set = true
                }
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
        acols.foreach(v => if (v != null) v.close())
      }
      if (groups.isEmpty) Iterator.empty
      else {
        val m = groups.size
        val vecs = outTypes.map(new OnHeapColumnVector(m, _))
        def putKeyElem(g: Int, r: Int, elem: Any): Unit =
          if (elem.asInstanceOf[AnyRef] eq NullKey) vecs(g).putNull(r)
          else groupTypes(g) match {
            case LongType => vecs(g).putLong(r, elem.asInstanceOf[Long])
            case IntegerType => vecs(g).putInt(r, elem.asInstanceOf[Int])
            case DoubleType =>
              vecs(g).putDouble(r, elem.asInstanceOf[Double])
            case StringType =>
              vecs(g).putByteArray(r, elem.asInstanceOf[String]
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            case dt => throw new IllegalStateException(s"unsupported $dt")
          }
        var r = 0
        groups.foreach { case (key, cells) =>
          if (nG == 1) putKeyElem(0, r, key)
          else {
            val (k0, k1) = key.asInstanceOf[(Any, Any)]
            putKeyElem(0, r, k0); putKeyElem(1, r, k1)
          }
          var j = 0
          while (j < descs.length) {
            val d = descs(j); val c = cells(j); val out = vecs(d.off)
            d.kind match {
              case KCount => out.putLong(r, c.l) // count buffer is non-null 0
              case KSumDec =>
                // the row path's (sum, isEmpty) buffer INVARIANT: sum
                // is NEVER null in a healthy partial — an all-null
                // group carries (0, isEmpty=true); Spark's merge
                // codegen adds the sums unguarded and reads a null as
                // buffer overflow. The exact BigDecimal total must fit
                // the +10-headroom buffer type (a partial-side overflow
                // needs >1e10 max-precision rows in ONE task — fail
                // loudly, the Math.addExact discipline, rather than
                // emit a wrapped value).
                val bufT = d.outType.asInstanceOf[DecimalType]
                val total =
                  if (c.set) c.bd.setScale(bufT.scale)
                  else java.math.BigDecimal.ZERO.setScale(bufT.scale)
                if (total.precision > bufT.precision)
                  throw new ArithmeticException(
                    s"decimal partial sum overflows ${bufT.sql}")
                out.putDecimal(r,
                  Decimal(total, bufT.precision, bufT.scale),
                  bufT.precision)
                vecs(d.off + 1).putBoolean(r, !c.set) // isEmpty
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
          // the map-side (Partial) aggregate: 1-2 supported grouping
          // attributes (strings admitted as keys — the q01 shape),
          // whitelisted aggregate functions, and the pass-through
          // partial output layout (grouping attrs + each aggregate's
          // buffer attrs positionally; decimal sums span two)
          case a: HashAggregateExec
              if a.groupingExpressions.nonEmpty &&
                a.groupingExpressions.size <= 2 &&
                a.groupingExpressions.forall(g =>
                  g.isInstanceOf[AttributeReference] &&
                    Columnar.supportedGroupType(g.dataType)) &&
                a.aggregateExpressions.nonEmpty &&
                a.aggregateExpressions.forall(Columnar.supportedAgg) &&
                a.output.size == a.groupingExpressions.size +
                  a.aggregateExpressions.map(Columnar.bufferWidth).sum &&
                a.groupingExpressions.zipWithIndex.forall { case (g, i) =>
                  a.output(i).exprId ==
                    g.asInstanceOf[AttributeReference].exprId
                } =>
            GraftColumnarPartialAggExec(
              a.groupingExpressions
                .map(_.asInstanceOf[AttributeReference]),
              a.aggregateExpressions, a.output, a.child)
        }
    }
}
