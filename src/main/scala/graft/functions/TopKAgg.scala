package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k / bottom-k aggregate — the one aggregate in the
  * reference's AggType list Spark has no public equivalent for
  * (kTopK, reference: omniscidb/IR/OpTypeEnums.h:88 and
  * python/pyhdk/hdk.py:301 `top_k` / :328 `bottom_k`).
  *
  * Implemented as a native Catalyst `TypedImperativeAggregate` (not a
  * UDAF) so it partial-aggregates: each map task keeps a bounded k-size
  * heap, shuffling k values per group, never the whole group. That is
  * what keeps it viable at 100 TB — memory and shuffle are O(k), not
  * O(rows).
  *
  * Returns the k largest (ascending=false) or smallest (ascending=true)
  * child values as a sorted array. Nulls are ignored (matches HDK agg
  * skip-null semantics).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** Values widen to double (documented; longs above 2^53 lose
    * precision like any double pipeline). Non-numeric children are
    * rejected at ANALYSIS time — without this check, SQL like
    * `topk(string_col, k)` passed the type-checker and blew up (or
    * silently "worked") at execution. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${prettyName} requires a numeric argument (widened to double), " +
            s"got ${other.catalogString}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => throw new IllegalStateException(
        s"topk: non-numeric input ${other.getClass.getName} survived analysis")
    })
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sorted)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val vs = buf.values
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, ascending)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = if (ascending) "bottomk" else "topk"
}

/** Bounded binary heap of the k best values seen so far. For top-k the
  * heap root is the current minimum (evict root when a bigger value
  * arrives); for bottom-k, comparisons flip.
  */
final class TopKBuffer(k: Int, ascending: Boolean) {
  private val heap = new Array[Double](k)
  private var n = 0

  // "worse" = should be evicted first (heap root).
  @inline private def worse(a: Double, b: Double): Boolean =
    if (ascending) a > b else a < b

  def insert(v: Double): Unit = {
    if (n < k) {
      heap(n) = v; n += 1
      var i = n - 1
      while (i > 0 && worse(heap(i), heap((i - 1) / 2))) {
        val p = (i - 1) / 2
        val tmp = heap(i); heap(i) = heap(p); heap(p) = tmp
        i = p
      }
    } else if (worse(heap(0), v)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && worse(heap(l), heap(m))) m = l
        if (r < n && worse(heap(r), heap(m))) m = r
        if (m == i) done = true
        else {
          val tmp = heap(i); heap(i) = heap(m); heap(m) = tmp
          i = m
        }
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.heap(i)); i += 1 }
  }

  def values: Array[Double] = java.util.Arrays.copyOf(heap, n)

  /** Best-first: descending for top-k, ascending for bottom-k. */
  def sorted: Array[Double] = {
    val out = values
    java.util.Arrays.sort(out)
    if (!ascending) {
      var i = 0; var j = out.length - 1
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    }
    out
  }
}
