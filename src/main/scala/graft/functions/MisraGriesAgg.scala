package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native mergeable aggregate.
  *
  * The frequency sibling of [[TopKAgg]]: a bounded summary of at most
  * `k` (item, weight) counters with the classic guarantee that every
  * item whose true frequency exceeds n/k is present in the summary
  * (weights may undercount by at most n/k, never overcount). Summaries
  * MERGE with the same guarantee (the mergeable-summaries construction:
  * sum counters, then subtract the (k+1)-th largest weight and drop
  * non-positives), which is exactly what `TypedImperativeAggregate`
  * needs: each map task keeps O(k) state, the shuffle carries k
  * counters per group — never the token stream — and the combine is
  * associative. That is the 100 TB shape for "what are the frequent
  * items": the full groupBy-count alternative shuffles EVERY distinct
  * item; this shuffles k rows and leaves only an output-proportional
  * exact-verify pass over the candidate set (see the `heavy_hitters`
  * pipeline query).
  *
  * Returns the candidate ITEMS sorted lexicographically (weights are
  * deliberately not returned: MG weights are stream-order-dependent
  * lower bounds; the deterministic, engine-reproducible numbers come
  * from the exact verify join the caller runs over these candidates).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(
      buf.items.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = buf.entries
    var size = 4
    val enc = entries.map { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8); (b, c)
    }
    enc.foreach { case (b, _) => size += 4 + b.length + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(enc.length)
    enc.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      val c = bb.getLong
      buf.addCounter(new String(sb, StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

/** At most k (item, weight) counters with MG update and mergeable
  * combine. Weights are lower bounds on true frequency with error
  * ≤ n/k; any item with true frequency > n/k is guaranteed present.
  */
final class MGBuffer(k: Int) {
  private val counters = mutable.HashMap.empty[String, Long]

  /** MG update: increment if tracked or space free; otherwise decrement
    * every counter by the new item's weight share (batch decrement by
    * the smallest amount that frees a slot — equivalent to repeated
    * unit decrements, O(k) amortized). */
  def add(item: String, w: Long): Unit = {
    val cur = counters.getOrElse(item, -1L)
    if (cur >= 0) counters.update(item, cur + w)
    else if (counters.size < k) counters.update(item, w)
    else {
      // decrement all by min(w, current minimum that zeroes a slot):
      // repeat until either w is absorbed or a slot frees up
      var rem = w
      while (rem > 0 && !counters.contains(item) && counters.size >= k) {
        val dec = math.min(rem, counters.valuesIterator.min)
        var freed = false
        counters.filterInPlace((_, c) => c > dec)
        // entries equal to dec were dropped; strictly larger ones shrink
        counters.mapValuesInPlace((_, c) => c - dec)
        freed = counters.size < k
        rem -= dec
        if (freed && rem > 0) counters.update(item, rem)
      }
    }
  }

  /** Merge: sum counters; if over k, subtract the (k+1)-th largest
    * weight from all and drop non-positives (Agarwal et al., mergeable
    * summaries — preserves the n/k guarantee of the COMBINED stream). */
  def mergeFrom(other: MGBuffer): Unit = {
    other.counters.foreach { case (s, c) =>
      counters.update(s, counters.getOrElse(s, 0L) + c)
    }
    if (counters.size > k) {
      val ws = counters.values.toArray
      java.util.Arrays.sort(ws)
      val cut = ws(ws.length - k - 1) // (k+1)-th largest
      counters.filterInPlace((_, c) => c > cut)
      counters.mapValuesInPlace((_, c) => c - cut)
    }
  }

  /** Restore a serialized counter verbatim (deserialization only). */
  def addCounter(item: String, c: Long): Unit = counters.update(item, c)

  def items: Array[String] = counters.keysIterator.toArray
  def entries: Array[(String, Long)] = counters.iterator.toArray
}
