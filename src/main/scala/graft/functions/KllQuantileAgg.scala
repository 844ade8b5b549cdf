package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style quantile sketch as a native mergeable aggregate — the
  * rank/quantile member of the sketch family ([[MisraGriesAgg]] =
  * frequent items, [[CountMinAgg]] = point frequencies, HLL = distinct
  * counts): a bounded summary from which any quantile can be estimated
  * with small RANK error, whose partial states merge associatively —
  * the 100 TB alternative to the exact-quantile global sort, and the
  * mergeable twin of `percentile_approx` with an explicitly testable
  * error contract.
  *
  * Structure (Karnin–Lang–Liberty simplified to equal capacities): a
  * stack of compactors; level h holds items of weight 2^h. A full
  * level sorts and promotes every other item to level h+1 (its weight
  * doubles), discarding the rest. This implementation flips the
  * starting PARITY deterministically per compaction (the classic
  * derandomization) so the sketch is identical on every executor and
  * across retries — determinism the repo's correctness protocol
  * requires and the random-parity original cannot give. Each
  * compaction of level h displaces any fixed rank by at most 2^h, and
  * level h compacts at most n/(k·2^h) times before everything above
  * absorbs it, so worst-case rank error is bounded by
  * Σ_h 2^h·n/(k·2^h) = n·L/k with L = #levels ≈ log₂(n/k) — the
  * deterministic O(n·log(n/k)/k) bound (the randomized variant's
  * tighter O(n/k) expected error also holds in practice; the
  * `kll_counts` gate asserts the DETERMINISTIC bound, which is the
  * one this derandomized sketch guarantees).
  *
  * Merge concatenates per-level buffers and re-compacts overfull
  * levels — associative up to compaction order, and compaction order
  * only affects WHICH bounded-error summary results, never the error
  * bound itself; the gate therefore tests the bound, not a bitwise
  * layout (unlike [[CountMinAgg]], whose merge is exactly
  * commutative addition).
  *
  * eval returns the flattened summary as (value, weight) pairs —
  * `array<double>` of 2·m entries [v₀,w₀,v₁,w₁,…] sorted by value —
  * from which rank/quantile estimation is plain column arithmetic
  * (see `kllQuantile` in [[graft.functions]]).
  */
case class KllQuantileAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8 && k <= 65536, s"kll: k must be in [8, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a double argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KllBuffer): Any = {
    val pairs = buf.summary // sorted by value, (value, weight)
    val out = new Array[Any](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      out(2 * i) = pairs(i)._1
      out(2 * i + 1) = pairs(i)._2.toDouble
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val levels = buf.levels
    var size = 4 + levels.length * 4
    levels.foreach(l => size += l.length * 8)
    val bb = ByteBuffer.allocate(size)
    bb.putInt(levels.length)
    levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val buf = new KllBuffer(k)
    var h = 0
    while (h < nLevels) {
      val len = bb.getInt
      val arr = new Array[Double](len)
      var i = 0
      while (i < len) { arr(i) = bb.getDouble; i += 1 }
      buf.restoreLevel(h, arr)
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_quantile"
}

/** Compactor stack: level h holds weight-2^h items, capacity `k` each.
  * Deterministic alternating compaction parity (per-level counter).
  */
final class KllBuffer(k: Int) {
  private val lvls = ArrayBuffer(ArrayBuffer.empty[Double])
  private var parity = 0L // global compaction counter → start parity

  def add(v: Double): Unit = {
    lvls(0) += v
    if (lvls(0).length >= k) compact(0)
  }

  private def compact(h: Int): Unit = {
    val l = lvls(h)
    val sorted = l.toArray
    java.util.Arrays.sort(sorted)
    if (lvls.length == h + 1) lvls += ArrayBuffer.empty[Double]
    l.clear()
    // Mass conservation: only an EVEN count may compact (each promoted
    // item doubles its weight to stand for a discarded sibling). An
    // odd level keeps its smallest item behind at the same level.
    var lo = 0
    if (sorted.length % 2 == 1) { l += sorted(0); lo = 1 }
    val start = lo + (parity & 1L).toInt
    parity += 1
    var i = start
    val up = lvls(h + 1)
    while (i < sorted.length) { up += sorted(i); i += 2 }
    if (up.length >= k) compact(h + 1)
  }

  def mergeFrom(other: KllBuffer): Unit = {
    var h = 0
    while (h < other.lvls.length) {
      if (lvls.length == h) lvls += ArrayBuffer.empty[Double]
      lvls(h) ++= other.lvls(h)
      h += 1
    }
    // re-compact bottom-up so promotions cascade correctly
    h = 0
    while (h < lvls.length) {
      if (lvls(h).length >= k) compact(h)
      h += 1
    }
    parity += other.parity // keep the counter deterministic under merge
  }

  /** (value, weight) pairs sorted by value, weights 2^level. */
  def summary: Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < lvls.length) {
      val w = 1L << h
      lvls(h).foreach(v => out += ((v, w)))
      h += 1
    }
    out.sortBy(_._1).toArray
  }

  def levels: Array[Array[Double]] = lvls.map(_.toArray).toArray
  def restoreLevel(h: Int, items: Array[Double]): Unit = {
    while (lvls.length <= h) lvls += ArrayBuffer.empty[Double]
    lvls(h) ++= items
  }
  // state round-trips (streaming ST11) must also carry the compaction
  // counter, or a restored sketch would restart the derandomized
  // parity alternation and diverge from an uninterrupted run
  private[graft] def parityCounter: Long = parity
  private[graft] def restoreParity(p: Long): Unit = parity = p
}
