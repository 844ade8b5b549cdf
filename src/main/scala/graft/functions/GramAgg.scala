package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact centered-Gram accumulator for the PCA family (SURVEY.md §2
  * P29/P29b/P29c) — the d²-state partial-outer-product aggregate the
  * r12 verdict asked for. Input: one row per VECTOR, the centered
  * coordinates as `array<bigint>` in micro-units (value · 10⁶ — the
  * exact DECIMAL(18,6) grid the PCA contract quantizes to). Each map
  * task accumulates Σ c·cᵀ over its partition into one upper-triangle
  * buffer of 128-bit integers (hi/lo long pairs: a micro-unit product
  * is ≤ 10¹⁶ and 10¹² such rows overflow a long, so partial sums carry
  * exact twos-complement 128-bit), the shuffle moves partitions ·
  * d(d+1)/2 cells — never N·d element rows, never the N·d² self-join
  * stream — and merge is elementwise 128-bit addition: exactly
  * associative and commutative, so the result is partitioning-
  * independent and bit-identical to the old cent⨝cent plan's
  * `sum(a.c * b.c)` in DECIMAL(38,12) (both are THE exact integer sum
  * scaled by 10⁻¹²).
  *
  * Output: `array<decimal(38,12)>` of length d(d+1)/2, the upper
  * triangle packed row-major (cell (i,j), i ≤ j, at index
  * i·d − i(i−1)/2 + (j−i)); the caller mirrors into the symmetric
  * d×d Gram. At production d (768+) the buffer is ~4.7 MB per task —
  * the price of exactness, and still partitions·d² total shuffle vs
  * the old plan's N·d shuffle + N·d² streamed products. */
case class GramAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0 && d <= 4096, s"gram: d must be in [1,4096], got $d")

  private val nCells = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> micro-unit coordinates, " +
            s"got ${other.catalogString}")
    }

  // layout: [hi(0), lo(0), hi(1), lo(1), ...] per packed upper-tri cell
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * nCells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != d)
        throw new IllegalArgumentException(
          s"gram: expected a $d-dim vector, got ${arr.numElements()} " +
            "elements - pass dim explicitly or fix the corpus")
      // fail-loud contract: a null coordinate must not silently read
      // as 0 and contribute a zero centered value to the "exact" Gram
      // (accepted input is array<bigint> with containsNull unknown —
      // transform() outputs carry containsNull=true even when clean)
      var k = 0
      while (k < d) {
        if (arr.isNullAt(k))
          throw new IllegalArgumentException(
            s"gram: null coordinate at index $k - the exact Gram " +
              "cannot impute; filter or fill the vector upstream")
        k += 1
      }
      var i = 0
      var cell = 0
      while (i < d) {
        val ci = arr.getLong(i)
        if (ci == 0L) cell += d - i // row of zero products - skip
        else {
          var j = i
          while (j < d) {
            val cj = arr.getLong(j)
            val lo = ci * cj
            val hi = java.lang.Math.multiplyHigh(ci, cj)
            val idx = 2 * cell
            val accLo = buf(idx + 1)
            val newLo = accLo + lo
            buf(idx + 1) = newLo
            buf(idx) += hi +
              (if (java.lang.Long.compareUnsigned(newLo, accLo) < 0) 1L
               else 0L)
            j += 1
            cell += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var c = 0
    while (c < nCells) {
      val idx = 2 * c
      val accLo = buf(idx + 1)
      val newLo = accLo + other(idx + 1)
      buf(idx + 1) = newLo
      buf(idx) += other(idx) +
        (if (java.lang.Long.compareUnsigned(newLo, accLo) < 0) 1L else 0L)
      c += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](nCells)
    var c = 0
    while (c < nCells) {
      val hi = buf(2 * c)
      val lo = buf(2 * c + 1)
      val big = BigInteger.valueOf(hi).shiftLeft(64)
        .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
      val dec = Decimal(new java.math.BigDecimal(big, 12))
      if (!dec.changePrecision(38, 12))
        throw new ArithmeticException(
          "gram: cell overflowed DECIMAL(38,12) - corpus too large for " +
            "the exact-decimal PCA contract")
      out(c) = dec
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * nCells)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "gram"
}
