package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch as a native mergeable aggregate (Cormode &
  * Muthukrishnan) — the point-frequency sibling of [[MisraGriesAgg]]:
  * where MG answers "which items are frequent", CMS answers "roughly
  * how often did THIS item occur" for any item, from d·w counters of
  * fixed size. `est(x) = min_r counters[r][h_r(x)]` never undercounts
  * and overcounts by ≤ ⌈e/w·N⌉ with probability ≥ 1−e^{−d} per query.
  *
  * The merge is elementwise counter ADDITION — exactly associative and
  * commutative, so each map task keeps one d×w array, the shuffle
  * carries d·w longs per group (never the item stream), and partial
  * states stored per daily partition roll up by pure addition: the same
  * incremental-sketch algebra as the HLL rollup (SURVEY §2 A11), for
  * counts instead of cardinalities.
  *
  * Row hashes are MurmurHash3 over the item's UTF-8 bytes with seed =
  * row index — pure JVM arithmetic, identical on every executor and
  * across restarts, so the sketch is deterministic for a given input
  * MULTISET (counter layout is partitioning-independent because
  * addition commutes). Returns the flattened counters
  * (row r, column c at index r·w + c) as array<bigint>; point estimates
  * are then plain `element_at`/`least` column arithmetic — see
  * `cmsPointEstimate` in [[graft.functions]].
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, s"count_min: depth must be in [1,16], got $depth")
  require(width > 0 && width <= (1 << 20), s"count_min: width must be in [1,2^20], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinAgg.bucket(s, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  /** Row-r bucket of `item`: MurmurHash3 over UTF-8 bytes, seed = r.
    * Pure JVM arithmetic — the same function computes probe indices
    * driver-side (a probe item is a literal, so its d indices fold to
    * literal ints in the plan; no hash evaluation at query time). */
  def bucket(item: String, r: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(
      item.getBytes(java.nio.charset.StandardCharsets.UTF_8), r)
    java.lang.Math.floorMod(h, width)
  }
}
