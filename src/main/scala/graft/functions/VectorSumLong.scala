package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate over integer arrays: one
  * `array<bigint>` of per-dimension sums per group.
  *
  * This is the centroid reducer at 100 TB: the explode-then-groupBy
  * formulation multiplies the shuffle by the vector dimensionality
  * (rows × dims key-value pairs cross the exchange); this aggregate
  * REDUCES map-side — each task ships ONE array per (partition, group),
  * so the exchange carries |groups| arrays regardless of row count.
  * Integer sums are associative and order-independent, which is what
  * keeps quantized centroids deterministic under any partitioning
  * (see [[graft.ext.Embeddings.groupCentroids]]).
  *
  * Semantics:
  *  - null arrays are skipped (SQL aggregate convention);
  *  - null ELEMENTS add 0 (quantized vectors don't produce them; a
  *    null-poisoned input should be filtered upstream);
  *  - inconsistent dimensions in one group throw — a silent truncation
  *    or resize would corrupt every centroid downstream.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumLong.Buf] {

  override def children: Seq[Expression] = Seq(child)

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType | ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum expects an integral array, got ${other.catalogString}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): VectorSumLong.Buf =
    new VectorSumLong.Buf(null)

  override def update(buf: VectorSumLong.Buf, input: InternalRow): VectorSumLong.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](n)
      require(buf.sums.length == n,
        s"graft_vecsum: inconsistent vector dimensions in one group " +
          s"(${buf.sums.length} vs $n)")
      // type dispatch hoisted out of the per-element loop
      val get: Int => Long = elemType match {
        case IntegerType => i => arr.getInt(i).toLong
        case LongType    => i => arr.getLong(i)
        case ShortType   => i => arr.getShort(i).toLong
        case _           => i => arr.getByte(i).toLong
      }
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf.sums(i) += get(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VectorSumLong.Buf, other: VectorSumLong.Buf): VectorSumLong.Buf = {
    if (other.sums == null) return buf
    if (buf.sums == null) { buf.sums = other.sums; return buf }
    require(buf.sums.length == other.sums.length,
      s"graft_vecsum: inconsistent vector dimensions across partitions " +
        s"(${buf.sums.length} vs ${other.sums.length})")
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    buf
  }

  override def eval(buf: VectorSumLong.Buf): Any =
    if (buf.sums == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(buf.sums) // primitive ctor — no boxing

  override def serialize(buf: VectorSumLong.Buf): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    if (n > 0) buf.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumLong.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) new VectorSumLong.Buf(null)
    else {
      val sums = new Array[Long](n)
      var i = 0
      while (i < n) { sums(i) = bb.getLong; i += 1 }
      new VectorSumLong.Buf(sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumLong =
    copy(child = newChildren.head)
}

object VectorSumLong {
  /** Mutable aggregation buffer: null until the first array fixes the
    * dimensionality. */
  final class Buf(var sums: Array[Long])
}
