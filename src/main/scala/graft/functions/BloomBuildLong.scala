package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter BUILD aggregate over BIGINT keys: one serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (public Spark sketch
  * API) per group — the per-file membership index of
  * [[graft.warehouse.DataSkipping]].
  *
  * `df.stat.bloomFilter` builds ONE filter for a whole DataFrame on the
  * driver; a per-group aggregate is what a file-level skipping index
  * needs (`groupBy(input_file_name())`), and as a
  * TypedImperativeAggregate it REDUCES map-side: each task ships one
  * fixed-size bitset per group across the exchange, never the keys.
  * Bitset size is set by (`expectedItems`, `fpp`) at plan time, so
  * partial buffers are structurally identical and merge by OR — the
  * result is independent of row order and partitioning (bit-for-bit
  * deterministic output, which lets the manifest itself be hash-tested).
  *
  * Key contract matches [[BloomMightContain]]: LONG keys, callers
  * canonicalize build and probe through the SAME expression (mixed type
  * families hash differently and silently drop every match — see
  * BloomJoin). Null keys are skipped (SQL aggregate convention): a null
  * never matches an equality probe, so it has no business in the index.
  */
case class BloomBuildLong(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "graft_bloom_build: expectedItems must be > 0")
  require(fpp > 0.0 && fpp < 1.0, "graft_bloom_build: fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build expects a BIGINT key, got " +
        child.dataType.catalogString)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildLong =
    copy(child = newChildren.head)
}
