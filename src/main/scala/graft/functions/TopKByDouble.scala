package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Reducing top-k aggregate: keep the k largest (key: double, value:
  * long) pairs, ordered by (key DESC, value ASC).
  *
  * This is the aggregate the batch-ANN path wants at 100 TB: a
  * `collect_list` partial GATHERS every candidate (the exchange carries
  * |bucket| rows per query); this heap partial REDUCES — each map task
  * ships at most k pairs per group, so the shuffle volume is
  * k·|groups| regardless of bucket sizes. Plans as ObjectHashAggregate
  * with a partial merge, like the built-in percentile sketches.
  *
  * Semantics pinned for cross-engine parity:
  *  - NULL keys and NULL values are skipped (SQL aggregate convention;
  *    the callers exclude incomparable sims explicitly anyway);
  *  - -0.0 keys are normalized to 0.0 on insert — Spark SQL's double
  *    ordering (and DuckDB's ORDER BY) treat them as equal, while a raw
  *    java.lang.Double.compare would rank -0.0 below 0.0;
  *  - ties on the key resolve to the SMALLEST value (deterministic).
  *
  * Result: `array<struct<key: double, value: long>>` sorted
  * (key DESC, value ASC), length ≤ k.
  */
case class TopKByDouble(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByDouble.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(key, value)

  // plan-time type errors instead of executor ClassCastExceptions
  // (AbstractDataType is private[sql], so ExpectsInputTypes is not
  // implementable here — same pattern as the other graft kernels)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == DoubleType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by expects (double, bigint), got " +
        s"(${key.dataType.simpleString}, ${value.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByDouble.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKByDouble.Heap = new TopKByDouble.Heap(k)

  override def update(buf: TopKByDouble.Heap, input: InternalRow): TopKByDouble.Heap = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null) {
      var d = kv.asInstanceOf[Double]
      if (d == 0.0) d = 0.0 // normalize -0.0
      // NaN keys are incomparable: `worse()` returns false against
      // everything, so a NaN that slipped in under capacity could never
      // be evicted — skip them like nulls
      if (!d.isNaN) buf.insert(d, vv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKByDouble.Heap, other: TopKByDouble.Heap): TopKByDouble.Heap = {
    other.foreach((d, v) => buf.insert(d, v))
    buf
  }

  override def eval(buf: TopKByDouble.Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (d, v) =>
      InternalRow(d, v)
    }: Array[Any])
  }

  override def serialize(buf: TopKByDouble.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { (d, v) => bb.putDouble(d); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByDouble.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new TopKByDouble.Heap(k)
    var i = 0
    while (i < n) { heap.insert(bb.getDouble, bb.getLong); i += 1 }
    heap
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))

  override def withNewMutableAggBufferOffset(offset: Int): TopKByDouble =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByDouble =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_topk_by"
}

object TopKByDouble {
  val entryType: StructType = StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** Bounded min-root heap over (key ASC, value DESC): the root is the
    * WORST kept pair, evicted when a better pair arrives at capacity.
    * "better" = larger key, or equal key with smaller value. */
  final class Heap(k: Int) {
    private var keys = new Array[Double](math.min(k, 16))
    private var vals = new Array[Long](math.min(k, 16))
    private var n = 0

    def size: Int = n

    // true when (d1, v1) ranks WORSE than (d2, v2) in the kept order
    private def worse(d1: Double, v1: Long, d2: Double, v2: Long): Boolean =
      d1 < d2 || (d1 == d2 && v1 > v2)

    def insert(d: Double, v: Long): Unit = {
      if (n < k) {
        if (n == keys.length) {
          keys = java.util.Arrays.copyOf(keys, math.min(k, keys.length * 2))
          vals = java.util.Arrays.copyOf(vals, math.min(k, vals.length * 2))
        }
        keys(n) = d; vals(n) = v; n += 1; siftUp(n - 1)
      } else if (worse(keys(0), vals(0), d, v)) {
        keys(0) = d; vals(0) = v; siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(keys(i), vals(i), keys(p), vals(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(keys(l), vals(l), keys(w), vals(w))) w = l
        if (r < n && worse(keys(r), vals(r), keys(w), vals(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val dk = keys(i); keys(i) = keys(j); keys(j) = dk
      val dv = vals(i); vals(i) = vals(j); vals(j) = dv
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), vals(i)); i += 1 }
    }

    /** Kept pairs ordered (key DESC, value ASC). */
    def sortedDesc: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (keys(i), vals(i)); i += 1 }
      out.sortBy { case (d, v) => (-d, v) }
    }
  }
}
