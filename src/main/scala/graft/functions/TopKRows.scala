package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Reducing top-k-rows aggregate: keep the k best whole rows per group,
  * ranked by a struct key in natural (field-by-field) order — ascending
  * when `asc`, else descending.
  *
  * This is the generalization of `max_by(struct(*), key)` (k = 1) that
  * `RewriteLatestPerKey` targets for the `row_number() <= k` idiom: a
  * bounded heap partial REDUCES each map task's share to ≤ k rows per
  * group before the exchange, where the window formulation shuffles and
  * sorts every input row (and Spark's own WindowGroupLimit still sorts
  * and still ships k rows per group per input partition through a Window
  * operator). Plans as ObjectHashAggregate with partial merge, like the
  * built-in percentile sketches. Heap ops are O(log k) per row with no
  * sort of the input.
  *
  * Ties rank arbitrarily, exactly as the window formulation's
  * nondeterministic tie order. Result: `array<struct<row>>`, best first,
  * length ≤ k — callers posexplode to recover rows (+ ranks 1..n).
  */
case class TopKRows(
    row: Expression,
    key: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(row, key)

  override def checkInputDataTypes(): TypeCheckResult = (row.dataType, key.dataType) match {
    case (_: StructType, kt: StructType) if RowOrdering.isOrderable(kt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_rows expects (struct, orderable struct), got " +
        s"(${row.dataType.simpleString}, ${key.dataType.simpleString})")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(row.dataType, containsNull = false)

  private def keyType: StructType = key.dataType.asInstanceOf[StructType]
  private def rowType: StructType = row.dataType.asInstanceOf[StructType]

  // executor-side lazies (rebuilt after serialization)
  @transient private lazy val keyOrd: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(keyType.map(_.dataType))
  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](keyType, rowType))

  override def createAggregationBuffer(): TopKRows.Heap =
    new TopKRows.Heap(k, keyOrd, asc)

  override def update(buf: TopKRows.Heap, input: InternalRow): TopKRows.Heap = {
    // CreateStruct never evals to null; a null child row (e.g. under an
    // outer join) is skipped like max_by skips null keys
    val kv = key.eval(input)
    val rv = row.eval(input)
    if (kv != null && rv != null)
      buf.insert(kv.asInstanceOf[InternalRow].copy(), rv.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: TopKRows.Heap, other: TopKRows.Heap): TopKRows.Heap = {
    other.foreach((kr, rr) => buf.insert(kr, rr))
    buf
  }

  override def eval(buf: TopKRows.Heap): Any =
    new GenericArrayData(buf.sortedBest.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKRows.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (kr, rr) =>
      val bytes = serProj(InternalRow(kr, rr)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new TopKRows.Heap(k, keyOrd, asc)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val slice = new Array[Byte](len)
      bb.get(slice)
      val ur = new UnsafeRow(2)
      ur.pointTo(slice, len)
      heap.insert(ur.getStruct(0, keyType.length).copy(), ur.getStruct(1, rowType.length).copy())
      i += 1
    }
    heap
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(row = newChildren(0), key = newChildren(1))

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_topk_rows"
}

object TopKRows {

  /** Bounded binary heap with the WORST kept entry at the root (evicted
    * when a better one arrives at capacity). "Better" = smaller key when
    * `asc` (min-k), larger when not (top-k). */
  final class Heap(k: Int, ord: Ordering[InternalRow], asc: Boolean) {
    private var keys = new Array[InternalRow](math.min(k, 16))
    private var rows = new Array[InternalRow](math.min(k, 16))
    private var n = 0

    def size: Int = n

    // true when a ranks WORSE than b in the kept order
    private def worse(a: InternalRow, b: InternalRow): Boolean = {
      val c = ord.compare(a, b)
      if (asc) c > 0 else c < 0
    }

    def insert(kr: InternalRow, rr: InternalRow): Unit = {
      if (n < k) {
        if (n == keys.length) {
          keys = java.util.Arrays.copyOf(keys, math.min(k, keys.length * 2))
          rows = java.util.Arrays.copyOf(rows, math.min(k, rows.length * 2))
        }
        keys(n) = kr; rows(n) = rr; n += 1; siftUp(n - 1)
      } else if (worse(keys(0), kr)) {
        keys(0) = kr; rows(0) = rr; siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(keys(i), keys(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worse(keys(l), keys(w))) w = l
        if (r < n && worse(keys(r), keys(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tr = rows(i); rows(i) = rows(j); rows(j) = tr
    }

    def foreach(f: (InternalRow, InternalRow) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), rows(i)); i += 1 }
    }

    /** Kept rows, best first. */
    def sortedBest: Array[InternalRow] = {
      val idx = Array.range(0, n).sortWith { (i, j) =>
        val c = ord.compare(keys(i), keys(j))
        if (asc) c < 0 else c > 0
      }
      idx.map(rows)
    }
  }
}
