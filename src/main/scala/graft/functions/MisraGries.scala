package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries / Space-Saving heavy-hitters aggregate [Misra & Gries
  * '82; mergeable form per Agarwal et al. PODS'12]: at most `capacity`
  * (key, counter) pairs of state no matter how many rows or distinct
  * keys flow through — the bounded-memory counterpart of
  * `groupBy(key).count().orderBy(desc)` for the 100 TB "what dominates
  * this column?" question, where the exact aggregate shuffles every
  * distinct key and a `collect_list` partial gathers every row.
  *
  * Contracts (spec-pinned in SketchSpec):
  *  - NEVER overcounts: est(key) ≤ true(key);
  *  - undercounts by at most N/(capacity+1) summed over all merge
  *    steps, so every key with true frequency > N/(capacity+1) is
  *    guaranteed present (the classic heavy-hitter guarantee);
  *  - with capacity ≥ |distinct keys| no decrement ever fires, so the
  *    summary is EXACT and order/partitioning-independent — the
  *    matched-parameter regime the x-query oracle checks cross-engine.
  *
  * Per-partition updates run the textbook algorithm (hit: +1; room:
  * insert 1; full: decrement all, drop zeros — O(capacity) only on
  * eviction). Merge sums both maps, then if over capacity subtracts
  * the (capacity+1)-th largest counter from all and drops non-positive
  * ones — the PODS'12 mergeable-summaries reduction that preserves
  * both bounds. Plans as ObjectHashAggregate with a partial merge, so
  * each map task ships ≤ capacity pairs per group.
  *
  * Result: `array<struct<key string, cnt bigint>>` sorted
  * (cnt DESC, key ASC), length ≤ capacity.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects a string column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGries.entryType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UnsafeRow-backed UTF8String
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // decrement-all: the new key and one unit of every counter
          // annihilate; ≤ N/(capacity+1) such units ever fire
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything;
      // ties broken by key so the survivor set is deterministic for a
      // given pair of inputs
      val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
      val cut = sorted(capacity)._2
      buf.clear()
      // strictly-greater-than-cut survivors are all within the first
      // `capacity` sorted entries, so the result respects the bound
      sorted.foreach { case (k, c) => if (c > cut) buf.update(k, c - cut) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_heavy_hitters"
}

object MisraGries {
  val entryType: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
}
