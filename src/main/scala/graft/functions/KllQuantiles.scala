package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch [Karnin, Lang & Liberty FOCS'16;
  * simplified to uniform per-level capacity, as in the original MRL
  * line of work]: a level ladder where level i holds items of weight
  * 2^i; a full level sorts and keeps every other item (promoting the
  * survivors one level up), so state is O(k·log(n/k)) no matter how
  * many rows flow through — the mergeable counterpart of the GK sketch
  * (x79's exact-regime oracle), which cannot merge and therefore
  * cannot be a partial aggregate.
  *
  * Deterministic compaction: classical KLL flips a random coin per
  * compaction to pick the kept parity; this implementation derives the
  * parity from a per-buffer compaction counter instead (house rule: no
  * RNG state in operators). That trades the formal unbiasedness proof
  * for a weaker but honest guarantee: results are bit-reproducible in
  * the EXACT regime (n ≤ k — no compaction ever fires), and within the
  * O(n/k) rank-error band beyond it. They are NOT bit-reproducible
  * run-to-run past the exact regime: the partial-aggregate merge order
  * follows shuffle fetch order, which is nondeterministic even with
  * fixed partitioning, and both the compaction counter and the level
  * contents depend on it. The rank-error band is what SketchSpec pins
  * (randomized bound over shuffled/sorted/reversed inputs). Merge
  * concatenates level-wise and re-compacts overflowing levels
  * bottom-up, the PODS'12 mergeable-summaries shape; partial
  * aggregation exercises it on every multi-partition run.
  *
  * Contracts (spec-pinned):
  *  - EXACT regime: while no compaction has fired (n ≤ k), the sketch
  *    holds every value, and each requested quantile q returns the
  *    rank-⌈q·n⌉ smallest value exactly (min rank 1) — the regime the
  *    x-query oracle checks cross-engine, same trick as x79;
  *  - estimates are always actual input VALUES (never interpolated);
  *  - null inputs are skipped; an empty group yields null.
  *
  * `interpolate = true` switches the READ (never the sketch) to
  * `percentile`'s continuous convention — position `(n−1)·q` over the
  * weighted ranks, tie and integer-position short-circuits returning
  * the stored value, otherwise the identical IEEE expression
  * `(higher−position)·lowerVal + (position−lower)·higherVal` — so in
  * the exact regime the result is BIT-IDENTICAL to Spark's
  * `percentile` (and DuckDB's `quantile_cont`, the x28 parity), which
  * is what lets a bounded sketch replace an exact population-sized
  * percentile buffer without moving a single oracle (the rfm cutpoint
  * source). Beyond the exact regime it interpolates between two
  * RETAINED values, each within the rank-error band.
  *
  * Result: `array<double>`, one entry per requested quantile, in the
  * order the quantiles were given.
  */
case class KllQuantiles(
    child: Expression,
    k: Int,
    quantiles: Seq[Double],
    interpolate: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantiles.Buf] {

  require(k >= 8, s"k must be at least 8, got $k")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantiles expects a double column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllQuantiles.Buf =
    new KllQuantiles.Buf(k)

  override def update(buf: KllQuantiles.Buf, input: InternalRow): KllQuantiles.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllQuantiles.Buf, other: KllQuantiles.Buf): KllQuantiles.Buf = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllQuantiles.Buf): Any =
    if (buf.n == 0) null
    else new GenericArrayData(
      (if (interpolate) buf.quantilesCont(quantiles)
       else buf.quantiles(quantiles)).toArray[Any])

  override def serialize(buf: KllQuantiles.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllQuantiles.Buf =
    KllQuantiles.Buf.deserialize(k, bytes)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantiles =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String =
    if (interpolate) "graft_kll_quantiles_cont" else "graft_kll_quantiles"
}

/** The sketch-valued sibling of [[KllQuantiles]]: same buffer, same
  * merge, but `eval` returns the SERIALIZED sketch (binary) instead of
  * resolved quantiles — the persistable form for incremental stats
  * manifests (per-commit sketches folded later by
  * `Snapshots.quantileSketch`, the x88 KMV discipline for quantiles). */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantiles.Buf] {

  require(k >= 8, s"k must be at least 8, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_sketch expects a double column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllQuantiles.Buf =
    new KllQuantiles.Buf(k)

  override def update(buf: KllQuantiles.Buf, input: InternalRow): KllQuantiles.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllQuantiles.Buf, other: KllQuantiles.Buf): KllQuantiles.Buf = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllQuantiles.Buf): Any = buf.serialize()

  override def serialize(buf: KllQuantiles.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllQuantiles.Buf =
    KllQuantiles.Buf.deserialize(k, bytes)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(offset: Int): KllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketch =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_sketch"
}

/** DISTRIBUTED fold of serialized KLL sketches: aggregates a binary
  * sketch column (each row a [[KllSketch]] output) into one merged
  * serialized sketch — the level-concat merge law as a partial
  * aggregate, so persisted per-group/per-commit sketches re-merge with
  * a plain `groupBy.agg` instead of a driver-side collect. This is
  * what lets an incrementally-maintained MV carry a quantile state:
  * merge(existing sketch, delta sketch) == sketch(all rows) up to the
  * documented merge-order caveat (exact regime: bit-identical). */
case class KllMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantiles.Buf] {

  require(k >= 8, s"k must be at least 8, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge expects a binary sketch column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllQuantiles.Buf =
    new KllQuantiles.Buf(k)

  override def update(buf: KllQuantiles.Buf, input: InternalRow): KllQuantiles.Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(KllQuantiles.Buf.deserialize(k, v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllQuantiles.Buf, other: KllQuantiles.Buf): KllQuantiles.Buf = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllQuantiles.Buf): Any = buf.serialize()

  override def serialize(buf: KllQuantiles.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): KllQuantiles.Buf =
    KllQuantiles.Buf.deserialize(k, bytes)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(offset: Int): KllMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMerge =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_kll_merge"
}

/** Read-time quantile resolution from a SERIALIZED sketch — the scalar
  * complement of [[KllMerge]]: `(sketch binary) -> array<double>`, one
  * entry per requested quantile, null for an empty sketch. Presentation
  * only (runs once per MV/manifest row, never per fact row), so
  * CodegenFallback's per-eval deserialization is the right trade —
  * same reasoning as BloomContainsAny. */
case class KllValues(
    child: Expression,
    k: Int,
    quantiles: Seq[Double],
    interpolate: Boolean = false)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 8, s"k must be at least 8, got $k")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val buf = KllQuantiles.Buf.deserialize(k, input.asInstanceOf[Array[Byte]])
    if (buf.n == 0) null
    else new GenericArrayData(
      (if (interpolate) buf.quantilesCont(quantiles)
       else buf.quantiles(quantiles)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): KllValues =
    copy(child = newChild)

  override def prettyName: String =
    if (interpolate) "graft_kll_values_cont" else "graft_kll_values"
}

object KllQuantiles {

  /** The level ladder. Level i's items each represent 2^i inputs. */
  final class Buf(k: Int) {
    private[KllQuantiles] val levels =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    var n: Long = 0L
    private[KllQuantiles] var compactions: Long = 0L

    def insert(v: Double): Unit = {
      levels(0) += v
      n += 1
      if (levels(0).length > k) compact(0)
    }

    /** Sort the level, keep alternate items (parity from the
      * compaction counter — deterministic, see class doc), promote the
      * survivors: their weight doubles by moving one level up. */
    private def compact(l: Int): Unit = {
      if (l + 1 >= levels.length) levels += mutable.ArrayBuffer.empty[Double]
      val sorted = levels(l).sorted
      val parity = (compactions & 1L).toInt
      compactions += 1
      var i = parity
      while (i < sorted.length) { levels(l + 1) += sorted(i); i += 2 }
      levels(l).clear()
      if (levels(l + 1).length > k) compact(l + 1)
    }

    def mergeIn(other: Buf): Unit = {
      while (levels.length < other.levels.length)
        levels += mutable.ArrayBuffer.empty[Double]
      var l = 0
      while (l < other.levels.length) {
        levels(l) ++= other.levels(l)
        l += 1
      }
      n += other.n
      compactions += other.compactions
      l = 0
      while (l < levels.length) {
        if (levels(l).length > k) compact(l)
        l += 1
      }
    }

    /** Value-sorted (item, 2^level) pairs plus their cumulative
      * weights — the shared read-side frame of both quantile
      * conventions. */
    private def weightedSorted(): (Array[(Double, Long)], Array[Long]) = {
      val weighted = mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        levels(l).foreach(v => weighted += ((v, w)))
        l += 1
      }
      val sorted = weighted.sortBy(_._1).toArray
      val cum = new Array[Long](sorted.length)
      var acc = 0L
      var i = 0
      while (i < sorted.length) { acc += sorted(i)._2; cum(i) = acc; i += 1 }
      (sorted, cum)
    }

    /** First stored value whose cumulative weight reaches `target`
      * (1-based rank). */
    private def valueAtRank(sorted: Array[(Double, Long)],
                            cum: Array[Long], target: Long): Double = {
      var lo = 0
      var hi = sorted.length - 1
      while (lo < hi) { // first index with cum >= target
        val mid = (lo + hi) >>> 1
        if (cum(mid) >= target) hi = mid else lo = mid + 1
      }
      sorted(lo)._1
    }

    /** Weighted rank selection: value at cumulative weight ≥ ⌈q·n⌉
      * (min 1) over the value-sorted (item, 2^level) pairs. */
    def quantiles(qs: Seq[Double]): Seq[Double] = {
      val (sorted, cum) = weightedSorted()
      qs.map { q =>
        valueAtRank(sorted, cum, math.max(1L, math.ceil(q * n).toLong))
      }
    }

    /** `percentile`'s continuous convention over the weighted ranks —
      * the formula is REPLICATED from Spark's Percentile.getPercentile
      * term for term (position `(n−1)·q` 0-based; tie / integer-rank
      * short-circuits return the stored value; else
      * `(higher−position)·lowerVal + (position−lower)·higherVal`), so
      * in the exact regime (all weights 1, every value retained) the
      * result is bit-identical to exact `percentile` — SketchSpec pins
      * the equality on random tied integer populations.
      *
      * One narrow carve-out to that contract: the tie short-circuit
      * here compares the STORED DOUBLES (`higherVal == lowerVal`)
      * where Spark's `Percentile` compares the ORIGINAL typed keys.
      * For integer inputs of magnitude > 2^53, two DISTINCT long keys
      * can collapse to one double: Spark then interpolates
      * (`a·x + b·x`, which can differ from `x` by 1 ulp) while this
      * read returns `x`. Unreachable at cents/day/count magnitudes
      * (every oracle regime), and NOT fixable by dropping the
      * short-circuit — on genuinely equal keys Spark returns the
      * value directly, so always-interpolating would break parity in
      * the common tie case instead. */
    def quantilesCont(qs: Seq[Double]): Seq[Double] = {
      val (sorted, cum) = weightedSorted()
      qs.map { q =>
        val position = (n - 1) * q
        val lower = math.floor(position).toLong
        val higher = math.ceil(position).toLong
        val lowerVal = valueAtRank(sorted, cum, lower + 1)
        if (higher == lower) lowerVal
        else {
          val higherVal = valueAtRank(sorted, cum, higher + 1)
          if (higherVal == lowerVal) lowerVal
          else (higher - position) * lowerVal + (position - lower) * higherVal
        }
      }
    }

    def serialize(): Array[Byte] = {
      val size = 8 + 8 + 4 + levels.map(4 + _.length * 8).sum
      val bb = ByteBuffer.allocate(size)
      bb.putLong(n)
      bb.putLong(compactions)
      bb.putInt(levels.length)
      levels.foreach { lv =>
        bb.putInt(lv.length)
        lv.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Buf {
    def deserialize(k: Int, bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buf(k)
      buf.n = bb.getLong
      buf.compactions = bb.getLong
      val nLevels = bb.getInt
      while (buf.levels.length < nLevels)
        buf.levels += mutable.ArrayBuffer.empty[Double]
      var l = 0
      while (l < nLevels) {
        val sz = bb.getInt
        var i = 0
        while (i < sz) { buf.levels(l) += bb.getDouble; i += 1 }
        l += 1
      }
      buf
    }
  }
}
