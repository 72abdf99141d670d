package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe a PER-ROW serialized bloom bitset against a small constant key
  * set: true iff any key MIGHT be in the row's filter. The dual of
  * [[BloomMightContain]] (plan-constant filter, per-row key) — here the
  * filter varies per row and the keys are plan constants, which is the
  * shape of a file-manifest prune ([[graft.warehouse.DataSkipping
  * .selectFilesByKeys]]): one manifest row per data file, each carrying
  * that file's membership index, probed by the query's key list.
  *
  * Why this exists: without it the manifest prune would have to collect
  * every file's bitset to the driver (100 TB ≈ 100k files × ~0.9 MB ≈
  * 90 GB through the driver). Evaluating membership where the manifest
  * rows already live means only surviving file NAMES travel.
  *
  * CodegenFallback is deliberate: each eval deserializes the row's
  * bitset, which dominates by orders of magnitude; the manifest has
  * #files rows (not #data rows), so this never sits on a data hot path
  * and a codegen'd wrapper would buy nothing.
  */
case class BloomContainsAny(child: Expression, keys: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  // Seq (value equality), not Array (referential): two semantically
  // identical probes must compare equal under canonicalization /
  // semanticEquals, or subexpression elimination and plan-cache reuse
  // silently never fire for this expression.
  @transient private lazy val keyArr: Array[Long] = keys.toArray

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains_any expects a BINARY serialized bloom, got " +
        child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any = {
    val bloom = BloomFilter.readFrom(
      new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
    var i = 0
    while (i < keyArr.length) {
      if (bloom.mightContainLong(keyArr(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsAny =
    copy(child = newChild)
}
