package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built, task-shared
  * [[org.apache.spark.util.sketch.BloomFilter]] (public Spark sketch
  * API) — the map-side prefilter of [[graft.warehouse.BloomJoin]].
  *
  * Why a custom Expression: the probe must run INSIDE whole-stage
  * codegen on the fact-table scan, before the join exchange — a Scala
  * UDF there would box every key and break the codegen span that the
  * scan, filter and partial aggregates share. The filter object is
  * deserialized once per executor (lazy, from the serialized sketch
  * bytes carried by the plan) and referenced directly from generated
  * code via `addReferenceObj`.
  *
  * Key contract: LONG keys (callers hash or cast — see BloomJoin, which
  * builds the sketch over exactly the same canonical long expression it
  * probes with, so build and probe hashing always agree). Null key ⇒
  * null (ANSI-friendly), which a Filter treats as drop — identical to
  * the semi/inner-join semantics this prefilter fronts.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a BIGINT key, got " +
        child.dataType.catalogString)

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
