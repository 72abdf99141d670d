package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused symmetric int8 quantization: `struct<scale: double,
  * q: array<int>>` in ONE pass over the input vector.
  *
  * Why a kernel (tenth): the composable formulation —
  * `array_max(transform(abs))` for the scale plus
  * `transform(floor(x/scale + 0.5) …)` for the elements — runs THREE
  * interpreted higher-order lambdas per row and allocates two
  * intermediate arrays; measured ~8.5 s for 200k×64-dim vectors on 8
  * cores. This expression reads the float32 elements directly,
  * computes max|x| and the quantized values in one tight loop, and is
  * invoked as a single compiled call from generated code.
  *
  * Numeric contract (bit-identical to the HOF formulation on finite,
  * null-free input — asserted in FunctionsSpec): element cast to
  * double, scale = max(max|x|, 1e-30) / 127.0, q_i =
  * clamp(floor(x_i / scale + 0.5), ±127) — floor-based round-half-up,
  * the portable rounding the DuckDB oracle reproduces.
  *
  * Null/non-finite contract: null array, null element, or non-finite
  * element (NaN OR ±Infinity — an infinite max|x| would emit
  * scale=Inf with all-zero q, junk that NaN-poisons every downstream
  * dequantization) ⇒ null struct. Poisoned vectors must not throw at
  * 100 TB; note the HOF formulation instead propagates per-element
  * nulls and NaN-poisons the scale — the kernel's whole-row null is
  * the saner behavior, and the fixtures contain neither.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8.outType
  override def nullable: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_int8 expects array<float>/array<double>, got " +
        other.catalogString)
  }

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8.quantize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.QuantizeInt8.quantize($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {

  val outType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Shared quantization core — the ONE copy of the validate/scale/
    * round arithmetic, consumed by both the struct-valued [[quantize]]
    * and the packed-byte [[QuantizeInt8Pack]]: their documented
    * value-level agreement (the x112 exact-regime bridge rests on it)
    * is structural, not kept in sync by hand. Returns null on null/
    * non-finite elements; codes are clamped to ±127. */
  private[functions] def quantizeCore(arr: ArrayData,
                                      isFloat: Boolean): (Double, Array[Int]) = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
      xs(i) = v
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30) / 127.0
    val q = new Array[Int](n)
    i = 0
    while (i < n) {
      val r = math.floor(xs(i) / scale + 0.5)
      q(i) = math.max(-127.0, math.min(127.0, r)).toInt
      i += 1
    }
    (scale, q)
  }

  /** One-pass quantization; called from both interpreted and generated
    * code. Returns null on null/NaN elements. */
  def quantize(arr: ArrayData, isFloat: Boolean): InternalRow = {
    val core = quantizeCore(arr, isFloat)
    if (core == null) null
    else InternalRow(core._1, new GenericArrayData(core._2))
  }
}
