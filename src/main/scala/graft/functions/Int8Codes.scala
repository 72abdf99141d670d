package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pack a float/double vector into SIGNED INT8 CODES (BinaryType, one
  * byte per dimension) — the compressed storage form for
  * quantized-then-re-rank ANN ([[graft.ext.IvfIndex.batchTopKQuantized]]).
  *
  * Quantization follows [[QuantizeInt8]] exactly (scale =
  * max(max|x|, 1e-30)/127, floor-round-half-up, clamp ±127) but emits
  * the raw code bytes WITHOUT the scale: the one consumer is COSINE
  * ranking, where the per-vector scale cancels algebraically —
  * cos(s_a·qa, s_b·qb) = cos(qa, qb). Dropping it keeps the code row
  * at exactly `dim` bytes, which is the point: a 64-dim float32 array
  * column stores 256+ bytes per row, the packed code 64 — the
  * approximate-rank stage scans a 4-8x smaller table and the full
  * floats are only read for re-rank survivors.
  *
  * Null contract (same reasoning as QuantizeInt8): null array, null
  * element, or non-finite element ⇒ null — poisoned vectors must not
  * throw at 100 TB. */
case class QuantizeInt8Pack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_int8_pack expects array<float>/array<double>, got " +
        other.catalogString)
  }

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8Pack.pack(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.QuantizeInt8Pack.pack($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Pack =
    copy(child = newChild)

  override def prettyName: String = "graft_int8_pack"
}

object QuantizeInt8Pack {
  /** Quantize + pack via [[QuantizeInt8.quantizeCore]] — the same
    * arithmetic as the struct-valued kernel BY CONSTRUCTION (codes are
    * already clamped ±127, so the byte narrowing is exact). Shared by
    * interpreted and generated code. */
  def pack(arr: ArrayData, isFloat: Boolean): Array[Byte] = {
    val core = QuantizeInt8.quantizeCore(arr, isFloat)
    if (core == null) return null
    val q = core._2
    val out = new Array[Byte](q.length)
    var i = 0
    while (i < q.length) { out(i) = q(i).toByte; i += 1 }
    out
  }
}

/** Cosine similarity over two packed int8 code vectors (the
  * [[QuantizeInt8Pack]] form): one tight byte loop accumulating the
  * integer dot product and both squared norms — int multiply-adds over
  * 1-byte lanes, the cheapest distance this engine computes. Because
  * symmetric quantization scales cancel under cosine, this IS the
  * approximate cosine of the original float vectors (error from the
  * ±0.5-code rounding only).
  *
  * Null contract: null input, LENGTH MISMATCH, or a zero-norm side ⇒
  * null (mismatched dims are data corruption — at 100 TB they must
  * rank as "no signal", not throw mid-job; the zero-norm convention
  * matches the float kernel / x19). */
case class Int8CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int8_cosine expects (binary, binary), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    Int8CosineSim.cosine(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val res = ctx.freshName("int8cos")
      s"""
         |java.lang.Double $res = graft.functions.Int8CosineSim.cosine($l, $r);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_int8_cosine"
}

object Int8CosineSim {
  /** Integer dot/norms in one pass; boxed Double or null (see contract). */
  def cosine(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    if (a.length != b.length) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else java.lang.Double.valueOf(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
  }
}
