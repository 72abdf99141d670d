package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused sign-LSH bucket assignment: bit i of the result = sign of
  * `v · plane_i`, all planes in one pass over the vector.
  *
  * Why a kernel (eleventh): bucketing is the INDEXING pass of ANN and
  * embedding near-dup — it touches every vector of the corpus. The
  * composable spelling evaluates one interpreted `aggregate(zip_with)`
  * dot per plane, and the shared `asDouble` cast lambda gets re-inlined
  * into every one of them (measured 2.6 s for 200k×64-dim × 8 planes on
  * 8 cores). This expression reads the float32 elements once and walks
  * the plane matrix in a tight compiled loop.
  *
  * Numeric contract: per plane a left-to-right double summation of
  * `double(x_j) * w_j` — the exact association of
  * [[graft.ext.Similarity.dot]] and of the inlined-literal DuckDB
  * oracle fragments, so x09/x12's hash-checked bucket ids are
  * unchanged. Bit i set iff dot ≥ 0.
  *
  * Null/shape contract: null array, null/non-finite element, or a
  * vector whose length differs from the plane dimensionality ⇒ null
  * (the HOF spelling silently zero-bits such rows via three-valued
  * logic — a poisoned vector landing in a deterministic junk bucket
  * that then inflates that bucket's quadratic pair join; null is the
  * auditable behavior).
  *
  * Planes are held as Seq[Seq[Double]] so the case class keeps VALUE
  * equality (an Array param would be reference-equal only, defeating
  * canonicalization and common-subexpression elimination); the packed
  * primitive matrix is derived lazily for the hot loop.
  */
case class LshBucket64(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63,
    "sign-LSH needs 1..63 planes for a long bucket id")
  require(planes.forall(_.length == planes.head.length),
    "sign-LSH planes must all share one dimensionality")

  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects array<float>/array<double>, got " +
        other.catalogString)
  }

  override def nullSafeEval(v: Any): Any =
    LshBucket64.bucket(v.asInstanceOf[ArrayData], planeMatrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLshPlanes", planeMatrix,
      "double[][]")
    val b = ctx.freshName("graftLshB")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $b = graft.functions.LshBucket64.bucket($c, $ref, $isFloat);
         |if ($b == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $b).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}

object LshBucket64 {

  /** One-pass bucket id; called from interpreted and generated code.
    * Returns null (boxed) on null elements or a dimension mismatch. */
  def bucket(arr: ArrayData, planes: Array[Array[Double]],
             isFloat: Boolean): java.lang.Long = {
    val dim = planes(0).length
    val n = arr.numElements()
    if (n != dim) return null
    val xs = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val v = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
      xs(j) = v
      j += 1
    }
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      j = 0
      while (j < n) { dot += xs(j) * p(j); j += 1 }
      if (dot >= 0) bucket |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bucket)
  }
}
