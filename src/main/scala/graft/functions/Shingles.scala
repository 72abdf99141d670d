package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingling over a token array.
  *
  * Why a kernel when `transform(sequence(...), i -> concat_ws(slice(...)))`
  * expresses the same thing: HOF lambdas evaluate INTERPRETED per element,
  * and optimizer rules (predicate pushdown's alias substitution, most
  * visibly) can splice the tokenize tree into the lambda body — then
  * tokenization re-runs once per shingle index, O(tokens × regex) per
  * document. A plain unary expression evaluates its child exactly once
  * per row no matter where the optimizer moves it, which makes every
  * shingle consumer immune to that class of plan regression.
  *
  * Bit-parity contract with the HOF form
  * ([[graft.ext.TextDedup.shinglesOfTokens]], verified in FunctionsSpec):
  * shingle s = `concat_ws(" ", toks[s..s+k-1])` (null elements skipped,
  * exactly concat_ws semantics); arrays of ≤ k tokens yield ONE shingle
  * (all tokens joined); a null input array yields null.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    Shingles.build(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val shingles = classOf[Shingles].getName
      s"${ev.value} = $shingles.build($arr, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object Shingles {
  private val sep = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen (the work is array building,
    * not expression dispatch — one call per row either way). */
  def build(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (n <= k) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = tok(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      val out = new Array[Any](n - k + 1)
      var s = 0
      while (s <= n - k) {
        val w = new Array[UTF8String](k)
        var j = 0
        while (j < k) { w(j) = tok(s + j); j += 1 }
        out(s) = UTF8String.concatWs(sep, w: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }
}
