package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Gopher-style repetition verdict over a token array: true when
  * BOTH the duplicate-token fraction and the duplicate-n-gram fraction
  * are at or under their thresholds.
  *
  * Why fused: the composable formulation needs the token array four
  * times and the gram array twice inside one filter condition, and
  * FilterExec does no common-subexpression elimination — after predicate
  * pushdown that is four tokenizations and two shingle builds per row on
  * the corpus-wide filter path. One boolean expression evaluates its
  * token child ONCE and builds the gram strings once, wherever the
  * optimizer lands the condition.
  *
  * Exact parity with the SQL formulation (`TextAnalysis
  * .repetitionProfile` thresholds, verified in FunctionsSpec):
  * fractions are `1.0 - distinct/total` in double arithmetic; distinct
  * follows `array_distinct` semantics (binary string equality, one null
  * kept); grams are [[Shingles.build]] strings; a null token array is
  * null (the filter drops it), matching the composed form's null chain.
  */
case class RepetitionOk(
    child: Expression,
    n: Int,
    maxDupTokenFrac: Double,
    maxDupNgramFrac: Double) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_ok expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionOk.ok(input.asInstanceOf[ArrayData], n, maxDupTokenFrac, maxDupNgramFrac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = classOf[RepetitionOk].getName
      s"${ev.value} = $cls.ok($arr, $n, $maxDupTokenFrac, $maxDupNgramFrac);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionOk =
    copy(child = newChild)

  override def prettyName: String = "graft_repetition_ok"
}

object RepetitionOk {

  private def dupFrac(total: Int, distinct: Int): Double =
    1.0 - distinct.toDouble / total

  /** Shared by interpreted eval and codegen. */
  def ok(toks: ArrayData, n: Int, maxTok: Double, maxNgram: Double): Boolean = {
    val t = toks.numElements()
    // SQL parity: 0/0 is NaN, NaN <= x is false — the row is dropped
    if (t == 0) return false
    val seen = new java.util.HashSet[UTF8String]()
    var sawNull = false
    var distinctToks = 0
    var i = 0
    while (i < t) {
      if (toks.isNullAt(i)) { if (!sawNull) { sawNull = true; distinctToks += 1 } }
      else if (seen.add(toks.getUTF8String(i))) distinctToks += 1
      i += 1
    }
    if (dupFrac(t, distinctToks) > maxTok) return false
    val grams = Shingles.build(toks, n)
    val g = grams.numElements()
    val seenG = new java.util.HashSet[UTF8String]()
    var distinctGrams = 0
    var j = 0
    while (j < g) {
      if (seenG.add(grams.getUTF8String(j))) distinctGrams += 1
      j += 1
    }
    dupFrac(g, distinctGrams) <= maxNgram
  }
}
