package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native ordered BPE merge application over a symbol array — the hot
  * inner fold of tokenizer training and encode
  * ([[graft.ext.TextAnalysis.learnBpeMerges]] /
  * `applyBpeMerges`): each `(left, right)` rule applies IN TABLE ORDER
  * as one left-to-right greedy non-overlapping pass (a freshly merged
  * symbol never re-merges with the element it just consumed within the
  * same pass; rule k sees the symbols rule k−1 produced).
  *
  * Why a kernel when the SQL `aggregate(...CASE WHEN element_at(acc,-1)
  * = l AND x = r THEN...)` fold expresses the same thing: HOF lambdas
  * evaluate INTERPRETED per element, and the encode path NESTS
  * |merges| such folds — each rebuilding its accumulator array per
  * element — over every distinct word. This expression runs all rules
  * as flat loops over UTF8String arrays in one call per row.
  *
  * Bit-parity contract with the HOF fold (FunctionsSpec): per rule, for
  * each element x left to right — if the output's last symbol equals
  * `left` AND x equals `right`, replace that last symbol with
  * `left+right`; else append x. Null ARRAY ⇒ null; null ELEMENTS pass
  * through unmerged (SQL equality with null is never true — the CASE
  * falls to the append branch), exactly as the HOF fold behaves.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "BpeApply needs at least one merge rule")
  require(merges.forall { case (l, r) => l != null && r != null },
    "BpeApply rules must be non-null strings")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_apply expects array<string>, got ${other.catalogString}")
  }

  // rule tables precomputed once per expression instance, not per row
  @transient private lazy val lefts: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rights: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val cats: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeApply.run(input.asInstanceOf[ArrayData], lefts, rights, cats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refL = ctx.addReferenceObj("bpeLefts", lefts, "org.apache.spark.unsafe.types.UTF8String[]")
    val refR = ctx.addReferenceObj("bpeRights", rights, "org.apache.spark.unsafe.types.UTF8String[]")
    val refC = ctx.addReferenceObj("bpeCats", cats, "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BpeApply.run($arr, $refL, $refR, $refC);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_apply"
}

object BpeApply {
  /** Shared by interpreted eval and codegen. */
  def run(arr: ArrayData, lefts: Array[UTF8String], rights: Array[UTF8String],
          cats: Array[UTF8String]): GenericArrayData = {
    val n0 = arr.numElements()
    var cur = new Array[UTF8String](n0)
    var len = n0
    var i = 0
    while (i < n0) {
      cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    var k = 0
    while (k < lefts.length) {
      val l = lefts(k); val r = rights(k); val cat = cats(k)
      var m = 0 // output length; rewrite in place (m <= read index)
      i = 0
      while (i < len) {
        val x = cur(i)
        if (m > 0 && x != null && cur(m - 1) != null &&
            cur(m - 1).equals(l) && x.equals(r)) {
          cur(m - 1) = cat
        } else {
          cur(m) = x
          m += 1
        }
        i += 1
      }
      len = m
      k += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }
}
