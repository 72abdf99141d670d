package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over pre-hashed shingles (array<long> →
  * array<long> of `numHashes` lanes) — fuses the
  * `aggregate(zip_with(..., least))` fold in
  * [[graft.ext.TextDedup.minhashSignatureFromHashes]], which allocates a
  * fresh lane array per SHINGLE, into one loop with a single on-stack
  * accumulator per row.
  *
  * Bit-parity contract with the HOF form: lane i of shingle hash h is
  * `xxhash64(i: int, h: long)` = `XXH64.hashLong(h, XXH64.hashInt(i, 42))`
  * (Spark's multi-arg xxhash64 chains the seed). The per-lane seeds are
  * hoisted — computed once per expression instance, not per element.
  * Null shingle hashes contribute the chained seed unchanged, matching
  * xxhash64's null behavior. Verified bit-equal in FunctionsSpec.
  */
case class MinHash64(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash64 expects array<bigint>, got ${other.catalogString}")
  }

  /** Per-lane chained seeds: xxhash64(i) prefix of xxhash64(i, h). */
  private lazy val laneSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // a null element leaves the chained seed itself, like xxhash64(i, null)
      val isNull = arr.isNullAt(j)
      val h = if (isNull) 0L else arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val lane = if (isNull) laneSeeds(i) else XXH64.hashLong(h, laneSeeds(i))
        if (lane < acc(i)) acc(i) = lane
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("laneSeeds", laneSeeds, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      val lane = ctx.freshName("lane")
      val isNull = ctx.freshName("elemNull")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $acc = new long[$numHashes];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  final boolean $isNull = $arr.isNullAt($j);
         |  final long $h = $isNull ? 0L : $arr.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $lane = $isNull ? $seedsRef[$i] : $xxh.hashLong($h, $seedsRef[$i]);
         |    if ($lane < $acc[$i]) $acc[$i] = $lane;
         |  }
         |}
         |${ev.value} = new $gad($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}
