package graft.warehouse

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.GraftFunctions

/** Bloom-filter join prefiltering — the standard 100 TB shuffle-reduction
  * move for selective joins whose build side is too big to broadcast-
  * hash-join but whose KEY SET sketches into a few megabytes (10M keys at
  * 1% fpp ≈ 11 MB). The fact side is filtered at scan time, inside
  * whole-stage codegen, BEFORE its join exchange: only rows that might
  * match ever shuffle. The exact join afterwards removes the few false
  * positives, so results are identical to the unfiltered join.
  *
  * Spark's own runtime row-group filtering injects similar bloom filters
  * automatically for some shapes; this operator makes the pattern
  * explicit, reusable against any key expression, and available where the
  * optimizer doesn't fire (pre-aggregated dims, hashed composite keys,
  * cross-format joins).
  *
  * Keys are canonicalized to ONE long expression applied to both sides —
  * build and probe hashing always agree: integral keys cast, anything
  * else `xxhash64`.
  */
object BloomJoin {

  /** Canonical long key: integral columns cast; other types hashed. */
  def longKey(df: DataFrame, keyCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(keyCol).cast("long")
      case _ => xxhash64(col(keyCol))
    }
  }

  /** Build-side and probe-side canonicalization must agree or the
    * prefilter silently drops true matches: all-integral pairs widen to
    * long consistently; anything else goes through xxhash64, which is
    * type-sensitive — require the exact same type there. */
  private def requireCompatibleKeys(fact: DataFrame, factKey: String,
                                    dim: DataFrame, dimKey: String): Unit = {
    import org.apache.spark.sql.types._
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val (ft, dt) = (fact.schema(factKey).dataType, dim.schema(dimKey).dataType)
    require(integral(ft) && integral(dt) || ft == dt,
      s"bloom key types must canonicalize identically: fact[$factKey]: " +
        s"${ft.catalogString} vs dim[$dimKey]: ${dt.catalogString} — " +
        "cast one side first (equal values of different type families " +
        "hash differently and would be silently dropped)")
  }

  /** Build a bloom filter over `dim[dimKey]` (one distributed aggregate
    * over the dim side; `expectedItems` ≤ 0 counts first). */
  def buildFilter(dim: DataFrame, dimKey: String,
                  expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val keyed = dim.select(longKey(dim, dimKey).as("_graft_bk"))
      .filter(col("_graft_bk").isNotNull)
    val n = if (expectedItems > 0) expectedItems else keyed.count()
    val bf: BloomFilter = keyed.stat.bloomFilter("_graft_bk", math.max(n, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Filter `fact` to rows whose `factKey` might appear in the sketch —
    * a narrow, codegen'd scan-side filter (no shuffle, no join yet).
    * Null keys drop (they cannot match a semi/inner join either). */
  def prefilter(fact: DataFrame, factKey: String,
                filterBytes: Array[Byte]): DataFrame =
    fact.filter(GraftFunctions.bloomMightContain(fact.sparkSession,
      longKey(fact, factKey), filterBytes))

  /** Exact semi-join with bloom prefiltering: identical rows to
    * `fact ⋉ dim`, but only might-match rows cross the join exchange. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
               dimKey: String, expectedItems: Long = -1L,
               fpp: Double = 0.01): DataFrame = {
    requireCompatibleKeys(fact, factKey, dim, dimKey)
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    // no distinct on the dim keys: left-semi semantics already ignore
    // right-side duplicates, and a distinct would cost an extra exchange
    val keys = dim.select(col(dimKey).as("_graft_dk"))
    prefilter(fact, factKey, bytes)
      .join(keys, col(factKey) === col("_graft_dk"), "left_semi")
  }
}
