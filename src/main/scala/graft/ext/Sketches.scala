package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable KMV (k-minimum-values / bottom-k) distinct-count sketch —
  * the cross-engine-DETERMINISTIC counterpart of
  * `approx_count_distinct`: where HLL++'s register layout is
  * Spark-internal (spec-bounded but not value-checkable outside the
  * JVM), a KMV sketch is just the k smallest 60-bit sha256-derived
  * hashes of the distinct values, so any SQL engine reproduces the
  * sketch — and therefore the estimate — bit-for-bit. The estimator is
  * the classic (k−1)/h_k rule [Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD'07 unbiased KMV]: with h_k the kth smallest hash mapped into
  * [0,1), E[h_k] ≈ k/(n+1), rsd ≈ 1/√(k−2).
  *
  * Why this exists next to [[org.apache.spark.sql.functions.approx_count_distinct]]:
  * profile queries that feed DOWNSTREAM decisions (dedup rates, split
  * sizing, per-source caps) want estimates that are reproducible across
  * engines and re-runs, auditable by the same DuckDB oracle as every
  * other operator, and mergeable across shards/days by a pure SQL
  * bottom-k — e.g. a daily sketch table folded into a 90-day
  * cardinality without rescanning the corpus. Spark's HLL gives the
  * first two only within one engine; KMV gives all three anywhere.
  *
  * Scale shape: the hash projection is narrow; `distinct` on
  * (group, h) is one exchange that map-side combines; the bottom-k per
  * group is written as the `row_number ≤ k` idiom, which
  * [[graft.plans.RewriteLatestPerKey]] plans as the bounded-heap
  * `TopKRows` aggregate — k longs per group cross the wire, never the
  * distinct-value stream. Global (ungrouped) sketches go through
  * [[kmvSketchSharded]]: bottom-k within 256 deterministic hash shards,
  * then one tiny merge — identical result (bottom-k of a union IS
  * bottom-k of per-shard bottom-k's), no single-reducer sort.
  */
object Sketches {

  /** 2^60 = 16^15, the hash-space size as an exactly-representable
    * double (both factors of every estimate stay exact). */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit uniform hash: first 15 hex chars of sha256("salt:value").
    * 15 chars keep the value inside a signed 64-bit integer in EVERY
    * engine (16 would need unsigned); collisions at 2^60 are negligible
    * for any practical k. */
  def kmvHash(v: Column, salt: String = "kmv"): Column =
    conv(substring(sha2(concat_ws(":", lit(salt), v.cast("string")), 256), 1, 15),
      16, 10).cast("long")

  /** Per-group KMV sketch: `(groupCols..., kmv: array<long>)` with the
    * ≤ k smallest distinct hashes ascending. NULL values are excluded
    * (COUNT DISTINCT semantics). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ kmvHash(col(valueCol), salt).as("h"): _*)
      .distinct()
    bottomK(hashed, groupCols, k)
  }

  /** Global (ungrouped) sketch via 256 deterministic hash shards —
    * the beyond-memory shape: per-shard bottom-k (each shard's distinct
    * set is 1/256 of the stream), then bottom-k of the ≤ 256·k
    * survivors. Result is IDENTICAL to a direct global bottom-k. */
  def kmvSketchSharded(df: DataFrame, valueCol: String, k: Int,
                       salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(kmvHash(col(valueCol), salt).as("h"))
      .distinct()
      .withColumn("_shard", pmod(col("h"), lit(256)))
    val perShard = bottomK(hashed, Seq("_shard"), k)
    bottomK(perShard.select(explode(col("kmv")).as("h")), Seq.empty, k)
  }

  /** Merge sketches group-wise: bottom-k of the union — the fold that
    * turns per-day/per-shard sketch tables into a period cardinality
    * without rescanning sources. Exact law (spec-pinned):
    * merge(sketch(A), sketch(B)) == sketch(A ∪ B). */
  def kmvMerge(sketches: Seq[DataFrame], groupCols: Seq[String],
               k: Int): DataFrame = {
    val exploded = sketches
      .map(_.select(groupCols.map(col) :+ explode(col("kmv")).as("h"): _*))
      .reduce(_ unionByName _)
      .distinct()
    bottomK(exploded, groupCols, k)
  }

  /** Append `distinct_est`: exact size when the sketch is unsaturated
    * (< k distinct hashes seen — the sketch IS the distinct set), else
    * (k−1)·2^60 / h_k. All factors are exactly-representable doubles and
    * the one division is IEEE, so the estimate is bit-identical across
    * engines. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.withColumn("distinct_est",
      when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
        .otherwise(lit((k - 1).toDouble * HashSpace) /
          element_at(col("kmv"), k).cast("double")))

  /** rn ≤ k over (group ORDER BY h) → collect ascending. The window is
    * the RewriteLatestPerKey-recognized idiom: planned as the TopKRows
    * bounded heap when graft extensions are loaded — no per-group sort,
    * k longs per group on the wire. An empty `groupCols` degenerates to
    * one global partition (callers with large distinct sets use
    * [[kmvSketchSharded]] instead). */
  private def bottomK(hashed: DataFrame, groupCols: Seq[String],
                      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
  }
}
