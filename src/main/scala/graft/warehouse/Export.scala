package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-data export with an integrity manifest — the
  * packaging stage a curation pipeline ends with: the final mix written
  * as a deterministic set of shards plus a small manifest a consumer
  * (or a re-run) can verify without re-reading the data it trusts.
  *
  * Shard assignment is `pmod(key, nShards)` — engine-portable and
  * stable across runs/clusters, so a re-export of the same input is
  * bit-comparable shard by shard (hash-based assignment would also
  * work; the mod form keeps the oracle SQL trivial). The manifest is
  * computed from the data READ BACK from storage, not from the input
  * frame — it certifies what actually landed, closing the
  * write-path/read-path loop.
  *
  * Scale shape: the write is one `partitionBy(shard)` pass (each task
  * writes only the shards it holds; a `repartition(shard)` first keeps
  * file counts = O(nShards), not O(tasks × nShards)); the manifest is
  * one aggregate of exact-integer columns — rows, key sum/min/max —
  * per shard, O(nShards) rows total.
  */
object Export {

  /** Write `df` as `nShards` deterministic shards under `path` and
    * return the integrity manifest (shard, n_rows, key_sum, key_min,
    * key_max) computed from the read-back data. `keyCol` must be an
    * integral id column. */
  def writeShards(spark: SparkSession, df: DataFrame, keyCol: String,
                  path: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"need at least one shard, got $nShards")
    val shard = pmod(col(keyCol), lit(nShards)).cast("int").as("shard")
    df.withColumn("shard", shard)
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    manifest(spark, path, keyCol)
  }

  /** Recompute the manifest from what is on disk — the verification a
    * consumer runs before training. */
  def manifest(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(keyCol)).as("key_sum"),
        min(col(keyCol)).as("key_min"),
        max(col(keyCol)).as("key_max"))
      .orderBy(col("shard"))
}
