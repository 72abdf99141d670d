package graft.warehouse

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for shuffle-free co-located joins — the 100 TB
  * answer to "this join shuffles both sides every night".
  *
  * Writing both sides of a recurring equi-join bucketed (same column,
  * same bucket count) makes every subsequent join between them exchange-
  * free: each task reads matching buckets from both tables. The shuffle
  * is paid ONCE at write time instead of once per query. Combine with
  * `sortBy` on the join key and the per-bucket sort is also free.
  *
  * This matches the reference's keyed-topic co-partitioning intent
  * (producers key messages by entity id so one entity lands on one
  * partition — `producers/livescore_producer.py:28`, SURVEY §4).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
