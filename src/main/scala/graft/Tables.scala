package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loader. One parquet file per table under the sf dir
  * (see /root/repo/TESTDATA.md). At cluster scale the same call reads a
  * partitioned directory — all downstream code is path-agnostic.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS). Depending on the
  * Spark build / legacy flags in effect, that physical type surfaces as
  * one of THREE logical types: nanos-since-epoch LONG (the
  * `nanosAsLong` legacy path), TIMESTAMP_NTZ (newer readers honor the
  * column's isAdjustedToUTC=false), or plain TIMESTAMP. We normalize
  * all three to Spark's native microsecond TimestampType once, here,
  * under the pinned-UTC session, so every downstream operator — and in
  * particular Structured Streaming watermarks, which require
  * TimestampType — sees the same plain timestamp column regardless of
  * which read path the environment took.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // ntz→tz cast interprets the wall-clock value in the session
        // timezone; the session is pinned to UTC, matching the fixture.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}
