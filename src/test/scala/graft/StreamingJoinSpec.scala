package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.Streaming

/** Stream-stream joins and foreachBatch ingest (ST9/ST10): split from
  * StreamingSpec for parallel test-group scheduling — the join state
  * stores and multi-micro-batch curation runs are wall-clock-heavy. */
class StreamingJoinSpec extends AnyFunSuite with StreamingFixtures {
  import TestSpark.spark
  import spark.implicits._

  test("foreachBatch MV-style ingest applies the batch transform per micro-batch (ST10)") {
    val sink = Files.createTempDirectory("graft-mv-out").toString + "/dim"
    val chk = Files.createTempDirectory("graft-mv-chk").toString
    val events = Tables(spark, TestSpark.sf, "events")
    val tmpIn = Files.createTempDirectory("graft-mv-in").toString
    events.limit(100).write.mode("overwrite").parquet(tmpIn)

    val stream = spark.readStream.schema(
      spark.read.parquet(tmpIn).schema).parquet(tmpIn)
    val q = Streaming.foreachBatchIngest(
      stream,
      df => df.groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      sink, chk)
    q.awaitTermination(60000)

    val dim = spark.read.parquet(sink)
    assert(dim.agg(sum(col("n"))).head.getLong(0) == 100)
  }

  test("streaming corpus curation: per-batch filters equal the batch pass (ST10)") {
    // the curation operators are plain batch transforms, so foreachBatch
    // applies them per micro-batch — streaming ingest curation with NO
    // separate code path; the union of per-batch outputs must equal one
    // batch run over everything
    val docs = Tables(spark, TestSpark.sf, "documents")
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => graft.ext.TextAnalysis.repetitionFilter(df, "text", "doc_id")
        .withColumn("q", graft.ext.TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.5)
        .select(col("doc_id"), col("q"))
    val tmpIn = Files.createTempDirectory("graft-cur-in").toString
    val sink = Files.createTempDirectory("graft-cur-out").toString + "/kept"
    val chk = Files.createTempDirectory("graft-cur-chk").toString
    // several FILES + maxFilesPerTrigger=1 -> several real micro-batches
    // (batch boundaries come from the source; a downstream repartition
    // would not create them)
    docs.repartition(4).write.mode("overwrite").parquet(tmpIn)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmpIn).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmpIn)
    val q = Streaming.foreachBatchIngest(stream, curate, sink, chk)
    assert(q.awaitTermination(180000), "curation stream timed out")

    val got = spark.read.parquet(sink)
    val want = curate(docs)
    assert(got.count() > 0 && got.count() < docs.count(),
      "curation must keep a strict subset")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "streaming curation must equal the batch pass")
  }

  test("stream-stream interval join matches the batch theta join (inner)") {
    val events = Tables(spark, TestSpark.sf, "events")
    val tmpIn = Files.createTempDirectory("graft-ssj-in").toString
    events.write.mode("overwrite").parquet(tmpIn)
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts")))

    val stream = spark.readStream
      .schema(spark.read.parquet(tmpIn).schema).parquet(tmpIn)
    val (sp, sc) = sides(stream)
    val joined = Streaming.intervalJoin(sp, sc, "p_user", "c_user",
      "p_ts", "c_ts", lookback = "1 hour")
    val q = joined.select(col("p_id"), col("c_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    val (bp, bc) = sides(events)
    val batch = bp.join(bc,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
    val got = spark.table("ssj_out")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream-stream interval join must equal the batch theta join")
  }

  test("stream-stream left-outer join emits null-matches once the watermark closes") {
    val inP = Files.createTempDirectory("graft-ssj-p").toString
    val inC = Files.createTempDirectory("graft-ssj-c").toString
    val outDir = Files.createTempDirectory("graft-ssj-out").toString
    val chk = Files.createTempDirectory("graft-ssj-chk").toString
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)

    def runOnce(): Unit = {
      val p = spark.readStream.schema("p_id STRING, p_user STRING, p_ts TIMESTAMP")
        .parquet(inP)
      val c = spark.readStream.schema("c_id STRING, c_user STRING, c_ts TIMESTAMP")
        .parquet(inC)
      val j = Streaming.intervalJoin(p, c, "p_user", "c_user", "p_ts", "c_ts",
        lookback = "1 hour", lateness = "1 minute", joinType = "leftOuter")
      val q = j.select(col("p_id"), col("c_id"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    // u1's purchase has a click in-window; u2's has none
    Seq(("p1", "u1", ts("2024-01-01 10:00:00")), ("p2", "u2", ts("2024-01-01 10:00:00")))
      .toDF("p_id", "p_user", "p_ts").write.mode("append").parquet(inP)
    Seq(("c1", "u1", ts("2024-01-01 09:30:00")))
      .toDF("c_id", "c_user", "c_ts").write.mode("append").parquet(inC)
    runOnce()
    // advance the watermark far past p2's window so its null-match emits
    Seq(("p9", "u9", ts("2024-01-01 13:00:00")))
      .toDF("p_id", "p_user", "p_ts").write.mode("append").parquet(inP)
    Seq(("c9", "u9", ts("2024-01-01 13:00:00")))
      .toDF("c_id", "c_user", "c_ts").write.mode("append").parquet(inC)
    runOnce()

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got.contains(("p1", Some("c1"))), s"matched row missing: $got")
    assert(got.contains(("p2", None)),
      s"watermark-closed unmatched row must emit a null-match: $got")
  }
}
