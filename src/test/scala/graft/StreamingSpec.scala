package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.schema.Schemas
import graft.stream.Streaming

class StreamingSpec extends AnyFunSuite with StreamingFixtures {
  import TestSpark.spark

  test("streaming plan == batch plan on the same input (ST1/ST2/ST6)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString
    writeMessages(dir, Seq(
      "soccer.league" -> validLeague,
      "soccer.league" -> badLeague,
      "soccer.league" -> "not json at all"))

    val stream = Streaming.jsonStream(spark, dir, msgSchema)
    assert(stream.isStreaming)
    val routed = ValidateRoute.plan(stream, Schemas.specs)
    val (qv, qr) = Streaming.startRoutes(routed, out, chk, Trigger.AvailableNow())
    qv.awaitTermination(60000); qr.awaitTermination(60000)

    val validated = spark.read.parquet(s"$out/validated-all")
    val rejected = spark.read.parquet(s"$out/rejected-all")
    assert(validated.count() == 1)
    assert(rejected.count() == 2)

    // batch run over the same file agrees (same pure plan, ST10 backfill story)
    val batchRaw = spark.read.schema(msgSchema).json(dir)
    val batchRouted = ValidateRoute.plan(batchRaw, Schemas.specs)
    assert(batchRouted.validated.count() == 1)
    assert(batchRouted.rejected.count() == 2)
  }

  test("watermarked streaming dedup drops replayed duplicates (A10/ST4/ST9)") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val out = Files.createTempDirectory("graft-dedup-out").toString
    val chk = Files.createTempDirectory("graft-dedup-chk").toString
    writeMessages(dir, Seq(
      "soccer.league" -> validLeague,
      "soccer.league" -> validLeague,
      "soccer.league" -> validLeague))

    val stream = Streaming.jsonStream(spark, dir, msgSchema)
    val routed = ValidateRoute.plan(stream, Schemas.specs, enableDedup = true)
    val (qv, qr) = Streaming.startRoutes(routed, out, chk, Trigger.AvailableNow())
    qv.awaitTermination(60000); qr.awaitTermination(60000)

    assert(spark.read.parquet(s"$out/validated-all").count() == 1)
  }

  test("ProcessingTime trigger picks up new files across micro-batches (ST1)") {
    val dir = Files.createTempDirectory("graft-pt").toString
    val out = Files.createTempDirectory("graft-pt-out").toString
    val chk = Files.createTempDirectory("graft-pt-chk").toString
    writeMessages(dir, Seq("soccer.league" -> validLeague))

    val stream = Streaming.jsonStream(spark, dir, msgSchema)
    val routed = ValidateRoute.plan(stream, Schemas.specs)
    val (qv, qr) = Streaming.startRoutes(routed, out, chk,
      Trigger.ProcessingTime("500 milliseconds"))
    try {
      // progress-derived budgets (not fixed wall-clock): the wait
      // rides observed micro-batch progress and fails only on a dead
      // query, a stalled trigger loop, or the generous absolute cap
      // batch 1: the initial file
      eventuallyWithProgress(Seq(qv, qr)) {
        spark.read.parquet(s"$out/validated-all").count() == 1
      }
      // batch 2: a file that arrives while the query is live
      val json = s"""{"topic":"soccer.league","value":${ujsonEscape(
        validLeague.replace("4328", "4999"))},"timestamp":"2024-05-01T12:01:00.000Z"}"""
      Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.json"), json)
      eventuallyWithProgress(Seq(qv, qr)) {
        spark.read.parquet(s"$out/validated-all").count() == 2
      }
    } finally { qv.stop(); qr.stop() }
  }

  test("streaming windowed counts match the batch hourly rollup (ST8)") {
    val events = Tables(spark, TestSpark.sf, "events")
    val tmpIn = Files.createTempDirectory("graft-win-in").toString
    events.write.mode("overwrite").parquet(tmpIn)

    val stream = spark.readStream.schema(spark.read.parquet(tmpIn).schema).parquet(tmpIn)
    val agg = Streaming.windowedCounts(stream, "ts", "event_type")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("win_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    // append mode only emits windows the watermark has passed; every
    // emitted window must match the batch computation exactly.
    val got = spark.table("win_out")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val batch = events.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0)
  }

  test("streaming session windows match the batch session_window rollup (ST8)") {
    val events = Tables(spark, TestSpark.sf, "events")
    val tmpIn = Files.createTempDirectory("graft-sess-in").toString
    events.write.mode("overwrite").parquet(tmpIn)

    val stream = spark.readStream.schema(spark.read.parquet(tmpIn).schema).parquet(tmpIn)
    val agg = Streaming.sessionCounts(stream, "ts", "user_id")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    // append mode emits only watermark-closed sessions; each must match
    // the batch session_window computation exactly (same expression —
    // this is what makes backfill == live)
    val got = spark.table("sess_out").select(
      col("session.start").as("s"), col("session.end").as("e"),
      col("user_id"), col("n"))
    val batch = events
      .groupBy(session_window(col("ts"), "30 minutes").as("session"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session.start").as("s"), col("session.end").as("e"),
        col("user_id"), col("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0)
    // structural: a key's sessions never overlap (merge correctness)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"))
    val overlaps = batch.withColumn("prev_e", lag(col("e"), 1).over(w))
      .filter(col("prev_e").isNotNull && col("s") < col("prev_e"))
    assert(overlaps.count() == 0, "session windows overlap within a key")
  }
}
