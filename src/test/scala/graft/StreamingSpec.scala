package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.schema.Schemas
import graft.stream.Streaming

class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val msgSchema = StructType(Seq(
    StructField("topic", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType)))

  private val validLeague =
    """{"idLeague":"4328","strLeague":"EPL","strSport":"Soccer","strCountry":"England","ingested_at":1714564800.0}"""
  private val badLeague =
    """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball","strCountry":"USA","ingested_at":1714564800.0}"""

  private def writeMessages(dir: String, rows: Seq[(String, String)]): Unit = {
    val json = rows.map { case (t, v) =>
      s"""{"topic":"$t","value":${ujsonEscape(v)},"timestamp":"2024-05-01T12:00:00.000Z"}"""
    }.mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch0.json"), json)
  }

  private def ujsonEscape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

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
      // batch 1: the initial file
      eventually(10000) {
        spark.read.parquet(s"$out/validated-all").count() == 1
      }
      // batch 2: a file that arrives while the query is live
      val json = s"""{"topic":"soccer.league","value":${ujsonEscape(
        validLeague.replace("4328", "4999"))},"timestamp":"2024-05-01T12:01:00.000Z"}"""
      Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.json"), json)
      eventually(15000) {
        spark.read.parquet(s"$out/validated-all").count() == 2
      }
    } finally { qv.stop(); qr.stop() }
  }

  private def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !(try cond catch { case _: Exception => false })) {
      Thread.sleep(250)
    }
    assert(try cond catch { case _: Exception => false },
      s"condition not met within $timeoutMs ms")
  }

  test("restart from checkpoint is exactly-once: no reprocessing, no loss (ST3)") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val chk = Files.createTempDirectory("graft-ckpt-chk").toString

    def runOnce(): Unit = {
      val stream = Streaming.jsonStream(spark, dir, msgSchema)
      val routed = ValidateRoute.plan(stream, Schemas.specs)
      val (qv, qr) = Streaming.startRoutes(routed, out, chk, Trigger.AvailableNow())
      qv.awaitTermination(60000); qr.awaitTermination(60000)
      qv.stop(); qr.stop()
    }

    writeMessages(dir, Seq("soccer.league" -> validLeague))
    runOnce()
    assert(spark.read.parquet(s"$out/validated-all").count() == 1)

    // new file between runs; the checkpoint must skip batch-0 files
    val json = s"""{"topic":"soccer.league","value":${ujsonEscape(
      validLeague.replace("4328", "5000"))},"timestamp":"2024-05-01T12:02:00.000Z"}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.json"), json)
    runOnce()

    val keys = spark.read.parquet(s"$out/validated-all")
      .select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("4328", "5000"), s"got ${keys.toSeq}")
  }

  test("multi-restart soak: five cycles stay exactly-once and dedup state " +
    "survives restarts (ST3/ST4/A10)") {
    val dir = Files.createTempDirectory("graft-soak").toString
    val out = Files.createTempDirectory("graft-soak-out").toString
    val chk = Files.createTempDirectory("graft-soak-chk").toString

    def runOnce(): Unit = {
      val stream = Streaming.jsonStream(spark, dir, msgSchema)
      val routed = ValidateRoute.plan(stream, Schemas.specs, enableDedup = true)
      val (qv, qr) = Streaming.startRoutes(routed, out, chk, Trigger.AvailableNow())
      qv.awaitTermination(60000); qr.awaitTermination(60000)
      qv.stop(); qr.stop()
    }

    val ids = Seq("6001", "6002", "6003", "6004", "6005")
    ids.zipWithIndex.foreach { case (id, cycle) =>
      // each cycle delivers one NEW message and one REPLAY of the first
      // message (same pk + payload hash) — the replay must be dropped by
      // dedup state RESTORED from the checkpoint, not in-memory state
      val fresh = s"""{"topic":"soccer.league","value":${ujsonEscape(
        validLeague.replace("4328", id))},"timestamp":"2024-05-01T12:0$cycle:00.000Z"}"""
      val replay = s"""{"topic":"soccer.league","value":${ujsonEscape(
        validLeague.replace("4328", "6001"))},"timestamp":"2024-05-01T12:0$cycle:30.000Z"}"""
      // cycle 0's "replay" arrives in the SAME batch as the original —
      // the in-batch duplicate case; later cycles replay across restarts
      Files.writeString(java.nio.file.Paths.get(s"$dir/soak$cycle.json"),
        s"$fresh\n$replay")
      runOnce()
      val keys = spark.read.parquet(s"$out/validated-all")
        .select("key").as[String].collect().sorted.toSeq
      assert(keys == ids.take(cycle + 1).sorted,
        s"cycle $cycle: got $keys")
    }
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
