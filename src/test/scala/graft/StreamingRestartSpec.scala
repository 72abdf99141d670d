package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.schema.Schemas
import graft.stream.Streaming

/** Checkpoint-recovery contracts (ST3/ST4): split from StreamingSpec so
  * the restart soak — the suite's longest serial tail (five full
  * query-restart cycles) — runs in its own parallel test group. */
class StreamingRestartSpec extends AnyFunSuite with StreamingFixtures {
  import TestSpark.spark
  import spark.implicits._

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

  test("single-pass topology restarts exactly-once too, dedup state " +
    "included (ST3/ST4 over planSinglePass)") {
    // the production (scale) topology must carry the same checkpoint
    // contract as the reference-faithful plan(): restart skips batch-0
    // files, and the (topic, pk, hash)-keyed dedup state restores
    val dir = Files.createTempDirectory("graft-sp-ckpt").toString
    val out = Files.createTempDirectory("graft-sp-out").toString
    val chk = Files.createTempDirectory("graft-sp-chk").toString

    def runOnce(): Unit = {
      val stream = Streaming.jsonStream(spark, dir, msgSchema)
      val routed = ValidateRoute.planSinglePass(stream, Schemas.specs,
        enableDedup = true)
      val (qv, qr) = Streaming.startRoutes(routed, out, chk, Trigger.AvailableNow())
      qv.awaitTermination(60000); qr.awaitTermination(60000)
      qv.stop(); qr.stop()
    }

    writeMessages(dir, Seq("soccer.league" -> validLeague))
    runOnce()
    assert(spark.read.parquet(s"$out/validated-all").count() == 1)

    // run 2: one new league + a replay of the first (must be dropped by
    // RESTORED dedup state) + a garbage row for the parse-reject branch
    val fresh = s"""{"topic":"soccer.league","value":${ujsonEscape(
      validLeague.replace("4328", "7000"))},"timestamp":"2024-05-01T12:02:00.000Z"}"""
    val replay = s"""{"topic":"soccer.league","value":${ujsonEscape(
      validLeague)},"timestamp":"2024-05-01T12:02:30.000Z"}"""
    val garbage = s"""{"topic":"soccer.league","value":${ujsonEscape(
      "NOT JSON {{")},"timestamp":"2024-05-01T12:02:45.000Z"}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.json"),
      s"$fresh\n$replay\n$garbage")
    runOnce()

    val keys = spark.read.parquet(s"$out/validated-all")
      .select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("4328", "7000"), s"got ${keys.toSeq}")
    assert(spark.read.parquet(s"$out/rejected-all").count() == 1)
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
}
