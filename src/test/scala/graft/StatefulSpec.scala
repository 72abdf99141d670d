package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.{Observation, Stateful}
import graft.warehouse.Scd

/** flatMapGroupsWithState change detection: batch semantics, arrival-order
  * determinism, equivalence with the batch SCD2 change collapse,
  * stream==batch parity across checkpointed restarts, and event-time TTL
  * state eviction. */
class StatefulSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val obsFixture = Seq(
    ("k1", ts("2024-01-01 10:00:00"), "a"),
    ("k1", ts("2024-01-01 10:05:00"), "a"), // no-op -> absorbed
    ("k1", ts("2024-01-01 10:10:00"), "b"),
    ("k1", ts("2024-01-01 10:02:00"), "z"), // in-batch: sorted, so NOT late
    ("k2", ts("2024-01-01 09:00:00"), "x")
  ).toDF("key", "ts", "value")

  test("batch semantics: first emit, no-op absorption, in-batch event-time order") {
    val got = Stateful.changes(
        Stateful.observations(obsFixture, "key", "ts", "value"))
      .collect().map(c => (c.key, c.ts, c.value, c.prev_value, c.change_seq))
      .sortBy(c => (c._1, c._2.getTime))
    assert(got.toSeq == Seq(
      ("k1", ts("2024-01-01 10:00:00"), "a", null, 1L),
      ("k1", ts("2024-01-01 10:02:00"), "z", "a", 2L), // sorted into place
      ("k1", ts("2024-01-01 10:05:00"), "a", "z", 3L),
      ("k1", ts("2024-01-01 10:10:00"), "b", "a", 4L),
      ("k2", ts("2024-01-01 09:00:00"), "x", null, 1L)))
  }

  test("null event times are dropped, not NPE'd") {
    val withNull = obsFixture.unionByName(
      Seq(("k1", null.asInstanceOf[Timestamp], "boom")).toDF("key", "ts", "value"))
    val got = Stateful.changes(
      Stateful.observations(withNull, "key", "ts", "value")).toDF()
    val want = Stateful.changes(
      Stateful.observations(obsFixture, "key", "ts", "value")).toDF()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("determinism: output independent of arrival partitioning") {
    val a = Stateful.changes(
      Stateful.observations(obsFixture, "key", "ts", "value")).toDF()
    val b = Stateful.changes(
      Stateful.observations(obsFixture.repartition(7), "key", "ts", "value")).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("matches the batch SCD2 change collapse on the events table") {
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(col("user_id").cast("string").as("key"), col("ts"),
        col("event_type").as("value"))
    val streamed = Stateful.changes(
        Stateful.observations(ev, "key", "ts", "value"))
      .select($"key", $"ts", $"value")
    val scd = Scd.scd2(ev, Seq("key"), "ts", Seq("value"), Seq("value"))
      .select($"key", $"effective_from".as("ts"), $"value")
    assert(streamed.exceptAll(scd).isEmpty && scd.exceptAll(streamed).isEmpty,
      "change stream must equal the SCD2 version rows")
  }

  test("stream == batch across two checkpointed AvailableNow runs (ST9)") {
    val ev = Tables(spark, TestSpark.sf, "events")
      .select(col("user_id").cast("string").as("key"), col("ts"),
        col("event_type").as("value"))
    val cutSec = ev.agg(percentile_approx(unix_timestamp(col("ts")),
      lit(0.5), lit(100))).head.getLong(0)
    val inDir = Files.createTempDirectory("graft-cdc-in").toString
    val outDir = Files.createTempDirectory("graft-cdc-out").toString
    val chkDir = Files.createTempDirectory("graft-cdc-chk").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(ev.schema).parquet(inDir)
      val changes = Stateful.changes(
        Stateful.observations(stream, "key", "ts", "value"))
      val q = changes.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    // event-time-ordered delivery: early half, then (after a restart
    // that must restore per-key state from the checkpoint) the late half
    ev.filter(unix_timestamp(col("ts")) <= cutSec)
      .write.mode("append").parquet(inDir)
    runOnce()
    ev.filter(unix_timestamp(col("ts")) > cutSec)
      .write.mode("append").parquet(inDir)
    runOnce()

    val got = spark.read.parquet(outDir).select($"key", $"ts", $"value")
    val batch = Stateful.changes(
        Stateful.observations(ev, "key", "ts", "value"))
      .select($"key", $"ts", $"value")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "two checkpointed streaming runs must equal one batch pass")
  }

  test("cross-batch late data is dropped, not re-versioned") {
    val inDir = Files.createTempDirectory("graft-late-in").toString
    val outDir = Files.createTempDirectory("graft-late-out").toString
    val chkDir = Files.createTempDirectory("graft-late-chk").toString
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("key STRING, ts TIMESTAMP, value STRING").parquet(inDir)
      val q = Stateful.changes(
          Stateful.observations(stream, "key", "ts", "value"))
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    Seq(("k", ts("2024-01-01 10:00:00"), "a"))
      .toDF("key", "ts", "value").write.mode("append").parquet(inDir)
    runOnce()
    // arrives in a LATER batch with an EARLIER event time -> dropped
    Seq(("k", ts("2024-01-01 09:00:00"), "stale"))
      .toDF("key", "ts", "value").write.mode("append").parquet(inDir)
    runOnce()
    val got = spark.read.parquet(outDir).select($"value")
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("a"), got.mkString(","))
  }

  test("event-time TTL evicts idle state; the key re-emits as first") {
    val inDir = Files.createTempDirectory("graft-ttl-in").toString
    val outDir = Files.createTempDirectory("graft-ttl-out").toString
    val chkDir = Files.createTempDirectory("graft-ttl-chk").toString
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("key STRING, ts TIMESTAMP, value STRING").parquet(inDir)
      val q = Stateful.changes(
          Stateful.observations(stream, "key", "ts", "value",
            watermark = Some("1 minute")),
          ttl = Some("10 minutes"))
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    def feed(rows: (String, Timestamp, String)*): Unit = {
      rows.toSeq.toDF("key", "ts", "value").write.mode("append").parquet(inDir)
      runOnce()
    }
    feed(("x", ts("2024-01-01 10:00:00"), "a")) // state for x @10:00
    // advance the watermark far past 10:10 (x's timeout) via another key
    feed(("y", ts("2024-01-01 12:00:00"), "b"))
    // x's timeout fires in a batch where x has NO data -> state removed
    feed(("y", ts("2024-01-01 12:05:00"), "b2"))
    // same value as before eviction -> re-emits as a FIRST observation
    feed(("x", ts("2024-01-01 12:30:00"), "a"))
    val xs = spark.read.parquet(outDir).filter($"key" === "x")
      .orderBy($"ts").collect()
    assert(xs.length == 2, s"expected re-emission after eviction, got ${xs.length}")
    assert(xs.forall(_.isNullAt(3)), "both emissions must be 'first' (prev null)")
    assert(xs.map(_.getLong(4)).toSeq == Seq(1L, 1L),
      "change_seq restarts after state eviction")
  }
}
