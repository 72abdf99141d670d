package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.olap.Growth

/** Growth-accounting reports against hand-computed expectations. */
class GrowthSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(day: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("activeUsers: hand-computed rolling windows over the observed " +
    "spine, zero activity days absent, stickiness ratio") {
    // u1: d1 d3; u2: d1; u3: d9 — spine {1, 3, 9}
    val ev = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(1)), (3L, ts(9)),
      (1L, ts(1))) // intra-day duplicate — must not double count
      .toDF("user_id", "ts")
    val out = Growth.activeUsers(ev, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 3) // only observed days report
    // au_7 coverage: d1 activity covers d3; d3 covers d9; d9 itself
    assert(out("2024-01-01") == ((2L, 2L, 2L, 1.0)))
    assert(out("2024-01-03") == ((1L, 2L, 2L, 0.5)))
    assert(out("2024-01-09") == ((1L, 2L, 3L, 0.333333)))
    intercept[IllegalArgumentException] {
      Growth.activeUsers(ev, "user_id", "ts", windows = Seq(7, 7))
    }
  }

  test("trainingFrame: observation/outcome windows are disjoint and " +
    "boundary-exact; no pre-cutoff activity means no row") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-05 10:00:00"), "click"),
      (1L, t("2024-01-08 10:00:00"), "view"),
      (1L, t("2024-01-12 10:00:00"), "purchase"), // outcome -> label 1
      (2L, t("2024-01-09 10:00:00"), "click"),    // silent after
      (3L, t("2024-01-11 10:00:00"), "click"),    // outcome only: NO row
      (4L, t("2024-01-02 10:00:00"), "click"),
      (4L, t("2024-01-15 00:00:00"), "view"),     // horizon edge: inclusive
      (5L, t("2024-01-10 00:00:00"), "click"),    // exactly AT cutoff:
                                                  // neither window
      (6L, t("2024-01-03 10:00:00"), "click"),
      (6L, t("2024-01-15 00:00:01"), "view"))     // past horizon: label 0
      .toDF("user_id", "ts", "event_type")
    val out = Growth.trainingFrame(ev, "user_id", "ts", "event_type",
        "2024-01-10 00:00:00", horizonDays = 5, eventTypes = Seq("click", "view"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // (n_total, n_click, n_view, days_silent, label)
    assert(out(1L) == ((2L, 1L, 1L, 2L, 1L)))
    assert(out(2L) == ((1L, 1L, 0L, 1L, 0L)))
    assert(!out.contains(3L), "outcome-only user must not appear")
    assert(!out.contains(5L), "an event exactly at the cutoff is in " +
      "neither window")
    assert(out(4L)._5 == 1L, "the horizon boundary is inclusive")
    assert(out(6L)._5 == 0L, "one second past the horizon is outside")
  }

  test("trainingFrame: a NON-midnight cutoff keeps the full " +
    "(cutoff, cutoff+horizon] window; bad inputs fail loudly") {
    def t(s: String) = Timestamp.valueOf(s)
    // cutoff 12:00 + 2 days -> boundary Jan 12 12:00, NOT Jan 12 00:00
    val ev = Seq(
      (1L, t("2024-01-09 10:00:00"), "click"),
      (1L, t("2024-01-12 06:00:00"), "view")) // inside only if untruncated
      .toDF("user_id", "ts", "event_type")
    val out = Growth.trainingFrame(ev, "user_id", "ts", "event_type",
        "2024-01-10 12:00:00", horizonDays = 2, eventTypes = Seq("click"))
      .head()
    assert(out.getAs[Long]("label") == 1L,
      "outcome window must extend to cutoff+2d 12:00, not midnight")
    intercept[IllegalArgumentException] {
      Growth.trainingFrame(ev, "user_id", "ts", "event_type",
        "not-a-timestamp", 2, Seq("click"))
    }
    intercept[IllegalArgumentException] {
      Growth.trainingFrame(ev, "user_id", "ts", "event_type",
        "2024-01-10 12:00:00", 2, Seq("click", "click"))
    }
    intercept[IllegalArgumentException] {
      Growth.trainingFrame(ev, "user_id", "ts", "event_type",
        "2024-01-10 12:00:00", 2, Seq("total"))
    }
  }

  test("newVsReturning: first day is new, later days returning, " +
    "cumulative base and share") {
    val ev = Seq((1L, ts(1)), (1L, ts(2)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val out = Growth.newVsReturning(ev, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(out("2024-01-01") == ((1L, 1L, 0L, 1L, 1.0)))
    assert(out("2024-01-02") == ((2L, 1L, 1L, 2L, 0.5)))
  }

  test("activeUsersFromUserDay: null users and null days drop (the " +
    "activeUsers contract — no null spine day, no vanishing-user skew)") {
    val rows = Seq[(String, java.sql.Date)](
      ("u1", java.sql.Date.valueOf("2024-01-01")),
      (null, java.sql.Date.valueOf("2024-01-01")), // null user: drop
      ("u2", null))                                // null day: drop
    val out = Growth.activeUsersFromUserDay(rows.toDF("u", "d"), "u", "d",
      windows = Seq(1)).collect()
    assert(out.length == 1, s"null day must not mint a spine row: " +
      out.mkString(","))
    assert(out.head.getDate(0).toString == "2024-01-01" &&
      out.head.getLong(1) == 1L)
  }

  test("activeUsersFromKmvMv: exact (== activeUsers) below saturation, " +
    "state bounded by k; saturated sketches estimate inside the rsd band") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.stream.{IncrementalMv, MvAgg}
    // exact regime: 30 users over 3 days, k = 64 >= any window union
    val ev = (1 to 30).map(u => (u.toLong, ts(1 + u % 3)))
      .toDF("user_id", "ts")
    val mvDir = Files.createTempDirectory("graft-kmv-mv").toString + "/mv"
    Seq(0, 1).foreach(m => IncrementalMv.applyAggDelta(
      ev.filter(pmod(col("user_id"), lit(2)) === m)
        .withColumn("_all", lit("all")),
      m, mvDir, "ts", "_all", col("user_id"), MvAgg.kmvDistinct(64)))
    val served = Growth.activeUsersFromKmvMv(spark, mvDir, 64)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    val batch = Growth.activeUsers(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble, r.getDouble(4))).toSeq
    assert(served.nonEmpty && served == batch,
      "unsaturated KMV serve must equal the exact batch report")
    // the whole point vs distinctSet: persisted state is <= k longs
    val maxLen = spark.read.parquet(mvDir)
      .agg(max(size(col("state")))).head.getInt(0)
    assert(maxLen <= 64)

    // saturated regime: 2000 users on one day, k = 128 — the state
    // stays 128 longs and the estimate lands within ~4 rsd of truth
    // (rsd = 1/sqrt(k-2) ~ 8.9%; hashes are deterministic, so this
    // pins the actual fixture value, the band states the contract)
    // ranged serve == the full serve's day slice (the partition-pruned
    // dashboard read; coverage days before the range start feed the
    // in-range windows, then drop). Day 3 exists in the MV BEYOND the
    // range end, so the end clip is exercised, not just the start.
    val ranged = Growth.activeUsersFromKmvMv(spark, mvDir, 64,
        range = Some(("2024-01-02", "2024-01-02")))
      .collect().toSeq
    val sliced = served.filter(r =>
      r._1 >= "2024-01-02" && r._1 <= "2024-01-02")
    assert(sliced.nonEmpty &&
      ranged.map(r => (r.getDate(0).toString, r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))) == sliced)
    intercept[IllegalArgumentException] {
      Growth.activeUsersFromKmvMv(spark, mvDir, 64,
        range = Some(("2024-01-03", "2024-01-02")))
    }
    intercept[IllegalArgumentException] {
      Growth.activeUsersFromKmvMv(spark, mvDir, 64,
        range = Some(("not-a-date", "2024-01-03")))
    }

    val big = (1 to 2000).map(u => (u.toLong, ts(1))).toDF("user_id", "ts")
    val mv2 = Files.createTempDirectory("graft-kmv-mv2").toString + "/mv"
    IncrementalMv.applyAggDelta(big.withColumn("_all", lit("all")), 0, mv2,
      "ts", "_all", col("user_id"), MvAgg.kmvDistinct(128))
    val est = Growth.activeUsersFromKmvMv(spark, mv2, 128, windows = Seq(1))
      .head.getDouble(1)
    val len2 = spark.read.parquet(mv2)
      .agg(max(size(col("state")))).head.getInt(0)
    assert(len2 == 128, "a saturated sketch must hold exactly k hashes")
    assert(est != 2000.0, "2000 distinct cannot serve exactly from k=128")
    assert(math.abs(est / 2000.0 - 1.0) < 0.35,
      s"KMV estimate $est outside the 4-rsd band around 2000")
  }

  test("activeUsersFromMv: ranged serve equals the full serve's slice " +
    "on the exact distinct-set state (shared prune/clip path)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.stream.{IncrementalMv, MvAgg}
    // days 1..4 with the range ending at day 3: day 4 exists in the
    // MV beyond the range end, so BOTH clip bounds are exercised
    val ev = (1 to 30).map(u => (u.toLong, ts(1 + u % 4)))
      .toDF("user_id", "ts")
    val mvDir = Files.createTempDirectory("graft-dset-rng").toString + "/mv"
    IncrementalMv.applyAggDelta(ev.withColumn("_all", lit("all")), 0,
      mvDir, "ts", "_all", col("user_id"), MvAgg.distinctSet)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val full = rows(Growth.activeUsersFromMv(spark, mvDir))
    val ranged = rows(Growth.activeUsersFromMv(spark, mvDir,
      range = Some(("2024-01-02", "2024-01-03"))))
    assert(ranged.nonEmpty &&
      ranged == full.filter(r => r._1 >= "2024-01-02" &&
        r._1 <= "2024-01-03"),
      s"ranged=$ranged full=$full")
  }

  test("activeUsersFromHllMv: exact in the coupon regime, rsd-banded " +
    "dense, CONSTANT state bytes at 10x the cardinality") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.stream.{IncrementalMv, MvAgg}
    // coupon regime: 30 users over 3 days at lgK=12 — DataSketches
    // stores the values exactly below promotion, so the serve equals
    // the exact batch report value-for-value (LONG estimates)
    val ev = (1 to 30).map(u => (u.toLong, ts(1 + u % 3)))
      .toDF("user_id", "ts")
    val mvDir = Files.createTempDirectory("graft-hll-mv").toString + "/mv"
    Seq(0, 1).foreach(m => IncrementalMv.applyAggDelta(
      ev.filter(pmod(col("user_id"), lit(2)) === m)
        .withColumn("_all", lit("all")),
      m, mvDir, "ts", "_all", col("user_id"), MvAgg.hllDistinct(12)))
    val served = Growth.activeUsersFromHllMv(spark, mvDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val batch = Growth.activeUsers(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(served.nonEmpty && served == batch,
      "coupon-regime HLL serve must equal the exact batch report")

    // dense regime: 30k users on one day — the estimate lands within
    // ~4 rsd (1.04/sqrt(4096) ~ 1.6%) and the state stays CONSTANT
    // bytes: 10x the cardinality may not grow a promoted sketch 2x
    // (the exact set would grow 10x; KMV stores k longs)
    def stateBytes(users: Int): (Long, Int) = {
      val big = (1 to users).map(u => (u.toLong, ts(1)))
        .toDF("user_id", "ts").withColumn("_all", lit("all"))
      val dir = Files.createTempDirectory(s"graft-hll-$users").toString + "/mv"
      IncrementalMv.applyAggDelta(big, 0, dir, "ts", "_all",
        col("user_id"), MvAgg.hllDistinct(12))
      val est = Growth.activeUsersFromHllMv(spark, dir, windows = Seq(1))
        .head.getLong(1)
      (est, spark.read.parquet(dir)
        .agg(max(length(col("state")))).head.getInt(0))
    }
    val (est3k, bytes3k) = stateBytes(3000)
    val (est30k, bytes30k) = stateBytes(30000)
    assert(math.abs(est30k / 30000.0 - 1.0) < 0.065,
      s"HLL estimate $est30k outside the 4-rsd band around 30000")
    assert(math.abs(est3k / 3000.0 - 1.0) < 0.065,
      s"HLL estimate $est3k outside the 4-rsd band around 3000")
    assert(bytes30k < 2 * bytes3k,
      s"promoted HLL state must stay ~constant: $bytes3k -> $bytes30k " +
        "bytes for 10x the cardinality")
  }
}
