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
}
