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
