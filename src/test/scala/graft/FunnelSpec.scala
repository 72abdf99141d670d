package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.olap.Funnel

/** Funnel/retention semantics on crafted timelines — the ordering and
  * window rules the x90/x91 value oracles exercise only as the fixture
  * happens to. */
class FunnelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private def run(rows: Seq[(Long, Int, String)], windowSec: Long = 3600) = {
    val df = rows.map { case (u, m, e) => (u, ts(m), e) }
      .toDF("user_id", "ts", "event_type")
    Funnel.windowFunnel(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"), windowSec)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("windowFunnel: order, window expiry, and anchor rules") {
    val out = run(Seq(
      (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"),       // full chain → 3
      (2L, 0, "a"), (2L, 2, "c"), (2L, 1, "b"),       // same, shuffled input order
      (3L, 0, "a"), (3L, 1, "c"), (3L, 2, "b"),       // c BEFORE b → 2 (c never after b)
      (4L, 0, "a"), (4L, 1, "b"), (4L, 120, "c"),     // c outside the 1h window → 2
      (5L, 0, "b"), (5L, 1, "c"),                     // no anchor → absent
      (6L, 0, "a"),                                   // anchor only → 1
      (7L, 0, "a"), (7L, 1, "a"), (7L, 2, "b"), (7L, 3, "c") // earliest anchor → 3
    ))
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L, 6L -> 1L, 7L -> 3L))
    assert(!out.contains(5L))
  }

  test("windowFunnel: a failed middle step BLOCKS later steps, and a " +
    "user whose candidates all miss the window still survives") {
    val out = run(Seq(
      // user 1: has a and c, NO b at all → must stop at 1, not count c
      (1L, 0, "a"), (1L, 5, "c"),
      // user 2: has b events but all outside the window → 1, user kept
      (2L, 0, "a"), (2L, 120, "b"), (2L, 125, "b"),
      // user 3: b before the anchor only → 1
      (3L, 10, "a"), (3L, 5, "b")
    ))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("windowFunnel: the greedy earliest-b rule is the documented " +
    "divergence — a later b that would enable c does not rescue") {
    // earliest b at t=1; c at t=2 qualifies after it → 3. But if c sat
    // BETWEEN two b's, the earliest-anchor rule still uses the first b.
    val out = run(Seq(
      (1L, 0, "a"), (1L, 3, "b"), (1L, 2, "c"))) // c before the only b → 2
    assert(out == Map(1L -> 2L))
  }

  test("retention: cohorts, offsets and exact percentages") {
    val period = 3600L // 1-hour cohorts
    val df = Seq(
      (1L, ts(0)), (1L, ts(61)),   // cohort 0, active offsets 0 and 1
      (2L, ts(1)),                 // cohort 0, offset 0 only
      (3L, ts(61)), (3L, ts(185))  // cohort 1, offsets 0 and 2
    ).toDF("user_id", "ts")
    val out = Funnel.retention(df, "user_id", "ts", period, maxOffset = 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val c0 = out.filterKeys(_._2 == out.keys.map(_._2).min).toMap
    assert(c0((0L, c0.keys.head._2))._1 == 2L) // both cohort-0 users at offset 0
    val offs0 = out.collect { case ((o, _), (n, sz, pct)) if sz == 2 => o -> (n, pct) }.toMap
    assert(offs0(0L) == ((2L, 100.0)))
    assert(offs0(1L) == ((1L, 50.0)))
    val offs1 = out.collect { case ((o, _), (n, sz, pct)) if sz == 1 => o -> (n, pct) }.toMap
    assert(offs1(0L) == ((1L, 100.0)) && offs1(2L) == ((1L, 100.0)))
    assert(!offs1.contains(1L), "inactive offsets must be absent, not zero")
  }

  test("topPaths: rank-ordered assembly, maxSteps cut, tie-on-path " +
    "ordering") {
    val rows = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (3L, 1L, "b"))
      .zipWithIndex.map { case ((u, t, e), i) => (u, t, i.toLong, e) }
      .toDF("user_id", "t", "event_id", "event_type")
    val out = Funnel.topPaths(rows, "user_id", "t", "event_id",
        "event_type", maxSteps = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // u1's third event is cut by maxSteps; u1 and u2 share "a>b"
    assert(out.toSeq === Seq(("a>b", 2L, 2L), ("b", 1L, 1L)))
    val top1 = Funnel.topPaths(rows, "user_id", "t", "event_id",
      "event_type", maxSteps = 1, topK = 1).collect()
    // "a" (2 users) beats "b" (1); ties would break lexicographically
    assert(top1.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("a", 2L)))
  }

  test("attribution: hand-computed four-model credits, conversion " +
    "reset, trailing/direct drops, linear mass == touched conversions") {
    // user 1: [click view click] purchase [view] purchase signup(drop)
    // user 2: purchase with no touches (direct — contributes nothing)
    // user 3: [click view] purchase
    val rows = Seq(
      (1L, 1L, "click"), (1L, 2L, "view"), (1L, 3L, "click"),
      (1L, 4L, "purchase"), (1L, 5L, "view"), (1L, 6L, "purchase"),
      (1L, 7L, "signup"),
      (2L, 1L, "purchase"),
      (3L, 1L, "click"), (3L, 2L, "view"), (3L, 3L, "purchase"))
      .zipWithIndex.map { case ((u, t, e), i) => (u, t, i.toLong, e) }
      .toDF("user_id", "t", "event_id", "event_type")
    val out = Funnel.attribution(rows, "user_id", "t", "event_id",
        "event_type", Seq("click", "view", "signup"), "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    // click: (3,first) (3,last) (2,first): linear 1/3+1/3+1/2,
    // position .4+.4+.5
    assert(out("click") == ((3L, 2L, 1L, r6(1.0 / 3 + 1.0 / 3 + 0.5), 1.3)))
    // view: (3,mid) (1,only) (2,last): linear 1/3+1+1/2,
    // position .2+1+.5
    assert(out("view") == ((3L, 1L, 2L, r6(1.0 / 3 + 1.0 + 0.5), 1.7)))
    // trailing signup earns nothing; direct purchase credits nobody
    assert(!out.contains("signup"))
    // invariant: linear credit mass == touched conversions (3)
    assert(math.abs(out.values.map(_._4).sum - 3.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Funnel.attribution(rows, "user_id", "t", "event_id", "event_type",
        Seq("purchase"), "purchase")
    }
  }
}
