package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Relational
import graft.warehouse.{Scd, Star}

/** SCD Type-2 dimension builds: change collapse, interval integrity,
  * null-safe change detection, point-in-time reconstruction, and the
  * single-exchange plan shape. */
class ScdSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // change log: key, ts, tie, two tracked attrs (with nulls)
  private lazy val log = Seq(
    // k=1: value change, a no-op observation (collapses), another change
    (1L, 10L, 1L, "gold", "eu"),
    (1L, 20L, 2L, "gold", "eu"), // unchanged -> collapses into ts=10
    (1L, 30L, 3L, "silver", "eu"),
    (1L, 40L, 4L, "silver", "us"),
    // k=2: null -> value -> null transitions (null-safe detection)
    (2L, 10L, 5L, null, "eu"),
    (2L, 20L, 6L, "bronze", "eu"),
    (2L, 30L, 7L, null, "eu"),
    (2L, 40L, 8L, null, "eu"), // unchanged null -> collapses
    // k=3: single observation
    (3L, 15L, 9L, "gold", null)
  ).toDF("k", "ts", "tie", "tier", "region")

  private lazy val hist = Scd.scd2(log, Seq("k"), "ts", Seq("tie"),
    Seq("tier", "region"))

  test("collapses unchanged observations and versions the changes") {
    val k1 = hist.filter($"k" === 1).orderBy($"effective_from")
      .select($"tier", $"region", $"effective_from", $"effective_to")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(k1.toSeq == Seq(
      ("gold", "eu", 10L, 30L),   // ts=20 no-op collapsed into this row
      ("silver", "eu", 30L, 40L),
      ("silver", "us", 40L, -1L)))
  }

  test("null-safe change detection: null->value->null all version") {
    val k2 = hist.filter($"k" === 2).orderBy($"effective_from")
      .select($"tier", $"effective_from").collect()
      .map(r => (if (r.isNullAt(0)) "∅" else r.getString(0), r.getLong(1)))
    // ts=40 (null, unchanged vs ts=30's null) must collapse; the rest version
    assert(k2.toSeq == Seq(("∅", 10L), ("bronze", 20L), ("∅", 30L)))
  }

  test("interval integrity: one current row per key, contiguous half-open chain") {
    val perKey = hist.groupBy($"k").agg(
      sum(when($"is_current", 1).otherwise(0)).as("n_current"),
      count(lit(1)).as("n")).collect()
    perKey.foreach(r => assert(r.getLong(1) == 1L,
      s"key ${r.getLong(0)}: expected exactly 1 current row"))
    // each non-current row's effective_to equals the next row's effective_from
    val chain = hist.filter(!$"is_current")
      .join(hist.select($"k", $"effective_from".as("next_from")),
        Seq("k"))
      .groupBy($"k", $"effective_from", $"effective_to")
      .agg(sum(when($"effective_to" === $"next_from", 1).otherwise(0)).as("hits"))
      .collect()
    chain.foreach(r => assert(r.getLong(3) >= 1L,
      s"interval ${r} not closed by a successor version"))
  }

  test("point-in-time reconstruction: as-of lookup at every original ts " +
    "returns the attrs in effect") {
    val probes = log.select($"k", $"ts", $"tie", $"tier".as("want_tier"),
      $"region".as("want_region"))
    val looked = Relational.asofJoin(probes,
      hist.select($"k", $"effective_from", $"tier", $"region"),
      Seq("k"), "ts", "effective_from", Seq("tier", "region"), "got_")
    val bad = looked.filter(
      !($"got_tier" <=> $"want_tier") || !($"got_region" <=> $"want_region"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("scd2Current matches the latest-per-key build on the raw log") {
    val cur = Scd.scd2Current(hist).select($"k", $"tier", $"region")
    val latest = Star.latestPerKey(log, Seq("k"), Seq("ts", "tie"))
      .select($"k", $"tier", $"region")
    assert(cur.exceptAll(latest).isEmpty && latest.exceptAll(cur).isEmpty)
  }

  test("reserved output columns are guarded") {
    intercept[IllegalArgumentException] {
      Scd.scd2(log.withColumn("is_current", lit(true)),
        Seq("k"), "ts", Seq("tie"), Seq("tier"))
    }
  }

  test("plan: both window passes ride ONE exchange and ONE sort") {
    val out = hist
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(p).size == 1,
      "expected exactly one shuffle:\n" + p)
    assert("\\bSort\\b".r.findAllIn(p).size == 1,
      "expected exactly one sort (second window reuses the first's):\n" + p)
    assert(!p.contains("Join"), "scd2 must not plan a join:\n" + p)
  }
}
