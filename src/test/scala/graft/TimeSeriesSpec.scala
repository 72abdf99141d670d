package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TimeSeries

/** Grid resampling + gap fill: interpolation arithmetic, ffill, key
  * isolation, no-gap identity, spine completeness on the events
  * fixture, and the one-sort window plan. */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // key a: observed bins 0 (10.0) and 3 (4.0) -> holes at 1, 2
  // key b: observed bins 5 (2.0) and 6 (8.0) -> no holes
  private lazy val series = Seq(
    ("a", 0L, 10.0), ("a", 3L, 4.0), ("b", 5L, 2.0), ("b", 6L, 8.0)
  ).toDF("k", "bin", "n")

  test("linear interpolation fills interior holes exactly") {
    val got = TimeSeries.gapFill(series, "k", "bin", "n")
      .orderBy("k", "bin")
      .select("k", "bin", "n", "observed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("a", 0L, 10.0, true), ("a", 1L, 8.0, false), ("a", 2L, 6.0, false),
      ("a", 3L, 4.0, true), ("b", 5L, 2.0, true), ("b", 6L, 8.0, true)))
  }

  test("ffill carries the previous observation forward") {
    val got = TimeSeries.gapFill(series, "k", "bin", "n", mode = "ffill")
      .filter($"k" === "a").orderBy("bin")
      .collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(10.0, 10.0, 10.0, 4.0))
  }

  test("a gapless series round-trips unchanged, observed everywhere") {
    val dense = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0)).toDF("k", "bin", "n")
    val got = TimeSeries.gapFill(dense, "k", "bin", "n").orderBy("bin")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((0L, 1.0, true), (1L, 2.0, true), (2L, 3.0, true)))
  }

  test("keys are isolated: one key's range never leaks into another's spine") {
    val out = TimeSeries.gapFill(series, "k", "bin", "n")
    assert(out.filter($"k" === "b" && $"bin" < 5).count() == 0)
    assert(out.filter($"k" === "a" && $"bin" > 3).count() == 0)
  }

  test("resample + gapFill on the events fixture: complete per-key grid") {
    val ev = Tables(spark, TestSpark.sf, "events").select($"event_type", $"ts")
    val res = TimeSeries.resampleCounts(ev, "event_type", "ts", 3600L)
    val filled = TimeSeries.gapFill(res, "event_type", "bin", "n")
    val bounds = res.groupBy("event_type")
      .agg((max("bin") - min("bin") + 1).as("spine"))
    val counts = filled.groupBy("event_type").count()
    val bad = bounds.join(counts, "event_type")
      .filter($"spine" =!= $"count").count()
    assert(bad == 0)
    // filled counts conserve mass on observed bins
    assert(filled.filter($"observed").agg(sum("n")).head.getDouble(0) == ev.count().toDouble)
    // every filled value lies between its key's observed min and max
    val mm = res.agg(min("n"), max("n")).head
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    assert(filled.filter($"n" < lo || $"n" > hi).count() == 0)
  }

  test("both window frames share one partitioning + sort (no second window exchange)") {
    val ev = Tables(spark, TestSpark.sf, "events").select($"event_type", $"ts")
    val res = TimeSeries.resampleCounts(ev, "event_type", "ts", 3600L)
    val plan = TimeSeries.gapFill(res, "event_type", "bin", "n")
      .queryExecution.executedPlan.toString
    // the two frame directions may print as two Window nodes, but they
    // must ride ONE sort on (key, bin) — a second Sort means the frames
    // failed to share the window layout
    val sorts = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Sort ".r.findAllIn(plan).length
    assert(sorts <= 1, s"expected at most one Sort for the window stage:\n$plan")
  }

  test("invalid fill mode and non-positive step are rejected") {
    intercept[IllegalArgumentException] {
      TimeSeries.gapFill(series, "k", "bin", "n", mode = "nearest")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.binIndex(lit("2024-01-01").cast("timestamp"), 0L)
    }
  }
}
