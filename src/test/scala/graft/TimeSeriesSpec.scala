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
    // every filled value lies between ITS KEY'S observed min and max —
    // per-key bounds, so cross-key leakage can't hide inside a global
    // envelope
    val mm = res.groupBy("event_type").agg(min("n").as("lo"), max("n").as("hi"))
    assert(filled.join(mm, "event_type")
      .filter($"n" < $"lo" || $"n" > $"hi").count() == 0)
  }

  test("null timestamps are excluded from the resampled grid, explicitly") {
    val ev = Seq(("a", Some("2024-01-01 00:05:00")), ("a", Some("2024-01-01 00:25:00")),
        ("a", None)).toDF("k", "ts_s")
      .select($"k", $"ts_s".cast("timestamp").as("ts"))
    val res = TimeSeries.resampleCounts(ev, "k", "ts", 600L)
    assert(res.agg(sum("n")).head.getDouble(0) == 2.0)
    assert(res.filter($"bin".isNull).count() == 0)
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

  test("rolling features: lag, delta and trailing frame aggregates are exact") {
    val dense = Seq(("a", 0L, 1.0), ("a", 1L, 1.0), ("a", 2L, 1.0),
      ("a", 3L, 1.0), ("a", 4L, 10.0), ("a", 5L, 1.0)).toDF("k", "bin", "n")
    val got = TimeSeries.rollingFeatures(dense, "k", "bin", "n", window = 3)
      .orderBy("bin")
      .select("bin", "lag_1", "delta", "roll_sum", "roll_cnt", "roll_avg",
        "roll_min", "roll_max")
      .collect()
    // bin 4 (the spike): lag=1, delta=9, frame {1,1,10}
    val r4 = got(4)
    assert(r4.getDouble(1) == 1.0 && r4.getDouble(2) == 9.0)
    assert(r4.getDouble(3) == 12.0 && r4.getLong(4) == 3L)
    assert(r4.getDouble(5) == 4.0 && r4.getDouble(6) == 1.0 && r4.getDouble(7) == 10.0)
    // bin 0: no predecessor -> lag/delta null, frame is just itself
    val r0 = got(0)
    assert(r0.isNullAt(1) && r0.isNullAt(2))
    assert(r0.getDouble(3) == 1.0 && r0.getLong(4) == 1L)
  }

  test("anomaly score: history z-score, zero-variance and warm-up semantics") {
    val dense = Seq(("a", 0L, 1.0), ("a", 1L, 1.0), ("a", 2L, 1.0),
      ("a", 3L, 1.0), ("a", 4L, 10.0), ("a", 5L, 1.0)).toDF("k", "bin", "n")
    val got = TimeSeries.anomalyScore(dense, "k", "bin", "n",
        history = 3, threshold = 2.0)
      .orderBy("bin").collect()
    // warm-up (c < 2) and constant-history bins: z null
    assert((0 to 4).forall(got(_).isNullAt(3)))
    // the spike deviates from a ZERO-VARIANCE history: infinite z -> flagged
    assert(got(4).getBoolean(4))
    assert((0 to 3).forall(!got(_).getBoolean(4)))
    // bin 5: history {1,1,10} -> s=12 q=102 c=3, z=(3-12)/sqrt(306-144)
    val z5 = got(5).getDouble(3)
    assert(math.abs(z5 - (3.0 - 12.0) / math.sqrt(3 * 102.0 - 144.0)) == 0.0)
    assert(!got(5).getBoolean(4))
  }

  test("feature and anomaly windows each ride one sort") {
    val ev = Tables(spark, TestSpark.sf, "events").select($"event_type", $"ts")
    val res = TimeSeries.resampleCounts(ev, "event_type", "ts", 3600L)
    val filled = TimeSeries.gapFill(res, "event_type", "bin", "n", mode = "ffill")
    for (df <- Seq(
        TimeSeries.rollingFeatures(filled, "event_type", "bin", "n", 12),
        TimeSeries.anomalyScore(filled, "event_type", "bin", "n"))) {
      val plan = df.queryExecution.executedPlan.toString
      val sorts = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Sort ".r.findAllIn(plan).length
      assert(sorts <= 1, s"expected at most one Sort:\n$plan")
    }
  }

  test("reserved output columns are guarded") {
    val clash = Seq(("a", 0L, 1.0, 2.0)).toDF("k", "bin", "n", "roll_sum")
    intercept[IllegalArgumentException] {
      TimeSeries.rollingFeatures(clash, "k", "bin", "n", 3)
    }
    val clashZ = Seq(("a", 0L, 1.0, 2.0)).toDF("k", "bin", "n", "z")
    intercept[IllegalArgumentException] {
      TimeSeries.anomalyScore(clashZ, "k", "bin", "n")
    }
  }

  test("invalid fill mode and non-positive step are rejected") {
    intercept[IllegalArgumentException] {
      TimeSeries.gapFill(series, "k", "bin", "n", mode = "nearest")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.binIndex(lit("2024-01-01").cast("timestamp"), 0L)
    }
  }

  test("ewma: hand-computed chain, key isolation, single point, " +
    "null dropped, deterministic under repartition") {
    // α = 0.5: 10 → 15 → 27.5; key b independent; nulls never enter
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(40.0)), ("a", 4L, None), ("b", 1L, Some(100.0)))
      .toDF("k", "bin", "n")
    val out = TimeSeries.ewma(df, "k", "bin", "n", alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(out === Map(("a", 1L) -> 10.0, ("a", 2L) -> 15.0,
      ("a", 3L) -> 27.5, ("b", 1L) -> 100.0))
    val rep = TimeSeries.ewma(df.repartition(7), "k", "bin", "n", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(rep === out)
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(df, "k", "bin", "n", alpha = 0.0)
    }
  }

  test("foreachBatch CUSUM monitor: accumulated-series recompute per " +
    "micro-batch, final state == batch run exactly") {
    import org.apache.spark.sql.streaming.Trigger
    // in-control first half (≈10), sustained +4 shift in the second —
    // each per-bin z would stay unremarkable; CUSUM accumulates it
    val half1 = Seq(("m", 1L, 10.0), ("m", 2L, 11.0), ("m", 3L, 9.0),
      ("m", 4L, 10.0))
    val half2 = Seq(("m", 5L, 14.0), ("m", 6L, 14.0), ("m", 7L, 15.0),
      ("m", 8L, 14.0))
    val full = (half1 ++ half2).toDF("k", "bin", "n")
      .withColumn("tgt", lit(10.0))
    val src = java.nio.file.Files.createTempDirectory("cusum-src")
    def stage(rows: Seq[(String, Long, Double)], name: String): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory("cusum-stage")
      rows.toDF("k", "bin", "n").coalesce(1)
        .write.mode("overwrite").parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        src.resolve(name))
    }
    stage(half1, "b0.parquet")
    stage(half2, "b1.parquet")
    // pin processing order: the file source orders by mtime, and two
    // copies can land in the same millisecond on a fast local FS
    java.nio.file.Files.setLastModifiedTime(src.resolve("b0.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L))
    java.nio.file.Files.setLastModifiedTime(src.resolve("b1.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1700000001000L))
    // the monitor pattern: micro-batches extend a tiny accumulated
    // per-bin series; each trigger re-runs the (bounded) fold over it
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val alarmsPerBatch = scala.collection.mutable.Map.empty[Long, Long]
    val schema = half1.toDF("k", "bin", "n").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        acc.synchronized { acc ++= rows }
        val sofar = acc.synchronized { acc.toSeq }.toDF("k", "bin", "n")
          .withColumn("tgt", lit(10.0))
        val alarms = TimeSeries.cusum(sofar, "k", "bin", "n", "tgt",
            slack = 1.0, threshold = 5.0)
          .filter(col("alarm")).count()
        alarmsPerBatch.synchronized { alarmsPerBatch(id) = alarms }
      }
      .start()
    q.awaitTermination()
    assert(alarmsPerBatch.size == 2)
    assert(alarmsPerBatch.values.min == 0L, "in-control half must not alarm")
    assert(alarmsPerBatch.values.max > 0L, "the sustained shift must alarm")
    // stream == batch parity: the final accumulated-series run equals
    // the one-shot batch run row for row (the fold is deterministic —
    // exact equality, no tolerance)
    val streamed = TimeSeries.cusum(acc.toSeq.toDF("k", "bin", "n")
        .withColumn("tgt", lit(10.0)), "k", "bin", "n", "tgt", 1.0, 5.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5))).toSet
    val batchRun = TimeSeries.cusum(full, "k", "bin", "n", "tgt", 1.0, 5.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5))).toSet
    assert(streamed == batchRun)
  }

  test("holt: a pure ramp is tracked exactly (zero residuals), " +
    "single-point series degrades clean, hand-computed state") {
    // 10, 12, 14 with α=β=0.5: l=(10,12,14), b=2 throughout — the
    // standard init makes Holt exact on a linear ramp
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 14.0),
      ("solo", 1L, 5.0)).toDF("k", "bin", "n")
    val out = TimeSeries.holt(df, "k", "bin", "n", alpha = 0.5, beta = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val a2 = out(("a", 2L))
    assert(a2.getAs[Double]("level") == 12.0 &&
      a2.getAs[Double]("trend") == 2.0)
    assert(a2.getAs[Double]("forecast") == 12.0 &&
      a2.getAs[Double]("residual") == 0.0)
    val a3 = out(("a", 3L))
    assert(a3.getAs[Double]("level") == 14.0 &&
      a3.getAs[Double]("forecast") == 14.0 &&
      a3.getAs[Double]("residual") == 0.0)
    // first row: init state, nothing to forecast from
    val a1 = out(("a", 1L))
    assert(a1.getAs[Double]("level") == 10.0 &&
      a1.getAs[Double]("trend") == 2.0)
    assert(a1.isNullAt(a1.fieldIndex("forecast")))
    // single point: trend 0, no forecast
    val s1 = out(("solo", 1L))
    assert(s1.getAs[Double]("level") == 5.0 &&
      s1.getAs[Double]("trend") == 0.0 &&
      s1.isNullAt(s1.fieldIndex("forecast")))
  }

  test("cusum: hand-computed two-sided excursions, floor at zero, " +
    "alarm threshold, reserved-column guard") {
    // target 10, slack 1, threshold 5:
    //   hi: 0, 3, 6(alarm), 0;  lo: 0, 0, 0, 6(alarm)
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 14.0), ("a", 3L, 14.0),
      ("a", 4L, 3.0)).toDF("k", "bin", "n").withColumn("tgt", lit(10.0))
    val out = TimeSeries.cusum(df, "k", "bin", "n", "tgt",
        slack = 1.0, threshold = 5.0)
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(out.toSeq === Seq((1L, 0.0, 0.0, false), (2L, 3.0, 0.0, false),
      (3L, 6.0, 0.0, true), (4L, 0.0, 6.0, true)))
    val clash = df.withColumnRenamed("tgt", "alarm")
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(clash, "k", "bin", "n", "alarm", 1.0, 5.0)
    }
  }
}
