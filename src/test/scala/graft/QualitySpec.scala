package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.olap.Quality

class QualitySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val events = Tables(spark, sf, "events")

  test("countByType partitions the row count (A1)") {
    val total = events.count()
    val sums = Quality.countByType(events).agg(sum(col("n_events"))).head.getLong(0)
    assert(sums == total)
  }

  test("hourlyCounts covers every row exactly once (A2)") {
    assert(Quality.hourlyCounts(events).agg(sum(col("n"))).head.getLong(0) == events.count())
  }

  test("dailyTypePivot row sums equal daily totals (A3)") {
    val pivot = Quality.dailyTypePivot(events)
    val pivotTotal = pivot.select(
      (col("error_count") + col("signup_count") + col("purchase_count")
        + col("view_count") + col("click_count")).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(pivotTotal == events.count())
  }

  test("userErrorPct: pct in [0,100] and n_err <= total (A5/J2)") {
    val bad = Quality.userErrorPct(events)
      .filter(col("error_pct") < 0 || col("error_pct") > 100 || col("n_err") > col("total"))
    assert(bad.count() == 0)
  }

  test("topk returns at most 10 rows in non-increasing order (A6/O2)") {
    val rows = Quality.topkTypeProps(events).collect()
    assert(rows.length <= 10)
    val occ = rows.map(_.getAs[Long]("occurrences"))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b })
  }

  test("kbandClassify buckets cover all rows (P22/P23)") {
    assert(Quality.kbandClassify(events).agg(sum(col("n"))).head.getLong(0) == events.count())
  }

  test("movingAvg frame never exceeds the 6-hour mean bounds (W1)") {
    val bad = Quality.movingAvg(events)
      .filter(col("moving_avg_6h") < 0 || col("moving_avg_6h") > 100)
    assert(bad.count() == 0)
  }

  test("Tables reads ns-timestamp events on a session WITHOUT the builder flag") {
    // the driver may invoke queries() with its own session that lacks
    // spark.sql.legacy.parquet.nanosAsLong — Tables must set it at runtime
    val fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val ev = Tables(fresh, sf, "events")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }

  test("nullRatioScore is 0 on the null-free fixture (P27)") {
    val distinctScores = Quality.nullRatioScore(events).select(col("null_pct")).distinct().collect()
    assert(distinctScores.map(_.getDouble(0)).forall(_ == 0.0))
  }
}
