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

  test("Tables normalizes a TIMESTAMP_NTZ events fixture to TimestampType") {
    // pin the ntz read path independently of which logical type the
    // environment's parquet reader surfaces for TIMESTAMP(NANOS): write
    // an events table whose ts IS ntz, and require Tables to cast it
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val src = Seq(("e1", "2024-01-02 03:04:05.123456"), ("e2", "2024-06-07 08:09:10.5"))
      .toDF("event_id", "raw")
      .withColumn("ts", col("raw").cast("timestamp_ntz")).drop("raw")
    assert(src.schema("ts").dataType.typeName == "timestamp_ntz")
    src.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    // session tz is pinned UTC, so the wall-clock value must be preserved
    val got = ev.orderBy("event_id").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect()
    assert(got.sameElements(Array("2024-01-02 03:04:05.123456", "2024-06-07 08:09:10.500000")))
  }

  test("nullRatioScore is 0 on the null-free fixture (P27)") {
    val distinctScores = Quality.nullRatioScore(events).select(col("null_pct")).distinct().collect()
    assert(distinctScores.map(_.getDouble(0)).forall(_ == 0.0))
  }

  test("winsorize clips to per-group percentiles; nulls pass through unclipped") {
    import spark.implicits._
    // group a: 1..100 -> p05=5.95, p95=95.05 (exact interpolation)
    val rows = (1 to 100).map(i => (Some(i.toLong), Some("a"))) ++
      Seq((Some(1000L), None), (None, Some("a")))
    val df = rows.toDF("v", "g")
    val out = Quality.winsorize(df, "v", "g", 0.05, 0.95)
    val a = out.filter($"g" === "a" && $"v".isNotNull).select("v", "clipped")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a(1L) == 5.95 && a(3L) == 5.95)
    assert(a(100L) == 95.05 && a(98L) == 95.05)
    assert(a(50L) == 50.0)
    // null group: no stats -> value passes through
    val ng = out.filter($"g".isNull).select("clipped").head.getDouble(0)
    assert(ng == 1000.0)
    // null value in a real group: stays null-clipped (clipped == null? no:
    // clipped = v = null) — the row survives with a null clipped value
    assert(out.filter($"v".isNull).select("clipped").head.isNullAt(0))
    intercept[IllegalArgumentException](Quality.winsorize(df, "v", "g", 0.9, 0.1))
  }

  test("histogram bins by floor(value/width); nulls excluded; counts total") {
    import spark.implicits._
    val df = Seq(Some(0.0), Some(24999.9), Some(25000.0), Some(70000.0), None)
      .toDF("v").withColumn("g", lit("s"))
    val out = Quality.histogram(df, "v", 25000.0, Seq("g")).collect()
    val bins = out.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n"), r.getAs[Double]("bin_lo"))).toMap
    assert(bins == Map(0L -> (2L, 0.0), 1L -> (1L, 25000.0), 2L -> (1L, 50000.0)))
    assert(out.map(_.getAs[Long]("n")).sum == 4) // null row excluded
    intercept[IllegalArgumentException](Quality.histogram(df, "v", 0.0))
  }

  test("cohenKappa: hand-computed kappa, perfect/chance/degenerate cases, " +
    "null labels drop") {
    import spark.implicits._
    // r1: A A A B B / r2: A A B B B -> po=4/5, pe=(3*2+2*3)/25=0.48,
    // kappa = 0.32/0.52 = 8/13
    val df = Seq(("A", "A"), ("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"))
      .toDF("r1", "r2")
    val r = Quality.cohenKappa(df, $"r1", $"r2").head
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("po") == 0.8)
    assert(r.getAs[Double]("pe") == 0.48)
    assert(math.abs(r.getAs[Double]("kappa") - 8.0 / 13.0) < 1e-15)
    // perfect agreement over 2 categories -> kappa exactly 1
    val perfect = Seq(("A", "A"), ("B", "B")).toDF("r1", "r2")
    assert(Quality.cohenKappa(perfect, $"r1", $"r2").head.getAs[Double]("kappa") == 1.0)
    // single shared category: pe=1 -> kappa is null (unmeasurable), not 1
    val degen = Seq(("A", "A"), ("A", "A")).toDF("r1", "r2")
    assert(Quality.cohenKappa(degen, $"r1", $"r2").head.isNullAt(3))
    // disjoint label sets: po=0, pe=0 -> kappa 0
    val disj = Seq(("X", "Y"), ("X", "Y")).toDF("r1", "r2")
    assert(Quality.cohenKappa(disj, $"r1", $"r2").head.getAs[Double]("kappa") == 0.0)
    // null labels drop before counting
    val withNull = Seq((Some("A"), Some("A")), (None, Some("B")),
      (Some("B"), None), (Some("B"), Some("B"))).toDF("r1", "r2")
    assert(Quality.cohenKappa(withNull, $"r1", $"r2").head.getAs[Long]("n") == 2)
  }

  test("thresholdSweep: hand-computed confusion counts, PR and F1 per threshold") {
    import spark.implicits._
    // scores [3,3,2,1], labels [T,F,T,F]; a null score drops, a null
    // label counts negative
    val df = Seq((Some(3L), Some(true)), (Some(3L), Some(false)),
      (Some(2L), Some(true)), (Some(1L), None),
      (None, Some(true))).toDF("s", "y")
    val out = Quality.thresholdSweep(df, "s", $"y" === true).collect()
    assert(out.map(_.getAs[Long]("threshold")).toSeq == Seq(3L, 2L, 1L))
    def row(t: Long) = out.find(_.getAs[Long]("threshold") == t).get
    // t=3: pp=2 (both 3s), tp=1; pos=2, tot=4
    assert(row(3).getAs[Long]("tp") == 1 && row(3).getAs[Long]("fp") == 1)
    assert(row(3).getAs[Long]("fn") == 1 && row(3).getAs[Long]("tn") == 1)
    assert(row(3).getAs[Double]("precision") == 0.5)
    assert(row(3).getAs[Double]("recall") == 0.5)
    assert(row(3).getAs[Double]("f1") == 0.5)
    // t=2: pp=3, tp=2 -> p=2/3, r=1, f1=0.8
    assert(row(2).getAs[Long]("tp") == 2 && row(2).getAs[Long]("fp") == 1)
    assert(row(2).getAs[Long]("fn") == 0 && row(2).getAs[Long]("tn") == 1)
    assert(row(2).getAs[Double]("f1") == 0.8)
    // t=1 (lowest attained score): everything predicted positive
    assert(row(1).getAs[Long]("tp") == 2 && row(1).getAs[Long]("fp") == 2)
    assert(row(1).getAs[Long]("tn") == 0 && row(1).getAs[Long]("fn") == 0)
    assert(row(1).getAs[Double]("recall") == 1.0)
    // confusion identity at every threshold: tp+fp+fn+tn == non-null-score rows
    assert(out.forall(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn") == 4))
    // recall is monotone non-decreasing as the threshold lowers
    val recalls = out.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
  }

  test("percentileNormalize: within-group percent ranks, tie sharing, " +
    "single-row group -> 0, null scores drop") {
    import spark.implicits._
    val df = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", Some(20L)),
      ("g", Some(40L)), ("h", Some(7L)), ("g", None)).toDF("src", "s")
    val out = Quality.percentileNormalize(df, "src", "s")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out(("g", 10L)) == 0.0)
    assert(out(("g", 20L)) == 1.0 / 3) // rank 2 of 4 -> (2-1)/(4-1)
    assert(out(("g", 40L)) == 1.0)
    assert(out(("h", 7L)) == 0.0)      // single-row group
    assert(out.size == 4)              // the null-score row dropped
  }

  test("mutualInfo: independence -> 0, identity -> nmi 1, constant " +
    "column -> null nmi, nulls drop") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // perfectly independent 2x2 (uniform product measure)
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val ri = Quality.mutualInfo(ind, $"x", $"y").head
    assert(ri.getAs[Long]("n") == 4 && ri.getAs[Long]("n_cells") == 4)
    assert(ri.getAs[Double]("mi") == 0.0 && ri.getAs[Double]("nmi") == 0.0)
    assert(ri.getAs[Double]("hx") == r6(math.log(2)))
    // x determines y exactly: mi == hx == hy, nmi == 1
    val dep = Seq(("a", "p"), ("a", "p"), ("b", "q")).toDF("x", "y")
    val rd = Quality.mutualInfo(dep, $"x", $"y").head
    val h = r6(-(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3))
    assert(rd.getAs[Double]("mi") == h && rd.getAs[Double]("hx") == h &&
      rd.getAs[Double]("hy") == h)
    assert(rd.getAs[Double]("nmi") == 1.0)
    // constant x: hx = 0 -> nmi unmeasurable; a null row drops from n
    val const = Seq((Some("a"), Some("p")), (Some("a"), Some("q")),
      (None, Some("p"))).toDF("x", "y")
    val rc = Quality.mutualInfo(const, $"x", $"y").head
    assert(rc.getAs[Long]("n") == 2 && rc.getAs[Double]("mi") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("nmi")))
  }

  test("benford: string-derived first digits, zero-filled grid, " +
    "hand-checked fractions, zero/null exclusion") {
    import spark.implicits._
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    // digits: 1 (from 123 and -19), 2 (from 25), plus excluded 0/null
    val df = Seq(Some(123L), Some(-19L), Some(25L), Some(0L), None)
      .map(v => (v, 0)).toDF("v", "ignored")
    val out = Quality.benford(df, "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.size == 9) // absent digits still report
    assert(out(1L)._1 == 2L && out(1L)._2 == 3L)
    assert(out(2L)._1 == 1L && out(9L)._1 == 0L)
    assert(out(1L)._3 == r6(2.0 / 3))
    assert(out(1L)._4 == r6(math.log(2.0) / math.log(10.0)))
    assert(out(9L)._4 == r6(math.log(1.0 + 1.0 / 9) / math.log(10.0)))
    // a perfectly Benford-weighted sample reads MAD ~ 0 (counts can't
    // hit the exact fractions, so just bound it)
    val row = Quality.benford(df, "v").head()
    assert(row.getAs[Double]("mad") > 0.0 &&
      row.getAs[Double]("chi2") > 0.0)
  }
}
