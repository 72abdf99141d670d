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
    // bounded-state cutpoints (approxK): bit-identical to the exact
    // path while each group's rows fit the sketch — the x150 machinery
    // applied to the per-group percentile state
    val approx = Quality.winsorize(df, "v", "g", 0.05, 0.95,
      approxK = 1024)
    assert(approx.exceptAll(out).isEmpty && out.exceptAll(approx).isEmpty,
      "winsorize(approxK) must equal the exact path in the exact regime")
  }

  test("robustOutliers(approxK): bounded-state median/MAD equals the " +
    "exact path in the exact regime") {
    import spark.implicits._
    val df = ((1 to 200).map(i => (((i * 37) % 100).toDouble, "a")) ++
      (1 to 50).map(i => (i.toDouble * 3, "b")) :+ ((9999.0, "a")))
      .toDF("v", "g")
    val exact = Quality.robustOutliers(df, "g", "v")
    val approx = Quality.robustOutliers(df, "g", "v", approxK = 1024)
    assert(exact.count() == approx.count())
    assert(approx.exceptAll(exact).isEmpty && exact.exceptAll(approx).isEmpty,
      "robustOutliers(approxK) must equal the exact path in the exact regime")
    // and the outlier actually flags in both
    assert(approx.filter($"v" === 9999.0).head
      .getAs[Boolean]("is_outlier"))
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

  test("thresholdSweep: hand-computed confusion counts, PR and F1 per " +
    "threshold; null scores AND null labels drop") {
    import spark.implicits._
    // scores [3,3,2], labels [T,F,T]; the null-score row drops (no
    // threshold to represent it) and the null-LABEL row drops too (the
    // groupAuc contract — counting it negative would silently skew
    // precision; this is the r10->r11 convention unification)
    val df = Seq((Some(3L), Some(true)), (Some(3L), Some(false)),
      (Some(2L), Some(true)), (Some(1L), None),
      (None, Some(true))).toDF("s", "y")
    val out = Quality.thresholdSweep(df, "s",
      when($"y".isNotNull, $"y" === true)).collect()
    // the null-label row's score 1 mints NO threshold row
    assert(out.map(_.getAs[Long]("threshold")).toSeq == Seq(3L, 2L))
    def row(t: Long) = out.find(_.getAs[Long]("threshold") == t).get
    // t=3: pp=2 (both 3s), tp=1; pos=2, tot=3
    assert(row(3).getAs[Long]("tp") == 1 && row(3).getAs[Long]("fp") == 1)
    assert(row(3).getAs[Long]("fn") == 1 && row(3).getAs[Long]("tn") == 0)
    assert(row(3).getAs[Double]("precision") == 0.5)
    assert(row(3).getAs[Double]("recall") == 0.5)
    assert(row(3).getAs[Double]("f1") == 0.5)
    // t=2 (lowest attained labeled score): everything predicted positive
    assert(row(2).getAs[Long]("tp") == 2 && row(2).getAs[Long]("fp") == 1)
    assert(row(2).getAs[Long]("fn") == 0 && row(2).getAs[Long]("tn") == 0)
    assert(row(2).getAs[Double]("f1") == 0.8)
    assert(row(2).getAs[Double]("recall") == 1.0)
    // confusion identity: tp+fp+fn+tn == labeled non-null-score rows
    assert(out.forall(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn") == 3))
    // recall is monotone non-decreasing as the threshold lowers
    val recalls = out.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
  }

  test("thresholdSweep: positive-free input reads NULL recall/f1 " +
    "(0/0 undefined), never NaN or 0.0; precision stays defined") {
    import spark.implicits._
    val df = Seq((3L, false), (2L, false), (2L, false)).toDF("s", "y")
    val out = Quality.thresholdSweep(df, "s", $"y").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("recall")), r.toString)
      assert(r.isNullAt(r.fieldIndex("f1")), r.toString)
      assert(r.getAs[Double]("precision") == 0.0)
      assert(r.getAs[Long]("tp") == 0L)
    }
  }

  test("thresholdSweep: maxDistinct guard raises loudly ABOVE the cap " +
    "with the binned-variant pointer, and not at it") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L).map(s => (s, s % 2 == 0)).toDF("s", "y")
    // 4 distinct scores at the cap: fine
    assert(Quality.thresholdSweep(df, "s", $"y", maxDistinct = 4L)
      .count() == 4)
    // one above: the in-plan raise_error fires with the advertised text
    val e = intercept[Exception] {
      Quality.thresholdSweep(df, "s", $"y", maxDistinct = 3L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val msg = messages(e).mkString("\n")
    assert(msg.contains("maxDistinct=3"), msg)
    assert(msg.contains("thresholdSweepBinned"), msg)
  }

  test("thresholdSweepBinned: equals the exact sweep on integer scores " +
    "at scale 1; half-up lattice rounding; null labels drop") {
    import spark.implicits._
    val df = (1 to 40).map(i => ((i % 7).toLong, i % 3 == 0)).toDF("s", "y")
    val exact = Quality.thresholdSweep(df, "s", $"y")
      .collect().map(_.toSeq).toSeq
    val binned = Quality.thresholdSweepBinned(df, "s", $"y", scale = 1.0)
      .collect().map(_.toSeq).toSeq
    // integer scores are lattice points at scale 1: identical output
    // except the threshold column's type (double lattice vs raw long)
    assert(binned.map(r => r.head.asInstanceOf[Double].toLong +: r.tail)
      == exact)
    // half-up quantization: 0.0005 -> 0.001, 0.00049 -> 0.0, and the
    // two rows landing on one lattice point merge into one threshold
    val cont = Seq((0.0005, true), (0.00049, false), (0.0014999, true))
      .toDF("s", "y")
    val rows = Quality.thresholdSweepBinned(cont, "s", $"y", scale = 1000.0)
      .collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq == Seq(0.001, 0.0))
    assert(rows.find(_.getAs[Double]("threshold") == 0.001)
      .get.getAs[Long]("tp") == 2L) // 0.0005 and 0.0014999 co-bin
    // null labels drop: the unlabeled row's score mints no threshold
    val withNull = Seq((Some(0.25), Some(true)), (Some(0.75), None))
      .toDF("s", "y")
    val t2 = Quality.thresholdSweepBinned(withNull, "s",
      when($"y".isNotNull, $"y" === true), scale = 1000.0).collect()
    assert(t2.map(_.getAs[Double]("threshold")).toSeq == Seq(0.25))
  }

  test("thresholdSweep plan: the per-score aggregate is shared across " +
    "the guard/total/window branches via exchange reuse, not recomputed") {
    import spark.implicits._
    val df = (1 to 100).map(i => ((i % 11).toLong, i % 3 == 0)).toDF("s", "y")
    val q = Quality.thresholdSweep(df, "s", $"y")
    q.collect() // finalize AQE
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      p.contains("reused"), "per-score exchange must be reused:\n" + p)
  }

  test("kappaFromCells: pe exact at >2^31-scale marginals where a " +
    "BIGINT cross-marginal product would wrap") {
    import spark.implicits._
    // 2x2 contingency in the billions: marginals r1 = (4e9, 6e9),
    // r2 = (5e9, 5e9); the cross product sum 4e9*5e9 + 6e9*5e9 = 5e19
    // overflows Long (max 9.2e18) — the DECIMAL(38,0) path must not
    // wrap. po = 7e9/1e10 = 0.7, pe = 5e19/1e20 = 0.5, kappa = 0.4.
    val cells = Seq(
      ("A", "A", 3000000000L), ("A", "B", 1000000000L),
      ("B", "A", 2000000000L), ("B", "B", 4000000000L)
    ).toDF("_r1", "_r2", "_c")
    val r = Quality.kappaFromCells(cells).head
    assert(r.getAs[Long]("n") == 10000000000L)
    assert(math.abs(r.getAs[Double]("po") - 0.7) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-12)
    // a wrapped product would have driven pe negative or > 1 — pin the
    // sane range explicitly so a future regression reads loudly
    assert(r.getAs[Double]("pe") > 0 && r.getAs[Double]("pe") < 1)
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
