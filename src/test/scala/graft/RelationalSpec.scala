package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Relational, Sampling}

/** ext.Relational (as-of join, range join, sessionization) and
  * Sampling.stratifiedSample: correctness against brute-force
  * formulations on a deterministic fixture, boundary semantics, and the
  * plan shapes that make these operators scale (no nested-loop joins,
  * minimal exchanges).
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random fixture: 3 keys, interleaved times with
  // deliberate collisions (t repeats across sides and within sides)
  private lazy val leftDf = Seq(
    // (key, lt, lid)
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 20L, 3L), ("a", 35L, 4L),
    ("b", 5L, 5L), ("b", 50L, 6L),
    ("c", 7L, 7L)
  ).toDF("k", "lt", "lid")

  private lazy val rightDf = Seq(
    // (key, rt, rv) — unique (k, rt) as asofJoin's tie contract expects
    ("a", 8L, "a8"), ("a", 20L, "a20"), ("a", 30L, "a30"),
    ("b", 60L, "b60"),
    ("d", 1L, "d1")
  ).toDF("k", "rt", "rv")

  test("asofJoin matches the brute-force window formulation") {
    val got = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt",
      Seq("rt", "rv"))
      .select($"k", $"lt", $"lid", $"asof_rt", $"asof_rv")

    // brute force: theta join on rt <= lt, keep max-rt right row per left
    val joined = leftDf.join(rightDf, Seq("k"), "left")
      .filter($"rt".isNull || $"rt" <= $"lt")
    val w = Window.partitionBy($"lid").orderBy($"rt".desc_nulls_last)
    val expect = joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"k", $"lt", $"lid", $"rt".as("asof_rt"), $"rv".as("asof_rv"))
      // left rows whose only join output had rt > lt were filtered out
      // entirely above; restore them as null-matches
      .unionByName(
        leftDf.join(joined.select($"lid").distinct(), Seq("lid"), "left_anti")
          .withColumn("asof_rt", lit(null).cast("long"))
          .withColumn("asof_rv", lit(null).cast("string"))
          .select($"k", $"lt", $"lid", $"asof_rt", $"asof_rv"))

    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"got=${got.collect().mkString(",")} expect=${expect.collect().mkString(",")}")
  }

  test("asofJoin semantics: inclusive tie, no-prior-row nulls, key isolation") {
    val out = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt",
      Seq("rv")).collect().map(r =>
        r.getAs[Long]("lid") -> Option(r.getAs[String]("asof_rv"))).toMap
    assert(out(2) == Some("a20") && out(3) == Some("a20"),
      "rt == lt must match (inclusive as-of)")
    assert(out(1) == Some("a8"), "plain latest-before")
    assert(out(4) == Some("a30"), "skips future rows")
    assert(out(5) == None, "b@5 has no prior b row")
    assert(out(6) == None, "b@50: b's only right row is at 60 (future)")
    assert(out(7) == None, "c never appears on the right (d must not leak)")
  }

  test("asofJoin forward direction: closest right row at-or-after") {
    val out = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt",
      Seq("rv"), forward = true).collect().map(r =>
        r.getAs[Long]("lid") -> Option(r.getAs[String]("asof_rv"))).toMap
    assert(out(1) == Some("a20"), "a@10 → next right is a20")
    assert(out(2) == Some("a20") && out(3) == Some("a20"),
      "rt == lt matches forward too (inclusive)")
    assert(out(4) == None, "a@35: no right row at-or-after")
    assert(out(5) == Some("b60"), "b@5 → b60 is ahead")
    assert(out(6) == Some("b60"))
    assert(out(7) == None, "c has no right rows")
  }

  test("asofJoin output row count == left row count (never explodes)") {
    val out = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt", Seq("rv"))
    assert(out.count() == leftDf.count())
    assert(out.columns.toSeq ==
      leftDf.columns.toSeq :+ "asof_rv", "left schema + prefixed payload")
  }

  // AQE's toString prints the final plan AND the pre-adaptive initial
  // plan; count shuffles in the executed (final) section only
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("asofJoin plans with no join node and a single exchange") {
    val out = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt", Seq("rv"))
    val p = finalPlan(out)
    assert(!p.contains("Join"), "as-of must not plan a join:\n" + p)
    assert("Exchange".r.findAllIn(p).size == 1,
      "expected exactly one shuffle:\n" + p)
  }

  test("asofJoin guards reserved/output column collisions") {
    intercept[IllegalArgumentException] {
      Relational.asofJoin(leftDf.withColumn("asof_rv", lit(1)), rightDf,
        Seq("k"), "lt", "rt", Seq("rv"))
    }
    intercept[IllegalArgumentException] {
      Relational.asofJoin(leftDf, rightDf.withColumn("_graft_t", lit(1)),
        Seq("k"), "lt", "rt", Seq("rv"))
    }
  }

  private lazy val points = Seq(
    ("a", 0L, 100L), ("a", 10L, 101L), ("a", 19L, 102L), ("a", 20L, 103L),
    ("a", 25L, 104L), ("b", 10L, 105L), ("c", 10L, 106L)
  ).toDF("k", "pt", "pid")

  private lazy val intervals = Seq(
    // [s, e) — iid 1 spans multiple bins at binSeconds=10
    ("a", 10L, 21L, 1L), ("a", 18L, 20L, 2L), ("b", 0L, 5L, 3L),
    ("d", 0L, 100L, 4L)
  ).toDF("k", "s", "e", "iid")

  test("rangeJoin matches the brute-force theta join, exactly once per pair") {
    val got = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e",
      binSeconds = 10L).select($"pid", $"iid")
    val expect = points.join(intervals.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"pt" >= $"s" && $"pt" < $"e")
      .select($"pid", $"iid")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"got=${got.collect().mkString(",")} expect=${expect.collect().mkString(",")}")
    // multi-bin interval 1 matched its in-range points exactly once each
    val dup = got.groupBy($"pid", $"iid").count().filter($"count" > 1)
    assert(dup.isEmpty, "pair emitted more than once")
  }

  test("rangeJoin boundary semantics: start inclusive, end exclusive") {
    val got = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e",
      binSeconds = 10L).select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got.contains((101L, 1L)), "pt == start must match")
    assert(!got.contains((103L, 2L)), "pt == end must NOT match")
    assert(got.contains((102L, 2L)), "interior point")
    assert(!got.contains((106L, 4L)), "key isolation")
  }

  test("rangeJoin drops empty/inverted intervals instead of exploding bins") {
    // end <= start: [s, e) is empty — and sequence() must never see it
    // (sequence(5, 1) counts DOWN by default; a corrupt interval like
    // start=1.7e9/end=0 would generate a ~28M-element bin array)
    val corrupt = Seq(("a", 20L, 20L, 10L), ("a", 1700000000L, 0L, 11L))
      .toDF("k", "s", "e", "iid")
    val out = Relational.rangeJoin(points, corrupt, Seq("k"), "pt", "s", "e", 60L)
    assert(out.isEmpty, "empty and inverted intervals must match nothing")
  }

  test("rangeJoin rejects ambiguous non-key column overlap") {
    intercept[IllegalArgumentException] {
      Relational.rangeJoin(points.withColumn("extra", lit(1)),
        intervals.withColumn("extra", lit(2)), Seq("k"), "pt", "s", "e", 10L)
    }
  }

  test("rangeJoin plans an equi-join, not a nested loop") {
    val out = Relational.rangeJoin(points, intervals, Seq("k"), "pt", "s", "e", 10L)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "range join degenerated to a nested loop:\n" + p)
  }

  private lazy val aIvs = Seq(
    // (k, s, e, aid) — spans multiple bins at binSeconds=10
    ("a", 0L, 25L, 1L), ("a", 30L, 40L, 2L), ("b", 5L, 15L, 3L)
  ).toDF("k", "as_", "ae", "aid")

  private lazy val bIvs = Seq(
    ("a", 20L, 35L, 7L), ("a", 40L, 50L, 8L), ("b", 15L, 25L, 9L),
    ("c", 0L, 100L, 10L)
  ).toDF("k", "bs", "be", "bid")

  test("overlapJoin matches the brute-force theta join, exactly once per pair") {
    val got = Relational.overlapJoin(aIvs, bIvs, Seq("k"),
      "as_", "ae", "bs", "be", binSeconds = 10L)
      .select($"aid", $"bid").as[(Long, Long)].collect()
    val expect = aIvs.join(bIvs.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"as_" < $"be" && $"bs" < $"ae")
      .select($"aid", $"bid").as[(Long, Long)].collect()
    assert(got.sorted.toSeq == expect.sorted.toSeq,
      s"got=${got.mkString(",")} expect=${expect.mkString(",")}")
    assert(got.length == got.toSet.size, "pair emitted more than once")
    // the multi-bin overlap (1,7): [0,25)∩[20,35) spans bins 2..2 only,
    // but both intervals cover bins {0,1,2} and {2,3} — one emission
    assert(got.toSet.contains((1L, 7L)))
  }

  test("overlapJoin plans an equi-join, not a nested loop") {
    val out = Relational.overlapJoin(aIvs, bIvs, Seq("k"),
      "as_", "ae", "bs", "be", 10L)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "overlap join degenerated to a nested loop:\n" + p)
  }

  test("asofJoin: null times never match, identically in both directions") {
    // a null rightTime must not act as "before everything" (backward)
    // or vanish asymmetrically (forward); a null leftTime row gets a
    // null match either way
    val l = Seq(("a", Some(10L), 1L), ("a", None, 2L)).toDF("k", "lt", "lid")
    val r = Seq(("a", Some(5L), "five"), ("a", None, "NULLTIME"))
      .toDF("k", "rt", "rv")
    Seq(false, true).foreach { fwd =>
      val out = Relational.asofJoin(l, r, Seq("k"), "lt", "rt", Seq("rv"),
        forward = fwd).collect()
        .map(x => x.getAs[Long]("lid") -> Option(x.getAs[String]("asof_rv")))
        .toMap
      assert(out(2L) == None, s"forward=$fwd: null leftTime must match nothing")
      assert(out(1L) != Some("NULLTIME"),
        s"forward=$fwd: null rightTime row must never be selected")
    }
  }

  test("overlapJoin boundary: touching half-open intervals do not overlap") {
    // a=[30,40) and b=[40,50) touch at 40 — no overlap; b=[20,35) does
    val got = Relational.overlapJoin(aIvs, bIvs, Seq("k"),
      "as_", "ae", "bs", "be", 10L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(!got.contains((2L, 8L)), "touching endpoints must not match")
    assert(got.contains((2L, 7L)), "[30,40) ∩ [20,35) overlaps")
    assert(got.contains((3L, 9L)) == false,
      "b-side [5,15) vs [15,25): touching, no overlap")
    assert(!got.exists(_._2 == 10L), "key isolation (c only on one side)")
  }

  private lazy val clickstream = Seq(
    // user 1: two sessions — gap of exactly 30 keeps, 31 cuts
    (1L, 0L, 1L), (1L, 30L, 2L), (1L, 61L, 3L),
    // user 2: single event
    (2L, 1000L, 4L),
    // user 3: tie on time, ordered by id
    (3L, 5L, 5L), (3L, 5L, 6L), (3L, 100L, 7L)
  ).toDF("user_id", "t", "eid")

  test("sessionize: boundary at gap (exclusive), per-key ordinals, ties") {
    val out = Relational.sessionize(clickstream, Seq("user_id"), "t", "eid",
      gapSeconds = 30L)
      .select($"eid", $"session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L, "gap == gapSeconds stays in session")
    assert(out(3L) == 2L, "gap > gapSeconds cuts")
    assert(out(4L) == 1L, "singleton key starts at 1")
    assert(out(5L) == 1L && out(6L) == 1L && out(7L) == 2L)
  }

  test("sessionStats: partitions the rows, windows never overlap-merge") {
    val stats = Relational.sessionStats(clickstream, Seq("user_id"), "t", "eid", 30L)
    assert(stats.agg(sum($"n_events")).as[Long].head == clickstream.count())
    // within a key, next session starts more than gap after previous end
    val w = Window.partitionBy($"user_id").orderBy($"session_id")
    val bad = stats.withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull && $"session_start" - $"prev_end" <= 30L)
    assert(bad.isEmpty, "adjacent sessions within gap of each other")
  }

  test("sessionStats plans a single exchange (window + agg share partitioning)") {
    val stats = Relational.sessionStats(clickstream, Seq("user_id"), "t", "eid", 30L)
    val p = finalPlan(stats)
    assert("Exchange".r.findAllIn(p).size == 1,
      "sessionize → stats should be one shuffle:\n" + p)
  }

  private lazy val strata = spark.range(4000)
    .select($"id", (when($"id" % 4 === 0, "error")
      .when($"id" % 4 === 1, "view").otherwise("other")).as("s"))

  test("stratifiedSample: per-stratum rates, determinism, isolation") {
    val fr = Map("error" -> 1.0, "view" -> 0.1)
    val kept = Sampling.stratifiedSample(strata, "id", "s", "t1", fr, 0.5)
    val byStratum = kept.groupBy($"s").count().as[(String, Long)].collect().toMap
    assert(byStratum("error") == 1000L, "frac 1.0 keeps every row")
    assert(byStratum("view") > 40 && byStratum("view") < 180,
      s"frac 0.1 of 1000: got ${byStratum("view")}")
    assert(byStratum("other") > 850 && byStratum("other") < 1150,
      s"default 0.5 of 2000: got ${byStratum("other")}")
    // deterministic: same call → identical rows
    val again = Sampling.stratifiedSample(strata, "id", "s", "t1", fr, 0.5)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    // isolation: changing one stratum's frac leaves other strata untouched
    val tweaked = Sampling.stratifiedSample(strata, "id", "s", "t1",
      fr.updated("error", 0.2), 0.5)
    assert(kept.filter($"s" =!= "error").exceptAll(tweaked.filter($"s" =!= "error")).isEmpty)
    // subsample nesting within a stratum: 0.2 ⊂ 1.0 trivially; also 0.05 ⊂ 0.1
    val tighter = Sampling.stratifiedSample(strata, "id", "s", "t1",
      fr.updated("view", 0.05), 0.5)
    assert(tighter.filter($"s" === "view")
      .exceptAll(kept.filter($"s" === "view")).isEmpty,
      "smaller frac must select a subset (threshold monotonicity)")
  }

  test("stratifiedSample: separator-bearing strata stay unambiguous; null draws default") {
    // "web/cc" + id "1" vs "web" + id "cc/1" must NOT hash identically:
    // with frac(web/cc)=1.0 and default=0.0, only the web/cc rows survive
    val tricky = Seq(("web/cc", "1"), ("web", "cc/1")).toDF("s", "id")
    val kept = Sampling.stratifiedSample(tricky, "id", "s", "amb",
      Map("web/cc" -> 1.0), 0.0)
    assert(kept.collect().map(_.getString(0)).toSeq == Seq("web/cc"),
      "length prefix must disambiguate the (stratum, id) encoding")
    // null stratum: falls to defaultFrac (1.0 keeps, 0.0 drops) — never NPEs
    val withNull = Seq((null.asInstanceOf[String], "7")).toDF("s", "id")
    assert(Sampling.stratifiedSample(withNull, "id", "s", "amb", Map(), 1.0)
      .count() == 1)
    assert(Sampling.stratifiedSample(withNull, "id", "s", "amb", Map(), 0.0)
      .isEmpty)
  }

  test("weightedSample: rate 1 keeps all, 0/null keep none, monotone, deterministic") {
    val rows = spark.range(2000).select($"id",
      (when($"id" % 4 === 0, 1.0).when($"id" % 4 === 1, 0.5)
        .when($"id" % 4 === 2, 0.0).otherwise(lit(null))).as("rate"))
    val kept = Sampling.weightedSample(rows, "id", "w", col("rate"))
    val byRate = kept.groupBy($"rate").count()
      .collect().map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    assert(byRate(Some("1.0")) == 500L, "rate 1.0 keeps every row")
    assert(!byRate.contains(Some("0.0")), "rate 0.0 keeps nothing")
    assert(!byRate.contains(None), "null rate keeps nothing")
    val half = byRate(Some("0.5"))
    assert(half > 180 && half < 320, s"rate 0.5 of 500: got $half")
    // deterministic + monotone: rate 0.25 selects a subset of rate 0.5
    val r25 = Sampling.weightedSample(
      rows.withColumn("rate", lit(0.25)), "id", "w", col("rate"))
    val r50 = Sampling.weightedSample(
      rows.withColumn("rate", lit(0.5)), "id", "w", col("rate"))
    assert(r25.select($"id").exceptAll(r50.select($"id")).isEmpty,
      "smaller rate must select a subset (threshold monotonicity)")
    val p = kept.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "weighted sampling must stay narrow:\n" + p)
  }

  test("samplers: null ids are never selected (null-propagating hash key)") {
    val rows = Seq(Some(1L), Some(2L), None).toDF("id")
    // the hash filter always runs in bernoulliSample, so a null id drops
    // even at frac 1.0 (null key fails every comparison); only
    // preciseBernoulliSample's frac-1.0 SHORT-CIRCUIT passes rows through
    assert(Sampling.bernoulliSample(rows, "id", "n", 1.0).count() == 2)
    assert(Sampling.preciseBernoulliSample(rows, "id", "n", 1.0).count() == 3)
    assert(Sampling.bernoulliSample(rows, "id", "n", 0.9999)
      .filter($"id".isNull).count() == 0, "null id must never hash-select")
    assert(Sampling.weightedSample(rows, "id", "n", lit(0.9999))
      .filter($"id".isNull).count() == 0)
    // hashSplit: null bucket fails both < guards → remainder split
    val split = Sampling.hashSplit(rows, "id", "n", 0.5, 0.25)
      .filter($"id".isNull).select($"split").as[String].collect()
    assert(split.toSeq == Seq("test"))
  }

  test("stratifiedSample: frac 0 drops the stratum; no shuffle in the plan") {
    val kept = Sampling.stratifiedSample(strata, "id", "s", "t1",
      Map("error" -> 0.0), 1.0)
    assert(kept.filter($"s" === "error").isEmpty)
    assert(kept.filter($"s" =!= "error").count() == 3000)
    val p = kept.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "sampling must stay a narrow filter:\n" + p)
  }
}
