package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.BloomJoin

/** Bloom-filter join prefiltering: exact-equivalence with the plain
  * semi-join, no false negatives, bounded false-positive rate, interpreted
  * == codegen parity, and the narrow (pre-shuffle) filter plan. */
class BloomSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // fact keys 0..9999; dim holds the 500 multiples of 20
  private lazy val fact = (0L until 10000L).toDF("fk")
  private lazy val dim = (0L until 10000L by 20L).toDF("dk")

  test("semiJoin result is identical to the plain left-semi join") {
    val got = BloomJoin.semiJoin(fact, "fk", dim, "dk")
    val want = fact.join(dim, $"fk" === $"dk", "left_semi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == 500)
  }

  test("prefilter keeps every true match (no false negatives) and bounds FPs") {
    val bytes = BloomJoin.buildFilter(dim, "dk", fpp = 0.01)
    val kept = BloomJoin.prefilter(fact, "fk", bytes)
    // all 500 real members survive
    assert(kept.join(dim, $"fk" === $"dk", "left_semi").count() == 500)
    // of the 9500 non-members, ~1% may false-positive; allow 5x headroom
    val fps = kept.join(dim, $"fk" === $"dk", "left_anti").count()
    assert(fps <= 9500 * 0.05, s"false positives: $fps")
    assert(kept.count() == 500 + fps)
  }

  test("string keys canonicalize via xxhash64 on both sides") {
    val sf = Seq("a", "b", "c", "d").toDF("k")
    val sd = Seq("b", "d", "zz").toDF("j")
    val got = BloomJoin.semiJoin(sf, "k", sd, "j")
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("b", "d"))
  }

  test("null fact keys drop, matching semi-join semantics") {
    val nf = Seq(Some(20L), None, Some(21L)).toDF("fk")
    val got = BloomJoin.semiJoin(nf, "fk", dim, "dk")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(20L))
  }

  test("mixed key type families are rejected (silent-drop hazard)") {
    val df = Seq(20.0, 21.0).toDF("fk") // double vs the dim's bigint
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(df, "fk", dim, "dk")
    }
    // all-integral pairs of different widths are fine (both cast long)
    val intFact = Seq(20, 21).toDF("fk")
    assert(BloomJoin.semiJoin(intFact, "fk", dim, "dk").count() == 1)
  }

  test("interpreted and codegen paths agree") {
    val bytes = BloomJoin.buildFilter(dim, "dk", fpp = 0.01)
    def run(codegen: String): Set[Long] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try BloomJoin.prefilter(fact, "fk", bytes)
        .collect().map(_.getLong(0)).toSet
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("false") == run("true"))
  }

  test("prefilter plan: narrow scan-side filter, no shuffle before the cut") {
    // a file-backed fact: an in-memory LocalRelation gets filter-folded at
    // plan time (ConvertToLocalRelation), which would hide the probe
    val events = Tables(spark, TestSpark.sf, "events")
    val dimIds = events.select($"user_id").limit(50)
    val bytes = BloomJoin.buildFilter(dimIds, "user_id", fpp = 0.01)
    val pre = BloomJoin.prefilter(events, "user_id", bytes)
    pre.collect()
    val p = pre.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      "the bloom probe must run before any shuffle:\n" + p)
    assert(p.toLowerCase.contains("bloommightcontain"),
      "probe expression missing from the plan:\n" + p)
    // the probe runs inside the scan's whole-stage-codegen span
    assert(p.contains("*(1) Filter bloommightcontain"),
      "probe must be codegen'd at the scan stage:\n" + p)
  }
}
