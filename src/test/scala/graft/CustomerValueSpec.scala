package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.olap.CustomerValue

/** RFM segmentation and Pareto/ABC against hand-computed expectations. */
class CustomerValueSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")

  test("rfm: hand-computed scores against exact percentile cutpoints, " +
    "tie lumping, segment fold") {
    // one tx each: recency 4..0, freq all 1, cents 1000..5000
    val tx = Seq((1L, d(1), 10.0), (2L, d(2), 20.0), (3L, d(3), 30.0),
      (4L, d(4), 40.0), (5L, d(5), 50.0)).toDF("cust", "dt", "amt")
    val out = CustomerValue.rfm(tx, "cust", "dt", "amt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getString(7))).toMap
    // recency cuts of {0..4} = [.8 1.6 2.4 3.2]; cents cuts
    // [1800 2600 3400 4200]; all-tied frequency lumps at score 1
    assert(out(1L) == ((4L, 1L, 1000L, 1L, 1L, 1L, "hibernating")))
    assert(out(2L) == ((3L, 1L, 2000L, 2L, 1L, 2L, "hibernating")))
    assert(out(3L) == ((2L, 1L, 3000L, 3L, 1L, 3L, "regular")))
    assert(out(4L) == ((1L, 1L, 4000L, 4L, 1L, 4L, "big_spender")))
    assert(out(5L) == ((0L, 1L, 5000L, 5L, 1L, 5L, "big_spender")))
  }

  test("rfm: multiple transactions aggregate before scoring") {
    val tx = Seq((1L, d(1), 10.0), (1L, d(9), 15.5), (2L, d(5), 99.99),
      (3L, d(2), 1.0), (4L, d(3), 2.0), (5L, d(4), 3.0))
      .toDF("cust", "dt", "amt")
    val r1 = CustomerValue.rfm(tx, "cust", "dt", "amt")
      .filter($"cust" === 1L).head()
    assert(r1.getLong(1) == 0L)    // last tx Jan 9 == corpus ref
    assert(r1.getLong(2) == 2L)    // two transactions
    assert(r1.getLong(3) == 2550L) // 10.00 + 15.50 in exact cents
  }

  test("plan gates: rfm scores WITHOUT any window sort (the whole " +
    "point vs ntile); paretoAbc windows are PARTITIONED by range " +
    "bucket — never an unpartitioned global sort") {
    val tx = Seq((1L, d(1), 10.0), (2L, d(2), 20.0), (3L, d(3), 30.0),
      (4L, d(4), 40.0), (5L, d(5), 50.0)).toDF("cust", "dt", "amt")
    val rfmPlan = CustomerValue.rfm(tx, "cust", "dt", "amt")
      .queryExecution.executedPlan.toString
    // percentile cutpoints broadcast back; no customer ever sorts
    assert(!rfmPlan.contains("Window"), rfmPlan)
    assert(rfmPlan.contains("BroadcastNestedLoopJoin") ||
      rfmPlan.contains("BroadcastExchange"), rfmPlan)
    val pDf = CustomerValue.paretoAbc(tx, "cust", "amt")
    pDf.collect() // finalize AQE so the walk sees the executed stages
    // the precise gate: WindowExec nodes must all carry a partition
    // spec — an empty one is the one-partition key-population sort
    // this operator's bucket-offset decomposition exists to avoid.
    // (A plain `SinglePartition`-string check would false-positive on
    // the legitimate one-row boundary/offset aggregates.)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })
    val nodes = walk(pDf.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, // the rank/cum report frame is a window
      pDf.queryExecution.executedPlan.toString)
    // every KEY window must carry a partition spec; the one allowed
    // unpartitioned window is the band-frame offset prefix-sum, whose
    // input is the occupied-band frame (never the key population) —
    // identified by its order spec: it sorts by the band id ALONE,
    // while any key window orders by (amount, key)
    assert(windows.forall(w => w.partitionSpec.nonEmpty ||
      (w.orderSpec.nonEmpty && w.orderSpec.flatMap(_.references.toSeq)
        .forall(a => a.name == "_graft_pb" || a.name == "_graft_tbe"))),
      "paretoAbc must never plan an unpartitioned Window over keys:\n" +
        pDf.queryExecution.executedPlan.toString)
    assert(windows.exists(_.partitionSpec.isEmpty),
      "expected the band-frame offset prefix-sum window:\n" +
        pDf.queryExecution.executedPlan.toString)
    // the band id is a pure per-row expression of amount_cents — no
    // shared boundary aggregate exists, so correctness must hold even
    // with exchange reuse DISABLED (the r11 shape relied on
    // ReuseExchange collapsing two percentile_approx evaluations; this
    // pins that the contract is gone, not merely surviving)
    val conf = spark.conf
    val prev = conf.get("spark.sql.exchange.reuse", "true")
    try {
      conf.set("spark.sql.exchange.reuse", "false")
      val rows = CustomerValue.paretoAbc(tx, "cust", "amt")
        .select("rank").orderBy("rank").collect().map(_.getLong(0))
      assert(rows.toSeq == (1L to 5L),
        "paretoAbc must not depend on exchange reuse for rank integrity")
    } finally conf.set("spark.sql.exchange.reuse", prev)
  }

  test("paretoAbc invariants on a many-bucket frame: ranks contiguous " +
    "1..n, cum_share monotone to 1.0, no key dropped or duplicated") {
    // 10k keys across many amount magnitudes — enough that every
    // quantile bucket is populated; a bounds-divergence or offset bug
    // would surface as a gap/duplicate in the global rank sequence
    val tx = (1 to 10000).map(i =>
      (i.toLong, ((i * 7919) % 9973 + 1).toDouble / 7)).toDF("k", "amt")
    val rows = CustomerValue.paretoAbc(tx, "k", "amt")
      .select("rank", "cum_share").orderBy("rank").collect()
    assert(rows.length == 10000)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10000L))
    val shares = rows.map(_.getDouble(1))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(math.abs(shares.last - 1.0) < 1e-9)
  }

  test("paretoAbc: hand-computed shares, head-inclusive class " +
    "boundaries, amount ties rank by key") {
    val tx = Seq(("a", 500.0), ("b", 300.0), ("c", 150.0), ("d", 50.0))
      .toDF("k", "amt")
    val out = CustomerValue.paretoAbc(tx, "k", "amt")
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(out.toSeq === Seq(
      ("a", 50000L, 1L, 0.5, 0.5, "A"),
      ("b", 30000L, 2L, 0.3, 0.8, "B"),
      ("c", 15000L, 3L, 0.15, 0.95, "C"),
      ("d", 5000L, 4L, 0.05, 1.0, "C")))
    // equal contributions rank deterministically by key
    val tie = Seq(("z", 1.0), ("y", 1.0)).toDF("k", "amt")
    val t2 = CustomerValue.paretoAbc(tie, "k", "amt")
      .orderBy("rank").collect().map(_.getString(0))
    assert(t2.toSeq === Seq("y", "z"))
    intercept[IllegalArgumentException] {
      CustomerValue.paretoAbc(tx, "k", "amt", aCut = 0.9, bCut = 0.7)
    }
  }

  test("rfm: bounded KLL cutpoints (opt-in cutpointK) equal the exact-" +
    "percentile DEFAULT row-for-row on the fixture — the exact regime, " +
    "where the interpolating sketch read is bit-identical") {
    import org.apache.spark.sql.functions.col
    val tx = Tables(spark, TestSpark.sf, "orders")
    val kll = CustomerValue.rfm(tx, "o_custkey", "o_orderdate",
      "o_totalprice", cutpointK = 1 << 16)
    val exact = CustomerValue.rfm(tx, "o_custkey", "o_orderdate",
      "o_totalprice")
    assert(kll.count() > 0 && kll.count() == exact.count())
    assert(kll.exceptAll(exact).isEmpty && exact.exceptAll(kll).isEmpty,
      "bounded-sketch cutpoints must reproduce exact percentile " +
        "scoring in the exact regime")
    intercept[IllegalArgumentException] {
      CustomerValue.rfm(tx, "o_custkey", "o_orderdate", "o_totalprice",
        cutpointK = 4)
    }
  }

  test("exactRegimeCutpointK: power of two, >= 2x the population, " +
    "floored at 2^16, loud past the 2^23 cap — and the derived k " +
    "clears the fixture's customer population with headroom") {
    import org.apache.spark.sql.functions.{col, count_distinct}
    assert(CustomerValue.exactRegimeCutpointK(0L) == (1 << 16))
    assert(CustomerValue.exactRegimeCutpointK(30000L) == (1 << 16))
    assert(CustomerValue.exactRegimeCutpointK(40000L) == (1 << 17))
    assert(CustomerValue.exactRegimeCutpointK(100000L) == (1 << 18))
    // power-of-two + >= 2n across a sweep, up to the cap boundary
    Seq(1L, 65536L, 65537L, 1000000L, 2097152L, 1L << 22).foreach { n =>
      val k = CustomerValue.exactRegimeCutpointK(n)
      assert(Integer.bitCount(k) == 1 && k >= 2L * n && k >= (1 << 16))
    }
    intercept[IllegalArgumentException] {
      CustomerValue.exactRegimeCutpointK((1L << 22) + 1)
    }
    // the x150 self-heal claim: the fixture population derives a k
    // that exceeds it (2x headroom), so the oracle query needs no
    // hand edit as fixtures grow until the loud 2^22 cap
    val customers = Tables(spark, TestSpark.sf, "orders")
      .filter(col("o_custkey").isNotNull)
      .agg(count_distinct(col("o_custkey"))).head.getLong(0)
    assert(CustomerValue.exactRegimeCutpointK(customers) >= 2 * customers)
  }

  test("amountBand: monotone non-increasing in the amount (band asc == " +
    "amount desc), equal amounts co-band, Long.MinValue bands LAST") {
    import org.apache.spark.sql.functions.col
    // strictly decreasing amounts spanning the extremes; sub = 2 so
    // small magnitudes are their own key (no co-banding noise except
    // where documented)
    val vals = Seq(Long.MaxValue, (1L << 40) + 7, 1L << 40, 12345L, 9L,
      3L, 2L, 1L, 0L, -1L, -2L, -12345L, -(1L << 40), Long.MinValue + 1,
      Long.MinValue)
    val bands = vals.toDF("v")
      .select(CustomerValue.amountBand(col("v"), 2).as("b"))
      .collect().map(_.getLong(0))
    // amounts are listed DESC, so bands must be non-decreasing
    assert(bands.zip(bands.tail).forall { case (a, b) => a <= b },
      s"bands not monotone: ${vals.zip(bands).mkString(", ")}")
    // MinValue strictly after the most negative representable-negation
    assert(bands.last > bands(bands.length - 2),
      "Long.MinValue must band strictly after MinValue+1")
    // equal amounts co-band trivially; near-equal large amounts within
    // one sub-band co-band (the documented ×(1+2^-sub) width)
    assert(bands(1) == bands(2), "same (octave, mantissa-bits) co-band")
  }

  test("paretoAbc tieBand: a conforming (monotone-non-decreasing-in-" +
    "key) secondary band leaves every output row identical — on a " +
    "mixed corpus (ties + spread + negatives + zero) AND on an " +
    "all-tie corpus, where it splits the hot partition") {
    import org.apache.spark.sql.functions.{col, floor}
    // heavy exact ties (43 keys share one amount), spread magnitudes,
    // a zero and a negative — every banding regime in one corpus
    val tx = ((1 to 200).map(i => (i.toLong,
        if (i % 3 == 0) 42.0 else ((i * 7919) % 997 + 1).toDouble)) ++
      Seq((201L, 0.0), (202L, -5.0), (203L, 42.0), (204L, 42.0)))
      .toDF("k", "amt")
    def rows(tb: Option[org.apache.spark.sql.Column]) =
      CustomerValue.paretoAbc(tx, "k", "amt", tieBand = tb)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getString(5))).toSeq
    val base = rows(None)
    val banded = rows(Some(floor(col("k") / 16)))
    assert(banded == base,
      "a conforming tieBand must not change any rank/share/class")
    // all-tie corpus: the one band every key shares sub-bands into
    // |tie values| window partitions, rank order still global key asc
    val ties = (1 to 5000).map(i => (i.toLong, 7.0)).toDF("k", "amt")
    val t0 = CustomerValue.paretoAbc(ties, "k", "amt")
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    val t1 = CustomerValue.paretoAbc(ties, "k", "amt",
        tieBand = Some(floor(col("k") / 512)))
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(t0 == (1L to 5000L) && t1 == t0)
    // and the sub-banding is live: the key window really partitions
    // by (band, tie value) — ≥ 2 partitions on the all-tie corpus
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val pDf = CustomerValue.paretoAbc(ties, "k", "amt",
      tieBand = Some(floor(col("k") / 512)))
    pDf.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })
    val keyWindows = walk(pDf.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }
    assert(keyWindows.exists(_.partitionSpec.exists(
      _.references.exists(_.name == "_graft_tbe"))),
      "the key window must partition by the tie sub-band")
  }

  test("paretoAbc: a large buckets target (2^16) completes in bounded " +
    "time — the band-frame offset fold is a prefix-sum, not an " +
    "O(bands^2) packed rescan") {
    val tx = (1 to 10000).map(i =>
      (i.toLong, ((i * 7919) % 9973 + 1).toDouble / 7)).toDF("k", "amt")
    val rows = CustomerValue.paretoAbc(tx, "k", "amt", buckets = 1 << 16)
      .select("rank").orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10000L))
  }

  test("paretoAbc: zero and negative amounts band AFTER all positives " +
    "(refund keys rank last; cum_share overshoots then returns to 1.0)") {
    val tx = Seq(("a", 3.0), ("b", 1.0), ("c", 0.0), ("d", -1.0))
      .toDF("k", "amt")
    val out = CustomerValue.paretoAbc(tx, "k", "amt")
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("a", 300L, 1L, 1.0, 1.0),
      ("b", 100L, 2L, 0.333333, 1.333333),
      ("c", 0L, 3L, 0.0, 1.333333),
      ("d", -100L, 4L, -0.333333, 1.0)))
  }
}
