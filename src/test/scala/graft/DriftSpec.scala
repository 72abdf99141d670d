package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Drift

/** Drift-metric laws the x78 value oracle can't express, plus the
  * streaming monitor composition (per-micro-batch drift against a
  * static reference — the production shape of "alert when a source
  * goes weird"). */
class DriftSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("identical distributions have kl == 0 and chi2 == 0 exactly") {
    // two groups with the SAME value distribution (scaled copies)
    val rows = Seq.tabulate(60)(i => ("a", s"v${i % 3}")) ++
      Seq.tabulate(120)(i => ("b", s"v${i % 3}"))
    val out = Drift.categoricalDrift(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    out.values.foreach { case (kl, chi2) =>
      assert(kl == 0.0 && chi2 == 0.0, s"uniform groups must read zero, got $kl/$chi2")
    }
  }

  test("kl is non-negative and a skewed group dominates a matched one") {
    val rows = Seq.tabulate(90)(i => ("ok", s"v${i % 3}")) ++
      Seq.tabulate(90)(i => ("skew", if (i < 80) "v0" else s"v${i % 3}"))
    val out = Drift.categoricalDrift(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(_ >= -1e-12))
    assert(out("skew") > out("ok") + 0.05,
      s"skewed group must dominate: ${out("skew")} vs ${out("ok")}")
  }

  test("numeric PSI: identical distributions read exactly 0, a shifted " +
    "group dominates, clamping keeps out-of-range mass") {
    // groups a/b: same shape (scaled); group c: mass shifted upward
    val rows = Seq.tabulate(60)(i => ("a", (i % 10) * 10.0)) ++
      Seq.tabulate(120)(i => ("b", (i % 10) * 10.0)) ++
      Seq.tabulate(60)(i => ("c", 80.0 + (i % 2) * 10.0))
    val out = Drift.numericDrift(rows.toDF("g", "v"), "g", "v",
        nBins = 5, lo = 0.0, hi = 100.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a and b bin identically (p == q per bin before c is added...
    // c shifts the POOL, so a/b read equal, small, positive-ish;
    // c must dominate both by a wide margin)
    assert(math.abs(out("a") - out("b")) < 1e-12, s"matched groups differ: $out")
    assert(out("c") > out("a") * 3 + 0.1, s"shifted group must dominate: $out")
    // exact zero when the pool == the group (single group: p == q)
    val solo = Drift.numericDrift(
        Seq.tabulate(50)(i => ("only", i * 2.0)).toDF("g", "v"),
        "g", "v", nBins = 4, lo = 0.0, hi = 100.0)
      .head.getDouble(2)
    assert(solo == 0.0, s"pool-vs-self must be exactly 0, got $solo")
    // out-of-range values clamp into edge bins, not vanish: n counts them
    val clamped = Drift.numericDrift(
        Seq(("g", -5.0), ("g", 999.0), ("g", 50.0)).toDF("g", "v"),
        "g", "v", nBins = 2, lo = 0.0, hi = 100.0)
      .head.getLong(1)
    assert(clamped == 3L)
  }

  test("foreachBatch drift monitor flags the skewed micro-batch only") {
    import org.apache.spark.sql.streaming.Trigger
    // two staged parquet files, consumed one per micro-batch
    val src = java.nio.file.Files.createTempDirectory("drift-src")
    val healthy = Seq.tabulate(300)(i => s"v${i % 3}").toDF("v")
    val skewed = Seq.tabulate(300)(i => if (i < 280) "v0" else s"v${i % 3}").toDF("v")
    // stage as FLAT files (the file-stream source does not descend
    // into non-partition subdirectories)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory("drift-stage")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), src.resolve(name))
    }
    stage(healthy, "b0.parquet")
    stage(skewed, "b1.parquet")
    val reference = healthy // the known-good distribution to monitor against
    val alerts = scala.collection.mutable.Map.empty[Long, Double]
    val q = spark.readStream.schema(healthy.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val tagged = batch.withColumn("g", lit("batch"))
          .unionByName(reference.withColumn("g", lit("ref")))
        val kl = Drift.categoricalDrift(tagged, "g", "v")
          .filter(col("g") === "batch")
          .select(col("kl")).head.getDouble(0)
        alerts.synchronized { alerts(id) = kl }
      }
      .start()
    q.awaitTermination()
    assert(alerts.size == 2, s"expected 2 micro-batches, got $alerts")
    val (low, high) = (alerts.values.min, alerts.values.max)
    assert(low < 0.01, s"healthy batch should read ~0 drift, got $low")
    assert(high > 0.2, s"skewed batch must alert, got $high")
  }

  test("foreachBatch PSI monitor: the numeric twin flags the shifted " +
    "micro-batch only") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("psi-src")
    val healthy = Seq.tabulate(300)(i => ((i % 10) * 10.0)).toDF("v")
    val shifted = Seq.tabulate(300)(i => (70.0 + (i % 3) * 10.0)).toDF("v")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory("psi-stage")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), src.resolve(name))
    }
    stage(healthy, "b0.parquet")
    stage(shifted, "b1.parquet")
    val reference = healthy
    val alerts = scala.collection.mutable.Map.empty[Long, Double]
    val q = spark.readStream.schema(healthy.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val tagged = batch.withColumn("g", lit("batch"))
          .unionByName(reference.withColumn("g", lit("ref")))
        val psi = Drift.numericDrift(tagged, "g", "v",
            nBins = 10, lo = 0.0, hi = 100.0)
          .filter(col("g") === "batch")
          .select(col("psi")).head.getDouble(0)
        alerts.synchronized { alerts(id) = psi }
      }
      .start()
    q.awaitTermination()
    assert(alerts.size == 2, s"expected 2 micro-batches, got $alerts")
    val (low, high) = (alerts.values.min, alerts.values.max)
    // PSI reading: < 0.1 stable, > 0.25 major shift
    assert(low < 0.1, s"healthy batch should read stable, got $low")
    assert(high > 0.25, s"shifted batch must alert, got $high")
    // stream == batch parity (the house pattern): each streamed alert
    // must equal the batch numericDrift over the same (batch, reference)
    // union. Bin counts are exact longs, so the only latitude is the
    // 10-term double fold's summation order — hence the 1e-12 band, not
    // a threshold check.
    def batchPsi(df: org.apache.spark.sql.DataFrame): Double =
      Drift.numericDrift(
          df.withColumn("g", lit("batch"))
            .unionByName(reference.withColumn("g", lit("ref"))),
          "g", "v", nBins = 10, lo = 0.0, hi = 100.0)
        .filter(col("g") === "batch")
        .select(col("psi")).head.getDouble(0)
    val expected = Seq(batchPsi(healthy), batchPsi(shifted)).sorted
    val got = alerts.values.toSeq.sorted
    expected.zip(got).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-12,
        s"stream PSI diverged from batch: stream=$got batch=$expected")
    }
  }
  test("jensenShannon: hand-computed disjoint-support fixture, zero on " +
    "identical mixes, ln 2 ceiling") {
    // A = {a,a}, B = {b,b}; pooled q = (.5, .5)
    // jsd(A) = .5·1·ln(1/.75) + .5·.5·ln(.5/.75) + .5·.5·ln(.5/.25)
    val df = Seq(("A", "a"), ("A", "a"), ("B", "b"), ("B", "b")).toDF("g", "v")
    val out = Drift.jensenShannon(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A") == ((2L, 0.215762)) && out("B") == ((2L, 0.215762)))
    out.values.foreach { case (_, j) => assert(j >= 0 && j <= math.log(2.0) + 1e-9) }
    // identical per-group mixes: every group == pooled -> exactly 0,
    // no smoothing artifact (the KL/PSI eps caveat does not exist here)
    val same = (Seq.tabulate(30)(i => ("a", s"v${i % 3}")) ++
      Seq.tabulate(60)(i => ("b", s"v${i % 3}"))).toDF("g", "v")
    Drift.jensenShannon(same, "g", "v").collect()
      .foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("bhCorrect: textbook step-up rejection set, running-min q, " +
    "cap at 1, null p excluded from the family") {
    // α = 0.1, m = 5: critical values i·α/m = .02 .04 .06 .08 .10;
    // step-up k = 3 (p₃ = .04 ≤ .06, p₄ = .20 > .08)
    val df = Seq(("a", Some(0.01)), ("b", Some(0.02)), ("c", Some(0.04)),
      ("d", Some(0.20)), ("e", Some(0.90)), ("skip", None))
      .toDF("id", "p")
    val out = Drift.bhCorrect(df, "id", "p", alpha = 0.1)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(out.map(_._1).toSeq === Seq("a", "b", "c", "d", "e"))
    assert(out.forall(_._3 == 5L)) // null row never inflates m
    // q = running min from the tail of m·p/i: .05 .05 .066667 .25 .9
    assert(out.map(_._4).toSeq === Seq(0.05, 0.05, 0.066667, 0.25, 0.9))
    assert(out.map(_._5).toSeq ===
      Seq(true, true, true, false, false))
    // the running min makes q monotone when raw adjusted p is not:
    // raw = .03 .06 .041 -> q = .03 .041 .041, all ≤ α = .05
    val nm = Seq(("a", 0.01), ("b", 0.04), ("c", 0.041)).toDF("id", "p")
    val o2 = Drift.bhCorrect(nm, "id", "p", alpha = 0.05)
      .orderBy("rank").collect().map(r => (r.getDouble(4), r.getBoolean(5)))
    assert(o2.toSeq === Seq((0.03, true), (0.041, true), (0.041, true)))
    // q caps at 1; equal p ties rank deterministically on id
    val cap = Seq(("z", 0.9), ("y", 0.9)).toDF("id", "p")
    val o3 = Drift.bhCorrect(cap, "id", "p", alpha = 0.1)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getDouble(4)))
    assert(o3.toSeq === Seq(("y", 0.9), ("z", 0.9))) // q2 = .9, q1 = min(1.8→.9)
  }

  test("ksDistance: exact discrete sup vs pooled; zero for the pool " +
    "itself; deterministic under repartition") {
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val out = Drift.ksDistance(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // pooled ECDF: 1->.4, 2->.8, 3->1; A: 2/3, 1, 1 -> sup 4/15; B: 0, .5, 1 -> .4
    assert(out("A")._1 == 3L && math.abs(out("A")._2 - 4.0 / 15) < 1e-15)
    assert(out("B")._1 == 2L && math.abs(out("B")._2 - 0.4) < 1e-15)
    val solo = Seq(("only", 1L), ("only", 5L), ("only", 9L)).toDF("g", "v")
    Drift.ksDistance(solo, "g", "v").collect()
      .foreach(r => assert(r.getDouble(2) == 0.0))
    val rep = Drift.ksDistance(df.repartition(5), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep == out.map { case (k, (_, v)) => k -> v })
  }
}
