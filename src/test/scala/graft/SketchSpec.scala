package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates — the approximate path for 100 TB cardinality and
  * quantile questions, where exact `COUNT(DISTINCT)` shuffles every key
  * and exact `percentile` collects every value per group. Spark's
  * built-ins (`approx_count_distinct` = HyperLogLog++,
  * `percentile_approx` = KLL-style quantile summary) are mergeable
  * map-side sketches: fixed memory per partition, one narrow combine —
  * exactly the shape a cluster-scale profile query needs. These specs
  * pin the error contracts the exact oracled queries (s08, x28) can't:
  * the sketches must land within their documented bounds of the exact
  * answers, and must be deterministic (HLL register-max and quantile
  * summary merges are order-insensitive) so results are reproducible
  * across runs and partitionings.
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val events = Tables(spark, sf, "events")
  private lazy val docs = Tables(spark, sf, "documents")

  test("approx_count_distinct lands within rsd of exact, deterministically") {
    val exact = events.select(countDistinct(col("user_id"))).head.getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), rsd = 0.02))
      .head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"HLL err $err: approx=$approx exact=$exact")
    // register-max merge is commutative: a different partitioning must
    // produce the identical estimate, not just a close one
    val repartitioned = events.repartition(13, col("event_type"))
      .select(approx_count_distinct(col("user_id"), rsd = 0.02)).head.getLong(0)
    assert(repartitioned == approx, "HLL estimate depends on partitioning")
  }

  test("approx_count_distinct per group tracks exact within tolerance") {
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / math.max(n, 1) <= 0.08,
        s"group $k: approx=${approx(k)} exact=$n")
    }
  }

  test("percentile_approx honors its rank-accuracy contract vs exact") {
    // guarantee: rank error <= n / accuracy. Check the returned value's
    // true rank sits within that band of the target rank.
    val accuracy = 1000
    val n = docs.count()
    val tol = math.ceil(n.toDouble / accuracy).toLong + 1
    Seq(0.5, 0.9).foreach { p =>
      val v = docs.select(percentile_approx(col("n_chars"), lit(p), lit(accuracy)))
        .head.get(0).toString.toDouble
      // ties: the value occupies the whole rank interval [count(<v),
      // count(<=v)] — the contract holds if the target rank is within
      // tol of ANY rank in that interval, not of its upper end alone
      val lo = docs.filter(col("n_chars") < v).count()
      val hi = docs.filter(col("n_chars") <= v).count()
      val target = (p * n).toLong
      assert(target >= lo - tol - 1 && target <= hi + tol + 1,
        s"p=$p: value $v spans ranks [$lo,$hi], target $target ± $tol")
    }
  }

  test("sketches plan as partial+final aggregates (map-side combine)") {
    val q = events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("u"),
        percentile_approx(col("value"), lit(0.5), lit(100)).as("m"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      "HLL must partial-aggregate before the shuffle:\n" + plan)
    assert(plan.contains("partial_percentile_approx"),
      "quantile sketch must partial-aggregate before the shuffle:\n" + plan)
  }

  test("count_min_sketch: never under-counts, over-count bounded by eps·N") {
    // CMS contract: estimate ≥ true count always; estimate ≤ true +
    // eps·N with probability 1-confidence. eps=0.001 on 10k rows keeps
    // the slack at ~10 — tight enough to rank heavy hitters.
    val eps = 0.001
    val sketchBytes = events
      .select(count_min_sketch(col("event_type"), lit(eps), lit(0.99), lit(42))
        .as("s")).head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS under-counted $k: $est < $c")
      assert(est <= c + (eps * n).ceil.toLong * 3,
        s"CMS over-count out of bound for $k: $est vs $c (N=$n)")
    }
    // the sketch aggregate partial-combines map-side like the others
    val q = events.select(
      count_min_sketch(col("event_type"), lit(eps), lit(0.99), lit(42)).as("s"))
    q.collect()
    assert(q.queryExecution.executedPlan.toString
        .contains("partial_count_min_sketch"),
      "CMS must partial-aggregate before the shuffle")
  }

  // ---- portable KMV (the oracled, cross-engine sketch — x71) ----

  test("KMV merge law: sketch(A ∪ B) == merge(sketch(A), sketch(B)), exactly") {
    import graft.ext.Sketches
    val k = 32
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 =!= 0)
    val full = Sketches.kmvSketch(events, Seq("event_type"), "user_id", k)
    val merged = Sketches.kmvMerge(
      Seq(Sketches.kmvSketch(a, Seq("event_type"), "user_id", k),
        Sketches.kmvSketch(b, Seq("event_type"), "user_id", k)),
      Seq("event_type"), k)
    assert(full.exceptAll(merged).count() == 0)
    assert(merged.exceptAll(full).count() == 0)
  }

  test("KMV sharded global sketch equals the direct global bottom-k " +
    "and its estimate tracks exact within the rsd bound") {
    import graft.ext.Sketches
    val k = 256
    val sharded = Sketches.kmvSketchSharded(events, "event_id", k)
    val direct = Sketches.kmvSketch(events, Seq.empty, "event_id", k)
    assert(sharded.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(sharded).count() == 0)
    val est = Sketches.kmvEstimate(sharded, k)
      .select(col("distinct_est")).head.getDouble(0)
    val exact = events.select(countDistinct(col("event_id"))).head.getLong(0)
    // rsd ≈ 1/√(k−2) ≈ 6.3% at k=256; allow 4 sigma
    assert(math.abs(est - exact) / exact < 0.25,
      s"KMV estimate $est too far from exact $exact")
  }

  test("KMV unsaturated sketch reports the exact distinct count") {
    import graft.ext.Sketches
    val k = 512 // > 150 distinct users: sketch must be exact
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(events, Seq.empty, "user_id", k), k)
      .select(col("distinct_est")).head.getDouble(0)
    val exact = events.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(est == exact.toDouble)
  }

  test("Count-Min never undercounts and stays within eps*N even at a " +
    "deliberately tiny width") {
    import graft.ext.Sketches
    val (depth, width) = (4, 64) // 150 users into 64 buckets: collisions certain
    val sk = Sketches.cmsSketch(events, "user_id", depth, width)
    val est = Sketches.cmsLookup(sk, events.select("user_id"), "user_id", depth, width)
    val exact = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val joined = est.join(exact, "user_id")
      .select(col("user_id"), col("est_cnt"), col("exact_cnt")).collect()
    val n = events.filter(col("user_id").isNotNull).count()
    // e/width ≈ 4.2% of N; depth 4 makes exceeding it astronomically
    // unlikely, but the hard CMS guarantee is only one-sided — assert
    // the one-sided bound strictly and the two-sided one generously
    joined.foreach { r =>
      val (e, x) = (r.getLong(1), r.getLong(2))
      assert(e >= x, s"CMS undercounted ${r.get(0)}: est=$e exact=$x")
      assert(e - x <= (math.E / width * n).toLong + 1,
        s"CMS overcount beyond eps*N for ${r.get(0)}: est=$e exact=$x")
    }
  }

  test("Count-Min merge law: cms(A ⊎ B) == merge(cms(A), cms(B)), exactly") {
    import graft.ext.Sketches
    val (depth, width) = (3, 128)
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 =!= 0)
    val full = Sketches.cmsSketch(events, "user_id", depth, width)
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsSketch(a, "user_id", depth, width),
      Sketches.cmsSketch(b, "user_id", depth, width)))
    assert(full.exceptAll(merged).count() == 0)
    assert(merged.exceptAll(full).count() == 0)
  }

  test("Misra-Gries at small capacity: never overcounts, undercounts " +
    "<= N/(cap+1), and every true heavy hitter survives") {
    import graft.functions.GraftFunctions
    val cap = 8 // far below the 150 distinct users: decrements fire
    val rows = events.filter(col("user_id").isNotNull)
      .select(col("user_id").cast("string").as("u"))
    val summary = rows.agg(GraftFunctions.heavyHitters(spark, col("u"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.key").as("u"), col("e.cnt").as("est"))
    val exact = rows.groupBy(col("u")).agg(count(lit(1)).as("cnt"))
    val n = rows.count()
    val slack = n / (cap + 1) // decrement budget across all merge steps
    val joined = summary.join(exact, "u").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, cnt) = (r.getLong(1), r.getLong(2))
      assert(est <= cnt, s"MG overcounted ${r.get(0)}: est=$est exact=$cnt")
      assert(cnt - est <= slack,
        s"MG undercount beyond N/(cap+1) for ${r.get(0)}: est=$est exact=$cnt")
    }
    // completeness: any key with true frequency > N/(cap+1) must appear
    val kept = summary.select("u").collect().map(_.getString(0)).toSet
    val mustKeep = exact.filter(col("cnt") > slack).collect().map(_.getString(0))
    mustKeep.foreach(k => assert(kept.contains(k), s"heavy hitter $k evicted"))
  }

  test("Misra-Gries exact regime is partitioning-independent") {
    import graft.functions.GraftFunctions
    val cap = 64 // > 5 distinct event types: provably exact
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(GraftFunctions.heavyHitters(spark, col("event_type"), cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key"), col("e.cnt")).collect().toSeq
    val once = run(events)
    val repartitioned = run(events.repartition(17, col("user_id")))
    assert(once == repartitioned, "exact-regime MG depends on partitioning")
    val exact = events.filter(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach(r => assert(exact(r.getString(0)) == r.getLong(1)))
  }

  test("portable HLL merge law: registers(A ∪ B) == max-merge of parts") {
    import graft.ext.Sketches
    val b = 6
    val a1 = events.filter(col("event_id") % 2 === 0)
    val a2 = events.filter(col("event_id") % 2 =!= 0)
    val full = Sketches.hllRegisters(events, Seq("event_type"), "user_id", b)
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllRegisters(a1, Seq("event_type"), "user_id", b),
      Sketches.hllRegisters(a2, Seq("event_type"), "user_id", b)),
      Seq("event_type"))
    assert(full.exceptAll(merged).count() == 0)
    assert(merged.exceptAll(full).count() == 0)
  }

  test("KMV set algebra: unsaturated sketches give EXACT union/" +
    "intersection/Jaccard; saturated stay within the rsd band") {
    import graft.ext.Sketches
    val a = events.filter(col("event_type") === "click").withColumn("g", lit("all"))
    val b = events.filter(col("event_type") === "purchase").withColumn("g", lit("all"))
    val aU = a.select("user_id").distinct()
    val bU = b.select("user_id").distinct()
    val interExact = aU.intersect(bU).count().toDouble
    val unionExact = aU.union(bU).distinct().count().toDouble
    // k=512 > any distinct set here: M IS the union, matches ARE the
    // intersection — the estimates must be exact, not just close
    val exact = Sketches.kmvSetEstimate(
      Sketches.kmvSketch(a, Seq("g"), "user_id", 512),
      Sketches.kmvSketch(b, Seq("g"), "user_id", 512), Seq("g"), 512).head
    assert(exact.getDouble(1) == unionExact, s"union ${exact.getDouble(1)}")
    assert(exact.getDouble(2) == interExact, s"inter ${exact.getDouble(2)}")
    assert(exact.getDouble(3) == interExact / unionExact)
    // saturated regime: 4-sigma band around the exact Jaccard
    val approx = Sketches.kmvSetEstimate(
      Sketches.kmvSketch(a, Seq("g"), "user_id", 64),
      Sketches.kmvSketch(b, Seq("g"), "user_id", 64), Seq("g"), 64).head
    val jExact = interExact / unionExact
    assert(math.abs(approx.getDouble(3) - jExact) < 0.5,
      s"jaccard est ${approx.getDouble(3)} vs exact $jExact")
  }

  test("streaming sketches equal batch sketches: MG exact regime and " +
    "CMS cells over a file stream") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.GraftFunctions
    import graft.ext.Sketches
    // stage the events parquet as a streaming source directory
    val dir = java.nio.file.Files.createTempDirectory("stream_sketch")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    val sdf = spark.readStream.schema(raw.schema).parquet(dir.toString)

    val mgStream = sdf.groupBy()
      .agg(GraftFunctions.heavyHitters(spark, col("event_type"), 64).as("hh"))
    val q1 = mgStream.writeStream.outputMode("complete").format("memory")
      .queryName("mg_stream").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val streamed = spark.table("mg_stream")
      .select(explode(col("hh")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect().toSeq
    val batch = raw.groupBy()
      .agg(GraftFunctions.heavyHitters(spark, col("event_type"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect().toSeq
    assert(streamed == batch, "exact-regime MG must not depend on micro-batching")

    val q2 = Sketches.cmsSketch(sdf, "user_id", depth = 3, width = 128)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val cmsStream = spark.table("cms_stream")
    val cmsBatch = Sketches.cmsSketch(raw, "user_id", depth = 3, width = 128)
    assert(cmsStream.exceptAll(cmsBatch).count() == 0)
    assert(cmsBatch.exceptAll(cmsStream).count() == 0)

    // HLL registers: groupBy-max is streaming-legal in complete mode
    val q3 = Sketches.hllRegisters(sdf, Seq("event_type"), "user_id", b = 5)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val hllStream = spark.table("hll_stream")
    val hllBatch = Sketches.hllRegisters(raw, Seq("event_type"), "user_id", b = 5)
    assert(hllStream.exceptAll(hllBatch).count() == 0)
    assert(hllBatch.exceptAll(hllStream).count() == 0)

    // KLL in the exact regime (k ≥ rows): micro-batch partials merge to
    // the same order statistics as one batch pass — the merge law under
    // the streaming execution path
    val kq = Seq(0.1, 0.5, 0.9)
    val q4 = sdf.groupBy()
      .agg(GraftFunctions.kllQuantiles(spark, col("value").cast("double"),
        k = 1 << 20, kq).as("q"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kll_stream").trigger(Trigger.AvailableNow()).start()
    q4.awaitTermination()
    val kllStream = spark.table("kll_stream").head.getSeq[Double](0)
    val kllBatch = raw.groupBy()
      .agg(GraftFunctions.kllQuantiles(spark, col("value").cast("double"),
        k = 1 << 20, kq).as("q"))
      .head.getSeq[Double](0)
    assert(kllStream == kllBatch, s"stream=$kllStream batch=$kllBatch")
  }

  test("KLL exact regime (n <= k): every requested quantile equals the " +
    "rank-ceil(q*n) order statistic, any partitioning") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    val n = 500
    val values = (1 to n).map(i => ((i * 37) % n).toDouble + 1) // a permutation
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val sortedV = values.sorted
    val expected = qs.map { q =>
      sortedV(math.max(1, math.ceil(q * n).toInt) - 1)
    }
    for (parts <- Seq(1, 17)) {
      val got = values.toDF("v").repartition(parts)
        .agg(GraftFunctions.kllQuantiles(spark, col("v"), k = 1024, qs).as("q"))
        .head.getSeq[Double](0)
      assert(got == expected, s"parts=$parts got=$got expected=$expected")
    }
  }

  test("graft_kll_quantiles_cont in the exact regime is BIT-IDENTICAL " +
    "to exact percentile on random tied integer populations, any " +
    "partitioning — the rfm cutpoint contract") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val qs = Seq(0.2, 0.25, 0.4, 0.5, 0.6, 0.75, 0.8, 0.9)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(200)
      // small value range -> heavy ties, the case where the
      // tie-short-circuit (return the stored value exactly) matters
      val values = Seq.fill(n)(rnd.nextInt(30).toLong)
      val df = values.toDF("v").repartition(7)
      val exact = df.agg(percentile(col("v"), typedLit(qs)))
        .head.getSeq[Double](0)
      val cont = df.agg(GraftFunctions.kllQuantilesCont(spark,
          col("v").cast("double"), k = 1024, qs))
        .head.getSeq[Double](0)
      assert(cont == exact,
        s"trial $trial (n=$n): cont=$cont != percentile=$exact")
    }
    // and the non-interpolating read is unchanged by the new field
    val plain = (1 to 100).map(_.toDouble).toDF("v")
      .agg(GraftFunctions.kllQuantiles(spark, col("v"), 1024, Seq(0.5)))
      .head.getSeq[Double](0)
    assert(plain == Seq(50.0))
    // the serialized-sketch read offers the same convention: a
    // persisted sketch serves percentile-convention quantiles
    val df99 = (1 to 99).map(_.toDouble).toDF("v")
    val viaSketch = df99
      .agg(GraftFunctions.kllSketch(spark, col("v"), 1024).as("sk"))
      .select(GraftFunctions.kllValuesCont(spark, col("sk"), 1024,
        Seq(0.25, 0.5)))
      .head.getSeq[Double](0)
    val viaPercentile = df99
      .agg(percentile(col("v"), typedLit(Seq(0.25, 0.5))))
      .head.getSeq[Double](0)
    assert(viaSketch == viaPercentile)
  }

  test("KLL merge law: buffer merge == feeding the concatenation, and " +
    "partial aggregation reproduces the single-partition result in the " +
    "exact regime") {
    import graft.functions.KllQuantiles
    // direct buffer-level law (what partial aggregation exercises)
    val a = new KllQuantiles.Buf(64)
    val b = new KllQuantiles.Buf(64)
    val both = new KllQuantiles.Buf(64)
    (1 to 40).foreach(i => { a.insert(i.toDouble); both.insert(i.toDouble) })
    (41 to 60).foreach(i => { b.insert(i.toDouble); both.insert(i.toDouble) })
    a.mergeIn(b)
    val qs = Seq(0.1, 0.5, 0.9)
    assert(a.n == 60 && a.quantiles(qs) == both.quantiles(qs))
    // exact even though the MERGE itself may compact: 60 items at k=64
    assert(a.quantiles(qs) == Seq(6.0, 30.0, 54.0))
  }

  test("graft_kll_merge folds serialized sketches distributedly, and " +
    "graft_kll_values resolves them — round-trip equals direct kllQuantiles") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    val qs = Seq(0.1, 0.5, 0.9)
    val k = 1024
    // per-group sketches (the persisted MV/manifest state), re-merged by
    // the aggregate and resolved by the scalar — no driver-side fold
    val df = (1 to 300).map(i => (i % 5, ((i * 37) % 300).toDouble)).toDF("g", "v")
    val perGroup = df.groupBy(col("g") % 2) // 5 groups sketched, folded to 2
      .agg(GraftFunctions.kllSketch(spark, col("v"), k).as("sk"))
    val folded = perGroup
      .agg(GraftFunctions.kllMerge(spark, col("sk"), k).as("sk"))
      .select(GraftFunctions.kllValues(spark, col("sk"), k, qs).as("q"))
      .head.getSeq[Double](0)
    val direct = df
      .agg(GraftFunctions.kllQuantiles(spark, col("v"), k, qs).as("q"))
      .head.getSeq[Double](0)
    assert(folded == direct, s"folded=$folded direct=$direct")
    // empty sketch resolves to null, not garbage
    val empty = df.filter(col("v") < 0)
      .agg(GraftFunctions.kllSketch(spark, col("v"), k).as("sk"))
      .select(GraftFunctions.kllValues(spark, col("sk"), k, qs).as("q"))
      .head
    assert(empty.isNullAt(0))
  }

  test("KLL rank error stays O(n/k) past the exact regime, on uniform, " +
    "sorted and reversed inputs") {
    import graft.functions.KllQuantiles
    val n = 20000
    val k = 200
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val inputs = Map(
      "shuffled" -> (1 to n).map(i => ((i.toLong * 48271) % n).toDouble),
      "sorted" -> (1 to n).map(_.toDouble),
      "reversed" -> (n to 1 by -1).map(_.toDouble))
    inputs.foreach { case (name, vals) =>
      val buf = new KllQuantiles.Buf(k)
      vals.foreach(buf.insert)
      val sortedV = vals.sorted
      val got = buf.quantiles(qs)
      qs.zip(got).foreach { case (q, est) =>
        // rank of the estimate in the true order
        val rank = sortedV.count(_ <= est)
        val target = math.max(1, math.ceil(q * n).toInt)
        val err = math.abs(rank - target)
        // deterministic-parity KLL: generous 4n/k empirical band
        assert(err <= 4 * n / k,
          s"$name q=$q: rank $rank vs target $target (err $err, bound ${4 * n / k})")
      }
    }
  }

  test("portable HLL estimate tracks exact within 4 sigma of 1.04/sqrt(m)") {
    import graft.ext.Sketches
    val b = 6 // m=64: rse ≈ 13%
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(events, Seq.empty, "user_id", b), Seq.empty, b)
      .select(col("distinct_est")).head.getDouble(0)
    val exact = events.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(est - exact) / exact < 0.52,
      s"portable HLL estimate $est too far from exact $exact")
  }
}
