package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Stats, TextAnalysis}
import graft.olap.Quality

/** Model-eval / feature-statistics verbs: closed-form OLS recovery and
  * degeneracy, Mann–Whitney AUC with average-rank ties, calibration
  * report arithmetic, weighted medians, and PMI collocations — all
  * against hand-computed fixtures. */
class StatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("linearFit: exact linear data recovers (b0, b1, b2) with r2 = 1") {
    // y = 2 + 3·x1 − x2 exactly, x1/x2 non-collinear
    val xs = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 5L), (5L, 3L), (6L, 8L))
    val df = xs.map { case (x1, x2) => (2 + 3 * x1 - x2, x1, x2) }
      .toDF("y", "x1", "x2")
    val r = Stats.linearFit(df, col("y"), col("x1"), col("x2")).head()
    assert(r.getAs[Long]("n") == 6)
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b2") + 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("linearFit: matches a reference solve on noisy integer data and " +
    "is partition-order independent") {
    val rows = (0 until 200).map { i =>
      val x1 = (i % 37).toLong; val x2 = (i % 11).toLong
      (5 + 2 * x1 + 7 * x2 + (i % 5) - 2, x1, x2) // integer "noise"
    }
    val df = rows.toDF("y", "x1", "x2")
    val r = Stats.linearFit(df, col("y"), col("x1"), col("x2")).head()
    // reference: solve the normal equations with plain Doubles
    val n = rows.size.toDouble
    val (s1, s2, sy) = (rows.map(_._2.toDouble).sum, rows.map(_._3.toDouble).sum,
      rows.map(_._1.toDouble).sum)
    val s11 = rows.map(r0 => r0._2.toDouble * r0._2).sum
    val s12 = rows.map(r0 => r0._2.toDouble * r0._3).sum
    val s22 = rows.map(r0 => r0._3.toDouble * r0._3).sum
    val s1y = rows.map(r0 => r0._2.toDouble * r0._1).sum
    val s2y = rows.map(r0 => r0._3.toDouble * r0._1).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    assert(math.abs(r.getAs[Double]("b1") - b1) < 1e-6)
    assert(r.getAs[Double]("r2") > 0.99) // noise is tiny vs signal
    val r2 = Stats.linearFit(df.repartition(7), col("y"), col("x1"),
      col("x2")).head()
    assert(r == r2) // exact decimal sums: bit-identical under any layout
  }

  test("linearFit: collinear and constant designs yield null " +
    "coefficients, not garbage") {
    val col2 = (1L to 8L).map(i => (i, i, 2 * i)).toDF("y", "x1", "x2")
    val r = Stats.linearFit(col2, col("y"), col("x1"), col("x2")).head()
    assert(r.isNullAt(r.fieldIndex("b0")) && r.isNullAt(r.fieldIndex("r2")))
    val const = (1L to 8L).map(i => (i, i, 5L)).toDF("y", "x1", "x2")
    val rc = Stats.linearFit(const, col("y"), col("x1"), col("x2")).head()
    assert(rc.isNullAt(rc.fieldIndex("b1")))
  }

  test("groupAuc: perfect / inverse / tied / single-class groups") {
    val df = Seq(
      // g: positives strictly above negatives -> AUC 1
      ("g", 1L, false), ("g", 2L, false), ("g", 3L, true), ("g", 4L, true),
      // h: ranks 1, 2.5, 2.5, 4; positives at one tie + top ->
      // ranksum 6.5, AUC (6.5-3)/4 = 0.875
      ("h", 1L, false), ("h", 2L, true), ("h", 2L, false), ("h", 3L, true),
      // i: inverse ordering -> AUC 0
      ("i", 5L, true), ("i", 9L, false),
      // j: single class -> null
      ("j", 1L, true), ("j", 2L, true)
    ).toDF("src", "score", "lab")
    val out = Stats.groupAuc(df, "src", col("score"), col("lab"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("g") == ((2L, 2L, Some(1.0))))
    assert(out("h") == ((2L, 2L, Some(0.875))))
    assert(out("i") == ((1L, 1L, Some(0.0))))
    assert(out("j") == ((2L, 0L, None)))
  }

  test("groupAuc matches the O(n²) pair definition on random-ish data") {
    val rows = (0 until 60).map(i => ("s", (i * 7 % 23).toLong, i % 3 == 0))
    val df = rows.toDF("src", "score", "lab")
    val auc = Stats.groupAuc(df, "src", col("score"), col("lab"))
      .head().getAs[Double]("auc")
    val pos = rows.filter(_._3).map(_._2); val neg = rows.filterNot(_._3).map(_._2)
    val pairs = for { p <- pos; q <- neg } yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0
    val brute = pairs.sum / (pos.size.toDouble * neg.size)
    assert(math.abs(auc - brute) < 1e-9, s"$auc vs $brute")
  }

  test("calibrationReport: perfectly calibrated bins give ECE 0; " +
    "p = 1 clamps into the last bin") {
    val df = (Seq.fill(1)(0.25 -> true) ++ Seq.fill(3)(0.25 -> false) ++
      Seq.fill(3)(0.75 -> true) ++ Seq.fill(1)(0.75 -> false) ++
      Seq.fill(2)(1.0 -> true))
      .toDF("p", "lab")
    val out = Stats.calibrationReport(df, col("p"), col("lab"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(out.keySet == Set(2, 7, 9))
    assert(out(2) == ((4L, 1L, 0.25, 0.25, 0.0, 0.0)))
    assert(out(7) == ((4L, 3L, 0.75, 0.75, 0.0, 0.0)))
    assert(out(9) == ((2L, 2L, 1.0, 1.0, 0.0, 0.0))) // clamped, calibrated
  }

  test("calibrationReport: miscalibrated fixture's ECE is the " +
    "hand-computed weighted gap") {
    // bin 0: conf 0.05, acc 1.0 (gap .95, 2 rows); bin 9: conf 0.95,
    // acc 0.0 (gap .95, 2 rows) -> ECE = .95
    val df = (Seq.fill(2)(0.05 -> true) ++ Seq.fill(2)(0.95 -> false))
      .toDF("p", "lab")
    val out = Stats.calibrationReport(df, col("p"), col("lab")).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("ece") - 0.95) < 1e-9))
  }

  test("groupAuc: null-label rows DROP — the statistic must not shift " +
    "when unlabeled rows join the frame (r10 contract)") {
    val labeled = Seq(
      ("g", Some(1L), Some(false)), ("g", Some(2L), Some(false)),
      ("g", Some(3L), Some(true)), ("g", Some(4L), Some(true)))
    // unlabeled rows at scores that WOULD flip the ranks if counted as
    // negatives (a 5 above every positive, a 3 tied with one)
    val polluted = labeled ++ Seq(
      ("g", Some(5L), Option.empty[Boolean]),
      ("g", Some(3L), Option.empty[Boolean]))
    def auc(rows: Seq[(String, Option[Long], Option[Boolean])]) = {
      val r = Stats.groupAuc(rows.toDF("src", "score", "lab"), "src",
        col("score"), col("lab")).head()
      (r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    assert(auc(labeled) == ((2L, 2L, 1.0)))
    assert(auc(polluted) == auc(labeled))
  }

  test("calibrationReport: null-label (and null-prob) rows DROP — " +
    "bins and ECE identical with unlabeled rows present (r10 contract)") {
    val labeled = Seq(
      (Some(0.25), Some(true)), (Some(0.25), Some(false)),
      (Some(0.75), Some(true)), (Some(0.75), Some(true)))
    val polluted = labeled ++ Seq(
      (Some(0.25), Option.empty[Boolean]), // would dilute bin-2 acc
      (Option.empty[Double], Some(true)))  // no bin to land in
    def report(rows: Seq[(Option[Double], Option[Boolean])]) =
      Stats.calibrationReport(rows.toDF("p", "lab"), col("p"), col("lab"))
        .collect().map(_.toSeq).toSeq
    assert(report(labeled).nonEmpty)
    assert(report(polluted) == report(labeled))
  }

  test("weightedMedian: cumulative-weight pick, lower-median ties, " +
    "nonpositive weights dropped") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 1L), // tot 4, cum(2)=3 -> 2
      ("b", 1L, 1L), ("b", 2L, 1L),                // tot 2, 2*1>=2 -> 1
      ("c", 5L, 3L), ("c", 9L, 0L), ("c", 7L, -2L) // only w>0 kept -> 5
    ).toDF("src", "v", "w")
    val out = Quality.weightedMedian(df, "src", "v", col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> ((4L, 2L)), "b" -> ((2L, 1L)), "c" -> ((3L, 5L))))
  }

  test("weightedMedian vs row median: heavy tail weights move the pick") {
    val df = Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 100L, 10L))
      .toDF("src", "v", "w")
    val out = Quality.weightedMedian(df, "src", "v", col("w")).head()
    assert(out.getAs[Long]("w_median") == 100L) // weight mass lives there
  }

  test("pmiCollocations: hand-computed PMI, threshold, total-order cut") {
    val df = Seq("a b", "a b", "a c").toDF("text")
    // uni: a=3 b=2 c=1, Nu=6; bi: (a,b)=2 (a,c)=1, Nb=3
    // pmi(a,b) = ln(2·36/(3·3·2)) = ln 4; pmi(a,c) = ln(1·36/(3·3·1)) = ln 4
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length == 2)
    assert(out.forall(t => math.abs(t._4 - math.log(4.0)) < 1e-6))
    assert(out.head._1 == "a" && out.head._2 == "b") // tie -> lexicographic
    // minCount suppresses the singleton pair; topK cuts on the total order
    val cut = TextAnalysis.pmiCollocations(df, "text", minCount = 2, topK = 10)
      .collect()
    assert(cut.map(r => (r.getString(0), r.getString(1))).toSeq == Seq("a" -> "b"))
    val top1 = TextAnalysis.pmiCollocations(df, "text", minCount = 1, topK = 1)
      .collect()
    assert(top1.map(r => (r.getString(0), r.getString(1))).toSeq == Seq("a" -> "b"))
  }

  test("pmiCollocations: normalization makes case/whitespace variants " +
    "one pair; single-token docs add unigrams only") {
    val df = Seq("New  York", "new york", "solo").toDF("text")
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("new", "york", 2L)))
  }

  test("giniConcentration: uniform vocabulary reads 0, skew reads the " +
    "hand value, topK share cuts on (count desc, term)") {
    val uni = Seq(("s", "a b c")).toDF("src", "text")
    val r0 = TextAnalysis.giniConcentration(uni, "src", "text").head()
    assert(r0.getAs[Long]("n_terms") == 3 && r0.getAs[Long]("total_tokens") == 3)
    assert(r0.getAs[Double]("gini") == 0.0)
    assert(r0.getAs[Double]("topk_share") == 1.0) // k=10 covers all
    // a:3 b:1 -> asc ranks b=1, a=2; G = (2·7 − 3·4)/(2·4) = 0.25
    val skew = Seq(("s", "a a a b")).toDF("src", "text")
    val r1 = TextAnalysis.giniConcentration(skew, "src", "text").head()
    assert(r1.getAs[Double]("gini") == 0.25)
    val top1 = TextAnalysis.giniConcentration(skew, "src", "text", topK = 1)
      .head()
    assert(top1.getAs[Double]("topk_share") == 0.75) // a's 3 of 4
    // equal-count rank ties cannot move Σ i·cᵢ: permuted duplicates
    // land on the same gini
    val tie = Seq(("s", "a a b b c c")).toDF("src", "text")
    assert(TextAnalysis.giniConcentration(tie, "src", "text")
      .head().getAs[Double]("gini") == 0.0)
  }

  test("twoProportionTest: hand-computed z, degenerate pooled rate " +
    "reads null z") {
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    // control 2/10, treatment 5/10
    val df = (Seq.tabulate(10)(i => ("c", if (i < 2) 1L else 0L)) ++
      Seq.tabulate(10)(i => ("t", if (i < 5) 1L else 0L)))
      .toDF("arm", "conv")
    val r = Stats.twoProportionTest(df, "arm", "c", "conv").head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 2L &&
      r.getLong(3) == 10L && r.getLong(4) == 5L)
    assert(r.getAs[Double]("rate_c") == 0.2 &&
      r.getAs[Double]("rate_t") == 0.5 && r.getAs[Double]("lift") == 0.3)
    val pp = 7.0 / 20
    val z = (0.5 - 0.2) / math.sqrt(pp * (1.0 - pp) * (1.0 / 10 + 1.0 / 10))
    assert(r.getAs[Double]("z") == r6(z))
    // everyone converts: z undefined -> null, not infinity or an error
    val all = Seq(("c", 1L), ("t", 1L)).toDF("arm", "conv")
    val r2 = Stats.twoProportionTest(all, "arm", "c", "conv").head()
    assert(r2.isNullAt(r2.fieldIndex("z")))
  }

  test("cuped: perfectly linear covariate removes all variance; " +
    "constant covariate reads null theta") {
    // y = 10x in both arms -> theta = 10, var_y_adj = 0, reduction 1
    val df = Seq(("c", 10L, 1L), ("c", 20L, 2L), ("c", 30L, 3L),
      ("t", 20L, 2L), ("t", 40L, 4L)).toDF("arm", "y", "x")
    val out = Stats.cuped(df, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").getAs[Double]("theta") == 10.0)
    // exact-zero up to IEEE cancellation of the (identical) chains
    assert(math.abs(out("c").getAs[Double]("var_y_adj")) < 1e-9 &&
      math.abs(out("t").getAs[Double]("var_y_adj")) < 1e-9)
    assert(out("c").getAs[Double]("var_reduction") == 1.0)
    // adjusted means align the arms onto the pooled line
    assert(out("c").getAs[Double]("mean_y_adj") ==
      out("t").getAs[Double]("mean_y_adj"))
    val const = Seq(("c", 10L, 7L), ("t", 20L, 7L)).toDF("arm", "y", "x")
    val rc = Stats.cuped(const, "arm", "y", "x").head()
    assert(rc.isNullAt(rc.fieldIndex("theta")) &&
      rc.isNullAt(rc.fieldIndex("var_y_adj")))
  }

  test("weightDiagnostics: uniform weights read ess_ratio 1 and cv 0; " +
    "a skew fixture hand-checks; nonpositive weights drop") {
    import graft.ext.Sampling
    val df = Seq(("u", 1.0), ("u", 1.0), ("u", 1.0), ("u", 1.0),
      ("s", 3.0), ("s", 1.0), ("s", -2.0), ("s", 0.0))
      .toDF("g", "w")
    val out = Sampling.weightDiagnostics(df, "g", "w", microScale = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("u") == ((4L, 4.0, 1.0, 0.25, 0.0)))
    // s: w = {3, 1}: ess = 16/10 = 1.6, max 3/4, cv = sqrt(20-16)/4
    assert(out("s") == ((2L, 1.6, 0.8, 0.75, 0.5)))
  }

  test("targetEncode: plain/smoothed means, leave-one-out excludes the " +
    "row, singleton falls back to the prior, nulls pass through") {
    // A: 10 20 30 (sum 60), B: 40 singleton; prior = 100/4 = 25
    val df = Seq((Some("A"), Some(10L)), (Some("A"), Some(20L)),
      (Some("A"), Some(30L)), (Some("B"), Some(40L)),
      (None: Option[String], Some(99L))).toDF("cat", "y")
    val plain = Stats.targetEncode(df, "cat", "y")
      .collect().map(r => (Option(r.getString(0)), Option(r.get(1))) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(plain((Some("A"), Some(10L))) == ((Some(20.0), Some(25.0))))
    assert(plain((Some("A"), Some(20L))) == ((Some(20.0), Some(20.0))))
    assert(plain((Some("A"), Some(30L))) == ((Some(20.0), Some(15.0))))
    // singleton: te is its own mean, te_loo the prior
    assert(plain((Some("B"), Some(40L))) == ((Some(40.0), Some(25.0))))
    assert(plain((None, Some(99L))) == ((None, None)))
    // m = 2 pseudo-counts: A -> (60+50)/5 = 22, B -> (40+50)/3 = 30
    val sm = Stats.targetEncode(df, "cat", "y", smoothing = 2.0)
      .filter(col("cat").isNotNull).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(sm("A") == 22.0 && sm("B") == 30.0)
    intercept[IllegalArgumentException] {
      Stats.targetEncode(df.withColumnRenamed("y", "te"), "cat", "te")
    }
  }

  test("boilerplateFraction: shared shingles score, unique docs read 0, " +
    "short docs degrade to the whole-string shingle") {
    import graft.ext.TextDedup
    val df = Seq(
      (1L, "x y z w"),  // shingles {x y z, y z w} — first shared with doc 2
      (2L, "x y z q"),  // shingles {x y z, y z q}
      (3L, "totally unique content here")
    ).toDF("doc_id", "text")
    val out = TextDedup.boilerplateFraction(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)) && out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    // ≤ k tokens: ONE whole-string shingle; exact copies share it fully
    val short = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val o2 = TextDedup.boilerplateFraction(short, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(o2 == Map(1L -> 1.0, 2L -> 1.0, 3L -> 0.0))
    // minDf raises the bar: df-2 shingles stop counting at minDf = 3
    val o3 = TextDedup.boilerplateFraction(df, "text", "doc_id", minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(o3.values.forall(_ == 0.0))
  }
}
