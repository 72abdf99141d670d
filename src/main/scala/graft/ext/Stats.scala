package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-eval / feature-statistics verbs: closed-form OLS over exact
  * sufficient statistics, rank-based AUC, and a binned calibration
  * report. The quality-classifier feedback loop of a curation pipeline
  * (train a cheap scorer → measure its ranking power → measure its
  * calibration) expressed as single-pass aggregations — nothing here
  * collects rows to the driver and nothing sorts the corpus.
  *
  * Determinism contract (the x119/x120/x125 discipline): every
  * corpus-sized accumulation is an EXACT integer/decimal sum, and the
  * IEEE arithmetic downstream of those sums is a fixed expression
  * chain on contingency-sized data — so results are independent of
  * partitioning and replayable term-for-term by the DuckDB oracles.
  */
object Stats {

  /** Exact sum of an integer-valued column as DECIMAL(38,0) — 128-bit
    * headroom (DuckDB's HUGEINT twin), immune to long overflow at
    * warehouse row counts. Operands cast to DECIMAL(18,0) BEFORE any
    * product so the multiply itself cannot overflow either. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))
  private def d18(c: Column): Column = c.cast("decimal(18,0)")

  /** Ordinary least squares `y ~ b0 + b1·x1 + b2·x2` in closed form:
    * ONE corpus pass reduces to ten sufficient statistics (n, Σx, Σy,
    * ΣxᵢxⱼΣxy, Σy²), then Cramer's rule solves the 3×3 normal
    * equations INSIDE the plan (no driver collect — the output is a
    * one-row DataFrame and the whole solve is a scalar expression
    * tree on it).
    *
    * Exactness: inputs must be integer-valued (counts, lengths,
    * cents); the sums accumulate as DECIMAL(38,0) — exact, so the
    * sufficient statistics are independent of row/partition order and
    * every engine computing the same Cramer chain from them lands on
    * identical doubles (statistics above 2^53 convert to double with
    * round-to-nearest on both engines, so cross-engine parity holds
    * there too). At 100 TB this is the ONLY shape an exact regression
    * fit can take: the shuffle carries ten numbers, never rows.
    *
    * Output: `(n, b0, b1, b2, r2)` — coefficients null when the
    * design matrix is singular (constant or collinear features), `r2`
    * additionally null when y is constant. */
  def linearFit(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val base = df.select(y.as("_y"), x1.as("_x1"), x2.as("_x2"))
      .filter(col("_y").isNotNull && col("_x1").isNotNull && col("_x2").isNotNull)
    val stats = base.agg(
      count(lit(1)).as("n"),
      dsum(col("_x1")).as("_s1"),
      dsum(col("_x2")).as("_s2"),
      dsum(col("_y")).as("_sy"),
      dsum(d18(col("_x1")) * d18(col("_x1"))).as("_s11"),
      dsum(d18(col("_x1")) * d18(col("_x2"))).as("_s12"),
      dsum(d18(col("_x2")) * d18(col("_x2"))).as("_s22"),
      dsum(d18(col("_x1")) * d18(col("_y"))).as("_s1y"),
      dsum(d18(col("_x2")) * d18(col("_y"))).as("_s2y"),
      dsum(d18(col("_y")) * d18(col("_y"))).as("_syy"))
    // the Cramer chain runs on DOUBLES cast from the exact sums; the
    // oracle spells the same parenthesization, so the bits agree
    def dbl(name: String) = col(name).cast("double")
    val n = col("n").cast("double")
    val s1 = dbl("_s1"); val s2 = dbl("_s2"); val sy = dbl("_sy")
    val s11 = dbl("_s11"); val s12 = dbl("_s12"); val s22 = dbl("_s22")
    val s1y = dbl("_s1y"); val s2y = dbl("_s2y"); val syy = dbl("_syy")
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    stats
      .withColumn("_det", det)
      .withColumn("b0", when(col("_det") =!= 0.0, det0 / col("_det")))
      .withColumn("b1", when(col("_det") =!= 0.0, det1 / col("_det")))
      .withColumn("b2", when(col("_det") =!= 0.0, det2 / col("_det")))
      // SSE via the normal-equations identity (b solves X'Xb = X'y):
      // SSE = Σy² − b·X'y; SST = Σy² − (Σy)²/n
      .withColumn("_sse",
        syy - (col("b0") * sy + col("b1") * s1y + col("b2") * s2y))
      .withColumn("_sst", syy - sy * sy / n)
      .select(col("n"),
        round(col("b0"), 6).as("b0"),
        round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        when(col("_sst") > 0.0,
          round(lit(1.0) - col("_sse") / col("_sst"), 6)).as("r2"))
  }

  /** Per-group ROC AUC of a score against a boolean label, computed
    * as the Mann–Whitney rank statistic with average-rank tie
    * handling — the ranking-power check for any quality scorer.
    *
    * Shape: scores collapse to per-(group, score) counts first (the
    * only corpus-sized pass), the rank arithmetic runs on DISTINCT
    * scores per group (a window whose partitions hold one group's
    * distinct values, never its rows), and the rank-sum doubles to
    * stay integral: with c₋ rows below a tied block of t rows (p of
    * them positive), the block's positives contribute
    * p·(c₋ + (t+1)/2) to the rank sum, so 2·ranksum =
    * Σ p·(2c₋ + t + 1) is an EXACT integer. AUC then needs ONE
    * division: (2·ranksum − n₊·(n₊+1)) / (2·n₊·n₋), accumulated as
    * DECIMAL(38,0) so warehouse-scale n² terms cannot overflow.
    *
    * Output: `(group, n_pos, n_neg, auc)`; auc null when either class
    * is absent. NULL labels DROP (an un-labeled row is neither class;
    * the label mapping keeps null null — `when(label, 1).when(!label,
    * 0)` — so the isNotNull filter is the one that excludes them;
    * `otherwise(0)` would silently count them as negatives and skew
    * the statistic). NULL scores drop for the same reason. */
  def groupAuc(df: DataFrame, groupCol: String, score: Column,
               label: Column): DataFrame = {
    val base = df.select(col(groupCol).as("group"), score.as("_s"),
        when(label, 1L).when(!label, 0L).as("_p"))
      .filter(col("_s").isNotNull && col("_p").isNotNull)
    val perScore = base.groupBy(col("group"), col("_s"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pp"))
    val w = Window.partitionBy(col("group")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = perScore.withColumn("_cb", coalesce(sum(col("_t")).over(w), lit(0L)))
    val g = cum.groupBy(col("group")).agg(
      dsum(d18(col("_pp")) *
        d18(col("_cb") * 2L + col("_t") + 1L)).as("_rs2"),
      sum(col("_pp")).as("n_pos"),
      sum(col("_t") - col("_pp")).as("n_neg"))
    g.select(col("group"), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0L && col("n_neg") > 0L,
        round((col("_rs2").cast("double") -
          col("n_pos").cast("double") * (col("n_pos") + 1L)) /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg")), 6))
        .as("auc"))
  }

  /** Binned calibration report for a probability-like score in [0, 1]
    * against a boolean label: per equal-width bin the count, positive
    * count, mean confidence, empirical accuracy and |gap|, plus the
    * expected calibration error (ECE = Σ_bins (n_b/N)·|acc_b −
    * conf_b|) repeated on every row — the standard reliability
    * diagram + summary a scored corpus is audited with before its
    * scores gate anything.
    *
    * Exactness: per-row confidences land on a 1e-6 lattice
    * (`floor(p·1e6 + 0.5)` — the portable rounding) so the per-bin
    * confidence sums are exact integers under any partitioning; the
    * ECE fold runs over the ≤`bins` per-bin rows in bin order (the
    * x125 sorted-fold discipline). Scale: one corpus pass → `bins`
    * rows; everything downstream is bin-sized.
    *
    * NULL labels/probs DROP (same contract as [[groupAuc]]): the label
    * mapping keeps null null so the isNotNull filter excludes
    * un-labeled rows instead of silently scoring them as negatives. */
  def calibrationReport(df: DataFrame, prob: Column, label: Column,
                        bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins in [2,1000]")
    val base = df.select(prob.as("_pr"),
        when(label, 1L).when(!label, 0L).as("_y"))
      .filter(col("_pr").isNotNull && col("_y").isNotNull)
      .select(
        least(floor(col("_pr") * bins), lit(bins - 1)).cast("int").as("bin"),
        floor(col("_pr") * 1000000.0 + 0.5).cast("long").as("_lat"),
        col("_y"))
    val perBin = base.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      sum(col("_y")).as("n_pos"),
      dsum(col("_lat")).as("_slat"))
    val tot = perBin.agg(sum(col("n")).as("_tn"))
    val scored = perBin
      .withColumn("conf",
        col("_slat").cast("double") / col("n") / 1000000.0)
      .withColumn("acc", col("n_pos").cast("double") / col("n"))
      .withColumn("_gap", abs(col("acc") - col("conf")))
    val ece = scored.crossJoin(broadcast(tot))
      .select(col("bin"),
        (col("_gap") * col("n").cast("double") / col("_tn")).as("_term"))
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("bin"), col("_term")))),
        lit(0.0), (acc, e) => acc + e.getField("_term")), 6).as("ece"))
    scored.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("conf"), 6).as("conf"),
        round(col("acc"), 6).as("acc"),
        round(col("_gap"), 6).as("gap"),
        col("ece"))
  }

  /** Two-proportion experiment readout: each treatment arm vs the
    * named control — conversion counts, rates, absolute lift, and the
    * pooled two-proportion z statistic
    * `z = (p_t − p_c) / √(p̄(1−p̄)(1/n_c + 1/n_t))` — the standard
    * A/B-test table a warehouse serves to an experimentation UI.
    *
    * One aggregate over the assignment log; the control row broadcasts
    * to every treatment row. Counts are exact integers; every rate is
    * one divide; z is a fixed chain — deterministic cross-engine.
    * Null arms/conversions drop. A degenerate pooled rate (everyone or
    * no one converted — p̄ ∈ {0, 1}) leaves z undefined: reported NULL,
    * never ±∞ (and never an ANSI divide-by-zero).
    *
    * Output per treatment arm: `(arm, n_c, x_c, n_t, x_t, rate_c,
    * rate_t, lift, z)`, rates/lift/z rounded to 6. */
  def twoProportionTest(df: DataFrame, armCol: String, controlArm: String,
                        convCol: String): DataFrame = {
    val per = df
      .filter(col(armCol).isNotNull && col(convCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("_n"),
        sum(col(convCol).cast("long")).as("_x"))
    val ctrl = per.filter(col("arm") === controlArm)
      .select(col("_n").as("n_c"), col("_x").as("x_c"))
    // fail loudly on a typo'd control label — the crossJoin would
    // otherwise return a silently EMPTY readout (the upsert-guard
    // precedent: one bounded eager probe before misleading output)
    require(!ctrl.isEmpty,
      s"control arm '$controlArm' has no rows — check the arm labels")
    val pc = col("x_c").cast("double") / col("n_c")
    val pt = col("_x").cast("double") / col("_n")
    val pp = (col("x_c") + col("_x")).cast("double") /
      (col("n_c") + col("_n"))
    per.filter(col("arm") =!= controlArm)
      .crossJoin(broadcast(ctrl))
      .select(col("arm"), col("n_c"), col("x_c"),
        col("_n").as("n_t"), col("_x").as("x_t"),
        round(pc, 6).as("rate_c"), round(pt, 6).as("rate_t"),
        round(pt - pc, 6).as("lift"),
        round(when(pp > 0 && pp < 1,
          (pt - pc) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_c") + lit(1.0) / col("_n")))), 6).as("z"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust an
    * experiment metric with a pre-experiment covariate,
    * `ŷ = y − θ(x − x̄)` with `θ = cov(x, y)/var(x)` estimated POOLED
    * (arm-agnostic, so the adjustment cannot bias the treatment
    * effect), and report per-arm means and variances before/after —
    * the standard way an experimentation platform doubles its
    * effective traffic.
    *
    * Exactness: everything reduces to per-arm integer sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy² — exact DECIMAL(38,0) sums
    * of integer-valued inputs, quantize money to cents upstream);
    * θ, means and variances are fixed chains on those sums, computed
    * identically per arm. Outputs ship UNROUNDED except the bounded
    * `var_reduction` ratio (the x152 magnitude rule).
    *
    * Output per arm: `(arm, n, theta, mean_y, mean_y_adj, var_y,
    * var_y_adj, var_reduction)` — population variances. */
  def cuped(df: DataFrame, armCol: String, metricCol: String,
            covariateCol: String): DataFrame = {
    val y = col(metricCol).cast("long")
    val x = col(covariateCol).cast("long")
    val valid = col(armCol).isNotNull && col(metricCol).isNotNull &&
      col(covariateCol).isNotNull
    def stats(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      grouped.agg(count(lit(1)).as("_n"),
        dsum(x).as("_sx"), dsum(y).as("_sy"),
        sum(d18(x) * d18(y)).as("_sxy"),
        sum(d18(x) * d18(x)).as("_sxx"),
        sum(d18(y) * d18(y)).as("_syy"))
    val perArm = stats(df.filter(valid).groupBy(col(armCol).as("arm")))
    val pooled = stats(df.filter(valid).groupBy())
      .select(col("_n").as("_pn"), col("_sx").cast("double").as("_psx"),
        col("_sy").cast("double").as("_psy"),
        col("_sxy").cast("double").as("_psxy"),
        col("_sxx").cast("double").as("_psxx"))
    // a constant covariate has no variance to exploit: theta (and the
    // adjusted outputs) report NULL rather than an ANSI divide-by-zero
    val thDen = col("_pn") * col("_psxx") - col("_psx") * col("_psx")
    val theta = when(thDen =!= 0,
      (col("_pn") * col("_psxy") - col("_psx") * col("_psy")) / thDen)
    val xbar = col("_psx") / col("_pn")
    def dbl(n: String) = col(n).cast("double")
    val n = col("_n")
    val varY = (n * dbl("_syy") - dbl("_sy") * dbl("_sy")) / (n * n)
    val varX = (n * dbl("_sxx") - dbl("_sx") * dbl("_sx")) / (n * n)
    val covXY = (n * dbl("_sxy") - dbl("_sx") * dbl("_sy")) / (n * n)
    val varAdj = varY - lit(2.0) * col("theta") * covXY +
      col("theta") * col("theta") * varX
    perArm.crossJoin(broadcast(pooled))
      .withColumn("theta", theta)
      .withColumn("_vy", varY)
      .withColumn("_va", varAdj)
      .select(col("arm"), col("_n").as("n"), col("theta"),
        (dbl("_sy") / n).as("mean_y"),
        (dbl("_sy") / n - col("theta") * (dbl("_sx") / n - xbar))
          .as("mean_y_adj"),
        col("_vy").as("var_y"), col("_va").as("var_y_adj"),
        round(lit(1.0) - col("_va") / col("_vy"), 6).as("var_reduction"))
  }

  /** Target encoding of a categorical column — replace each category
    * with (a smoothed, optionally leave-one-out) mean of an
    * INTEGER-VALUED target (quantize money to cents upstream; the
    * exactness contract needs integer sums). The standard
    * high-cardinality categorical featurizer, with the two classic
    * leakage controls built in:
    *
    *  - `te`: smoothed category mean `(Σ_c + m·prior) / (n_c + m)`
    *    with prior = global mean and m = `smoothing` pseudo-counts
    *    (m = 0 → plain mean). Rare categories shrink toward the
    *    prior instead of memorizing noise.
    *  - `te_loo`: leave-one-out mean `(Σ_c − y_row) / (n_c − 1)` — the
    *    row's own target never leaks into its feature; singleton
    *    categories (n_c = 1) fall back to the prior.
    *
    * Determinism: category sums/counts are exact integers; prior is
    * one integer ratio; each encode is a fixed per-row chain (one
    * multiply-add and one divide — `m·prior` first, then the add), so
    * results are partition-order independent AND bit-identical
    * cross-engine — which is why the encodes ship UNROUNDED: at the
    * magnitudes sums of cents reach, a presentation `round(·, 6)`
    * itself is the first cross-engine divergence (exact-decimal
    * HALF_UP vs multiply-based rounding disagree on representation
    * boundaries), while the raw doubles agree exactly. Category stats
    * join back by key (low-cardinality by the categorical contract;
    * Spark broadcasts under the threshold, AQE handles the rest).
    * Null categories or targets pass through with null encodes.
    *
    * Output: the input frame plus `te` and `te_loo`. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   smoothing: Double = 0.0): DataFrame = {
    require(smoothing >= 0.0, s"smoothing must be >= 0: $smoothing")
    Sampling.reserveColumns(df, Seq("te", "te_loo"), "targetEncode")
    val valid = col(catCol).isNotNull && col(targetCol).isNotNull
    val catStats = df.filter(valid)
      .groupBy(col(catCol))
      .agg(sum(col(targetCol).cast("long")).as("_csum"),
        count(lit(1)).as("_cn"))
    val prior = df.filter(valid)
      .agg((sum(col(targetCol).cast("long")).cast("double") /
        count(lit(1))).as("_prior"))
    df.join(catStats, Seq(catCol), "left")
      .crossJoin(broadcast(prior))
      .withColumn("te",
        when(valid, (col("_csum").cast("double") +
          lit(smoothing) * col("_prior")) / (col("_cn") + lit(smoothing))))
      .withColumn("te_loo",
        when(!valid, lit(null).cast("double"))
          .when(col("_cn") === 1, col("_prior"))
          .otherwise((col("_csum") - col(targetCol).cast("long"))
            .cast("double") / (col("_cn") - 1)))
      .drop("_csum", "_cn", "_prior")
  }
}
