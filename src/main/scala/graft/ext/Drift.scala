package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between per-group categorical
  * distributions and the global one — the monitoring primitive a
  * training-data pipeline runs per source/shard/day to catch skew
  * before it reaches a model (a crawl source gone spammy, a day of
  * logs with a broken enum, a shard dominated by one language).
  *
  * Metrics per group, against the pooled distribution:
  *  - `kl`: Kullback–Leibler divergence Σ p·ln(p/q) in nats. Support
  *    subtlety: a category the group never emits contributes 0 (the
  *    p·ln p convention as p→0); a category ONLY the group emits cannot
  *    occur, because the reference q is the pooled distribution, which
  *    dominates every group — the standard reason to compare against
  *    the pool rather than group-vs-group.
  *  - `chi2`: Pearson's Σ (o−e)²/e with e = n_group · q — the classic
  *    homogeneity statistic, ln-free (exact up to double summation
  *    order).
  *
  * Scale shape: one (group, value) count aggregate (map-side combined),
  * one value-keyed aggregate for the pooled counts (vocabulary-sized,
  * broadcast back), one group-keyed reduce for the sums. Nothing wider
  * than the contingency table ever shuffles. Cross-engine: counts and
  * the per-term ratios are exact; the ln and the final sums round to
  * 6 dp in the oracled query (house convention for log-bearing
  * scores). */
object Drift {

  /** THE clamped equi-width bin expression — one definition shared by
    * the PSI monitor and the distribution-matching sampler, because
    * the spelling is a cross-engine parity contract (their DuckDB
    * oracles pin this exact floor/clamp chain): edits desynchronize
    * silently if each operator carries its own copy. */
  private[ext] def clampedBin(v: org.apache.spark.sql.Column, nBins: Int,
                              lo: Double, hi: Double): org.apache.spark.sql.Column = {
    val raw = floor((v - lo) / ((hi - lo) / nBins)).cast("int")
    least(greatest(raw, lit(0)), lit(nBins - 1))
  }

  /** Per-group drift vs the pooled distribution of `valueCol`
    * (NULL values excluded on both sides). Output:
    * `(groupCol, n, kl, chi2)` — raw doubles; callers round for
    * cross-engine comparison. */
  def categoricalDrift(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    // internal columns carry a _drift_ prefix so no caller column name
    // (e.g. a group column literally called "g" or "n") can collide
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_drift_o"))
    val pooled = cells.groupBy(col(valueCol))
      .agg(sum(col("_drift_o")).as("_drift_pool"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("_drift_o")).as("_drift_n"))
    val grand = cells.agg(sum(col("_drift_o")).as("_drift_t"))
    // full (group × category) grid: chi2's zero cells (o = 0, e > 0)
    // still contribute e; KL's contribute 0 (p·ln p → 0), guarded
    // against the 0·ln 0 NaN explicitly
    totals.crossJoin(broadcast(pooled))
      .join(cells, Seq(groupCol, valueCol), "left")
      .withColumn("_drift_o", coalesce(col("_drift_o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("_drift_p", col("_drift_o").cast("double") / col("_drift_n"))
      .withColumn("_drift_q", col("_drift_pool").cast("double") / col("_drift_t"))
      .withColumn("_drift_e", col("_drift_n") * col("_drift_q"))
      .groupBy(col(groupCol), col("_drift_n"))
      .agg(
        sum(when(col("_drift_o") > 0,
          col("_drift_p") * log(col("_drift_p") / col("_drift_q")))
          .otherwise(lit(0.0))).as("kl"),
        sum((col("_drift_o") - col("_drift_e")) * (col("_drift_o") - col("_drift_e"))
          / col("_drift_e")).as("chi2"))
      .select(col(groupCol), col("_drift_n").cast("bigint").as("n"),
        col("kl"), col("chi2"))
  }

  /** Numeric drift via the Population Stability Index over FIXED
    * equi-width bins on [lo, hi) — the standard ML-monitoring score for
    * a numeric feature (PSI < 0.1 stable / 0.1–0.25 moderate / > 0.25
    * major shift, the conventional reading). Bin edges are
    * caller-fixed, NOT data-derived: quantile-derived edges would make
    * every group's score depend on every other group's data (and on
    * sampling order), where fixed edges keep the binning a pure
    * per-row function — deterministic, incremental, cross-engine.
    * Values outside [lo, hi) clamp into the edge bins (standard PSI
    * practice: out-of-range mass is drift signal, not discard).
    *
    * PSI(group) = Σ_bins (p_i − q_i)·ln(p_i/q_i) against the pooled
    * distribution, with `eps` (default 1e-6) substituted for empty
    * bins on either side (the conventional smoothing — PSI is
    * undefined at zero mass; smoothed terms stay finite and the
    * metric keeps its monotone-in-shift reading).
    *
    * Scale shape: identical to [[categoricalDrift]] with the bin index
    * as the category — one (group, bin) aggregate, broadcast pooled
    * counts, group-keyed reduce. Output:
    * `(groupCol, n, psi)` — raw doubles; callers round. */
  def numericDrift(df: DataFrame, groupCol: String, valueCol: String,
                   nBins: Int, lo: Double, hi: Double,
                   eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    require(lo < hi, s"empty bin range [$lo, $hi)")
    require(eps > 0, "eps must be positive")
    val v = col(valueCol).cast("double")
    val bin = Drift.clampedBin(v, nBins, lo, hi)
    val cells = df.filter(v.isNotNull)
      .select(col(groupCol), bin.as("_drift_bin"))
      .groupBy(col(groupCol), col("_drift_bin"))
      .agg(count(lit(1)).as("_drift_o"))
    val pooled = cells.groupBy(col("_drift_bin"))
      .agg(sum(col("_drift_o")).as("_drift_pool"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("_drift_o")).as("_drift_n"))
    val grand = cells.agg(sum(col("_drift_o")).as("_drift_t"))
    totals.crossJoin(broadcast(pooled))
      .join(cells, Seq(groupCol, "_drift_bin"), "left")
      .withColumn("_drift_o", coalesce(col("_drift_o"), lit(0L)))
      .crossJoin(broadcast(grand))
      // eps-smoothed shares: empty bins on either side take eps
      .withColumn("_drift_p",
        when(col("_drift_o") > 0,
          col("_drift_o").cast("double") / col("_drift_n")).otherwise(lit(eps)))
      .withColumn("_drift_q",
        col("_drift_pool").cast("double") / col("_drift_t"))
      .groupBy(col(groupCol), col("_drift_n"))
      .agg(sum((col("_drift_p") - col("_drift_q")) *
        log(col("_drift_p") / col("_drift_q"))).as("psi"))
      .select(col(groupCol), col("_drift_n").cast("bigint").as("n"),
        col("psi"))
  }

  /** Jensen–Shannon divergence per group vs the pooled distribution of
    * `valueCol` — the SYMMETRIC, bounded (≤ ln 2) companion to
    * [[categoricalDrift]]'s KL: no smoothing needed (the mixture
    * m = (p+q)/2 is positive wherever either side is), safe on
    * disjoint-ish supports where KL explodes, and comparable across
    * groups because of the fixed ceiling.
    *
    * `jsd = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)` over the full
    * (group × category) grid; p = 0 cells contribute only their
    * q-term (the p·ln p → 0 convention). Both double sums fold in
    * sorted category order over the contingency-sized list (x125
    * discipline), so the accumulation order is a pure function of the
    * data and the oracle replays it term for term.
    *
    * Scale shape: identical to [[categoricalDrift]] — one (group,
    * value) aggregate, broadcast pooled counts, group-keyed fold.
    * Output `(groupCol, n, jsd)` rounded to 6 dp. */
  def jensenShannon(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_drift_o"))
    val pooled = cells.groupBy(col(valueCol))
      .agg(sum(col("_drift_o")).as("_drift_pool"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("_drift_o")).as("_drift_n"))
    val grand = cells.agg(sum(col("_drift_o")).as("_drift_t"))
    val p = col("_drift_o").cast("double") / col("_drift_n")
    val q = col("_drift_pool").cast("double") / col("_drift_t")
    val m = (p + q) / lit(2.0)
    totals.crossJoin(broadcast(pooled))
      .join(cells, Seq(groupCol, valueCol), "left")
      .withColumn("_drift_o", coalesce(col("_drift_o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("_drift_term",
        when(col("_drift_o") > 0, p * log(p / m)).otherwise(lit(0.0)) / 2.0 +
          q * log(q / m) / 2.0)
      .groupBy(col(groupCol), col("_drift_n"))
      .agg(round(aggregate(
        array_sort(collect_list(struct(col(valueCol), col("_drift_term")))),
        lit(0.0), (acc, e) => acc + e.getField("_drift_term")), 6).as("jsd"))
      .select(col(groupCol), col("_drift_n").cast("bigint").as("n"),
        col("jsd"))
  }

  /** Benjamini–Hochberg step-up FDR correction over a family of
    * hypothesis tests — the alerting layer above the drift metrics:
    * monitoring thousands of (source × feature) tests at a fixed
    * per-test threshold drowns real drift in false alarms; BH keeps
    * the EXPECTED false-discovery fraction at `alpha` regardless of
    * family size.
    *
    * Input is one row per hypothesis `(idCol, pCol)`; the frame is a
    * test-RESULT table (post-aggregation, |hypotheses|-sized by
    * contract), so the unpartitioned rank/running-min windows are a
    * deliberate single-partition pass over a bounded frame — the same
    * contract as every model-eval operator here.
    *
    * Mechanics: rank p ascending (ties on id), q-value =
    * `min_{j ≥ i} m·p_j / j` capped at 1 (the monotone adjusted p),
    * reject iff the UNROUNDED q ≤ alpha — equivalent to the classic
    * step-up rule "reject ranks ≤ max{i : p_i ≤ i·α/m}". All
    * arithmetic is one multiply + one divide per row plus an exact
    * running min: no fold-order caveat. Rows with a null p are
    * dropped up front (an untested hypothesis is not in the family —
    * it must not inflate m).
    *
    * Output: `(idCol, pCol, rank, m, q_value, rejected)` with q
    * rounded to 6 dp for presentation (the rejection compares
    * unrounded). */
  def bhCorrect(df: DataFrame, idCol: String, pCol: String,
                alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1): $alpha")
    Sampling.reserveColumns(df, Seq("rank", "m", "q_value", "rejected"),
      "bhCorrect")
    val asc = Window.orderBy(col(pCol), col(idCol))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .select(col(idCol), col(pCol).cast("double").as(pCol))
      .filter(col(pCol).isNotNull)
      .withColumn("rank", row_number().over(asc).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
    val tail = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked
      .withColumn("_q", min(col("m").cast("double") * col(pCol) /
        col("rank")).over(tail))
      .select(col(idCol), col(pCol), col("rank"), col("m"),
        round(least(col("_q"), lit(1.0)), 6).as("q_value"),
        (col("_q") <= alpha).as("rejected"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group vs the pooled
    * distribution of a DISCRETE (bounded-cardinality) numeric column:
    * `ks = max_v |ECDF_group(v) − ECDF_pool(v)|` evaluated at every
    * pooled distinct value — which is every jump point of either ECDF
    * (the pool dominates each group), so the discrete sup is exact.
    * Complements PSI: binning-free, in [0, 1], and sensitive to
    * location shifts PSI's fixed equi-width bins can blur.
    *
    * Exactness: both ECDFs are integer ratios, |p − q| and the max are
    * single IEEE operations — no accumulation anywhere, so the result
    * is deterministic under any partitioning with NO fold-order
    * caveat.
    *
    * Scale shape: the (group, value) aggregate is the only
    * corpus-sized pass; the grid is |groups| × |distinct values|
    * (contingency-sized for discrete features — the documented
    * contract), and the cumulative window sorts distinct values
    * within one group. Output `(groupCol, n, ks)`. */
  def ksDistance(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_drift_o"))
    val pooled = cells.groupBy(col(valueCol))
      .agg(sum(col("_drift_o")).as("_drift_pool"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("_drift_o")).as("_drift_n"))
    val grand = cells.agg(sum(col("_drift_o")).as("_drift_t"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    totals.crossJoin(broadcast(pooled))
      .join(cells, Seq(groupCol, valueCol), "left")
      .withColumn("_drift_o", coalesce(col("_drift_o"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("_drift_cg", sum(col("_drift_o")).over(w))
      .withColumn("_drift_cp", sum(col("_drift_pool")).over(w))
      .groupBy(col(groupCol), col("_drift_n"))
      .agg(max(abs(col("_drift_cg").cast("double") / col("_drift_n") -
        col("_drift_cp").cast("double") / col("_drift_t"))).as("ks"))
      .select(col(groupCol), col("_drift_n").cast("bigint").as("n"),
        col("ks"))
  }
}
