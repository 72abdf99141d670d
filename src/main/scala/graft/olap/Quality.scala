package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP corpus over the `events` stream table — the reference's 12
  * dead-letter-analytics DuckDB queries plus its Grafana panel queries,
  * re-expressed as Spark DataFrame programs on the fixture schema
  * (event_id, ts, user_id, event_type, value, props JSON-string).
  *
  * Reference: `airflow/dags/duckDB/duckdb_olap.ipynb` cell 2 q1-q12;
  * `grafana/dashboards/daily_dashboard_for_invalid_data-*.json` panels;
  * operator ids A1-A6, A12, W1, O1-O3, P21-P27 in SURVEY.md §2.
  *
  * Scale design: every query is a narrow projection + one hash aggregate.
  * The parquet scan prunes to the referenced columns, partial (map-side)
  * aggregation runs before the shuffle, and the exchange carries only
  * |group keys| rows. Sorts happen after aggregation on tiny results
  * (TakeOrderedAndProject for the top-K). Nothing collects to the driver.
  */
object Quality {

  /** q1 / A1+O1: message count per topic (event_type plays the topic). */
  def countByType(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("event_type"))

  /** q2 / A2+P21: hourly message volume. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour"))

  /** q3 / A3: one-pass conditional aggregation — per-day pivot of the five
    * event classes (reference: 5 keyword LIKE counts in one scan). */
  def dailyTypePivot(events: DataFrame): DataFrame = {
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"${t}_count")
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(cnt("error"), cnt("signup"), cnt("purchase"), cnt("view"), cnt("click"))
      .orderBy(col("day"))
  }

  /** q4 / A4: average payload length per (type, day). */
  def avgPropsLen(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(avg(length(col("props"))), 2).as("avg_len"))
      .orderBy(col("event_type"), col("day"))

  /** q5 / A5+J2: ratio of aggregates via two grouped counts + left join +
    * coalesce null-fill (reference NB q5 invalid-percentage-per-topic). */
  def userErrorPct(events: DataFrame): DataFrame = {
    val totals = events.groupBy(col("user_id")).agg(count(lit(1)).as("total"))
    val errs = events.filter(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
    totals.join(errs, Seq("user_id"), "left")
      .select(
        col("user_id"), col("total"),
        coalesce(col("n_err"), lit(0L)).as("n_err"),
        round(coalesce(col("n_err"), lit(0L)) * lit(100.0) / col("total"), 2).as("error_pct"))
      .orderBy(col("user_id"))
  }

  /** q6 / A5 single-pass variant: daily error percentage. */
  def dailyErrorPct(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_err"))
      .select(
        col("day"), col("total"), col("n_err"),
        round(col("n_err") * lit(100.0) / col("total"), 2).as("error_pct"))
      .orderBy(col("day"))

  /** q7 / A6+O2: top-10 most frequent (type, payload) pairs; deterministic
    * tie-break on the full group key. Spark plans TakeOrderedAndProject —
    * only K rows cross the final exchange. */
  def topkTypeProps(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), col("props"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("event_type"), col("props"))
      .limit(10)

  /** q8 / P24+P25+P26: fixed-horizon recency window (cutoff minus one day)
    * + IN-list predicate; both pushed into the parquet scan. */
  def lateWindow(events: DataFrame): DataFrame =
    events
      .filter(col("ts") >= date_sub(lit("2024-01-25").cast("date"), 1).cast("timestamp"))
      .filter(col("event_type").isin("error", "purchase"))
      .select(
        col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** q9 / P22+P23: JSON field extraction from a string column + multi-branch
    * CASE classifier (reference: message ->> 'strSport' + error-category). */
  def kbandClassify(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    events.select(
        when(k < 25, "low").when(k < 50, "mid").when(k < 75, "high")
          .otherwise("top").as("k_band"))
      .groupBy(col("k_band"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k_band"))
  }

  /** q10 / W1: 6-hour moving average of the hourly high-value rate over an
    * hourly CTE with an explicit ROWS frame (reference NB q10's
    * moving_avg_6_hours of invalid-percentage). The rate is a ratio of
    * integer counts — bit-exact in any engine/summation order — so the
    * final 2-decimal rounding is stable cross-engine. */
  def movingAvg(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 100, 1).otherwise(0)).as("n_hi"))
      .select(col("event_type"), col("hour"),
        (col("n_hi") * lit(100.0) / col("n")).as("pct_hi"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-5, Window.currentRow)
    hourly
      .select(col("event_type"), col("hour"),
        round(col("pct_hi"), 2).as("pct_hi"),
        round(avg(col("pct_hi")).over(w), 2).as("moving_avg_6h"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** q11 / A12: null-count profiling per type. */
  def nullProfile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("props").isNull, 1).otherwise(0)).as("n_null_props"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_null_value"))
      .select(
        col("event_type"), col("n"), col("n_null_props"), col("n_null_value"),
        round(col("n_null_props") * lit(100.0) / col("n"), 2).as("null_props_pct"))
      .orderBy(col("event_type"))

  /** q12 / P27: per-row null-ratio score over three named columns. */
  def nullRatioScore(events: DataFrame): DataFrame = {
    def nul(c: String) = when(col(c).isNull, 1).otherwise(0)
    events.select(
        col("event_id"),
        ((nul("props") + nul("value") + nul("user_id")) * lit(100.0) / lit(3))
          .as("null_pct"))
      .orderBy(col("event_id"))
  }

  /** Robust per-group outlier scoring via median/MAD — the
    * distribution-free cousin of the z-score, immune to the outliers it
    * hunts (a handful of 100 MB documents shifts a mean, not a median).
    *
    * Scale shape: two grouped exact-percentile aggregations over the
    * (small) group dimension, each broadcast back onto the fact — no
    * fact-side shuffle beyond the two aggregations, no window over the
    * whole table. `robust_z` is null when the MAD is 0 (≥ half the group
    * identical); `is_outlier` treats that as in-lier.
    *
    * Exactness: with integer-valued inputs the median interpolates to a
    * multiple of 0.5 (exact in doubles), absolute deviations stay
    * multiples of 0.5, so the MAD is exact too and the final division is
    * a single correctly-rounded IEEE op — bit-identical cross-engine.
    *
    * State bound: exact `percentile`'s buffer is a per-group
    * value→count map — distinct-value-proportional, which for a
    * CONTINUOUS metric is row-proportional (the rfm/x150 bound class).
    * `approxK > 0` swaps in the bounded KLL read with `percentile`'s
    * interpolation (`graft_kll_quantiles_cont`): O(approxK·log)
    * doubles per group, bit-identical to exact while a group's rows
    * fit the sketch (spec-pinned), the documented rank-error band +
    * run-to-run caveat beyond. Default 0 keeps exact (the oracled
    * regime). */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
                     threshold: Double = 3.5, approxK: Int = 0): DataFrame = {
    require(approxK == 0 || approxK >= 8,
      s"approxK must be 0 (exact percentile) or >= 8 (KLL): $approxK")
    graft.Guards.reserved(df, "robustOutliers",
      Seq("med", "mad", "robust_z", "is_outlier"))
    val v = col(valCol).cast("double")
    def med50(c: org.apache.spark.sql.Column) =
      if (approxK == 0) percentile(c, lit(0.5))
      else element_at(graft.functions.GraftFunctions.kllQuantilesCont(
        df.sparkSession, c, approxK, Seq(0.5)), 1)
    val med = df.groupBy(col(groupCol))
      .agg(med50(v).as("med"))
    val mad = df.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol), col("med"))
      .agg(med50(abs(v - col("med"))).as("mad"))
    val z = when(col("mad") === 0.0, lit(null).cast("double"))
      .otherwise((v - col("med")) / col("mad"))
    df.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z", z)
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** Winsorize: clip a value to its per-group [pLo, pHi] exact
    * percentiles — the standard tail-taming step before feature
    * normalization. One tiny per-group percentile aggregate broadcast
    * back onto the table (no shuffle of the fact). Null group keys or
    * values pass through unclipped (no percentile is defined for them).
    *
    * Exactness contract (lesson: integer inputs only): both engines
    * interpolate percentiles in doubles, which is bit-identical only
    * when the inputs are integers — callers winsorizing decimals should
    * expect 1-ulp divergence from other engines.
    *
    * State bound: as [[robustOutliers]] — `approxK > 0` bounds the
    * per-group percentile state with the interpolating KLL read
    * (bit-identical to exact while a group's rows fit the sketch,
    * spec-pinned); default 0 keeps exact `percentile`, whose buffer
    * is distinct-value-proportional per group. */
  def winsorize(df: DataFrame, valCol: String, groupCol: String,
                pLo: Double, pHi: Double, approxK: Int = 0): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0,
      s"need 0 <= pLo <= pHi <= 1, got ($pLo, $pHi)")
    require(approxK == 0 || approxK >= 8,
      s"approxK must be 0 (exact percentile) or >= 8 (KLL): $approxK")
    graft.Guards.reserved(df, "winsorize", Seq("p_lo", "p_hi", "clipped"))
    val v = col(valCol).cast("double")
    val grouped = df
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(groupCol))
    val stats =
      if (approxK == 0)
        grouped.agg(percentile(v, lit(pLo)).as("p_lo"),
          percentile(v, lit(pHi)).as("p_hi"))
      else grouped
        // ONE sketch per group answers both quantiles
        .agg(graft.functions.GraftFunctions.kllQuantilesCont(
          df.sparkSession, v, approxK, Seq(pLo, pHi)).as("_q"))
        .select(col(groupCol), element_at(col("_q"), 1).as("p_lo"),
          element_at(col("_q"), 2).as("p_hi"))
    df.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn("clipped",
        when(col("p_lo").isNull || col(valCol).isNull, v)
          .when(v < col("p_lo"), col("p_lo"))
          .when(v > col("p_hi"), col("p_hi"))
          .otherwise(v))
  }

  /** Fixed-width histogram: bin = floor(value / width), counted per
    * (group, bin). Pure arithmetic binning (identical across engines,
    * unlike width_bucket variants), one partially-aggregated shuffle on
    * (group, bin) — the profile stays |groups|×|bins| rows no matter
    * the table size. Null values are excluded (they have no bin). */
  def histogram(df: DataFrame, valCol: String, width: Double,
                groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    graft.Guards.reserved(df, "histogram", Seq("bin", "bin_lo", "n"))
    val keys = groupCols.map(col) :+
      floor(col(valCol).cast("double") / width).cast("long").as("bin")
    df.filter(col(valCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin") * width)
      .orderBy((groupCols.map(col) :+ col("bin")): _*)
  }

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * over the same items (the labeling-QA verb: human vs human, model
    * vs human, or rule vs rule; κ=1 perfect, 0 chance-level, <0 worse
    * than chance). Null labels on either side drop (un-rated items).
    *
    * Exactness: one contingency aggregate (|labels|² cells); observed
    * agreement po = diag/n and expected pe = Σ_k rowsum_k·colsum_k / n²
    * both reduce to INTEGER ratios. The cross-marginal product sums as
    * DECIMAL(38,0) — per-label marginals pass ~3e9 rows long before
    * 100 TB, so a BIGINT×BIGINT product would wrap silently (the same
    * reason mutualInfo multiplies as doubles) — and pe divides by n
    * twice (never by the n² product, which wraps at the same scale).
    * po/pe agree cross-engine to well within the driver's 1e-12
    * compare tolerance: below 2^53 the decimal→double conversions are
    * exact on both engines; above it Spark's Decimal.toDouble is
    * correctly rounded while DuckDB's HUGEINT→DOUBLE may compose two
    * conversions, so the last ulp can differ at extreme magnitudes —
    * which is why po/pe/κ ship UNROUNDED (the round(x,6)
    * large-magnitude footgun) and lean on the tolerance band.
    * Returns one row (n, po, pe, kappa); κ is null for the degenerate
    * single-category case (pe=1 — agreement is unmeasurable, not 1). */
  def cohenKappa(df: DataFrame, rater1: Column, rater2: Column): DataFrame =
    kappaFromCells(df.select(rater1.as("_r1"), rater2.as("_r2"))
      .filter(col("_r1").isNotNull && col("_r2").isNotNull)
      .groupBy(col("_r1"), col("_r2")).agg(count(lit(1)).as("_c")))

  /** [[cohenKappa]]'s arithmetic tail over a pre-aggregated
    * contingency table `(_r1, _r2, _c)` — split out so the
    * decimal-path exactness (pe at >2^31-scale marginals, where a
    * BIGINT cross-marginal product would wrap) is testable with
    * synthetic counts no spec could materialize as rows. */
  private[graft] def kappaFromCells(cells: DataFrame): DataFrame = {
    val m1 = cells.groupBy(col("_r1").as("_k")).agg(sum(col("_c")).as("_a"))
    val m2 = cells.groupBy(col("_r2").as("_k")).agg(sum(col("_c")).as("_b"))
    // labels used by only one rater have a zero opposite marginal and
    // contribute nothing to pe — the inner join drops exactly those;
    // disjoint label sets leave an empty sum → pe = 0, not null
    val cross = m1.join(m2, "_k")
      .agg(coalesce(
        sum(col("_a").cast("decimal(19,0)") * col("_b").cast("decimal(19,0)")),
        lit(0L).cast("decimal(38,0)")).as("_ab"))
    cells.agg(
        sum(col("_c")).as("n"),
        sum(when(col("_r1") === col("_r2"), col("_c")).otherwise(0L)).as("_diag"))
      .crossJoin(broadcast(cross))
      .select(col("n"),
        (col("_diag").cast("double") / col("n")).as("po"),
        (col("_ab").cast("double") / col("n").cast("double") /
          col("n").cast("double")).as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
  }

  /** Per-group percentile normalization: the percent_rank of a score
    * WITHIN its group — the calibration step before mixing scored data
    * across sources/domains (a quality classifier's raw scores are not
    * comparable between domains; their within-domain ranks are).
    * Rank-based, so it is invariant to any monotone per-group score
    * transform; ties share a rank, so the output is deterministic
    * under any row order. Appends `pct` ∈ [0, 1] (integer-ratio
    * (rank−1)/(n−1); a single-row group normalizes to 0).
    *
    * Scale: one window partitioned by the group — each sort holds one
    * group, never the corpus. */
  def percentileNormalize(df: DataFrame, groupCol: String,
                          scoreCol: String): DataFrame = {
    graft.Guards.reserved(df, "percentileNormalize", Seq("pct"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    df.filter(col(scoreCol).isNotNull)
      .withColumn("pct", percent_rank().over(w))
  }

  /** Mutual information between two categorical columns — the
    * dataset-audit dependence measure (is `lang` confounded with
    * `source`? does a quality label leak the domain?), reported with
    * both marginal entropies and the normalized MI
    * `mi / sqrt(hx·hy)` ∈ [0, 1].
    *
    * Scale/exactness: one contingency aggregate (|X|·|Y| cells — the
    * ONLY corpus-sized pass), marginals derived from the cells, and
    * every double sum folds in sorted category order over the
    * contingency-sized list (the x119/x120 discipline), so the IEEE
    * accumulation order is a pure function of the data and DuckDB
    * replays it term for term. Counts multiply as DOUBLES (c·n and
    * cx·cy overflow bigint at warehouse row counts). Null categories
    * drop. Returns one row
    * `(n, n_cells, mi, hx, hy, nmi)`; `nmi` is null when either
    * marginal entropy is 0 (a constant column — dependence is
    * unmeasurable, not 0). */
  def mutualInfo(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df.select(xCol.as("_x"), yCol.as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_c"))
    val mx = cells.groupBy(col("_x")).agg(sum(col("_c")).as("_cx"))
    val my = cells.groupBy(col("_y")).agg(sum(col("_c")).as("_cy"))
    val tot = cells.agg(sum(col("_c")).as("n"), count(lit(1)).as("n_cells"))
    val mi = cells.join(mx, "_x").join(my, "_y")
      .crossJoin(broadcast(tot.select(col("n"))))
      .select(col("_x"), col("_y"),
        ((col("_c").cast("double") / col("n")) *
          log((col("_c").cast("double") * col("n")) /
            (col("_cx").cast("double") * col("_cy")))).as("_t"))
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("_x"), col("_y"), col("_t")))),
        lit(0.0), (acc, e) => acc + e.getField("_t")), 6).as("mi"))
    def marginalEntropy(m: DataFrame, k: String, c: String, out: String) =
      m.crossJoin(broadcast(tot.select(col("n"))))
        .select(col(k), (-(col(c).cast("double") / col("n")) *
          log(col(c).cast("double") / col("n"))).as("_t"))
        .agg(round(aggregate(
          array_sort(collect_list(struct(col(k), col("_t")))),
          lit(0.0), (acc, e) => acc + e.getField("_t")), 6).as(out))
    tot.crossJoin(broadcast(mi))
      .crossJoin(broadcast(marginalEntropy(mx, "_x", "_cx", "hx")))
      .crossJoin(broadcast(marginalEntropy(my, "_y", "_cy", "hy")))
      .select(col("n"), col("n_cells"), col("mi"), col("hx"), col("hy"),
        when(col("hx") > 0.0 && col("hy") > 0.0,
          round(col("mi") / sqrt(col("hx") * col("hy")), 6)).as("nmi"))
  }

  /** Per-group WEIGHTED (lower) median: the smallest value whose
    * cumulative weight reaches half the group's total. With integer
    * weights (token counts, byte sizes) the comparison `2·cum ≥ total`
    * is exact integer arithmetic — no halves, no ties, deterministic
    * under any row order. The token-weighted median answers "what
    * document length does the MIDDLE TOKEN of this source live in?" —
    * the mixing-relevant center a row-weighted median misrepresents
    * whenever length and count diverge.
    *
    * Scale: one corpus aggregate collapses to per-(group, value)
    * weight sums; the cumulative window sorts DISTINCT values within
    * one group, never rows. Output `(group, total_w, w_median)`. */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
                     weight: Column): DataFrame = {
    val g = df.select(col(groupCol).as("group"), col(valCol).as("_v"),
        weight.cast("long").as("_w"))
      .filter(col("_v").isNotNull && col("_w").isNotNull && col("_w") > 0L)
      .groupBy(col("group"), col("_v"))
      .agg(sum(col("_w")).as("_gw"))
    val w = Window.partitionBy(col("group")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("_cum", sum(col("_gw")).over(w))
      .withColumn("_tot", sum(col("_gw")).over(Window.partitionBy(col("group"))))
      .filter(col("_cum") * 2L >= col("_tot"))
      .groupBy(col("group"))
      .agg(min(col("_v")).as("w_median"), max(col("_tot")).as("total_w"))
      .select(col("group"), col("total_w"), col("w_median"))
  }

  /** Classifier/filter threshold sweep — the calibration verb for a
    * curation pipeline: for every DISTINCT score value t (read as the
    * rule "keep iff score >= t"), the confusion counts against a binary
    * label plus precision/recall/F1 — i.e. the full PR curve in one
    * pass, from which a filter threshold is picked (the step between
    * training a quality/language classifier and applying it as a gate).
    *
    * Scale shape: one hash aggregate collapses the input to the
    * per-score table (|distinct scores| rows — for the INTEGER-VALUED
    * scores this exact variant is meant for, orders of magnitude below
    * the row count), and the cumulative tp/pp window runs over THAT
    * table, so its single-partition sort holds score cardinality,
    * never rows. For CONTINUOUS classifier scores — where distinct
    * count ≈ row count and that sort becomes a corpus-sized
    * single-partition scale-killer — use [[thresholdSweepBinned]],
    * which quantizes to a bounded lattice first; this variant guards
    * loudly (`maxDistinct`) rather than degrade silently.
    * Null scores are excluded (no threshold to represent them); null
    * labels DROP — the [[graft.ext.Stats.groupAuc]] contract (the
    * label mapping keeps null null, `when(label,1).when(!label,0)`,
    * so the isNotNull filter excludes un-labeled rows instead of
    * silently counting them as negatives and skewing every ratio).
    *
    * precision/recall are integer-ratio doubles and F1 is one
    * mul/div chain over them — bit-stable cross-engine. pp (predicted
    * positive) is never 0: each threshold IS an attained score, so at
    * least one row clears it. recall and f1 are NULL on a
    * positive-free input (0/0 is undefined — the null-for-undefined
    * convention kappa/NMI use — never NaN or a silent 0.0). */
  def thresholdSweep(df: DataFrame, scoreCol: String, label: Column,
                     maxDistinct: Long = 1000000L): DataFrame = {
    graft.Guards.reserved(df, "thresholdSweep",
      Seq("threshold", "tp", "fp", "fn", "tn", "precision", "recall", "f1"))
    val g = df.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("threshold"),
        when(label, 1L).when(!label, 0L).as("_y"))
      .filter(col("_y").isNotNull)
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"))
    sweepFromPerScore(g, maxDistinct)
  }

  /** The shared cumulative-confusion tail of the threshold sweeps: from
    * the per-score `(threshold, _n, _np)` table, the PR curve. The
    * global window is bounded by `maxDistinct` — a LOUD in-plan guard
    * (not a driver count: that would be a second job) that fails the
    * query instead of silently sorting a corpus-sized table on one
    * partition when a continuous score sneaks into the exact variant.
    *
    * `g` is referenced twice (guard-count crossJoin) and feeds `tot` a
    * third time — all three read the SAME per-score aggregate subtree,
    * which Spark's ReuseExchange collapses to one shuffle (pinned by
    * the QualitySpec plan gate); no persist is needed because the
    * reused exchange IS the sharing mechanism. */
  private def sweepFromPerScore(g: DataFrame, maxDistinct: Long): DataFrame = {
    val guarded = g.crossJoin(broadcast(g.agg(count(lit(1)).as("_nd"))))
      .withColumn("_gd",
        when(col("_nd") <= maxDistinct, col("_nd"))
          .otherwise(raise_error(concat(
            lit("thresholdSweep: distinct score count "), col("_nd"),
            lit(s" exceeds maxDistinct=$maxDistinct — continuous scores" +
              " belong in thresholdSweepBinned")))))
      .filter(col("_gd") >= 0).drop("_nd", "_gd")
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = guarded.agg(sum(col("_n")).as("_tot"), sum(col("_np")).as("_pos"))
    val p = col("tp").cast("double") / col("pp")
    val r = when(col("_pos") > 0L, col("tp").cast("double") / col("_pos"))
    guarded.withColumn("tp", sum(col("_np")).over(w))
      .withColumn("pp", sum(col("_n")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("_pos") - col("tp")).as("fn"),
        (col("_tot") - col("pp") - (col("_pos") - col("tp"))).as("tn"),
        p.as("precision"), r.as("recall"),
        when(r.isNull, lit(null).cast("double"))
          .when(p + r > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)).as("f1"))
      .orderBy(col("threshold").desc)
  }

  /** [[thresholdSweep]] for CONTINUOUS classifier scores (NB log-odds,
    * probabilities, perplexities) — the regime where distinct values ≈
    * rows and the exact variant's per-score table would be
    * corpus-sized. Scores quantize to a fixed lattice FIRST
    * (`floor(score·scale + 0.5) / scale` — the portable rounding, the
    * same spelling the calibration report uses; never `round()`, whose
    * half-tie rule differs across engines), so the per-threshold table
    * is bounded by the score range × scale (e.g. scores in [-20, 20]
    * at scale 1e3 → ≤ 40k thresholds) regardless of corpus size, and
    * the cumulative window sorts THAT. Each reported threshold is a
    * lattice point; "keep iff score >= t" over lattice points is the
    * same gate as over raw scores up to half a lattice step — the
    * resolution the caller chose. Confusion counts stay EXACT (rows
    * bin by quantized score; nothing is sampled). Null contract is
    * [[thresholdSweep]]'s: null scores excluded, null labels DROP. */
  def thresholdSweepBinned(df: DataFrame, scoreCol: String, label: Column,
                           scale: Double = 1000.0,
                           maxDistinct: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    graft.Guards.reserved(df, "thresholdSweepBinned",
      Seq("threshold", "tp", "fp", "fn", "tn", "precision", "recall", "f1"))
    val g = df.filter(col(scoreCol).isNotNull)
      .select(
        (floor(col(scoreCol).cast("double") * scale + 0.5) / scale)
          .as("threshold"),
        when(label, 1L).when(!label, 0L).as("_y"))
      .filter(col("_y").isNotNull)
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_np"))
    sweepFromPerScore(g, maxDistinct)
  }

  /** Benford's-law first-digit audit over an INTEGER-VALUED column
    * (quantize money to cents upstream) — the classic fabricated-data
    * / broken-feed screen: naturally-grown magnitudes follow
    * `P(d) = log10(1 + 1/d)`; duplicated rows, capped fields, or
    * synthetic fills visibly don't. Reports the full 1–9 digit grid
    * (absent digits appear with n = 0 — a missing row would hide the
    * strongest signal) plus the chi-square statistic and the mean
    * absolute deviation (Nigrini's MAD), both repeated per row as
    * report constants.
    *
    * Exactness: the first digit comes from the BIGINT's decimal string
    * (never from `log10`, whose boundary behavior at powers of ten is
    * engine-dependent); counts are exact; expected fractions are one
    * ln-ratio each; the two summary folds run over the 9-row grid in
    * digit order. Zero and null values are excluded (no first
    * significant digit). One corpus aggregate; everything after is
    * 9 rows.
    *
    * Output: `(digit, n, total, obs_frac, exp_frac, chi2, mad)`. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // filter on the CASTED long: a fractional 0 < |v| < 1 would pass a
    // raw =!= 0 check, truncate to digit '0', and silently inflate the
    // total without ever appearing in the 1-9 grid
    val digits = df
      .filter(col(valueCol).isNotNull &&
        abs(col(valueCol).cast("long")) >= 1)
      .select(substring(abs(col(valueCol).cast("long")).cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    val grid = tot
      .select(explode(sequence(lit(1), lit(9))).as("digit"), col("total"))
      .join(digits, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("obs_frac", col("n").cast("double") / col("total"))
      .withColumn("exp_frac",
        log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
    val summary = grid
      .select(col("digit"),
        (col("exp_frac") * col("total")).as("_e"),
        col("n"), col("obs_frac"), col("exp_frac"))
      .agg(
        aggregate(array_sort(collect_list(struct(col("digit"),
          ((col("n") - col("_e")) * (col("n") - col("_e")) / col("_e"))
            .as("_t")))),
          lit(0.0), (acc, e) => acc + e.getField("_t")).as("_chi2"),
        aggregate(array_sort(collect_list(struct(col("digit"),
          abs(col("obs_frac") - col("exp_frac")).as("_t")))),
          lit(0.0), (acc, e) => acc + e.getField("_t")).as("_madsum"))
      .select(round(col("_chi2"), 6).as("chi2"),
        round(col("_madsum") / 9.0, 6).as("mad"))
    grid.crossJoin(broadcast(summary))
      .select(col("digit").cast("long").as("digit"), col("n"), col("total"),
        round(col("obs_frac"), 6).as("obs_frac"),
        round(col("exp_frac"), 6).as("exp_frac"),
        col("chi2"), col("mad"))
  }
}
