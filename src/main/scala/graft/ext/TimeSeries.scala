package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an event stream onto a fixed
  * grid, then fill the grid's holes — the shape behind monitoring
  * rollups, ML feature windows and any "metric per key per interval"
  * table built from irregular events.
  *
  * Everything is exact and engine-portable by construction: bins are
  * integer indexes (`floor(epoch_seconds / step)`), the resampled
  * metric is an integer count, and interpolation is one pinned
  * double-precision formula over exact integer endpoints — identical
  * IEEE operations in any engine that mirrors the expression, so
  * results hash-match cross-engine (no rounding fudge needed).
  *
  * Scale: resampling is ONE shuffle on (key, bin) with map-side
  * partial counts. The spine (grid) is derived from a one-row-per-key
  * aggregate and exploded — its size is (time span / step) per key,
  * independent of the event count, so a year of minutes is ~526k rows
  * per key: the explode side stays small relative to the events that
  * produced it. Gap filling sorts each key's grid once (both window
  * frames share one partitioning + sort). Keys are processed
  * independently — skewed keys cost their own spine length, never
  * another key's.
  */
object TimeSeries {

  /** Integer bin index of `ts` on a `stepSeconds` grid. For POST-1970
    * timestamps, sub-second precision cannot move the floor (the bin
    * boundary is a whole multiple of step), so truncating
    * `unix_timestamp` matches an engine that floors fractional epoch
    * seconds. Pre-epoch timestamps diverge: Spark truncates toward
    * zero (-0.5s → second 0) where floor engines round down (→ -1) —
    * don't feed pre-1970 data through a cross-engine comparison. Null
    * timestamps yield a null bin. */
  def binIndex(ts: Column, stepSeconds: Long): Column = {
    require(stepSeconds > 0, s"step must be positive: $stepSeconds")
    floor(unix_timestamp(ts) / stepSeconds).cast("long")
  }

  /** Events-per-(key, bin) on the `stepSeconds` grid: `(key, bin, n)`.
    * Only OBSERVED bins appear — [[gapFill]] completes the grid. `n` is
    * DOUBLE so the filled column keeps one type through the fill step.
    * Rows with a null timestamp are EXCLUDED (explicitly, here — a
    * null bin would otherwise be dropped silently by the gap-fill
    * spine join); count them upstream if the loss must be audited. */
  def resampleCounts(df: DataFrame, keyCol: String, tsCol: String,
                     stepSeconds: Long): DataFrame = {
    Sampling.reserveColumns(df, Seq("bin", "n"), "resampleCounts")
    df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), binIndex(col(tsCol), stepSeconds).as("bin"))
      .agg(count(lit(1)).cast("double").as("n"))
  }

  /** Complete each key's bin range `[min, max]` and fill holes.
    * `mode` = "interpolate" (linear between the flanking observed
    * bins) or "ffill" (carry the previous observed value forward).
    * Output adds `observed` (was the bin present in the input).
    *
    * Preconditions (both true for [[resampleCounts]] output, neither
    * checked — checking costs a full pass):
    *  - `valueCol` is non-null on input rows — the spine's endpoints
    *    are observed bins, so every hole is interior and both flanks
    *    exist;
    *  - `(keyCol, binCol)` is UNIQUE — a duplicate bin fans out the
    *    spine join and ties the window order, making the fill
    *    endpoints non-deterministic. Pre-aggregate duplicates away.
    */
  def gapFill(resampled: DataFrame, keyCol: String, binCol: String,
              valueCol: String, mode: String = "interpolate"): DataFrame = {
    require(mode == "interpolate" || mode == "ffill", s"unknown fill mode $mode")
    Sampling.reserveColumns(resampled, Seq("observed", "_pv", "_pb", "_nv", "_nb"),
      "gapFill")
    val k = col(keyCol); val b = col(binCol)
    val spine = resampled.groupBy(k)
      .agg(min(b).as("_lo"), max(b).as("_hi"))
      .select(k, explode(sequence(col("_lo"), col("_hi"))).as(binCol))
    val joined = spine.join(resampled, Seq(keyCol, binCol), "left")
    val w = Window.partitionBy(k).orderBy(b)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol).cast("double")
    val filled = mode match {
      case "ffill" => when(v.isNotNull, v).otherwise(col("_pv"))
      case _ => when(v.isNotNull, v).otherwise(
        // pinned interpolation shape: pv + (nv - pv) * (bin - pb) / (nb - pb)
        col("_pv") + (col("_nv") - col("_pv")) * (b - col("_pb")) / (col("_nb") - col("_pb")))
    }
    joined
      .withColumn("_pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("_pb", last(when(v.isNotNull, b), ignoreNulls = true).over(wPrev))
      .withColumn("_nv", first(v, ignoreNulls = true).over(wNext))
      .withColumn("_nb", first(when(v.isNotNull, b), ignoreNulls = true).over(wNext))
      .withColumn("observed", v.isNotNull)
      .withColumn(valueCol, filled)
      .drop("_pv", "_pb", "_nv", "_nb")
  }

  /** Trailing-window ML features per (key, bin): previous value, delta,
    * and rolling sum/count/avg/min/max over the last `window` bins
    * (current row included). One window partitioning + sort serves every
    * frame.
    *
    * Exactness: over integer-VALUED doubles (counts — [[resampleCounts]]
    * possibly ffilled) every partial sum is itself an integer below
    * 2^53, so window-sum results are independent of the engine's frame
    * algorithm (running, segment tree, recompute) — safe to hash
    * cross-engine. `roll_avg` is then one pinned double division. */
  def rollingFeatures(df: DataFrame, keyCol: String, binCol: String,
                      valueCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    Sampling.reserveColumns(df,
      Seq("lag_1", "delta", "roll_sum", "roll_cnt", "roll_avg", "roll_min",
        "roll_max"), "rollingFeatures")
    val k = col(keyCol); val b = col(binCol); val v = col(valueCol)
    val w1 = Window.partitionBy(k).orderBy(b)
    val wt = w1.rowsBetween(-(window - 1), Window.currentRow)
    val lag1 = lag(v, 1).over(w1)
    df.select(k, b, v,
      lag1.as("lag_1"),
      (v - lag1).as("delta"),
      sum(v).over(wt).as("roll_sum"),
      count(v).over(wt).cast("long").as("roll_cnt"),
      (sum(v).over(wt) / count(v).over(wt)).as("roll_avg"),
      min(v).over(wt).as("roll_min"),
      max(v).over(wt).as("roll_max"))
  }

  /** Deviation of each bin's value from its OWN trailing history: the
    * population z-score against the previous `history` bins (current
    * row excluded, so a spike cannot deflate its own baseline).
    *
    * The whole score stays in exact integer arithmetic until the last
    * two ops: with c = history count, s = Σv, q = Σv², the identity
    *   z = (x − s/c) / √(q/c − s²/c²) = (c·x − s) / √(c·q − s²)
    * makes every intermediate an exactly-representable integer (for
    * integer-valued inputs), and the final divide and √ are both
    * correctly-rounded IEEE ops — bit-identical in any engine that
    * mirrors the right-hand spelling. z is null when history has < 2
    * bins or zero variance; a zero-variance history with a deviating
    * value (an "infinite z") still flags `is_anomaly`. */
  def anomalyScore(df: DataFrame, keyCol: String, binCol: String,
                   valueCol: String, history: Int = 12,
                   threshold: Double = 3.0): DataFrame = {
    require(history >= 2, s"history must be >= 2: $history")
    require(threshold > 0, s"threshold must be positive: $threshold")
    Sampling.reserveColumns(df, Seq("z", "is_anomaly"), "anomalyScore")
    val k = col(keyCol); val b = col(binCol); val v = col(valueCol)
    val wh = Window.partitionBy(k).orderBy(b).rowsBetween(-history, -1)
    val s = sum(v).over(wh)
    val q = sum(v * v).over(wh)
    val c = count(v).over(wh).cast("double")
    val varTerm = c * q - s * s
    val z = when(c >= 2 && varTerm > 0, (c * v - s) / sqrt(varTerm))
    val constDev =
      coalesce(c >= 2 && varTerm === 0 && (c * v - s) =!= 0, lit(false))
    df.select(k, b, v, z.as("z"),
      (coalesce(abs(z) > threshold, lit(false)) || constDev).as("is_anomaly"))
  }

  /** Exponentially-weighted moving average per key:
    * `s₁ = x₁; sᵢ = α·xᵢ + (1−α)·sᵢ₋₁` in bin order — the smoother
    * behind alerting baselines and trend panels ([[rollingFeatures]]'
    * flat windows weight old and new equally; EWMA discounts
    * geometrically, which is what a drifting metric needs).
    *
    * The recurrence is inherently sequential per key, so — like the
    * MMR/BPE family — each key's (bounded, documented-contract) series
    * is grouped into ONE row and the whole chain runs as a narrow
    * higher-order fold: no UDF, no per-step shuffle, one exchange.
    * Keys are independent and distribute. (1−α) is computed IEEE, not
    * a second literal, so the chain replays bit-identically
    * cross-engine; presentation rounds to `roundTo`, the fold itself
    * is unrounded. `(keyCol, binCol)` must be unique per row (sorted
    * structs totalize on value otherwise). Null values are dropped
    * before the fold (a null would poison every later sᵢ).
    *
    * Output: `(keyCol, binCol, valueCol, ewma)`. */
  def ewma(df: DataFrame, keyCol: String, binCol: String, valueCol: String,
           alpha: Double, roundTo: Int = 6): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    Sampling.reserveColumns(df, Seq("ewma"), "ewma")
    val a = lit(alpha)
    val b = lit(1.0) - lit(alpha)
    val grouped = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(binCol).as("bin"),
        col(valueCol).cast("double").as("v")))).as("_s"))
    val folded = aggregate(
      slice(col("_s"), lit(2), greatest(size(col("_s")) - 1, lit(0))),
      array(element_at(col("_s"), 1).getField("v")),
      (acc, e) => concat(acc,
        array(a * e.getField("v") + b * element_at(acc, -1))))
    grouped
      .select(col(keyCol),
        posexplode(zip_with(col("_s"), folded,
          (s, f) => struct(s.getField("bin").as("bin"),
            s.getField("v").as("v"), f.as("e")))).as(Seq("_p", "_t")))
      .select(col(keyCol), col("_t.bin").as(binCol),
        col("_t.v").as(valueCol), round(col("_t.e"), roundTo).as("ewma"))
  }

  /** Holt linear (double-exponential) smoothing per key: level +
    * trend state with one-step-ahead forecasts and residuals — what
    * [[ewma]] cannot express on a trending series (a single-state
    * smoother lags a ramp forever; Holt's trend term absorbs it, and
    * the residual column is the forecast-error stream an alerting rule
    * thresholds).
    *
    * Standard init and recurrence, pinned: `l₁ = x₁`,
    * `b₁ = x₂ − x₁` (0 for a single-point series); for i ≥ 2
    * `lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁)` and
    * `bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁`. `forecast_i = lᵢ₋₁ + bᵢ₋₁`
    * (null at i = 1 — nothing to forecast from), residual =
    * value − forecast. Same narrow per-key fold shape as [[ewma]];
    * (1−α)/(1−β) computed IEEE; the fold runs unrounded and
    * presentation rounds to `roundTo`.
    *
    * Output: `(keyCol, binCol, valueCol, level, trend, forecast,
    * residual)`. */
  def holt(df: DataFrame, keyCol: String, binCol: String, valueCol: String,
           alpha: Double, beta: Double, roundTo: Int = 6): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1]: $beta")
    Sampling.reserveColumns(df,
      Seq("level", "trend", "forecast", "residual"), "holt")
    val a = lit(alpha); val a1 = lit(1.0) - lit(alpha)
    val b = lit(beta); val b1 = lit(1.0) - lit(beta)
    def f(c: Column, n: String): Column = c.getField(n)
    val grouped = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(binCol).as("bin"),
        col(valueCol).cast("double").as("v")))).as("_s"))
    val init = struct(
      element_at(col("_s"), 1).getField("v").as("l"),
      coalesce(try_element_at(col("_s"), lit(2)).getField("v") -
        element_at(col("_s"), 1).getField("v"), lit(0.0)).as("t"))
    val folded = aggregate(
      slice(col("_s"), lit(2), greatest(size(col("_s")) - 1, lit(0))),
      array(init),
      (acc, e) => {
        val prev = element_at(acc, -1)
        val lNew = a * f(e, "v") + a1 * (f(prev, "l") + f(prev, "t"))
        concat(acc, array(struct(lNew.as("l"),
          (b * (lNew - f(prev, "l")) + b1 * f(prev, "t")).as("t"))))
      })
    grouped
      // materialize the fold ONCE: HOFs are CodegenFallback and bypass
      // subexpression elimination, so the three references below would
      // otherwise re-run the whole per-key recurrence three times
      .select(col(keyCol), col("_s"), folded.as("_f"))
      .select(col(keyCol),
        posexplode(zip_with(col("_s"),
          zip_with(col("_f"), concat(array(lit(null)
              .cast("struct<l:double,t:double>")), slice(col("_f"), lit(1),
              greatest(size(col("_f")) - 1, lit(0)))),
            (cur, prev) => struct(cur.as("st"), prev.as("pv"))),
          (s, sp) => struct(f(s, "bin").as("bin"), f(s, "v").as("v"),
            f(f(sp, "st"), "l").as("l"), f(f(sp, "st"), "t").as("t"),
            (f(f(sp, "pv"), "l") + f(f(sp, "pv"), "t")).as("fc"))))
          .as(Seq("_p", "_t")))
      .select(col(keyCol), col("_t.bin").as(binCol),
        col("_t.v").as(valueCol),
        round(col("_t.l"), roundTo).as("level"),
        round(col("_t.t"), roundTo).as("trend"),
        round(col("_t.fc"), roundTo).as("forecast"),
        round(col("_t.v") - col("_t.fc"), roundTo).as("residual"))
  }

  /** Two-sided CUSUM change-point detection per key (Page 1954): in
    * bin order,
    * `s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (xᵢ − tᵢ − slack))` and
    * `s⁻ᵢ = max(0, s⁻ᵢ₋₁ + (tᵢ − xᵢ − slack))`, alarming when either
    * side exceeds `threshold` — the SEQUENTIAL drift detector that
    * complements the distributional family ([[Drift]]'s PSI/KS/JSD
    * compare populations; CUSUM localizes WHEN a monitored series
    * left its in-control level, and small persistent shifts
    * accumulate where per-bin z-scores stay under any threshold).
    *
    * `targetCol` is the in-control level per row — usually a per-key
    * constant joined upstream (historical mean); `slack` is the
    * half-dead-band k (shifts smaller than `slack` per bin never
    * accumulate). Same narrow per-key fold shape as [[ewma]]; the
    * recurrence is adds and max(0, ·) only, folded in bin order —
    * deterministic cross-engine with no rounding caveat before the
    * presentation round.
    *
    * Output: `(keyCol, binCol, valueCol, cusum_hi, cusum_lo, alarm)`. */
  def cusum(df: DataFrame, keyCol: String, binCol: String, valueCol: String,
            targetCol: String, slack: Double, threshold: Double,
            roundTo: Int = 6): DataFrame = {
    require(slack >= 0.0, s"slack must be >= 0: $slack")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    Sampling.reserveColumns(df, Seq("cusum_hi", "cusum_lo", "alarm"),
      "cusum")
    val grouped = df.filter(col(valueCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(binCol).as("bin"),
        col(valueCol).cast("double").as("v"),
        col(targetCol).cast("double").as("t")))).as("_s"))
    def f(c: Column, name: String): Column = c.getField(name)
    val folded = aggregate(
      col("_s"),
      // correctly-typed empty accumulator (mmrSelect's filter-all trick)
      filter(transform(col("_s"), _ =>
        struct(lit(0.0).as("sp"), lit(0.0).as("sn"))), _ => lit(false)),
      (acc, e) => {
        // try_element_at: the first step reads an EMPTY accumulator
        // (ANSI element_at throws on it), null-coalesced to the 0 init
        val pp = coalesce(f(try_element_at(acc, lit(-1)), "sp"), lit(0.0))
        val pn = coalesce(f(try_element_at(acc, lit(-1)), "sn"), lit(0.0))
        concat(acc, array(struct(
          greatest(lit(0.0), pp + (f(e, "v") - f(e, "t") - lit(slack)))
            .as("sp"),
          greatest(lit(0.0), pn + (f(e, "t") - f(e, "v") - lit(slack)))
            .as("sn"))))
      })
    grouped
      .select(col(keyCol),
        posexplode(zip_with(col("_s"), folded,
          (s, c) => struct(f(s, "bin").as("bin"), f(s, "v").as("v"),
            f(c, "sp").as("sp"), f(c, "sn").as("sn")))).as(Seq("_p", "_t")))
      .select(col(keyCol), col("_t.bin").as(binCol),
        col("_t.v").as(valueCol),
        round(col("_t.sp"), roundTo).as("cusum_hi"),
        round(col("_t.sn"), roundTo).as("cusum_lo"),
        (col("_t.sp") > threshold || col("_t.sn") > threshold).as("alarm"))
  }
}
