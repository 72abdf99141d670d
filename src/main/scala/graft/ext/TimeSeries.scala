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

  /** Integer bin index of `ts` on a `stepSeconds` grid. Sub-second
    * precision cannot move the floor (the bin boundary is a whole
    * multiple of step), so truncating `unix_timestamp` matches an
    * engine that floors fractional epoch seconds. */
  def binIndex(ts: Column, stepSeconds: Long): Column = {
    require(stepSeconds > 0, s"step must be positive: $stepSeconds")
    floor(unix_timestamp(ts) / stepSeconds).cast("long")
  }

  /** Events-per-(key, bin) on the `stepSeconds` grid: `(key, bin, n)`.
    * Only OBSERVED bins appear — [[gapFillInterpolate]] /
    * [[gapFillForward]] complete the grid. `n` is DOUBLE so the filled
    * column keeps one type through the fill step. */
  def resampleCounts(df: DataFrame, keyCol: String, tsCol: String,
                     stepSeconds: Long): DataFrame = {
    Sampling.reserveColumns(df, Seq("bin", "n"), "resampleCounts")
    df.groupBy(col(keyCol), binIndex(col(tsCol), stepSeconds).as("bin"))
      .agg(count(lit(1)).cast("double").as("n"))
  }

  /** Complete each key's bin range `[min, max]` and fill holes.
    * `mode` = "interpolate" (linear between the flanking observed
    * bins) or "ffill" (carry the previous observed value forward).
    * Output adds `observed` (was the bin present in the input).
    *
    * Precondition: `valueCol` is non-null on input rows (true for
    * [[resampleCounts]] output) — the spine's endpoints are observed
    * bins, so every hole is interior and both flanks exist.
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
}
