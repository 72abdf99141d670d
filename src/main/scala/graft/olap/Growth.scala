package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Growth accounting over an event log: rolling active-user counts
  * (DAU/WAU/MAU + stickiness) and the new-vs-returning split — the
  * top-of-dashboard metrics every product warehouse serves daily.
  */
object Growth {

  /** Rolling distinct-active-user counts per day for each window in
    * `windows` (days), plus stickiness = shortest/longest window ratio
    * (DAU/MAU under the 1/28 default).
    *
    * EXACT counts by design (this is the oracled report; the 100 TB
    * sketch paths are EXECUTED siblings — [[activeUsersFromKmvMv]]
    * (bounded, oracled) and [[activeUsersFromHllMv]] (constant-size
    * state) serve the same report from maintained per-day sketch MVs
    * when approximate is acceptable). Scale shape: the log dedups to (user, day) FIRST —
    * the only corpus-sized pass; each deduped row then expands to the
    * ≤ `max(windows)` report days it covers (a bounded ×W blowup of
    * the already-deduped frame, the standard exact-sliding-distinct
    * trade), and one (day, window) aggregate counts distinct users.
    * Days with no activity in a window simply have no row
    * contributing; the report contains every day observed in the log,
    * zero-filling windows via the left join from the day spine.
    *
    * Output: `(day, au_<w> for each w, stickiness)` — stickiness only
    * when ≥ 2 windows, `au_min/au_max` as one exact integer ratio. */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windows: Seq[Int] = Seq(1, 7, 28)): DataFrame = {
    val userDay = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(tsCol).cast("date").as("_d"))
      .distinct()
    activeUsersFromUserDay(userDay, "_u", "_d", windows)
  }

  /** [[activeUsers]] from an ALREADY-REDUCED (user, day) activity
    * frame — the serving entry point for an incrementally-maintained
    * distinct-set MV (see [[activeUsersFromMv]]), split out so the
    * report math is one code path whether the frame comes from a full
    * event-log dedup or from exploding day-partitioned MV states.
    * Duplicate (user, day) rows are tolerated (every counting step is
    * count_distinct) — they only inflate the expansion cost, so feed
    * the deduped frame when you have one. Null users/days drop (the
    * [[activeUsers]] contract — without the filter a null day would
    * mint a null spine row and null users would silently vanish only
    * from the counts). */
  def activeUsersFromUserDay(frame: DataFrame, userCol: String,
                             dayCol: String,
                             windows: Seq[Int] = Seq(1, 7, 28)): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      "windows must be non-empty positive day counts")
    require(windows.distinct.size == windows.size, "duplicate windows")
    val userDay = frame
      .select(col(userCol).as("_u"), col(dayCol).cast("date").as("_d"))
      // filter AFTER the cast: a malformed day string casts to null
      // and must drop the same way a null input does
      .filter(col("_u").isNotNull && col("_d").isNotNull)
    val spine = userDay.select(col("_d").as("day")).distinct()
    // ONE coverage expansion + ONE distinct pass serves EVERY window
    // (the former shape expanded and aggregated once per window — three
    // exchanges of the blown-up frame plus three report joins for the
    // same counts): each (user, activity day) covers report days
    // _d .. _d + max(w) − 1 with its lag in `_pos`; per (report day,
    // user) the MINIMUM lag decides which windows count that user
    // (user active within w days of `day` ⟺ min lag < w), so one
    // conditional-sum aggregate yields all au_w columns at once.
    val covered = expandCoverage(userDay, "_u", windows.max, spine)
    val perUser = covered.groupBy(col("day"), col("_u"))
      .agg(min(col("_pos")).as("_mo"))
    val aggs = windows.map(w =>
      sum(when(col("_mo") < w, 1L).otherwise(0L)).as(s"au_$w"))
    val report = perUser.groupBy(col("day")).agg(aggs.head, aggs.tail: _*)
    assembleActiveReport(spine, Seq(report), windows, lit(0L))
  }

  /** Expand a `(_d, payload)` frame so each row covers report days
    * `_d .. _d+w-1` carrying its lag as `_pos` (0 = the activity day
    * itself); the spine join keeps only days that exist in the log —
    * the shared coverage step of the activeUsers family. */
  private def expandCoverage(df: DataFrame, payload: String, w: Int,
                             spine: DataFrame): DataFrame =
    if (w == 1) df.select(col("_d").as("day"), lit(0).as("_pos"), col(payload))
    else df
      .select(posexplode(sequence(col("_d"), date_add(col("_d"), w - 1)))
        .as(Seq("_pos", "day")), col(payload))
      .join(spine, "day")

  /** Shared report-assembly tail of the activeUsers family: left-join
    * the per-window day counts onto the spine, zero-fill with the
    * serving type's zero, append stickiness (shortest/longest window
    * ratio) when >= 2 windows. ONE copy so the exact and sketch-served
    * reports cannot drift. */
  private def assembleActiveReport(spine: DataFrame,
                                   perWindow: Seq[DataFrame],
                                   windows: Seq[Int],
                                   zero: Column): DataFrame = {
    val joined = perWindow.foldLeft(spine)((acc, f) =>
      acc.join(f, Seq("day"), "left"))
      .select(col("day") +: windows.map(w =>
        coalesce(col(s"au_$w"), zero).as(s"au_$w")): _*)
    if (windows.size < 2) joined.orderBy(col("day"))
    else joined.withColumn("stickiness",
        round(col(s"au_${windows.min}").cast("double") /
          col(s"au_${windows.max}"), 6))
      .orderBy(col("day"))
  }

  /** Validate an optional inclusive report-day range (`yyyy-MM-dd`
    * pair) — fails loudly on an unparseable date or inverted pair (a
    * silent null cast would prune EVERY partition and serve an empty
    * report). */
  private def requireRange(range: Option[(String, String)]): Unit =
    graft.Guards.validDayRange(range)

  /** Prune an MV read to the SOURCE days a ranged report needs: a
    * report day d's window-w count covers days d−w+1 .. d, so the read
    * needs `range.start − max(windows) + 1` through `range.end`. The
    * MV is day-partitioned parquet, so this filter is a partition
    * prune (PlanSpec gates the PartitionFilters), never a full-MV scan
    * — the reference's toYYYYMM partition-prune story (DDL:144)
    * applied to our own MV. */
  private def pruneSourceDays(mv: DataFrame, range: Option[(String, String)],
                              maxW: Int): DataFrame =
    range.fold(mv) { case (start, end) =>
      mv.filter(col("day") >= date_sub(lit(start).cast("date"), maxW - 1) &&
        col("day") <= lit(end).cast("date"))
    }

  /** Clip a served report to the requested day range: the pruned scan
    * keeps `max(windows) − 1` coverage days BEFORE the range start
    * (their own windows would be incomplete) — they feed the in-range
    * counts and then drop here. */
  private def clipReport(report: DataFrame,
                         range: Option[(String, String)]): DataFrame =
    range.fold(report) { case (start, end) =>
      report.filter(col("day") >= lit(start).cast("date") &&
        col("day") <= lit(end).cast("date"))
    }

  /** [[activeUsers]] served from an incrementally-maintained
    * distinct-set MV (`IncrementalMv` + `MvAgg.distinctSet`): the MV
    * holds one exact active-user SET per (day, key); this read
    * explodes the day-partitioned sets into the (user, day) frame and
    * runs the one shared report path — so the streaming loop updates
    * O(delta) per micro-batch (only touched days' sets merge) while
    * every serve is day-count-sized work, never an event-history
    * rescan. Multiple MV keys union naturally (count_distinct dedups
    * a user active under several keys the same day).
    *
    * `range` (inclusive `yyyy-MM-dd` pair) restricts the report to a
    * trailing slice — the dashboard shape — and partition-PRUNES the
    * MV scan to the `range.start − max(windows) + 1 .. range.end`
    * source days it needs (see [[pruneSourceDays]]); the ranged serve
    * equals the full serve's slice (spec-pinned). */
  def activeUsersFromMv(spark: org.apache.spark.sql.SparkSession,
                        mvPath: String,
                        windows: Seq[Int] = Seq(1, 7, 28),
                        range: Option[(String, String)] = None): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      "windows must be non-empty positive day counts")
    requireRange(range)
    val mv = pruneSourceDays(graft.stream.IncrementalMv.readAgg(spark,
      mvPath, graft.stream.MvAgg.distinctSet), range, windows.max)
    val ud = mv.select(explode(col("value")).as("_u"), col("day").as("_d"))
    clipReport(activeUsersFromUserDay(ud, "_u", "_d", windows), range)
  }

  /** [[activeUsers]] served from a KMV-SKETCH MV
    * (`MvAgg.kmvDistinct(k)`) — the 1e9-daily-actives regime's answer
    * to [[activeUsersFromMv]]'s exact distinct-set state: the MV holds
    * one ≤ k-long bottom-k hash sketch per (day, key) instead of the
    * true user set, so state is BOUNDED regardless of cardinality.
    * The serve never explodes users at all: per report day it folds
    * the covering days' sketches (bottom-k of a union of bottom-k's IS
    * bottom-k of the union — the exact KMV merge law) and estimates,
    * so a window count costs `w × k` longs, not `w × DAU` users.
    *
    * Accuracy contract: BELOW saturation (window-union distinct < k)
    * the merged sketch IS the distinct hash set and every `au_w` is
    * the exact count — an MV in that regime serves value-identical to
    * [[activeUsers]] (modulo the DOUBLE column type estimates carry).
    * Saturated sketches estimate with rsd ≈ 1/√(k−2)
    * [Beyer et al. SIGMOD'07]; stickiness is the estimate ratio.
    *
    * Output matches [[activeUsers]]: `(day, au_<w>..., stickiness)`,
    * `au_*` as DOUBLE (estimates). `range` as in
    * [[activeUsersFromMv]]: a partition-pruned trailing slice. */
  def activeUsersFromKmvMv(spark: org.apache.spark.sql.SparkSession,
                           mvPath: String, k: Int,
                           windows: Seq[Int] = Seq(1, 7, 28),
                           range: Option[(String, String)] = None): DataFrame = {
    activeUsersFromSketchMv(spark, mvPath,
      graft.stream.MvAgg.kmvDistinct(k).merge,
      s => graft.ext.Sketches.kmvEstimateCol(s, k),
      lit(0.0), windows, range)
  }

  /** [[activeUsersFromKmvMv]] for an HLL-sketch MV
    * (`MvAgg.hllDistinct(lgK)` — DataSketches HLL, the densest state:
    * constant ~2^lgK bytes per (day, key) once promoted). Serving
    * folds day sketches with the DataSketches union (slot-wise
    * register max — a set-function of the inputs, so the served value
    * is batch-order independent). `au_*` are LONG estimates: exact
    * below the coupon-promotion threshold, rsd ≈ 1.04/√(2^lgK) above —
    * spec-gated (the register layout is engine-internal, so unlike the
    * KMV serve there is no cross-engine oracle). */
  def activeUsersFromHllMv(spark: org.apache.spark.sql.SparkSession,
                           mvPath: String,
                           windows: Seq[Int] = Seq(1, 7, 28),
                           range: Option[(String, String)] = None): DataFrame =
    activeUsersFromSketchMv(spark, mvPath,
      s => hll_union_agg(s, allowDifferentLgConfigK = false),
      s => hll_sketch_estimate(s),
      lit(0L), windows, range)

  /** The one sketch-serving path: pre-merge each day's key sketches
    * (a user active under several MV keys the same day dedups inside
    * the sketch), expand day coverage per window, merge again, and
    * estimate — `merge` must be the state's aggregate union Column,
    * `estimate` its scalar read. Shares [[expandCoverage]] and
    * [[assembleActiveReport]] with the exact serve so no report path
    * can drift. */
  private def activeUsersFromSketchMv(spark: org.apache.spark.sql.SparkSession,
                                      mvPath: String,
                                      merge: Column => Column,
                                      estimate: Column => Column,
                                      zero: Column,
                                      windows: Seq[Int],
                                      range: Option[(String, String)] = None)
      : DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      "windows must be non-empty positive day counts")
    require(windows.distinct.size == windows.size, "duplicate windows")
    requireRange(range)
    val perDay = pruneSourceDays(spark.read.parquet(mvPath), range,
        windows.max)
      .groupBy(col("day").cast("date").as("_d"))
      .agg(merge(col("state")).as("_st"))
    val spine = perDay.select(col("_d").as("day"))
    // one coverage expansion serves every window (the exact serve's
    // one-pass shape): per report day, window w merges exactly the
    // sketches with lag < w — `when` nulls the rest and aggregate
    // functions skip nulls, so each merged multiset is identical to
    // the former per-window expansion's
    val covered = expandCoverage(perDay, "_st", windows.max, spine)
    val aggs = windows.map(w =>
      estimate(merge(when(col("_pos") < w, col("_st")))).as(s"au_$w"))
    val report = covered.groupBy(col("day")).agg(aggs.head, aggs.tail: _*)
    clipReport(assembleActiveReport(spine, Seq(report), windows, zero), range)
  }

  /** Temporally leakage-safe training frame for an activity-prediction
    * model (churn/retention): per user, behavioural features computed
    * STRICTLY BEFORE a cutoff timestamp and a binary label from the
    * `(cutoff, cutoff + horizonDays]` outcome window — the
    * observation/outcome split whose violation (features peeking past
    * the cutoff) is the classic silent ML bug this operator makes
    * structurally impossible: the two windows come from disjoint
    * filters on the same scan, never from a joined future row.
    *
    * Features: one count column per entry in `eventTypes` (events of
    * other types count only toward `n_total`), total event count, and
    * `days_silent` (full days between the user's last pre-cutoff event
    * and the cutoff — the strongest churn predictor). Users with no
    * pre-cutoff activity are excluded (no observation → no row);
    * users with no outcome-window activity label 0.
    *
    * Everything is exact integer counts plus one datediff; two
    * filtered aggregates and one left join, nothing wider than the
    * event log shuffles. Output:
    * `(userCol, n_<type>..., n_total, days_silent, label)`. */
  def trainingFrame(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, cutoff: String,
                    horizonDays: Int, eventTypes: Seq[String]): DataFrame = {
    require(horizonDays >= 1, s"horizonDays must be >= 1: $horizonDays")
    require(eventTypes.nonEmpty, "eventTypes must be non-empty")
    require(eventTypes.distinct.size == eventTypes.size,
      "duplicate eventTypes would mint duplicate feature columns")
    require(!eventTypes.contains("total"),
      "eventType 'total' collides with the built-in n_total column")
    // fail loudly on an unparseable cutoff: a silent NULL cast would
    // filter EVERY row and return an empty training set
    require(scala.util.Try(java.sql.Timestamp.valueOf(cutoff)).isSuccess,
      s"cutoff '$cutoff' is not a 'yyyy-MM-dd HH:mm:ss' timestamp")
    val cut = lit(cutoff).cast("timestamp")
    val ev = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val aggs = (count(lit(1)).as("n_total") +:
      eventTypes.map(t => sum(when(col(typeCol) === t, 1L)
        .otherwise(0L)).as(s"n_$t"))) :+ max(col(tsCol)).as("_last")
    val feats = ev.filter(col(tsCol) < cut)
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("days_silent",
        datediff(cut.cast("date"), col("_last").cast("date")).cast("long"))
      .drop("_last")
    // timestamp arithmetic, NOT date_add on the date-truncated cutoff:
    // truncation would shrink the documented (cutoff, cutoff+horizon]
    // window for any non-midnight cutoff
    val outcome = ev
      .filter(col(tsCol) > cut &&
        col(tsCol) <= cut + expr(s"INTERVAL $horizonDays DAY"))
      .select(col(userCol)).distinct()
      .withColumn("label", lit(1L))
    feats.join(outcome, Seq(userCol), "left")
      .withColumn("label", coalesce(col("label"), lit(0L)))
  }

  /** Per-day split of active users into new (first-ever day) and
    * returning, plus the cumulative user base — the growth-accounting
    * companion to [[activeUsers]]. One (user, day) dedup, one per-user
    * min, one day aggregate, and a running sum over the day spine
    * (|days|-sized). All integer counts; the new-share is one divide.
    *
    * Output: `(day, active, new_users, returning, cumulative_users,
    * new_share)`. */
  def newVsReturning(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val userDay = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(tsCol).cast("date").as("day"))
      .distinct()
    val first = userDay.groupBy(col("_u")).agg(min(col("day")).as("_first"))
    val daily = userDay.join(first, "_u")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"),
        sum(when(col("day") === col("_first"), 1L).otherwise(0L))
          .as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select(col("day"), col("active"), col("new_users"),
        (col("active") - col("new_users")).as("returning"),
        sum(col("new_users")).over(w).as("cumulative_users"),
        round(col("new_users").cast("double") / col("active"), 6)
          .as("new_share"))
      .orderBy(col("day"))
  }
}
