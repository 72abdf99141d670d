package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-first relational extensions the reference's OLAP surface stops
  * short of: as-of joins, range (interval) joins, and gap-based
  * sessionization. None of these are expressible as a plain equi-join
  * without either a window trick or a bucketing scheme — the naive
  * formulations Spark would pick for the literal SQL (a theta-join →
  * BroadcastNestedLoopJoin, or a per-row subquery) are O(n·m) and die at
  * cluster scale. Each operator here is built so the physical plan is
  * one hash-partitioned shuffle + sort, never a nested loop:
  *
  *  - [[asofJoin]]: union-then-window. Tag both sides, union, sort each
  *    key group by (time, side), and carry the latest right-side payload
  *    forward with a running `last(_, ignoreNulls)` frame. One shuffle
  *    on the key, one sort, zero join nodes — the classic
  *    point-in-time-correct join used for feature lookups ("the latest
  *    profile snapshot as of this interaction") without copying the
  *    right side per left row.
  *  - [[rangeJoin]]: bin bucketing. Intervals explode to the fixed-width
  *    time bins they cover, points map to exactly one bin, and the match
  *    becomes an equi-join on (key, bin) + a residual filter. Spark
  *    plans a SortMergeJoin/shuffled-hash join; work is proportional to
  *    (pairs that share a bin), not |points|×|intervals|. `binSeconds`
  *    should be on the order of the typical interval length: each
  *    interval then lands in O(1) bins.
  *  - [[sessionize]]: the standard lag/cumsum reformulation. A session
  *    boundary is "gap from the previous event exceeds `gapSeconds`";
  *    the session ordinal is the running sum of boundary flags. One
  *    window, one shuffle; every key sessionizes independently, so 100
  *    TB of events sessionize at full cluster width.
  *
  * All time arithmetic is over an integer-seconds column supplied by the
  * caller (e.g. `unix_timestamp(ts)`): integer comparisons are exact and
  * engine-portable, where raw nanosecond timestamps are not (Spark
  * floors parquet NANOS to microseconds on read — see
  * [[graft.Tables]] — so sub-microsecond boundary comparisons would
  * diverge from an engine that keeps full precision).
  */
object Relational {

  private def reserve(df: DataFrame, cols: Seq[String], op: String): Unit =
    Sampling.reserveColumns(df, cols, op)

  /** Fail fast when both join sides carry the same non-key column — the
    * output schema would be ambiguous for every downstream reference. */
  private def requireNoClash(a: DataFrame, b: DataFrame, keys: Seq[String],
                             op: String): Unit = {
    val clash = a.columns.toSet.intersect(b.columns.toSet) -- keys
    require(clash.isEmpty,
      s"$op: both sides carry non-key column(s) ${clash.mkString(", ")} — " +
        "rename one side or the output schema would be ambiguous")
  }

  /** Explode an interval frame to its covered `binSeconds` bins.
    * Empty/inverted intervals (end <= start) match nothing by definition
    * — drop them BEFORE sequence(), which would otherwise happily
    * generate a huge DESCENDING bin array for a corrupt row (sequence's
    * default step is -1 when start > stop). [start, end): the last
    * covered bin is the one holding end-1. */
  private def binExplode(df: DataFrame, startCol: String, endCol: String,
                         binSeconds: Long): DataFrame =
    df.filter(col(endCol) > col(startCol))
      .withColumn("_graft_bin",
        explode(sequence(
          floor(col(startCol) / binSeconds),
          floor((col(endCol) - 1) / binSeconds))))

  /** As-of join: for every left row, attach the single closest right
    * row on-or-before it — `rightTime <= leftTime` within the same key
    * group (inclusive; nulls when no right row precedes the left row).
    * With `forward = true` the direction flips: the closest right row
    * on-or-after (`rightTime >= leftTime`) — next-event attribution
    * instead of point-in-time lookup.
    *
    * Right-side payload columns come back prefixed with `prefix`. Ties
    * on `rightTime` within a key resolve deterministically to the
    * lexicographically greatest payload struct; pre-aggregate the right
    * side to one row per (key, time) when a specific tie rule is needed.
    *
    * Physical plan: union of the two tagged sides → one shuffle on
    * `keys` → one sort by (time, side, payload) → running
    * `last(ignoreNulls)` window (Spark's incremental UnboundedPreceding
    * frame, O(rows); the forward variant just sorts time descending).
    * No join node at all, so there is no pair explosion to mitigate and
    * per-key skew degrades linearly.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String], prefix: String = "asof_",
               forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val scratch = Seq("_graft_t", "_graft_side", "_graft_rv")
    reserve(left, scratch ++ rightCols.map(prefix + _), "asofJoin")
    reserve(right, scratch, "asofJoin")

    val rv = struct(rightCols.map(col): _*)
    // Right rows sort BEFORE left rows at the same time value — that is
    // what makes the join inclusive (rightTime == leftTime matches).
    // A null rightTime satisfies neither direction's predicate — drop
    // those rows (default null ordering would otherwise make them match
    // EVERYTHING backward and NOTHING forward).
    val taggedRight = right
      .filter(col(rightTime).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTime).as("_graft_t"), lit(0).as("_graft_side"),
          rv.as("_graft_rv")): _*)
    val taggedLeft = left
      .withColumn("_graft_t", col(leftTime))
      .withColumn("_graft_side", lit(1))
      .withColumn("_graft_rv", lit(null).cast(taggedRight.schema("_graft_rv").dataType))

    // nulls_first in BOTH directions: a null leftTime row sorts before
    // every right row, so its frame holds no payload → null match
    val tOrder =
      if (forward) col("_graft_t").desc_nulls_first
      else col("_graft_t").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrder, col("_graft_side"), col("_graft_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("_graft_rv", last(col("_graft_rv"), ignoreNulls = true).over(w))
      .filter(col("_graft_side") === 1)

    val out = rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(prefix + c, col("_graft_rv").getField(c))
    }
    out.drop(scratch: _*)
  }

  /** Range (interval) join: match every point row to every interval row
    * of the same key with `startCol <= pointTime < endCol`. Returns the
    * matched pairs (all point columns + all interval columns; callers
    * aggregate downstream).
    *
    * Both sides map onto fixed `binSeconds`-wide time bins — the
    * interval to every bin it overlaps (via `sequence`), the point to
    * exactly one — turning the inequality predicate into an equi-join
    * on (keys, bin) with a residual range filter. Because a point lives
    * in exactly one bin, no pair can match twice and no distinct pass
    * is needed. Intervals longer than ~a few bins multiply their
    * replication factor: pick `binSeconds` near the typical interval
    * length (replication = len/binSeconds + 1).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTime: String, startCol: String, endCol: String,
                binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    reserve(points, Seq("_graft_bin"), "rangeJoin")
    reserve(intervals, Seq("_graft_bin"), "rangeJoin")
    requireNoClash(points, intervals, keys, "rangeJoin")

    val binned = binExplode(intervals, startCol, endCol, binSeconds)
    val pointed = points.withColumn("_graft_bin",
      floor(col(pointTime) / binSeconds))

    val joinCond = (keys.map(k => pointed(k) === binned(k)) :+
      (pointed("_graft_bin") === binned("_graft_bin")) :+
      (pointed(pointTime) >= binned(startCol)) :+
      (pointed(pointTime) < binned(endCol))).reduce(_ && _)
    val joined = pointed.join(binned, joinCond)
      .drop(pointed("_graft_bin")).drop(binned("_graft_bin"))
    // joining on the key columns from both sides keeps both copies;
    // drop the interval side's duplicates
    keys.foldLeft(joined)((df, k) => df.drop(binned(k)))
  }

  /** Interval-overlap join: match every pair of intervals (one from
    * each side, same key) that overlap under half-open semantics —
    * `aStart < bEnd && bStart < aEnd`. The alignment primitive for
    * multimodal pipelines (audio segments × transcript spans, video
    * shots × caption windows).
    *
    * Both sides explode to their covered `binSeconds` bins and meet in
    * an equi-join on (keys, bin). An overlapping pair shares every bin
    * in the overlap region — so the join would emit it once per shared
    * bin. Rather than a distinct pass (a full extra shuffle), the
    * residual filter keeps each pair ONLY in the bin containing
    * `greatest(aStart, bStart)`: that instant lies inside both
    * intervals, so exactly one copy survives, by construction.
    * Replication economics are the same as [[rangeJoin]]: pick
    * `binSeconds` near the typical interval length. Empty/inverted
    * intervals drop on both sides.
    */
  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    reserve(a, Seq("_graft_bin"), "overlapJoin")
    reserve(b, Seq("_graft_bin"), "overlapJoin")
    requireNoClash(a, b, keys, "overlapJoin")

    val ab = binExplode(a, aStart, aEnd, binSeconds)
    val bb = binExplode(b, bStart, bEnd, binSeconds)
    val cond = (keys.map(k => ab(k) === bb(k)) :+
      (ab("_graft_bin") === bb("_graft_bin")) :+
      (ab(aStart) < bb(bEnd)) :+ (bb(bStart) < ab(aEnd)) :+
      // count-once: only the bin holding the overlap's first instant
      (ab("_graft_bin") === floor(greatest(ab(aStart), bb(bStart)) / binSeconds)))
      .reduce(_ && _)
    val joined = ab.join(bb, cond)
      .drop(ab("_graft_bin")).drop(bb("_graft_bin"))
    keys.foldLeft(joined)((df, k) => df.drop(bb(k)))
  }

  /** Gap-based sessionization: assign each row a per-key session
    * ordinal (`session_id`, 1-based in time order) where a new session
    * starts whenever the gap from the previous row exceeds
    * `gapSeconds`. `tieCol` makes the within-key order total (and the
    * assignment deterministic) when two rows share a time value.
    */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    reserve(df, Seq("session_id"), "sessionize")
    val order = Seq(col(timeCol), col(tieCol))
    val wLag = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(timeCol), 1).over(wLag)
    val isBoundary = prev.isNull || (col(timeCol) - prev > gapSeconds)
    df.withColumn("session_id",
      sum(when(isBoundary, 1L).otherwise(0L)).over(wRun))
  }

  /** Session-level rollup of [[sessionize]]: one row per (keys,
    * session_id) with start/end times and the event count. Both windows
    * in [[sessionize]] and this aggregation share the same partitioning
    * (`keys`), so the whole chain is a single shuffle.
    */
  def sessionStats(df: DataFrame, keys: Seq[String], timeCol: String,
                   tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, keys, timeCol, tieCol, gapSeconds)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
