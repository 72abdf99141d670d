package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builds from a change log.
  *
  * The reference's warehouse keeps dimensions current-state-only
  * (ReplacingMergeTree latest-row semantics — our A7-A9 family); the
  * natural extension a star-schema user asks for next is the versioned
  * dimension: every attribute change becomes a row with an effective
  * interval, so facts can join "as of" their event time (reference DDL:
  * the kickhouse warehouse ddl SQL dims — current-state; this adds the
  * history-preserving variant). The intervals are half-open
  * `[from, to)` with `to` null on the open current version.
  *
  * Scale shape: ONE hash exchange on the dimension key and one sort per
  * key group feed BOTH window passes (change detection, then interval
  * assignment over the collapsed rows) — the filter between them
  * preserves partitioning and ordering, so Catalyst plans no second
  * exchange or sort. No joins, no driver state; at 100 TB the dimension
  * change log shuffles once, exactly like any latest-per-key build.
  *
  * Point-in-time fact enrichment against the result is
  * [[graft.ext.Relational.asofJoin]] on `effective_from` (one more
  * shuffle, no interval explosion).
  */
object Scd {

  private val reserved = Seq("effective_from", "effective_to", "is_current")

  /** Build the Type-2 dimension history.
    *
    * @param log      change log (one row per observation of the entity)
    * @param keys     dimension natural-key columns
    * @param tsCol    observation time column (any orderable type)
    * @param tieCols  deterministic tie-break for equal timestamps —
    *                 required so re-runs produce identical histories
    * @param attrs    tracked attribute columns; consecutive observations
    *                 with unchanged attrs (null-safe compare) collapse
    *                 into the earlier version row
    * @return keys ++ attrs ++ (effective_from, effective_to, is_current):
    *         half-open intervals `[from, to)` per key, `to` null on the
    *         current version (exactly one per key)
    */
  def scd2(log: DataFrame, keys: Seq[String], tsCol: String,
           tieCols: Seq[String], attrs: Seq[String]): DataFrame = {
    graft.Guards.reserved(log, "scd2", reserved)
    val order: Seq[Column] = (tsCol +: tieCols).map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

    // Change detection: a version row starts at the first observation
    // and at every null-safe attribute change. lag(struct) is null only
    // on the first row (a struct over columns is never null itself), so
    // NOT(cur <=> lag) is true there too — no row_number needed.
    val attrStruct = struct(attrs.map(col): _*)
    val changed = not(attrStruct <=> lag(attrStruct, 1).over(w))

    val versions = log
      .withColumn("_scd_changed", changed)
      .filter(col("_scd_changed"))
      .drop("_scd_changed")

    // Interval assignment over the collapsed rows: the NEXT version's
    // start closes this one. Same partitioning + ordering as above, so
    // this window rides the existing exchange/sort.
    versions
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keys ++ attrs ++ reserved).distinct.map(col): _*)
  }

  /** Current-state view of an SCD2 history — equivalent to the
    * latest-per-key build on the raw log, useful as a consistency probe
    * and as the serving view. */
  def scd2Current(history: DataFrame): DataFrame =
    history.filter(col("is_current"))
}
