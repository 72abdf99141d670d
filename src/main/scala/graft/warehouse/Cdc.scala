package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a change log (op ∈ I/U/D with full
  * row images) into a snapshot — MERGE INTO semantics without a table
  * format. The winner per key is the LATEST of snapshot ∪ changes by
  * the version columns; a winning delete removes the key entirely.
  * Inserts under new keys, updates and deletes under existing ones all
  * fall out of the same rule — no per-op branching.
  *
  * Scale: ONE groupBy-key aggregate over snapshot ∪ changes (map-side
  * `max_by` partials — [[Star.latestPerKey]]'s shuffle shape), no
  * window, no sort. This is the ReplacingMergeTree collapse extended
  * with a delete verdict; at 100 TB the change log is typically ≪ the
  * snapshot and AQE handles the union's skew like any keyed aggregate.
  *
  * Precondition (same as the upsert family): `(keyCols, versionCols)`
  * is unique across snapshot ∪ changes — a version tie between a
  * change and the snapshot row (or two changes) would make the winner
  * shuffle-arrival-dependent. Give deletes their own version tier if
  * they must beat same-batch updates.
  */
object Cdc {

  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], versionCols: Seq[String],
                   opCol: String = "op"): DataFrame = {
    require(changes.columns.contains(opCol),
      s"changes must carry the op column '$opCol'")
    require(!snapshot.columns.contains(opCol),
      s"snapshot must not carry '$opCol' (it is derived as 'I')")
    val snapCols = snapshot.columns.toSet
    val chCols = changes.columns.filterNot(_ == opCol).toSet
    require(snapCols == chCols,
      s"schema mismatch: snapshot-only ${(snapCols -- chCols).mkString(",")} " +
        s"changes-only ${(chCols -- snapCols).mkString(",")}")
    val unioned = snapshot.withColumn(opCol, lit("I"))
      .unionByName(changes)
    Star.latestPerKey(unioned, keyCols, versionCols)
      .filter(col(opCol) =!= "D")
      .drop(opCol)
  }
}
