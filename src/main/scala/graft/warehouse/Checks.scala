package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking — the admission gate a 100 TB
  * warehouse runs before (or while) publishing a table. The reference
  * pipeline validates row shape at ingest (required fields, sport
  * filter — `spark/jobs/validate_json.py`); this generalizes that idea
  * to declarative table-level expectations with a machine-readable
  * verdict report, the Deequ/dbt-test shape.
  *
  * Scale design — the whole point of the API split:
  *  - ROW-level constraints (null, range, set, arbitrary predicate) all
  *    fold into ONE conditional aggregate over ONE scan, map-side
  *    partial, no matter how many constraints — adding a check is free.
  *  - UNIQUENESS is a key-grouped count (one shuffle on the key — the
  *    minimum possible; at scale the key is usually the table's sort or
  *    bucket key, where AQE-coalesced partial aggregation makes this
  *    cheap).
  *  - REFERENTIAL integrity probes the dimension's key set with a
  *    broadcast anti-join (dims are the small side by construction;
  *    for a big "dim" use [[BloomJoin]] first and exact-check the
  *    survivors).
  * The report itself is a handful of rows — union of scalar aggregates,
  * never a wide result.
  */
object Checks {

  /** One declarative expectation. `name` keys the report row. */
  sealed trait Constraint { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(column: String) extends Constraint {
    val name = s"not_null:$column"
  }

  /** Non-null values of `col` must lie in [lo, hi] (inclusive). NULLs
    * are NOT violations here — pair with [[NotNull]] to forbid them
    * (standard SQL CHECK semantics: a NULL comparison is not FALSE). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"range:$column[$lo,$hi]"
  }

  /** Non-null values of `col` must be one of `values`. */
  final case class InSet(column: String, values: Seq[String])
      extends Constraint {
    val name = s"set:$column{${values.mkString(",")}}"
  }

  /** Arbitrary row predicate that must hold; rows where `holds` is
    * FALSE **or NULL** are violations (the caller wrote the predicate,
    * so an un-evaluable row is a failing row — unlike the typed checks
    * above there is no companion NotNull to catch it). */
  final case class Satisfies(label: String, holds: Column)
      extends Constraint {
    val name = s"satisfies:$label"
  }

  /** `cols` must be a unique key. Violations = number of rows living in
    * a key group of size > 1 (so a pair of duplicates counts 2 — the
    * number of rows you'd have to quarantine). NULL key components
    * group together, as in GROUP BY. */
  final case class Unique(columns: Seq[String]) extends Constraint {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Every non-null `column` value must exist in `dim[dimColumn]`
    * (foreign-key semantics: NULL fact keys are exempt). */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimColumn: String) extends Constraint {
    val name = s"ref:$column"
  }

  private def violationCond(df: DataFrame, c: Constraint): Column = c match {
    case NotNull(col0)      => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && !col(col0).cast("double").between(lo, hi)
    case InSet(col0, vs)    => col(col0).isNotNull && !col(col0).isInCollection(vs)
    case Satisfies(_, p)    => !coalesce(p, lit(false))
    case other => throw new IllegalArgumentException(
      s"${other.name} is not a row-level constraint")
  }

  /** Run `constraints` against `df`; returns the verdict report
    * `(check_name, violations, total, pass)`, one row per constraint,
    * ordered by check_name. `total` is the row count of `df` for every
    * constraint (including referential checks — the denominator is
    * always "rows inspected").
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "duplicate constraint names: " +
        constraints.map(_.name).diff(constraints.map(_.name).distinct).mkString(","))
    val rowLevel = constraints.filter {
      case _: Unique | _: RefIntegrity => false
      case _                           => true
    }
    // ONE scan for the total + every row-level constraint: a conditional
    // sum per check inside a single aggregate (map-side partial). The
    // aggregate output is 1 row; stack() melts it to report rows.
    val aggCols = count(lit(1)).cast("long").as("_total") +:
      rowLevel.zipWithIndex.map { case (c, i) =>
        sum(violationCond(df, c).cast("long")).cast("long").as(s"_v$i")
      }
    val oneRow = df.agg(aggCols.head, aggCols.tail: _*)
    // Melt the 1-row aggregate into report rows: explode an
    // array-of-structs literal (pure projection — stays in the same
    // stage, no second scan). sum() over zero rows is NULL → 0.
    val melted =
      if (rowLevel.isEmpty)
        oneRow.select(lit(null).cast("string").as("check_name"),
          lit(null).cast("long").as("violations"), col("_total").as("total"))
          .filter(lit(false))
      else {
        val pairs = rowLevel.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"),
            coalesce(col(s"_v$i"), lit(0L)).as("violations"))
        }
        oneRow
          .select(explode(array(pairs: _*)).as("kv"), col("_total").as("total"))
          .select(col("kv.check_name"), col("kv.violations"), col("total"))
      }

    val totals = oneRow.select(col("_total").as("total"))

    val keyed: Seq[DataFrame] = constraints.collect {
      case u @ Unique(cols0) =>
        // rows in oversized key groups; sum of group sizes > 1. NULL from
        // sum-over-empty means zero violations.
        val grouped = df.groupBy(cols0.map(col): _*).count()
          .filter(col("count") > 1)
          .agg(coalesce(sum(col("count")), lit(0L)).cast("long").as("violations"))
        grouped.crossJoin(broadcast(totals))
          .select(lit(u.name).as("check_name"), col("violations"), col("total"))
      case r @ RefIntegrity(col0, dim, dimCol) =>
        // FK probe: non-null keys with no dim partner. Distinct the dim
        // keys first (semantically required: dup dim keys are fine) and
        // broadcast — the fact side never shuffles.
        val dimKeys = dim.select(col(dimCol).as("_k")).filter(col("_k").isNotNull).distinct()
        val bad = df.filter(col(col0).isNotNull)
          .join(broadcast(dimKeys), col(col0) === col("_k"), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
        bad.crossJoin(broadcast(totals))
          .select(lit(r.name).as("check_name"), col("violations"), col("total"))
    }

    (melted +: keyed)
      .reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check_name")
  }

  /** Dataset-card column profile: for each named column, row count,
    * null count, exact distinct count and the null fraction — the
    * summary block every training-data manifest leads with. One
    * logical scan: the null counters are conditional sums in a single
    * aggregate and the exact distincts ride Spark's multi-distinct
    * Expand rewrite (for approximate-at-scale profiles, swap in the
    * [[graft.ext.Sketches]] KMV estimate per column). All outputs are
    * exact integers / integer ratios — engine-deterministic. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns given")
    val aggCols = count(lit(1)).cast("long").as("_n") +:
      cols.flatMap { c =>
        Seq(sum(col(c).isNull.cast("long")).cast("long").as(s"_null_$c"),
          countDistinct(col(c)).cast("long").as(s"_dist_$c"))
      }
    val oneRow = df.agg(aggCols.head, aggCols.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        coalesce(col(s"_null_$c"), lit(0L)).as("n_null"),
        col(s"_dist_$c").as("n_distinct"))
    }
    oneRow
      .select(explode(array(entries: _*)).as("kv"), col("_n").as("n"))
      .select(col("kv.column").as("column"), col("n"),
        col("kv.n_null").as("n_null"), col("kv.n_distinct").as("n_distinct"),
        (col("kv.n_null").cast("double") / col("n")).as("null_frac"))
  }
}
