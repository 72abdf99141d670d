package graft

import org.apache.spark.sql.DataFrame

/** Shared argument guards for operators that write fixed output columns. */
private[graft] object Guards {

  /** Fail fast if any reserved output column already exists on the input
    * — silent replacement via withColumn is the alternative, and that
    * has eaten user columns before. */
  def reserved(df: DataFrame, op: String, cols: Seq[String]): Unit =
    cols.foreach { c =>
      require(!df.columns.contains(c),
        s"$op writes column '$c'; input already has it — rename or drop")
    }

  /** Validate an optional inclusive day range (`yyyy-MM-dd` pair) —
    * fails loudly on an unparseable date or inverted pair (a silent
    * null cast would prune EVERY partition and serve an empty
    * report). STRICT zero-padded ISO by contract: `2024-1-5` is
    * rejected even though Spark's cast would take it — the guard
    * enforces the documented format rather than tracking every
    * leniency of the downstream parser. Shared by the ranged MV
    * serves (growth reports, KLL quantile reads). */
  def validDayRange(range: Option[(String, String)]): Unit =
    range.foreach { case (start, end) =>
      // strict ISO parse — java.sql.Date.valueOf would leniently
      // normalize a calendar-invalid day (2024-02-31 -> Mar 2) and
      // let it through to the very cast this guard exists to front-run
      val s = scala.util.Try(java.time.LocalDate.parse(start))
      val e = scala.util.Try(java.time.LocalDate.parse(end))
      require(s.isSuccess && e.isSuccess,
        s"range ('$start', '$end') must be valid 'yyyy-MM-dd' dates")
      require(!s.get.isAfter(e.get), s"range start $start after end $end")
    }
}
