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
    * report). Shared by the ranged MV serves (growth reports, KLL
    * quantile reads). */
  def validDayRange(range: Option[(String, String)]): Unit =
    range.foreach { case (start, end) =>
      val s = scala.util.Try(java.sql.Date.valueOf(start))
      val e = scala.util.Try(java.sql.Date.valueOf(end))
      require(s.isSuccess && e.isSuccess,
        s"range ('$start', '$end') must be 'yyyy-MM-dd' dates")
      require(!s.get.after(e.get), s"range start $start after end $end")
    }
}
