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
}
