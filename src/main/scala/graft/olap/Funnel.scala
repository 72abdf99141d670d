package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel and cohort-retention analytics — the ClickHouse
  * `windowFunnel` / `retention` aggregate family re-expressed as
  * relational programs (cf. the reference family's event-funnel
  * dashboards; ClickHouse docs `windowFunnel`, `retention`).
  *
  * Both are exact-integer computations over event timestamps, so every
  * output is engine-deterministic without rounding tricks; both reduce
  * to per-user aggregates that combine map-side — no windows over the
  * raw event stream, no state proportional to history.
  */
object Funnel {

  /** Earliest-anchor greedy funnel: for each user, the number of
    * `steps` completed in order, where the chain anchors at the
    * user's EARLIEST step-1 event and each subsequent step is the
    * earliest event of its type that is strictly after the previous
    * step and within `windowSec` of the anchor.
    *
    * This is the deterministic, SQL-replicable member of the funnel
    * family: ClickHouse's `windowFunnel` scans all candidate anchors
    * (a longest-chain search), which can count one step more on
    * adversarial timelines; the earliest-anchor rule is what its docs
    * recommend reading it as, and makes the result a pure function of
    * the event set (spec + oracle checkable). Documented divergence.
    *
    * Scale shape: one grouped min-aggregate per step (k tiny
    * aggregates, each map-side combined, joined on user_id — the
    * step-k frame is |users| rows); the event table is scanned once
    * per step with the step's type filter pushed down.
    *
    * Returns `(user_id, t1, steps_completed)` for users with at least
    * step 1; `t1` is the anchor in epoch seconds. */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val base = events.select(col(userCol).as("user_id"),
      unix_timestamp(col(tsCol)).as("t"), col(typeCol).as("et"))
    var frame = base.filter(col("et") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
      .withColumn("prev_t", col("t1"))
      .withColumn("steps_completed", lit(1L))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val expect = i + 1 // only users who completed every prior step advance
      val nxt = base.filter(col("et") === step)
        .select(col("user_id"), col("t").as("t_step"))
      frame = frame
        .join(nxt, Seq("user_id"), "left")
        // null out non-qualifying candidates instead of filtering rows:
        // a user whose candidates ALL miss the window must survive with
        // steps_completed unchanged, and a user who failed an EARLIER
        // step must never advance on a later one
        .withColumn("t_ok",
          when(col("steps_completed") === expect &&
            col("t_step") > col("prev_t") &&
            col("t_step") <= col("t1") + windowSec, col("t_step")))
        .groupBy(col("user_id"), col("t1"), col("prev_t"), col("steps_completed"))
        .agg(min(col("t_ok")).as("t_next"))
        .withColumn("steps_completed",
          when(col("t_next").isNotNull, col("steps_completed") + 1)
            .otherwise(col("steps_completed")))
        .withColumn("prev_t", coalesce(col("t_next"), col("prev_t")))
        .drop("t_next")
    }
    frame.select(col("user_id"), col("t1"), col("steps_completed"))
  }

  /** Cohort retention: users grouped by the period of their FIRST
    * event (`periodSec`-wide buckets on the epoch axis), then for each
    * offset 0..maxOffset the count of cohort members active in
    * cohort_period + offset. Counts and the retained percentage are
    * integer-exact ratios.
    *
    * Returns `(cohort, offset, n_active, cohort_size, pct)` with
    * `cohort` the epoch-second start of the cohort period. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodSec: Long, maxOffset: Int): DataFrame = {
    require(periodSec > 0 && maxOffset >= 0)
    // floor division, NOT truncate-toward-zero: Spark's `/` on longs is
    // double division and a bare cast truncates, which buckets negative
    // (pre-1970) epochs one period too late vs the floor-div (`//`)
    // semantics the SQL oracle uses. floor() makes both engines agree
    // on the whole epoch axis.
    val base = events.select(col(userCol).as("user_id"),
      floor(unix_timestamp(col(tsCol)).cast("long") / periodSec).cast("long")
        .as("period"))
    val firsts = base.groupBy(col("user_id")).agg(min(col("period")).as("cohort_p"))
    val sizes = firsts.groupBy(col("cohort_p"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = base.distinct()
      .join(firsts, "user_id")
      .withColumn("offset", (col("period") - col("cohort_p")).cast("int"))
      .filter(col("offset") >= 0 && col("offset") <= maxOffset)
      .groupBy(col("cohort_p"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, "cohort_p")
      .select(
        (col("cohort_p") * periodSec).as("cohort"),
        col("offset").cast("bigint").as("offset"),
        col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size") * 100, 4)
          .as("pct"))
  }
}
