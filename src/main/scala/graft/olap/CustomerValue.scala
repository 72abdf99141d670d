package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer-value analytics over a transaction log: RFM segmentation
  * and Pareto/ABC concentration — the two classic "who matters"
  * reports a warehouse serves to lifecycle-marketing and inventory
  * dashboards.
  */
object CustomerValue {

  /** Exact cents from a 2-decimal monetary double: `floor(x·100 + .5)`
    * (the house quantization — never `round()`, whose half-tie rule
    * differs across engines). Exact-integer money makes every sum
    * below partition-order independent. */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + lit(0.5)).cast("long")

  /** RFM segmentation: per customer, recency (days since their last
    * transaction, measured from the corpus' latest date), frequency
    * (transaction count) and monetary value (exact cents), each scored
    * 1..`buckets` against EXACT percentile cutpoints of the customer
    * population, then folded into a lifecycle segment.
    *
    * Scale design: scoring deliberately avoids the textbook
    * `ntile()` — a global equal-count tiling needs one total sort of
    * all customers. Instead ONE aggregate computes the
    * `buckets−1` exact percentile cutpoints per metric (integer
    * inputs interpolate bit-identically cross-engine, the x28
    * precedent), the single cutpoint row broadcasts back, and each
    * customer scores with a narrow array scan:
    * `1 + #{cut : value > cut}` for higher-is-better metrics and
    * `1 + #{cut : value < cut}` for recency. Boundary values (== a
    * cutpoint, common on integer metrics) deterministically take the
    * lower score; heavy ties lump into one score rather than being
    * split arbitrarily, which is the honest answer ntile fakes.
    *
    * Segments (hi = buckets−1, lo = 2): champion (r,f,m all ≥ hi),
    * loyal (f ≥ hi), big_spender (m ≥ hi), at_risk (r ≤ lo, f ≥ 3),
    * hibernating (r ≤ lo), else regular — first match wins.
    *
    * Output: `(custCol, recency_days, frequency, monetary_cents,
    * r_score, f_score, m_score, segment)`. */
  def rfm(tx: DataFrame, custCol: String, dateCol: String,
          amountCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 3, s"buckets must be >= 3: $buckets")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val perCust = tx
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .groupBy(col(custCol))
      .agg(max(col(dateCol).cast("date")).as("_last"),
        count(lit(1)).as("frequency"),
        sum(cents(col(amountCol))).as("monetary_cents"))
    val refd = perCust.agg(max(col("_last")).as("_ref"))
    val base = perCust.crossJoin(broadcast(refd))
      .withColumn("recency_days",
        datediff(col("_ref"), col("_last")).cast("long"))
    val cuts = base.agg(
      percentile(col("recency_days"), typedLit(qs)).as("_rc"),
      percentile(col("frequency"), typedLit(qs)).as("_fc"),
      percentile(col("monetary_cents"), typedLit(qs)).as("_mc"))
    def above(v: org.apache.spark.sql.Column, cut: String) =
      (lit(1) + size(filter(col(cut), q => v.cast("double") > q)))
        .cast("long")
    def below(v: org.apache.spark.sql.Column, cut: String) =
      (lit(1) + size(filter(col(cut), q => v.cast("double") < q)))
        .cast("long")
    val hi = buckets - 1
    val scored = base.crossJoin(broadcast(cuts))
      .withColumn("r_score", below(col("recency_days"), "_rc"))
      .withColumn("f_score", above(col("frequency"), "_fc"))
      .withColumn("m_score", above(col("monetary_cents"), "_mc"))
    scored.select(col(custCol), col("recency_days"), col("frequency"),
      col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= hi && col("f_score") >= hi &&
        col("m_score") >= hi, "champion")
        .when(col("f_score") >= hi, "loyal")
        .when(col("m_score") >= hi, "big_spender")
        .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
        .when(col("r_score") <= 2, "hibernating")
        .otherwise("regular").as("segment"))
  }

  /** Pareto / ABC analysis: rank keys by exact-cents contribution,
    * accumulate the revenue share, and class them A (the head up to
    * `aCut` of total), B (up to `bCut`), C (tail) — "which 20% of
    * customers carry 80% of revenue" as a table.
    *
    * The cumulative share needs ONE global order — but never a global
    * SORT PARTITION: the transaction log reduces to per-key cents
    * first (the |keys|-sized report frame), and the rank + running sum
    * over that frame decompose by AMOUNT-RANGE bucket, the
    * `Sampling.globalPositions` prefix-offset pattern adapted to a
    * value order and kept ENTIRELY IN-PLAN (no persist, no driver
    * collect — the per-key aggregate is computed once, its exchange
    * reused across every consumer, the sweepFromPerScore discipline):
    *
    *  1. `percentile_approx` picks ≤ `buckets−1` range boundaries over
    *     `amount_cents` as a one-row aggregate, broadcast back
    *     (boundary PLACEMENT only balances work — rank/cum_share are
    *     global properties, identical under any monotone bucketing);
    *  2. each key buckets with one narrow array-filter over the
    *     broadcast boundaries (equal amounts always co-bucket, so
    *     bucket order concatenates to exactly the global
    *     `(amount DESC, key)` order);
    *  3. per-bucket counts/cents sums (≤ `buckets` rows) fold into
    *     rank/cumulative offsets + the grand total on the bucket-sized
    *     frame itself, broadcast-joined back;
    *  4. the window runs PARTITIONED by bucket — each sort holds
    *     ~|keys|/buckets rows, never the key population on one
    *     partition.
    *
    * Heavy amount TIES are the one skew source (ties must co-bucket
    * for rank determinism); a single tied value spanning a quantile
    * boundary concentrates its bucket, which degrades toward the old
    * single-sort only in the degenerate all-keys-equal case.
    *
    * The decomposition trades a few hundred ms of fixed stage latency
    * (boundary + offset barriers) for never sorting the key population
    * on one partition — flat measured cost from 15k to 150k keys (10×
    * stress ratio 1.0). A caller with a KNOWN-SMALL key population can
    * pass `buckets = 1` to skip the machinery (one window partition —
    * the pre-decomposition shape, cheapest at dashboard scale).
    *
    * Cumulative and grand totals are exact integer sums; each share is
    * one divide; class boundaries compare the exact ratio against the
    * cut literals, so ties and boundaries are deterministic
    * cross-engine. A key lands in A while the RUNNING share is still
    * ≤ `aCut` (head-inclusive convention).
    *
    * Output: `(keyCol, amount_cents, rank, share, cum_share,
    * abc_class)`, shares rounded to 6. */
  def paretoAbc(tx: DataFrame, keyCol: String, amountCol: String,
                aCut: Double = 0.7, bCut: Double = 0.9,
                buckets: Int = 256): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1: $aCut, $bCut")
    require(buckets >= 1, s"buckets must be positive: $buckets")
    import org.apache.spark.sql.expressions.Window
    val perKey = tx
      .filter(col(keyCol).isNotNull && col(amountCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(cents(col(amountCol))).as("amount_cents"))
    val probes = (1 until buckets).map(_.toDouble / buckets)
    val bounds =
      if (probes.isEmpty)
        perKey.limit(1).select(array().cast("array<double>").as("_bs"))
      else perKey.agg(percentile_approx(col("amount_cents").cast("double"),
        lit(probes.toArray), lit(10000)).as("_bs"))
    // bucket = #{b : amount <= b} over the boundary array — a monotone
    // non-increasing function of amount (duplicate boundaries merely
    // leave empty buckets), so equal amounts always share a bucket and
    // bucket asc == amount desc.
    //
    // REUSE CONTRACT: `withB` (and the bounds broadcast inside it)
    // feeds both the offset branch and the final join, and
    // percentile_approx's GK merge is shuffle-fetch-order sensitive —
    // two INDEPENDENT evaluations could return different boundary
    // arrays and make the final join's bucket ids miss `offs` rows
    // (silently dropping keys). Spark's exchange/broadcast reuse
    // collapses the identical subtrees to one evaluation; the
    // CustomerValueSpec plan gate pins a ReusedExchange in the
    // executed plan and a rank-contiguity invariant backstops it.
    val withB = perKey.crossJoin(broadcast(bounds))
      .withColumn("_graft_pb",
        size(filter(col("_bs"), b => col("amount_cents").cast("double") <= b)))
      .drop("_bs")
    val perBucket = withB.groupBy(col("_graft_pb"))
      .agg(count(lit(1)).as("_n"), sum(col("amount_cents")).as("_s"))
    // offsets fold on the bucket-sized frame (≤ `buckets` rows), never
    // per key: every bucket row sees the full packed map once
    val packed = perBucket
      .agg(collect_list(struct(col("_graft_pb"), col("_n"), col("_s")))
        .as("_m"))
    def before(m: Column, f: Column => Column): Column =
      aggregate(filter(m, e => e.getField("_graft_pb") < col("_graft_pb")),
        lit(0L), (acc, e) => acc + f(e))
    val offs = perBucket.crossJoin(broadcast(packed))
      .select(col("_graft_pb"),
        before(col("_m"), _.getField("_n")).as("_graft_rko"),
        before(col("_m"), _.getField("_s")).as("_graft_cmo"),
        aggregate(col("_m"), lit(0L),
          (acc, e) => acc + e.getField("_s")).as("_graft_tot"))
    val w = Window.partitionBy(col("_graft_pb"))
      .orderBy(col("amount_cents").desc, col(keyCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val tot = col("_graft_tot").cast("double")
    val cum = (sum(col("amount_cents")).over(wRun) + col("_graft_cmo"))
      .cast("double")
    withB.join(broadcast(offs), "_graft_pb")
      .select(col(keyCol), col("amount_cents"),
        (row_number().over(w).cast("long") + col("_graft_rko"))
          .as("rank"),
        round(col("amount_cents").cast("double") / tot, 6).as("share"),
        round(cum / tot, 6).as("cum_share"),
        when(cum / tot <= aCut, "A")
          .when(cum / tot <= bCut, "B")
          .otherwise("C").as("abc_class"))
  }
}
