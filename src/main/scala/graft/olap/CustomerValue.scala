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
    * 1..`buckets` against percentile cutpoints of the customer
    * population, then folded into a lifecycle segment.
    *
    * Scale design: scoring deliberately avoids the textbook
    * `ntile()` — a global equal-count tiling needs one total sort of
    * all customers. Instead ONE aggregate computes the `buckets−1`
    * cutpoints per metric, the single cutpoint row broadcasts back,
    * and each customer scores with a narrow array scan:
    * `1 + #{cut : value > cut}` for higher-is-better metrics and
    * `1 + #{cut : value < cut}` for recency. Boundary values (== a
    * cutpoint, common on integer metrics) deterministically take the
    * lower score; heavy ties lump into one score rather than being
    * split arbitrarily, which is the honest answer ntile fakes.
    *
    * Cutpoint state: the DEFAULT (`cutpointK = 0`) is exact
    * `percentile` — deterministic at any n, but its one aggregate
    * buffer is population-proportional (1e9 customers is ~8 GB of
    * values on one reducer, the same cardinality-proportional bound
    * the growth MVs escape via KMV/HLL). `cutpointK > 0` OPTS IN to
    * the bounded source — graft's mergeable KLL sketch read with
    * `percentile`'s interpolation convention
    * (`graft_kll_quantiles_cont`), O(cutpointK·log(n/cutpointK))
    * doubles per metric — the same exact-by-default / bounded-opt-in
    * convention as `Quality.winsorize`/`robustOutliers`' `approxK`,
    * so no caller crosses into the approximate regime silently.
    * While the population fits the sketch (n ≤ cutpointK — no
    * compaction fires) the cutpoints are BIT-IDENTICAL to exact
    * `percentile` (integer inputs interpolate bit-identically
    * cross-engine, the x28 precedent — spec-pinned); use
    * [[exactRegimeCutpointK]] to derive a k with headroom from a
    * known population bound (the x150 oracle does). Cutpoint ulp
    * noise cannot flip a score in that regime: an INTERPOLATED
    * cutpoint falls strictly between two ADJACENT population values
    * (no customer value in the gap), and the tie / integer-rank
    * cases short-circuit to the exact stored value on both engines.
    * BEYOND the exact regime (n > cutpointK) the cutpoints carry
    * KLL's O(n/cutpointK) rank error AND inherit its documented
    * run-to-run caveat: compaction parity follows shuffle fetch
    * order, so two runs over identical input may score
    * boundary-adjacent customers differently — callers needing
    * reproducible segmentation past the sketch capacity raise
    * `cutpointK` above the population or keep the exact default.
    *
    * Segments (hi = buckets−1, lo = 2): champion (r,f,m all ≥ hi),
    * loyal (f ≥ hi), big_spender (m ≥ hi), at_risk (r ≤ lo, f ≥ 3),
    * hibernating (r ≤ lo), else regular — first match wins.
    *
    * Output: `(custCol, recency_days, frequency, monetary_cents,
    * r_score, f_score, m_score, segment)`. */
  def rfm(tx: DataFrame, custCol: String, dateCol: String,
          amountCol: String, buckets: Int = 5,
          cutpointK: Int = 0): DataFrame = {
    require(buckets >= 3, s"buckets must be >= 3: $buckets")
    require(cutpointK == 0 || cutpointK >= math.max(8, buckets),
      s"cutpointK must be 0 (exact percentile) or >= max(8, buckets): " +
        s"$cutpointK")
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
    val cuts =
      if (cutpointK == 0) base.agg(
        percentile(col("recency_days"), typedLit(qs)).as("_rc"),
        percentile(col("frequency"), typedLit(qs)).as("_fc"),
        percentile(col("monetary_cents"), typedLit(qs)).as("_mc"))
      else {
        def kq(c: Column) = graft.functions.GraftFunctions
          .kllQuantilesCont(tx.sparkSession, c.cast("double"), cutpointK, qs)
        base.agg(kq(col("recency_days")).as("_rc"),
          kq(col("frequency")).as("_fc"),
          kq(col("monetary_cents")).as("_mc"))
      }
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

  /** A `cutpointK` that keeps [[rfm]]'s bounded KLL cutpoints in their
    * EXACT regime for a known population bound: the next power of two
    * ≥ 2×`population` (the ×2 headroom absorbs fixture growth and any
    * estimator slack if the bound came from `approx_count_distinct`),
    * floored at 2^16. Self-healing for oracled callers — the derived
    * k grows with the population instead of a hand-edited constant —
    * while the hard cap (2^23, a 64 MB-of-doubles buffer per metric —
    * measured at the boundary by ScaleStress's `rfm_cap4m` probe,
    * which proves score-for-score equality with the exact-percentile
    * path at a 2^22-customer population) fails LOUDLY when the
    * population outgrows what an exact-regime sketch should hold:
    * past that, segmentation is either exact (`cutpointK = 0`,
    * population-sized buffer) or honestly approximate (an explicit
    * fixed k with the documented rank-error band) — never an
    * accidental in-between. */
  def exactRegimeCutpointK(population: Long): Int = {
    require(population >= 0, s"population must be >= 0: $population")
    // cap BEFORE the multiply: 2L*population overflows past 2^62 and
    // would silently satisfy a post-multiply cap instead of tripping
    require(population <= (1L << 22),
      s"population $population needs a >2^23 exact-regime sketch — " +
        "use cutpointK = 0 (exact percentile) or accept the KLL " +
        "rank-error band with an explicit fixed cutpointK")
    val need = math.max(1L << 16, 2L * population)
    var k = 1 << 16
    while (k < need) k <<= 1
    k
  }

  /** Deterministic monotone NON-INCREASING band of a long amount — the
    * HDR-histogram log-linear lattice: octave (bit length) plus the
    * next `sub` mantissa bits, flipped so band asc == amount desc, with
    * zero and negatives ordered after all positives. A pure per-row
    * expression of the value alone (the octave comes from
    * `length(bin(x))`, exact for every long — never a float `log2`
    * whose power-of-two boundaries wobble), so two evaluations of a
    * banded frame agree bit-for-bit with NO shared-aggregate contract.
    * Band width is at most a ×(1 + 2^-sub) amount ratio — except the
    * single seam band at sub = 0, where {1, 2, 3} co-band (×3); equal
    * amounts always co-band. `Long.MinValue` (whose negation would
    * overflow) gets its own explicit band AFTER every representable
    * negative — it is the unique value of magnitude 2^63, so it
    * co-bands with nothing and sorts last, exactly where amount-DESC
    * order puts it. (Package-visible for the monotonicity spec.) */
  private[graft] def amountBand(x: Column, sub: Int): Column = {
    val width = 1L << sub
    def posKey(v: Column): Column = {
      // e = floor(log2 v); values below 2^(sub+1) are their own key,
      // larger ones key on (octave, top-`sub` mantissa bits) —
      // contiguous and monotone across the seam
      val e = (length(bin(v)) - 1).cast("long")
      when(e <= sub, v)
        .otherwise(e * width +
          (call_function("shiftright", v, (e - sub).cast("int")) - width))
    }
    val big = lit(64L * width)
    when(x > 0, big - posKey(x))
      .when(x === 0, big + 1)
      // posKey caps below 64·width, so 2 + 2·big clears every
      // negate-able negative's band
      .when(x === Long.MinValue, lit(2L) + big + big)
      .otherwise(big + 2 + posKey(-x))
  }

  /** Pareto / ABC analysis: rank keys by exact-cents contribution,
    * accumulate the revenue share, and class them A (the head up to
    * `aCut` of total), B (up to `bCut`), C (tail) — "which 20% of
    * customers carry 80% of revenue" as a table.
    *
    * The cumulative share needs ONE global order — but never a global
    * SORT PARTITION: the transaction log reduces to per-key cents
    * first (the |keys|-sized report frame), and the rank + running sum
    * over that frame decompose by AMOUNT-RANGE band, the
    * `Sampling.globalPositions` prefix-offset pattern adapted to a
    * value order and kept ENTIRELY IN-PLAN (no persist, no driver
    * collect):
    *
    *  1. each key bands by a DETERMINISTIC monotone function of its
    *     own `amount_cents` — the HDR-histogram log-band lattice of
    *     [[amountBand]] (octave + a few mantissa bits), a pure per-row
    *     expression: no boundary aggregate exists, so independent
    *     evaluations of the banded frame are bit-identical BY
    *     CONSTRUCTION and nothing depends on Spark's exchange/broadcast
    *     reuse firing (band placement only balances work —
    *     rank/cum_share are global properties, identical under any
    *     monotone banding, and equal amounts always co-band, so band
    *     order concatenates to exactly the global `(amount DESC, key)`
    *     order);
    *  2. per-band counts/cents sums (≤ ~`buckets` rows per sign)
    *     prefix-sum into rank/cumulative offsets + the grand total
    *     with ONE window over the band-sized frame itself (O(B log B)
    *     in the occupied-band count), broadcast-joined back;
    *  3. the window runs PARTITIONED by band — each sort holds one
    *     band's keys, never the key population on one partition.
    *
    * Skew: the lattice is fixed-magnitude, not equal-count — a corpus
    * concentrated in one octave×mantissa band sorts those keys in one
    * partition (at the default granularity a band spans at most a
    * ×1.25 amount range, so only a near-constant amount distribution
    * degenerates; heavy exact TIES co-band by necessity — rank
    * determinism). Measured on the degenerate probes (ScaleStress,
    * 2M keys): near-constant DISTINCT amounts in one octave run ~1.2×
    * the well-spread wall at the default granularity and recover with
    * `buckets = 1024` (~1.5× fewer seconds — the knob is the remedy,
    * raising it only adds empty band space); ALL-TIE amounts (one
    * band holds every key) run ~1.2× — mild, and irreducible WITHOUT
    * caller help: a tie band's keys must concatenate in key order,
    * and no type-generic per-row function sub-bands a key
    * monotonically (a hash would break the rank order). The caller
    * CAN help: `tieBand` takes an expression of the key column that
    * is monotone NON-DECREASING in key order (nulls lowest) — e.g.
    * `floor(col("custkey") / 8192)` for numeric keys,
    * `substring(col("key"), 1, 2)` for strings — applied as a
    * secondary band INSIDE exact-tie bands ONLY (mixed-amount bands
    * keep their single partition: a key sub-band there would
    * interleave amounts across sub-bands and corrupt the rank), so
    * a 1e8-exact-tie population sorts in |tie values| partitions
    * instead of one. Keep its cardinality band-like (hundreds, not
    * the key space): the per-(band, tie value) offset frame
    * broadcasts. Monotonicity is the caller's contract — the
    * rank-order property is spec-pinned for a conforming expression,
    * a non-monotone one silently corrupts ranks exactly as a
    * non-deterministic score corrupts dedupByPairsKeepBest. The
    * banding trade deletes the old quantile-boundary + offset
    * BARRIERS: no percentile aggregate, no one-row broadcast before
    * keys can band.
    *
    * `buckets` is a band-GRANULARITY target, not an exact partition
    * count: it maps to `2^ceil(log2(buckets))/64` sub-bands per octave
    * (so the positive band SPACE is exactly `buckets` for powers of
    * two in [2^6, 2^22], the next power of two otherwise, never below
    * the 64-octave floor — octave banding cannot be coarser — and
    * capped at 2^22 by the 16-mantissa-bit clamp), negatives mirror
    * it, and the OCCUPIED count is bounded by the data's magnitude
    * spread, typically far smaller. A caller with a
    * KNOWN-SMALL key population can pass `buckets = 1` to skip the
    * machinery entirely (one window partition — cheapest at dashboard
    * scale).
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
                buckets: Int = 256,
                tieBand: Option[Column] = None): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1: $aCut, $bCut")
    require(buckets >= 1, s"buckets must be positive: $buckets")
    import org.apache.spark.sql.expressions.{Window, WindowSpec}
    val perKey = tx
      .filter(col(keyCol).isNotNull && col(amountCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(cents(col(amountCol))).as("amount_cents"))
    // ceil(log2(buckets)) - 6 mantissa bits: the positive band space is
    // 64 octaves x 2^sub sub-bands — == buckets for powers of two >= 64,
    // the 64-band octave floor below that (see the scaladoc contract)
    val sub = math.min(16, math.max(0,
      if (buckets < 2) 0
      else 32 - Integer.numberOfLeadingZeros(buckets - 1) - 6))
    val withB = perKey.withColumn("_graft_pb",
      if (buckets == 1) lit(0L) else amountBand(col("amount_cents"), sub))

    // shared report tail: rank/shares from a rows frame carrying the
    // partition offsets, windowed per band (or per tie sub-band)
    def report(rows: DataFrame, w: WindowSpec): DataFrame = {
      val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
      val tot = col("_graft_tot").cast("double")
      val cum = (sum(col("amount_cents")).over(wRun) + col("_graft_cmo"))
        .cast("double")
      rows.select(col(keyCol), col("amount_cents"),
        (row_number().over(w).cast("long") + col("_graft_rko"))
          .as("rank"),
        round(col("amount_cents").cast("double") / tot, 6).as("share"),
        round(cum / tot, 6).as("cum_share"),
        when(cum / tot <= aCut, "A")
          .when(cum / tot <= bCut, "B")
          .otherwise("C").as("abc_class"))
    }

    // ONE window prefix-sum over the partition-key frame (`_n` rows,
    // `_s` cents per window partition) computes every partition's rank
    // and cents offsets + the grand total — O(B log B) for B occupied
    // partitions (≤ min(|keys|, band space ≤ 2^23), typically a few
    // hundred), never per key and never the old O(B²) packed-row
    // rescan. The sort is unpartitioned BY DESIGN: its input is the
    // band frame, not the key population — the one unpartitioned
    // window the CustomerValueSpec plan gate whitelists by its
    // `_graft_*` order-spec names. Shared by both paths so a fix to
    // the fold cannot diverge them.
    def offsets(perPart: DataFrame, keyNames: Seq[String]): DataFrame = {
      val keys = keyNames.map(col)
      val wOff = Window.orderBy(keys: _*)
      val prior = wOff.rowsBetween(Window.unboundedPreceding, -1)
      perPart.select(keys ++ Seq(
        coalesce(sum(col("_n")).over(prior), lit(0L)).as("_graft_rko"),
        coalesce(sum(col("_s")).over(prior), lit(0L)).as("_graft_cmo"),
        sum(col("_s")).over(wOff.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .as("_graft_tot")): _*)
    }

    tieBand match {
      case None =>
        val perBucket = withB.groupBy(col("_graft_pb"))
          .agg(count(lit(1)).as("_n"), sum(col("amount_cents")).as("_s"))
        val offs = offsets(perBucket, Seq("_graft_pb"))
        report(withB.join(broadcast(offs), "_graft_pb"),
          Window.partitionBy(col("_graft_pb"))
            .orderBy(col("amount_cents").desc, col(keyCol)))

      case Some(tb) =>
        // the ALL-TIE remedy: sub-band by the caller's key expression
        // INSIDE exact-tie bands only. A band whose amounts are all
        // equal orders purely by key, so any monotone-non-decreasing-
        // in-key band concatenates to the same order while splitting
        // the one hot window partition; a mixed-amount band keeps its
        // single partition (sub-banding it by a key expression would
        // interleave amounts across sub-bands and corrupt the rank).
        // The struct wrapper keeps a null tie value groupable/joinable
        // (structs never null out the key) and orders null-first —
        // consistent with asc-nulls-first key order.
        val withT = withB.withColumn("_graft_tb", struct(tb.as("t")))
        val levels = withT.groupBy(col("_graft_pb"), col("_graft_tb"))
          .agg(count(lit(1)).as("_n"), sum(col("amount_cents")).as("_s"),
            min(col("amount_cents")).as("_mn"),
            max(col("amount_cents")).as("_mx"))
        val bandTie = levels.groupBy(col("_graft_pb"))
          .agg((min(col("_mn")) === max(col("_mx"))).as("_tie"))
        // effective sub-band: the tie value inside an exact-tie band,
        // one struct(null) group otherwise (no collision: a band is
        // either all-tie or not, never mixed within one _graft_pb)
        val leveled = levels.join(broadcast(bandTie), "_graft_pb")
          .withColumn("_graft_tbe", struct(
            when(col("_tie"), col("_graft_tb").getField("t")).as("t")))
        val perPart = leveled.groupBy(col("_graft_pb"), col("_graft_tbe"))
          .agg(sum(col("_n")).as("_n"), sum(col("_s")).as("_s"))
        // the shared band-frame prefix-sum, ordered (band, tie
        // sub-band) — still one whitelisted unpartitioned window over
        // a band-count-sized frame
        val offs = offsets(perPart, Seq("_graft_pb", "_graft_tbe"))
        // map each (band, tie value) level to its window partition's
        // offsets, then attach to the key rows — both joins broadcast
        // the band-frame side
        val levelOffs = leveled
          .select(col("_graft_pb"), col("_graft_tb"), col("_graft_tbe"))
          .join(offs, Seq("_graft_pb", "_graft_tbe"))
        report(withT.join(broadcast(levelOffs),
            Seq("_graft_pb", "_graft_tb")),
          Window.partitionBy(col("_graft_pb"), col("_graft_tbe"))
            .orderBy(col("amount_cents").desc, col(keyCol)))
    }
  }
}
