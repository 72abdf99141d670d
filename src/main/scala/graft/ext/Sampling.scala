package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — a
  * training-data-pipeline staple (held-out splits, corpus downsampling,
  * reproducible ablations).
  *
  * The sampling key is the first 16 bits of sha256("salt:id") rendered
  * as 4 lowercase hex chars; fixed-length hex compares lexicographically
  * exactly like the underlying integer, so a plain string `<` against a
  * hex threshold implements `P(keep) = threshold / 65536`. Everything is
  * a narrow, shuffle-free projection/filter:
  *  - deterministic: the same row lands in the same split on every run,
  *    engine, and cluster size (no RNG state, no partition sensitivity —
  *    unlike `df.sample`, which depends on partitioning);
  *  - portable: any engine with sha256 reproduces the assignment
  *    bit-for-bit (the DuckDB oracle does);
  *  - salt-keyed: independent salts give independent samples, so
  *    a downsample and a train/valid/test split don't correlate.
  * At 100 TB this runs at scan speed and pushes the projection down to
  * (id) — the text/payload columns are never touched for the decision.
  */
object Sampling {

  /** Guard the fixed output columns: `withColumn` silently REPLACES a
    * same-named input column, which would corrupt caller data — fail fast
    * instead (same pattern as ValidateRoute's corrupt-column guard).
    * Shared with [[Relational]] — one definition so a future change
    * (e.g. tracking spark.sql.caseSensitive) lands everywhere. */
  private[ext] def reserveColumns(df: DataFrame, reserved: Seq[String], op: String): Unit =
    reserved.foreach { c =>
      require(!df.columns.contains(c),
        s"$op writes output column '$c' but the input already has one — rename or drop it")
    }

  /** First `hexLen` chars of sha256("salt:id") — THE sampling key for
    * every sampler here (16-bit buckets at 4, 48-bit at 12), one
    * definition so they can never desynchronize. `concat` (not
    * concat_ws) propagates a NULL id to a NULL key, so null-id rows are
    * never selected by a `<` comparison — the same thing an engine
    * mirroring the documented sha256('salt:'||id) form computes
    * (DuckDB's || is null-propagating). */
  private def hashKey(id: Column, salt: String, hexLen: Int): Column =
    substring(sha2(concat(lit(salt), lit(":"), id.cast("string")), 256), 1, hexLen)

  /** 4-hex-char (16-bit) sampling bucket for an id under a salt. */
  def hashBucket(id: Column, salt: String): Column = hashKey(id, salt, 4)

  /** Hex threshold with 16-bit resolution. Fractions rounding to the full
    * range return "g" — lexicographically above every hex bucket, so
    * `bucket < "g"` keeps everything (this is what makes
    * `hashSplit(0.7, 0.3)` — whose fraction sum is 0.999…9 in floating
    * point — and `bernoulliSample(frac = 1.0)` work). Fractions below
    * the 1/65536 resolution round to an empty sample by design. */
  private def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    val t = math.round(frac * 65536.0)
    if (t >= 65536L) "g" else f"$t%04x"
  }

  /** Deterministic Bernoulli sample: keep ≈`frac` of rows, keyed by id. */
  def bernoulliSample(df: DataFrame, idCol: String, salt: String,
                      frac: Double): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit(hexThreshold(frac)))

  /** High-resolution (48-bit) deterministic Bernoulli sample, for
    * microscopic fractions: [[bernoulliSample]]'s 16-bit threshold rounds
    * `frac < 1/131072` to an EMPTY sample, which is exactly the regime a
    * bounded fit-sample over a cluster-scale table lands in (10⁶ of 10¹²
    * rows = frac 10⁻⁶). 48 bits resolve fractions down to ~3.6e-15, and
    * the threshold floors at one bucket so the sample can only be empty
    * when the hash happens to miss — never by quantization. */
  def preciseBernoulliSample(df: DataFrame, idCol: String, salt: String,
                             frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction $frac outside [0,1]")
    val space = 1L << 48
    // frac = 0.0 means NOTHING, not one floor bucket
    if (frac == 0.0) return df.filter(lit(false))
    val t = math.max(1L, math.round(frac * space.toDouble))
    if (t >= space) df
    else df.filter(hashKey(col(idCol), salt, 12) < lit(f"$t%012x"))
  }

  /** Deterministic per-ROW weighted sample: keep each row with
    * probability `rateCol` (clamped to [0,1]; null rate drops the row).
    * The curation shape behind quality-proportional downsampling — keep
    * documents with probability equal to their quality score — without
    * RNG state: the same 48-bit salted hash as
    * [[preciseBernoulliSample]], compared against a per-row threshold
    * `floor(rate × 2⁴⁸)` rendered as fixed-width hex (floor, not round:
    * identical in every engine with IEEE doubles, no rounding-mode
    * question). rate ≥ 1 renders 13 hex digits — above every 12-hex
    * bucket, keeps everything; rate ≤ 0 renders all-zeros, keeps
    * nothing. Narrow projection+filter: no shuffle, scan speed, and the
    * rate column itself can be any deterministic expression (a quality
    * score, a per-source priority), which is what makes the decision
    * reproducible AND auditable cross-engine.
    */
  def weightedSample(df: DataFrame, idCol: String, salt: String,
                     rateCol: Column): DataFrame = {
    val space = 281474976710656.0 // 2^48, exact in a double
    val r = rateCol.cast("double")
    // rate >= 1 → "g": lexicographically above every hex bucket (same
    // sentinel as hexThreshold — "%012x" of 2^48 would be 13 chars and
    // break the fixed-length compare). A null rate drops the row — note
    // the mechanism: greatest() SKIPS nulls, so the threshold becomes
    // the all-zeros string (below every bucket), not null.
    val t = when(r >= 1.0, lit("g")).otherwise(format_string("%012x",
      greatest(lit(0L), floor(r * space).cast("long"))))
    df.filter(hashKey(col(idCol), salt, 12) < t)
  }

  /** Deterministic stratified sample: per-stratum keep fractions (e.g.
    * keep all rare `error` rows, 10% of the `view` flood), keyed by the
    * same salted 16-bit hash as [[bernoulliSample]] so the decision is
    * engine- and cluster-portable. Strata not in `fracs` fall back to
    * `defaultFrac`. Like every sampler here this is a narrow
    * projection-and-filter — no shuffle, no per-stratum pass: one scan
    * decides every row, which is what rebalancing a 100 TB corpus by
    * source/language/quality-band requires. The stratum column joins
    * the hash input LENGTH-PREFIXED ("5:error/id"), so the (stratum,
    * id) encoding is unambiguous even when stratum values contain the
    * separator — "web/cc" + "1" and "web" + "cc/1" hash differently —
    * and the same id in two strata draws independently. A null stratum
    * encodes as the empty stratum ("0:/id") and draws `defaultFrac`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       salt: String, fracs: Map[String, Double],
                       defaultFrac: Double): DataFrame = {
    val s = coalesce(col(strataCol).cast("string"), lit(""))
    val b = hashBucket(
      concat(length(s).cast("string"), lit(":"), s, lit("/"), col(idCol)), salt)
    val threshold = fracs.foldLeft(lit(hexThreshold(defaultFrac))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(frac))).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Rebalance a corpus to target stratum SHARES: each stratum's keep
    * rate is `min(1, target_s × N / n_s)` — over-represented strata
    * downsample toward their target share of the original volume,
    * under-represented ones keep everything (a sampler can only remove).
    * Strata absent from `targets` are dropped. This is the
    * source/language mixing step of corpus curation ("web 60%, code
    * 20%, books 20%"), as one deterministic scan.
    *
    * The per-stratum counts aggregate once and come back to the driver —
    * bounded by the number of strata (sources/languages), never by rows.
    * The keep decision itself is [[weightedSample]] (48-bit sha256
    * threshold, id-keyed — a row's fate is independent of partitioning
    * and engine). The computed rate is exposed in `rateOut` so the
    * decision is auditable; `frac = (target × N) / n` is two
    * correctly-rounded IEEE ops from integers, bit-identical in any
    * engine that repeats them in this order.
    */
  def rebalanceSample(df: DataFrame, idCol: String, strataCol: String,
                      salt: String, targets: Map[String, Double],
                      rateOut: String = "rate"): DataFrame = {
    require(targets.values.forall(_ >= 0.0), "target shares must be >= 0")
    reserveColumns(df, Seq(rateOut), "rebalanceSample")
    val counts = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val rates: Map[String, Double] = targets.flatMap { case (s, w) =>
      counts.get(s).map(n => s -> math.min(1.0, w * total / n))
    }
    // weightedSample drops null-rate rows (strata outside the targets)
    weightedSample(withRates(df, strataCol, rates, rateOut),
      idCol, salt, col(rateOut))
  }

  /** Temperature-scaled source mixing [the data-mixing α-sampling of
    * multilingual/multi-source LM training, e.g. mBERT/XLM-R's
    * exponent-smoothed sampling]: stratum s receives a target share
    * ∝ its INTEGER-SQRT weight w_s = ⌊√n_s⌋ (the α = 0.5 temperature
    * that upweights small sources without drowning large ones), scaled
    * so the expected kept total is `targetFraction`·N; rates cap at 1
    * (rare strata keep everything).
    *
    * Why integer sqrt: IEEE sqrt is correctly rounded in every engine,
    * so ⌊√n⌋ is engine-exact where a pow(n, α) weight would carry a
    * 1-ulp libm wobble straight into the keep-threshold comparison.
    * Every rate is then (T·w_s)/(Σw·n_s) — integer products, one
    * double division — and the keep decision reuses
    * [[weightedSample]]'s sha256 threshold, so the sample is
    * bit-reproducible across engines and partitionings.
    *
    * Driver state is the per-stratum count map (same bound as
    * [[rebalanceSample]], documented there). */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        salt: String, targetFraction: Double,
                        rateOut: String = "rate"): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    reserveColumns(df, Seq(rateOut), "temperatureSample")
    val counts = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val weights = counts.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }
    val sumW = weights.values.sum
    val t = math.floor(targetFraction * total).toLong
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0, (t * weights(s)).toDouble / (sumW * n).toDouble)
    }
    weightedSample(withRates(df, strataCol, rates, rateOut),
      idCol, salt, col(rateOut))
  }

  /** Above this many strata the rate mapping joins a broadcast rates
    * table instead of folding a `when` chain (O(#strata) expression
    * depth bloats codegen at 10⁴-stratum domains; sources/languages at
    * 10–10² stay on the chain). */
  private[graft] val rateChainMax = 64

  /** Attach the per-stratum keep rate: a folded `when` chain for small
    * rate maps, a broadcast left join above [[rateChainMax]]. The two
    * forms are decision-identical (spec-pinned): the rate DOUBLES are
    * the same driver-computed values either way — literal vs joined —
    * and a null/unmapped stratum gets a null rate in both (a null join
    * key matches nothing; a null chain comparison falls through to the
    * null default), which the downstream sampler drops. */
  private[graft] def withRates(df: DataFrame, strataCol: String,
                               rates: Map[String, Double],
                               rateOut: String): DataFrame =
    if (rates.size <= rateChainMax) {
      val rate = rates.foldLeft(lit(null).cast("double")) {
        case (acc, (s, r)) =>
          when(col(strataCol).cast("string") === s, lit(r)).otherwise(acc)
      }
      df.withColumn(rateOut, rate)
    } else {
      val spark = df.sparkSession
      reserveColumns(df, Seq("_graft_rate_s", "_graft_rate_v"), "withRates")
      val ratesDf = spark.createDataFrame(rates.toSeq)
        .toDF("_graft_rate_s", "_graft_rate_v")
      df.join(broadcast(ratesDf),
          col(strataCol).cast("string") === col("_graft_rate_s"), "left")
        .withColumn(rateOut, col("_graft_rate_v"))
        .drop("_graft_rate_s", "_graft_rate_v")
    }

  /** Weighted sampling WITHOUT replacement [Efraimidis & Spirakis '06,
    * A-Res]: each row draws u ∈ (0, 1] from the salted 48-bit hash
    * grid and keeps priority ln(u)/w (the log form of u^(1/w)); the k
    * LARGEST priorities are an exact weighted sample without
    * replacement — the missing member next to [[weightedSample]]'s
    * independent Bernoulli (which cannot hit an exact k or guarantee
    * no-replacement semantics).
    *
    * Determinism: the cut orders by the 9-dp-ROUNDED priority with an
    * id tiebreak, so the boundary is engine-stable (the one libm `ln`
    * sits ~6 orders below the rounding grain); rows with null or ≤ 0
    * weights are dropped (documented contract). Plans as
    * TakeOrderedAndProject — a bounded heap, never a global sort.
    *
    * Returns the sampled rows + `priority` (rounded). */
  def prioritySample(df: DataFrame, idCol: String, salt: String,
                     weightCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    reserveColumns(df, Seq("priority"), "prioritySample")
    val space = 281474976710656.0 // 2^48
    val h = conv(hashKey(col(idCol), salt, 12), 16, 10).cast("long")
    val u = (h + 1).cast("double") / space // (0, 1]: ln never sees 0
    val w = weightCol.cast("double")
    df.filter(w.isNotNull && w > 0)
      .withColumn("priority", round(log(u) / w, 9))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic train/valid/test assignment: `trainFrac` of the hash
    * space to "train", then `validFrac` to "valid", remainder "test".
    * A null id has a null bucket, which fails both `<` guards and lands
    * in the remainder split — same as the SQL-mirror formulation. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                trainFrac: Double, validFrac: Double): DataFrame = {
    reserveColumns(df, Seq("bucket", "split"), "hashSplit")
    val b = hashBucket(col(idCol), salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < lit(hexThreshold(trainFrac)), "train")
          .when(b < lit(hexThreshold(trainFrac + validFrac)), "valid")
          .otherwise("test"))
  }

  /** Mixture reweighting toward a target group distribution — the
    * data-mixing verb (rebalance a crawl's language/domain mix to a
    * training spec without upsampling): per group, `ratio =
    * target_frac / observed_frac` and `keep_prob = ratio / max(ratio)`,
    * so Bernoulli-keeping each group at its `keep_prob` yields the
    * target proportions while the best-represented-relative-to-target
    * group keeps everything (no duplication, maximal retained data).
    * Apply with [[bernoulliSample]] per group at `keep_prob` — the
    * summary here is the auditable plan, deliberately separate from
    * the (hash-quantized) application.
    *
    * Groups absent from `target` get target_frac 0 (dropped by any
    * application); target entries absent from the corpus are ignored.
    * One group-count aggregate over the corpus; everything downstream
    * is |groups|-sized. All values are integer ratios and one shared
    * max — deterministic with no fold-order caveat. */
  def mixtureWeights(df: DataFrame, groupCol: String,
                     target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty, "target mixture must not be empty")
    val spark = df.sparkSession
    val tdf = spark.createDataFrame(target.toSeq)
      .toDF("group", "target_frac")
    val cnt = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("_tot"))
    val ratios = cnt
      .join(broadcast(tdf), Seq("group"), "left")
      .crossJoin(broadcast(tot))
      .select(col("group"), col("n"),
        (col("n").cast("double") / col("_tot")).as("frac"),
        coalesce(col("target_frac"), lit(0.0)).as("target_frac"))
      .withColumn("ratio",
        col("target_frac") / col("frac"))
    normalizeByMaxRatio(ratios)
  }

  /** Maximal-retention normalization shared by [[mixtureWeights]] and
    * [[distributionMatchWeights]]: keep_prob = ratio / max(ratio), so
    * the most under-represented group keeps everything and nothing
    * upsamples. Guarded: if no group has positive target mass the
    * normalizer is 0 and keep_prob is undefined (null), not NaN. One
    * definition — the DuckDB oracles pin this exact chain. */
  private def normalizeByMaxRatio(ratios: DataFrame): DataFrame = {
    val mx = ratios.agg(max(col("ratio")).as("_mx"))
    ratios.crossJoin(broadcast(mx))
      .withColumn("keep_prob",
        when(col("_mx") > 0.0, col("ratio") / col("_mx")))
      .drop("_mx")
  }

  /** Distribution-matching keep probabilities over a NUMERIC column:
    * reweight the corpus so `valueCol`'s distribution matches a
    * REFERENCE frame's — the length/score-profile matching step of a
    * pretraining mix ("make the crawl's document-length profile look
    * like the curated set's") that [[mixtureWeights]]' categorical
    * form can't express.
    *
    * Same fixed equi-width binning as the PSI monitor (caller-fixed
    * edges on [lo, hi), out-of-range clamps into the edge bins — a
    * pure per-row function, deterministic and incremental) and the
    * same maximal-retention normalization as [[mixtureWeights]]:
    * `ratio = ref_frac / obs_frac` per bin, divided by the max ratio
    * over bins the corpus occupies, so the most under-represented bin
    * keeps everything and nothing upsamples. Corpus bins absent from
    * the reference get keep_prob 0; reference bins absent from the
    * corpus can't be manufactured and simply don't appear (they are
    * the residual mismatch — visible as ref_mass_missing in the
    * frame's complement, not silently hidden).
    *
    * Apply per row with [[weightedSample]] keyed on the same binning.
    * Two aggregates (corpus bins, reference bins); everything after is
    * |bins|-sized. Output:
    * `(bin, n, obs_frac, ref_frac, ratio, keep_prob)`. */
  def distributionMatchWeights(df: DataFrame, ref: DataFrame,
                               valueCol: String, nBins: Int, lo: Double,
                               hi: Double): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    require(lo < hi, s"empty bin range [$lo, $hi)")
    def bins(frame: DataFrame, cnt: String): DataFrame = {
      val v = col(valueCol).cast("double")
      frame.filter(v.isNotNull)
        .select(Drift.clampedBin(v, nBins, lo, hi).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    }
    val obs = bins(df, "n")
    val refb = bins(ref, "_rn")
    val tot = obs.agg(sum(col("n")).as("_tot"))
    val rtot = refb.agg(sum(col("_rn")).as("_rtot"))
    val ratios = obs
      .join(refb, Seq("bin"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(rtot))
      .select(col("bin").cast("long").as("bin"), col("n"),
        (col("n").cast("double") / col("_tot")).as("obs_frac"),
        (coalesce(col("_rn"), lit(0L)).cast("double") / col("_rtot"))
          .as("ref_frac"))
      .withColumn("ratio", col("ref_frac") / col("obs_frac"))
    normalizeByMaxRatio(ratios)
  }

  /** Group-holdout split: train/valid/test assignment keyed by a GROUP
    * (dup cluster, source domain, author) instead of the row id, so
    * every member of a group lands in the same split — the fix for the
    * near-dup eval leakage [[splitLeakage]] quantifies (an excerpt and
    * its base document can no longer straddle train/test, because they
    * hash by their shared cluster id).
    *
    * `groups` maps `groupIdCol` → `groupKeyCol` (e.g. the connected-
    * component labeling from `TextDedup.duplicateGroups`); rows absent
    * from it are singletons and group to their own id. One linear left
    * join plus the same sha256 bucket arithmetic as [[hashSplit]] —
    * deterministic, engine-reproducible, no RNG. Appends `group_key`,
    * `bucket`, `split`. */
  def groupHoldoutSplit(df: DataFrame, idCol: String, groups: DataFrame,
                        groupIdCol: String, groupKeyCol: String,
                        salt: String, trainFrac: Double,
                        validFrac: Double): DataFrame = {
    reserveColumns(df, Seq("group_key", "bucket", "split"),
      "groupHoldoutSplit")
    val g = groups.select(col(groupIdCol).as("_gh_id"),
      col(groupKeyCol).as("_gh_key"))
    val b = hashBucket(col("group_key"), salt)
    df.join(g, col(idCol) === col("_gh_id"), "left")
      .withColumn("group_key", coalesce(col("_gh_key"), col(idCol)))
      .drop("_gh_id", "_gh_key")
      .withColumn("bucket", b)
      .withColumn("split",
        when(b < lit(hexThreshold(trainFrac)), "train")
          .when(b < lit(hexThreshold(trainFrac + validFrac)), "valid")
          .otherwise("test"))
  }

  /** Split-leakage audit: cross-tabulate near-duplicate pairs against a
    * train/valid/test assignment — the hygiene check that a
    * deterministic split is NOT leakage-safe when the corpus contains
    * near-duplicates (an excerpt of a train document hashing into test
    * is eval contamination the split itself cannot see; group-holdout
    * or dedup-before-split is the fix this report motivates).
    *
    * `pairs` is any near-dup pair frame (LSH, containment, SimHash —
    * `(idACol, idBCol, ...)`); `assign` maps `idCol` to `splitCol`.
    * Output: one row per unordered split combination with `n_pairs`
    * (pairs whose endpoints land in those splits) and `n_docs`
    * (distinct documents involved), plus a `cross_split` flag —
    * `true` rows are the leakage.
    *
    * Scale: two linear shuffle joins on the id (the pair table is the
    * near-dup output, orders of magnitude below the corpus; the
    * assignment side is corpus-sized but the join is 1:1), then two
    * contingency-sized aggregations (≤ |splits|² rows). Nothing
    * quadratic beyond what the pair generator already bounded. */
  def splitLeakage(pairs: DataFrame, idACol: String, idBCol: String,
                   assign: DataFrame, idCol: String,
                   splitCol: String): DataFrame = {
    val a = assign.select(col(idCol).as("_sl_ida"), col(splitCol).as("_sl_sa"))
    val b = assign.select(col(idCol).as("_sl_idb"), col(splitCol).as("_sl_sb"))
    val j = pairs
      .join(a, col(idACol) === col("_sl_ida"))
      .join(b, col(idBCol) === col("_sl_idb"))
      .select(least(col("_sl_sa"), col("_sl_sb")).as("split_lo"),
        greatest(col("_sl_sa"), col("_sl_sb")).as("split_hi"),
        col(idACol).cast("long").as("_sl_a"),
        col(idBCol).cast("long").as("_sl_b"))
    // ONE pass over the joined pair frame for both counts: the previous
    // two-aggregate spelling referenced `j` from two plan branches, so
    // the whole upstream pair pipeline executed twice per report.
    // Exploding each pair into its two endpoint rows with a pair-count
    // weight on exactly one of them keeps n_pairs exact (sum of 1s, one
    // per pair) while count_distinct over the endpoint ids is unchanged.
    j.select(col("split_lo"), col("split_hi"),
        explode(array(
          struct(col("_sl_a").as("_sl_id"), lit(1L).as("_sl_w")),
          struct(col("_sl_b").as("_sl_id"), lit(0L).as("_sl_w")))).as("_e"))
      .select(col("split_lo"), col("split_hi"),
        col("_e._sl_id").as("_sl_id"), col("_e._sl_w").as("_sl_w"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(sum(col("_sl_w")).as("n_pairs"),
        countDistinct(col("_sl_id")).as("n_docs"))
      .withColumn("cross_split", col("split_lo") =!= col("split_hi"))
  }

  /** Split-leakage REPAIR: rewrite a published assignment so that no
    * near-duplicate pair crosses splits, with train FROZEN — the
    * surgical alternative to re-splitting by group
    * ([[groupHoldoutSplit]]) once a split is out in the world. Per
    * connected component of the pair graph: any component touching
    * train goes wholly to train (train only grows — nothing a model may
    * have seen leaves it); a component with no train member unifies
    * onto its lexicographically least member split (deterministic, no
    * preference between eval splits). A naive "demote direct
    * train-linked eval docs" pass would NOT close transitive chains
    * (eval↔eval↔train); the component labeling is the closure, in one
    * pass, no fixpoint loop.
    *
    * One component labeling over the (near-dup-sized, not corpus-sized)
    * pair table plus two linear joins against the assignment. Returns
    * the assignment with `split` rewritten and the original kept as
    * `split_orig`; rows absent from the pair graph keep their split. */
  def repairSplitLeakage(assign: DataFrame, idCol: String,
                         splitCol: String, pairs: DataFrame): DataFrame = {
    reserveColumns(assign, Seq("split_orig"), "repairSplitLeakage")
    val comp = graft.ext.TextDedup.duplicateGroups(pairs)
      .select(col("id").as("_rp_id"), col("comp").as("_rp_comp"))
    val withComp = assign
      .join(comp, col(idCol) === col("_rp_id"), "left")
      .withColumn("_rp_key", coalesce(col("_rp_comp"), col(idCol)))
    val target = withComp.groupBy(col("_rp_key").as("_rt_key"))
      .agg(max((col(splitCol) === "train").cast("int")).as("_has_train"),
        min(col(splitCol)).as("_min_split"))
      .select(col("_rt_key"),
        when(col("_has_train") === 1, "train")
          .otherwise(col("_min_split")).as("_rt_split"))
    withComp.join(target, col("_rp_key") === col("_rt_key"))
      .withColumn("split_orig", col(splitCol))
      .withColumn(splitCol, col("_rt_split"))
      .drop("_rp_id", "_rp_comp", "_rp_key", "_rt_key", "_rt_split")
  }

  /** Deterministic per-group cap: keep at most `k` rows per group,
    * chosen by salted-hash order (a uniform, reproducible subsample —
    * not "first k seen", which would bias toward ingestion order). The
    * standard source-cap step for crawl corpora: no single domain may
    * dominate the training mix.
    *
    * Scale shape: written as a rank-filter window, which Spark plans
    * with a PARTIAL `WindowGroupLimit` — each map task forwards at most
    * k rows per group into the exchange, so no full group ever shuffles
    * or holds state (CurationSpec gates the plan). Ties beyond the hash
    * cannot happen for unique ids (the id is the tiebreak). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  salt: String, k: Int): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    reserveColumns(df, Seq("_cap_rank"), "capPerGroup")
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("_cap_rank", row_number().over(W))
      .filter(col("_cap_rank") <= k)
      .drop("_cap_rank")
  }

  /** Leakage-safe train/valid/test split: rows connected by `pairs`
    * (near-duplicate edges over `idCol` values, e.g.
    * [[TextDedup.minhashDupPairs]] output) are assigned ATOMICALLY —
    * the split key is the connected-component representative
    * (min reachable id), so no near-duplicate of a training row can
    * leak into valid/test and contaminate evaluation. Rows in no pair
    * key by their own id; fractions and salt behave as in [[hashSplit]].
    *
    * Scale: the component labeling is [[TextDedup.duplicateGroups]]
    * (iterative label propagation, adaptive local shortcut); the join
    * back is on the id — broadcastable when the paired subset is small
    * (the usual case: most of a deduped corpus is in no pair). */
  def groupSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                     salt: String, trainFrac: Double,
                     validFrac: Double): DataFrame = {
    reserveColumns(df, Seq("group_id", "bucket", "split"), "groupSafeSplit")
    // one split-arithmetic implementation: the pair-edge form is the
    // dup-cluster instance of the general group-holdout split
    groupHoldoutSplit(df, idCol, TextDedup.duplicateGroups(pairs),
        "id", "comp", salt, trainFrac, validFrac)
      .withColumnRenamed("group_key", "group_id")
  }

  /** Sequence packing for training batches: assign documents to
    * fixed-token-budget bins ("sequences") deterministically and in
    * parallel.
    *
    * True first-fit packing is a sequential fold — hostile to a
    * distributed engine. The standard Spark-shaped approximation used
    * here: shard documents by a hash of the id (`numShards` independent
    * streams), order each shard deterministically, and cut bins by the
    * RUNNING token total: a document starting before a budget boundary
    * joins the bin of its starting offset (bins may overflow by at most
    * one document — the usual drop/truncate decision is downstream's).
    * One window over the shard partition; every shard packs
    * independently, so 100 TB packs at full cluster width, and the
    * assignment is reproducible on any engine with window cumsum (the
    * DuckDB oracle checks it).
    *
    * PRECONDITION: `idCol` must be unique (it is the document key) —
    * the running sum orders each shard by it, so duplicate ids would
    * make the duplicates' offsets shuffle-arrival-dependent. Dedup
    * upstream ([[TextDedup.dedupExact]]) before packing.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Int, shard: Column): DataFrame = {
    reserveColumns(df, Seq("shard", "start_offset", "bin"), "packSequences")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(W.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("start_offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_offset") / budget))
  }

  /** Dense 0-based global position of every row under the
    * deterministic salted-hash total order (48-bit key, id tiebreak) —
    * a distributed `zipWithIndex`. NO single-partition window: rows
    * partition into 256 hash-prefix buckets (the prefix of the SAME
    * key that orders them, so per-bucket order concatenated in bucket
    * order IS the global order), per-bucket counts come back to the
    * driver (256 values), and each bucket's `row_number` shifts by its
    * exclusive prefix offset. Null-id rows are excluded (no stable
    * position exists for them — the samplers' convention).
    *
    * The position is a pure function of (id set, salt): independent of
    * partitioning, engine, and row order — an engine replaying
    * `row_number() OVER (ORDER BY substr(sha256('salt:'||id),1,12),
    * id) - 1` reproduces it exactly (the bucket decomposition is an
    * implementation detail of scale, not of the definition). */
  def globalPositions(df: DataFrame, idCol: String, salt: String,
                      posOut: String = "pos"): DataFrame = {
    val internal = Seq("_graft_gp_h", "_graft_gp_b", "_graft_gp_off")
    reserveColumns(df, posOut +: internal, "globalPositions")
    val spark = df.sparkSession
    val withH = df.filter(col(idCol).isNotNull)
      .withColumn("_graft_gp_h", hashKey(col(idCol), salt, 12))
      .withColumn("_graft_gp_b", substring(col("_graft_gp_h"), 1, 2))
    val counts = withH.groupBy(col("_graft_gp_b"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { b =>
      val o = acc; acc += counts(b); (b, o)
    }
    val offDf = spark.createDataFrame(offsets)
      .toDF("_graft_gp_b", "_graft_gp_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_graft_gp_b"))
      .orderBy(col("_graft_gp_h"), col(idCol))
    withH.join(broadcast(offDf), "_graft_gp_b")
      .withColumn(posOut,
        (row_number().over(w).cast("long") - 1L + col("_graft_gp_off")))
      .drop(internal: _*)
  }

  /** k deterministic pseudo-random negatives per anchor row — the
    * contrastive-training sampler ("for each document, k documents
    * that are NOT it") without RNG state or a cross join: candidate
    * POSITIONS come from the salted hash of (anchor, j) modulo N, and
    * a join against [[globalPositions]] resolves them to ids. Each
    * (anchor, j) draw is a pure function of (id set, salt), so the
    * negative set is bit-reproducible across engines and partitionings
    * (oracle-checkable). A draw that lands on the anchor itself is
    * DROPPED (that (anchor, j) slot stays empty — expected k/N per
    * anchor; re-draw loops would break the pure-function contract).
    * Modulo bias over the 48-bit space is ≤ N/2⁴⁸ per bucket —
    * negligible for any real corpus.
    *
    * Scale shape: positions build as in [[globalPositions]]; the
    * candidate table is k narrow rows per anchor; one position-keyed
    * join resolves negatives. Returns `(anchor, j, negative)`. */
  def negativeSample(df: DataFrame, idCol: String, salt: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val pos = globalPositions(df.select(col(idCol)).filter(col(idCol).isNotNull)
      .distinct(), idCol, s"$salt:pos")
    val n = pos.count()
    require(n >= 2, s"need at least 2 distinct ids, got $n")
    val negKey = concat(col("anchor").cast("string"), lit("#"),
      col("j").cast("string"))
    val cands = pos.select(col(idCol).as("anchor"))
      .select(col("anchor"), explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("_graft_negpos",
        conv(hashKey(negKey, s"$salt:neg", 12), 16, 10).cast("long") % n)
    cands
      .join(pos.select(col("pos").as("_graft_negpos"),
        col(idCol).as("negative")), "_graft_negpos")
      .filter(col("negative") =!= col("anchor"))
      .select(col("anchor"), col("j").cast("bigint").as("j"), col("negative"))
  }

  /** Importance-weight diagnostics per group — the QA gate on any
    * weighted corpus (mixture reweighting, temperature sampling,
    * inverse-propensity estimates): a weight distribution with a tiny
    * effective sample size or one dominant weight means downstream
    * estimates ride on a handful of rows no matter how large the
    * corpus looks.
    *
    *  - `ess` — Kish effective sample size `(Σw)²/Σw²`
    *  - `ess_ratio` — ess/n (1 = uniform weights, → 0 = degenerate)
    *  - `max_share` — largest single weight's share of the mass
    *  - `cv` — weight coefficient of variation
    *    `√(n·Σw² − (Σw)²) / Σw`
    *
    * Weights quantize to integer micro-units
    * (`floor(w·microScale + .5)`, the house quantization; pass
    * `microScale = 1` for already-integer weights) so Σw and Σw² are
    * EXACT decimal sums under any partitioning; the summary arithmetic
    * downstream is a fixed per-group chain on those sums (cast to
    * double once — correctly rounded, engine-identical). Rows with
    * null or non-positive weights drop (the A-Res convention). One
    * aggregate; output is |groups|-sized.
    *
    * Output: `(group, n, ess, ess_ratio, max_share, cv)`. */
  def weightDiagnostics(df: DataFrame, groupCol: String, weightCol: String,
                        microScale: Long = 1000000L): DataFrame = {
    require(microScale >= 1, s"microScale must be >= 1: $microScale")
    reserveColumns(df, Seq("n", "ess", "ess_ratio", "max_share", "cv"),
      "weightDiagnostics")
    val wq = floor(col(weightCol) * microScale + lit(0.5)).cast("long")
    val d18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val agg = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol).as("group"), wq.as("_w"))
      .filter(col("_w") > 0)
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(col("_w").cast("decimal(38,0)")).as("_sw"),
        sum(d18(col("_w")) * d18(col("_w"))).as("_sw2"),
        max(col("_w")).as("_mx"))
    val sw = col("_sw").cast("double")
    val sw2 = col("_sw2").cast("double")
    agg.select(col("group"), col("n"),
      round(sw * sw / sw2, 6).as("ess"),
      round(sw * sw / sw2 / col("n"), 6).as("ess_ratio"),
      round(col("_mx").cast("double") / sw, 6).as("max_share"),
      // clamp: the exact decimal n·Σw² − (Σw)² is ≥ 0, but the two
      // independently-rounded doubles can differ by an ulp and go
      // fractionally negative for uniform weights past 2^53 — NaN here,
      // a sqrt range error in the oracle
      round(sqrt(greatest(lit(0.0), col("n") * sw2 - sw * sw)) / sw, 6)
        .as("cv"))
  }
}
