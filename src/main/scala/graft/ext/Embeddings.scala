package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing: L2 normalization, symmetric int8
  * quantization, and per-group centroids — the storage/bandwidth tier of
  * a training-data pipeline (a 100 TB float32 embedding table is 25 TB
  * at int8; shuffling quantized vectors moves a quarter of the bytes).
  *
  * All operators are narrow per-row expressions except the centroid,
  * which is one hash aggregation over integer sums (order-independent,
  * hence deterministic under any partitioning — the reason centroids are
  * computed over the QUANTIZED vectors: float summation order varies
  * with shuffle layout, integer sums never do).
  *
  * HOF-inlining hazard (round-3 lesson): any scalar referenced inside a
  * `transform` lambda is re-evaluated PER ELEMENT, and single-use
  * non-cheap projections get inlined by CollapseProject. Every function
  * here therefore returns the scalar (norm / scale) alongside the
  * transformed array, keeping ≥2 uses so the optimizer materializes it
  * once per row.
  */
object Embeddings {

  /** 2^-149-safe tiny floor so an all-zero vector quantizes to zeros
    * instead of dividing by zero under ANSI mode. */
  private val tinyScale = 1e-30

  private def guard(df: DataFrame, cols: Seq[String]): Unit =
    graft.Guards.reserved(df, "Embeddings", cols)

  /** L2-normalize `embCol` (array of float/double) into `<out>` with the
    * norm kept as `<out>_norm`. Zero vectors normalize to zeros (null-free,
    * pipeline-survivable). */
  def l2Normalize(df: DataFrame, embCol: String, out: String): DataFrame = {
    guard(df, Seq(out, s"${out}_norm"))
    val v = Similarity.asDouble(col(embCol))
    df.withColumn(s"${out}_norm", Similarity.l2Norm(v))
      .withColumn(out,
        when(col(s"${out}_norm") === 0.0, v)
          .otherwise(transform(v, x => x / col(s"${out}_norm"))))
  }

  /** Johnson–Lindenstrauss random projection: embed `embCol` into
    * `planes.size` dimensions via seeded Gaussian planes, component j =
    * dot(v, plane_j) / sqrt(k). JL: pairwise distances are preserved
    * within (1±ε) for k = O(log n / ε²) — the standard cheap
    * dimensionality reduction before clustering / coarse ANN when a
    * learned PCA is overkill or must be fitted-state-free.
    *
    * Scale shape: per-row narrow projection, NO fitted state and NO
    * shuffle — the planes are deterministic from the seed
    * ([[Similarity.hyperplanes]]), so executors on a 1000-node cluster
    * (or a different engine entirely) reproduce identical outputs with
    * nothing shipped. Left-to-right double summation keeps every
    * component bit-reproducible cross-engine (same contract as the
    * cosine oracles). */
  def randomProject(df: DataFrame, embCol: String, out: String,
                    planes: Seq[Seq[Double]]): DataFrame = {
    require(planes.nonEmpty, "randomProject needs at least one plane")
    guard(df, Seq(out))
    val v = Similarity.asDouble(col(embCol))
    val scale = math.sqrt(planes.size.toDouble)
    df.withColumn(out,
      array(planes.map(p => Similarity.dot(v, Similarity.vecLit(p)) / scale): _*))
  }

  /** Symmetric int8 quantization: scale = max|x| / 127, element q =
    * floor(x / scale + 0.5) clamped to [-127, 127] (round-half-up — the
    * portable rounding both Spark and DuckDB floor() reproduce
    * bit-for-bit). Emits `<out>` (array<int>) and `<out>_scale`;
    * dequantize as q * scale.
    *
    * Runs on the fused [[graft.functions.QuantizeInt8]] kernel (one
    * compiled pass — measured 17× the interpreted three-lambda HOF
    * formulation at 200k×64-dim: 0.54 s vs 9.4 s on 8 cores; the HOF
    * spelling remains in [[quantizeInt8Portable]] as the cross-engine
    * reference and FunctionsSpec pins bit-parity). */
  def quantizeInt8(df: DataFrame, embCol: String, out: String): DataFrame = {
    guard(df, Seq(out, s"${out}_scale", "_graft_q8"))
    val spark = df.sparkSession
    df.withColumn("_graft_q8",
        graft.functions.GraftFunctions.quantizeInt8(spark,
          Similarity.kernelVector(df, embCol)))
      .withColumn(s"${out}_scale", col("_graft_q8.scale"))
      .withColumn(out, col("_graft_q8.q"))
      .drop("_graft_q8")
  }

  /** The composable HOF spelling of [[quantizeInt8]] — what the DuckDB
    * oracle mirrors term for term; bit-identical to the kernel on
    * finite null-free vectors (the kernel nulls poisoned rows instead
    * of propagating element nulls / NaN-poisoning the scale). */
  def quantizeInt8Portable(df: DataFrame, embCol: String, out: String): DataFrame = {
    guard(df, Seq(out, s"${out}_scale"))
    val v = Similarity.asDouble(col(embCol))
    val maxAbs = array_max(transform(v, x => abs(x)))
    df.withColumn(s"${out}_scale",
        greatest(maxAbs, lit(tinyScale)) / 127.0)
      .withColumn(out,
        transform(v, x => greatest(lit(-127),
          least(lit(127), floor(x / col(s"${out}_scale") + 0.5)))
          .cast("int")))
  }

  /** Per-group centroids of quantized vectors, long form: one row per
    * (group, dim) with the mean quantized weight. Integer sums make the
    * result independent of row order — the only centroid formulation
    * that hash-verifies cross-engine and re-runs identically on a
    * cluster. Feed `quantizeInt8` output.
    *
    * Plan shape: the native `graft_vecsum` aggregate reduces map-side,
    * so the exchange carries ONE sum-array per (partition, group) — not
    * the rows × dims exploded pairs the naive posexplode-then-groupBy
    * would shuffle. The explode happens AFTER aggregation, on |groups|
    * rows. */
  def groupCentroids(df: DataFrame, qCol: String, groupCol: String): DataFrame = {
    val spark = df.sparkSession
    df.groupBy(col(groupCol))
      .agg(
        graft.functions.GraftFunctions.vecSumLong(spark, col(qCol)).as("_sums"),
        count(col(qCol)).as("n_vecs"))
      .select(col(groupCol), col("n_vecs"),
        posexplode(col("_sums")).as(Seq("dim", "q_sum")))
      .select(col(groupCol), col("dim"), col("n_vecs"), col("q_sum"))
      .withColumn("q_mean", col("q_sum").cast("double") / col("n_vecs"))
  }

  /** Nearest-centroid confusion matrix — the cheap embedding-quality
    * probe: quantize, build the integer-lattice per-label centroids
    * ([[groupCentroids]] — order-independent, so the "model" is
    * deterministic under any partitioning), assign every vector to its
    * max-cosine centroid, and cross-tabulate predicted vs true label.
    * A separable embedding space concentrates the matrix on the
    * diagonal; a collapsed one doesn't — run it after every embedding
    * or quantization change.
    *
    * Scale: the whole centroid set (|labels|·dims doubles) broadcasts
    * as ONE row, so the per-vector argmax is a NARROW higher-order
    * expression over the corpus scan — no per-vector shuffle, no
    * |labels|× row inflation surviving past the map stage; the only
    * exchange is the contingency-sized confusion aggregate. Cosine
    * rounds to `roundTo` and argmax ties break on the GREATEST label
    * (max over (sim, label) structs — the house argmax rule), so the
    * matrix hash-verifies cross-engine. Vectors with no comparable
    * centroid (zero norm) drop; rows with a null label or null
    * embedding drop up front (an unlabeled row must not become a
    * null-keyed centroid — the centroidShift contract). */
  def nearestCentroidConfusion(df: DataFrame, embCol: String,
                               labelCol: String,
                               roundTo: Int = 6): DataFrame = {
    // null labels or embeddings drop up front (same guard as
    // centroidShift): an unlabeled row must not mint a null-keyed
    // centroid group, and a null embedding row has nothing to assign
    val in = df.filter(col(labelCol).isNotNull && col(embCol).isNotNull)
    val q = quantizeInt8(in, embCol, "_ncq")
    val cents = groupCentroids(q, "_ncq", labelCol)
      .groupBy(col(labelCol).as("_nc_label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("q_mean")))),
        e => e.getField("q_mean")).as("_nc_c"))
      .agg(collect_list(struct(col("_nc_label"), col("_nc_c"))).as("_cents"))
    in
      .select(col(labelCol).as("label"), Similarity.asDouble(col(embCol)).as("_e"))
      .crossJoin(broadcast(cents))
      .select(col("label"), array_max(filter(
        transform(col("_cents"), c => struct(
          // native fused cosine kernel — bit-identical to the HOF form
          // (documented contract), but one tight JVM loop per centroid
          // instead of interpreted zip_with+aggregate lambdas
          round(graft.functions.GraftFunctions.cosineSim(df.sparkSession,
            col("_e"), c.getField("_nc_c")), roundTo).as("_sim"),
          c.getField("_nc_label").as("_l"))),
        x => x.getField("_sim").isNotNull)).as("_m"))
      .filter(col("_m").isNotNull)
      .select(col("label"), col("_m").getField("_l").as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Principal-axis projection — PCA's top component over an embedding
    * column, engine-exact end to end:
    *
    *  1. embeddings quantize to an integer lattice
    *     (`floor(x·2^latticeBits + 0.5)` — the portable-rounding
    *     spelling, never `round()`, whose half-tie rule differs across
    *     engines), so the covariance inputs — per-dim sums and the
    *     flattened d² outer-product sums via the native `graft_vecsum`
    *     reducer — are EXACT integers, independent of row and
    *     partition order. The one corpus pass reduces map-side to
    *     d + d² longs (≈33 KB at d=64).
    *  2. the d×d covariance and `iters` UNNORMALIZED power-iteration
    *     steps run on the driver (bounded state, like the BPE merge
    *     table): per-step normalization is skipped so the whole
    *     iteration is plain fused multiply-adds a SQL replay can fold
    *     1:1. λ^iters must stay inside double range — 20 steps at
    *     λ≈5e5 is ~1e113, far under 1e308; since λ is data-dependent,
    *     overflow/underflow is DETECTED at runtime (loud require, no
    *     silent NaN axis). One normalization at the end, then a
    *     canonical sign (max-|loading| component positive, smallest
    *     index on ties).
    *  3. each row projects onto the axis with a narrow centered dot
    *     (μ from the exact integer sums) — no shuffle.
    *
    * On spectra with a real top component (the usual case for learned
    * embeddings) 20 iterations converge; on near-isotropic corpora the
    * result is a deterministic mixture of the top eigenvectors — there
    * is no meaningful principal axis to find there, and determinism is
    * what the cross-engine oracle pins.
    *
    * Returns `(idCol, proj)`; `axis(df, ...)` exposes the loadings. */
  def principalAxis(df: DataFrame, embCol: String, idCol: String,
                    latticeBits: Int = 12, iters: Int = 20,
                    roundTo: Int = 6): DataFrame = {
    val (v, mu) = principalAxisVectors(df, embCol, latticeBits, iters)
    val pcLit = array(v.map(lit).toIndexedSeq: _*)
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    df.filter(col(embCol).isNotNull)
      .select(col(idCol),
        round(aggregate(
          zip_with(zip_with(Similarity.asDouble(col(embCol)), muLit, _ - _),
            pcLit, _ * _),
          lit(0.0), _ + _), roundTo).as("proj"))
  }

  /** The (loadings, mean) pair behind [[principalAxis]]. */
  def principalAxisVectors(df: DataFrame, embCol: String,
                           latticeBits: Int = 12,
                           iters: Int = 20): (Array[Double], Array[Double]) = {
    val (pcs, mu) = principalComponentVectors(df, embCol, 1, latticeBits, iters)
    (pcs.head, mu)
  }

  /** Top-`k` principal components by power iteration + Hotelling
    * deflation (`C ← C − λ·v·vᵀ` after each extracted axis, λ = vᵀCv
    * with the same left-fold order the SQL replay uses). Every step
    * inherits [[principalAxis]]'s determinism contract. Returns
    * (loadings per component, mean). */
  def principalComponentVectors(df: DataFrame, embCol: String, k: Int,
                                latticeBits: Int = 12,
                                iters: Int = 20): (Seq[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= 8, "k in [1,8]")
    require(latticeBits >= 1 && latticeBits <= 20, "latticeBits in [1,20]")
    require(iters >= 1 && iters <= 120, "iters in [1,120]")
    val spark = df.sparkSession
    val scale = (1L << latticeBits).toDouble
    val q = transform(Similarity.asDouble(col(embCol)),
      x => floor(x * scale + lit(0.5)).cast("long"))
    val agg = df.filter(col(embCol).isNotNull)
      .select(q.as("_q"))
      .agg(
        graft.functions.GraftFunctions.vecSumLong(spark, col("_q")).as("_s"),
        graft.functions.GraftFunctions.vecSumLong(spark,
          flatten(transform(col("_q"),
            x => transform(col("_q"), y => x * y)))).as("_o"),
        count(lit(1)).as("_n"))
      .head()
    require(agg.getLong(2) > 0,
      "principalAxis needs at least one row with a non-null embedding")
    val s = agg.getSeq[Long](0).toArray
    val o = agg.getSeq[Long](1).toArray
    val n = agg.getLong(2).toDouble
    val d = s.length
    require(d > 0, "principalAxis: embedding arrays are empty")
    var c = Array.tabulate(d, d)((i, j) =>
      o(i * d + j).toDouble / n - (s(i).toDouble / n) * (s(j).toDouble / n))

    // left-to-right accumulation everywhere: the replay is a left fold
    def matvec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += m(i)(j) * x(j); j += 1 }
        acc
      }
    def extract(m: Array[Array[Double]]): Array[Double] = {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) { v = matvec(m, v); it += 1 }
      // once an overflow produces Inf it persists to the end — one
      // check here catches any iters/spectrum combination that left
      // double range (the static cap alone cannot know λ)
      require(v.forall(java.lang.Double.isFinite),
        s"principalAxis: $iters unnormalized power-iteration steps " +
          "overflowed double range for this spectrum — lower iters " +
          "(λ^iters must stay finite)")
      var nrm2 = 0.0
      var i = 0
      while (i < d) { nrm2 += v(i) * v(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      require(nrm > 0.0,
        "principalAxis: iterate underflowed to zero (degenerate or " +
          "near-zero covariance) — no axis to normalize")
      v = v.map(_ / nrm)
      var bi = 0
      var t = 1
      while (t < d) { if (math.abs(v(t)) > math.abs(v(bi))) bi = t; t += 1 }
      if (v(bi) < 0) v.map(x => -x) else v
    }

    val pcs = Seq.newBuilder[Array[Double]]
    var comp = 0
    while (comp < k) {
      val v = extract(c)
      pcs += v
      if (comp < k - 1) {
        // Hotelling deflation: λ = vᵀ C v, C ← C − λ·v·vᵀ — the same
        // ascending folds and left-assoc products the replay spells
        val cv = matvec(c, v)
        var lam = 0.0
        var i = 0
        while (i < d) { lam += v(i) * cv(i); i += 1 }
        val prev = c
        c = Array.tabulate(d, d)((i2, j2) =>
          prev(i2)(j2) - lam * v(i2) * v(j2))
      }
      comp += 1
    }
    (pcs.result(), Array.tabulate(d)(i2 => s(i2) / n / scale))
  }

  /** Top-`k` PCA projections per row: `(idCol, proj_1 … proj_k)` —
    * the 2-D/low-D embedding map view. Same narrow centered dots as
    * [[principalAxis]]; one corpus pass for the model, one for the
    * projections. */
  def principalComponents(df: DataFrame, embCol: String, idCol: String,
                          k: Int = 2, latticeBits: Int = 12,
                          iters: Int = 20, roundTo: Int = 6): DataFrame = {
    val (pcs, mu) = principalComponentVectors(df, embCol, k, latticeBits, iters)
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    val centered = zip_with(Similarity.asDouble(col(embCol)), muLit, _ - _)
    val projCols = pcs.zipWithIndex.map { case (v, i) =>
      round(aggregate(
        zip_with(centered, array(v.map(lit).toIndexedSeq: _*), _ * _),
        lit(0.0), _ + _), roundTo).as(s"proj_${i + 1}")
    }
    df.filter(col(embCol).isNotNull)
      .select(col(idCol) +: projCols: _*)
  }

  /** "All-but-the-top" embedding post-processing (Mu & Viswanath,
    * ICLR 2018): mean-center, then subtract the projections onto the
    * top-`k` principal components — removing the dominant common
    * directions that inflate all pairwise cosines and mask genuine
    * similarity structure. The standard cheap isotropy fix before
    * near-dup thresholds or ANN over learned embeddings.
    *
    * Engine-exact by construction: the model (μ + top-k axes) comes
    * from [[principalComponentVectors]]'s integer-lattice covariance +
    * unnormalized power iteration, and the per-row correction is a
    * narrow expression — centered = e − μ, pᵢ = ⟨centered, vᵢ⟩ (RAW,
    * kept as a materialized column so the HOF lambdas don't re-derive
    * it per element), corrected = centered − p₁v₁ − … − p_kv_k with
    * left-assoc subtraction. No shuffle; model state is k·d + d
    * doubles as literals in the plan.
    *
    * Output per row: `(idCol, proj_1…proj_k, norm_before,
    * norm_after)` — the projections are the removed magnitudes and
    * the norm pair quantifies how much common-direction mass each
    * vector carried (all rounded to `roundTo`). */
  def removeTopComponents(df: DataFrame, embCol: String, idCol: String,
                          k: Int = 2, latticeBits: Int = 12,
                          iters: Int = 20, roundTo: Int = 6): DataFrame = {
    val (pcs, mu) = principalComponentVectors(df, embCol, k, latticeBits, iters)
    val reserved = (1 to k).map(i => s"_rt_p$i") ++ Seq("_rt_ce")
    guard(df, reserved ++ (1 to k).map(i => s"proj_$i") ++
      Seq("norm_before", "norm_after"))
    val muLit = array(mu.map(lit).toIndexedSeq: _*)
    val sq = (v: Column) => aggregate(transform(v, x => x * x), lit(0.0), _ + _)
    val withProj = pcs.zipWithIndex.foldLeft(
      df.filter(col(embCol).isNotNull)
        .withColumn("_rt_ce",
          zip_with(Similarity.asDouble(col(embCol)), muLit, _ - _))) {
      case (acc, (v, i)) =>
        acc.withColumn(s"_rt_p${i + 1}",
          aggregate(zip_with(col("_rt_ce"),
            array(v.map(lit).toIndexedSeq: _*), _ * _), lit(0.0), _ + _))
    }
    val corrected = pcs.zipWithIndex.foldLeft(col("_rt_ce")) {
      case (acc, (v, i)) =>
        zip_with(acc, array(v.map(lit).toIndexedSeq: _*),
          (c, w) => c - col(s"_rt_p${i + 1}") * w)
    }
    withProj.select(
      col(idCol) +:
        (1 to k).map(i => round(col(s"_rt_p$i"), roundTo).as(s"proj_$i")) :+
        round(sqrt(sq(col("_rt_ce"))), roundTo).as("norm_before") :+
        round(sqrt(sq(corrected)), roundTo).as("norm_after"): _*)
  }

  /** Quantized dot product (integer arithmetic, exact): dot(qa, qb) *
    * scale_a * scale_b approximates the float dot — the cheap re-rank
    * primitive over int8-compressed embeddings. */
  def quantizedDot(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => (x * y).cast("long")), lit(0L), _ + _)
      .cast("double") * sa * sb

  /** Embedding drift between two corpus versions: per label, the
    * cosine between the OLD and NEW integer-lattice centroids — the
    * embedding-space companion to the tabular drift family (PSI/KS say
    * a numeric column moved; this says the embedding REGION backing a
    * label rotated, after a re-embed, an encoder upgrade, or a data
    * mix change — the signal that invalidates stored ANN thresholds).
    *
    * Both centroid sets come from [[groupCentroids]]' order-independent
    * integer sums, so the "model" on each side is deterministic under
    * any partitioning, and the cosine is one fixed per-row chain over
    * two |dims|-sized arrays. Labels present on only one side report
    * null cosine (undefined — flagged by the zero count, never a fake
    * 0). Two aggregates, a |labels|-sized join; nothing corpus-sized
    * survives the map stage.
    *
    * Output: `(label, n_old, n_new, cos_sim, shift)` with
    * `shift = 1 − cos_sim`, both rounded to `roundTo`. */
  def centroidShift(oldDf: DataFrame, newDf: DataFrame, embCol: String,
                    labelCol: String, roundTo: Int = 6): DataFrame = {
    def cents(df: DataFrame, tag: String): DataFrame = {
      val q = quantizeInt8(df.filter(col(labelCol).isNotNull &&
        col(embCol).isNotNull), embCol, "_csq")
      groupCentroids(q, "_csq", labelCol)
        .groupBy(col(labelCol).as("label"))
        .agg(max(col("n_vecs")).as(s"n_$tag"),
          transform(
            array_sort(collect_list(struct(col("dim"), col("q_mean")))),
            e => e.getField("q_mean")).as(s"_c_$tag"))
    }
    cents(oldDf, "old").join(cents(newDf, "new"), Seq("label"), "full")
      .select(col("label"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        round(graft.functions.GraftFunctions.cosineSim(oldDf.sparkSession,
          col("_c_old"), col("_c_new")), roundTo).as("cos_sim"))
      .withColumn("shift", round(lit(1.0) - col("cos_sim"), roundTo))
  }
}
