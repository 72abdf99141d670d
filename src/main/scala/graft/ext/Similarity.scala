package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `ArrayType(FloatType)` columns —
  * north-star extension (BASELINE.json "north_star"; PAPERS.md top-k
  * similarity corpus).
  *
  * All kernels are built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — no UDFs, no Python — so they
  * inline into whole-stage codegen. Arithmetic is double-precision with
  * left-to-right summation (deterministic, oracle-matchable).
  *
  * Scale design:
  *  - Brute-force top-k: one narrow pass + TakeOrderedAndProject (only k
  *    rows cross the final exchange). Right answer for one query vector.
  *  - For query *batches* at 100 TB: `lshBucket` buckets vectors by
  *    random-hyperplane signs (deterministic seed). Bucketing turns the
  *    all-pairs cross join into a per-bucket join — the classic
  *    sub-linear ANN trade (recall vs probes). Multi-probe = union of
  *    neighbor buckets (Hamming-1). At cluster scale, write the bucketed
  *    table `partitionBy(bucket)` so probes prune partitions.
  */
object Similarity {

  /** Cast a float array to double for stable, oracle-matchable math. */
  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Kernel-ready vector column: float/double arrays pass through (the
    * kernels read them directly); other numeric arrays get the cast
    * transform the old HOF paths applied — so the kernel-backed APIs
    * accept everything the portable ones did. */
  private[graft] def kernelVector(df: DataFrame, embCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(embCol).dataType match {
      case ArrayType(FloatType | DoubleType, _) => col(embCol)
      case ArrayType(_, _) => asDouble(col(embCol))
      case other => throw new IllegalArgumentException(
        s"$embCol must be an array column, got ${other.catalogString}")
    }
  }

  /** Dot product — left-to-right double summation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays — sqrt(na·nb) association, the
    * exact form the DuckDB oracle computes. Degenerate inputs (empty or
    * zero-norm vectors) yield NULL: under ANSI mode (Spark 4 default) an
    * unguarded divide would THROW on the first bad vector and kill the
    * job; NULL is the survivable semantics for a data pipeline. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a) * dot(b, b))
    when(denom === 0.0, lit(null)).otherwise(dot(a, b) / denom)
  }

  /** Literal column for a query vector. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Brute-force cosine top-k against one query vector: the exact baseline.
    * Plans as scan → project → TakeOrderedAndProject; no shuffle of the
    * full table. Ordering ties broken by id for determinism. Uses the
    * native fused kernel ([[graft.functions.CosineSimilarity]]) — reads
    * float32 directly, zero allocation, bit-identical to the HOF form. */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     query: Seq[Double], k: Int, roundTo: Int = 6): DataFrame =
    df.select(col(idCol),
        round(graft.functions.GraftFunctions.cosineSim(df.sparkSession,
          col(embCol), vecLit(query)), roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (fixed seed → reproducible
    * buckets across runs/clusters, no fitted state to ship). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign(v · plane_i). Cosine-similar vectors
    * collide with high probability (random hyperplane LSH).
    *
    * This is the PORTABLE spelling (what the inlined-literal DuckDB
    * oracles mirror); the production paths ([[lshTopK]], the x12 query)
    * ride the fused [[graft.functions.LshBucket64]] kernel — one
    * compiled pass instead of one interpreted dot per plane, identical
    * bits (FunctionsSpec parity). */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, vecLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: search only the query's bucket (plus Hamming-1
    * neighbor buckets when `multiProbe`), then exact-rank within. Trades
    * recall for a |bucket|/|table| fraction of the scan at 100 TB. */
  def lshTopK(df: DataFrame, embCol: String, idCol: String, query: Seq[Double],
              k: Int, nPlanes: Int = 8, multiProbe: Boolean = true,
              seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    val planes = hyperplanes(nPlanes, query.length, seed)
    val qBucket: Long = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: (0 until nPlanes).map(i => qBucket ^ (1L << i))
      else Seq(qBucket)
    df.withColumn("_bucket", graft.functions.GraftFunctions
        .lshBucket64(df.sparkSession, kernelVector(df, embCol), planes))
      .filter(col("_bucket").isin(probes: _*))
      .select(col(idCol),
        round(cosine(asDouble(col(embCol)), vecLit(query)), roundTo).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch (many-to-many) ANN: top-k neighbors for EVERY vector within
    * its bucket, in one pass — the query-batch shape of similarity
    * search at scale (single-query top-k is [[bruteForceTopK]]).
    *
    * One bucket join produces candidate sims (fused native kernel per
    * pair), then ONE aggregation per query id with the native REDUCING
    * top-k heap ([[graft.functions.TopKByDouble]]): each map task keeps
    * at most k pairs per query before the exchange, so shuffle volume
    * is k·|queries| regardless of bucket sizes (a collect_list partial
    * would gather — ship every candidate). No window, no sort of the
    * full candidate set. Deterministic: ties after rounding break on
    * neighbor id. */
  def batchTopK(df: DataFrame, embCol: String, idCol: String,
                bucketCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val sims = bucketedPairSims(df, embCol, idCol, bucketCol, roundTo,
        pairPred = col("id_a") =!= col("id_b"))
      .withColumnRenamed("id_a", "query_id")
      .withColumnRenamed("id_b", "neighbor_id")
      // zero-norm vectors yield NULL sims (see cosine's ANSI note) —
      // incomparable, so excluded from ranking on both engines
      .filter(col("sim").isNotNull)
    sims.groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(df.sparkSession,
        col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rank0", "t")))
      .select(col("query_id"), (col("rank0") + 1).cast("bigint").as("rank"),
        col("t.value").as("neighbor_id"), col("t.key").as("sim"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, bucketed by
    * `bucketCol` (a coarse partitioner: LSH bucket, cluster label, shard).
    * The self-join shuffles both sides ONCE on the bucket key; the
    * quadratic blow-up is confined to each bucket. `idA < idB` halves the
    * pair space and dedupes. */
  def nearDupPairs(df: DataFrame, embCol: String, idCol: String,
                   bucketCol: String, threshold: Double, roundTo: Int = 6): DataFrame =
    bucketedPairSims(df, embCol, idCol, bucketCol, roundTo,
        pairPred = col("id_a") < col("id_b"))
      .filter(col("sim") >= threshold) // null sims (zero-norm) fail this

  /** Semantic decontamination: for every corpus row, the best cosine
    * match in a (small) benchmark set, kept only at or above
    * `threshold` — the embedding-space complement of the n-gram
    * decontamination in [[graft.ext.Decontaminate]] (paraphrased eval
    * leakage that shares no shingles still lands nearby in embedding
    * space). The benchmark side BROADCASTS — at 100 TB the corpus
    * streams through map tasks against an in-memory eval set, the
    * same shape as x20's shingle probe; no shuffle of the corpus.
    *
    * The best match aggregates as max(struct(ROUNDED sim, bench id)),
    * so ties — including exact duplicate benchmark vectors — resolve
    * deterministically and identically cross-engine. Degenerate
    * (zero-norm) vectors produce null sims and are dropped by the
    * threshold. Returns `(idCol, bench_id, sim)`. */
  def flagSemanticMatches(corpus: DataFrame, bench: DataFrame,
                          embCol: String, idCol: String,
                          threshold: Double, roundTo: Int = 6): DataFrame = {
    val b = bench.select(col(idCol).as("bench_id"), col(embCol).as("_emb_b"))
    corpus.select(col(idCol), col(embCol).as("_emb_a"))
      .crossJoin(broadcast(b))
      .select(col(idCol), col("bench_id"),
        round(graft.functions.GraftFunctions.cosineSim(corpus.sparkSession,
          col("_emb_a"), col("_emb_b")), roundTo).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), col("bench_id"))).as("m"))
      .select(col(idCol), col("m.bench_id").as("bench_id"), col("m.sim").as("sim"))
  }

  /** Shared candidate generator for the bucketed pair family: self-join
    * on the bucket key (ONE shuffle), pair predicate, then the fused
    * native kernel — computes dot, |a|² and |b|² in one allocation-free
    * loop per pair, reading float32 directly, bit-identical to the
    * oracle's dot/sqrt(na·nb) float64 form. Output: (id_a, id_b, sim),
    * sim rounded, null for degenerate vectors. */
  /** Hard-negative mining for contrastive training: per query, the k
    * MOST similar neighbors inside a similarity band [loSim, hiSim) —
    * similar enough to be informative negatives, below the near-dup
    * ceiling that would make them false negatives (the standard
    * ANCE/contriever-style mining cut). Same machinery as
    * [[batchTopK]] with the band filter applied BEFORE the per-query
    * reducing heap (band-then-top-k, NOT top-k-then-band: a query
    * whose global top-k is all near-dups must still surface its best
    * in-band candidates).
    *
    * Scale shape: one bucket join (quadratic confined per bucket), the
    * band filter drops candidates before any state accumulates, and
    * the bounded heap ships ≤ k rows per query per map task. Returns
    * `(query_id, rank, neighbor_id, sim)`. */
  def hardNegatives(df: DataFrame, embCol: String, idCol: String,
                    bucketCol: String, k: Int,
                    loSim: Double, hiSim: Double,
                    roundTo: Int = 6, maxBucket: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(loSim < hiSim, s"empty similarity band [$loSim, $hiSim)")
    // maxBucket caps the NEGATIVE-POOL side of the in-bucket pair join —
    // the operator's one quadratic surface (candidates per bucket grow as
    // |bucket|²; the 10× stress read 6.9× once inflation duplicated
    // labels). Mining wants a representative pool, not completeness, so
    // an oversized bucket keeps a deterministic hash-ordered subset as
    // candidates (xxhash64 order — pseudo-random but reproducible, no
    // id-correlated bias) while EVERY query row still mines. Default 0 =
    // off: the oracled x106 surface is unchanged.
    val pool =
      if (maxBucket <= 0) df
      else {
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col(bucketCol))
          .orderBy(xxhash64(col(idCol)), col(idCol))
        df.withColumn("_br", row_number().over(wb))
          .filter(col("_br") <= maxBucket).drop("_br")
      }
    val sims = bucketedPairSims(df, pool, embCol, idCol, bucketCol, roundTo,
        pairPred = col("id_a") =!= col("id_b"))
      .withColumnRenamed("id_a", "query_id")
      .withColumnRenamed("id_b", "neighbor_id")
      // null sims (zero-norm) fail the band on both engines
      .filter(col("sim") >= loSim && col("sim") < hiSim)
    sims.groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(df.sparkSession,
        col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rank0", "t")))
      .select(col("query_id"), (col("rank0") + 1).cast("bigint").as("rank"),
        col("t.value").as("neighbor_id"), col("t.key").as("sim"))
  }

  private def bucketedPairSims(df: DataFrame, embCol: String, idCol: String,
                               bucketCol: String, roundTo: Int,
                               pairPred: Column): DataFrame =
    bucketedPairSims(df, df, embCol, idCol, bucketCol, roundTo, pairPred)

  /** Two-sided form: `df` supplies the `id_a` (query) rows, `poolDf`
    * the `id_b` (candidate) rows — lets callers cap one side of the
    * in-bucket quadratic without losing any query row. */
  private def bucketedPairSims(df: DataFrame, poolDf: DataFrame,
                               embCol: String, idCol: String,
                               bucketCol: String, roundTo: Int,
                               pairPred: Column): DataFrame = {
    val a = df.select(col(bucketCol).as("_bkt"), col(idCol).as("id_a"),
      col(embCol).as("_emb_a"))
    val b = poolDf.select(col(bucketCol).as("_bkt"), col(idCol).as("id_b"),
      col(embCol).as("_emb_b"))
    a.join(b, Seq("_bkt"))
      .filter(pairPred)
      .select(col("id_a"), col("id_b"),
        round(graft.functions.GraftFunctions.cosineSim(df.sparkSession,
          col("_emb_a"), col("_emb_b")), roundTo).as("sim"))
  }
}
