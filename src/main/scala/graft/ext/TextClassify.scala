package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable text classification as pure DataFrame programs — the
  * quality/domain/language filter stage of a training-data pipeline
  * (fastText-style usage; reference analog: the notebook's rule-based
  * quality bands, `DuckDB notebook` q09, generalized to a LEARNED
  * classifier). Multinomial naive Bayes with add-α smoothing: simple
  * enough to be engine-portable arithmetic end-to-end (every count is
  * exact, every log-prob fold is position-ordered — the x62 unigram
  * discipline), strong enough for language/domain routing at corpus
  * scale.
  *
  * Scale shape: TRAIN is two aggregations over the tokenized corpus
  * (token×label counts, label totals) plus a vocab×label grid join —
  * the model is a TABLE (persist it like any dimension). APPLY is one
  * tokenize, one join against the model grid on the token key, and one
  * per-(doc, label) ordered fold; labels are few, so candidate rows
  * are n_tokens × |labels|, never corpus². No driver state, no
  * iteration, no RNG.
  */
object TextClassify {

  /** The trained model: `grid` is the COMPLETE (token × label) table
    * `(tok, label, lp)` with lp = ln((c(l,t) + α) / (N_l + α·V));
    * `labels` is `(label, log_prior, lp_unseen)` where lp_unseen is the
    * smoothing floor ln(α / (N_l + α·V)) — grid completeness means
    * apply never needs the floor for in-vocab tokens, and OUT-of-vocab
    * tokens are dropped (standard NB practice: an unknown token
    * carries no class signal). */
  final case class NbModel(grid: DataFrame, labels: DataFrame,
                           private[ext] val cachedCounts: DataFrame) {
    /** Release the cached token×label counts backing the model frames.
      * Call after persisting/staging `grid`+`labels`, or when done —
      * the frames stay CORRECT afterwards (lineage recomputes), they
      * just lose the cache. */
    def unpersist(): Unit = { cachedCounts.unpersist(); () }
  }

  /** Train on `(textCol, labelCol)` rows; null/blank labels and null
    * texts are excluded. α must be positive (Laplace α=1 default). */
  def trainNaiveBayes(df: DataFrame, textCol: String, labelCol: String,
                      alpha: Double = 1.0): NbModel = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val rows = df.filter(col(labelCol).isNotNull &&
        trim(col(labelCol)) =!= "" && col(textCol).isNotNull)
      .select(col(labelCol).as("label"), col(textCol).as("_text"))
    val tok = rows.select(col("label"),
      explode(TextDedup.tokens(col("_text"))).as("tok"))
    // ONE tokenize pass: label totals (N_l = Σ_t c(l,t)) and the vocab
    // both derive from the persisted token×label counts — at corpus
    // scale the counts table is vocab-sized, the corpus is not, so
    // every downstream model frame reads the small cached aggregate
    // instead of re-scanning/re-exploding the text
    val counts = tok.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val labelTotals = counts.groupBy(col("label"))
      .agg(sum(col("c")).as("n_l"))
    val docTotals = rows.groupBy(col("label")).agg(count(lit(1)).as("docs"))
    val vocab = counts.select(col("tok")).distinct()
    val vocabSize = vocab.count()
    val allDocs = rows.count()
    require(allDocs > 0, "empty training set")
    // complete V × L grid: missing (tok, label) cells take c = 0, so the
    // apply join never needs a per-label fallback branch
    val grid = vocab.crossJoin(labelTotals)
      .join(counts, Seq("tok", "label"), "left")
      .select(col("tok"), col("label"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(alpha)) /
          (col("n_l").cast("double") + lit(alpha) * lit(vocabSize.toDouble)))
          .as("lp"))
    val labels = labelTotals.join(docTotals, "label")
      .select(col("label"),
        log(col("docs").cast("double") / lit(allDocs.toDouble)).as("log_prior"),
        log(lit(alpha) / (col("n_l").cast("double") +
          lit(alpha) * lit(vocabSize.toDouble))).as("lp_unseen"))
    NbModel(grid, labels, counts)
  }

  /** Classify every row: `(id, pred, score)` — `pred` the argmax label
    * (ties break toward the lexicographically GREATER label — one rule,
    * stated, replayable in SQL), `score` the winning log-posterior
    * rounded to 6 (position-ordered fold, so the double is
    * reproducible cross-engine; out-of-vocab tokens drop). Documents
    * with NO in-vocab tokens score on priors alone. */
  def classify(model: NbModel, df: DataFrame, textCol: String,
               idCol: String): DataFrame =
    allScores(model, df, textCol, idCol)
      .groupBy(col("id"))
      .agg(max_by(col("label"), struct(col("score"), col("label"))).as("pred"),
        max(struct(col("score"), col("label"))).getField("score").as("_s"))
      .select(col("id"), col("pred"), round(col("_s"), 6).as("score"))

  /** Per-document log-posterior for ONE label — the continuous score a
    * threshold sweep calibrates over (pair with
    * [[graft.olap.Quality.thresholdSweepBinned]]: NB log-posteriors
    * are corpus-cardinality continuous, exactly the regime the binned
    * sweep's lattice bounds). Returns `(id, score)` with the score
    * UNROUNDED — downstream quantization (the sweep's lattice, a
    * calibration bin) must see the raw double; the fold itself is
    * position-ordered, so the value is engine-reproducible anyway.
    * Every input row gets a score (prior-only when no token is
    * in-vocab); an unknown label yields an empty frame, not an error
    * (the label set is data, not schema). */
  def scoreFor(model: NbModel, df: DataFrame, textCol: String,
               idCol: String, label: String): DataFrame =
    allScores(model, df, textCol, idCol)
      .filter(col("label") === label)
      .select(col("id"), col("score"))

  /** The shared apply frame: one row per (document, label) with the
    * full log-posterior `log_prior + Σ_pos lp(token)` as an UNROUNDED
    * position-ordered fold. */
  private def allScores(model: NbModel, df: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    val tok = TextDedup.spreadCompute(
        df.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"),
        posexplode(TextDedup.tokens(col(textCol))).as(Seq("pos", "tok")))
    // in-vocab token rows fan out to |labels| candidates via the grid.
    // The position-ordered fold runs in the native graft_pos_sum kernel
    // — bit-identical to the previous
    // aggregate(array_sort(collect_list(struct(pos, lp))), 0.0, +)
    // spelling (same (pos, lp) sort order, same left-to-right double
    // accumulation — contract pinned in FunctionsSpec) without the
    // per-element interpreted HOF evaluation that made this the most
    // JIT-sensitive shape in the suite.
    val scored = tok.join(model.grid, "tok")
      .groupBy(col("id"), col("label"))
      .agg(graft.functions.GraftFunctions.posOrderedSum(df.sparkSession,
        collect_list(struct(col("pos"), col("lp")))).as("sum_lp"))
    // right join keeps prior-only rows for docs with zero in-vocab
    // tokens (every label still gets a row through the cross join)
    df.select(col(idCol).as("id"))
      .crossJoin(broadcast(model.labels.select(col("label"), col("log_prior"))))
      .join(scored, Seq("id", "label"), "left")
      .select(col("id"), col("label"),
        (col("log_prior") + coalesce(col("sum_lp"), lit(0.0))).as("score"))
  }
}
