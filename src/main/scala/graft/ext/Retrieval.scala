package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval verbs: fusing independently-produced rankings of
  * the same corpus (lexical BM25, dense ANN, recency, ...) into one
  * list per query. This is the serving-side counterpart of the ANN and
  * BM25 operators in [[Similarity]] / [[TextAnalysis]] — a RAG or
  * hard-negative-mining pipeline rarely ships a single retriever's
  * ranking; it fuses several and trains on the fused order.
  *
  * Scale design: every stage is a REDUCING aggregate over keys the
  * upstream retrievers already bounded. Inputs are per-query candidate
  * lists (top hundreds per query per source, never the corpus), so the
  * three exchanges — (source, query) for ranking, (query, doc) for
  * fusion, (query) for the final cut — each carry at most
  * `perSourceK · |queries| · |sources|` rows, independent of corpus
  * size. Per-source ranking and the final cut both use the native
  * reducing top-k heap ([[graft.functions.TopKByDouble]]), not a
  * window: map tasks ship at most k pairs per group, and no rewrite
  * rule needs to be loaded for the plan to avoid a full sort.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): each source
    * ranks candidates per query; a candidate's fused score is
    * `Σ_sources 1 / (k0 + rank_source)`. Rank-based fusion needs no
    * score calibration between sources — the reason RRF is the default
    * hybrid-retrieval combiner.
    *
    * `sources` are scored frames `(queryCol, docCol, scoreCol)` — raw
    * retriever scores, NOT ranks; ranking happens here so every source
    * gets the same deterministic tie rule (score DESC, doc ASC). Each
    * source is cut to its `perSourceK` best candidates per query before
    * fusion (the standard RRF contract: a source only contributes ranks
    * it would actually serve). NULL scores are incomparable and
    * dropped, like NULL sims in the ANN path.
    *
    * Determinism: the fused sum folds source contributions in source
    * order (`aggregate` over the (source, rank)-sorted struct list), so
    * the double accumulation order is a pure function of the row, then
    * rounds to `roundTo` before the final ranking; remaining ties break
    * on doc id. Bit-identical cross-engine by the house fold rule.
    *
    * Output: `(queryCol, rank, docCol, rrf, n_sources)` — `rank` is the
    * fused 1-based position (≤ `topK`), `n_sources` how many sources
    * ranked the doc.
    */
  def rrfFuse(sources: Seq[DataFrame], queryCol: String, docCol: String,
              scoreCol: String, k0: Int = 60, perSourceK: Int = 100,
              topK: Int = 10, roundTo: Int = 6): DataFrame = {
    require(sources.nonEmpty, "rrfFuse needs at least one source")
    require(k0 > 0 && perSourceK > 0 && topK > 0,
      "k0, perSourceK and topK must be positive")
    val spark = sources.head.sparkSession
    import graft.functions.GraftFunctions.topKBy

    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("_src"), col(queryCol).as("_q"),
        col(docCol).cast("long").as("_doc"),
        col(scoreCol).cast("double").as("_score"))
    }.reduce(_ unionByName _).filter(col("_score").isNotNull)

    // per-(source, query) rank via the reducing heap: ties score DESC,
    // doc ASC — the heap's native order, same as every ANN ranking here
    val ranked = tagged.groupBy(col("_src"), col("_q"))
      .agg(topKBy(spark, col("_score"), col("_doc"), perSourceK).as("_top"))
      .select(col("_src"), col("_q"),
        posexplode(col("_top")).as(Seq("_r0", "_t")))
      .select(col("_src"), col("_q"), col("_t.value").as("_doc"),
        (col("_r0") + 1).cast("long").as("_rank"))

    // fuse: fold 1/(k0 + rank) in source order (≤ 1 rank per source per
    // (query, doc), so the (source, rank) sort IS the source order)
    val fused = ranked.groupBy(col("_q"), col("_doc"))
      .agg(collect_list(struct(col("_src"), col("_rank"))).as("_rs"))
      .select(col("_q"), col("_doc"),
        round(aggregate(array_sort(col("_rs")), lit(0.0),
          (acc, r) => acc + lit(1.0) /
            (lit(k0.toDouble) + r.getField("_rank").cast("double"))),
          roundTo).as("_rrf"),
        size(col("_rs")).cast("long").as("_n_sources"))

    // final cut: same heap; n_sources rides along by re-joining the
    // (tiny) kept set back to the fused frame on (query, doc)
    val kept = fused.groupBy(col("_q"))
      .agg(topKBy(spark, col("_rrf"), col("_doc"), topK).as("_top"))
      .select(col("_q"), posexplode(col("_top")).as(Seq("_r0", "_t")))
      .select(col("_q"), (col("_r0") + 1).cast("long").as("rank"),
        col("_t.value").as("_doc"), col("_t.key").as("rrf"))
    kept.join(fused.select(col("_q"), col("_doc"), col("_n_sources")),
        Seq("_q", "_doc"))
      .select(col("_q").as(queryCol), col("rank"), col("_doc").as(docCol),
        col("rrf"), col("_n_sources").as("n_sources"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein, SIGIR
    * 1998): per query, greedily pick `k` candidates maximizing
    * `λ·rel − (1−λ)·max_{s ∈ selected} cos(cand, s)` — the diversity
    * re-rank between retrieval and serving (and the diverse-subset
    * sampler for training data: high-relevance, mutually-dissimilar
    * examples).
    *
    * Greedy selection is inherently sequential PER QUERY, but queries
    * are independent — so the operator groups each query's (bounded,
    * upstream-ANN-cut) candidate list into one row and runs the whole
    * greedy fold as a NARROW higher-order expression over that row: no
    * UDF, no driver loop, no per-step shuffle; one exchange total (the
    * groupBy), O(k·n·(k·d)) compute per query with n, k, d all bounded
    * by the serving contract, never by corpus size.
    *
    * Determinism: pairwise sims round to `roundTo` before the max, and
    * argmax ties break on SMALLEST id via the (score, -id) struct max —
    * the same total order the DuckDB replay's sorted fold uses, so
    * selection is bit-identical cross-engine. NULL rel or emb rows are
    * dropped up front (incomparable); NULL sims (zero-norm vectors)
    * fall out of the max like the ANN family.
    *
    * Output: `(queryCol, step, idCol, mmr)` — `step` is the 1-based
    * selection order, `mmr` the (rounded) score the pick won with.
    */
  def mmrSelect(candidates: DataFrame, queryCol: String, idCol: String,
                embCol: String, relCol: String, lambdaWeight: Double = 0.5,
                k: Int = 10, roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambdaWeight >= 0.0 && lambdaWeight <= 1.0,
      "lambdaWeight must be in [0, 1]")
    val spark = candidates.sparkSession
    def cos(a: Column, b: Column): Column =
      round(graft.functions.GraftFunctions.cosineSim(spark, a, b), roundTo)
    def f(c: Column, name: String): Column = c.getField(name)

    val grouped = candidates
      .filter(col(relCol).isNotNull && col(embCol).isNotNull)
      .groupBy(col(queryCol).as("_q"))
      .agg(collect_list(struct(
        lit(0.0).as("score"), (-col(idCol)).cast("long").as("nid"),
        col(idCol).cast("long").as("id"), col(relCol).cast("double").as("rel"),
        col(embCol).as("emb"))).as("_cands"))

    val sel = aggregate(
      sequence(lit(1), lit(k)),
      // correctly-typed empty selection: filter-all-out of the candidate
      // array (array().cast(...) would need the struct DDL spelled twice)
      filter(col("_cands"), _ => lit(false)),
      (sel, _) => {
        val remaining = filter(col("_cands"), c =>
          !array_contains(transform(sel, s => f(s, "id")), f(c, "id")))
        val scored = transform(remaining, c => struct(
          (lit(lambdaWeight) * f(c, "rel") - lit(1.0 - lambdaWeight) *
            coalesce(array_max(transform(sel,
              s => cos(f(c, "emb"), f(s, "emb")))), lit(0.0))).as("score"),
          f(c, "nid").as("nid"), f(c, "id").as("id"),
          f(c, "rel").as("rel"), f(c, "emb").as("emb")))
        when(size(remaining) > 0,
          concat(sel, array(array_max(scored)))).otherwise(sel)
      })

    grouped.select(col("_q"), posexplode(sel).as(Seq("_s0", "_t")))
      .select(col("_q").as(queryCol),
        (col("_s0") + 1).cast("long").as("step"),
        col("_t.id").as(idCol), round(col("_t.score"), roundTo).as("mmr"))
  }

  /** Ranked-retrieval evaluation against graded judgments (qrels):
    * per query, nDCG@k, MRR, AP@k, precision@k, recall@k — the
    * trec_eval battery that closes the retrieval loop (BM25 / ANN /
    * RRF produce rankings; this scores them, and the scores gate which
    * retriever's output feeds hard-negative mining or RAG serving).
    *
    * `run` is a scored candidate frame `(queryCol, docCol, scoreCol)`
    * — bounded per query by the upstream retriever's cut, never the
    * corpus; ranking happens here with the house tie rule (score DESC,
    * doc ASC) via the reducing top-k heap, so map tasks ship at most
    * `k` rows per query and the plan needs no window sort. `qrels` is
    * `(queryCol, docCol, gradeCol)` with grade > 0 = relevant (graded
    * gains `2^g − 1`); human judgment sets are bounded by contract.
    *
    * Conventions: MRR is 0 when no relevant doc is ranked (not null —
    * the query WAS served); AP@k divides by min(n_rel, k) so a perfect
    * head is 1.0; recall/AP/nDCG are null for queries with no judged
    * relevant docs (undefined, flagged by n_rel = 0 rather than
    * scored). Judged queries the retriever returned NOTHING for score
    * zeros rather than vanishing (the trec_eval -c rule — dropping
    * them would inflate macro-averages exactly on the worst
    * failures). Ranks from the heap are dense 1..n, so rank == position
    * in the collected array and the running-precision scan is a
    * bounded `slice`/`filter` per element (O(k²) narrow work).
    *
    * Determinism: DCG / ideal-DCG / AP terms each involve one ln and
    * one divide per element (correctly rounded, x62 precedent) and
    * fold in rank order (position-ordered house rule), then round to
    * `roundTo`. Output `(queryCol, n_rel, hits, precision_at_k,
    * recall_at_k, mrr, ap, ndcg)`. */
  def evalMetrics(run: DataFrame, qrels: DataFrame, queryCol: String,
                  docCol: String, scoreCol: String, gradeCol: String,
                  k: Int = 10, roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = run.sparkSession
    import graft.functions.GraftFunctions.topKBy
    def gain(g: Column): Column = pow(lit(2.0), g) - lit(1.0)
    def log2(x: Column): Column = log(x) / log(lit(2.0))

    val ranked = run.filter(col(scoreCol).isNotNull)
      .select(col(queryCol).as("_q"), col(docCol).cast("long").as("_doc"),
        col(scoreCol).cast("double").as("_score"))
      .groupBy(col("_q"))
      .agg(topKBy(spark, col("_score"), col("_doc"), k).as("_top"))
      .select(col("_q"), posexplode(col("_top")).as(Seq("_r0", "_t")))
      .select(col("_q"), (col("_r0") + 1).cast("long").as("_rank"),
        col("_t.value").as("_doc"))

    val rels = qrels.filter(col(gradeCol).isNotNull && col(gradeCol) > 0)
      .select(col(queryCol).as("_q"), col(docCol).cast("long").as("_doc"),
        col(gradeCol).cast("double").as("_grade"))

    // judged totals + ideal DCG over each query's k best grades; the
    // group exists only with ≥ 1 relevant row, so the grade list is
    // never empty (no descending-sequence pitfall)
    val ideal = rels.groupBy(col("_q"))
      .agg(count(lit(1)).as("_n_rel"),
        slice(reverse(array_sort(collect_list(col("_grade")))), 1, k)
          .as("_gs"))
      .select(col("_q"), col("_n_rel"),
        aggregate(zip_with(col("_gs"),
            sequence(lit(1), size(col("_gs"))),
            (g, i) => gain(g) / log2(i.cast("double") + lit(1.0))),
          lit(0.0), (acc, x) => acc + x).as("_idcg"))

    val perq = ranked.join(rels, Seq("_q", "_doc"), "left")
      .withColumn("_grade", coalesce(col("_grade"), lit(0.0)))
      .groupBy(col("_q"))
      .agg(sort_array(collect_list(struct(col("_rank"), col("_grade"))))
        .as("_a"))
      .select(col("_q"),
        size(filter(col("_a"), e => e.getField("_grade") > 0))
          .cast("long").as("_hits"),
        aggregate(col("_a"), lit(0.0), (acc, e) =>
          acc + gain(e.getField("_grade")) /
            log2(e.getField("_rank").cast("double") + lit(1.0))).as("_dcg"),
        array_min(transform(filter(col("_a"), e => e.getField("_grade") > 0),
          e => e.getField("_rank"))).as("_first"),
        // AP numerator: Σ over relevant positions of precision@rank,
        // folded in rank order (rank == array position — dense heap)
        aggregate(transform(col("_a"), e =>
            when(e.getField("_grade") > 0,
              size(filter(slice(col("_a"), lit(1),
                  e.getField("_rank").cast("int")),
                x => x.getField("_grade") > 0)).cast("double") /
                e.getField("_rank").cast("double")).otherwise(lit(0.0))),
          lit(0.0), (acc, x) => acc + x).as("_apnum"))

    // FULL join: a query with judged relevant docs but NO scored run
    // rows must score zeros, not vanish — dropping it would inflate any
    // macro-average exactly on the retriever's worst failures (the
    // trec_eval -c rule)
    val hits = coalesce(col("_hits"), lit(0L))
    perq.join(ideal, Seq("_q"), "full")
      .select(col("_q").as(queryCol),
        coalesce(col("_n_rel"), lit(0L)).as("n_rel"),
        hits.as("hits"),
        round(hits.cast("double") / k, roundTo).as("precision_at_k"),
        round(when(col("_n_rel") > 0,
          hits.cast("double") / col("_n_rel")), roundTo)
          .as("recall_at_k"),
        round(when(col("_first").isNotNull, lit(1.0) / col("_first"))
          .otherwise(lit(0.0)), roundTo).as("mrr"),
        round(when(col("_n_rel") > 0, coalesce(col("_apnum"), lit(0.0)) /
          least(col("_n_rel").cast("double"), lit(k.toDouble))), roundTo)
          .as("ap"),
        round(when(col("_idcg") > 0,
          coalesce(col("_dcg"), lit(0.0)) / col("_idcg")), roundTo)
          .as("ndcg"))
  }
}
