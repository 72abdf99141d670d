package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Retrieval

/** Reciprocal-rank fusion against hand-computed expectations. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // two sources ranking docs for one query:
  //   lex:   d1 (s=3.0, rank 1), d2 (s=2.0, rank 2), d3 (s=1.0, rank 3)
  //   dense: d3 (s=0.9, rank 1), d1 (s=0.5, rank 2)  [no d2]
  private lazy val lex = Seq((7L, 1L, 3.0), (7L, 2L, 2.0), (7L, 3L, 1.0))
    .toDF("q", "doc", "score")
  private lazy val dense = Seq((7L, 3L, 0.9), (7L, 1L, 0.5))
    .toDF("q", "doc", "score")

  test("rrfFuse matches the hand-computed fused order and scores") {
    val out = Retrieval.rrfFuse(Seq(lex, dense), "q", "doc", "score",
        k0 = 60, perSourceK = 10, topK = 10)
      .orderBy("rank").collect()
    // d1: 1/61 + 1/62, d3: 1/63 + 1/61, d2: 1/62 (HALF_UP like Spark's round)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6(1.0 / 61 + 1.0 / 62)
    val d3 = r6(1.0 / 63 + 1.0 / 61)
    val d2 = r6(1.0 / 62)
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getLong(4))).toSeq ===
      Seq((1L, 1L, d1, 2L), (2L, 3L, d3, 2L), (3L, 2L, d2, 1L)))
    assert(d1 > d3 && d3 > d2) // the fixture really exercises ordering
  }

  test("rrfFuse ties break on doc id and respect perSourceK") {
    // equal scores everywhere: ranks follow doc id; perSourceK=2 drops
    // doc 3 from both sources entirely
    val src = Seq((1L, 3L, 1.0), (1L, 1L, 1.0), (1L, 2L, 1.0))
      .toDF("q", "doc", "score")
    val out = Retrieval.rrfFuse(Seq(src, src), "q", "doc", "score",
        k0 = 60, perSourceK = 2, topK = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L)) // ranks 1,2
  }

  test("mmrSelect: hand-computed greedy picks — relevance first, then " +
    "diversity beats the higher-relevance near-duplicate") {
    // q=7: d1 rel .9 emb (1,0); d2 rel .8 emb (.9,.1) ~ d1's near-dup;
    // d3 rel .7 emb (0,1) orthogonal. λ=.5: step1 d1 (.45); step2 d3
    // (.35 — d2 scores .5·.8 − .5·cos(d2,d1)=−.096942); step3 d2.
    val cands = Seq(
      (7L, 1L, 0.9, Seq(1.0f, 0.0f)),
      (7L, 2L, 0.8, Seq(0.9f, 0.1f)),
      (7L, 3L, 0.7, Seq(0.0f, 1.0f))
    ).toDF("q", "id", "rel", "emb")
    val out = Retrieval.mmrSelect(cands, "q", "id", "emb", "rel",
      lambdaWeight = 0.5, k = 3).orderBy("step").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    assert(out(0).getDouble(3) == 0.45 && out(1).getDouble(3) == 0.35)
    assert(out(2).getDouble(3) == -0.096942) // .5·.8 − .5·round(cos, 6)
  }

  test("mmrSelect: k beyond the candidate count stops clean; ties pick " +
    "the smallest id; null rel rows are dropped") {
    val cands = Seq(
      (1L, Some(5L), Some(1.0), Some(Seq(1.0f, 0.0f))),
      (1L, Some(4L), Some(1.0), Some(Seq(1.0f, 0.0f))), // tie -> id 4 first
      (1L, Some(9L), None, Some(Seq(0.0f, 1.0f)))       // null rel dropped
    ).toDF("q", "id", "rel", "emb")
    val out = Retrieval.mmrSelect(cands, "q", "id", "emb", "rel",
      lambdaWeight = 0.5, k = 10).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 5L))
  }

  test("plan gates: rrfFuse ranks with reducing heaps (no Window, no " +
    "rank Sort); mmrSelect is exactly one exchange") {
    val fusedPlan = Retrieval.rrfFuse(Seq(lex, dense), "q", "doc", "score",
      k0 = 60, perSourceK = 10, topK = 10)
      .queryExecution.executedPlan.toString
    // ranking via TopKByDouble partials (ObjectHashAggregate), never a
    // window — the rewrite-rule-free guarantee the scale notes promise
    assert(!fusedPlan.contains("Window"), fusedPlan)
    assert(fusedPlan.contains("ObjectHashAggregate"), fusedPlan)

    val cands = Seq((7L, 1L, 0.9, Seq(1.0f, 0.0f)), (7L, 2L, 0.8, Seq(0.9f, 0.1f)))
      .toDF("q", "id", "rel", "emb")
    val mmrPlan = Retrieval.mmrSelect(cands, "q", "id", "emb", "rel",
      lambdaWeight = 0.5, k = 2).queryExecution.executedPlan.toString
    // the whole greedy loop is narrow: the candidate groupBy is the ONLY
    // exchange; no UDF, no per-step shuffle
    assert("Exchange".r.findAllIn(mmrPlan).size == 1, mmrPlan)
    assert(!mmrPlan.contains("Window") && !mmrPlan.contains("BatchEval"),
      mmrPlan)
  }

  test("rrfFuse drops null scores and single-source docs still fuse") {
    val src = Seq((1L, Some(1L), Some(2.0)), (1L, Some(2L), None))
      .toDF("q", "doc", "score")
    val out = Retrieval.rrfFuse(Seq(src), "q", "doc", "score",
      k0 = 60, perSourceK = 10, topK = 10).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L))
  }

  test("evalMetrics: hand-computed nDCG / MRR / AP / P / R at k=3") {
    // ranking d1 > d2 > d3 (d4 cut by k); qrels: d1 g1, d3 g2, d9 g1
    val run = Seq((7L, 1L, 3.0), (7L, 2L, 2.0), (7L, 3L, 1.0),
      (7L, 4L, 0.5)).toDF("q", "doc", "score")
    val qrels = Seq((7L, 1L, 1L), (7L, 3L, 2L), (7L, 9L, 1L))
      .toDF("q", "doc", "grade")
    val r = Retrieval.evalMetrics(run, qrels, "q", "doc", "score", "grade",
      k = 3).head()
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    assert(r.getAs[Long]("n_rel") == 3 && r.getAs[Long]("hits") == 2)
    assert(r.getAs[Double]("precision_at_k") == r6(2.0 / 3))
    assert(r.getAs[Double]("recall_at_k") == r6(2.0 / 3))
    assert(r.getAs[Double]("mrr") == 1.0) // first relevant at rank 1
    // AP: rel at r1 (P=1/1) and r3 (P=2/3), / min(n_rel, k) = 3
    assert(r.getAs[Double]("ap") == r6((1.0 + 2.0 / 3) / 3))
    // DCG = 1/log2(2) + 0 + 3/log2(4); IDCG folds grades [2,1,1]
    val dcg = 1.0 / log2(2) + 3.0 / log2(4)
    val idcg = 3.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(r.getAs[Double]("ndcg") == r6(dcg / idcg))
  }

  test("evalMetrics: unjudged query scores null metrics not zeros; " +
    "relevant-below-k reads mrr 0; ties rank doc ASC") {
    val run = Seq((1L, 5L, 1.0), (1L, 3L, 1.0), (2L, 8L, 9.0))
      .toDF("q", "doc", "score")
    val qrels = Seq((1L, 5L, 1L)).toDF("q", "doc", "grade")
    // k=1: tie at score 1.0 ranks doc 3 first, so query 1's only
    // relevant doc (5) falls below the cut
    val out = Retrieval.evalMetrics(run, qrels, "q", "doc", "score",
        "grade", k = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = out(1L)
    assert(q1.getAs[Long]("hits") == 0 && q1.getAs[Double]("mrr") == 0.0)
    assert(q1.getAs[Double]("recall_at_k") == 0.0 &&
      q1.getAs[Double]("ap") == 0.0)
    // query 2 has NO judged docs: flagged by n_rel=0, undefined metrics
    // are null (not a fake 0 that would drag a macro average)
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_rel") == 0 && q2.isNullAt(q2.fieldIndex("recall_at_k")))
    assert(q2.isNullAt(q2.fieldIndex("ap")) && q2.isNullAt(q2.fieldIndex("ndcg")))
    assert(q2.getAs[Double]("mrr") == 0.0)
  }

  test("plan gate: evalMetrics ranks with the reducing heap — no Window " +
    "operator anywhere in the plan") {
    val run = Seq((1L, 5L, 1.0), (1L, 3L, 0.5)).toDF("q", "doc", "score")
    val qrels = Seq((1L, 5L, 1L)).toDF("q", "doc", "grade")
    val plan = Retrieval.evalMetrics(run, qrels, "q", "doc", "score",
      "grade", k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("evalMetrics: a judged query the retriever returned NOTHING for " +
    "scores zeros instead of vanishing (trec_eval -c)") {
    val run = Seq((1L, 5L, 1.0)).toDF("q", "doc", "score")
    val qrels = Seq((1L, 5L, 1L), (9L, 7L, 2L)).toDF("q", "doc", "grade")
    val out = Retrieval.evalMetrics(run, qrels, "q", "doc", "score",
        "grade", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.contains(9L), "unserved judged query must still report")
    val q9 = out(9L)
    assert(q9.getAs[Long]("n_rel") == 1 && q9.getAs[Long]("hits") == 0)
    assert(q9.getAs[Double]("recall_at_k") == 0.0 &&
      q9.getAs[Double]("ap") == 0.0 && q9.getAs[Double]("ndcg") == 0.0)
    assert(q9.getAs[Double]("mrr") == 0.0)
    // the served query is unaffected
    assert(out(1L).getAs[Double]("recall_at_k") == 1.0)
  }
}
