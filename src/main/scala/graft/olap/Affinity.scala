package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity mining: association rules over co-occurring
  * items — the "customers who bought A also bought B" primitive behind
  * cross-sell panels and substitution analysis. The co-purchase PAIR
  * machinery exists elsewhere for dedup demos; this adds the rule
  * semantics (directed antecedent → consequent with support /
  * confidence / lift) as a first-class operator.
  */
object Affinity {

  /** Pairwise association rules `a → b` with
    * `support = n_ab / n_baskets`, `confidence = n_ab / n_a`,
    * `lift = n_baskets·n_ab / (n_a·n_b)` — every metric a single
    * division of exact integer counts, so the whole report is
    * deterministic with no fold-order caveat.
    *
    * Scale shape: items dedup to (basket, item); the within-basket
    * self-join is the one quadratic surface, O(Σ basket²) by the
    * market-basket contract (retail baskets are small) and HARD-capped
    * by `maxBasket` — oversized baskets (a wholesale order, a bot
    * cart) are dropped entirely before pairing, the same bounding
    * discipline as the LSH bucket cap. Counts reduce map-side;
    * the basket total rides in as one broadcast row; the final cut is
    * a deterministic total order (rounded lift DESC, a, b) → `topK`.
    *
    * Output: `(a, b, n_ab, n_a, n_b, n_baskets, support, confidence,
    * lift)`, fractions rounded to `roundTo`. */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minCount: Long = 2,
                       minConfidence: Double = 0.0, topK: Int = 100,
                       maxBasket: Int = 1000,
                       roundTo: Int = 6): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      "minConfidence must be in [0, 1]")
    require(topK >= 1 && maxBasket >= 2, "topK >= 1 and maxBasket >= 2")
    val raw = baskets.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .filter(col("_i").isNotNull && col("_b").isNotNull)
    // ONE exchange builds the deduped, capped basket item-sets:
    // collect_set dedups (basket, item) with map-side partial
    // aggregation where the earlier formulation paid a global
    // distinct, a basket-size groupBy AND a join back; the ≤ maxBasket
    // cap contract is unchanged (size of the set == distinct items).
    val basketsArr = raw.groupBy(col("_b"))
      .agg(collect_set(col("_i")).as("_is"))
      .filter(size(col("_is")) <= maxBasket)
    val nBaskets = basketsArr.agg(count(lit(1)).as("n_baskets"))
    val itemCnt = basketsArr.select(explode(col("_is")).as("_i"))
      .groupBy(col("_i")).agg(count(lit(1)).as("_ni"))
    // ordered in-basket pairs straight off the set arrays (two narrow
    // generators) — the basket SELF-JOIN this replaces shuffled the
    // item table twice for the same rows; the quadratic surface is
    // identical (bounded by the basket contract and the cap).
    val pairs = basketsArr
      .select(explode(col("_is")).as("a"), col("_is"))
      .select(col("a"), explode(col("_is")).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(itemCnt.select(col("_i").as("a"), col("_ni").as("n_a")), "a")
      .join(itemCnt.select(col("_i").as("b"), col("_ni").as("n_b")), "b")
      .crossJoin(broadcast(nBaskets))
      .withColumn("confidence", col("n_ab").cast("double") / col("n_a"))
      .filter(col("confidence") >= minConfidence)
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_baskets"),
        round(col("n_ab").cast("double") / col("n_baskets"), roundTo)
          .as("support"),
        round(col("confidence"), roundTo).as("confidence"),
        // cast BEFORE multiplying: long*long products overflow silently
        // at warehouse counts (and diverge from the HUGEINT oracle);
        // double products are exact below 2^53 and deterministic above
        round(col("n_baskets").cast("double") * col("n_ab") /
          (col("n_a").cast("double") * col("n_b")), roundTo).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(topK)
  }
}
