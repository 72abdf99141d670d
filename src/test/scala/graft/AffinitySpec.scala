package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.olap.Affinity

/** Association-rule mining against hand-computed expectations. */
class AffinitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // b1 {x,y}, b2 {x,y}, b3 {x,z}, b4 {x}, b5 {y,z}
  // n_x=4 n_y=3 n_z=2; n_xy=2 n_xz=1 n_yz=1; 5 baskets
  private lazy val baskets = Seq(
    (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
    (4L, "x"), (5L, "y"), (5L, "z"),
    (1L, "x")) // duplicate row — must dedup before counting
    .toDF("bk", "item")

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  test("associationRules: hand-computed support/confidence/lift, " +
    "duplicates deduped, rounded-lift total-order cut") {
    val out = Affinity.associationRules(baskets, "bk", "item",
        minCount = 1, minConfidence = 0.0, topK = 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == ((2L, 0.4, 0.5, r6(10.0 / 12))))
    assert(out(("y", "x")) == ((2L, 0.4, r6(2.0 / 3), r6(10.0 / 12))))
    assert(out(("x", "z")) == ((1L, 0.2, 0.25, 0.625)))
    assert(out(("z", "x")) == ((1L, 0.2, 0.5, 0.625)))
    assert(out(("y", "z")) == ((1L, 0.2, r6(1.0 / 3), r6(5.0 / 6))))
    assert(out(("z", "y")) == ((1L, 0.2, 0.5, r6(5.0 / 6))))
    // topK=3 cuts on (rounded lift DESC, a, b): the four-way .833333
    // tie resolves lexicographically
    val top = Affinity.associationRules(baskets, "bk", "item",
        minCount = 1, topK = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top.toSeq === Seq(("x", "y"), ("y", "x"), ("y", "z")))
  }

  test("associationRules: minCount and minConfidence bars; maxBasket " +
    "drops the whole oversized basket") {
    val pairs = Affinity.associationRules(baskets, "bk", "item",
        minCount = 2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet === Set(("x", "y"), ("y", "x")))
    val conf = Affinity.associationRules(baskets, "bk", "item",
        minCount = 1, minConfidence = 0.6)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(conf.toSeq === Seq(("y", "x"))) // conf 2/3; every other < .6
    // a wholesale basket {x,y,z,w} would mint new pairs — the cap at 3
    // drops it entirely and the small-basket rules are unchanged
    val withBig = baskets.union(
      Seq((9L, "x"), (9L, "y"), (9L, "z"), (9L, "w")).toDF("bk", "item"))
    val capped = Affinity.associationRules(withBig, "bk", "item",
        minCount = 1, maxBasket = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(!capped.keySet.exists(p => p._1 == "w" || p._2 == "w"))
    assert(capped(("x", "y")) == 2L && capped.size == 6)
  }
}
