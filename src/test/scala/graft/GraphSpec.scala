package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Graph

/** Graph primitives — structural laws the x76/x77 value oracles can't
  * express: PageRank mass conservation and ordering on known
  * topologies, triangle counts on closed-form graphs, and
  * partitioning-independence (the distributed execution must not leak
  * into the result beyond the documented rounding grain). */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)], cols: (String, String)) =
    pairs.toDF(cols._1, cols._2)

  test("PageRank on a star graph: the center out-ranks every leaf, " +
    "total mass stays in (0, 1]") {
    // 8 leaves all pointing at node 0; node 0 dangles (mass leaks)
    val edges = edgesDf((1L to 8L).map(_ -> 0L), ("src", "dst"))
    val ranks = Graph.pageRank(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val center = ranks(0L)
    (1L to 8L).foreach(l => assert(center > ranks(l) * 4,
      s"center $center vs leaf ${ranks(l)}"))
    val mass = ranks.values.sum
    assert(mass > 0 && mass <= 1.0 + 1e-9, s"mass $mass")
    // leaves are symmetric: identical ranks
    assert((1L to 8L).map(ranks).distinct.size == 1)
  }

  test("PageRank on a directed cycle is exactly uniform at every step") {
    val n = 5L
    val edges = edgesDf((0L until n).map(i => i -> ((i + 1) % n)), ("src", "dst"))
    val ranks = Graph.pageRank(edges, iterations = 4)
      .collect().map(_.getDouble(1))
    // cycle: inflow == own rank each step, so uniform 1/n is a fixpoint
    ranks.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12, s"rank $r"))
  }

  test("PageRank is partitioning-independent at the 8-dp grain") {
    val edges = Tables(spark, TestSpark.sf, "lineitem")
      .join(Tables(spark, TestSpark.sf, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    def run(e: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(e, iterations = 2)
        .select(col("node"), round(col("rank"), 8).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(edges)
    val b = run(edges.repartition(17, col("dst")))
    assert(a == b, "PageRank result depends on partitioning beyond 8 dp")
  }

  test("triangle count: K4 has 4, K5 has 10, a path has 0, and a " +
    "triangle with a pendant has 1") {
    def complete(n: Long) = edgesDf(
      (for (a <- 0L until n; b <- a + 1 until n) yield (a, b)), ("a", "b"))
    assert(Graph.triangleCount(complete(4)).head.getLong(2) == 4L)
    assert(Graph.triangleCount(complete(5)).head.getLong(2) == 10L)
    val path = edgesDf(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L), ("a", "b"))
    assert(Graph.triangleCount(path).head.getLong(2) == 0L)
    val pendant = edgesDf(Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 3L), ("a", "b"))
    val row = Graph.triangleCount(pendant).head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((4L, 4L, 1L)))
  }

  test("triangle count: degree orientation beats the hub blowup — a " +
    "1000-leaf star counts 0 without a quadratic wedge set") {
    // naive wedge-at-every-node would enumerate C(1000,2) ≈ 500k pairs
    // at the hub; orientation points every edge INTO the hub, so the
    // oriented out-degree of the hub is 0 and the wedge set is empty
    val star = edgesDf((1L to 1000L).map(l => (0L, l)), ("a", "b"))
    val plan = Graph.triangleCount(star).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(Graph.triangleCount(star).head.getLong(2) == 0L)
  }
}
