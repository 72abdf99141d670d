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

  test("PageRank with in-operator checkpointing matches the unrolled " +
    "plan at the documented 8-dp grain, iterations=10") {
    val edges = Tables(spark, TestSpark.sf, "lineitem")
      .join(Tables(spark, TestSpark.sf, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    val staging = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
      .toString
    def collect(ckpt: Int) =
      Graph.pageRank(edges, iterations = 10, checkpointEvery = ckpt,
          stagingDir = Some(staging))
        .select(col("node"), round(col("rank"), 8).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a checkpoint snapshots the already-computed iterate; the only
    // execution-visible change is AQE coalescing over the materialized
    // sizes, which reorders double partial sums — the same ≤1-ulp
    // effect as repartitioning, so the 8-dp grain is the right contract
    // (identical to the partitioning-independence test above)
    assert(collect(0) == collect(3), "checkpointing changed PageRank values")
  }

  test("personalized PageRank: closed form on a chain, unreachable " +
    "nodes exactly 0, restart mass pins the source") {
    // 1 → 2 → 3, plus an unreachable island 8 → 9
    val edges = edgesDf(Seq(1L -> 2L, 2L -> 3L, 8L -> 9L), ("src", "dst"))
    val r = Graph.pageRank(edges, iterations = 3, personalized = Some(1L))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val d = 0.85
    // r0 = 1[v=1]; each step: base (1−d) at the source + d·inflow.
    // node1: 0.15 every step (no in-edges). node2: d·r(1) = 0.1275.
    // node3 after ≥2 steps: d·r(2) = 0.85·0.1275 = 0.108375.
    assert(math.abs(r(1L) - (1 - d)) < 1e-12)
    assert(math.abs(r(2L) - d * (1 - d)) < 1e-12)
    assert(math.abs(r(3L) - d * d * (1 - d)) < 1e-12)
    // the island never sees restart mass: exactly zero, not epsilon
    assert(r(8L) == 0.0 && r(9L) == 0.0)
  }

  test("bfsDistances: min-hop distances on a known graph — multi-path " +
    "nodes take the shorter route, cycles terminate, unreachables and " +
    "over-depth nodes are absent") {
    // 0→1→2→3→4 chain, a 0→2 shortcut, a 3→0 back-edge (cycle), and an
    // isolated edge 8→9 unreachable from 0
    val edges = edgesDf(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L,
      0L -> 2L, 3L -> 0L, 8L -> 9L), ("src", "dst"))
    val got = Graph.bfsDistances(edges, source = 0L, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 2 via the shortcut (1 hop, not 2); node 4 is 3 hops — cut
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    val full = Graph.bfsDistances(edges, source = 0L, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // early exit once the frontier empties; the cycle must not loop
    assert(full == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsDistances releases per-level caches: a deep BFS leaves at most " +
    "one persisted frame (the consolidated result), not one per level") {
    val sc = spark.sparkContext
    // a 6-deep chain: deep enough that the per-level persist discipline
    // bites, shallow enough for checkpoint-free mode (whose logical plan
    // doubles per level — deeper runs are what checkpointEvery is for)
    val edges = edgesDf((0L until 6L).map(i => i -> (i + 1)), ("src", "dst"))
    val before = sc.getPersistentRDDs.size
    val out = Graph.bfsDistances(edges, source = 0L, maxDepth = 20)
    assert(out.count() == 7)
    val residue = sc.getPersistentRDDs.size - before
    assert(residue <= 1,
      s"BFS leaked $residue cached frames (expected the single consolidated result)")
    out.unpersist(true)
    assert(sc.getPersistentRDDs.size == before, "unpersist did not release the result")
    // staged mode: zero cached residue — the result is a parquet scan
    val staging = java.nio.file.Files.createTempDirectory("graft-bfs-leak").toString
    val staged = Graph.bfsDistances(edges, source = 0L, maxDepth = 20,
      checkpointEvery = 2, stagingDir = Some(staging))
    assert(staged.count() == 7)
    assert(sc.getPersistentRDDs.size == before,
      "staged BFS must leave no cached frames")
  }

  test("bfsDistances == the recursive-CTE walk (x87 semantics) on the " +
    "co-purchase graph, with and without checkpointing") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .join(Tables(spark, TestSpark.sf, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") * 10000000L + col("l_partkey")).as("sp"))
      .distinct()
    val edges = li.join(li.select(col("c").as("c2"), col("sp")), "sp")
      .filter(col("c") =!= col("c2"))
      .select(col("c").as("src"), col("c2").as("dst")).distinct()
    edges.createOrReplaceTempView("bfs_edges")
    val rec = spark.sql("""
      WITH RECURSIVE rec AS (
        SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
        UNION ALL
        SELECT e.dst AS node, rec.depth + 1 AS depth
        FROM rec JOIN bfs_edges e ON e.src = rec.node
        WHERE rec.depth < 2)
      SELECT node, CAST(min(depth) AS BIGINT) AS hops FROM rec GROUP BY node""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val staging = java.nio.file.Files.createTempDirectory("graft-bfs-ckpt")
      .toString
    def run(ckpt: Int) = Graph.bfsDistances(edges, 1L, 2, checkpointEvery = ckpt,
        stagingDir = Some(staging))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(0) == rec, "BFS diverges from the recursive CTE")
    assert(run(1) == rec, "checkpointed BFS diverges")
    // misconfiguration is loud: checkpointing with nowhere to stage
    // must throw, not silently fall back to a driver-local tmp path
    assertThrows[IllegalArgumentException] {
      Graph.bfsDistances(edges, 1L, 2, checkpointEvery = 1)
    }
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
