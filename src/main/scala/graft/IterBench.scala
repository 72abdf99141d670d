package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iterative-operator lineage diagnostic: times PageRank at a given
  * iteration count with and without in-operator checkpointing,
  * separating plan/ANALYSIS cost (forced via
  * `queryExecution.executedPlan`) from execution.
  *
  * The unrolled power-iteration plan grows linearly with iterations, so
  * Catalyst's analyze/optimize work grows super-linearly with it (each
  * rule pass walks a bigger tree); `checkpointEvery` flattens that by
  * restarting the plan from a staged parquet scan. This tool produced
  * the NOTES numbers for that claim:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.IterBench /root/testdata/sf0.1 20 5"
  *                                                         (dir, iterations, every)
  *
  * Two measurement pitfalls this tool had to dodge (kept here because
  * they generalize):
  *  - `count()` is NOT a valid execution probe for pageRank: its
  *    rank-producing joins preserve left cardinality, so the optimizer
  *    deletes the whole iteration pipeline under a count. `sum(rank)`
  *    forces the real computation.
  *  - the edge list must be STAGED TO PARQUET, not `persist()`ed: an
  *    InMemoryRelation input makes the iterative multi-join plan ~5×
  *    slower than the identical parquet scan (measured 12.5 s vs 3.1 s
  *    for a 5-iteration sum at sf0.1 — cache scans lack the file-scan
  *    stats the planner uses to broadcast the small sides). Same
  *    lesson as the x87 recursive-CTE sibling staging.
  */
object IterBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iterations = if (args.length > 1) args(1).toInt else 20
    val every = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-iterbench")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val staging = java.nio.file.Files.createTempDirectory("graft-iterbench")
        .toString
      Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
        .write.mode("overwrite").parquet(staging + "/edges")
      val edges = spark.read.parquet(staging + "/edges")
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // JVM/codegen warm-up so the ckpt=0 leg doesn't eat it
      graft.ext.Graph.pageRank(edges, 2).agg(sum(col("rank"))).collect()
      for (ckpt <- Seq(0, every)) {
        val (df, build) = time(graft.ext.Graph.pageRank(edges, iterations,
          checkpointEvery = ckpt, stagingDir = Some(staging)))
        // analysis = forcing the physical plan of the final iterate;
        // with checkpointing, part of total cost moved INSIDE the loop
        // (each truncation runs its own small analyze+exec), which
        // `build` captures — compare the build+analyze+exec totals
        val (_, analyze) = time(df.queryExecution.executedPlan)
        val (s, exec) = time(df.agg(sum(col("rank"))).collect()(0).getDouble(0))
        println(f"pageRank iterations=$iterations checkpointEvery=$ckpt: " +
          f"build=$build%.2fs analyze=$analyze%.2fs exec=$exec%.2fs mass=$s%.6f")
      }
    } finally spark.stop()
  }
}
