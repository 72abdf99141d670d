package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Layout

/** Z-order layout: Morton-code bit exactness against a reference
  * implementation, the multi-column clustering win over a linear sort
  * (the file-skipping proxy), and bucketization. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave, independent formulation. */
  private def mortonRef(dims: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- dims.indices) {
      val bit = (dims(j) >> i) & 1L
      z |= bit << (i * dims.size + j)
    }
    z
  }

  test("zValueN matches the reference interleave on seeded random input") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select($"a", $"b",
        Layout.zValue($"a", $"b", 16).as("z")).collect()
    got2.foreach { r =>
      assert(r.getLong(2) == mortonRef(Seq(r.getLong(0), r.getLong(1)), 16))
    }
    val got3 = df.select($"a", $"b", $"c",
        Layout.zValueN(Seq($"a", $"b", $"c"), 16).as("z")).collect()
    got3.foreach { r =>
      assert(r.getLong(3) ==
        mortonRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 16))
    }
  }

  test("zValueN masks negatives/overflow to the low bits (total function)") {
    val df = Seq((-1L, 5L), (1L << 40, 3L)).toDF("a", "b")
    val got = df.select(Layout.zValue($"a", $"b", 8).as("z")).collect()
    assert(got(0).getLong(0) == mortonRef(Seq(255L, 5L), 8))
    assert(got(1).getLong(0) == mortonRef(Seq(0L, 3L), 8))
  }

  test("z-order clusters BOTH dimensions; linear sort only the leading one") {
    // 32×32 grid; 8 output partitions stand in for 8 parquet files
    val grid = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    def avgRange(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val r = df.select(spark_partition_id().as("pid"), col(c))
        .groupBy($"pid").agg((max(col(c)) - min(col(c))).as("rng"))
        .agg(avg($"rng")).head.getDouble(0)
      r
    }
    val z = Layout.zOrder(grid, Seq("a", "b"), bits = 5, partitions = Some(8))
      .cache()
    val linear = grid.repartitionByRange(8, $"a", $"b")
      .sortWithinPartitions($"a", $"b").cache()
    try {
      // both layouts cluster the leading dimension
      assert(avgRange(z, "a") < 16.0 && avgRange(linear, "a") < 16.0)
      // only z-order clusters the second: a file-skipping scan on b
      // touches ~range/32 of the z files but every linear file
      assert(avgRange(z, "b") < 16.0,
        s"z layout should bound b-ranges, got ${avgRange(z, "b")}")
      assert(avgRange(linear, "b") > 24.0,
        s"linear layout cannot bound b-ranges, got ${avgRange(linear, "b")}")
    } finally { z.unpersist(); linear.unpersist() }
  }

  test("zOrder preserves rows and drops the scratch column") {
    val df = Seq((1L, 2L, "x"), (3L, 4L, "y")).toDF("a", "b", "payload")
    val out = Layout.zOrder(df, Seq("a", "b"), bits = 4, partitions = Some(2))
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
  }

  test("minMaxBucket: full range maps to [0, 2^bits), constants to 0") {
    val df = Seq((0.0, 7.0), (50.0, 7.0), (100.0, 7.0)).toDF("v", "k")
    val out = Layout.minMaxBucket(df, Seq("v", "k"), bits = 8)
      .select($"v", $"v_zb", $"k_zb").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out(0) == ((0.0, 0L, 0L)))
    assert(out(1) == ((50.0, 127L, 0L))) // floor(0.5 * 255)
    assert(out(2) == ((100.0, 255L, 0L)))
  }

  test("minMaxBucket guards its output columns") {
    intercept[IllegalArgumentException] {
      Layout.minMaxBucket(Seq((1.0, 2L)).toDF("v", "v_zb"), Seq("v"), 8)
    }
  }

  test("sharded export: one dir per shard, bounded files, manifest == input (x66)") {
    import graft.warehouse.Export
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val rows = (0L until 100L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val mani = Export.writeShards(spark, rows, "id", dir, nShards = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact manifest: 25 rows per shard, key aggregates hand-computable
    (0 until 4).foreach { sh =>
      val keys = (0L until 100L).filter(_ % 4 == sh)
      assert(mani(sh) == ((keys.size.toLong, keys.sum, keys.min, keys.max)))
    }
    // physical layout: one shard=N dir each, file count O(nShards) not
    // O(tasks x nShards) thanks to the pre-write repartition
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq == (0 until 4).map(i => s"shard=$i"))
    (0 until 4).foreach { sh =>
      val files = new java.io.File(s"$dir/shard=$sh").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"shard $sh has $files files, expected 1")
    }
    // re-export is deterministic: same manifest
    val again = Export.writeShards(spark, rows.repartition(7), "id", dir, 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == mani)
  }
}
