package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.{DataSkipping, Layout}
import graft.warehouse.DataSkipping.Band

/** File-level data skipping: manifest stats exactness, range pruning
  * (including the z-order-on-both-dims win), bloom point-lookup pruning
  * with zero false negatives, determinism of the bloom manifest under
  * re-partitioning, and the invariant that skipping NEVER changes
  * results — only which files are read. */
class DataSkippingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-skip-$tag").toString

  /** 32×32 grid with a third payload column; `nfiles` parquet files. */
  private def writeGrid(path: String, zOrdered: Boolean, nfiles: Int = 8): Unit = {
    val grid = (for (a <- 0 until 32; b <- 0 until 32)
      yield (a.toLong, b.toLong, (a * 32 + b).toLong)).toDF("a", "b", "payload")
    val laid =
      if (zOrdered) Layout.zOrder(grid, Seq("a", "b"), bits = 5,
        partitions = Some(nfiles))
      else grid.repartitionByRange(nfiles, $"a").sortWithinPartitions("a")
    laid.write.mode("overwrite").parquet(path)
  }

  test("buildManifest records exact per-file min/max/nulls/rows") {
    val path = tmpDir("manifest")
    Seq((1L, Some(10L)), (5L, None), (9L, Some(-3L)))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(path)
    val m = DataSkipping.buildManifest(spark, path, Seq("k", "v")).collect()
    assert(m.length == 1)
    val r = m.head
    assert(r.getAs[Long]("k_min") == 1L && r.getAs[Long]("k_max") == 9L)
    assert(r.getAs[Long]("v_min") == -3L && r.getAs[Long]("v_max") == 10L)
    assert(r.getAs[Long]("k_nulls") == 0L && r.getAs[Long]("v_nulls") == 1L)
    assert(r.getAs[Long]("n_rows") == 3L)
  }

  test("skipRead equals the full-scan filter and prunes files (z-order)") {
    val path = tmpDir("zorder")
    writeGrid(path, zOrdered = true)
    val manifest = DataSkipping.buildManifest(spark, path, Seq("a", "b"))
    assert(manifest.count() == 8)
    val bands = Seq(Band("a", Some(3L), Some(6L)), Band("b", Some(3L), Some(6L)))

    val selected = DataSkipping.selectFiles(manifest, bands)
    assert(selected.nonEmpty && selected.size < 8,
      s"expected pruning, got ${selected.size} of 8 files")

    val got = DataSkipping.skipRead(spark, path, manifest, bands)
      .orderBy("a", "b").collect()
    val want = spark.read.parquet(path)
      .filter($"a".between(3, 6) && $"b".between(3, 6))
      .orderBy("a", "b").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.length == 16)
  }

  test("z-order prunes on the SECOND dimension; linear sort cannot") {
    val zPath = tmpDir("z2")
    val linPath = tmpDir("lin")
    writeGrid(zPath, zOrdered = true)
    writeGrid(linPath, zOrdered = false)
    val bands = Seq(Band("b", Some(2L), Some(5L))) // predicate on b only
    val zSel = DataSkipping.selectFiles(
      DataSkipping.buildManifest(spark, zPath, Seq("a", "b")), bands)
    val linSel = DataSkipping.selectFiles(
      DataSkipping.buildManifest(spark, linPath, Seq("a", "b")), bands)
    assert(zSel.size < 8, s"z-order should skip some files, read ${zSel.size}")
    assert(linSel.size == 8,
      "linear-on-a layout spans all b values in every file")
    // identical results from both layouts regardless of pruning
    val zRows = DataSkipping.skipRead(spark, zPath,
      DataSkipping.buildManifest(spark, zPath, Seq("a", "b")), bands)
      .orderBy("a", "b").select("a", "b", "payload").collect()
    val linRows = DataSkipping.skipRead(spark, linPath,
      DataSkipping.buildManifest(spark, linPath, Seq("a", "b")), bands)
      .orderBy("a", "b").select("a", "b", "payload").collect()
    assert(zRows.toSeq == linRows.toSeq)
  }

  test("empty selection returns an empty frame with the table schema") {
    val path = tmpDir("empty")
    writeGrid(path, zOrdered = true)
    val manifest = DataSkipping.buildManifest(spark, path, Seq("a"))
    val out = DataSkipping.skipRead(spark, path, manifest,
      Seq(Band("a", Some(1000L), None)))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("a", "b", "payload"))
  }

  test("all-null stat files are pruned for range bands (exact, not lossy)") {
    val path = tmpDir("nulls")
    Seq[(java.lang.Long, String)]((null, "x"), (null, "y")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(path)
    Seq[(java.lang.Long, String)]((5L, "z")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(path + "2")
    // one dir with both files
    val both = tmpDir("nulls-both")
    spark.read.parquet(path).write.mode("append").parquet(both)
    spark.read.parquet(path + "2").write.mode("append").parquet(both)
    val manifest = DataSkipping.buildManifest(spark, both, Seq("k"))
    val sel = DataSkipping.selectFiles(manifest, Seq(Band("k", Some(0L), Some(9L))))
    assert(sel.size == 1, "the all-null file can never match a BETWEEN")
    val got = DataSkipping.skipRead(spark, both, manifest,
      Seq(Band("k", Some(0L), Some(9L)))).select("k", "s").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((5L, "z")))
  }

  test("band requires at least one bound; selectFiles requires a band") {
    intercept[IllegalArgumentException](Band("a", None, None))
    val path = tmpDir("guard")
    writeGrid(path, zOrdered = true)
    val manifest = DataSkipping.buildManifest(spark, path, Seq("a"))
    intercept[IllegalArgumentException](
      DataSkipping.selectFiles(manifest, Seq.empty))
  }

  // ---- bloom point-lookup skipping ----

  test("bloom manifest: no false negatives, pointSkipRead equals IN filter") {
    val path = tmpDir("bloom")
    // keys hashed across files on an unrelated column: every file spans
    // nearly the full key range, so min/max bands cannot separate them
    val n = 4000
    (0 until n).map(i => (i.toLong, (i % 13).toLong)).toDF("k", "grp")
      .repartition(8, $"grp").write.mode("overwrite").parquet(path)
    val mani = DataSkipping.buildBloomManifest(spark, path, "k",
      expectedPerFile = 1024, fpp = 0.01)
    // hash partitioning may leave some of the 8 partitions empty; only
    // non-empty files appear in the manifest
    val total = mani.count()
    assert(total >= 4 && total <= 8)

    val keys = Seq(17L, 999L, 2024L, 3999L)
    val got = DataSkipping.pointSkipRead(spark, path, mani, "k", keys)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == keys.sorted, "every present key must be found (no FNs)")

    // 17 and 999 share grp=4, 2024 has grp=9, 3999 has grp=8 — the 4
    // probe keys live in ≤ 3 files; fpp=1% keeps false-positive files
    // rare, so the selection must stay below the total
    val sel = DataSkipping.selectFilesByKeys(mani, keys)
    assert(sel.size < total, s"bloom should prune, selected ${sel.size} of $total")

    // absent key: result is empty even when a false positive reads a file
    val none = DataSkipping.pointSkipRead(spark, path, mani, "k", Seq(999999L))
    assert(none.count() == 0)
  }

  test("bloom manifest bytes are deterministic under re-partitioning") {
    // NOTE: a post-scan repartition() would blank input_file_name()
    // (InputFileBlockHolder is unset past the exchange) and collapse the
    // groupBy to one "" key — vary the SCAN split size instead, so each
    // file is covered by a different number of partial aggregates while
    // the file attribution stays intact.
    val path = tmpDir("bloom-det")
    (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "grp")
      .repartition(4, $"grp").write.mode("overwrite").parquet(path)
    def bytesByFile(maxPartitionBytes: String): Map[String, Seq[Byte]] = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      try DataSkipping.buildBloomManifest(spark, path, "k",
          expectedPerFile = 1024, fpp = 0.01)
        .collect().map(r =>
          r.getString(0) -> r.getAs[Array[Byte]]("bloom").toSeq).toMap
      finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      }
    }
    val fine = bytesByFile("2048")
    val coarse = bytesByFile("128m")
    assert(fine.size >= 2, "expected a real per-file grouping, not one key")
    assert(fine.keySet.forall(_.nonEmpty),
      "file attribution must survive the aggregation")
    assert(fine == coarse,
      "fixed-size OR-mergeable bitsets must be order/partition independent")
  }

  test("selectFilesByKeys probes blooms in executors and collects file names only") {
    val path = tmpDir("bloom-dist")
    (0 until 1000).map(i => (i.toLong, (i % 5).toLong)).toDF("k", "grp")
      .repartition(4, $"grp").write.mode("overwrite").parquet(path)
    val mani = DataSkipping.buildBloomManifest(spark, path, "k",
      expectedPerFile = 256, fpp = 0.01)
    // capture the query execution selectFilesByKeys actually collects:
    // its plan must carry the bloom probe (executor-side) and project
    // ONLY the file name — i.e. no bitset ever reaches the driver
    @volatile var captured: Option[org.apache.spark.sql.execution.QueryExecution] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.optimizedPlan.toString.toLowerCase.contains("bloomcontainsany"))
          captured = Some(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val sel = DataSkipping.selectFilesByKeys(mani, Seq(3L, 700L))
      assert(sel.nonEmpty)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val qe = captured.getOrElse(fail("bloom-probe query execution not observed"))
      assert(qe.analyzed.output.map(_.name) == Seq("file"),
        "only file names may be collected to the driver")
    } finally spark.listenerManager.unregister(listener)
  }

  test("a NULL bloom in the manifest is a mandatory hit, never a silent prune") {
    // a malformed manifest row (null bitset) means membership is
    // UNKNOWN — the file must be read, because pruning it would drop
    // rows and "skipping is never a semantics change"
    val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.01)
    bf.putLong(7L)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mani = Seq(
      ("f_with_bloom", bos.toByteArray),
      ("f_null_bloom", null.asInstanceOf[Array[Byte]]),
    ).toDF("file", "bloom")
    val sel = DataSkipping.selectFilesByKeys(mani, Seq(999999L)).toSet
    assert(sel === Set("f_null_bloom"),
      s"null-bloom file must survive the prune, got $sel")
    val sel2 = DataSkipping.selectFilesByKeys(mani, Seq(7L)).toSet
    assert(sel2 === Set("f_with_bloom", "f_null_bloom"))
  }

  test("bloom build skips null keys and rejects non-bigint keys") {
    val df = Seq[(java.lang.Long, Long)]((1L, 0L), (null, 0L), (2L, 0L))
      .toDF("k", "grp")
    val bytes = df.groupBy($"grp")
      .agg(graft.functions.GraftFunctions
        .bloomBuild(spark, $"k", 64L, 0.01).as("bloom"))
      .head.getAs[Array[Byte]]("bloom")
    val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    assert(bloom.mightContainLong(1L) && bloom.mightContainLong(2L))
    intercept[Exception] {
      Seq(("a", 1L)).toDF("k", "grp").groupBy($"grp")
        .agg(graft.functions.GraftFunctions
          .bloomBuild(spark, $"k", 64L, 0.01)).collect()
    }
  }
}
