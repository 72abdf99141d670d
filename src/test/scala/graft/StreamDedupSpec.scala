package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextDedup
import graft.stream.StreamingDedup

/** Streaming dedup against the persistent signature index: online
  * verdicts across real micro-batches, equivalence with sequential
  * library calls, and crash-replay idempotence (a batch re-applied on
  * top of its own output reproduces it exactly). */
class StreamDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 8-token sentences; the near-dup drops the first token -> 3-shingle
  // Jaccard 5/6 ≈ 0.83 ≥ 0.7
  private val A = "alpha beta gamma delta epsilon zeta eta theta"
  private val Ad = "beta gamma delta epsilon zeta eta theta"
  private val B = "one two three four five six seven eight"
  private val C = "red orange yellow green blue indigo violet amber"
  private val Cd = "orange yellow green blue indigo violet amber"
  private val D = "spark engines compile whole stage codegen fast paths"

  private val batches = Seq(
    Seq(1L -> A, 2L -> B),
    Seq(3L -> Ad, 4L -> C), // 3 near-dups indexed A -> dropped; 4 kept
    Seq(5L -> Cd, 1L -> A, 6L -> D) // 5 near-dups KEPT 4; id 1 re-sent; 6 kept
  )
  private val expectKept = Set(1L, 2L, 4L, 6L)

  /** One parquet FILE per batch, name+modtime ordered so the file
    * source forms micro-batches in fixture order. */
  private def writeBatchFiles(dir: String, bs: Seq[Seq[(Long, String)]],
                              offset: Int = 0): Unit =
    bs.zipWithIndex.foreach { case (rows, i) =>
      val n = offset + i
      val tmp = Files.createTempDirectory("sdp-stage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new File(dir, f"f$n%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + n * 60000L)
    }

  private def schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema

  test("streamed verdicts: index wins across batches, re-sent ids drop, kept set exact") {
    val in = Files.createTempDirectory("sdp-in").toString
    val kept = Files.createTempDirectory("sdp-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp-idx").toString + "/index"
    val chk = Files.createTempDirectory("sdp-chk").toString
    writeBatchFiles(in, batches)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingDedup.run(stream, "text", "doc_id", kept, idx, chk)
    assert(q.awaitTermination(180000), "stream timed out")

    val got = spark.read.parquet(kept)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == expectKept)
    // batch provenance survives as the partition column
    assert(got.select("batch_id").distinct().count() == 3)
    // the index holds exactly the kept docs' signatures
    val idxDf = spark.read.parquet(idx)
    assert(idxDf.select("id").collect().map(_.getLong(0)).toSet == expectKept)
    assert(idxDf.columns.toSet.contains("sig"))
  }

  test("streaming result equals sequential dedupAgainstIndex calls") {
    val in = Files.createTempDirectory("sdp2-in").toString
    val kept = Files.createTempDirectory("sdp2-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp2-idx").toString + "/index"
    val chk = Files.createTempDirectory("sdp2-chk").toString
    writeBatchFiles(in, batches)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingDedup.run(stream, "text", "doc_id", kept, idx, chk)
    assert(q.awaitTermination(180000), "stream timed out")

    // reference: hand-rolled loop over the same batches with the
    // library call and a manually extended index
    var refIndex = TextDedup.minhashIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id")
    var refKept = Set.empty[Long]
    for (rows <- batches) {
      val b = rows.toDF("doc_id", "text")
      val k = TextDedup.dedupAgainstIndex(b, "text", "doc_id", refIndex)
      refKept ++= k.select("doc_id").collect().map(_.getLong(0))
      refIndex = refIndex.unionByName(
        TextDedup.minhashIndex(k, "text", "doc_id")).persist()
    }
    val got = spark.read.parquet(kept)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == refKept)
    spark.catalog.clearCache()
  }

  test("replaying a batch over its own output is a no-op (crash idempotence)") {
    val in = Files.createTempDirectory("sdp3-in").toString
    val kept = Files.createTempDirectory("sdp3-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp3-idx").toString + "/index"
    val chk = Files.createTempDirectory("sdp3-chk").toString
    writeBatchFiles(in, batches)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingDedup.run(stream, "text", "doc_id", kept, idx, chk)
    assert(q.awaitTermination(180000), "stream timed out")
    val before = spark.read.parquet(kept).collect().toSet

    // re-apply the LAST batch on top of its own committed output — the
    // at-least-once replay. indexBefore must ignore batch_id=2's own
    // rows or the replay would see its own docs as "already indexed".
    val last = batches(2).toDF("doc_id", "text")
    StreamingDedup.applyBatch(last, 2L, "text", "doc_id", kept, idx,
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7,
      maxBucket = 1000)
    val after = spark.read.parquet(kept).collect().toSet
    assert(after == before, "replay must reproduce identical output")
    assert(spark.read.parquet(idx).select("id").collect()
      .map(_.getLong(0)).toSet == expectKept)
  }

  test("same-batch duplicate ids collapse to one kept row and one index row") {
    val kept = Files.createTempDirectory("sdp5-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp5-idx").toString + "/index"
    val b = Seq(7L -> D, 7L -> D, 8L -> B).toDF("doc_id", "text")
    StreamingDedup.applyBatch(b, 0L, "text", "doc_id", kept, idx,
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7,
      maxBucket = 1000)
    assert(spark.read.parquet(kept).filter(col("doc_id") === 7).count() == 1)
    assert(spark.read.parquet(idx).filter(col("id") === 7).count() == 1)
  }

  test("output dirs ahead of the applied batch id fail loudly (lost checkpoint)") {
    val kept = Files.createTempDirectory("sdp6-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp6-idx").toString + "/index"
    val b0 = Seq(1L -> A).toDF("doc_id", "text")
    StreamingDedup.applyBatch(b0, 5L, "text", "doc_id", kept, idx,
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7,
      maxBucket = 1000)
    // a NEW incarnation (fresh checkpoint, batch ids restart at 0) must
    // not silently judge against the old run's index
    assertThrows[IllegalArgumentException] {
      StreamingDedup.applyBatch(b0, 0L, "text", "doc_id", kept, idx,
        shingleK = 3, numHashes = 64, bands = 16, threshold = 0.7,
        maxBucket = 1000)
    }
  }

  test("restart with the same checkpoint resumes, never reprocesses") {
    val in = Files.createTempDirectory("sdp4-in").toString
    val kept = Files.createTempDirectory("sdp4-out").toString + "/kept"
    val idx = Files.createTempDirectory("sdp4-idx").toString + "/index"
    val chk = Files.createTempDirectory("sdp4-chk").toString
    writeBatchFiles(in, batches.take(1))
    def start() = StreamingDedup.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(in), "text", "doc_id", kept, idx, chk)
    val q1 = start()
    assert(q1.awaitTermination(120000))
    assert(spark.read.parquet(kept).count() == 2)
    // out-of-band reprocessing detector: an idempotent replay would
    // rewrite identical CONTENT, so assert the batch-0 part files
    // themselves (names + modtimes) are untouched by the second run
    def b0Files() = new File(kept, "batch_id=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toSet
    val before = b0Files()

    // two more files arrive; a restarted query picks up ONLY those
    writeBatchFiles(in, Seq(batches(1), batches(2)), offset = 1)
    val q2 = start()
    assert(q2.awaitTermination(120000))
    val got = spark.read.parquet(kept)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == expectKept)
    assert(b0Files() == before, "batch 0 output must not be rewritten")
  }
}
