package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north-star extension.
  *
  * Media is carried as opaque `binary` columns with typed metadata, the
  * standard Spark shape for multimodal training data (same layout the
  * `binaryFile` source produces). The Spark-side plumbing — schema,
  * partition sizing, batch shape, typed Dataset transforms — is real and
  * tested; the codec step itself is a clearly-marked DETERMINISTIC STUB
  * (`stubDecode*`): the container ships no image/audio libraries, so the
  * stubs parse a tiny synthetic header instead of real pixels. Swapping in
  * a real codec is a one-function change (`mapPartitions` body), nothing
  * upstream or downstream moves.
  *
  * Scale design:
  *  - Decode is per-row CPU-heavy, so it runs in `mapPartitions` (one
  *    codec init per partition, not per row).
  *  - Media rows are megabytes; `repartitionBySize` right-sizes partitions
  *    by cumulative byte budget, not row count, so executors neither OOM
  *    on 4K video rows nor starve on thumbnails.
  *  - Features (embeddings) detach from bytes immediately after decode —
  *    downstream joins/ANN never shuffle the heavy binary column.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,          // image | audio | video
      uri: String,
      content: Array[Byte],
      size_bytes: Long)

  /** Decoded media metadata (stub decode output). */
  final case class DecodedMedia(
      media_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      ok: Boolean)

  /** Read a directory of media files via Spark's binaryFile source into
    * the MediaRow shape. */
  def loadBinaryDir(spark: SparkSession, path: String, mediaType: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(mediaType).as("media_type"),
        col("path").as("uri"),
        col("content"),
        col("length").as("size_bytes"))
      .as[MediaRow]
  }

  /** Size-aware repartition: pack rows into partitions of ~`targetBytes`
    * cumulative payload (row-count partitioning is wrong for media). */
  def repartitionBySize(ds: Dataset[MediaRow], targetBytes: Long): Dataset[MediaRow] = {
    require(targetBytes > 0, "targetBytes must be positive")
    // sum() over zero rows is null — coalesce, don't dereference
    val total = ds.agg(coalesce(sum(col("size_bytes")), lit(0L))).head.getLong(0)
    if (total == 0L) ds
    else ds.repartition(
      math.max(1, math.ceil(total.toDouble / targetBytes).toInt), col("media_id"))
  }

  /** ======== DETERMINISTIC STUB ========
    * Stands in for an image decoder. Real impl: decode `content` with a
    * codec inside this same mapPartitions. The stub reads a 12-byte
    * synthetic header: magic "GRFT" + width:int + height:int (big-endian);
    * anything else is a decode failure (ok=false) — failure handling is
    * part of the tested contract. */
  def stubDecode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // codec/session init would happen once per partition here
      rows.map { r =>
        val c = r.content
        if (c.length >= 12 && c(0) == 'G' && c(1) == 'R' && c(2) == 'F' && c(3) == 'T') {
          val w = java.nio.ByteBuffer.wrap(c, 4, 4).getInt
          val h = java.nio.ByteBuffer.wrap(c, 8, 4).getInt
          val frames = if (r.media_type == "video") math.max(1, (c.length - 12) / 16) else 1
          DecodedMedia(r.media_id, r.media_type, w, h, frames, ok = true)
        } else DecodedMedia(r.media_id, r.media_type, 0, 0, 0, ok = false)
      }
    }
  }

  /** ======== DETERMINISTIC STUB ========
    * Stands in for a feature extractor (CLIP-style embedding). Produces a
    * deterministic pseudo-embedding by hashing byte blocks — keeps the
    * pipeline end-to-end runnable and testable; swap the body for a real
    * model call (batched per partition). */
  def stubFeatures(ds: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val emb = Array.tabulate(dim) { i =>
          val h = scala.util.hashing.MurmurHash3.bytesHash(r.content, i)
          (h % 1000) / 1000.0f
        }
        (r.media_id, emb)
      }
    }.toDF("media_id", "embedding")
  }

  /** Frame sampling for video rows: every `stride`-th 16-byte block after
    * the header, at most `maxFrames` (stub for real frame extraction;
    * emits one row per sampled frame — the explode shape downstream
    * training pipelines expect). */
  def stubFrameSample(ds: Dataset[MediaRow], stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    require(maxFrames >= 0, "maxFrames must be non-negative")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("media_type") === "video").as[MediaRow]
      .flatMap { r =>
        val body = r.content.drop(12)
        val frames = body.grouped(16).toSeq
        frames.indices.collect {
          case i if i % stride == 0 => (r.media_id, i, frames(i))
        }.take(maxFrames)
      }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
