package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north-star extension.
  *
  * Media is carried as opaque `binary` columns with typed metadata, the
  * standard Spark shape for multimodal training data (same layout the
  * `binaryFile` source produces). The Spark-side plumbing — schema,
  * partition sizing, batch shape, typed Dataset transforms — is real and
  * tested; the codec itself is PLUGGABLE: every decode/feature/frame
  * operator takes a [[MediaCodec]] factory (per-task instances — see the
  * trait doc). REAL decoders exist in [[JdkCodecs]] — ImageIO
  * (PNG/JPEG/BMP/GIF) and javax.sound (WAV/AIFF PCM), both pure JDK, no
  * external libraries — and JdkCodecsSpec drives this whole pipeline
  * through them on real encoded payloads. [[StubCodec]] remains the
  * default fixture codec (deterministic, format-agnostic), and formats
  * beyond the JDK (MP4/H.264, FLAC…) arrive through the same factory
  * parameter with a library-backed codec; nothing upstream or
  * downstream moves.
  *
  * Scale design:
  *  - Decode is per-row CPU-heavy, so it runs in `mapPartitions` with a
  *    per-partition codec lifecycle: [[MediaCodec.open]] once per
  *    partition (codec context / model load), [[MediaCodec.close]] on
  *    task completion — never per row.
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

  /** Decoded media metadata. */
  final case class DecodedMedia(
      media_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      ok: Boolean)

  /** The pluggable codec boundary. Operators take a codec FACTORY and
    * invoke it once per partition, executor-side — a factory that
    * constructs a new instance (`() => new MyCodec(cfg)`) therefore gives
    * every task a PRIVATE codec, which is what stateful codecs (codec
    * contexts, JNI handles, model sessions) require: a Scala `object`
    * codec deserializes to one shared JVM instance, and concurrent tasks
    * on an executor would interleave open/close on shared state. The
    * lifecycle per partition: [[open]] before the first row, [[close]] on
    * task completion. Stateless codecs (like [[StubCodec]]) may be
    * singletons. All row methods must be deterministic pure functions of
    * their arguments for the pipeline to stay replayable under task
    * retry. For frame-addressable media (video, animated images)
    * [[frames]] must agree with [[decode]]'s frame count; audio codecs
    * may report PCM frames from decode (duration metadata) while
    * [[frames]] yields fixed-size blocks — audio rows never enter the
    * frame-sampling path (it filters media_type == "video"). */
  trait MediaCodec extends Serializable {
    /** Once per partition, before any row — codec/model init. */
    def open(): Unit = ()
    /** On task completion (success or failure) — release native state. */
    def close(): Unit = ()
    /** Decode container metadata: (width, height, nFrames, ok). */
    def decode(content: Array[Byte], mediaType: String): (Int, Int, Int, Boolean)
    /** Fixed-dim feature embedding (CLIP-style) of the raw bytes. */
    def features(content: Array[Byte], mediaType: String, dim: Int): Array[Float]
    /** Sampled frames of a video payload (already stride/limit applied
      * upstream — implementations return ALL decodable frames in order). */
    def frames(content: Array[Byte]): Seq[Array[Byte]]
  }

  /** ======== DETERMINISTIC STUB (default / fixture codec) ========
    * Stands in for real image/audio/video codecs — the container ships
    * none. Parses a tiny synthetic container: magic "GRFT" + width:int +
    * height:int (big-endian), then 16-byte frame blocks; anything else is
    * a decode failure (ok=false) — failure handling is part of the tested
    * contract. Features hash byte blocks into a pseudo-embedding. */
  object StubCodec extends MediaCodec {
    private def header(c: Array[Byte]): Option[(Int, Int)] =
      if (c != null && c.length >= 12 &&
          c(0) == 'G' && c(1) == 'R' && c(2) == 'F' && c(3) == 'T')
        Some((java.nio.ByteBuffer.wrap(c, 4, 4).getInt,
              java.nio.ByteBuffer.wrap(c, 8, 4).getInt))
      else None

    override def decode(c: Array[Byte], mediaType: String): (Int, Int, Int, Boolean) =
      header(c) match {
        case Some((w, h)) =>
          // full 16-byte blocks only — must agree with frames()
          val nf = if (mediaType == "video") (c.length - 12) / 16 else 1
          (w, h, nf, true)
        case None => (0, 0, 0, false)
      }

    override def features(c: Array[Byte], mediaType: String, dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(c, i)
        (h % 1000) / 1000.0f
      }

    override def frames(c: Array[Byte]): Seq[Array[Byte]] =
      // full 16-byte blocks only — a trailing fragment is not a frame,
      // and decode's n_frames counts full blocks (the two must agree)
      if (header(c).isEmpty) Seq.empty
      else c.drop(12).grouped(16).filter(_.length == 16).toSeq
  }

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

  /** Per-partition codec run: build the task's codec from the factory,
    * open once, close on task completion, map rows through `f`. The
    * shared shape of every codec-bound operator. */
  private def withCodec[T, U](ds: Dataset[MediaRow], mkCodec: () => MediaCodec)(
      f: (MediaCodec, Iterator[MediaRow]) => Iterator[U])(
      implicit enc: org.apache.spark.sql.Encoder[U]): Dataset[U] =
    ds.mapPartitions { rows =>
      val codec = mkCodec()
      codec.open()
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
      f(codec, rows)
    }

  /** Decode metadata for each media row (codec pluggable; stub default). */
  def decode(ds: Dataset[MediaRow],
             codec: () => MediaCodec = () => StubCodec): Dataset[DecodedMedia] = {
    val spark = ds.sparkSession
    import spark.implicits._
    withCodec(ds, codec) { (c, rows) =>
      rows.map { r =>
        val (w, h, nf, ok) = c.decode(r.content, r.media_type)
        DecodedMedia(r.media_id, r.media_type, w, h, nf, ok)
      }
    }
  }

  /** Feature embeddings, one row per media id — the ANN-joinable output
    * (media bytes dropped before any downstream shuffle). */
  def features(ds: Dataset[MediaRow], dim: Int = 16,
               codec: () => MediaCodec = () => StubCodec): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    withCodec(ds, codec) { (c, rows) =>
      rows.map(r => (r.media_id, c.features(r.content, r.media_type, dim)))
    }.toDF("media_id", "embedding")
  }

  /** 64-bit average-hash perceptual fingerprint per media row — the
    * image-side twin of the text SimHash path: decode → 8×8 luminance
    * grid (via the codec's deterministic `features`) → bit i set iff
    * cell i is above the grid mean. Robust to re-encoding and mild
    * noise (the properties MultimodalSpec pins with real PNG payloads);
    * byte-identical files trivially collide. `ok = false` rows (codec
    * could not decode) carry phash 0 and are EXCLUDED from pairing by
    * [[mediaDupPairs]] — a poison payload must not match everything.
    *
    * Scale shape: one codec-bound mapPartitions (media bytes never
    * shuffle); output is 9 bytes per row. */
  def perceptualHash(ds: Dataset[MediaRow],
                     codec: () => MediaCodec = () => StubCodec): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    withCodec(ds, codec) { (c, rows) =>
      rows.map { r =>
        val ok = c.decode(r.content, r.media_type)._4
        if (!ok) (r.media_id, 0L, false)
        else {
          val f = c.features(r.content, r.media_type, 64)
          var sum = 0.0
          var i = 0
          while (i < f.length) { sum += f(i); i += 1 }
          val mean = if (f.length == 0) 0.0 else sum / f.length
          var bits = 0L
          i = 0
          while (i < f.length && i < 64) {
            if (f(i) > mean) bits |= (1L << i)
            i += 1
          }
          (r.media_id, bits, true)
        }
      }
    }.toDF("media_id", "phash", "ok")
  }

  /** Near-duplicate media pairs: Hamming ≤ `maxHamming` over the
    * perceptual hashes, via the same prefix-blocked capped-bucket
    * pairing as the text SimHash dedup ([[graft.ext.TextDedup
    * .simhashDupPairsFromSig]]) — blocking on the top 16 bits keeps the
    * candidate set bucket-local at corpus scale, and verification reads
    * only the 8-byte hashes, never the media. Undecodable rows are
    * dropped first. */
  def mediaDupPairs(phashes: DataFrame, maxHamming: Int = 6,
                    prefixBits: Int = 16, maxBucket: Int = 1000): DataFrame =
    TextDedup.simhashDupPairsFromSig(
      phashes.filter(col("ok"))
        .select(col("media_id").as("id"), col("phash").as("sig")),
      maxHamming, prefixBits, maxBucket)

  /** Frame sampling for video rows: every `stride`-th decoded frame, at
    * most `maxFrames` — one row per sampled frame, the explode shape
    * downstream training pipelines expect. */
  def frameSample(ds: Dataset[MediaRow], stride: Int, maxFrames: Int,
                  codec: () => MediaCodec = () => StubCodec): DataFrame = {
    require(stride > 0, "stride must be positive")
    require(maxFrames >= 0, "maxFrames must be non-negative")
    val spark = ds.sparkSession
    import spark.implicits._
    withCodec(ds.filter(col("media_type") === "video").as[MediaRow], codec) { (c, rows) =>
      rows.flatMap { r =>
        val fs = c.frames(r.content)
        fs.indices.collect {
          case i if i % stride == 0 => (r.media_id, i, fs(i))
        }.take(maxFrames)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
