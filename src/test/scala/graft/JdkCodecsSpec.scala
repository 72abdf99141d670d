package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.JdkCodecs
import graft.ext.Multimodal
import graft.ext.Multimodal.MediaRow

/** REAL decode through the JDK codecs: PNG/BMP images and PCM WAV audio
  * generated with the same JDK APIs, decoded exactly; the full
  * Multimodal pipeline (size-aware partitioning → decode → features)
  * runs under them end-to-end. */
class JdkCodecsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Deterministic w×h image encoded as `fmt` (png/bmp). */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31 + y * 17) % 256) * 0x010101)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV: a square wave of `nFrames` frames. */
  private def wavBytes(nFrames: Int, sampleRate: Float = 8000f,
                       amplitude: Short = 16384): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v: Short = if ((i / 8) % 2 == 0) amplitude else (-amplitude).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG and BMP dimensions exactly") {
    for (fmt <- Seq("png", "bmp")) {
      val (w, h, n, ok) = JdkCodecs.ImageIoCodec.decode(imageBytes(20, 12, fmt), "image")
      assert((w, h, n, ok) == ((20, 12, 1, true)), s"format $fmt")
    }
    assert(JdkCodecs.ImageIoCodec.decode("not an image".getBytes, "image")._4 == false)
  }

  test("ImageIoCodec features: deterministic grid luminance in [0,1]") {
    val bytes = imageBytes(32, 32, "png")
    val f1 = JdkCodecs.ImageIoCodec.features(bytes, "image", 16)
    val f2 = JdkCodecs.ImageIoCodec.features(bytes, "image", 16)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16 && f1.forall(v => v >= 0f && v <= 1f))
    // a solid-white image has luminance exactly 1.0 in every cell
    val white = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) white.setRGB(x, y, 0xffffff)
    val bos = new ByteArrayOutputStream(); ImageIO.write(white, "png", bos)
    val fw = JdkCodecs.ImageIoCodec.features(bos.toByteArray, "image", 4)
    assert(fw.forall(_ == 1.0f), fw.toSeq.toString)
  }

  test("ImageIoCodec frames: one decodable PNG frame round-trips") {
    val fs = JdkCodecs.ImageIoCodec.frames(imageBytes(10, 10, "png"))
    assert(fs.length == 1)
    val back = ImageIO.read(new ByteArrayInputStream(fs.head))
    assert(back.getWidth == 10 && back.getHeight == 10)
  }

  test("WavCodec decodes real PCM WAV rate/channels/frames exactly") {
    val (rate, ch, frames, ok) = JdkCodecs.WavCodec.decode(wavBytes(4000), "audio")
    assert((rate, ch, frames, ok) == ((8000, 1, 4000, true)))
    assert(JdkCodecs.WavCodec.decode(Array[Byte](1, 2, 3), "audio")._4 == false)
  }

  test("WavCodec features: RMS of a constant-amplitude square wave") {
    // |sample| is constant 16384/32768 = 0.5 -> every window RMS = 0.5
    val f = JdkCodecs.WavCodec.features(wavBytes(4096), "audio", 8)
    assert(f.length == 8)
    f.foreach(v => assert(math.abs(v - 0.5f) < 1e-4, s"window rms $v"))
    // silence -> 0
    val silent = JdkCodecs.WavCodec.features(wavBytes(1024, amplitude = 0), "audio", 4)
    assert(silent.forall(_ == 0f))
  }

  test("WavCodec canonicalizes 8-bit unsigned and big-endian inputs before sampling") {
    // 8-bit unsigned WAV digital silence is 0x80; un-canonicalized math
    // would read it as ±1.0 — it must come out as RMS 0
    val fmt8 = new AudioFormat(8000f, 8, 1, false, false)
    val silent8 = Array.fill[Byte](1024)(0x80.toByte)
    val bos8 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new ByteArrayInputStream(silent8), fmt8, 1024L),
      AudioFileFormat.Type.WAVE, bos8)
    val f8 = JdkCodecs.WavCodec.features(bos8.toByteArray, "audio", 4)
    f8.foreach(v => assert(math.abs(v) < 1e-3, s"8-bit silence rms $v"))

    // big-endian signed 16-bit (AIFF byte order): a 0.5-amplitude square
    // wave must still read as 0.5, not the byte-swapped garbage
    val fmtBe = new AudioFormat(8000f, 16, 1, true, true)
    val pcmBe = new Array[Byte](2048 * 2)
    for (i <- 0 until 2048) {
      val v: Short = if ((i / 8) % 2 == 0) 16384 else -16384
      pcmBe(2 * i) = ((v >> 8) & 0xff).toByte // big-endian: hi byte first
      pcmBe(2 * i + 1) = (v & 0xff).toByte
    }
    val bosBe = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new ByteArrayInputStream(pcmBe), fmtBe, 2048L),
      AudioFileFormat.Type.AIFF, bosBe)
    val fBe = JdkCodecs.WavCodec.features(bosBe.toByteArray, "audio", 4)
    fBe.foreach(v => assert(math.abs(v - 0.5f) < 1e-3, s"big-endian rms $v"))
  }

  test("WavCodec frames: 1024-frame PCM blocks partition the payload") {
    val fs = JdkCodecs.WavCodec.frames(wavBytes(3000))
    assert(fs.map(_.length).sum == 3000 * 2)
    assert(fs.length == 3) // 1024 + 1024 + 952
  }

  test("full Multimodal pipeline runs under the REAL codecs end-to-end") {
    val rows = Seq(
      MediaRow(1L, "image", "mem://a.png", imageBytes(16, 16, "png"), 100L),
      MediaRow(2L, "image", "mem://b.bmp", imageBytes(8, 24, "bmp"), 100L),
      MediaRow(3L, "image", "mem://broken", Array[Byte](9, 9), 2L)
    ).toDS()
    val sized = Multimodal.repartitionBySize(rows, targetBytes = 200L)
    val dec = Multimodal.decode(sized, () => JdkCodecs.ImageIoCodec)
      .collect().map(d => d.media_id -> d).toMap
    assert(dec(1L).width == 16 && dec(1L).height == 16 && dec(1L).ok)
    assert(dec(2L).width == 8 && dec(2L).height == 24 && dec(2L).ok)
    assert(!dec(3L).ok)
    val feats = Multimodal.features(sized, dim = 9, () => JdkCodecs.ImageIoCodec)
    assert(feats.count() == 3)

    val wavRows = Seq(
      MediaRow(10L, "audio", "mem://t.wav", wavBytes(2048), 100L)).toDS()
    val adec = Multimodal.decode(wavRows, () => JdkCodecs.WavCodec).head
    assert(adec.width == 8000 && adec.height == 1 && adec.n_frames == 2048 && adec.ok)
  }

  /** Deterministic "photo-like" image: smooth 2-D gradient + per-pixel
    * structured detail, optionally perturbed by `noise` (a small
    * deterministic luminance offset on a sparse pixel lattice — the
    * re-encode/mild-edit case perceptual hashing exists for). */
  private def photoBytes(seed: Int, noise: Int = 0): Array[Byte] = {
    val (w, h) = (64, 64)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * (2 + seed) + y * (3 + seed) + (x * y) / 16) % 256
      val n = if (noise != 0 && (x + y * 7) % 13 == 0) noise else 0
      val v = math.max(0, math.min(255, base + n))
      img.setRGB(x, y, v * 0x010101)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: re-encode-identical images collide, mild noise " +
    "stays within a small Hamming radius, different images are far") {
    import graft.ext.TextDedup
    val a = JdkCodecs.ImageIoCodec // direct kernel probes first
    def ph(bytes: Array[Byte]): Long = {
      val rows = Seq(MediaRow(0L, "image", "mem://p", bytes, 100L)).toDS()
      Multimodal.perceptualHash(rows, () => a).head.getLong(1)
    }
    val base = ph(photoBytes(seed = 1))
    val bmp = { // same pixels, lossless re-encode as BMP
      val img = ImageIO.read(new ByteArrayInputStream(photoBytes(seed = 1)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", bos)
      ph(bos.toByteArray)
    }
    assert(base == bmp, "lossless re-encode must hash identically")
    val noisy = ph(photoBytes(seed = 1, noise = 24))
    val other = ph(photoBytes(seed = 7))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(base, noisy) <= 6,
      s"mild noise moved the hash ${ham(base, noisy)} bits")
    assert(ham(base, other) > 12,
      s"different images too close: ${ham(base, other)} bits")
  }

  test("mediaDupPairs: exact/re-encoded copies pair, undecodable rows " +
    "and distinct images never pair") {
    val rows = Seq(
      MediaRow(1L, "image", "mem://a", photoBytes(seed = 1), 100L),
      MediaRow(2L, "image", "mem://a2", photoBytes(seed = 1), 100L), // exact copy
      MediaRow(3L, "image", "mem://b", photoBytes(seed = 7), 100L),
      MediaRow(4L, "image", "mem://bad", Array[Byte](1, 2, 3), 3L) // poison
    ).toDS()
    val ph = Multimodal.perceptualHash(rows, () => JdkCodecs.ImageIoCodec)
    assert(ph.filter(!org.apache.spark.sql.functions.col("ok"))
      .select("media_id").head.getLong(0) == 4L)
    val pairs = Multimodal.mediaDupPairs(ph, maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)),
      s"expected only the exact-copy pair, got ${pairs.mkString(",")}")
  }
}
