package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import graft.ext.Multimodal.MediaCodec

/** REAL media codecs built on what the JDK itself ships — no external
  * libraries: `javax.imageio` (PNG, JPEG, BMP, GIF, WBMP readers) and
  * `javax.sound.sampled` (WAV / AIFF / AU PCM). These upgrade the
  * pluggable [[Multimodal.MediaCodec]] boundary from "stub by necessity"
  * to shippable decoders for the formats the JDK covers; anything beyond
  * (MP4/H.264, JPEG 2000, FLAC…) still arrives through the same factory
  * parameter with a library-backed codec.
  *
  * Both codecs are stateless (pure functions of the byte payload), so the
  * singletons are safe to share across tasks per the MediaCodec contract;
  * malformed payloads decode to `ok = false` rather than throwing — a
  * poison row must not kill a 100 TB pipeline.
  */
object JdkCodecs {

  /** Image decoder on ImageIO. `decode` → (width, height, nFrames, ok) —
    * nFrames > 1 for animated GIFs. `features` = mean luminance over a
    * ⌈√dim⌉ grid (row-major, deterministic pixel reads). `frames` =
    * each animation frame re-encoded as PNG bytes. */
  object ImageIoCodec extends MediaCodec {

    /** Shared reader lifecycle: input stream → first capable reader →
      * f(reader, nFrames) → dispose/close. None when no reader claims
      * the payload or anything throws. */
    private def withReader[T](c: Array[Byte])(
        f: (javax.imageio.ImageReader, Int) => T): Option[T] =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(c))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            r.setInput(iis)
            try {
              val n = try math.max(r.getNumImages(true), 1)
                      catch { case _: Exception => 1 }
              Some(f(r, n))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }

    override def decode(c: Array[Byte], mediaType: String): (Int, Int, Int, Boolean) =
      withReader(c)((r, n) => (r.getWidth(0), r.getHeight(0), n, true))
        .getOrElse((0, 0, 0, false))

    override def features(c: Array[Byte], mediaType: String, dim: Int): Array[Float] = {
      val img = try ImageIO.read(new ByteArrayInputStream(c))
                catch { case _: Exception => null }
      if (img == null || dim <= 0) return new Array[Float](math.max(dim, 0))
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val (w, h) = (img.getWidth, img.getHeight)
      // one bulk conversion instead of per-pixel getRGB(x, y) calls —
      // this loop touches every pixel and is the hot path of the stage
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      Array.tabulate(dim) { k =>
        val gx = k % g
        val gy = k / g
        val x0 = gx * w / g; val x1 = math.max(x0 + 1, (gx + 1) * w / g)
        val y0 = gy * h / g; val y1 = math.max(y0 + 1, (gy + 1) * h / g)
        if (x0 >= w || y0 >= h) 0f
        else {
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = px(y * w + x)
              // integer-weighted luma (BT.601-ish), exact in doubles
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000.0
              n += 1; x += 1
            }
            y += 1
          }
          (sum / math.max(n, 1) / 255.0).toFloat
        }
      }
    }

    override def frames(c: Array[Byte]): Seq[Array[Byte]] =
      withReader(c) { (r, n) =>
        (0 until n).map { i =>
          val bos = new ByteArrayOutputStream()
          ImageIO.write(r.read(i), "png", bos)
          bos.toByteArray
        }
      }.getOrElse(Seq.empty)
  }

  /** Audio decoder on javax.sound.sampled. `decode` → (sampleRate,
    * channels, pcmFrames, ok) mapped onto the (width, height, nFrames)
    * slots — for audio, `n_frames` means PCM frames (duration =
    * n_frames / sampleRate), NOT the fixed-size blocks `frames()`
    * yields; the MediaCodec frame-agreement contract applies to
    * frame-addressable media (video / animated images), and audio rows
    * never enter `frameSample` (it filters media_type == "video").
    * `features` = per-window RMS amplitude of the first channel over
    * `dim` equal windows (normalized to [0, 1]). `frames` = raw PCM
    * blocks of 1024 audio frames.
    *
    * Every supported input (16/8-bit, big- or little-endian, signed or
    * unsigned WAV/AIFF/AU) is canonicalized to signed 16-bit
    * little-endian PCM through the JDK's own converters before any
    * sample math — byte-order or encoding mistakes cannot silently skew
    * the features; inconvertible payloads are a decode failure. */
  object WavCodec extends MediaCodec {

    private def pcm(c: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
      try {
        val in0 = AudioSystem.getAudioInputStream(new ByteArrayInputStream(c))
        val f0 = in0.getFormat
        val canonical =
          f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f0.getSampleSizeInBits == 16 && !f0.isBigEndian
        val in =
          if (canonical) in0
          else AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              f0.getSampleRate, 16, f0.getChannels,
              2 * f0.getChannels, f0.getSampleRate, false),
            in0)
        try Some((in.getFormat, in.readAllBytes()))
        finally { in.close(); if (!canonical) in0.close() }
      } catch { case _: Exception => None }

    override def decode(c: Array[Byte], mediaType: String): (Int, Int, Int, Boolean) =
      pcm(c) match {
        case Some((f, data)) =>
          val frames = if (f.getFrameSize > 0) data.length / f.getFrameSize else 0
          (f.getSampleRate.toInt, f.getChannels, frames, true)
        case None => (0, 0, 0, false)
      }

    /** Signed sample of channel 0 at PCM frame i, normalized to [-1, 1].
      * `pcm` guarantees signed 16-bit little-endian. */
    private def sample(f: javax.sound.sampled.AudioFormat, data: Array[Byte], i: Int): Double = {
      val off = i * f.getFrameSize
      val lo = data(off) & 0xff
      val hi = data(off + 1).toInt
      ((hi << 8) | lo).toShort / 32768.0
    }

    override def features(c: Array[Byte], mediaType: String, dim: Int): Array[Float] =
      pcm(c) match {
        case Some((f, data)) if dim > 0 && f.getFrameSize > 0 =>
          val n = data.length / f.getFrameSize
          Array.tabulate(dim) { k =>
            val i0 = (k.toLong * n / dim).toInt
            val i1 = math.max(i0 + 1, ((k + 1).toLong * n / dim).toInt)
            if (i0 >= n) 0f
            else {
              var sum = 0.0
              var i = i0
              while (i < math.min(i1, n)) {
                val s = sample(f, data, i)
                sum += s * s
                i += 1
              }
              math.sqrt(sum / math.max(math.min(i1, n) - i0, 1)).toFloat
            }
          }
        case _ => new Array[Float](math.max(dim, 0))
      }

    override def frames(c: Array[Byte]): Seq[Array[Byte]] =
      pcm(c) match {
        case Some((f, data)) if f.getFrameSize > 0 =>
          data.grouped(f.getFrameSize * 1024).toSeq
        case _ => Seq.empty
      }
  }
}
