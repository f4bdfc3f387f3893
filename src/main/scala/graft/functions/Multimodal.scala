package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode / frame-sample / feature-extract run per partition
  * in fixed-size batches — the Scala/Tungsten analog of `mapInPandas`
  * (same contract: executors see bounded batches, never a whole
  * partition in memory, and the output schema is declared up front).
  *
  * Decode is REAL for image and audio via JDK codecs: [[decodeImage]]
  * (`javax.imageio` — PNG/BMP/GIF/JPEG, oracle-gated by q56's lossless
  * PNG round-trip) and [[decodeAudio]] (`javax.sound.sampled` —
  * WAV/AU/AIFF, gated by q58's 8-bit PCM WAV round-trip). Only formats
  * the JDK ships no codec for (video, WebP, FLAC, ...) fall back to
  * [[decodeStub]], a deterministic fake raster — swap it for a
  * JNI/ffmpeg call in production; the Spark-side plumbing (binary
  * columns, bounded batches, schema, partitioning) is identical.
  */
object Multimodal {

  // javax.imageio defaults to FILE-backed stream caches: every
  // ImageIO.read/write over a plain Input/OutputStream spins up a temp
  // file in java.io.tmpdir — two per decoded doc here, tens of
  // thousands per pass at bench scale, none of them needed (our streams
  // are in-memory byte arrays of tiny images). Correctness-neutral but
  // it coupled every decode to tmpdir's dirty-page/disk state — the
  // source of q56_media_decode's 2.7-6.2 s per-pass bimodality (the
  // actual decode work is sub-second). Memory-backed caches are
  // strictly cheaper for in-memory streams; runs once per JVM when an
  // executor first touches this object inside a decode closure.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: opaque bytes + declared format. */
  case class MediaRow(media_id: Long, content: Array[Byte], format: String)

  /** Decoded raster stand-in: dimensions + one luminance byte per
    * "pixel" of a fixed 8x8 thumbnail.
    */
  case class Decoded(media_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** Per-media feature vector (what an embedding model would emit). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  /** Sampled "frame" of a media blob. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decoder — deterministic fake: width/height from the byte
    * length, 8x8 "thumbnail" from strided byte averages. Replace with a
    * real codec (libjpeg/ffmpeg) outside this container.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): Decoded = {
    val w = 1 + (bytes.length % 64)
    val h = 1 + (bytes.length % 48)
    val thumb = Array.tabulate[Byte](64) { i =>
      if (bytes.isEmpty) 0
      else {
        val start = (i * bytes.length) / 64
        val end = math.max(start + 1, ((i + 1) * bytes.length) / 64)
        var s = 0
        var j = start
        while (j < end) { s += bytes(j) & 0xff; j += 1 }
        (s / (end - start)).toByte
      }
    }
    Decoded(id, w, h, thumb)
  }

  /** Deterministic fake embedding: `dim` floats from a rolling 64-bit
    * hash over the thumbnail — stands in for a vision encoder.
    */
  def featuresFromThumb(thumb: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    Array.tabulate(dim) { d =>
      var acc = h + d * 0x9E3779B97F4A7C15L
      thumb.foreach { b => acc = acc * 31 + (b & 0xff) }
      h = acc
      ((acc >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** REAL image decode via `javax.imageio` (JDK-only — PNG, BMP, GIF,
    * JPEG; no external codec libs needed): true width/height from the
    * decoded raster and an 8x8 block-averaged luminance thumbnail
    * (integer BT.601 luma for color images, raw sample for grayscale).
    * Returns null for bytes no installed reader accepts — callers
    * dispatch to [[decodeStub]] for formats outside the JDK's codecs.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): Decoded = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      val gray = img.getColorModel.getNumComponents == 1
      val raster = img.getRaster
      def luma(x: Int, y: Int): Int =
        if (gray) raster.getSample(x, y, 0)
        else {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
      // same strided-window averaging as the stub, but over real pixels
      val thumb = Array.tabulate[Byte](64) { i =>
        val bx = i % 8; val by = i / 8
        val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var s = 0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(x, y); n += 1; x += 1 }
          y += 1
        }
        (s / n).toByte
      }
      Decoded(id, w, h, thumb)
    }
  }

  /** Batched decode over a media Dataset: JDK codecs where they apply,
    * [[decodeStub]] for anything unreadable — same bounded-batch
    * `mapPartitions` contract as [[extractFeatures]] (narrow, no
    * shuffle; scales by adding partitions).
    */
  def decodeImages(
      media: Dataset[MediaRow],
      batchSize: Int = 256): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val real = decodeImage(m.media_id, m.content)
          if (real != null) real else decodeStub(m.media_id, m.content)
        }
      }
    }
  }

  /** Deterministic 8-bit grayscale PNG from a byte payload: pixels are
    * the first w*h bytes (zero-padded), row-major. PNG is lossless, so
    * decode returns exactly these pixels — the synthesis side of the
    * round-trip oracle (the container has no image fixtures; the codec
    * under test is the JDK's real PNG coder).
    */
  def encodeGrayPng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      val v = if (i < bytes.length) bytes(i) & 0xff else 0
      raster.setSample(i % w, i / w, 0, v)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decoded audio stand-in: real format header fields + per-window
    * integer sample statistics.
    */
  case class DecodedAudio(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      window_means: Array[Long])

  /** REAL audio decode via `javax.sound.sampled` (JDK-only — WAV/AU/
    * AIFF): true sample rate / channel count / frame length from the
    * parsed header, plus mean sample value over 8 equal windows of the
    * raw PCM frames (integer arithmetic, same strided windows as the
    * image thumbnail). Returns null for bytes no installed reader
    * accepts — callers fall back to [[decodeStub]]-style handling.
    */
  def decodeAudio(id: Long, bytes: Array[Byte]): DecodedAudio =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val pcm = in.readAllBytes()
        val n = pcm.length
        val means = Array.tabulate[Long](8) { w =>
          if (n == 0) 0L
          else {
            val start = w * n / 8
            val end = math.max(start + 1, (w + 1) * n / 8)
            var s = 0L
            var i = start
            while (i < end) { s += pcm(i) & 0xff; i += 1 }
            s / (end - start)
          }
        }
        DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels, frames, means)
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => null
      case _: java.io.IOException => null
    }

  /** Batched audio decode over a media Dataset — the same bounded-batch
    * `mapPartitions` contract as [[decodeImages]]; unreadable rows are
    * dropped (callers route them to the stub family if needed).
    */
  def decodeAudios(
      media: Dataset[MediaRow],
      batchSize: Int = 256): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap(m => Option(decodeAudio(m.media_id, m.content)))
      }
    }
  }

  /** Deterministic 8-bit unsigned mono PCM WAV from a byte payload:
    * each payload byte is one sample (stored verbatim — 8-bit WAV PCM
    * is unsigned, so decode returns exactly these bytes). The synthesis
    * side of the audio round-trip oracle.
    */
  def encodePcmWav(bytes: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val n = bytes.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 byte/frame)
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(bytes)
    bb.array()
  }

  /** Batched partition map: decode + embed, `batchSize` rows at a time.
    * `grouped` bounds executor memory exactly like Arrow batch size does
    * for `mapInPandas`; partition count is preserved (pure narrow op, no
    * shuffle — scales to any corpus by adding partitions).
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real impl would decode the whole batch in
        // one vectorized/JNI call here.
        batch.map { m =>
          val d = decodeStub(m.media_id, m.content)
          MediaFeatures(m.media_id, m.content.length.toLong,
            featuresFromThumb(d.thumb, dim))
        }
      }
    }
  }

  /** [[extractFeatures]] over the REAL image decoder: embeds the true
    * 8x8 luma thumbnail when the JDK can read the bytes, the stub
    * raster otherwise — the production dispatch (decode what you can,
    * degrade deterministically on the rest). Same bounded-batch narrow
    * contract.
    */
  def extractFeaturesDecoded(
      media: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val real = decodeImage(m.media_id, m.content)
          val d = if (real != null) real else decodeStub(m.media_id, m.content)
          MediaFeatures(m.media_id, m.content.length.toLong,
            featuresFromThumb(d.thumb, dim))
        }
      }
    }
  }

  /** Frame sampling: fixed-width byte windows every `stride` frames
    * (video keyframe-sampling shape: one row in, 0..n rows out).
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameBytes: Int,
      stride: Int,
      batchSize: Int = 256): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          val nFrames = m.content.length / frameBytes
          (0 until nFrames by stride).map { f =>
            Frame(m.media_id, f,
              java.util.Arrays.copyOfRange(m.content, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }
  }

  /** Column-level metadata extraction (no decode): byte length and
    * leading-bytes "magic" — the cheap scan-time projection that
    * partition-prunes a 100 TB media table before any decode runs.
    */
  def mediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.select(
      col("*"),
      length(col(binCol)).cast("long").as("n_bytes"),
      hex(expr(s"substring($binCol, 1, 4)")).as("magic"))
}
