package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal
import graft.functions.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(3)
  private lazy val media: Seq[MediaRow] = (0L until 50L).map { i =>
    val bytes = Array.fill[Byte](64 + rng.nextInt(512))(rng.nextInt().toByte)
    MediaRow(i, bytes, if (i % 2 == 0) "img" else "aud")
  }

  test("feature extraction is deterministic and batch-size invariant") {
    val ds = media.toDS()
    val a = Multimodal.extractFeatures(ds, dim = 8, batchSize = 7)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(ds.repartition(5), dim = 8, batchSize = 256)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b, "features must not depend on batching or partitioning")
    assert(a.values.forall(_.length == 8))
  }

  test("feature extraction reports byte counts and keeps all rows") {
    val got = Multimodal.extractFeatures(media.toDS(), dim = 4)
      .collect().map(f => f.media_id -> f.n_bytes).toMap
    assert(got == media.map(m => m.media_id -> m.content.length.toLong).toMap)
  }

  test("real PNG decode: lossless gray round-trip recovers the exact pixels") {
    val payload = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val png = Multimodal.encodeGrayPng(payload, 8, 8)
    // a real PNG came out (magic) and the JDK decoded it back
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val d = Multimodal.decodeImage(7L, png)
    assert(d != null && d.width == 8 && d.height == 8)
    assert(d.thumb.map(_ & 0xff).toSeq == payload.map(_ & 0xff).toSeq)
  }

  test("real decode: BMP color image, BT.601 luma, block averaging on larger rasters") {
    // 16x16 solid color → every 2x2 block averages to the same luma
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 100, 50))
    g.fillRect(0, 0, 16, 16)
    g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val d = Multimodal.decodeImage(1L, out.toByteArray)
    assert(d != null && d.width == 16 && d.height == 16)
    val want = (200 * 299 + 100 * 587 + 50 * 114) / 1000
    assert(d.thumb.map(_ & 0xff).toSeq == Seq.fill(64)(want))
  }

  test("decodeImages: JDK codec for readable images, stub fallback for opaque bytes") {
    val png = Multimodal.encodeGrayPng(Array.tabulate[Byte](64)(_.toByte), 8, 8)
    val junk = Array.fill[Byte](100)(42)
    val ds = Seq(MediaRow(1L, png, "png"), MediaRow(2L, junk, "bin")).toDS()
    val got = Multimodal.decodeImages(ds).collect().map(d => d.media_id -> d).toMap
    assert(got(1L).width == 8 && got(1L).height == 8)
    val stub = Multimodal.decodeStub(2L, junk)
    assert(got(2L).width == stub.width && got(2L).thumb.toSeq == stub.thumb.toSeq)
  }

  test("real WAV decode: header fields and verbatim PCM round-trip") {
    val payload = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val wav = Multimodal.encodePcmWav(payload, sampleRate = 8000)
    val d = Multimodal.decodeAudio(5L, wav)
    assert(d != null && d.sample_rate == 8000 && d.channels == 1)
    assert(d.n_frames == 100L)
    // strided window means over the exact payload bytes
    val want = (0 until 8).map { w =>
      val start = w * 100 / 8
      val end = math.max(start + 1, (w + 1) * 100 / 8)
      (start until end).map(payload(_) & 0xff).sum.toLong / (end - start)
    }
    assert(d.window_means.toSeq == want)
    // opaque bytes: no reader accepts them
    assert(Multimodal.decodeAudio(6L, Array.fill[Byte](50)(7)) == null)
  }

  test("decodeAudios: batched dataset decode keeps readable rows, drops opaque ones") {
    val wav = Multimodal.encodePcmWav(Array.tabulate[Byte](64)(_.toByte))
    val ds = Seq(
      MediaRow(1L, wav, "wav"),
      MediaRow(2L, Array.fill[Byte](30)(9), "bin")).toDS()
    val got = Multimodal.decodeAudios(ds).collect()
    assert(got.map(_.media_id).toSeq == Seq(1L))
    assert(got.head.n_frames == 64L)
  }

  test("extractFeaturesDecoded: real thumb for readable images, stub thumb otherwise") {
    val payload = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val png = Multimodal.encodeGrayPng(payload, 8, 8)
    val junk = Array.fill[Byte](100)(42)
    val ds = Seq(MediaRow(1L, png, "png"), MediaRow(2L, junk, "bin")).toDS()
    val got = Multimodal.extractFeaturesDecoded(ds, dim = 8)
      .collect().map(f => f.media_id -> f).toMap
    // readable row: features come from the REAL decoded pixels, which
    // differ from the stub raster over the same (encoded) bytes
    val realThumb = Multimodal.decodeImage(1L, png).thumb
    assert(got(1L).features.toSeq ==
      Multimodal.featuresFromThumb(realThumb, 8).toSeq)
    assert(got(1L).features.toSeq !=
      Multimodal.featuresFromThumb(Multimodal.decodeStub(1L, png).thumb, 8).toSeq)
    // opaque row: identical to the stub-only path
    assert(got(2L).features.toSeq ==
      Multimodal.extractFeatures(ds.filter(_.media_id == 2L), dim = 8)
        .collect().head.features.toSeq)
    assert(got.values.map(_.n_bytes).toSet == Set(png.length.toLong, 100L))
  }

  test("frame sampling: window count, stride, and byte fidelity") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val ds = Seq(MediaRow(1L, bytes, "vid")).toDS()
    val frames = Multimodal.sampleFrames(ds, frameBytes = 10, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.head.frame_bytes.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).frame_bytes.toSeq == (20 until 30).map(_.toByte))
  }

  test("frame sampling drops the ragged tail and empty media") {
    val ds = Seq(
      MediaRow(1L, Array.tabulate[Byte](25)(_.toByte), "vid"), // 2 full frames
      MediaRow(2L, Array.empty[Byte], "vid"))
      .toDS()
    val frames = Multimodal.sampleFrames(ds, frameBytes = 10, stride = 1).collect()
    assert(frames.map(_.media_id).distinct.toSeq == Seq(1L))
    assert(frames.length == 2)
  }

  test("mediaMeta extracts byte length and magic without decoding") {
    val df = Seq((1L, "PNGx-rest-of-bytes"), (2L, "JPEGdata"))
      .toDF("media_id", "txt")
      .withColumn("content", col("txt").cast("binary"))
    val rows = Multimodal.mediaMeta(df, "content")
      .select("media_id", "n_bytes", "magic")
      .as[(Long, Long, String)].collect()
    assert(rows.toSet == Set(
      (1L, 18L, "504E4778"),  // P N G x
      (2L, 8L, "4A504547"))) // J P E G
  }
}
