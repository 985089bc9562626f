package graft

import graft.operators.Multimodal
import java.nio.{ByteBuffer, ByteOrder}

/** Real (non-stub) multimodal decoding: hand-built PNG/GIF/BMP/WAV
  * payloads must yield their true header metadata through the batched
  * decode path; unknown payloads fall back to the deterministic stub. */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val size = 54
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h)
    b.array()
  }

  private def wav(rate: Int, channels: Int, bits: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = frames * blockAlign
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
    b.put("data".getBytes).putInt(dataSize)
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + 18 + 19 + 2).order(ByteOrder.BIG_ENDIAN)
    b.putShort(0xFFD8.toShort) // SOI
    b.putShort(0xFFE0.toShort).putShort(16) // APP0, 16-byte payload
    b.put("JFIF".getBytes).put(0.toByte).put(new Array[Byte](9))
    b.putShort(0xFFC0.toShort).putShort(17) // SOF0, 17-byte payload
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    b.put(new Array[Byte](9)) // 3 component specs
    b.putShort(0xFFD9.toShort) // EOI
    b.array()
  }

  // ---- REAL pixel decode (javax.imageio) ------------------------------

  /** A 2×2 image with known channel values, encodable to any ImageIO
    * format. */
  private def testImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000) // s = 0    -> bin 0
    img.setRGB(1, 0, 0xFFFFFF) // s = 765  -> bin 7
    img.setRGB(0, 1, 0x808080) // s = 384  -> bin 4
    img.setRGB(1, 1, 0x102030) // s = 96   -> bin 1
    img
  }

  private def encoded(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(testImage(), fmt, bos)
    bos.toByteArray
  }

  test("imageFeatures computes exact luminance + histogram for lossless formats") {
    // mean = (0 + 765 + 384 + 96) / (765 * 4); bins hit 0, 7, 4, 1
    val expectMean = (1245.0 / (765.0 * 4)).toFloat
    Seq("png", "bmp").foreach { fmt =>
      val f = Multimodal.imagePixels(encoded(fmt))
        .map(Multimodal.imageFeatures(_, dim = 9))
        .getOrElse(fail(s"$fmt did not decode"))
      assert(f(0) == expectMean, s"$fmt mean luminance")
      assert(f(1) == 0.25f && f(8) == 0.25f && f(5) == 0.25f && f(2) == 0.25f,
        s"$fmt histogram: ${f.toSeq}")
      assert(math.abs(f.sum.toDouble - (1.0 + expectMean.toDouble)) < 1e-6)
    }
  }

  test("JPEG pixels decode for real (lossy: dims exact, features plausible)") {
    val f = Multimodal.imagePixels(encoded("jpg"))
      .map(Multimodal.imageFeatures(_, dim = 9))
      .getOrElse(fail("jpeg did not decode"))
    assert(f(0) > 0f && f(0) < 1f, "mean luminance in (0,1)")
    assert(math.abs(f.drop(1).sum - 1f) < 1e-6, "histogram sums to 1")
  }

  test("syntheticBmp round-trips: ImageIO pixels equal the closed form") {
    val (seed, w, h) = (42L, 5, 4)
    val img = Multimodal.imagePixels(Multimodal.syntheticBmp(seed, w, h))
      .getOrElse(fail("synthetic BMP did not decode"))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == ((seed * 31 + x * 7 + y * 13) % 256).toInt, s"R($x,$y)")
      assert(((rgb >> 8) & 0xFF) == ((seed * 17 + x * 3 + y * 5) % 256).toInt, s"G($x,$y)")
      assert((rgb & 0xFF) == ((seed * 23 + x * 11 + y * 2) % 256).toInt, s"B($x,$y)")
    }
  }

  test("extractFeatures routes images to real pixels, text to the stub") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Multimodal.syntheticBmp(1L, 4, 3)),
      (2L, "just some text".getBytes("UTF-8")))
    val df = rows.toDF("id", "payload")
    val out = Multimodal.extractFeatures(df, "payload", dim = 9)
      .select(col("id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // image row: histogram must sum to 1 (a real-decode property the
    // length-arithmetic stub can't produce for this payload)
    assert(math.abs(out(1L).drop(1).sum - 1f) < 1e-6)
    // the stub formula: ((len * (i+7)) % 1000) / 1000 for len = 14
    val stub = (0 until 9).map(i => ((14L * (i + 7)) % 1000).toFloat / 1000f)
    assert(out(2L) == stub, "non-image payloads keep the documented stub")
  }

  test("resizeBatched nearest-neighbor matches the explicit index math") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Multimodal.syntheticBmp(7L, 6, 4))).toDF("id", "payload")
    val out = Multimodal.resizeBatched(df, "payload", targetW = 3, targetH = 2)
      .select(col("payload_resized"), col("rw"), col("rh")).collect().head
    assert(out.getInt(1) == 3 && out.getInt(2) == 2)
    val img = Multimodal.imagePixels(out.getAs[Array[Byte]](0))
      .getOrElse(fail("resized PNG did not decode"))
    assert(img.getWidth == 3 && img.getHeight == 2)
    val src = Multimodal.imagePixels(Multimodal.syntheticBmp(7L, 6, 4)).get
    for (y <- 0 until 2; x <- 0 until 3)
      assert((img.getRGB(x, y) & 0xFFFFFF) ==
        (src.getRGB(x * 6 / 3, y * 4 / 2) & 0xFFFFFF), s"pixel ($x,$y)")
  }

  test("JPEG SOF walk yields true dimensions") {
    assert(Multimodal.jpegMeta(jpeg(1024, 768)).contains(("image/jpeg", 1024, 768, 1)))
    assert(Multimodal.decodeReal(jpeg(64, 32)).contains(("image/jpeg", 64, 32, 1)))
    assert(Multimodal.jpegMeta("not a jpeg".getBytes).isEmpty)
  }

  test("header decoders extract true metadata; unknown payloads fall back") {
    val rows = Seq(
      (1L, png(640, 480)), (2L, gif(320, 200)), (3L, bmp(800, 600)),
      (4L, wav(44100, 2, 16, 1000)), (5L, "plain text payload".getBytes("UTF-8")))
    val decoded = Multimodal.decodeBatched(rows.toDF("id", "payload"), "payload")
      .select("id", "mime", "width", "height", "n_frames")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    assert(decoded(0) == ((1L, "image/png", 640, 480, 1)))
    assert(decoded(1) == ((2L, "image/gif", 320, 200, 1)))
    assert(decoded(2) == ((3L, "image/bmp", 800, 600, 1)))
    assert(decoded(3) == ((4L, "audio/wav", 44100, 2, 1000)))
    // unknown → stub fake, flagged by mime
    val n = "plain text payload".getBytes("UTF-8").length
    assert(decoded(4) == ((5L, "application/octet-stream",
      n % 640 + 1, n % 480 + 1, n % 30 + 1)))
  }

  test("top-down BMP (negative height) and text starting with BM don't confuse") {
    val topDown = {
      val b = bmp(100, 50)
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(22, -50) // negative = top-down row order
      b
    }
    assert(Multimodal.bmpMeta(topDown).contains(("image/bmp", 100, 50, 1)))
    // "BM..." text: file-size field won't match payload length → rejected
    assert(Multimodal.bmpMeta("BMW models are listed here today ok".getBytes).isEmpty)
  }

  test("malformed WAV with negative chunk size falls back instead of hanging") {
    val b = wav(8000, 1, 16, 4)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -5) // corrupt the fmt chunk size
    assert(Multimodal.wavMeta(b).isEmpty) // rejected, terminates
  }

  test("frame sampling uses real WAV frame counts") {
    val df = Seq((1L, wav(8000, 1, 16, 10))).toDF("id", "payload")
    val sampled = Multimodal.sampleFrames(Multimodal.decodeBatched(df, "payload"), stride = 4)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(sampled == Seq(0, 4, 8))
  }

  /** WAV with real PCM16 sample data (interleaved, little-endian). */
  private def wavWithSamples(rate: Int, channels: Int,
                             samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val blockAlign = channels * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  test("wavFrameEnergy decodes REAL PCM and windows RMS") {
    // mono: 4 frames at 16384 (=0.5), 4 at 0 -> windows of 4: rms 0.5, 0.0
    val mono = wavWithSamples(8000, 1,
      Array.fill(4)(16384.toShort) ++ Array.fill(4)(0.toShort))
    // stereo: L=16384, R=-16384 -> channel mix 0 -> rms 0
    val stereo = wavWithSamples(8000, 2,
      Array.tabulate(8)(i => if (i % 2 == 0) 16384.toShort else (-16384).toShort))
    val df = Seq((1L, mono), (2L, stereo),
      (3L, "not a wav".getBytes("UTF-8"))).toDF("id", "payload")
    val got = Multimodal.wavFrameEnergy(df, "payload", frameLen = 4)
      .select("id", "frame_idx", "n_samples", "rms").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 0, 4, 0.5), (1L, 1, 4, 0.0), (2L, 0, 4, 0.0)))
  }

  test("mp4Meta walks the box tree to tkhd dimensions and stsz frames") {
    val b = Multimodal.syntheticMp4(640, 360, 24)
    assert(Multimodal.mp4Meta(b) === Some(("video/mp4", 640, 360, 24)))
    assert(Multimodal.decodeReal(b) === Some(("video/mp4", 640, 360, 24)))
    // truncated/garbage payloads don't loop or throw
    assert(Multimodal.mp4Meta(b.take(20)) === None)
    assert(Multimodal.mp4Meta("not an mp4 at all".getBytes) === None)
  }

  test("aviMeta finds avih inside the hdrl LIST") {
    val b = Multimodal.syntheticAvi(320, 240, 100)
    assert(Multimodal.aviMeta(b) === Some(("video/x-msvideo", 320, 240, 100)))
    assert(Multimodal.decodeReal(b) === Some(("video/x-msvideo", 320, 240, 100)))
    // a WAV is RIFF too but not AVI — and still decodes as WAV
    val wav = wavWithSamples(8000, 1, Array.fill(4)(0.toShort))
    assert(Multimodal.aviMeta(wav) === None)
    assert(Multimodal.decodeReal(wav).exists(_._1 == "audio/wav"))
    assert(Multimodal.aviMeta(b.take(10)) === None)
  }
}
