package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-batched functions over the binary payloads (the Scala shape of
  * a `mapInPandas` pipeline: rows are processed in size-bounded batches so
  * a real decoder could amortize model/codec setup per batch).
  *
  * Decode is REAL for every format the JDK can handle: header metadata
  * for PNG/GIF/BMP/WAV/JPEG (pure header parsing, [[Multimodal.decodeReal]]),
  * PIXELS for JPEG/PNG/GIF/BMP via javax.imageio
  * ([[Multimodal.imagePixels]] → [[Multimodal.imageFeatures]] /
  * [[Multimodal.resizeBatched]]), and PCM16 WAV samples
  * ([[Multimodal.wavPcm16]]). Only video containers and compressed audio
  * fall back to the STUBBED deterministic fake (those codecs don't exist
  * in this container); the batching shape, schema contract, partition
  * parallelism, and column plumbing are identical on both paths, so
  * swapping the fallback for an ffmpeg JNI codec changes one function.
  */
object Multimodal {

  /** Canonical multimodal schema fragment: payload + metadata struct. */
  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach a payload column (binary) + metadata struct to a DataFrame.
    * `mime` is carried verbatim; width/height/frames are decoded lazily
    * (here: stubbed from the payload header bytes). */
  def withPayload(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("payload", col(contentCol).cast("binary"))
      .withColumn("meta", struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))

  // =====================================================================
  // REAL pure-JDK header decoders: metadata for PNG/GIF/BMP/WAV lives in
  // fixed-layout headers — no codec library needed to extract it.
  // =====================================================================
  import java.nio.{ByteBuffer, ByteOrder}

  private def le(b: Array[Byte]) = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
  private def be(b: Array[Byte]) = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** PNG: 8-byte signature, then the IHDR chunk with big-endian
    * width/height at offsets 16/20. */
  private[graft] def pngMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && ascii(b, 1, "PNG") &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A &&
        ascii(b, 12, "IHDR"))
      Some(("image/png", be(b).getInt(16), be(b).getInt(20), 1))
    else None

  /** GIF87a/89a: little-endian logical-screen width/height at 6/8. */
  private[graft] def gifMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (b.length >= 10 && (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")))
      Some(("image/gif", le(b).getShort(6) & 0xFFFF, le(b).getShort(8) & 0xFFFF, 1))
    else None

  /** BMP (BITMAPINFOHEADER): "BM", little-endian file size at 2 (checked
    * against the payload length so text starting with "BM" can't
    * misdetect), width/height at 18/22 (height may be negative =
    * top-down). */
  private[graft] def bmpMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    if (b.length >= 26 && ascii(b, 0, "BM") && le(b).getInt(2) == b.length)
      Some(("image/bmp", le(b).getInt(18), math.abs(le(b).getInt(22)), 1))
    else None

  /** WAV (RIFF/WAVE): walk the chunk list; `fmt ` gives sample rate /
    * channels / block align, `data` gives the frame count. Reported as
    * (width = sample rate, height = channels, n_frames = audio frames). */
  private[graft] def wavMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
    var off = 12
    var rate = 0
    var channels = 0
    var blockAlign = 0
    var dataSize = -1
    val bb = le(b)
    var ok = true
    while (ok && off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0) ok = false // malformed chunk: stop, don't loop forever
      else {
        if (id == "fmt " && off + 8 + 16 <= b.length) {
          channels = bb.getShort(off + 10) & 0xFFFF
          rate = bb.getInt(off + 12)
          blockAlign = bb.getShort(off + 20) & 0xFFFF
        } else if (id == "data") dataSize = size
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    if (rate > 0 && channels > 0 && blockAlign > 0 && dataSize >= 0)
      Some(("audio/wav", rate, channels, dataSize / blockAlign))
    else None
  }

  /** JPEG: walk the marker segments to the first SOF frame header
    * (baseline/progressive — C0-CF except the non-frame C4/C8/CC);
    * big-endian height/width live at payload offsets 3/5. Pixel DECODING
    * needs a codec; the dimensions do not. */
  private[graft] def jpegMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var off = 2
    while (off + 9 < b.length && (b(off) & 0xFF) == 0xFF) {
      val marker = b(off + 1) & 0xFF
      if (marker >= 0xD0 && marker <= 0xD9) off += 2 // standalone marker
      else {
        val size = ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          val h = ((b(off + 5) & 0xFF) << 8) | (b(off + 6) & 0xFF)
          val w = ((b(off + 7) & 0xFF) << 8) | (b(off + 8) & 0xFF)
          return Some(("image/jpeg", w, h, 1))
        }
        off += 2 + size
      }
    }
    None
  }

  /** MP4 (ISO BMFF): the file is a box tree `[size:4 BE][type:4][payload]`.
    * Walk the known container boxes (`moov/trak/mdia/minf/stbl`), read the
    * first video `tkhd`'s 16.16-fixed width/height (v0 payload offsets
    * 76/80; v1 +12 for the widened times) and the first `stsz` sample
    * count. Pure byte walking — container METADATA needs no codec (frame
    * pixel decode still does, and stays on the stub path). 64-bit
    * `largesize` boxes (size==1) stop the walk — closed-form metadata
    * readers don't chase >4 GiB boxes. */
  private[graft] def mp4Meta(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 12 || !ascii(b, 4, "ftyp")) return None
    val bb = be(b)
    var width = 0; var height = 0; var frames = 0
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val size = bb.getInt(off)
        val typ = new String(b, off + 4, 4, "US-ASCII")
        if (size < 8 || off + size > end) ok = false // malformed/largesize: stop
        else {
          if (containers(typ)) walk(off + 8, off + size)
          else if (typ == "tkhd" && width == 0) {
            val ver = b(off + 8) & 0xFF
            val wOff = off + 8 + (if (ver == 1) 88 else 76)
            if (wOff + 8 <= off + size) {
              val tw = bb.getInt(wOff) >>> 16
              val th = bb.getInt(wOff + 4) >>> 16
              if (tw > 0 && th > 0) { width = tw; height = th }
            }
          } else if (typ == "stsz" && frames == 0 && size >= 20)
            frames = bb.getInt(off + 8 + 8) // sample_count after ver/flags + sample_size
          off += size
        }
      }
    }
    walk(0, b.length)
    if (width > 0 && height > 0)
      Some(("video/mp4", width, height, math.max(frames, 1)))
    else None
  }

  /** AVI (RIFF): same chunk walking as [[wavMeta]] but descending into
    * `LIST` chunks; the `avih` main header carries dwTotalFrames /
    * dwWidth / dwHeight at payload offsets 16/32/36 (all LE). */
  private[graft] def aviMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "AVI ")) return None
    val bb = le(b)
    var res: Option[(String, Int, Int, Int)] = None
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (res.isEmpty && off + 8 <= end) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > end) return // malformed: stop
        if (id == "LIST" && size >= 4) walk(off + 12, off + 8 + size)
        else if (id == "avih" && size >= 40)
          res = Some(("video/x-msvideo",
            bb.getInt(off + 8 + 32), bb.getInt(off + 8 + 36), bb.getInt(off + 8 + 16)))
        off += 8 + size + (size & 1) // word-aligned
      }
    }
    walk(12, b.length)
    res.filter(t => t._2 > 0 && t._3 > 0)
  }

  /** Real header decode where the format allows it; None → caller falls
    * back to the stub. Video CONTAINERS (MP4/AVI) report real metadata
    * here; only their frame pixels remain stub territory. */
  private[graft] def decodeReal(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    pngMeta(b).orElse(gifMeta(b)).orElse(bmpMeta(b)).orElse(wavMeta(b))
      .orElse(jpegMeta(b)).orElse(mp4Meta(b)).orElse(aviMeta(b))

  // ---- closed-form synthetic containers (test/gate fixtures) -----------

  private def be4(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(i).array
  private def le4(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array
  private def isoBox(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.toArray.flatten
    be4(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
  }

  /** Minimal-but-conformant MP4: ftyp + moov(mvhd, trak(tkhd,
    * mdia(minf(stbl(stsz))))) with the declared width/height in tkhd's
    * 16.16 fields and `frames` as the stsz sample count. Every byte is a
    * closed-form function of (w, h, frames) — the q118 oracle replays the
    * metadata from the synthesis parameters alone. */
  private[graft] def syntheticMp4(w: Int, h: Int, frames: Int): Array[Byte] = {
    val matrix = be4(0x00010000) ++ be4(0) ++ be4(0) ++
      be4(0) ++ be4(0x00010000) ++ be4(0) ++
      be4(0) ++ be4(0) ++ be4(0x40000000)
    val ftyp = isoBox("ftyp", "isom".getBytes("US-ASCII"), be4(0x200),
      "isom".getBytes("US-ASCII"))
    val mvhd = isoBox("mvhd",
      be4(0),            // version/flags
      be4(0), be4(0),    // creation/modification
      be4(1000),         // timescale
      be4(frames * 40),  // duration (25 fps at timescale 1000)
      be4(0x00010000),   // rate 1.0
      Array[Byte](0x01, 0x00), // volume 1.0
      new Array[Byte](10), matrix, new Array[Byte](24),
      be4(2))            // next track id
    val tkhd = isoBox("tkhd",
      be4(7),            // version 0, flags: enabled|in-movie|in-preview
      be4(0), be4(0),    // creation/modification
      be4(1), be4(0),    // track id, reserved
      be4(frames * 40),  // duration
      new Array[Byte](8),
      new Array[Byte](8), // layer, alternate group, volume, reserved
      matrix,
      be4(w << 16), be4(h << 16))
    val stsz = isoBox("stsz", be4(0), be4(1), be4(frames))
    val trak = isoBox("trak", tkhd,
      isoBox("mdia", isoBox("minf", isoBox("stbl", stsz))))
    ftyp ++ isoBox("moov", mvhd, trak)
  }

  /** Minimal AVI: RIFF('AVI ', LIST('hdrl', avih)) with the declared
    * dimensions and frame count in the 56-byte main header. */
  private[graft] def syntheticAvi(w: Int, h: Int, frames: Int): Array[Byte] = {
    val avihPayload =
      le4(33333) ++ le4(0) ++ le4(0) ++ le4(0x10) ++ // usec/frame..flags
      le4(frames) ++ le4(0) ++ le4(1) ++ le4(0) ++   // totalFrames..bufSize
      le4(w) ++ le4(h) ++ new Array[Byte](16)        // width, height, reserved
    val avih = "avih".getBytes("US-ASCII") ++ le4(avihPayload.length) ++ avihPayload
    val hdrl = "LIST".getBytes("US-ASCII") ++ le4(4 + avih.length) ++
      "hdrl".getBytes("US-ASCII") ++ avih
    val riffPayload = "AVI ".getBytes("US-ASCII") ++ hdrl
    "RIFF".getBytes("US-ASCII") ++ le4(riffPayload.length) ++ riffPayload
  }

  // =====================================================================
  // REAL pixel decode via javax.imageio (in-JDK, offline): JPEG, PNG,
  // GIF, BMP pixels decode for real. The stub surface is now VIDEO and
  // non-PCM16 audio only.
  // =====================================================================

  /** Decode an image payload to pixels with the JDK's ImageIO readers
    * (JPEG/PNG/GIF/BMP ship with the JDK). The magic bytes are sniffed
    * first so non-image payloads skip reader probing entirely; disk
    * caching is off (executor-friendly — no temp files). */
  private[graft] def imagePixels(b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val isImage = pngMeta(b).orElse(gifMeta(b)).orElse(bmpMeta(b))
      .orElse(jpegMeta(b)).isDefined
    if (!isImage) None
    else try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    } catch { case _: Exception => None }
  }

  /** REAL image features from decoded pixels: `f(0)` = mean luminance
    * (channel-sum scaled to [0,1]) and `f(1..dim-1)` = a (dim−1)-bin
    * intensity histogram, normalized. All arithmetic is integer until the
    * final divisions (bin = s·(dim−1) div 766 on the 0..765 channel sum),
    * so for lossless formats the features are exactly re-expressible in
    * oracle SQL — the decode step itself is value-gated (q113). */
  private[graft] def imageFeatures(img: java.awt.image.BufferedImage,
                                   dim: Int): Array[Float] = {
    require(dim >= 2, "need at least mean + one histogram bin")
    val (w, h) = (img.getWidth, img.getHeight)
    val n = w.toLong * h
    val bins = new Array[Long](dim - 1)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val s = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        sum += s
        bins((s * (dim - 1) / 766).toInt) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    out(0) = (sum.toDouble / (765.0 * n)).toFloat
    var i = 0
    while (i < dim - 1) { out(i + 1) = (bins(i).toDouble / n).toFloat; i += 1 }
    out
  }

  // =====================================================================
  // STUB fallback — now only for payloads no in-JDK codec can decode
  // (unrecognized containers, compressed non-PCM audio; MP4/AVI container
  // METADATA is real via mp4Meta/aviMeta — only frame PIXEL decode needs
  // a codec). A real deployment replaces ONLY this function (ffmpeg JNI);
  // signature and batch shape stay.
  // =====================================================================
  private[operators] def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 640 + 1, n % 480 + 1, n % 30 + 1) // fake width/height/frames
  }

  /** STUB feature extractor for non-decodable payloads: `dim`
    * pseudo-features derived arithmetically from payload length —
    * deterministic and re-expressible in the oracle SQL, standing in for
    * an embedding model's output. Image payloads never reach this:
    * [[extractFeatures]] routes them to [[imageFeatures]]. */
  private[operators] def stubFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i => ((payload.length.toLong * (i + 7)) % 1000).toFloat / 1000f)

  /** Batched decode: groups each partition's rows into ≤`batchSize`
    * batches (the mapInPandas/Arrow batch shape), decodes each payload —
    * REAL header parsing for PNG/GIF/BMP/WAV ([[decodeReal]]), stub
    * fallback otherwise — and emits metadata columns. Output schema:
    * input columns + (width, height, n_frames, n_bytes, mime). For audio,
    * width = sample rate and height = channels. */
  def decodeBatched(df: DataFrame, payloadCol: String,
                    batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType), StructField("n_bytes", LongType),
      StructField("mime", StringType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the fallback codec once here
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val (mime, w, h, f) = decodeReal(payload).getOrElse {
            val (sw, sh, sf) = stubDecode(payload)
            ("application/octet-stream", sw, sh, sf)
          }
          // Seq[Any]: a plain Seq(w,h,f,long) would numeric-widen the Ints
          Row.fromSeq(r.toSeq ++ Seq[Any](w, h, f, payload.length.toLong, mime))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batched feature extraction → `features: array<float>` column.
    * Image payloads (JPEG/PNG/GIF/BMP) get REAL pixel-derived features
    * via the JDK's ImageIO ([[imageFeatures]]); everything else falls to
    * the documented stub. */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 8,
                      batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(FloatType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val feats = imagePixels(payload).map(imageFeatures(_, dim))
            .getOrElse(stubFeatures(payload, dim))
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** 64-bit average-hash (aHash) of a decoded image: 8×8 grid of integer
    * block sums (block boundaries `(k·dim) div 8` — exact for any
    * dimensions), bit i = by·8+bx set iff the block mean exceeds the
    * global mean, compared by integer CROSS-MULTIPLY (`s_b·n_total >
    * s_total·n_b`) so the hash is bit-exactly re-derivable from the pixel
    * formula alone — no float thresholds. The perceptual-dedup staple:
    * near-identical images differ in a few bits, so Hamming banding
    * ([[Dedup.hammingNearDup]]) finds them with an equi-join. */
  private[graft] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val s = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        val i = by * 8 + bx
        sums(i) += s
        counts(i) += 1
        total += s
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 64) {
      // BigInt cross-multiply: sums·n overflows a Long past ~8.8e8 pixels
      // (12·(w·h)² > 2^63); the oracle's DuckDB sums are HUGEINT already,
      // so 128-bit comparison keeps the two sides identical at any size
      if (counts(i) > 0 && BigInt(sums(i)) * n > BigInt(total) * counts(i))
        hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Partition-local payload map: append one derived column computed
    * per-row from the binary payload (the shared scaffold of the hash
    * extractors — no batching knob because nothing is amortized across
    * rows; codec-initializing extractors like [[decodeBatched]] keep
    * their grouped form). */
  private def mapPayload(df: DataFrame, payloadCol: String,
                         outField: StructField)
                        (f: Array[Byte] => Any): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ outField)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ f(r.getAs[Array[Byte]](payloadIdx))))
    }(Encoders.row(outSchema))
  }

  /** Perceptual hashing → `ahash: bigint` column (null for payloads no
    * JDK codec decodes). */
  def extractAHash(df: DataFrame, payloadCol: String): DataFrame =
    mapPayload(df, payloadCol, StructField("ahash", LongType)) { payload =>
      imagePixels(payload).map(aHash64).orNull
    }

  /** REAL deterministic resize: nearest-neighbor sampling
    * (`src(x·sw div tw, y·sh div th)` — explicit integer index math, no
    * implementation-defined interpolation) re-encoded LOSSLESSLY as PNG.
    * Output: input columns + (payload_resized, rw, rh). Non-image
    * payloads are passed through with a null resized payload. */
  def resizeBatched(df: DataFrame, payloadCol: String, targetW: Int,
                    targetH: Int, batchSize: Int = 64): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("payload_resized", BinaryType),
      StructField("rw", IntegerType), StructField("rh", IntegerType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val resized = imagePixels(payload).map { src =>
            val out = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < targetH) {
              var x = 0
              while (x < targetW) {
                out.setRGB(x, y, src.getRGB(
                  x * src.getWidth / targetW, y * src.getHeight / targetH))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            bos.toByteArray
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](resized.orNull,
            resized.map(_ => targetW).orNull, resized.map(_ => targetH).orNull))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic 24-bit BMP fixture (bottom-up, BITMAPINFOHEADER, rows
    * padded to 4 bytes): pixel (x, y) channels are closed-form functions
    * of (seed, x, y) — `r = (seed·31 + x·7 + y·13) mod 256`,
    * `g = (seed·17 + x·3 + y·5) mod 256`, `b = (seed·23 + x·11 + y·2)
    * mod 256` — so an oracle recomputes the decoded features without
    * touching any image bytes. BMP is uncompressed: what ImageIO decodes
    * IS this formula, which is what makes the real-decode gate (q113)
    * value-checkable end to end. */
  def syntheticBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    val rowSize = (3 * w + 3) / 4 * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        b.put(((seed * 23 + x * 11 + y * 2) % 256).toByte)  // B
          .put(((seed * 17 + x * 3 + y * 5) % 256).toByte)  // G
          .put(((seed * 31 + x * 7 + y * 13) % 256).toByte) // R
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  /** Deterministic 16-bit PCM mono WAV: sample i =
    * `((seed·37 + i·13) mod 4096) − 2048` — closed-form, so an oracle
    * recomputes anything derived from the REAL decode ([[wavPcm16]])
    * without touching the bytes. 8 kHz, format tag 1. */
  def syntheticWav(seed: Long, nSamples: Int): Array[Byte] = {
    require(nSamples > 0, "need samples")
    val dataSize = nSamples * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      b.putShort(((seed * 37 + i * 13) % 4096 - 2048).toShort)
      i += 1
    }
    b.array()
  }

  /** 64-bit energy-envelope fingerprint of REAL-decoded PCM16 audio — the
    * audio twin of [[aHash64]]: 64 frames (frame of sample i =
    * `(i·64) div n`), per-frame integer energy `Σ sample²` over all
    * channels, bit f set iff the frame's MEAN energy exceeds the global
    * mean (integer cross-multiply, no float thresholds). Loudness-profile
    * near-duplicates (re-encodes, padding-trimmed copies) land within a
    * few bits — [[Dedup.hammingNearDup]] finds them with the banded
    * equi-join. Null for payloads that are not decodable PCM16 WAV. */
  private[graft] def audioEnergyHash64(samples: Array[Short],
                                       channels: Int): Long = {
    val nFrames = samples.length / channels
    if (nFrames == 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < nFrames) {
      val f = (i.toLong * 64 / nFrames).toInt
      var c = 0
      var e = 0L
      while (c < channels) {
        val s = samples(i * channels + c).toLong
        e += s * s
        c += 1
      }
      sums(f) += e
      counts(f) += 1
      total += e
      i += 1
    }
    var hash = 0L
    var f = 0
    while (f < 64) {
      // BigInt cross-multiply: full-scale stereo PCM16 overflows the Long
      // product after ~12 s of audio (sums·nFrames ~ 2.4e20 at 60 s /
      // 44.1 kHz); the oracle side is HUGEINT, so match it at 128 bits
      if (counts(f) > 0 && BigInt(sums(f)) * nFrames > BigInt(total) * counts(f))
        hash |= 1L << f
      f += 1
    }
    hash
  }

  /** Audio fingerprinting → `ahash: bigint` column (null for non-PCM16
    * payloads). */
  def extractAudioHash(df: DataFrame, payloadCol: String): DataFrame =
    mapPayload(df, payloadCol, StructField("ahash", LongType)) { payload =>
      wavPcm16(payload)
        .map { case (_, ch, s) => audioEnergyHash64(s, ch) }.orNull
    }

  /** REAL PCM decode for 16-bit integer WAV (format tag 1): returns
    * (sample rate, channels, interleaved samples). Pure JDK — PCM needs
    * no codec, so this modality's decode step is NOT a stub. Compressed
    * formats still fall through to the documented stub path. */
  private[graft] def wavPcm16(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
    val bb = le(b)
    var off = 12
    var fmtTag = 0; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = -1
    var ok = true
    while (ok && off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0) ok = false
      else {
        if (id == "fmt " && off + 8 + 16 <= b.length) {
          fmtTag = bb.getShort(off + 8) & 0xFFFF
          channels = bb.getShort(off + 10) & 0xFFFF
          rate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22) & 0xFFFF
        } else if (id == "data") { dataOff = off + 8; dataLen = size }
        off += 8 + size + (size & 1)
      }
    }
    if (fmtTag != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
        dataOff < 0 || dataOff + dataLen > b.length) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
    Some((rate, channels, out))
  }

  /** Windowed RMS energy over REAL-decoded PCM16 audio: frames of
    * `frameLen` audio frames (channel-averaged, normalized to [-1, 1]),
    * one output row per window — the audio feature-extraction shape
    * (VAD / silence trimming / loudness filtering for audio corpora).
    * Rows whose payload is not decodable PCM16 WAV are dropped (they
    * carry no frames). Output: input columns + (frame_idx, n_samples,
    * rms). Same partition-batched iteration as [[decodeBatched]] — no
    * driver involvement, payload bytes never leave the executor. */
  def wavFrameEnergy(df: DataFrame, payloadCol: String, frameLen: Int,
                     batchSize: Int = 64): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("n_samples", IntegerType),
      StructField("rms", DoubleType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          wavPcm16(payload).iterator.flatMap { case (_, channels, samples) =>
            val nFrames = samples.length / channels
            (0 until nFrames by frameLen).iterator.map { start =>
              val end = math.min(start + frameLen, nFrames)
              var acc = 0.0
              var f = start
              while (f < end) {
                var c = 0; var mix = 0.0
                while (c < channels) { mix += samples(f * channels + c); c += 1 }
                mix /= channels * 32768.0
                acc += mix * mix
                f += 1
              }
              val n = end - start
              Row.fromSeq(r.toSeq ++ Seq[Any](start / frameLen, n,
                math.sqrt(acc / n)))
            }
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: every `stride`-th frame index up to the decoded frame
    * count, exploded to one row per sampled frame — the video shape. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame = {
    val decoded = if (df.columns.contains("n_frames")) df
      else decodeBatched(df, "payload")
    decoded.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
  }
}
