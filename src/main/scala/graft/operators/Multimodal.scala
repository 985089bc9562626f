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
  * The actual media decoding is STUBBED — no image/audio libraries exist in
  * this container — with deterministic fakes that depend only on the
  * payload bytes. Everything around the stub is real and tested: the
  * schema contract, the batching shape, the partition parallelism, and the
  * column plumbing. Swap `stubDecode` for a JNI/Java codec and the
  * pipeline is production-shaped.
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
  // STUB: deterministic fake decode. A real deployment replaces ONLY the
  // body of this function (e.g. javax.imageio / ffmpeg JNI); signature and
  // batch shape stay.
  // =====================================================================
  private[operators] def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 640 + 1, n % 480 + 1, n % 30 + 1) // fake width/height/frames
  }

  /** STUB feature extractor: `dim` pseudo-features derived arithmetically
    * from payload length and position — deterministic and re-expressible in
    * the oracle SQL, standing in for an embedding model's output. */
  private[operators] def stubFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i => ((payload.length.toLong * (i + 7)) % 1000).toFloat / 1000f)

  /** Batched "decode": groups each partition's rows into ≤`batchSize`
    * batches (the mapInPandas/Arrow batch shape), runs the stub decoder
    * per row within a batch, and emits metadata columns. Output schema:
    * input columns + (width, height, n_frames, n_bytes). */
  def decodeBatched(df: DataFrame, payloadCol: String,
                    batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType), StructField("n_bytes", LongType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec once here
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val (w, h, f) = stubDecode(payload)
          // Seq[Any]: a plain Seq(w,h,f,long) would numeric-widen the Ints
          Row.fromSeq(r.toSeq ++ Seq[Any](w, h, f, payload.length.toLong))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batched feature extraction → `features: array<float>` column. */
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
          Row.fromSeq(r.toSeq :+ stubFeatures(payload, dim).toSeq)
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
