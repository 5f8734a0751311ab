package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode/feature kernels run as
  * partition-batched functions over the binary payloads.
  *
  * The *decode kernels themselves are STUBS* — no image/audio codec
  * libraries ship in this build — implemented as deterministic fakes over
  * the raw bytes (documented per function). Everything around them is the
  * real Spark plumbing a production pipeline needs: the schema, the
  * `mapPartitions` batch shape (the JVM analog of `mapInPandas` — one
  * iterator per partition so a kernel can amortize model/codec setup),
  * partition sizing, and the column contracts.
  *
  * Scale notes: binary payloads never hit the driver; `withMediaMeta` and
  * the expression-based features are narrow codegen'd ops; the
  * mapPartitions kernel preserves partitioning (no shuffle). Re-partition
  * upstream by `spark.sql.files.maxPartitionBytes` so each task's batch
  * of blobs fits executor memory.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),      // image | audio | video | text
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),    // null unless image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)  // null unless audio/video
  ))

  /** Attach the metadata struct to a binary `content` column. Width/
    * height/duration are decode-derived in a real pipeline; here they stay
    * null until a decode kernel fills them. */
  def withMediaMeta(df: DataFrame, contentCol: String, kind: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(kind).as("kind"),
      length(col(contentCol)).cast("long").as("n_bytes"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** Expression-path content features (no kernel needed): byte count and a
    * content digest — both engine-portable, codegen'd. */
  def contentFeatures(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(contentCol)).cast("long"))
      .withColumn("digest", md5(col(contentCol)))

  /** STUB "decode": a real pipeline would decode the image/audio payload
    * here (OpenCV / libsndfile / ffmpeg behind a partition-batched kernel).
    * This fake derives deterministic pseudo-dimensions from the byte
    * content so the downstream schema/partition plumbing is fully
    * exercised and testable without codecs. */
  def decodeStub(df: DataFrame, contentCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("decoded_width", IntegerType),
      StructField("decoded_height", IntegerType),
      StructField("decoded_mean_luma", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // One iterator per partition: a real kernel would initialize its
      // codec/model ONCE here, then stream the batch through it.
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // ??? real decode goes here; deterministic fake below.
        val h = java.util.Arrays.hashCode(bytes)
        val w = 64 + math.abs(h % 960)
        val ht = 64 + math.abs((h / 960) % 960)
        val luma = (math.abs(h.toLong) % 256).toDouble / 255.0
        Row.fromSeq(r.toSeq ++ Seq[Any](w, ht, luma))
      }
    }(enc)
  }

  /** STUB "resize": a real pipeline would decode → scale → re-encode here
    * (the classic image-normalization pass before feature extraction).
    * The fake keeps every `ratio`-th byte — deterministic, shape-correct
    * (output length = ceil(n/ratio)) — and fills the media_meta
    * width/height the way a real resize kernel would, so downstream
    * consumers can rely on the metadata contract. Same partition-batched
    * `mapPartitions` shape as [[decodeStub]] (codec init amortizes per
    * partition, no shuffle). */
  def resizeStub(df: DataFrame, contentCol: String,
      targetWidth: Int, targetHeight: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // ??? real decode→scale→encode goes here; deterministic fake below:
        // byte-stride downsample to the target "pixel budget".
        val budget = math.max(1, targetWidth * targetHeight)
        val ratio = math.max(1, bytes.length / budget)
        val out = Array.tabulate(math.max(1, (bytes.length + ratio - 1) / ratio)) {
          i => bytes(math.min(i * ratio, bytes.length - 1))
        }
        Row.fromSeq(r.toSeq ++ Seq[Any](out, targetWidth, targetHeight))
      }
    }(enc)
  }

  /** Chunk a binary payload into fixed-size "frames" (array<binary>) and
    * keep every `everyNth` — the frame-sampling shape for video. Pure
    * expressions: `sequence` + `substring` on binary. */
  def frameSample(df: DataFrame, contentCol: String, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(length(col(contentCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("frames",
      transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % everyNth === 0),
        i => col(contentCol).substr(i * frameBytes + 1, lit(frameBytes))))
      .withColumn("n_frames_sampled", size(col("frames")))
  }
}
