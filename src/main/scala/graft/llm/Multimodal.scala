package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode/feature kernels run as
  * partition-batched functions over the binary payloads.
  *
  * The IMAGE path is real: [[decodeImage]] / [[resizeImage]] decode and
  * rescale actual PNG/BMP/GIF/JPEG bytes with JDK `javax.imageio` (no
  * external jars). Payloads ImageIO cannot decode fall back to the
  * documented deterministic byte-hash stubs ([[decodeStub]] /
  * [[resizeStub]]) — the no-codec path for formats (audio/video) whose
  * codecs don't ship in this build. Everything around the kernels is the
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

  /** Synthesize a constant-gray BMP payload per row — the fixture side of
    * the real-decode path: dimensions and fill derive from integer columns,
    * so an oracle can recompute exactly what decode must find. Partition-
    * batched like the kernels (writer setup amortizes per partition). */
  def syntheticBmp(df: DataFrame, widthCol: String, heightCol: String,
      grayCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (wi, hi, gi) = (df.schema.fieldIndex(widthCol),
      df.schema.fieldIndex(heightCol), df.schema.fieldIndex(grayCol))
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val w = r.getInt(wi); val h = r.getInt(hi); val g = r.getInt(gi) & 0xff
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** REAL decode kernel: JDK ImageIO (PNG/BMP/GIF/JPEG). Emits decoded
    * width/height and mean Rec.601 luma in [0,1]; payloads ImageIO cannot
    * decode get the [[decodeStub]] fake instead, flagged `decoded_real =
    * false`. Same partition-batched, shuffle-free shape as the stub. */
  def decodeImage(df: DataFrame, contentCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("decoded_width", IntegerType),
      StructField("decoded_height", IntegerType),
      StructField("decoded_mean_luma", DoubleType),
      StructField("decoded_real", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // per-partition codec setup: in-memory streams only, no temp files
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sum += (0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                0.114 * (p & 0xff)) / 255.0
              x += 1
            }
            y += 1
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](w, h, sum / (w.toLong * h), true))
        } else {
          val hh = java.util.Arrays.hashCode(bytes)
          val w = 64 + math.abs(hh % 960)
          val ht = 64 + math.abs((hh / 960) % 960)
          val luma = (math.abs(hh.toLong) % 256).toDouble / 255.0
          Row.fromSeq(r.toSeq ++ Seq[Any](w, ht, luma, false))
        }
      }
    }(enc)
  }

  /** REAL resize kernel: decode → bilinear rescale to (targetWidth,
    * targetHeight) → lossless PNG re-encode. Non-decodable payloads fall
    * back to the [[resizeStub]] byte-stride fake, flagged `resized_real =
    * false`. Partition-batched, no shuffle. */
  def resizeImage(df: DataFrame, contentCol: String,
      targetWidth: Int, targetHeight: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType),
      StructField("resized_real", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img != null) {
          val out = new java.awt.image.BufferedImage(
            targetWidth, targetHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, targetWidth, targetHeight, null)
          g2.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Row.fromSeq(r.toSeq ++ Seq[Any](baos.toByteArray, targetWidth, targetHeight, true))
        } else {
          val budget = math.max(1, targetWidth * targetHeight)
          val ratio = math.max(1, bytes.length / budget)
          val strided = Array.tabulate(math.max(1, (bytes.length + ratio - 1) / ratio)) {
            i => bytes(math.min(i * ratio, bytes.length - 1))
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](strided, targetWidth, targetHeight, false))
        }
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
