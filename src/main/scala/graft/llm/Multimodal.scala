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

  /** Synthesize a two-gray checkerboard PNG payload per row — the
    * PNG-codec fixture (the BMP fixture exercises only ImageIO's
    * uncompressed-BMP walker; PNG goes through DEFLATE decompression and
    * scanline unfiltering, a genuinely different decoder). The checker
    * keeps mean luma closed-form: pixel (x,y) is g1 when (x+y) is even
    * else g2, so an oracle recomputes
    * `(⌈wh/2⌉·g1 + ⌊wh/2⌋·g2) / (255·wh)` exactly. PNG is lossless, so
    * the decode must return these exact pixels. Partition-batched like
    * every media kernel. */
  def syntheticCheckerPng(df: DataFrame, widthCol: String, heightCol: String,
      g1Col: String, g2Col: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (wi, hi, g1i, g2i) = (df.schema.fieldIndex(widthCol),
      df.schema.fieldIndex(heightCol), df.schema.fieldIndex(g1Col),
      df.schema.fieldIndex(g2Col))
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val w = r.getInt(wi); val h = r.getInt(hi)
        val g1 = r.getInt(g1i) & 0xff; val g2 = r.getInt(g2i) & 0xff
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb1 = (g1 << 16) | (g1 << 8) | g1
        val rgb2 = (g2 << 16) | (g2 << 8) | g2
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, if (((x + y) & 1) == 0) rgb1 else rgb2)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** Synthesize a PNG of an 8×8 grid of hash-derived gray cells rendered
    * at `scale` px per cell (image = 8s × 8s). The pattern is a function
    * of RELATIVE position only, so two scales of one seed are the same
    * picture at different resolutions — the cross-RESOLUTION dedup
    * fixture [[dhash64]] needs (the cross-CODEC fixture q256 uses exact
    * pixel signatures, which resizing defeats by construction). */
  def syntheticBlockPng(df: DataFrame, seedCol: String, scaleCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (si, sci) = (df.schema.fieldIndex(seedCol), df.schema.fieldIndex(scaleCol))
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      def mix(z0: Long): Long = {
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      rows.map { r =>
        val seed = r.getLong(si); val s = r.getInt(sci)
        val img = new java.awt.image.BufferedImage(
          8 * s, 8 * s, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            val g = (math.abs(mix(seed * 64 + cy * 8 + cx)) % 256).toInt
            val rgb = (g << 16) | (g << 8) | g
            var y = cy * s
            while (y < (cy + 1) * s) {
              var x = cx * s
              while (x < (cx + 1) * s) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            cx += 1
          }
          cy += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** PERCEPTUAL difference hash (dHash): decode → 9×8 bilinear grayscale
    * → 64-bit signature, bit (y·8+x) set when luma(x+1,y) > luma(x,y).
    * Robust to resizing and codec changes (only luma ORDERINGS survive,
    * not values) — the resize-robust image-dedup signature; near-dups are
    * found by small Hamming distance, so pair search composes with the
    * SimHash banded join (precision then exact via bit_count). Payloads
    * ImageIO cannot decode hash their raw bytes instead, flagged
    * `dhash_real = false`. Partition-batched kernel, no shuffle. */
  def dhash64(df: DataFrame, contentCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("dhash", LongType),
      StructField("dhash_real", BooleanType)))
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
          val small = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = small.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, 9, 8, null)
          g2.dispose()
          var h = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              def luma(px: Int): Double =
                0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) + 0.114 * (px & 0xff)
              if (luma(small.getRGB(x + 1, y)) > luma(small.getRGB(x, y)))
                h |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](h, true))
        } else {
          Row.fromSeq(r.toSeq ++ Seq[Any](
            java.util.Arrays.hashCode(bytes).toLong, false))
        }
      }
    }(enc)
  }

  /** Synthesize a constant-gray JPEG payload per row — the lossy-codec
    * fixture (DCT + quantization + Huffman through ImageIO's JPEG reader
    * and writer). A constant image is pure DC: quantization moves the
    * decoded level by at most a couple of codes, so decode is pinned with
    * an ERROR-BOUND verdict (|decoded − g/255| small), not exact luma —
    * the honest contract for a lossy codec. */
  def syntheticJpeg(df: DataFrame, widthCol: String, heightCol: String,
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
        javax.imageio.ImageIO.write(img, "jpg", baos)
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

  // ── Video: fixed-frame container + REAL per-frame ImageIO decode ──────
  //
  // A "video" here is the simplest honest container: `n` equal-size BMP
  // frames concatenated, so [[frameSample]]'s fixed `frameBytes` slices
  // land exactly on frame boundaries and the sampled frames are REAL
  // images the existing [[decodeImage]] kernel decodes. That is the
  // frame-sampling pipeline shape (sample → decode only the kept frames —
  // decode cost scales with frames KEPT, not frames stored); a production
  // codec would swap the slicer for a keyframe index, nothing else moves.

  /** Byte size of one 16×16 TYPE_INT_RGB BMP as ImageIO writes it — the
    * fixed frame stride of [[syntheticVideo]] containers. */
  lazy val bmpFrameBytes: Int = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.size()
  }

  /** Synthetic video fixture: `nFramesCol` constant-gray 16×16 BMP frames
    * back to back, frame f filled with gray ((seed·7 + f·31) mod 256) —
    * closed-form per frame, so per-frame decode output is oracle-
    * replayable. Emits a `content` binary column. */
  def syntheticVideo(df: DataFrame, seedCol: String, nFramesCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (si, ni) = (df.schema.fieldIndex(seedCol), df.schema.fieldIndex(nFramesCol))
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val seed = r.getLong(si); val nf = r.getInt(ni)
        val out = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < nf) {
          val g = ((seed * 7 + f * 31) % 256).toInt
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < 16) { var x = 0; while (x < 16) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          javax.imageio.ImageIO.write(img, "bmp", out)
          f += 1
        }
        Row.fromSeq(r.toSeq :+ out.toByteArray)
      }
    }(enc)
  }

  /** Decode the SAMPLED frames of a fixed-stride video column: slice with
    * [[frameSample]] (keep every `everyNth`), explode, and run the real
    * [[decodeImage]] kernel on each kept frame. Output: one row per
    * (input row, sampled frame) with `frame_idx` (position in the FULL
    * frame sequence) and the decoded columns. Decode work is proportional
    * to frames kept — the reason pipelines sample before decoding. */
  def decodeVideoFrames(df: DataFrame, contentCol: String,
      frameBytes: Int, everyNth: Int): DataFrame = {
    val passthrough = df.columns.filterNot(_ == contentCol).map(col)
    val sampled = frameSample(df, contentCol, frameBytes, everyNth)
      .select(passthrough :+ posexplode(col("frames")).as(Seq("__pos", "frame")): _*)
      .withColumn("frame_idx", col("__pos") * everyNth)
      .drop("__pos")
    decodeImage(sampled, "frame").drop("frame")
  }

  // ── Audio: REAL RIFF/PCM16 WAV kernels ────────────────────────────────
  //
  // Same contract as the image path: a real byte-level codec inside the
  // partition-batched mapPartitions shape, with deterministic synthetic
  // fixtures whose content derives from integer columns in closed form —
  // so the decode outputs are INTEGER-exact and a SQL oracle can replay
  // them (generate_series over the same sample formula).

  /** Synthetic PCM16 mono WAV fixture: `nSamplesCol` samples at
    * `sampleRate`, sample i = ((seed·31 + i·7919) mod 20001) − 10000 —
    * integer-only (no trig), so an oracle recomputes every byte's worth
    * of signal exactly. Emits a `content` binary column holding a
    * complete RIFF/WAVE file (44-byte canonical header + LE samples). */
  def syntheticWav(df: DataFrame, seedCol: String, nSamplesCol: String,
      sampleRate: Int = 8000): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("content", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val (si, ni) = (df.schema.fieldIndex(seedCol), df.schema.fieldIndex(nSamplesCol))
    df.mapPartitions { rows =>
      rows.map { r =>
        val seed = r.getLong(si); val n = r.getInt(ni)
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
          .putShort(2).putShort(16) // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(2 * n)
        var i = 0
        while (i < n) {
          bb.putShort((((seed * 31 + i.toLong * 7919) % 20001) - 10000).toShort)
          i += 1
        }
        Row.fromSeq(r.toSeq :+ bb.array())
      }
    }(enc)
  }

  /** REAL audio decode kernel: walks the RIFF chunk list (fmt + data) of a
    * PCM16 WAV payload and emits integer-exact signal statistics —
    * sample rate, channel count, frame count, duration, peak |amplitude|,
    * Σ sample² (the exact energy; RMS = sqrt(sum_sq/n) when a float is
    * wanted), and sign-change zero crossings. Non-WAV / non-PCM16
    * payloads yield nulls with `decoded_real = false` (no fake numbers on
    * the audio path). Shuffle-free mapPartitions, like [[decodeImage]]. */
  def decodeWav(df: DataFrame, contentCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("peak_abs", IntegerType),
      StructField("sum_sq", LongType),
      StructField("zero_crossings", LongType),
      StructField("decoded_real", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val decoded = parseWavPcm16(bytes)
        decoded match {
          case Some((rate, ch, samples)) =>
            val n = samples.length / ch // frames
            var peak = 0; var sumSq = 0L; var zc = 0L
            var i = 0
            var prevNeg = false
            while (i < samples.length) {
              val s = samples(i).toInt
              if (math.abs(s) > peak) peak = math.abs(s)
              sumSq += s.toLong * s
              val neg = s < 0
              if (i > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            Row.fromSeq(r.toSeq ++ Seq[Any](
              rate, ch, n, n.toLong * 1000L / rate, peak, sumSq, zc, true))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null, null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** (sampleRate, channels, samples) of a PCM16 RIFF/WAVE payload, or
    * None when the bytes are not one. Tolerates extra chunks (LIST etc.)
    * between fmt and data, per the RIFF spec. */
  private def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4() = { val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII") }
    if (tag4() != "RIFF") return None
    bb.getInt // riff size
    if (tag4() != "WAVE") return None
    var rate = 0; var ch = 0; var bits = 0
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val chunk = tag4(); val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      if (chunk == "fmt ") {
        val fmt = bb.getShort; ch = bb.getShort
        rate = bb.getInt; bb.getInt; bb.getShort; bits = bb.getShort
        if (fmt != 1) return None // PCM only
        bb.position(bb.position() + len - 16)
      } else if (chunk == "data") {
        if (rate <= 0 || ch <= 0 || bits != 16) return None
        val n = len / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort; i += 1 }
        samples = out
      } else bb.position(bb.position() + len + (len & 1)) // chunks pad to even
    }
    Option(samples).map((rate, ch, _))
  }
}
