package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth half of the ANN story
  * (ProductQuantizer is the search half): symmetric per-vector int8
  * quantization stores a 64-dim float vector in 64 bytes + one scale,
  * a 4× cut (8× vs float64) that at 100 TB of embeddings is the
  * difference between shipping 25 TB and 6 TB to a training job.
  *
  * Everything is closed-form column algebra (transform/aggregate — all
  * codegen'd, zero shuffles, no UDFs), so quantization composes with any
  * scan and the quality audit is oracle-checkable: scale = max|x|/127,
  * code_i = round(x_i/scale), reconstruction x̂_i = code_i·scale.
  */
object Quantization {

  private def asDouble(vecCol: Column): Column = transform(vecCol, _.cast("double"))

  /** Per-vector symmetric scale: max|x| mapped to the int8 extreme. Zero
    * vectors get scale 0 and all-zero codes (guarded division). */
  def int8Scale(vecCol: Column): Column =
    aggregate(asDouble(vecCol), lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0

  /** Quantize to array<tinyint> codes. */
  def int8Codes(vecCol: Column, scaleCol: Column): Column =
    transform(asDouble(vecCol),
      x => when(scaleCol === 0.0, lit(0))
        .otherwise(round(x / scaleCol, 0)).cast("tinyint"))

  /** Reconstruct doubles from codes + scale. */
  def dequantize(codesCol: Column, scaleCol: Column): Column =
    transform(codesCol, c => c.cast("double") * scaleCol)

  /** (id, scale, codes): the stored quantized form. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scaled = df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("scale", int8Scale(col("__v")))
    scaled.select(col(idCol), col("scale"),
      int8Codes(col("__v"), col("scale")).as("codes"))
  }

  /** Per-vector reconstruction-quality audit: max abs error and RMS error
    * of the dequantized vector vs the original. The quantization contract
    * made measurable — symmetric int8 bounds max_err by scale/2, and the
    * audit proves it on the actual data rather than asserting it. */
  def int8ErrorAudit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val errs = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("scale", int8Scale(col("__v")))
      .withColumn("__errs", when(col("scale") === 0.0,
          transform(col("__v"), x => abs(x)))
        .otherwise(transform(col("__v"),
          x => abs(x - round(x / col("scale"), 0) * col("scale")))))
    errs.select(col(idCol),
      round(col("scale"), 6).as("scale"),
      round(aggregate(col("__errs"), lit(0.0), (a, x) => greatest(a, x)), 6).as("max_err"),
      round(sqrt(aggregate(col("__errs"), lit(0.0), (a, x) => a + x * x)
        / size(col("__errs"))), 6).as("rms_err"))
  }
}
