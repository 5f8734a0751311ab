package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** The UDF extension surface. The reference defines exactly one UDF —
  * `distance_km(miles) = miles * 1.60934` (gold/dlt/utilities/utils.py:1-8)
  * — which we port twice:
  *  - [[distanceKm]]: the idiomatic form — a plain column expression that
  *    stays in codegen (what the UDF *should* have been);
  *  - [[distanceKmUdf]]: a genuine Scala UDF registered in the session,
  *    proving the registration surface for users who need real black-box
  *    functions.
  * Scale note: prefer column expressions; a Scala UDF breaks codegen and
  * forces serialization per row — keep them off hot paths.
  */
object Udfs {

  val MilesToKm = 1.60934

  /** Idiomatic: pure expression. */
  def distanceKm(miles: Column): Column = miles * lit(MilesToKm)

  /** Registration surface: real UDF (double math matches the expression
    * form bit-for-bit). */
  val distanceKmUdf: UserDefinedFunction = udf((m: Double) => m * MilesToKm)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("distance_km", distanceKmUdf)
    spark.udf.register("weighted_price_avg", weightedPriceAvg)
    VectorFunctions.register(spark)
  }

  /** Typed UDAF surface: quantity-weighted average price as an
    * `Aggregator[IN, BUF, OUT]`. The buffer keeps exact integer sums
    * (price in cents × integral quantity), so the merge is associative
    * and the result is partitioning-independent — the same determinism
    * rule the engine applies to all money math. */
  case class WAvgIn(price: Double, qty: Double)
  case class WAvgBuf(num: Long, den: Long)

  object WeightedPriceAvg extends org.apache.spark.sql.expressions.Aggregator[WAvgIn, WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0L, 0L)
    override def reduce(b: WAvgBuf, in: WAvgIn): WAvgBuf = {
      val cents = math.round(in.price * 100)
      val q = in.qty.toLong
      WAvgBuf(b.num + cents * q, b.den + q)
    }
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.num + b.num, a.den + b.den)
    override def finish(b: WAvgBuf): Double =
      if (b.den == 0L) 0.0 else b.num.toDouble / (100.0 * b.den.toDouble)
    override def bufferEncoder: org.apache.spark.sql.Encoder[WAvgBuf] =
      org.apache.spark.sql.Encoders.product[WAvgBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  val weightedPriceAvg: UserDefinedFunction = udaf(WeightedPriceAvg)
}
