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
    VectorFunctions.register(spark)
  }
}
