package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.functions.{lit, shiftright, sum}
import org.apache.spark.sql.types._

/** Exact fixed-point arithmetic over LONG numerators — the allocation-free
  * twin of the engine's decimal quantization contract.
  *
  * The PCA/de-bias pipeline (Pca.scala) quantizes every product term to a
  * 12-dp decimal and sums decimals exactly so results replay bit-identically
  * in any SQL engine. Expressed through `round(x, s).cast(DecimalType(28,12))`
  * + `sum(decimal)` that contract costs ~7 short-lived `BigDecimal`
  * allocations per row (Round, Cast, and the precision-38 sum buffer each
  * allocate), which dominated q312's 16.7M-cell × 5-iteration grid. This
  * module computes the SAME values on primitive longs:
  *
  *  - [[FixedPointMath.quantize]](x, s) returns the unscaled numerator of
  *    `BigDecimal.valueOf(x).setScale(s, HALF_UP)` — Spark's exact
  *    `round`/`cast(decimal)` semantics (shortest-string, HALF_UP). The hot
  *    path is pure double/long arithmetic, PROVABLY equal to the BigDecimal
  *    form whenever the scaled value sits farther from a rounding tie than
  *    the multiply's error band (± (ulp(x·10ˢ) + 10ˢ·ulp(x))/2); the ~10⁻⁴
  *    of inputs inside the band fall back to BigDecimal itself.
  *  - sums of numerators are exact and ORDER-FREE (integer addition is
  *    associative), so shuffle/partial-agg order cannot move a result —
  *    the property the decimal sums were bought for.
  *  - [[FixedPointFunctions.sum_fixed]] guards overflow by summing the
  *    numerator SPLIT hi = t >> 26, lo = t & (2²⁶−1) as two longs and
  *    reconstructing exactly (BigInteger past 2⁶² — per GROUP, not per
  *    row). Sound while each group's Σ|hi| < 2⁶³: with |term| ≤ 10¹⁶
  *    (value ≤ 10⁴ at scale 12) that is ~6×10¹⁰ rows per group — a
  *    60-billion-vector corpus for the covariance's per-(i,j) group,
  *    an order beyond a 100 TB embedding table.
  *  - [[FixedPointMath.toDouble]] converts numerator→double correctly
  *    rounded (exact long / exact power of ten, one IEEE division —
  *    `BigDecimal.doubleValue`'s own compact fast path), so downstream
  *    doubles equal the decimal pipeline's `cast(double)` bit for bit.
  *
  * FixedPointSpec fuzzes every helper against its BigDecimal definition
  * (random magnitudes, adversarial near-ties, negative ties, > 2⁵³
  * numerators); LlmOpsSpec pins the rewritten PCA end-to-end against the
  * unchanged local replay and the SQL oracle.
  */
object FixedPointMath {
  /** 10^i as double — exact for i ≤ 22; we use i ≤ 18. */
  private val Pow10: Array[Double] = Array.tabulate(19)(i => math.pow(10, i))

  private final val TwoPow52 = 4.503599627370496e15
  final val TwoPow53: Long = 9007199254740992L

  /** Unscaled numerator of `BigDecimal.valueOf(x).setScale(scale, HALF_UP)`.
    * Throws (loudly) on NaN/Infinity and on numerators beyond Long — both
    * outside every caller's domain (|x| < 9.2×10¹⁸⁻ˢ). */
  def quantize(x: Double, scale: Int): Long = {
    val p = Pow10(scale)
    val y = x * p
    if (java.lang.Math.abs(y) < TwoPow52) {
      val f = java.lang.Math.floor(y)
      val frac = y - f
      // |true_decimal·10ˢ − y| ≤ 10ˢ·ulp(x)/2 (shortest-string distance)
      //                        + ulp(y)/2     (the multiply's rounding)
      val band = 0.5 * (java.lang.Math.ulp(y) + p * java.lang.Math.ulp(x))
      // Rounding to nearest is continuous except at half points: certain
      // whenever frac is farther than the band from 0.5. (Near 0 or 1 the
      // true value may sit on the other side of the integer, but both
      // sides round to the same integer.)
      if (frac > 0.5 + band || frac < 0.5 - band)
        return f.toLong + (if (frac > 0.5) 1L else 0L)
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** `new BigDecimal(BigInteger.valueOf(num), scale).doubleValue()` —
    * correctly rounded decimal→double. Fast path: numerator ≤ 2⁵³ is exact
    * as a double and 10ˢ is exact, so ONE IEEE division is the correctly
    * rounded answer. */
  def toDouble(num: Long, scale: Int): Double =
    if (num >= -TwoPow53 && num <= TwoPow53) num.toDouble / Pow10(scale)
    else new java.math.BigDecimal(java.math.BigInteger.valueOf(num), scale)
      .doubleValue()

  /** `round(x, scale)` with exact HALF_UP decimal semantics — quantize,
    * then correctly-rounded back to double. Driver-side twin of Spark's
    * `round` for the local power-iteration loops. */
  def roundExact(x: Double, scale: Int): Double = toDouble(quantize(x, scale), scale)

  /** Reconstruct Σ terms from the split sums (hi = t >> 26, lo = t & mask)
    * and convert correctly rounded. Exact: Σt = (Σhi)·2²⁶ + Σlo. */
  def total(hiSum: Long, loSum: Long, scale: Int): Double =
    if (hiSum >= -(1L << 36) && hiSum <= (1L << 36) && loSum >= 0L && loSum <= (1L << 61))
      toDouble((hiSum << 26) + loSum, scale)
    else
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(hiSum).shiftLeft(26)
          .add(java.math.BigInteger.valueOf(loSum)), scale).doubleValue()

  /** Long-backed `Decimal(precision ≤ 18, scale)` from a numerator —
    * `createUnsafe` skips the changePrecision BigDecimal round-trip; the
    * caller guarantees |num| < 10^precision (quantize outputs of O(1)
    * values do). */
  def toDecimal(num: Long, precision: Int, scale: Int): Decimal =
    Decimal.createUnsafe(num, precision, scale)
}

/** `double → long` numerator at `scale`, HALF_UP — exact `round(x, scale)
  * .cast(decimal)` semantics on primitives. */
case class QuantizeFixed(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "quantize_fixed"
  override protected def nullSafeEval(x: Any): Any =
    FixedPointMath.quantize(x.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedPointMath.quantize($c, $scale)")
  override protected def withNewChildInternal(c: Expression): QuantizeFixed =
    copy(child = c)
}

/** `long numerator → double`, correctly rounded (≡ `decimal.cast(double)`). */
case class FixedToDouble(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fixed_to_double"
  override protected def nullSafeEval(x: Any): Any =
    FixedPointMath.toDouble(x.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedPointMath.toDouble($c, $scale)")
  override protected def withNewChildInternal(c: Expression): FixedToDouble =
    copy(child = c)
}

/** `long numerator → Decimal(precision, scale)` long-backed, no BigDecimal. */
case class FixedToDecimal(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {
  require(precision <= Decimal.MAX_LONG_DIGITS,
    s"FixedToDecimal is the compact (long-backed) constructor; precision " +
      s"$precision > ${Decimal.MAX_LONG_DIGITS}")
  override def dataType: DataType = DecimalType(precision, scale)
  override def prettyName: String = "fixed_to_decimal"
  override protected def nullSafeEval(x: Any): Any =
    FixedPointMath.toDecimal(x.asInstanceOf[Long], precision, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FixedPointMath.toDecimal($c, $precision, $scale)")
  override protected def withNewChildInternal(c: Expression): FixedToDecimal =
    copy(child = c)
}

/** Reconstructed split-sum → double (see [[FixedPointFunctions.sum_fixed]]). */
case class FixedTotal(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fixed_total"
  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    FixedPointMath.total(hi.asInstanceOf[Long], lo.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.FixedPointMath.total($a, $b, $scale);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FixedTotal =
    copy(left = l, right = r)
}

object FixedPointFunctions {
  private val LoBits = 26
  private val LoMask = (1L << LoBits) - 1

  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Exact numerator of `x` quantized to `scale` decimals, HALF_UP. */
  def quantize_fixed(x: Column, scale: Int): Column =
    col(QuantizeFixed(expr(x), scale))

  /** Correctly-rounded double of a numerator column. */
  def fixed_to_double(num: Column, scale: Int): Column =
    col(FixedToDouble(expr(num), scale))

  /** Compact `Decimal(precision, scale)` of a numerator column. */
  def fixed_to_decimal(num: Column, precision: Int, scale: Int): Column =
    col(FixedToDecimal(expr(num), precision, scale))

  /** Aggregate: exact Σ of numerator column `t` → correctly-rounded double
    * (≡ `sum(decimal).cast(double)`). Sums the 26-bit split as two plain
    * long sums — order-free, zero per-row allocation, overflow-free to
    * ~6×10¹⁰ rows/group at |term| ≤ 10¹⁶ — and reconstructs per group. */
  def sum_fixed(t: Column, scale: Int): Column = {
    val hi = sum(shiftright(t, LoBits))
    val lo = sum(t.bitwiseAND(lit(LoMask)))
    col(FixedTotal(expr(hi), expr(lo), scale))
  }
}
