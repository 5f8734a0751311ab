package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed statistics primitives — the experiment-analysis surface a
  * product-analytics engine needs next to funnels/cohorts. Everything is
  * one aggregation pass producing a handful of scalars; the arithmetic
  * after the aggregate is plain IEEE double math on exact (integer or
  * decimal-summed) inputs, so results are bit-identical across engines
  * and the DuckDB oracle can replay them without tolerance bands.
  */
object Stats {

  /** Two-proportion z-test between groups `a` and `b`: per-group trials
    * and successes (exact integer counts), conversion rates, and the
    * pooled-variance z statistic
    * `z = (pa - pb) / sqrt(p(1-p)(1/na + 1/nb))`.
    *
    * One row out; the only cluster work is one conditional-count agg.
    * Division and sqrt are exactly-rounded IEEE ops — no rounding fudge
    * needed for engine portability. */
  def abTestZ(df: DataFrame, groupCol: String, successCol: Column,
      a: String, b: String): DataFrame = {
    val g = col(groupCol)
    val agg = df.filter(g === a || g === b).agg(
      count(when(g === a, 1)).as("n_a"),
      count(when(g === a && successCol, 1)).as("conv_a"),
      count(when(g === b, 1)).as("n_b"),
      count(when(g === b && successCol, 1)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val zDenom = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    // degenerate designs (an empty arm, or an all/none-converted pool with
    // zero pooled variance) emit null instead of tripping ANSI ÷0
    val ok = col("n_a") > 0 && col("n_b") > 0
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, pa).as("rate_a"),
      when(col("n_b") > 0, pb).as("rate_b"),
      when(ok && zDenom =!= 0.0, (pa - pb) / zDenom).as("z"))
  }

  /** Per-group simple linear regression (closed-form least squares):
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²), intercept = ȳ − slope·x̄.
    *
    * The five sufficient statistics are one grouped aggregation —
    * regression at 100 TB is just a sum pass. To keep partial-aggregation
    * order out of the result, x is required integral (cast to long) and y
    * is summed as DECIMAL(28,6) after rounding to 6 decimals; the
    * closed-form arithmetic then runs on exact doubles. Groups with zero
    * x-variance emit null slope/intercept. */
  def groupedLinReg(df: DataFrame, keyCol: String,
      xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("long")
    val y = round(yCol.cast("double"), 6).cast(DecimalType(28, 6))
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"),
      sum(x * x).as("sxx"),
      sum(y).as("sy"),
      sum(y * x).as("sxy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val sxxD = col("sxx").cast("double")
    val syD = col("sy").cast("double"); val sxyD = col("sxy").cast("double")
    val denom = nD * sxxD - sxD * sxD
    val slope = when(denom =!= 0.0, (nD * sxyD - sxD * syD) / denom)
    agg.select(col(keyCol), col("n"),
      slope.as("slope"),
      when(denom =!= 0.0, (syD - slope * sxD) / nD).as("intercept"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns, computed
    * from ONE aggregation pass (count + per-column Σx, Σx² + per-pair Σxy
    * — 2c + c(c−1)/2 + 1 scalars total, then pure driver-free column
    * arithmetic). Inputs are quantized to DECIMAL(12, `scale`) so every
    * sufficient statistic is exact regardless of partial-agg order; the
    * closed-form correlation then runs on exactly-rounded IEEE doubles —
    * oracle-portable with no tolerance. Width 12 keeps cross-products
    * inside 64-bit raw arithmetic in ANY engine (DuckDB multiplies
    * DECIMAL(≤18) pairs in int64 — an (18,6)² price product overflows
    * there); values need |x| < 10^(12−scale). Constant columns emit null.
    * Output: (col_a, col_b, corr), one row per unordered pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    def q(c: String): Column =
      round(col(c).cast("double"), scale).cast(DecimalType(12, scale))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggExprs =
      (count(lit(1)).as("n") +:
        cols.flatMap(c => Seq(sum(q(c)).as(s"s_$c"), sum(q(c) * q(c)).as(s"ss_$c")))) ++
        pairs.map { case (a, b) => sum(q(a) * q(b)).as(s"p_${a}_$b") }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val nD = col("n").cast("double")
    pairs.map { case (a, b) =>
      val sa = col(s"s_$a").cast("double"); val sb = col(s"s_$b").cast("double")
      val ssa = col(s"ss_$a").cast("double"); val ssb = col(s"ss_$b").cast("double")
      val sab = col(s"p_${a}_$b").cast("double")
      val va = nD * ssa - sa * sa
      val vb = nD * ssb - sb * sb
      one.select(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va > 0.0 && vb > 0.0,
          (nD * sab - sa * sb) / sqrt(va * vb)).as("corr"))
    }.reduce(_ unionByName _)
  }

  /** Shannon entropy (nats) of `valueCol`'s distribution within each
    * group: −Σ p·ln p over the value frequencies. Two aggregations (value
    * counts, then the entropy fold) plus one group-keyed join. Each
    * p·ln p term is rounded to 12 decimals and summed as DECIMAL(28,12) —
    * aggregation order can't move bits and the oracle replays the
    * identical term series; the final round(6) absorbs libm `ln` last-ulp
    * spread across engines. Output: (group, n_values, entropy). */
  def groupedEntropy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cnts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val tot = cnts.groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_values"))
    val p = col("cnt").cast("double") / col("tot").cast("double")
    cnts.join(tot, groupCol)
      .withColumn("term", round(p * log(p), 12).cast(DecimalType(28, 12)))
      .groupBy(col(groupCol))
      .agg(max(col("n_values")).as("n_values"),
        // + 0.0 normalizes the degenerate group's -0.0 to +0.0 (a boxed
        // -0.0 is not `equals` +0.0, and the oracle emits +0.0)
        (round(-sum(col("term")).cast("double"), 6) + lit(0.0)).as("entropy"))
  }
}
