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

  // ── Mergeable fixed-bin histogram sketches ─────────────────────────────
  //
  // The quantile analog of the stored-HLL rollup (q278): each shard (e.g.
  // a day of ingest) reduces its values to a BINS-long count array — a
  // mergeable, storable sketch a few hundred bytes wide — and corpus
  // quantiles come from summing sketches, never re-scanning shards. The
  // estimator is deterministic (bin LEFT edge at the ceil(q·N)-th count),
  // so unlike t-digest/KLL the whole pipeline replays exactly in any
  // engine: merge = elementwise +, quantile = one cumulative scan of a
  // BINS-row relation. Error is bounded by bin width — the data-card /
  // drift-monitor use case, where a fixed budget beats an adaptive one.

  /** Per-key fixed-bin histogram sketch of `valueCol` over [lo, hi):
    * `keys... , hist: array<long>` (values clamped into the edge bins, so
    * mass is never lost; NULL values are dropped). One shuffle on
    * (keys, bin), then a model-sized per-key array assembly. */
  def histogramSketch(df: DataFrame, keys: Seq[String], valueCol: Column,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val binW = (hi - lo) / bins
    val bin = least(greatest(floor((valueCol - lo) / binW), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    df.filter(valueCol.isNotNull)
      .groupBy((keys.map(col) :+ bin.as("__bin")): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("__bin"), col("__n"))).as("__e"))
      .select((keys.map(col) :+
        transform(sequence(lit(0), lit(bins - 1)),
          i => coalesce(element_at(map_from_entries(col("__e")), i), lit(0L)))
          .as("hist")): _*)
  }

  /** Merge stored sketches to coarser keys: elementwise array sum
    * (commutative — order of shards cannot matter). */
  def mergeHistogramSketches(df: DataFrame, keys: Seq[String],
      histCol: String = "hist"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(aggregate(collect_list(col(histCol)),
        transform(sequence(lit(1), size(first(col(histCol)))), _ => lit(0L)),
        (acc, x) => zip_with(acc, x, (a, b) => a + b)).as(histCol))

  /** Deterministic percentile estimates from a histogram sketch: for each
    * integer percent p the LEFT edge of the first bin whose cumulative
    * count reaches ceil(p·N/100). One row per (key, p): `keys..., pct,
    * estimate, n`. Integer percents keep the threshold arithmetic exact —
    * `ceil(0.95·N)` in IEEE doubles rounds the wrong way exactly at
    * integer boundaries, `(p·N + 99) div 100` never does. The cumulative
    * scan is per-(key, bin) over a BINS-row relation — sketch math, no
    * data pass. */
  def histogramQuantiles(df: DataFrame, keys: Seq[String], pcts: Seq[Int],
      lo: Double, hi: Double, histCol: String = "hist"): DataFrame = {
    require(pcts.forall(p => p >= 1 && p <= 100), "percents must be in 1..100")
    val exploded = df
      .select((keys.map(col) :+ col(histCol) :+
        posexplode(col(histCol)).as(Seq("__bin", "__cnt"))): _*)
      .withColumn("__bins", size(col(histCol)))
      .withColumn("__n", aggregate(col(histCol), lit(0L), (a, x) => a + x))
      .withColumn("__cum", expr(
        s"aggregate(slice($histCol, 1, __bin + 1), 0L, (a, x) -> a + x)"))
    exploded
      .select((keys.map(col) :+ col("__bin") :+ col("__bins") :+ col("__cum") :+
        col("__n") :+ explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct")): _*)
      .filter(col("__n") > 0 &&
        col("__cum") >= expr("(pct * __n + 99) div 100"))
      .groupBy((keys.map(col) :+ col("pct")): _*)
      .agg(min(col("__bin")).as("__b"), first(col("__bins")).as("__bins"),
        first(col("__n")).as("n"))
      .select((keys.map(col) :+ col("pct") :+
        (lit(lo) + col("__b").cast("double") *
          ((lit(hi) - lit(lo)) / col("__bins").cast("double"))).as("estimate") :+
        col("n")): _*)
  }

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

  /** Welch's unequal-variance t-test between groups `a` and `b` on
    * `valueCol`: one grouped-conditional aggregation collects exact
    * decimal-summed (n, Σy, Σy²) per arm (y quantized to 6 decimals), then
    * the t statistic and Welch–Satterthwaite degrees of freedom are
    * closed-form IEEE arithmetic on those exact scalars — bit-identical in
    * any engine, no tolerance band. Arms with n < 2, or a zero standard
    * error, emit null t/df. Width (12,6) keeps the y² product's raw
    * arithmetic inside int64 in ANY engine (same caveat as [[corrMatrix]]);
    * values need |y| ≲ 3·10³. */
  def welchT(df: DataFrame, groupCol: String, valueCol: Column,
      a: String, b: String): DataFrame = {
    val g = col(groupCol)
    val y = round(valueCol.cast("double"), 6).cast(DecimalType(12, 6))
    val agg = df.filter(g === a || g === b).agg(
      count(when(g === a, 1)).as("n_a"),
      sum(when(g === a, y)).as("s_a"),
      sum(when(g === a, y * y)).as("ss_a"),
      count(when(g === b, 1)).as("n_b"),
      sum(when(g === b, y)).as("s_b"),
      sum(when(g === b, y * y)).as("ss_b"))
    def mean(s: String, n: String) = col(s).cast("double") / col(n).cast("double")
    // sample variance from exact sums: (Σy² − (Σy)²/n) / (n−1)
    def variance(ss: String, s: String, n: String) = {
      val nD = col(n).cast("double")
      (col(ss).cast("double") - col(s).cast("double") * col(s).cast("double") / nD) /
        (nD - lit(1.0))
    }
    val va = variance("ss_a", "s_a", "n_a"); val vb = variance("ss_b", "s_b", "n_b")
    val qa = va / col("n_a").cast("double"); val qb = vb / col("n_b").cast("double")
    val se2 = qa + qb
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val t = (mean("s_a", "n_a") - mean("s_b", "n_b")) / sqrt(se2)
    // Welch–Satterthwaite: (qa+qb)² / (qa²/(na−1) + qb²/(nb−1))
    val dfW = se2 * se2 /
      (qa * qa / (col("n_a").cast("double") - 1.0) +
        qb * qb / (col("n_b").cast("double") - 1.0))
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0, mean("s_a", "n_a")).as("mean_a"),
      when(col("n_b") > 0, mean("s_b", "n_b")).as("mean_b"),
      // round(6) absorbs the one-ulp spread engines show on the longer
      // dependent-expression chains (decimal→double casts differ in their
      // final rounding step across engines)
      when(ok && se2 > 0.0, round(t, 6)).as("t"),
      when(ok && se2 > 0.0, round(dfW, 6)).as("df"))
  }

  /** Exact grouped weighted median: the smallest value whose cumulative
    * weight reaches half the group's total (the lower weighted median).
    * One grouped (key, value) weight-sum, a per-key cumulative window, and
    * the half-total test `2·cum ≥ total` in INTEGER arithmetic — no
    * division anywhere, so the result is a data value picked by exact
    * comparisons and any engine agrees bit-for-bit. The windows partition
    * by key (value-distinct rows, not raw rows), never globally. */
  def weightedMedian(df: DataFrame, keyCol: String,
      valueCol: Column, weightCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = valueCol.cast("double")
    val byV = df.groupBy(col(keyCol), v.as("v"))
      .agg(sum(weightCol.cast("long")).as("w"))
    val keyW = Window.partitionBy(col(keyCol))
    val cumW = keyW.orderBy(col("v"))
    byV
      .withColumn("cum", sum(col("w")).over(cumW))
      .withColumn("total", sum(col("w")).over(keyW))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col(keyCol))
      .agg(min(col("v")).as("weighted_median"))
  }

  /** Population stability index between a baseline and a comparison
    * distribution over fixed equal-width bins:
    * `PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` — the standard drift alarm
    * (< 0.1 stable, > 0.25 drifted). Bin counts are exact integers, the
    * ratios divide exact operands, each term is rounded to 12 decimals
    * and decimal-summed (order-proof), and only bins populated on BOTH
    * sides contribute (the conventional treatment — a bin empty on either
    * side has no finite term). Output one row:
    * (n_base, n_cmp, n_bins_used, psi). */
  def psi(base: DataFrame, cmp: DataFrame, valueCol: Column,
      lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins > 0 && hi > lo, "need nbins > 0 and hi > lo")
    def bins(df: DataFrame, cName: String): DataFrame = {
      val x = valueCol.cast("double")
      val b = least(floor((x - lit(lo)) / (lit(hi) - lit(lo)) * lit(nbins)).cast("long"),
        lit(nbins - 1L))
      df.filter(x >= lo && x <= hi).groupBy(b.as("bin"))
        .agg(count(lit(1)).as(cName))
    }
    val joined = bins(base, "cb").join(bins(cmp, "cc"), Seq("bin"))
    val tot = joined.agg(sum(col("cb")).as("tb"), sum(col("cc")).as("tc"))
    // totals are per-POPULATED-bin sums on each side, so p and q are both
    // proper distributions over the shared support
    val p = col("cb").cast("double") / col("tb").cast("double")
    val q = col("cc").cast("double") / col("tc").cast("double")
    joined.crossJoin(tot)
      .withColumn("term",
        round((p - q) * log(p / q), 12).cast(DecimalType(28, 12)))
      .agg(max(col("tb")).as("n_base"), max(col("tc")).as("n_cmp"),
        count(lit(1)).as("n_bins_used"),
        (round(sum(col("term")).cast("double"), 6) + lit(0.0)).as("psi"))
  }

  /** Robust grouped outlier report via the median absolute deviation:
    * per group — median (exact lower median, see [[weightedMedian]]),
    * MAD = median(|x − median|), and the count of rows with
    * |x − median| > k·MAD. Both medians are exact data-value picks, the
    * comparison is IEEE on identical operands — deterministic end to end,
    * unlike mean/stddev z-scores this cannot be dragged by the outliers
    * it is hunting. Groups with MAD = 0 report outliers as the count of
    * values different from the median (the k·0 threshold degenerates to
    * "any deviation"). Output: (key, n, median, mad, n_outliers). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: Column,
      k: Double = 3.0): DataFrame = {
    val vals = df.select(col(keyCol), valueCol.cast("double").as("__x"))
    val med = weightedMedian(vals, keyCol, col("__x"), lit(1L))
      .withColumnRenamed("weighted_median", "median")
    val dev = vals.join(med, keyCol)
      .withColumn("__d", abs(col("__x") - col("median")))
    val mad = weightedMedian(dev, keyCol, col("__d"), lit(1L))
      .withColumnRenamed("weighted_median", "mad")
    dev.join(mad, keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        count(when(col("__d") > lit(k) * col("mad"), 1)).as("n_outliers"))
  }

  /** Smoothed target encoding (the leakage-prone-but-standard categorical
    * feature): `enc(c) = (Σ_c y + m·prior) / (n_c + m)` with the global
    * mean as prior — additive smoothing pulls rare categories toward it.
    * Sums are decimal-exact; the blend is IEEE on identical operands,
    * rounded to 6. `scale` sets the target's quantization — keep the
    * summed raw magnitude under 2^53 so the decimal→double cast is exact
    * in every engine (scale 2 for money, 6 for unit-range labels).
    * Output: (category, n, encoded). */
  def targetEncode(df: DataFrame, catCol: String, targetCol: Column,
      smoothing: Double = 20.0, scale: Int = 6): DataFrame = {
    val y = round(targetCol.cast("double"), scale).cast(DecimalType(20, scale))
    val global = df.agg(sum(y).as("gs"), count(lit(1)).as("gn"))
    val prior = col("gs").cast("double") / col("gn").cast("double")
    df.groupBy(col(catCol)).agg(count(lit(1)).as("n"), sum(y).as("s"))
      .crossJoin(global)
      .select(col(catCol), col("n"),
        round((col("s").cast("double") + lit(smoothing) * prior) /
          (col("n").cast("double") + lit(smoothing)), 6).as("encoded"))
  }

  /** Exact grouped discrete percentiles, division-free: for each integer
    * percent p, the smallest value whose cumulative count satisfies
    * `100·cum ≥ p·total` — [[weightedMedian]]'s half-total rule
    * generalized to any band set. One (key, value) count, one per-key
    * cumulative window, then every requested band reads off the same
    * cumulated table (the explode multiplies rows by |percents|, a
    * constant). Integer comparisons only — engine-exact. Output:
    * (key, p, value). */
  def percentileDisc(df: DataFrame, keyCol: String,
      valueCol: Column, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be integers in [1, 100]")
    import org.apache.spark.sql.expressions.Window
    val v = valueCol.cast("double")
    val byV = df.groupBy(col(keyCol), v.as("v"))
      .agg(count(lit(1)).as("w"))
    val keyW = Window.partitionBy(col(keyCol))
    byV
      .withColumn("cum", sum(col("w")).over(keyW.orderBy(col("v"))))
      .withColumn("total", sum(col("w")).over(keyW))
      .withColumn("p", explode(array(percents.map(p => lit(p)): _*)))
      .filter(col("cum") * 100 >= col("p") * col("total"))
      .groupBy(col(keyCol), col("p"))
      .agg(min(col("v")).as("value"))
  }

  /** Grouped Gini coefficient from the rank formula
    * `G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx)` over ascending-sorted values
    * (i = 1-based rank). Tied values contribute the same total whatever
    * their order, so any deterministic tie-break gives the same G; the
    * products run in DECIMAL(12,2)·rank integer space (exact), and the
    * single edge division is IEEE on identical operands. Requires
    * non-negative values (callers filter). */
  def groupedGini(df: DataFrame, keyCol: String, valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = round(valueCol.cast("double"), 2).cast(DecimalType(12, 2))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("x"))
    val ranked = df.select(col(keyCol), x.as("x"))
      .withColumn("i", row_number().over(w))
    val agg = ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * (col("i") * 2)).as("six")) // Σ 2i·xᵢ (exact decimal)
    agg.select(col(keyCol), col("n"),
      when(col("sx") =!= 0,
        (col("six").cast("double") - (col("n") + 1).cast("double") * col("sx").cast("double")) /
          (col("n").cast("double") * col("sx").cast("double"))).as("gini"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns: the contingency table is one grouped count (|X|·|Y| cells —
    * tiny however large the input), expected counts come from per-row/
    * per-column totals over that cell table, and each (O−E)²/E term is
    * rounded to 12 decimals and summed as DECIMAL(28,12) so aggregation
    * order can't move bits (same trick as [[groupedEntropy]]). Output one
    * row: (n, n_rows, n_cols, dof, chi2). */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col(xCol)).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col(yCol)).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col(xCol)).as("n_rows"),
      count_distinct(col(yCol)).as("n_cols"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double")
    val oD = col("o").cast("double")
    cells.join(rowTot, xCol).join(colTot, yCol).crossJoin(tot)
      .withColumn("term",
        round((oD - e) * (oD - e) / e, 12).cast(DecimalType(28, 12)))
      .groupBy(col("n"), col("n_rows"), col("n_cols"))
      .agg(sum(col("term")).cast("double").as("chi2"))
      .select(col("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"), col("chi2"))
  }
}
