package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FixedPointMath => F}
import graft.functions.FixedPointFunctions._

/** The fixed-point long pipeline must be BIT-IDENTICAL to its BigDecimal
  * definition — it replaced the decimal arithmetic under the PCA oracle
  * contract (Pca.scala), so any divergence is a silent hash break. Every
  * helper is fuzzed against the definition, with the adversarial cases
  * (near-ties, negative ties, band edges, > 2⁵³ numerators) hammered
  * explicitly. */
class FixedPointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refQuantize(x: Double, s: Int): Long =
    java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def refToDouble(num: Long, s: Int): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(num), s).doubleValue()

  test("quantize ≡ BigDecimal.valueOf.setScale(HALF_UP) over random magnitudes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000000) {
      // magnitudes 1e-9 .. 1e4 across both signs — the PCA value range and beyond
      val x = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.between(-8, 5))
      val s = Seq(6, 9, 12)(rnd.nextInt(3))
      assert(F.quantize(x, s) == refQuantize(x, s), s"x=$x scale=$s")
    }
  }

  test("quantize: adversarial near-tie values at every scale") {
    // doubles straddling k + 0.5 numerator boundaries: construct from the
    // tie decimal itself and walk ulps both ways
    for (s <- Seq(6, 9, 12); k <- Seq(-3L, -1L, 0L, 1L, 7L, 999999L, -999999L)) {
      val tie = new java.math.BigDecimal(java.math.BigInteger.valueOf(2 * k + 1), s + 1)
      val base = tie.doubleValue()
      var x = base
      for (step <- -5 to 5) {
        val y = Math.fma(step.toDouble, Math.ulp(x), x)
        assert(F.quantize(y, s) == refQuantize(y, s), s"scale=$s k=$k step=$step y=$y")
      }
      x = base
    }
  }

  test("quantize: exact decimals and integer boundaries round-trip") {
    for (s <- Seq(6, 9, 12); num <- -2000L to 2000L) {
      val x = F.toDouble(num, s)
      assert(F.quantize(x, s) == refQuantize(x, s), s"num=$num scale=$s")
    }
  }

  test("toDouble ≡ BigDecimal.doubleValue incl. numerators past 2^53") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500000) {
      val num = rnd.nextLong() >> rnd.nextInt(40) // magnitudes from 2^63 down
      val s = Seq(6, 9, 12)(rnd.nextInt(3))
      assert(F.toDouble(num, s) == refToDouble(num, s), s"num=$num scale=$s")
    }
    // exact boundary cases
    for (num <- Seq(F.TwoPow53, -F.TwoPow53, F.TwoPow53 + 1, -F.TwoPow53 - 1,
        Long.MaxValue, Long.MinValue, 0L, 1L, -1L))
      assert(F.toDouble(num, 12) == refToDouble(num, 12), s"num=$num")
  }

  test("total reconstructs split sums exactly, incl. past the long window") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200000) {
      val terms = Array.fill(rnd.nextInt(50) + 1)(rnd.nextLong() >> 14)
      val hi = terms.map(_ >> 26).sum
      val lo = terms.map(_ & ((1L << 26) - 1)).sum
      val exact = terms.foldLeft(java.math.BigInteger.ZERO)(
        (a, t) => a.add(java.math.BigInteger.valueOf(t)))
      val want = new java.math.BigDecimal(exact, 12).doubleValue()
      assert(F.total(hi, lo, 12) == want, s"terms=${terms.mkString(",")}")
    }
    // forced slow path: hiSum beyond ±2^36
    val bigHi = (1L << 40) + 12345L
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(bigHi).shiftLeft(26)
        .add(java.math.BigInteger.valueOf(99L)), 12).doubleValue()
    assert(F.total(bigHi, 99L, 12) == want)
  }

  test("roundExact ≡ BigDecimal round-to-double at 6/9/12 dp") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 500000) {
      val x = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.between(-6, 4))
      val s = Seq(6, 9, 12)(rnd.nextInt(3))
      val want = java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(F.roundExact(x, s) == want, s"x=$x scale=$s")
    }
  }

  test("column pipeline ≡ decimal pipeline on a dataframe (codegen path)") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(20000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.between(-6, 3)))
    val df = xs.zipWithIndex.map { case (x, i) => (i % 7, x) }.toDF("g", "x")
      .localCheckpoint()
    // the exact shape Pca uses: quantize each term, exact group sum, double out
    val fast = df.select($"g", quantize_fixed($"x" * $"x" - $"x", 12).as("t"))
      .groupBy($"g").agg(sum_fixed($"t", 12).as("s"))
      .select($"g", $"s").as[(Int, Double)].collect().toMap
    val slow = df.select($"g",
        ($"x" * $"x" - $"x").cast(DecimalType(28, 12)).as("p"))
      .groupBy($"g").agg(sum($"p").cast("double").as("s"))
      .select($"g", $"s").as[(Int, Double)].collect().toMap
    assert(fast == slow)
    // and the decimal-output shape (covariance contract)
    val fastDec = df.select($"g", quantize_fixed($"x", 12).as("t"))
      .groupBy($"g")
      .agg(fixed_to_decimal(quantize_fixed(sum_fixed($"t", 12) / 3L, 9), 18, 9).as("c"))
      .select($"g", $"c".cast("string")).as[(Int, String)].collect().toMap
    val slowDec = df.select($"g", ($"x").cast(DecimalType(28, 12)).as("p"))
      .groupBy($"g")
      .agg(round(sum($"p").cast("double") / 3L, 9).cast(DecimalType(18, 9)).as("c"))
      .select($"g", $"c".cast("string")).as[(Int, String)].collect().toMap
    assert(fastDec == slowDec)
  }

  test("Pca fixed-point pipeline ≡ legacy decimal formulation, bit-identical (q312 shape, d=512)") {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.DataFrame
    val d = 512
    val embs = spark.range(3).select($"id".cast("long").as("vec_id"))
      .select($"vec_id", transform(sequence(lit(0), lit(d - 1)),
        i => ((($"vec_id" + 1) * 31 + i.cast("long") * 17) % 97)
          .cast("double") / 97.0).as("embedding"))
      .localCheckpoint()

    // the r11 decimal formulation, verbatim (the hash-green oracle twin)
    def legacyCentered(e: DataFrame): (DataFrame, Long) = {
      val cells = e.select($"vec_id".as("id"),
          posexplode(transform($"embedding", _.cast("double"))).as(Seq("i", "x")))
        .select($"id", $"i", round($"x", 6).cast(DecimalType(20, 6)).as("q"))
      val n = e.count()
      val means = cells.groupBy($"i")
        .agg(round(sum($"q").cast("double") / n, 9).cast(DecimalType(18, 9)).as("m"))
      (cells.join(broadcast(means), Seq("i"))
        .select($"id", $"i", ($"q".cast("double") - $"m".cast("double")).as("cx")), n)
    }
    def legacyCov(centered: DataFrame, n: Long): DataFrame = {
      val par = centered.sparkSession.sparkContext.defaultParallelism
      val c2 = if (n < par) centered.repartition(par) else centered.repartition(par, $"id")
      val right = c2.select($"id", $"i".as("i2"), $"cx".as("cx2"))
      c2.select($"id", $"i".as("i1"), $"cx".as("cx1"))
        .join(if (n < par) broadcast(right) else right, Seq("id"))
        .select($"i1".as("i"), $"i2".as("j"),
          ($"cx1" * $"cx2").cast(DecimalType(28, 12)).as("p"))
        .groupBy($"i", $"j")
        .agg(round(sum($"p").cast("double") / n, 9).cast(DecimalType(18, 9)).as("c"))
    }

    val (legCent, n) = legacyCentered(embs)
    val newCent = graft.llm.Pca.centeredCells(embs, "vec_id", "embedding")
    val legCentM = legCent.select($"i", $"id", $"cx").as[(Int, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val newCentM = newCent.select($"i", $"id", $"cx").as[(Int, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(newCentM.size == legCentM.size &&
      newCentM.forall { case (k, v) =>
        java.lang.Double.doubleToLongBits(legCentM(k)) ==
          java.lang.Double.doubleToLongBits(v) },
      "centered cells drifted")

    val legCovM = legacyCov(legCent, n)
      .select($"i", $"j", $"c".cast("string")).as[(Int, Int, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val newCovM = graft.llm.Pca.covarianceFromCells(newCent, n)
      .select($"i", $"j", $"c".cast("string")).as[(Int, Int, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(newCovM.size == legCovM.size &&
      newCovM.forall { case (k, v) => legCovM(k) == v },
      "covariance drifted")

    // legacy distributed matvec round vs the fixed-point one, one round
    val cov = graft.llm.Pca.covarianceFromCells(newCent, n).localCheckpoint()
    val covD = cov.select($"i", $"j", $"c".cast("double").as("c")).localCheckpoint()
    val v0 = spark.range(d).select($"id".cast("int").as("j"),
      round(lit(1.0) / sqrt(lit(d.toDouble)), 9).as("vj")).localCheckpoint()
    val legacyW = covD.join(broadcast(v0), Seq("j"))
      .select($"i", round($"c" * $"vj", 12).cast(DecimalType(28, 12)).as("p"))
      .groupBy($"i").agg(sum($"p").cast("double").as("wi"))
      .as[(Int, Double)].collect().toMap
    val newW = covD.join(broadcast(v0), Seq("j"))
      .select($"i", quantize_fixed($"c" * $"vj", 12).as("t"))
      .groupBy($"i").agg(sum_fixed($"t", 12).as("wi"))
      .as[(Int, Double)].collect().toMap
    assert(newW.size == legacyW.size && newW.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(legacyW(k)) ==
        java.lang.Double.doubleToLongBits(v) }, "matvec drifted")
  }
}
