package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.FixedPointFunctions._
import graft.functions.FixedPointMath

/** Distributed PCA (top principal component) via power iteration — the
  * embedding-pipeline op behind whitening, de-biasing ("all-but-the-top"),
  * drift probes and low-rank compression diagnostics.
  *
  * Scale decomposition, the part that matters at 100 TB:
  *  - the COVARIANCE is one (i,j)-keyed aggregation: however many vectors
  *    stream through, the shuffle carries d² groups (64² = 4096 here) and
  *    partial aggregation combines map-side — the classic "statistics are
  *    small, data is big" shape;
  *  - the POWER ITERATION then runs entirely on model-sized relations
  *    (the d² covariance joined with the d-row rank vector per step) —
  *    broadcast joins, no data pass at all.
  *
  * Engine parity (every step replayable in any SQL engine): components
  * are 6-dp-quantized before exact sums (means), centered values are
  * exact decimal-derived doubles, per-pair products are 12-dp-quantized
  * before the order-free sum, and the covariance and each iterate are
  * quantized to 9 dp — 9 decimals of O(0.01–1) values is ~11 significant
  * digits, safely below the ~15.9 where Spark's shortest-string rounding
  * and exact-binary rounding diverge (12 decimals sat AT that edge and
  * drifted ~1e-10 over ten iterations). `sqrt` is IEEE-correctly-rounded
  * (unlike exp/ln/pow) so the normalization introduces no cross-engine
  * ulp drift. The eigenvector sign is pinned by the all-positive start
  * vector (1/√d)ᵢ.
  *
  * ARITHMETIC SUBSTRATE (r12): the quantize/sum contract above used to be
  * expressed as `round(x, s).cast(DecimalType(28,12))` + `sum(decimal)` —
  * ~7 BigDecimal allocations per product cell, which priced q312's
  * d²=16.7M-cell × 5-iteration grid at ~10⁴ CPU-s in an allocation-hostile
  * environment. It is now the fixed-point LONG pipeline
  * (graft.functions.FixedPoint): identical quantization points
  * (shortest-string HALF_UP at 6/9/12 dp), exact order-free integer sums
  * with a 26-bit overflow split, correctly-rounded numerator→double
  * conversions — bit-identical values (FixedPointSpec fuzzes every helper
  * against its BigDecimal definition; LlmOpsSpec pins the pipeline against
  * the unchanged SQL-oracle replay), ~zero per-row allocation.
  */
object Pca {

  /** Largest d² the LOCAL power iteration materializes driver-side (d ≤
    * 4000, ≈128 MB of doubles — model-sized). Above it every consumer
    * routes to [[topComponentDistributed]], whose arithmetic is
    * bit-identical. */
  private[llm] val LocalDimCells: Long = 16L * 1000 * 1000

  /** Mean-centered cell relation `(id, i, cx)` — 6-dp-quantized inputs,
    * 9-dp-quantized means, exact decimal-derived doubles out. */
  private[graft] def centeredCells(embs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cells = embs.select(col(idCol).as("id"),
        posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("i", "x")))
      .select(col("id"), col("i"), quantize_fixed(col("x"), 6).as("q6"))
    val n = embs.select(col(idCol)).count()
    val means = cells.groupBy(col("i"))
      .agg(round(sum_fixed(col("q6"), 6) / n, 9)
        .cast(DecimalType(18, 9)).as("m"))
    cells.join(broadcast(means), Seq("i"))
      .select(col("id"), col("i"),
        (fixed_to_double(col("q6"), 6) - col("m").cast("double")).as("cx"))
  }

  /** Quantized covariance matrix of `vecCol`: one row per (i, j) with
    * c = round(Σ (xᵢ−mᵢ)(xⱼ−mⱼ) / N, 9). */
  def covariance(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    covarianceFromCells(centeredCells(embs, idCol, vecCol),
      embs.select(col(idCol)).count())

  /** [[covariance]] over a PRE-COMPUTED centered cell relation `(id, i,
    * cx)` with `n` source vectors — lets a caller that also consumes the
    * cells ([[debiasReport]]) derive them ONCE and share the pinned
    * relation instead of re-running the explode + mean join per consumer. */
  def covarianceFromCells(centeredCells: DataFrame, n: Long): DataFrame = {
    // EXPLICIT partition count on the join key: the cell relation is small
    // (n·d rows) so AQE coalesces its shuffle to a couple of partitions —
    // but the join EXPANDS each id to d² product rows, so the real work is
    // d²/d ≈ d× the shuffled bytes and wants full parallelism. A
    // user-specified repartition(N) is exempt from AQE coalescing.
    val par = centeredCells.sparkSession.sparkContext.defaultParallelism
    // Keying the product join by id caps its parallelism at DISTINCT IDS —
    // fine for a corpus (n ≫ cores), a cliff for the few-vectors/large-d
    // shape (q312: n=3, d=4096 → 3 tasks each expanding 16.7M product
    // rows). There, partition BY ROW INDEX i and run the outer product as
    // a PRIMITIVE KERNEL per i-partition against the broadcast model-sized
    // cell relation (r14 opt, guide §1.2 "per-task work"): the former
    // broadcast-join + hash-aggregate form materialized all n·d² product
    // rows as UnsafeRows through a 524k-groups-per-partition hash map
    // (measured 72+ CPU-s for n=3, d=4096); the kernel runs the same
    // quantize-12 / split-sum / ÷n / quantize-9 arithmetic on long arrays
    // (every (i, j) group is complete within its i-partition — the same
    // no-exchange property the join form exploited). Integer sums are
    // order-free, so the regrouping is bit-identical.
    if (n < par) return covarianceFewVectors(centeredCells, n, par)
    val centered = centeredCells.repartition(par, col("id"))
    val right = centered.select(col("id"), col("i").as("i2"), col("cx").as("cx2"))
    centered.select(col("id"), col("i").as("i1"), col("cx").as("cx1"))
      .join(right, Seq("id"))
      .select(col("i1").as("i"), col("i2").as("j"),
        quantize_fixed(col("cx1") * col("cx2"), 12).as("t"))
      .groupBy(col("i"), col("j"))
      .agg(fixed_to_decimal(
        quantize_fixed(sum_fixed(col("t"), 12) / n, 9), 18, 9).as("c"))
  }

  /** The few-vectors/large-d covariance kernel: one primitive outer-product
    * pass per i-partition. Arithmetic is the join form's, step for step —
    * tₖ = quantize₁₂(cx1·cx2) per id k, Σtₖ as the 26-bit split sums
    * (`sum_fixed`'s exact order-free contract, overflow envelope included),
    * reconstructed via [[FixedPointMath.total]], ÷n in IEEE double, then
    * quantize₉ into a long-backed decimal — so results are bit-identical
    * to the corpus branch and to the SQL-oracle replay. The right side
    * (n·d cells, n < cores) is model-sized by the branch condition — the
    * same relation the join form broadcast. */
  private def covarianceFewVectors(centeredCells: DataFrame, n: Long,
      par: Int): DataFrame = {
    val spark = centeredCells.sparkSession
    import spark.implicits._
    val grid = fewVectorsPacked(centeredCells, n, par).flatMap {
      case (is, js, c9s) => Iterator.tabulate(is.length)(k => (is(k), js(k), c9s(k)))
    }
    grid.toDF("i", "j", "c9")
      .select(col("i"), col("j"), fixed_to_decimal(col("c9"), 18, 9).as("c"))
  }

  /** The few-vectors kernel's raw output: per-partition PACKED primitive
    * arrays of (i, j, 9-dp numerator) — the covariance rows whose i's hash
    * to that partition, exactly [[covarianceFewVectors]]'s values. Exists
    * so the distributed power iteration can consume the kernel output
    * DIRECTLY ([[topComponentDistributedPacked]]), skipping the
    * tuple→DataFrame→array round-trip over the d² grid between the two
    * (r14 opt: measured neutral at d=4096 — the codegen'd round-trip is
    * ~1–2 CPU-s there — but it is one full pass over the grid, and the
    * saving grows with d²). */
  private def fewVectorsPacked(centeredCells: DataFrame, n: Long, par: Int)
      : org.apache.spark.rdd.RDD[(Array[Int], Array[Int], Array[Long])] = {
    val spark = centeredCells.sparkSession
    val cells = centeredCells.select(col("id"), col("i"), col("cx")).collect()
    // per-id present positions + values (ids are caller-typed: key on Any)
    val byId = new scala.collection.mutable.HashMap[Any, (scala.collection.mutable.ArrayBuilder.ofInt, scala.collection.mutable.ArrayBuilder.ofDouble)]
    cells.foreach { r =>
      val (jb, cb) = byId.getOrElseUpdate(r.get(0),
        (new scala.collection.mutable.ArrayBuilder.ofInt,
          new scala.collection.mutable.ArrayBuilder.ofDouble))
      jb += r.getInt(1); cb += r.getDouble(2)
    }
    val rights: Map[Any, (Array[Int], Array[Double])] =
      byId.iterator.map { case (k, (jb, cb)) => k -> (jb.result(), cb.result()) }.toMap
    val dDim = if (cells.isEmpty) 0 else cells.iterator.map(_.getInt(1)).max + 1
    val bcR = spark.sparkContext.broadcast(rights)
    val nD = n.toDouble
    centeredCells.repartition(par, col("i"))
      .select(col("id"), col("i"), col("cx")).rdd
      .mapPartitions { it =>
        val acc = new scala.collection.mutable.HashMap[Int, (Array[Long], Array[Long], Array[Boolean])]
        it.foreach { row =>
          val rs = bcR.value.get(row.get(0))
          if (rs.isDefined) {
            val (js, cxs) = rs.get
            val i1 = row.getInt(1); val cx1 = row.getDouble(2)
            val (hi, lo, has) = acc.getOrElseUpdate(i1,
              (new Array[Long](dDim), new Array[Long](dDim), new Array[Boolean](dDim)))
            var k = 0
            while (k < js.length) {
              val t = FixedPointMath.quantize(cx1 * cxs(k), 12)
              val j = js(k)
              hi(j) += (t >> 26)
              lo(j) += (t & ((1L << 26) - 1))
              has(j) = true
              k += 1
            }
          }
        }
        val ib = new scala.collection.mutable.ArrayBuilder.ofInt
        val jb = new scala.collection.mutable.ArrayBuilder.ofInt
        val cb = new scala.collection.mutable.ArrayBuilder.ofLong
        acc.foreach { case (i1, (hi, lo, has)) =>
          var j = 0
          while (j < dDim) {
            if (has(j)) {
              ib += i1; jb += j
              cb += FixedPointMath.quantize(FixedPointMath.total(hi(j), lo(j), 12) / nD, 9)
            }
            j += 1
          }
        }
        Iterator.single((ib.result(), jb.result(), cb.result()))
      }
  }

  /** Top eigenpair of the covariance by `iters` power-iteration rounds
    * from the uniform unit vector. Returns one row per dimension:
    * `(i, loading, eigenvalue)` — eigenvalue identical on every row.
    *
    * The iteration runs LOCALLY on the collected d² covariance — model
    * parameters, the kmeansCentroids/BpeTrainer.trainCapped economics: a
    * DataFrame-join formulation spent ~20 tiny Spark jobs on lineage
    * truncation (the iterate feeds both its normalizer and the next
    * matvec, so un-checkpointed lineage doubles per round) and was 3× the
    * cost of the covariance pass itself. The local loop replicates the
    * engine arithmetic EXACTLY — shortest-string HALF_UP quantization at
    * the same 9/12-dp points, exact order-free sums (long numerators with
    * `Math.addExact`; the BigDecimal loop only on overflow, unreachable
    * for covariances of O(1)-valued data) — so results are bit-identical
    * to the distributed form and to the SQL oracle. */
  def topComponent(spark: SparkSession, cov: DataFrame, d: Int,
      iters: Int = 10): DataFrame = {
    // The d×d covariance is MODEL-sized state and is iterated on the
    // driver (the bit-replay contract documented above) — that is only
    // sound while d² stays model-sized. Embedding dims in practice are
    // ≤ ~4k (d² ≤ 16M doubles ≈ 128 MB): fail loudly beyond that rather
    // than silently materializing a data-sized matrix driver-side; a
    // larger d needs a distributed eigensolver (power iteration as a
    // d-keyed matrix-vector join per round), not this entry point.
    require(d.toLong * d <= LocalDimCells,
      s"topComponent iterates the d²=${d.toLong * d} covariance on the driver; " +
        "supported for d² <= 16M (d <= 4000). For larger d, run power iteration " +
        "distributed: keep cov as the (i,j)-keyed relation and express each " +
        "round as a matrix-vector join + per-i aggregation.")
    import spark.implicits._
    val c = Array.ofDim[Double](d, d)
    cov.select(col("i"), col("j"), col("c").cast("double")).collect()
      .foreach(r => c(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var v = Array.fill(d)(FixedPointMath.roundExact(1.0 / math.sqrt(d.toDouble), 9))
    var nrm = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L
        var j = 0
        while (j < d) {
          s = Math.addExact(s, FixedPointMath.quantize(c(i)(j) * v(j), 12))
          j += 1
        }
        FixedPointMath.toDouble(s, 12)
      }
      var n2 = 0L
      w.foreach(wi => n2 = Math.addExact(n2, FixedPointMath.quantize(wi * wi, 12)))
      nrm = math.sqrt(FixedPointMath.toDouble(n2, 12))
      v = w.map(wi => FixedPointMath.roundExact(wi / nrm, 9))
    }
    val eig = FixedPointMath.roundExact(nrm, 6)
    v.toSeq.zipWithIndex.map { case (loading, i) => (i, loading, eig) }
      .toDF("i", "loading", "eigenvalue")
  }

  /** The d > 4000 fallback [[topComponent]]'s guard names: power iteration
    * with the covariance KEPT as the (i,j)-keyed distributed relation —
    * each round is one matrix-vector broadcast join + per-i aggregation,
    * and only the d-ROW iterate (never the d² matrix) reaches the driver.
    * Works for sparse/banded covariances too (absent (i,j) entries
    * contribute exact zero, as in the dense loop); every row i must
    * appear (any (i,j) entry, e.g. the diagonal) to receive an iterate.
    *
    * Arithmetic replicates [[topComponent]]'s quantization points exactly
    * — 12-dp product terms, order-free exact sums, 9-dp iterates, 6-dp
    * eigenvalue, IEEE sqrt — so small-d results are bit-identical to the
    * local path (pinned by LlmOpsSpec) and to the SQL oracle's unrolled
    * rounds. The covariance is iteration-invariant: it is packed once into
    * per-partition primitive arrays and persisted, and each round runs as
    * a primitive split-sum pass over the packed form (the iterate and the
    * per-partition partials are O(d); the d² matrix never leaves the
    * executors).
    */
  def topComponentDistributed(spark: SparkSession, cov: DataFrame, d: Int,
      iters: Int = 10): DataFrame = {
    import spark.implicits._
    // r14 opt (guide §1.2 "per-task work"): the former per-round
    // broadcast-join + aggregate scanned the d²-row checkpointed relation
    // through the full UnsafeRow/codegen stack every round (~35 CPU-s for
    // 5 rounds at d=4096). The relation is iteration-invariant, so pack it
    // ONCE into per-partition primitive arrays, persist those, and run each
    // matvec as a tight long-split-sum loop — identical arithmetic
    // (quantize-12 terms, `sum_fixed`'s exact 26-bit split sums with the
    // same overflow envelope, round-9 iterates), so results stay
    // bit-identical to the local path and the SQL oracle. Per-task scratch
    // is O(d) — the same order as the broadcast iterate was — and only
    // per-partition present-i partials (O(d) each) reach the driver, never
    // the d² matrix.
    val packed = cov.select(col("i"), col("j"), col("c").cast("double").as("c"))
      .as[(Int, Int, Double)].rdd
      .mapPartitions { it =>
        val ib = new scala.collection.mutable.ArrayBuilder.ofInt
        val jb = new scala.collection.mutable.ArrayBuilder.ofInt
        val cb = new scala.collection.mutable.ArrayBuilder.ofDouble
        it.foreach { r => ib += r._1; jb += r._2; cb += r._3 }
        Iterator.single((ib.result(), jb.result(), cb.result()))
      }
    topComponentDistributedPacked(spark, packed, d, iters)
  }

  /** [[topComponentDistributed]] over an ALREADY-PACKED covariance — the
    * fused few-vectors path ([[debiasReport]]) hands the kernel output
    * straight in, skipping the d²-row DataFrame materialization. `c`
    * doubles must equal the DataFrame form's `c.cast("double")` (the
    * caller converts 9-dp numerators via [[FixedPointMath.toDouble]],
    * correctly rounded ≡ Decimal(18,9)→double), so results stay
    * bit-identical across both entries. */
  private[llm] def topComponentDistributedPacked(spark: SparkSession,
      packed0: org.apache.spark.rdd.RDD[(Array[Int], Array[Int], Array[Double])],
      d: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val packed =
      packed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val loMask = (1L << 26) - 1
      var vArr = Array.fill(d)(FixedPointMath.roundExact(1.0 / math.sqrt(d.toDouble), 9))
      var vHas = Array.fill(d)(true)
      var nrm = 0.0
      for (_ <- 1 to iters) {
        val bcV = spark.sparkContext.broadcast((vArr, vHas))
        // an i receives an iterate iff some (i, j ∈ v) entry exists — the
        // inner matvec join's semantics, sparse/banded covariances included
        val partials = packed.mapPartitions { it =>
          val (va, vh) = bcV.value
          val hi = new Array[Long](d); val lo = new Array[Long](d)
          val has = new Array[Boolean](d)
          it.foreach { case (is, js, cs) =>
            var k = 0
            while (k < is.length) {
              val j = js(k)
              if (vh(j)) {
                val t = FixedPointMath.quantize(cs(k) * va(j), 12)
                val i = is(k)
                hi(i) += (t >> 26)
                lo(i) += (t & loMask)
                has(i) = true
              }
              k += 1
            }
          }
          val idx = new scala.collection.mutable.ArrayBuilder.ofInt
          val hs = new scala.collection.mutable.ArrayBuilder.ofLong
          val ls = new scala.collection.mutable.ArrayBuilder.ofLong
          var i = 0
          while (i < d) {
            if (has(i)) { idx += i; hs += hi(i); ls += lo(i) }
            i += 1
          }
          Iterator.single((idx.result(), hs.result(), ls.result()))
        }.collect()
        bcV.destroy()
        val hiS = new Array[Long](d); val loS = new Array[Long](d)
        val has = new Array[Boolean](d)
        partials.foreach { case (idx, hs, ls) =>
          var k = 0
          while (k < idx.length) {
            val i = idx(k); hiS(i) += hs(k); loS(i) += ls(k); has(i) = true
            k += 1
          }
        }
        // wᵢ → normalizer → next iterate, replicating the per-round SQL
        // exactly: split-sum total → double, quantize(wᵢ², 12) split-summed
        // over present rows, round(wᵢ/‖w‖, 9)
        val w = new Array[Double](d)
        var n2hi = 0L; var n2lo = 0L
        var i = 0
        while (i < d) {
          if (has(i)) {
            val wi = FixedPointMath.total(hiS(i), loS(i), 12)
            w(i) = wi
            val t = FixedPointMath.quantize(wi * wi, 12)
            n2hi += (t >> 26); n2lo += (t & loMask)
          }
          i += 1
        }
        nrm = math.sqrt(FixedPointMath.total(n2hi, n2lo, 12))
        val nv = new Array[Double](d)
        i = 0
        while (i < d) {
          if (has(i)) nv(i) = FixedPointMath.roundExact(w(i) / nrm, 9)
          i += 1
        }
        vArr = nv; vHas = has
      }
      val eig = FixedPointMath.roundExact(nrm, 6)
      (0 until d).filter(vHas).map(i => (i, vArr(i), eig))
        .toDF("i", "loading", "eigenvalue")
    } finally packed.unpersist(blocking = false)
  }

  /** Top-k eigenpairs via DEFLATION: extract the top component, subtract
    * its rank-1 contribution from the covariance (C ← C − λ·vvᵀ, the
    * Hotelling deflation), repeat. Returns one row per (component,
    * dimension): `(comp, i, loading, eigenvalue)`, comp = 0-based rank.
    *
    * The deflation arithmetic is engine-exact like everything else here:
    * the rank-1 term λ·vᵢ·vⱼ is 12-dp-quantized (λ the 6-dp quantized
    * eigenvalue, v the 9-dp iterate), and the deflated entry re-quantizes
    * to 9 dp — the covariance's own contract — so local, distributed, and
    * SQL replays stay bit-identical round for round. "All-but-the-top"
    * de-biasing classically removes the top FEW directions (Mu & Viswanath
    * use d/100); this is that k. */
  def topComponents(spark: SparkSession, cov: DataFrame, d: Int, k: Int,
      iters: Int = 10): DataFrame = {
    var c = cov
    val parts = (0 until k).map { comp =>
      val top = topComponent(spark, c, d, iters)
      if (comp < k - 1) {
        val rows = top.select(col("i"), col("loading"), col("eigenvalue"))
          .collect() // d rows — model-sized
        val eig = rows.head.getDouble(2)
        val v = Array.ofDim[Double](d)
        rows.foreach(r => v(r.getInt(0)) = r.getDouble(1))
        val sess = spark
        import sess.implicits._
        // deflated covariance, quantized at the covariance contract: the
        // local matrix is model-sized so the deflation is a driver map
        val cArr = Array.ofDim[Double](d, d)
        c.select(col("i"), col("j"), col("c").cast("double")).collect()
          .foreach(r => cArr(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        val deflated = for { i <- 0 until d; j <- 0 until d } yield {
          val t = FixedPointMath.roundExact(eig * v(i) * v(j), 12)
          (i, j, FixedPointMath.roundExact(cArr(i)(j) - t, 9))
        }
        c = deflated.toDF("i", "j", "c")
          .select(col("i"), col("j"), col("c").cast(DecimalType(18, 9)).as("c"))
      }
      top.select(lit(comp).as("comp"), col("i"), col("loading"), col("eigenvalue"))
    }
    parts.reduce(_ unionByName _)
  }

  /** [[topComponents]] with the covariance kept DISTRIBUTED throughout
    * (the d > 4000 path): each extraction is [[topComponentDistributed]],
    * each deflation one broadcast join of the d-row component onto the
    * (i,j) relation — the d² matrix never reaches the driver. Quantization
    * points identical to the local path (bit-identical at small d, pinned
    * by spec). Absent (i,j) entries of a SPARSE covariance deflate to
    * −λ·vᵢ·vⱼ ≠ 0, so deflation densifies: fine for k·d² work distributed,
    * and exactly what the algebra requires. */
  def topComponentsDistributed(spark: SparkSession, cov: DataFrame, d: Int,
      k: Int, iters: Int = 10): DataFrame = {
    var c = cov.select(col("i"), col("j"), col("c"))
    val parts = (0 until k).map { comp =>
      val top = topComponentDistributed(spark, c, d, iters)
        .localCheckpoint() // two consumers: output + deflation join
      if (comp < k - 1) {
        val eig = top.select(col("eigenvalue")).head().getDouble(0)
        val v = top.select(col("i"), col("loading"))
        // densify on the full (i,j) grid: sparse entries deflate off zero
        val grid = spark.range(d).select(col("id").cast("int").as("i"))
          .crossJoin(spark.range(d).select(col("id").cast("int").as("j")))
        c = grid
          .join(c, Seq("i", "j"), "left")
          .join(broadcast(v.select(col("i"), col("loading").as("vi"))), Seq("i"))
          .join(broadcast(v.select(col("i").as("j"), col("loading").as("vj"))), Seq("j"))
          .select(col("i"), col("j"),
            fixed_to_decimal(quantize_fixed(
              coalesce(col("c").cast("double"), lit(0.0)) -
                fixed_to_double(quantize_fixed(
                  lit(eig) * col("vi") * col("vj"), 12), 12), 9), 18, 9).as("c"))
          .localCheckpoint() // pin: next extraction iterates over it
      }
      top.select(lit(comp).as("comp"), col("i"), col("loading"), col("eigenvalue"))
    }
    parts.reduce(_ unionByName _)
  }

  /** All-but-the-top de-biasing report (Mu & Viswanath 2018): remove each
    * vector's projection on the top principal component — the cheap
    * post-processing that restores isotropy to embedding spaces (the top
    * direction is usually a corpus-wide frequency artifact, and nearest-
    * neighbor quality improves once it is gone). Returns per vector
    * `(id, top_proj, norm_before, norm_after)` — norm_after < norm_before
    * exactly when the vector leaned on the removed direction.
    *
    * Scale shape: the component comes from [[topComponent]] (model-sized);
    * the de-bias pass is one broadcast join of the d-row component onto
    * the cell relation + two per-id aggregations. 12-dp-quantized
    * dot-product terms keep every number engine-exact. */
  def debiasReport(spark: SparkSession, embs: DataFrame, idCol: String,
      vecCol: String, d: Int, iters: Int = 10,
      forceDistributed: Boolean = false): DataFrame = {
    // ONE derivation of the corpus-sized cell relation, PINNED: three
    // consumers need it (the covariance pass and both de-bias joins), and
    // un-pinned each would re-run the explode + broadcast-mean join over
    // the full corpus — 3 linear passes where 1 suffices (the TextRank
    // iteration-invariant lineage-pin precedent, TextRank.scala).
    val n = embs.select(col(idCol)).count()
    val centered = centeredCells(embs, idCol, vecCol).localCheckpoint()
    // model-sized d iterates locally; past the driver guard the SAME
    // report routes through the distributed power iteration (bit-identical
    // arithmetic — the d-row component is all the de-bias joins consume,
    // so the d² covariance never reaches the driver on that path).
    // `forceDistributed` is the spec hook pinning local ≡ distributed.
    val distributed = forceDistributed || d.toLong * d > LocalDimCells
    val par = spark.sparkContext.defaultParallelism
    val comp = (if (!distributed)
        topComponent(spark, covarianceFromCells(centered, n), d, iters)
      else if (n < par) {
        // FUSED few-vectors path (r14 opt): the covariance kernel's packed
        // per-partition arrays feed the power iteration directly — same
        // branch condition, same kernel, same arithmetic as
        // covarianceFromCells → topComponentDistributed, minus the d²-row
        // DataFrame round-trip in between (9-dp numerator → double here ≡
        // the DF path's Decimal(18,9).cast(double), correctly rounded)
        val packed = fewVectorsPacked(centered, n, par).map { case (is, js, c9s) =>
          val cs = new Array[Double](c9s.length)
          var k = 0
          while (k < c9s.length) { cs(k) = FixedPointMath.toDouble(c9s(k), 9); k += 1 }
          (is, js, cs)
        }
        topComponentDistributedPacked(spark, packed, d, iters)
      } else topComponentDistributed(spark, covarianceFromCells(centered, n), d, iters))
      .select(col("i"), col("loading"))
    val p = centered.join(broadcast(comp), Seq("i"))
      .select(col("id"), quantize_fixed(col("cx") * col("loading"), 12).as("t"))
      .groupBy(col("id"))
      .agg(sum_fixed(col("t"), 12).as("p"))
    centered.join(broadcast(comp), Seq("i"))
      .join(p, Seq("id"))
      .select(col("id"), col("cx"), col("p"),
        (col("cx") - col("p") * col("loading")).as("dv"))
      .groupBy(col("id"))
      .agg(round(max(col("p")), 6).as("top_proj"),
        round(sqrt(sum_fixed(quantize_fixed(col("cx") * col("cx"), 12), 12)), 6)
          .as("norm_before"),
        round(sqrt(sum_fixed(quantize_fixed(col("dv") * col("dv"), 12), 12)), 6)
          .as("norm_after"))
  }
}
