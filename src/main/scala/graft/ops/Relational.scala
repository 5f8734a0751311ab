package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reusable relational operators re-expressing the reference's transform
  * surface (SURVEY.md §2.3–§2.7) as idiomatic, codegen-friendly Spark.
  *
  * Reference provenance (all PySpark in the reference):
  *  - dropColumns: utils/transformations.py:1-5 (`reuseable.dropcolumn`)
  *  - bucketize:   silver_Dimensions.py:151-153 (`duration_flag` when/otherwise)
  *  - latestByKey: DimUser.py:24 / FactStream.py:16 (`sequence_by` dedup —
  *    keep highest sequence per business key within a batch)
  *
  * Scale notes: every operator below stays inside whole-stage codegen
  * (pure `Column` expressions / window functions); `latestByKey` is a
  * single hash-partition shuffle on the business keys — the minimum any
  * per-key reduction needs — and the window variant avoids a join back.
  */
object Relational {

  /** P1 — the reference's whole "reusable utilities" module. */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** P3 — threshold bucketing (`when/otherwise` chain). Thresholds are
    * (upperBound, label) pairs checked in order; `last` is the fallback. */
  def bucketize(c: Column, thresholds: Seq[(Double, String)], last: String): Column =
    thresholds.foldRight(lit(last)) { case ((ub, label), acc) =>
      when(c < lit(ub), lit(label)).otherwise(acc)
    }

  /** A2 — per-key "latest by sequence": exactly the dedup auto-CDC applies
    * before merging (multiple updates to one key in a batch → keep the row
    * with the highest sequence). `tieBreak` makes the result deterministic
    * when sequences collide (the reference leaves this undefined).
    * One shuffle on `keys`; no join. */
  def latestByKey(df: DataFrame, keys: Seq[String], seq: Column, tieBreak: Seq[Column]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((seq.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact money arithmetic: cast through DECIMAL(18,2) so sums are
    * order-independent (double sums are not associative → nondeterministic
    * under different partitionings; decimal sums are exact). Emit DOUBLE at
    * the edge for a stable output schema. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Morton (Z-order) code: interleave the low `bits` bits of two
    * non-negative ints (a → even positions, b → odd). Range-clustering a
    * table by this code keeps files localized in BOTH dimensions, so
    * per-file min/max stats (SnapshotTable.writeWithStats) prune on
    * either column — multi-dimensional data skipping, the Delta
    * OPTIMIZE ZORDER trick. Callers bucket wide domains into
    * [0, 2^bits) first. Pure bitwise expressions — codegen'd, no UDF. */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(al.bitwiseAND(lit(1L << i)), i),
        shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Skew-salted equi-join: `large ⋈ small` on `keys`, with the large side
    * scattered across `saltFactor` sub-keys and the small side replicated
    * per salt. Breaks a hot key's single reducer into `saltFactor` tasks —
    * the classic remedy when one key holds a double-digit share of a
    * 100 TB shuffle. Result set is identical to the plain join (salt only
    * changes partitioning). AQE's skew-join handles moderate skew
    * automatically; this is for the pathological keys AQE can't split
    * (single-key hot spots in a hash-partitioned aggregation-free join).
    */
  /** Point-in-interval range join WITHOUT a nested loop — the two-big-sides
    * shape Spark has no physical operator for (its non-equi joins fall back
    * to BroadcastNestedLoopJoin, which is undistributable when neither side
    * broadcasts). Bin the value axis at `binWidth`: an interval [lo, hi)
    * explodes to every bin it overlaps, a point lands in exactly one bin,
    * and the join becomes an ordinary shuffle equi-join on the 8-byte bin
    * id plus a residual range filter. Each qualifying (point, interval)
    * pair meets in exactly the point's bin, so the result needs no dedup
    * and equals the naive non-equi join.
    *
    * Pick `binWidth` near the typical interval length: replication per
    * interval is (hi-lo)/binWidth + 1. Unbounded sentinel intervals
    * (±1e9) must be clamped to the data domain by the caller first, or
    * they explode into billions of bins. (Databricks' RANGE_JOIN hint
    * implements exactly this rewrite.)
    */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, p("__bin") === iv("__bin") &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join ([aLo,aHi) ∩ [bLo,bHi) ≠ ∅), both sides large —
    * same binning as [[binnedRangeJoin]], except an overlapping pair now
    * shares EVERY bin both intervals cover. Rather than dedup the output
    * (a shuffle over the result), each pair is emitted exactly once: only
    * from the first bin the overlap region touches, `bin(max(aLo, bLo))`,
    * checked with plain codegen'd arithmetic at join time. */
  def binnedIntervalJoin(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(leftLo)), bin(col(leftHi)))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rightLo)), bin(col(rightHi)))))
    l.join(r, l("__bin") === r("__bin") &&
        col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi) &&
        l("__bin") === bin(greatest(col(leftLo), col(rightLo))))
      .drop("__bin")
  }

  /** Planar radius join (spatial near join), both sides large: all pairs
    * with Euclidean distance ≤ `radius`. The naive form is a non-equi
    * cross join — quadratic and unschedulable at scale. Here the plane is
    * gridded into radius-sized cells: any qualifying pair lies in the same
    * or an adjacent cell, so the LEFT side is exploded to its 3×3 cell
    * neighborhood (a 9× map-side expansion of the side the caller should
    * make the smaller one) and joined to the RIGHT side's single home cell
    * by plain cell-id equality — a shuffle on 16-byte keys that AQE can
    * re-plan for dense-cell skew — then the exact distance predicate runs
    * codegen'd at join time. Each pair is emitted exactly once (the right
    * row's home cell is unique). Distance math is exactly-rounded IEEE
    * (products, sum, sqrt), so results are engine-portable with no
    * tolerance. Self-join callers dedup with `id_a < id_b`.
    * Output: (id_a, id_b, dist). */
  def gridNearJoin(left: DataFrame, right: DataFrame, idCol: String,
      xCol: String, yCol: String, radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    def cell(c: Column): Column = floor(c / lit(radius)).cast("long")
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val l = left.select(col(idCol).as("id_a"),
        col(xCol).cast("double").as("__xa"), col(yCol).cast("double").as("__ya"))
      .withColumn("__cell", explode(array(offsets.map { case (dx, dy) =>
        struct((cell(col("__xa")) + dx).as("cx"), (cell(col("__ya")) + dy).as("cy"))
      }: _*)))
      .select(col("id_a"), col("__xa"), col("__ya"),
        col("__cell.cx").as("__cx"), col("__cell.cy").as("__cy"))
    val r = right.select(col(idCol).as("id_b"),
        col(xCol).cast("double").as("__xb"), col(yCol).cast("double").as("__yb"))
      .withColumn("__cx", cell(col("__xb")))
      .withColumn("__cy", cell(col("__yb")))
    val dist = sqrt(
      (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
        (col("__ya") - col("__yb")) * (col("__ya") - col("__yb")))
    l.join(r, Seq("__cx", "__cy"))
      .withColumn("dist", dist)
      .filter(col("dist") <= radius)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  def saltedJoin(
      large: DataFrame, small: DataFrame,
      keys: Seq[String], saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Bloom-prescreened semi join — EXACT `probe ⋉ build` on the key, with
    * the probe side first screened through a Bloom filter of the build
    * keys. The screen is the scale lever: the filter is built in one
    * aggregation pass, broadcast once, and discards ~all non-members
    * map-side, so only the tiny surviving fraction of a 100 TB probe side
    * reaches the shuffle of the confirming semi join. False positives are
    * killed by that exact confirm, so the result is deterministic — the
    * same pattern Spark's own runtime-filter rule (InjectRuntimeFilter)
    * applies, exposed here as an operator with a tunable size/fpp budget.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    probe.filter(mightContain(col(probeKey).cast("long")))
      .join(build.select(col(buildKey)), col(probeKey) === col(buildKey), "left_semi")
  }

  /** Global row numbers in `order` (a TOTAL order — include a tiebreak
    * column) WITHOUT the single-partition sort a bare
    * `row_number() OVER (ORDER BY …)` plans: range-partition on the
    * order keys, pin the partitioning (`localCheckpoint` — range
    * boundaries are SAMPLED per execution, so the count pass and the
    * numbering pass must see the same shuffle output), prefix-sum the
    * ≤numPartitions per-partition counts on the driver, and number
    * within partitions only. Every stage is parallel; the only
    * driver-side data is one count per partition. Output: df + `rn`
    * (1-based BIGINT, dense). */
  def globalRowNumbers(df: DataFrame, order: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val cols = order.map(col)
    val parted =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, cols: _*)
       else df.repartitionByRange(cols: _*))
        .sortWithinPartitions(cols: _*)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true)
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    // within-partition ordinal from monotonically_increasing_id's documented
    // layout (partition id in the upper 31 bits, record number in the lower
    // 33): rows are already sorted within the pinned partitions, so no
    // window — and so no extra exchange — is needed to number them.
    parted
      .withColumn("__ord", monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .join(broadcast(offDf), "__pid")
      .withColumn("rn", col("__off") + col("__ord") + lit(1L))
      .drop("__pid", "__off", "__ord")
  }

  /** EXACT heavy hitters (all values of `column` with count ≥ `minCount`)
    * without a full-cardinality group-by: a Misra–Gries prescreen
    * (`stat.freqItems` — guaranteed superset of everything above its
    * support) shrinks the domain to ≤ 2n/minCount candidates, then one
    * exact count over just those candidates confirms. At 100 TB the long
    * tail (the overwhelming majority of distinct values) never reaches a
    * shuffle — it dies in the map-side `InSet` filter. Requires
    * minCount ≥ 2·1e-4·count (freqItems' support floor); below that run
    * the plain group-by instead. Output: (`column`, cnt). */
  def heavyHitters(df: DataFrame, column: String, minCount: Long): DataFrame = {
    val n = df.count()
    val support = math.max(minCount.toDouble / (2.0 * math.max(n, 1L)), 1e-4)
    val cands = df.stat.freqItems(Seq(column), support).head.getSeq[Any](0)
    val screened =
      if (cands.isEmpty) df.filter(lit(false))
      else df.filter(col(column).isin(cands: _*))
    screened.groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Fuzzy record linkage: all same-length pairs within Hamming distance
    * `maxDist`, found WITHOUT the quadratic self-join. Pigeonhole blocking
    * (the PassJoin idea): split every string into `maxDist + 1` positional
    * segments — two strings within Hamming k must agree on at least one
    * whole segment — so candidates come from an equi-join on
    * (length, segment index, segment text) and only candidates pay the
    * O(len) verify. At scale the shuffle carries short segment keys and
    * block sizes are bounded by how many rows share a length + substring,
    * not by n².
    *
    * Contract is Hamming (same length, positional mismatch count), not
    * Levenshtein: the positional-segment pigeonhole is only complete for
    * aligned comparison. Output: (id_a, id_b, dist), id_a < id_b. */
  def hammingNearPairs(
      df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val m = maxDist + 1
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("len", length(col("text")))
    val segs = base.select(col("id"), col("text"), col("len"),
        explode(sequence(lit(0), lit(m - 1))).as("seg_i"))
      .withColumn("seg_start", floor(col("seg_i") * col("len") / lit(m)) + 1)
      .withColumn("seg_len",
        floor((col("seg_i") + 1) * col("len") / lit(m)) - floor(col("seg_i") * col("len") / lit(m)))
      .withColumn("seg", col("text").substr(col("seg_start").cast("int"), col("seg_len").cast("int")))
      .select(col("id"), col("text"), col("len"), col("seg_i"), col("seg"))

    val cand = segs.as("a")
      .join(segs.as("b"),
        col("a.len") === col("b.len") && col("a.seg_i") === col("b.seg_i") &&
          col("a.seg") === col("b.seg") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.text").as("text_a"), col("b.text").as("text_b"), col("a.len").as("len"))
      .dropDuplicates("id_a", "id_b")

    // codegen'd primitive loop (graft.functions.HammingDistance), not the
    // interpreted size(filter(sequence…substr…)) form — the verify step is
    // the per-candidate hot path
    val dist = graft.functions.StringDistanceFunctions
      .hamming(col("text_a"), col("text_b"))
    cand.withColumn("dist", dist.cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Equi-width histogram of a numeric column over [lo, hi]: one
    * partial+final aggregation on ≤ `nbins` keys (each task emits at most
    * nbins partial counts — the shuffle is O(nbins), independent of row
    * count). Values outside [lo, hi] are dropped; the top edge folds into
    * the last bin; empty bins are absent (join a spine if a dense axis is
    * needed). Output: (bin, bin_lo, bin_hi, cnt). */
  def histogram(df: DataFrame, column: String,
      nbins: Int, lo: Double, hi: Double): DataFrame = {
    require(nbins > 0 && hi > lo, "need nbins > 0 and hi > lo")
    val x = col(column).cast("double")
    val bin = least(
      floor((x - lit(lo)) / (lit(hi) - lit(lo)) * lit(nbins)).cast("long"),
      lit(nbins - 1L))
    df.filter(x >= lo && x <= hi)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bin_lo", lit(lo) + col("bin") * (lit(hi) - lit(lo)) / lit(nbins))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * (lit(hi) - lit(lo)) / lit(nbins))
      .select(col("bin"), col("bin_lo"), col("bin_hi"), col("cnt"))
  }

  /** 2-D skyline (Pareto frontier, minimizing both dimensions): the points
    * no other point dominates (≤ in both, < in one). The naive form is the
    * O(n²) dominance self-join; sorted by (x asc, y asc), a point is on
    * the frontier iff its y is strictly below every EARLIER point's y —
    * one running-min window. Duplicates collapse first (equal points don't
    * dominate each other; after `distinct` the strict test is exact). The
    * window is global by construction — the frontier is a global property
    * — but it runs over the DISTINCT (x, y) pairs, which for the measure
    * columns skylines see (price × quantity…) is orders of magnitude
    * smaller than the table; shard-and-merge (frontier of per-partition
    * frontiers) is the 100 TB refinement and changes no semantics.
    * Output: the frontier rows (x, y). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).distinct()
    val w = Window.orderBy(col("x"), col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("__pm", min(col("y")).over(w))
      .filter(col("__pm").isNull || col("y") < col("__pm"))
      .select(col("x"), col("y"))
  }

  /** Large-input 2-D skyline: map-side per-partition frontiers first
    * (local sort + linear running-min scan inside each INPUT partition —
    * no shuffle), then [[skyline2D]] over the surviving candidates. A
    * point dominated within its partition is dominated globally, so the
    * pre-reduce is lossless — and a frontier is tiny relative to its
    * partition, so the one real shuffle moves candidates, not the table.
    * This is the shard-and-merge shape the flat window can't give at
    * 100 TB. Results ≡ [[skyline2D]] under any partitioning. */
  def skyline2DLarge(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .as[(Double, Double)]
      .mapPartitions { it =>
        val arr = it.toArray.distinct.sortBy(p => (p._1, p._2))
        var best = Double.PositiveInfinity
        arr.iterator.filter { case (_, y) =>
          if (y < best) { best = y; true } else false
        }
      }
      .toDF("x", "y")
    skyline2D(candidates, "x", "y")
  }

  /** Per-group 2-D skyline: [[skyline2D]] with the running-min window
    * partitioned by `keyCols` — frontier per segment, shuffle on the
    * group key. Output: (keyCols..., x, y). */
  def skyline2DByKey(df: DataFrame, keyCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val pts = df.select((keys :+ col(xCol).cast("double").as("x")
      :+ col(yCol).cast("double").as("y")): _*).distinct()
    val w = Window.partitionBy(keys: _*).orderBy(col("x"), col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("__pm", min(col("y")).over(w))
      .filter(col("__pm").isNull || col("y") < col("__pm"))
      .select((keys :+ col("x") :+ col("y")): _*)
  }

  /** One-row join-key skew report: row/key counts, the heaviest key's
    * multiplicity, and `skew = max_cnt / (rows/keys)` — the number every
    * shuffle-sizing decision (salt factor, AQE skew threshold, broadcast
    * cutoff) starts from. One grouped count + one fold; exact integers
    * into one rounded division. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_cnt"),
      round(max(col("c")).cast("double") * count(lit(1)).cast("double") /
        sum(col("c")).cast("double"), 6).as("skew"))
  }

  /** One-stop data profiling (the `ANALYZE`/dbt-docs surface): per column
    * — row count, null count, exact distinct count, min/max (stringified).
    * Each column is one partial+final aggregation pass; exact
    * COUNT(DISTINCT) forces that (the scale alternative —
    * `approx_count_distinct` in a single shared pass — trades exactness;
    * both are one shuffle per column either way because distinct-agg
    * expansion can't share). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
    }.reduce(_ unionByName _)
}
