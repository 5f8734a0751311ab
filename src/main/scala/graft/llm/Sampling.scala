package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for corpus mixing — the pattern
  * production training pipelines use instead of RNG sampling: bucket each
  * row by a *content-derived hash* (md5, engine-portable), then keep
  * buckets below a per-stratum rate. Properties RNG sampling lacks:
  *  - exactly reproducible across runs, engines, partitionings and
  *    cluster sizes (no seed plumbing, no RNG state per partition);
  *  - consistent: a document keeps/loses membership stably as the corpus
  *    grows (bucket depends only on the row's own key);
  *  - cheap: one codegen'd hash per row, zero shuffles.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep rows whose bucket falls under their stratum's rate (percent of
    * `buckets`). `rates` maps stratum value → rate; `defaultRate` covers
    * the rest. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Int], defaultRate: Int, buckets: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (value, r)) =>
      when(col(stratumCol) === value, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(keyCol), buckets))
      .filter(col("bucket") < rate)
  }

  /** Sample toward a target corpus mixture: given desired stratum
    * proportions (e.g. en 0.4 / fr 0.3 / …), derive per-stratum keep rates
    * that realize the LARGEST output with exactly those proportions — the
    * binding stratum (smallest count/weight ratio) is kept ~whole and the
    * rest are down-sampled to match. Strata absent from `targets` are
    * dropped. Selection is the same content-hash bucketing as
    * [[stratifiedSample]], so the mixture is reproducible and stable under
    * corpus growth; the only driver-side data is one count per stratum. */
  def targetMixture(
      df: DataFrame, keyCol: String, stratumCol: String,
      targets: Map[String, Double], buckets: Int = 10000): DataFrame = {
    require(targets.values.forall(_ > 0), "target weights must be positive")
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.filter { case (s, _) => counts.contains(s) }
    require(present.nonEmpty, "no target stratum present in the data")
    val nOut = present.map { case (s, w) => counts(s) / w }.min
    val thrCol = present.foldLeft(lit(-1L)) { case (acc, (s, w)) =>
      // same double expression tree the SQL oracle uses: n_out * w / c * buckets
      when(col(stratumCol) === s,
        lit(math.floor(nOut * w / counts(s) * buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets) < thrCol)
  }

  /** Weighted Bernoulli sample: keep a row with probability
    * `min(1, weight × rate)` — quality-weighted corpus down-sampling
    * (weight from a quality model or heuristic; high-quality documents
    * survive at a higher rate). The coin flip is the same content-derived
    * md5 unit hash as [[hashBucket]] (here at 10^6 resolution), so the
    * decision is reproducible, engine-portable (the DuckDB oracle replays
    * it exactly), stable under corpus growth, and zero-shuffle: one hash +
    * one comparison per row, fully codegen'd. `weightCol` must be a
    * deterministic expression over the row (exact arithmetic — keep
    * transcendentals out of it or round them first, the keep decision is a
    * strict `<`). */
  def weightedBernoulli(
      df: DataFrame, keyCol: String, weight: Column, rate: Double): DataFrame = {
    val unit = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    df.filter(unit.cast("double") < least(lit(1.0), weight * lit(rate)) * 1000000.0)
  }

  /** Deterministic "reservoir": exactly `k` rows per group (fewer if the
    * group is smaller), chosen by hash rank of the row key — the fixed-size
    * analog of [[stratifiedSample]] (e.g. k documents per language for an
    * eval slice). Same reproducibility properties; cost is one window
    * shuffle on the group column. Ties in the hash (md5 collisions) break
    * by the raw key, so selection stays total-ordered and replayable. */
  def reservoirPerKey(
      df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** WEIGHTED fixed-size sample per group — Efraimidis–Spirtakis A-ES
    * (2006): each row draws a deterministic uniform `u` from its key hash
    * and scores `u^(1/w)`; the top `k` scores per group are EXACTLY a
    * weighted-without-replacement sample (a row's inclusion probability is
    * proportional to its weight at every step). The classic one-pass
    * distributed answer to "k representatives per stratum, weighted by
    * importance/quality" — one window shuffle on the group, no per-group
    * state, reproducible (hash-u, not RNG). Weights must be positive.
    * Adds `__aes_rank`; score ties (md5 collisions) break by the raw
    * key, so selection is total-ordered and replayable. */
  def weightedReservoirPerKey(
      df: DataFrame, groupCol: String, keyCol: String, weight: Column,
      k: Int): DataFrame = {
    // u ∈ (0,1): the +0.5 keeps u strictly positive (u = 0 would score 0
    // regardless of weight) and strictly below 1. Non-positive weights
    // score 0 (zero inclusion probability — they fill a group only when it
    // has fewer than k positive-weight rows) instead of tripping ANSI
    // division by zero.
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L).cast("double").plus(0.5) / 1000000.0
    val score = when(weight > 0.0, pow(u, lit(1.0) / weight)).otherwise(lit(0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(score.desc, col(keyCol).asc)
    df.withColumn("__aes_rank", row_number().over(w))
      .filter(col("__aes_rank") <= k)
  }

  /** LEAKAGE-SAFE train/test split: a per-row split that respects dedup
    * clusters, so two near-duplicate documents can never straddle the
    * boundary (the classic eval-contamination bug a doc-level random
    * split commits: the test doc's near-copy sits in train). `pairs` is
    * any near-dup pair relation (MinHash/SimHash/embedding — columns
    * `d1Col`/`d2Col`); docs absent from it are their own singleton group.
    * The split key is the GROUP id (cluster canonical id) through the
    * portable LCG permutation ([[Sharding.permKey]] — engine-portable, no
    * Spark-private hash), so membership is reproducible and stable as the
    * corpus grows.
    *
    * Scale shape: connected components is the round-bounded
    * pointer-jumping of [[Dedup.connectedComponents]] (only docs IN pairs
    * enter it — the cluster relation is small by construction); the
    * singleton back-fill is one left join keyed by id; the split itself
    * is a pure map. Returns `(id, group_id, split)`. */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      d1Col: String, d2Col: String, testMod: Int = 10): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, d1Col, d2Col)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left_outer")
      .select(col(idCol).as("id"),
        coalesce(col("comp"), col(idCol)).as("group_id"))
      .withColumn("split",
        when(pmod(Sharding.permKey(col("group_id")), lit(testMod)) === 0,
          lit("test")).otherwise(lit("train")))
  }
}
