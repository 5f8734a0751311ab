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
}
