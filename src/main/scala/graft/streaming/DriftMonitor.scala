package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming DATA-QUALITY DRIFT monitor — the guardrail a continuous
  * ingestion pipeline runs next to its sinks: every micro-batch's
  * categorical distribution is compared against a frozen reference (the
  * vetted corpus) with a Population Stability Index, and one metrics row
  * lands per batch. An upstream change (a crawler suddenly feeding one
  * language, a source going silent) shows up as a PSI spike on the NEXT
  * batch rather than in a post-mortem.
  *
  * PSI arithmetic matches [[graft.ops.Stats.psi]] exactly for categories
  * present on both sides (the oracled batch form): exact counts,
  * p·ln(p/q) terms rounded to 12 decimals and decimal-summed
  * (order-proof), final round(6). Batch categories ABSENT from the
  * reference — a brand-new lang code, the exact upstream change this
  * monitor exists to flag — get an epsilon reference probability
  * (`epsRef`) instead of being silently dropped by an inner join, so an
  * all-novel batch scores a huge PSI rather than logging NULL. Metrics
  * rows are append-only parquet via the exactly-once batch sink — a
  * replayed batch cannot double-log.
  *
  * Scale shape: the per-batch work is one categorical count (partial-agg)
  * joined against a broadcast reference; the metrics sink grows one row
  * per batch regardless of data volume.
  */
object DriftMonitor {

  /** Drain `cfg`'s stream with AvailableNow, logging one
    * `(batch_id, n_rows, psi)` row per micro-batch against the reference
    * category counts `(cat, rc)` in `refCounts`.
    *
    * `prepare` maps the raw stream before counting — the hook that turns
    * this into a NUMERIC drift monitor: derive a bin column (e.g.
    * `least(floor(value/100), 9)`) and pass it as `catCol`; binned PSI
    * over a continuous column is exactly how production monitors watch
    * score/length/price distributions. */
  def run(spark: SparkSession, cfg: AutoIngest.Config, refCounts: DataFrame,
      catCol: String, outDir: String, epsRef: Double = 1e-9,
      prepare: DataFrame => DataFrame = identity): Unit = {
    val ref = refCounts.select(col(catCol).as("cat"), col("rc"))
      .localCheckpoint()
    val stream = prepare(AutoIngest.readStream(spark, cfg).drop("_rescued_data"))
    AutoIngest.foreachBatchOnce(stream, cfg.checkpointDir) { (batch, batchId) =>
      val counts = batch.groupBy(col(catCol).as("cat"))
        .agg(count(lit(1)).as("bc"))
      // LEFT join from batch counts: a batch category the reference has
      // never seen must contribute a (large) term, not vanish — an inner
      // join made an all-novel batch log (batch_id, NULL, NULL).
      val joined = counts.join(ref, Seq("cat"), "left_outer")
      // Totals are FULL-batch and FULL-reference mass — NOT the joined
      // support Stats.psi uses for continuous bins. A zh-only batch under
      // joined-support normalization reads p = q = 1 → PSI 0: the exact
      // drift this monitor exists to flag. With full totals the same
      // batch scores (1−q_zh)·ln(1/q_zh) — the spike.
      val tot = counts.agg(coalesce(sum(col("bc")), lit(0L)).as("tb"))
        .crossJoin(ref.agg(sum(col("rc")).as("tr")))
      val p = col("bc").cast("double") / col("tb").cast("double")
      // unmatched categories: rc is NULL → epsilon reference probability
      val q = greatest(
        coalesce(col("rc"), lit(0L)).cast("double") / col("tr").cast("double"),
        lit(epsRef))
      val psiRow = joined.crossJoin(tot)
        .withColumn("term",
          round((p - q) * log(p / q), 12).cast(DecimalType(28, 12)))
        .agg((round(coalesce(sum(col("term")), lit(0)).cast("double"), 6)
          + lit(0.0)).as("psi"))
        // n_rows from the batch totals, never the joined relation — an
        // empty batch logs (batch_id, 0, 0.0), not NULLs
        .crossJoin(tot)
        .withColumn("batch_id", lit(batchId))
        .select(col("batch_id"), col("tb").cast("long").as("n_rows"), col("psi"))
      // per-batch dir + overwrite = idempotent under foreachBatch replay
      // (a plain append would double-log a batch retried after a crash)
      psiRow.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    }
  }

  def readMetrics(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/batch_*")
}
