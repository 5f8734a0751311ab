package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the driver-generated parquet star schema
  * (see /root/repo/TESTDATA.md). Schema-on-read from parquet footers,
  * mirroring the reference's schema-free bronze datasets
  * (Azure ADF/adf/DataSet/parquet_dynamic.json:39 — `"schema": []`).
  *
  * Scale note: `spark.read.parquet` on a directory of many files gives
  * Catalyst a `FileSourceScanExec` with partition pruning + predicate
  * pushdown + vectorized reads for free; nothing here materializes on
  * the driver.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf) and surface a
    * proper TimestampType column (µs, matching DuckDB's native precision).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Watermark-filtered events scan. The `timestamp_micros(...)` derivation
    * in [[events]] blocks predicate pushdown (a filter on the derived
    * column can't reach the scan — audited via explain: only IsNotNull was
    * pushed). Here the CDC predicate is applied in *storage units* (raw
    * nanos, a plain long comparison) before the conversion, so the parquet
    * scan gets `GreaterThan(ts, …)` and can skip row groups by min/max
    * stats — the difference between a pruned scan and a full scan at
    * 100 TB. Reference analog: the watermark filter evaluated at the
    * source (incremental_loop.json:45). */
  def eventsSince(s: SparkSession, d: String, watermarkUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val inst = java.time.LocalDateTime
      .parse(watermarkUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    load(s, d, "events")
      .filter(org.apache.spark.sql.functions.col("ts") > (micros * 1000L))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
