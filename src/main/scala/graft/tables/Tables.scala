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
  /** Schema-adaptive events scan. The driver has regenerated
    * `events.parquet` with different physical `ts` encodings across rounds
    * (parquet TIMESTAMP(NANOS) → read as raw-nanos long under the legacy
    * conf; native timestamp[us] → read as TIMESTAMP_NTZ/TIMESTAMP). Adapt
    * off the footer schema instead of hard-coding one encoding: whatever
    * the storage type, the surfaced `ts` is session-zone TimestampType
    * (µs, matching DuckDB's native precision). The legacy conf is
    * harmless when the file is not NANOS-typed.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"SCHEMA_DRIFT: events.ts has unrecognized storage type $other " +
            s"(expected raw-nanos LONG, TIMESTAMP_NTZ, or TIMESTAMP); " +
            s"the testdata generator changed encodings again — extend Tables.events")
    }
  }

  /** Watermark-filtered events scan. A filter on a *derived* ts column
    * (`timestamp_micros(...)` / a cast) can't reach the parquet scan, so
    * the CDC predicate is applied to the column in its native storage
    * type — a raw-nanos long comparison, or an NTZ/LTZ timestamp
    * comparison — BEFORE any conversion. That way the scan gets a
    * pushable `GreaterThan(ts, …)` and skips row groups by min/max
    * stats — the difference between a pruned scan and a full scan at
    * 100 TB. Reference analog: the watermark filter evaluated at the
    * source (incremental_loop.json:45). */
  def eventsSince(s: SparkSession, d: String, watermarkUtc: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw  = load(s, d, "events")
    val inst = java.time.LocalDateTime
      .parse(watermarkUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") > (micros * 1000L))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // NTZ literal compares wall-clock-to-wall-clock; watermark is UTC
        // wall time, matching the generator. Pushes down natively.
        raw.filter(col("ts") > lit(watermarkUtc).cast(TimestampNTZType))
          .withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw.filter(col("ts") > expr(s"timestamp_micros(${micros}L)"))
      case other =>
        throw new IllegalStateException(
          s"SCHEMA_DRIFT: events.ts has unrecognized storage type $other " +
            s"(expected raw-nanos LONG, TIMESTAMP_NTZ, or TIMESTAMP); " +
            s"the testdata generator changed encodings again — extend Tables.eventsSince")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
