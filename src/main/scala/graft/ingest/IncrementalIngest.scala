package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Metadata-driven table spec — the shape of the reference's ForEach input
  * (Docs/loop_input.json:1-33: `{schema, table, cdc_col, from_date}`).
  * `fromDate` non-empty ⇒ backfill override (incremental_loop.json:45). */
case class TableSpec(
    schema: String,
    table: String,
    cdcCol: String,
    fromDate: Option[String] = None)

case class IngestResult(table: String, rowsRead: Long, newWatermark: Option[String])

/** Watermark-driven incremental batch ingestion — the ADF `incremental_loop`
  * pipeline (E1 in SURVEY.md §3) as driver-side Scala + one filtered scan:
  *
  *  1. S2  watermark lookup (`cdc.json`, or `from_date` backfill override F2)
  *  2. S1  incremental scan: `source WHERE cdc_col > wm` — the predicate is a
  *         typed Catalyst filter, pushed into the parquet scan (the
  *         reference splices it into remote SQL; same effect, cleaner IR)
  *  3. K1  bronze parquet append `bronze/<table>/<table>-<runTs>`, with
  *         count+max piggybacked on the write job via `observe()` — ONE
  *         scan per run, not a stats pass plus a copy pass
  *  4. F4/K5 row-count gate: an empty batch deletes the just-written empty
  *         output — exactly the reference's Copy → IfCondition →
  *         DeleteEmptyFile chain (incremental_ingustion.json:140-190)
  *  5. A1  `MAX(cdc_col)` watermark advance + K2 overwrite
  *
  * Scale notes: count+max ride the write job as observed metrics
  * (pushdown applies); nothing reaches the driver but the 2-value stats
  * row.
  * Timestamps are compared as `TimestampType`, not strings (SURVEY §7.4
  * hazard), and the watermark is stored at microsecond precision so the
  * reference's strict-`>` row-skipping hazard shrinks to exact-µs ties.
  */
object IncrementalIngest {

  val InitialWatermark = "1900-01-01 00:00:00"
  private val WmFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def ingestTable(
      spark: SparkSession,
      spec: TableSpec,
      sourcePath: String,
      bronzeDir: String,
      wmStore: WatermarkStore,
      runTs: String): IngestResult = {

    // F2 — backfill override beats the stored watermark.
    val wm = spec.fromDate.filter(_.nonEmpty)
      .orElse(wmStore.read(spark, spec.table))
      .getOrElse(InitialWatermark)

    val src = spark.read.parquet(sourcePath)
    val cdcType = src.schema(spec.cdcCol).dataType
    val incr = src.filter(col(spec.cdcCol) > lit(wm).cast(cdcType))

    // K1 with the F4/A1 stats observed on the same job — single scan.
    val target = s"$bronzeDir/${spec.table}/${spec.table}-$runTs"
    val obs = org.apache.spark.sql.Observation(s"ingest_${spec.table}_$runTs")
    incr.observe(obs, count(lit(1)).as("n"), max(col(spec.cdcCol)).as("mx"))
      .write.mode(SaveMode.Overwrite).parquet(target)
    val stats = obs.get
    val n = stats("n").asInstanceOf[Long]

    if (n == 0L) {
      // K5 — the reference's DeleteEmptyFile activity: remove the empty copy
      val p = new org.apache.hadoop.fs.Path(target)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      IngestResult(spec.table, 0L, None)
    } else {
      val maxCdc = formatCdcValue(cdcType, stats("mx"))
      wmStore.write(spark, spec.table, maxCdc)
      IngestResult(spec.table, n, Some(maxCdc))
    }
  }

  /** Watermark text form of a max(cdcCol) result — formatted at UTC
    * (matching the UTC session TZ used to cast the watermark string back
    * on the next run). Shared by the ingest path and watermark recovery. */
  private[ingest] def formatCdcValue(cdcType: org.apache.spark.sql.types.DataType,
      v: Any): String = (cdcType, v) match {
    case (TimestampType, ts: java.sql.Timestamp) =>
      ts.toInstant
        .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern(WmFormat))
    case (TimestampType, i: java.time.Instant) =>
      i.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter.ofPattern(WmFormat))
    case (DateType, d) => d.toString
    case (_, x)        => x.toString
  }

  /** §2.11 ForEach parity: ingest every configured table for one run. */
  def runAll(
      spark: SparkSession,
      specs: Seq[TableSpec],
      sourcePathFor: String => String,
      bronzeDir: String,
      runTs: String): Seq[IngestResult] = {
    val wmStore = new WatermarkStore(bronzeDir)
    specs.map(sp => ingestTable(spark, sp, sourcePathFor(sp.table), bronzeDir, wmStore, runTs))
  }
}
