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
  *  3. F4/K5 row-count gate: empty batch ⇒ no bronze write at all (the
  *         reference writes then deletes the empty file; skipping is the
  *         semantics it wants)
  *  4. K1  bronze parquet append `bronze/<table>/<table>-<runTs>`
  *  5. A1  `MAX(cdc_col)` watermark advance + K2 overwrite
  *
  * Scale notes: count+max are one aggregate pass over the *filtered* scan
  * (pushdown applies); nothing is collected but the 2-value stats row.
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

    // One aggregate pass for the F4 gate + A1 watermark advance.
    val stats = incr.agg(count(lit(1)).as("n"), max(col(spec.cdcCol)).as("mx")).head()
    val n = stats.getLong(0)

    if (n == 0L) IngestResult(spec.table, 0L, None)
    else {
      incr.write.mode(SaveMode.Overwrite)
        .parquet(s"$bronzeDir/${spec.table}/${spec.table}-$runTs")
      val maxCdc = cdcType match {
        case TimestampType =>
          // Format the instant at UTC (matching the UTC session TZ used to
          // cast the watermark string back on the next run).
          stats.getTimestamp(1).toInstant
            .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
            .format(java.time.format.DateTimeFormatter.ofPattern(WmFormat))
        case DateType => stats.getDate(1).toString
        case _        => stats.get(1).toString
      }
      wmStore.write(spark, spec.table, maxCdc)
      IngestResult(spec.table, n, Some(maxCdc))
    }
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
