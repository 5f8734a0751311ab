package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** True JDBC incremental source — S1 in its original form. The reference's
  * ADF loop splices the stored watermark into the SQL it sends to the
  * database (`Azure ADF/adf/pipeline/incremental_loop.json:45`: lookup the
  * last watermark, then `SELECT ... WHERE <cdcCol> > '<last>'` shipped to
  * Azure SQL), so the DELTA is computed BY THE DATABASE and only new rows
  * cross the wire. The engine's parquet-backed S1
  * ([[IncrementalIngest]]) keeps those semantics over files; this is the
  * same contract against a live JDBC database.
  *
  * Scale design:
  *  - the watermark predicate rides inside the pushed `query`, so the DB's
  *    index on the CDC column does the pruning — Spark never sees old rows;
  *  - an optional [[Partitioning]] turns the read into `num` parallel
  *    range-bounded queries (Spark's partitionColumn/lowerBound/upperBound
  *    protocol) — the standard way a 1000-executor cluster drains a big
  *    delta without one connection being the bottleneck;
  *  - composes with [[WatermarkStore]] exactly like the file-backed S1:
  *    read watermark → pull delta → write bronze → commit new watermark.
  *
  * Timestamp literal rendering differs per dialect (Derby wants
  * `TIMESTAMP('…')`, most others the standard `TIMESTAMP '…'`), so the
  * literal builder is a parameter.
  */
object JdbcIncremental {

  /** Range partitioning for the parallel read: `num` queries over
    * `[lower, upper]` on an indexed integral `column`. */
  final case class Partitioning(column: String, lower: Long, upper: Long, num: Int)

  /** Standard SQL timestamp literal (most dialects). */
  def standardTs(ts: String): String = s"TIMESTAMP '$ts'"

  /** Derby's function-form timestamp literal. */
  def derbyTs(ts: String): String = s"TIMESTAMP('$ts')"

  /** Pull the delta of `table` strictly after `lastWatermark` on
    * `watermarkCol`, with the predicate evaluated DB-side. Column
    * identifiers are double-quoted (SQL standard): Spark's JDBC writer
    * creates quoted case-sensitive columns, which an unquoted reference
    * would miss on case-folding dialects like Derby. */
  def read(spark: SparkSession, url: String, driver: String, table: String,
      watermarkCol: String, lastWatermark: String,
      tsLiteral: String => String = standardTs,
      partitioning: Option[Partitioning] = None): DataFrame = {
    val delta =
      s"""SELECT * FROM $table WHERE "$watermarkCol" > ${tsLiteral(lastWatermark)}"""
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
    val withPart = partitioning match {
      case Some(p) =>
        // partitioned protocol requires dbtable (a derived-table alias),
        // not query; the watermark predicate stays inside the subquery so
        // every partition's WHERE is (range AND watermark), all DB-side
        // alias must not start with "_" (Derby rejects such identifiers)
        base.option("dbtable", s"($delta) AS delta_q")
          .option("partitionColumn", s""""${p.column}"""")
          .option("lowerBound", p.lower.toString)
          .option("upperBound", p.upper.toString)
          .option("numPartitions", p.num.toString)
      case None =>
        base.option("query", delta)
    }
    withPart.load()
  }
}
