package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog facade — the reference's 3-level `catalog.schema.table`
  * namespace (`spotify_cata.silver.DimUser`, SURVEY.md §1.3/§1.4) mapped
  * onto Spark's session catalog: `spark_catalog.<db>.<table>` with
  * external parquet locations. No Hive metastore required (in-memory
  * catalog); registrations are session-scoped, exactly like the
  * reference's per-job catalog bindings resolved at run start.
  */
object TableCatalog {

  def createSchema(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Register an external parquet directory (e.g. a silver table dir or a
    * SnapshotTable version dir) as `db.table`. */
  def registerParquet(spark: SparkSession, db: String, table: String, path: String): Unit = {
    createSchema(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    spark.sql(s"CREATE TABLE `$db`.`$table` USING PARQUET LOCATION '$path'")
  }

  /** Register the live snapshot of a versioned table. Re-register after
    * each commit (the pointer moves between version dirs). */
  def registerSnapshot(spark: SparkSession, db: String, table: String,
      snap: graft.tables.SnapshotTable): Unit = {
    val v = snap.currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"no committed version for ${snap.root}"))
    registerParquet(spark, db, table, s"${snap.root}/_v$v")
  }

  /** Register a DataFrame-backed relation (e.g. a bucketed snapshot whose
    * live data spans several batch dirs) as a session temp view. Temp
    * views are single-level names — callers embed the schema in the name
    * (`graft_gold_dimuser`). */
  def registerView(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Register the live PRUNING relation of a versioned table as a temp
    * view: any WHERE a later `spark.sql` query puts on the view prunes
    * the scan's file list through the table's stats/Bloom sidecars (and,
    * for bucketed tables, the bucket-hash replay) at planning time — the
    * catalog-facing form of `SNAPSHOT '<root>' WHERE …`. Visible rows
    * only (SCD tombstone state filtered). Re-register after commits. */
  def registerIndexedView(spark: SparkSession, name: String,
      t: graft.tables.SnapshotTable): Unit =
    registerView(spark, name, graft.cdc.ScdMerge.scd1Current(t.readIndexed(spark)))

  def registerIndexedView(spark: SparkSession, name: String,
      t: graft.tables.BucketedSnapshotTable): Unit =
    registerView(spark, name, graft.cdc.ScdMerge.scd1Current(t.readIndexed(spark)))

  /** Compute table-level (and optionally column-level) statistics — the
    * cost-based-optimizer inputs (row count, size, per-column NDV/min/max).
    * At 100 TB, analyzed dimension tables are what let the planner pick
    * broadcast joins and reorder multi-way joins without guessing from
    * file sizes. */
  def analyze(spark: SparkSession, db: String, table: String,
      cols: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE `$db`.`$table` COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$db`.`$table` COMPUTE STATISTICS FOR COLUMNS " +
        cols.map(c => s"`$c`").mkString(", "))
  }

  /** S5 — the exploration entry point (`SELECT * FROM spotify.gold.x`). */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
