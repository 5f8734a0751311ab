package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located, shuffle-free joins — the storage
  * answer to the prompt's "big joins shuffle on their keys": pre-hash both
  * sides of a recurring equi-join into the same bucket count at write
  * time, and every subsequent join/aggregation on that key runs with ZERO
  * exchanges (verified by spec: the physical plan contains no
  * ShuffleExchange). At 100 TB this turns the nightly fact⋈dim join from
  * the dominant shuffle into a purely local merge per bucket.
  *
  * Bucketed tables must be catalog-managed (`saveAsTable`) — bucket
  * metadata lives in the table definition, not the files.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame, db: String, table: String,
      bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    graft.sql.TableCatalog.createSchema(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(s"`$db`.`$table`")
  }

  def read(spark: SparkSession, db: String, table: String): DataFrame =
    spark.table(s"`$db`.`$table`")
}
