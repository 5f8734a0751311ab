package graft.gold

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Idempotent JDBC gold publish — the serving side of the medallion (the
  * reference lands gold dims in a SQL-served store for BI; see the ADF
  * copy stage in `Azure ADF/adf/pipeline/incremental_loop.json` for the
  * same stage-then-swap shape in reverse). A naive
  * `df.write.jdbc(SaveMode.Overwrite)` truncates the live table BEFORE
  * the new rows land, so readers see an empty or half-loaded table for
  * the duration of the load and a failed job leaves it gutted.
  *
  * `publish` instead does BLUE-GREEN table swap:
  *
  *   1. write `df` to `<table>_STG` (Spark's parallel JDBC writer —
  *      `numPartitions` connections at scale; a crash here touches only
  *      the staging table);
  *   2. in ONE driver-side connection: drop the previous table and
  *      `RENAME TABLE <table>_STG TO <table>` — metadata-only, so the
  *      serving gap is the rename, not the load.
  *
  * Rerunning after any failure converges: staging is always rebuilt from
  * scratch, the live table is replaced only after staging is complete.
  * Identifiers are uppercased unquoted names (portable across
  * case-folding dialects like Derby, the in-JVM stand-in for Azure SQL).
  */
object JdbcPublish {

  /** Publish `df` as JDBC table `table` (load staging, then swap).
    * Returns the published row count (read back DB-side — the number a
    * serving query will actually see). */
  def publish(df: DataFrame, url: String, driver: String, table: String,
      numPartitions: Int = 1): Long = {
    val name = table.toUpperCase
    val stg = s"${name}_STG"
    Class.forName(driver)
    df.repartition(math.max(1, numPartitions))
      .write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", stg)
      .mode(SaveMode.Overwrite) // staging only — never the live table
      .save()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        if (tableExists(conn, name)) st.executeUpdate(s"DROP TABLE $name")
        st.executeUpdate(s"RENAME TABLE $stg TO $name")
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $name")
        rs.next(); rs.getLong(1)
      } finally st.close()
    } finally conn.close()
  }

  private def tableExists(conn: java.sql.Connection, name: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, name, Array("TABLE"))
    try rs.next() finally rs.close()
  }
}
