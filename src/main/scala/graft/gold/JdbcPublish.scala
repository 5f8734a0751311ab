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
  *   2. in ONE driver-side connection: `RENAME <table> TO <table>_OLD`,
  *      `RENAME <table>_STG TO <table>`, then drop `<table>_OLD` — all
  *      metadata-only. A crash between the two renames leaves no live
  *      table briefly, but ALWAYS a recoverable one (`_OLD` holds the
  *      previous rows and the next publish converges); dropping first
  *      (the naive order) would leave nothing recoverable at all.
  *
  * Serving-gap note: dialects without transactional DDL (Derby among
  * them) cannot make the swap atomic, so a reader between the two
  * renames can observe "table not found" for the metadata-op window —
  * retry-once on that error is the standard client pattern. Rerunning
  * after any failure converges: staging is always rebuilt from scratch,
  * leftover `_OLD`/`_STG` from a crash are dropped before reuse.
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
    val old = s"${name}_OLD"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        if (tableExists(conn, old)) st.executeUpdate(s"DROP TABLE $old") // crash leftover
        if (tableExists(conn, name)) st.executeUpdate(s"RENAME TABLE $name TO $old")
        st.executeUpdate(s"RENAME TABLE $stg TO $name")
        if (tableExists(conn, old)) st.executeUpdate(s"DROP TABLE $old")
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
