package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Smoke + invariant tests for every declared query at sf0.001.
  * Deep value correctness is covered by the driver's DuckDB oracle at
  * sf0.01; here we assert structural invariants cheaply.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.forall(SparkEntry.rowsOnly.contains),
      s"queries missing oracle and not declared rows-only: $noOracle")
  }

  test("every oracle key has a query") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("all queries run and return rows at sf0.001") {
    // q186: the 4-core of the sf0.001 co-order graph is legitimately empty
    // (the oracle agrees) — the query is still exercised end-to-end
    val emptyOk = Set("q186_kcore")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      if (!emptyOk.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q8_latest_by_key: one row per user") {
    val df = SparkEntry.queries("q8_latest_by_key")(spark, dir)
    assert(df.select("user_id").distinct.count() == df.count())
  }

  test("q13_scd2_history: versions chain — end >= start") {
    val df = SparkEntry.queries("q13_scd2_history")(spark, dir)
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("__END_AT") < col("__START_AT")).count() == 0)
  }
}
