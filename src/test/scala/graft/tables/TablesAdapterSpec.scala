package graft.tables

import org.scalatest.funsuite.AnyFunSuite

/** The events adapter must handle every ts encoding the driver has
  * shipped: raw-nanos long (rounds 1–3) and native timestamp (round 4+).
  * Current testdata only exercises the native path, so pin the legacy
  * branch with a synthetic raw-long file — both paths must surface
  * identical TimestampType values and identical watermark filtering. */
class TablesAdapterSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // 2024-01-15 00:00:00 UTC and one second after, in epoch nanos
  private val t0Nanos = 1705276800L * 1000000000L
  private val rows = Seq(
    (1L, t0Nanos - 1000000000L, 7L, "view", 1.0),
    (2L, t0Nanos, 7L, "click", 2.0),
    (3L, t0Nanos + 1000000000L, 8L, "purchase", 3.0))

  private def writeLegacy(): String = {
    val dir = java.nio.file.Files.createTempDirectory("legacyevents").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("legacy raw-nanos long ts surfaces as session TimestampType") {
    val dir = writeLegacy()
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = ev.select($"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
      .as[(Long, String)].collect().toMap
    assert(got(2L) == "2024-01-15 00:00:00")
    assert(got(1L) == "2024-01-14 23:59:59")
    assert(got(3L) == "2024-01-15 00:00:01")
  }

  test("legacy watermark filter is strict-greater and matches the native path's semantics") {
    val dir = writeLegacy()
    val since = Tables.eventsSince(spark, dir, "2024-01-15 00:00:00")
    assert(since.select($"event_id").as[Long].collect().toSeq == Seq(3L))
    // filter must reach the scan in storage units (a plain long compare)
    val plan = since.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      plan.take(1500))
  }

  test("native-path eventsSince agrees with a manual native filter") {
    val dir = "/root/testdata/sf0.001"
    val manual = Tables.events(spark, dir)
      .filter($"ts" > to_timestamp(lit("2024-01-15 00:00:00")))
      .count()
    assert(Tables.eventsSince(spark, dir, "2024-01-15 00:00:00").count() == manual)
  }

  private def date_format(c: org.apache.spark.sql.Column, fmt: String) =
    org.apache.spark.sql.functions.date_format(c, fmt)
  private def to_timestamp(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.to_timestamp(c)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
