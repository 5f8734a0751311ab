package graft.tables

import org.scalatest.funsuite.AnyFunSuite

/** The preflight exists so a driver-side testdata regeneration surfaces
  * as ONE named error instead of dozens of opaque per-query analysis
  * failures (round-4 events.ts drift). Pin both directions: real
  * testdata passes; an adapter-breaking schema throws SCHEMA_DRIFT. */
class SchemaPreflightSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("current testdata passes preflight") {
    SchemaPreflight.check(spark, "/root/testdata/sf0.001")
  }

  test("events.ts with an unhandled type throws a named SCHEMA_DRIFT error") {
    val dir = java.nio.file.Files.createTempDirectory("preflight").toString
    Seq((1L, "2024-01-01T00:00:00Z")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](SchemaPreflight.check(spark, dir))
    assert(e.getMessage.contains("SCHEMA_DRIFT"))
    assert(e.getMessage.contains("events.ts"))
  }

  test("any table's column retype throws a named SCHEMA_DRIFT line (r6: all 10 pinned)") {
    val dir = java.nio.file.Files.createTempDirectory("preflight3").toString
    // l_quantity regenerated as string — the family pin must name it
    Seq((1L, "5")).toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[IllegalStateException](SchemaPreflight.check(spark, dir))
    assert(e.getMessage.contains("SCHEMA_DRIFT"))
    assert(e.getMessage.contains("l_quantity"))
    // dropped columns are drift too, reported in the same line
    assert(e.getMessage.contains("l_partkey: MISSING"))
  }

  test("embeddings with a non-float vector element throws SCHEMA_DRIFT") {
    val dir = java.nio.file.Files.createTempDirectory("preflight2").toString
    Seq((1L, Array("a", "b"))).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](SchemaPreflight.check(spark, dir))
    assert(e.getMessage.contains("SCHEMA_DRIFT"))
  }
}
