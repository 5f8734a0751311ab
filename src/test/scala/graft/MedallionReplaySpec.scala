package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ScdMerge
import graft.ingest.TableSpec
import graft.pipeline.{Medallion, MedallionTable}

/** The reference's de-facto acceptance scenario (SURVEY.md §5): replay the
  * initial load, then the incremental load with 20 "Premium upgrade" user
  * updates, and assert the SCD2/SCD1 post-state across the whole
  * five-table medallion — including the DimArtist silver-only asymmetry
  * and FactStream replay idempotency.
  */
class MedallionReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("five-table initial → incremental replay produces the expected SCD post-state") {
    val work = Files.createTempDirectory("spotify").toString
    val src = s"$work/source"
    val med = new Medallion(work)

    val tables = Seq(
      MedallionTable(TableSpec("dbo", "DimUser", "updated_at"),
        silverTransform = df => df.withColumn("user_name", upper(col("user_name"))),
        keys = Seq("user_id"), scdType = 2,
        expectations = Seq(graft.ops.Expectation("uid", "user_id IS NOT NULL"))),
      MedallionTable(TableSpec("dbo", "DimArtist", "updated_at"),
        keys = Seq("artist_id"), scdType = 2, goldEnabled = false), // silver-only
      MedallionTable(TableSpec("dbo", "DimTrack", "updated_at"),
        silverTransform = df => df
          .withColumn("track_name", regexp_replace(col("track_name"), "-", " "))
          .withColumn("duration_flag",
            graft.ops.Relational.bucketize(col("duration_sec"),
              Seq(150.0 -> "low", 300.0 -> "medium"), "high")),
        keys = Seq("track_id"), scdType = 2),
      MedallionTable(TableSpec("dbo", "DimDate", "date"),
        keys = Seq("date_key"), scdType = 2),
      MedallionTable(TableSpec("dbo", "FactStream", "stream_timestamp"),
        keys = Seq("stream_id"), scdType = 1))

    // run 1: initial seed
    SpotifyFixtures.write(spark, src, incremental = false)
    med.run(spark, tables, t => s"$src/$t.parquet", "run1")

    val gu1 = med.goldTable(spark, "DimUser")
    assert(gu1.count() == 500)
    assert(ScdMerge.current(gu1).count() == 500)
    assert(med.goldTable(spark, "FactStream").count() == 1000)

    // run 2: incremental seed appended at the source (watermark picks up
    // only rows newer than run 1's max updated_at)
    SpotifyFixtures.write(spark, src, incremental = true)
    med.run(spark, tables, t => s"$src/$t.parquet", "run2")

    val gu2 = med.goldTable(spark, "DimUser")
    // 500 initial + 50 new users + 20 upgrade versions
    assert(gu2.count() == 570)
    assert(ScdMerge.current(gu2).count() == 550)
    val upgraded = ScdMerge.history(gu2)
    assert(upgraded.count() == 20) // exactly the 20 closed old versions
    assert(upgraded.select("subscription_type").distinct.as[String].collect().toSeq == Seq("Free"))
    val nowPremium = ScdMerge.current(gu2).filter(col("user_id") < 20)
    assert(nowPremium.select("subscription_type").distinct.as[String].collect().toSeq == Seq("Premium"))
    // silver transform applied end to end
    assert(ScdMerge.current(gu2).select("user_name").as[String].head().startsWith("USER_"))

    // FactStream SCD1: 1200 distinct ids; the 100 re-sent ids upserted,
    // not duplicated — and their payload is the newer one
    val fs = med.goldTable(spark, "FactStream")
    assert(fs.count() == 1200)
    assert(fs.filter(col("stream_id") < 100 && col("listen_duration") === 999).count() == 100)

    // DimArtist: silver exists (550 rows), gold does not
    assert(spark.read.parquet(s"${med.silverDir}/DimArtist").count() == 550)
    assert(!new java.io.File(s"${med.goldDir}/DimArtist").exists())

    // DimTrack transforms: '-' → ' ' and duration bucketing survived to gold
    val tr = ScdMerge.current(med.goldTable(spark, "DimTrack"))
    assert(tr.filter(col("track_name").contains("-")).count() == 0)
    assert(tr.select("duration_flag").distinct.count() == 3)

    // run 3: replay run 2's source unchanged — full idempotency
    med.run(spark, tables, t => s"$src/$t.parquet", "run3")
    assert(med.goldTable(spark, "DimUser").count() == 570)
    assert(med.goldTable(spark, "FactStream").count() == 1200)

    // S5 exploration surface: gold tables are queryable by 3-level name,
    // incl. the reference's SCD2 history probe (silver_Dimensions.py:206-208)
    val hist = spark.sql(
      "SELECT count(*) AS n FROM spark_catalog.graft_gold.dimuser WHERE __END_AT IS NOT NULL")
      .as[Long].head()
    assert(hist == 20)
  }
}
