package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.gold.{GoldPipeline, GoldTable}
import graft.ingest.{IncrementalIngest, TableSpec}
import graft.ops.Expectation
import graft.streaming.AutoIngest

/** The end-to-end medallion run — the reference's daily job chain
  * (spotify_dab.job.yml:7-34: ADF ingestion → silver notebook → DLT
  * refresh) as one orchestrated Scala entry point (SURVEY.md §3 E1→E2→E3).
  *
  * Per configured table and per run:
  *  - bronze: watermark-filtered incremental copy of the source parquet
  *  - silver: streaming file ingest of the new bronze files + declarative
  *    column transforms + streaming parquet append
  *  - gold:   foreachBatch SCD merge into a versioned snapshot table
  *
  * Everything is idempotent across reruns: the bronze watermark, the
  * silver/gold stream checkpoints, and the SCD merge algebra each absorb
  * replays.
  */
case class MedallionTable(
    spec: TableSpec,
    silverTransform: DataFrame => DataFrame = identity,
    keys: Seq[String],
    scdType: Int,
    expectations: Seq[Expectation] = Nil,
    tieBreak: Seq[Column] = Nil,
    // DimArtist asymmetry: the reference lands it in silver but declares no
    // gold DLT module for it (SURVEY.md §1.1) — config-driven, not special-cased.
    goldEnabled: Boolean = true,
    // > 0 ⇒ gold target is hash-bucketed (merge rewrites affected buckets
    // only; see BucketedSnapshotTable) — the 100 TB fact-table setting.
    numBuckets: Int = 0)

final class Medallion(workDir: String) {

  val bronzeDir = s"$workDir/bronze"
  val silverDir = s"$workDir/silver"
  val goldDir   = s"$workDir/gold"
  private val ckRoot = s"$workDir/_checkpoints"

  /** One full run (the reference's daily trigger). `runTs` is injected for
    * determinism (§2.11: ADF's `utcNow()` SetVariable). */
  def run(spark: SparkSession, tables: Seq[MedallionTable],
          sourcePathFor: String => String, runTs: String): Unit = {

    // E1 — bronze: incremental, watermark-driven.
    IncrementalIngest.runAll(spark, tables.map(_.spec), sourcePathFor, bronzeDir, runTs)

    // E2 — silver: stream new bronze files through the transforms.
    tables.foreach { t =>
      val name = t.spec.table
      val bronzeTablePath = s"$bronzeDir/$name"
      val fs = new org.apache.hadoop.fs.Path(bronzeTablePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(fs.makeQualified(new org.apache.hadoop.fs.Path(bronzeTablePath)))) {
        val cfg = AutoIngest.Config(
          sourceDir = s"$bronzeTablePath/*",
          schemaDir = s"$ckRoot/silver/$name/_schema",
          checkpointDir = s"$ckRoot/silver/$name/_checkpoint")
        val stream = t.silverTransform(AutoIngest.readStream(spark, cfg).drop("_rescued_data"))
        AutoIngest.appendOnce(stream, s"$silverDir/$name", cfg.checkpointDir)
        // register the silver table so the gold stage can stream it BY
        // CATALOG NAME (S4 API parity — the reference's gold sources are
        // `spark.readStream.table(...)` over silver, DimUser.py:10)
        graft.sql.TableCatalog.registerParquet(
          spark, "graft_silver", name.toLowerCase, s"$silverDir/$name")
      }
    }

    // E3 — gold: declarative SCD targets in DAG order, sourced from the
    // registered silver catalog names.
    val gold = new GoldPipeline(goldDir, s"$ckRoot/gold")
    tables.filter(_.goldEnabled).foreach { t =>
      val silverName = s"graft_silver.${t.spec.table.toLowerCase}"
      gold.declare(GoldTable(
        name = t.spec.table,
        silverPath = s"$silverDir/${t.spec.table}",
        keys = t.keys,
        sequenceBy = t.spec.cdcCol,
        scdType = t.scdType,
        expectations = t.expectations,
        tieBreak = t.tieBreak,
        numBuckets = t.numBuckets,
        silverTable =
          if (spark.catalog.tableExists(silverName)) Some(silverName) else None))
    }
    gold.runOnce(spark)

    // S5 — exploration surface: register the live gold tables so
    // `spark.sql` probes work, the reference's `spotify_cata.gold.*`
    // analog. Plain snapshots get a 3-level catalog table; bucketed
    // snapshots (multi-dir) get a temp view.
    tables.filter(_.goldEnabled).foreach { t =>
      if (t.numBuckets > 0)
        graft.sql.TableCatalog.registerView(spark,
          s"graft_gold_${t.spec.table.toLowerCase}",
          gold.readTable(spark, t.spec.table))
      else
        graft.sql.TableCatalog.registerSnapshot(
          spark, "graft_gold", t.spec.table.toLowerCase, gold.snapshot(t.spec.table))
    }
  }

  def goldTable(spark: SparkSession, name: String): DataFrame =
    new GoldPipeline(goldDir, s"$ckRoot/gold").snapshot(name).read(spark)
}
