package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.cdc.ScdMerge
import graft.ops.{Expectation, Expectations}
import graft.streaming.AutoIngest
import graft.tables.SnapshotTable

/** Declarative gold-layer registry + runner — the DLT surface the
  * reference's gold layer uses (K4/C9): `create_streaming_table` +
  * `create_auto_cdc_flow` + expectations, executed in dependency order
  * with retries (readme.md:121-122 "checkpointing, retries, lineage").
  *
  * Each [[GoldTable]] is one declared streaming target: a silver source
  * directory feeds a `foreachBatch` SCD merge into a [[SnapshotTable]].
  */
case class GoldTable(
    name: String,
    silverPath: String,
    keys: Seq[String],
    sequenceBy: String,
    scdType: Int, // 1 (fact, DimUser FactStream.py:17) or 2 (dims, DimUser.py:27)
    expectations: Seq[Expectation] = Nil,
    tieBreak: Seq[Column] = Nil,
    dependsOn: Seq[String] = Nil,
    // DLT `apply_as_deletes` analog: batch rows matching this predicate
    // are sequence-ordered tombstones (SCD1 removes the key, SCD2 stores
    // a __DELETED version closing the chain — see ScdMerge). Plain
    // snapshot targets only.
    applyAsDeletes: Option[Column] = None,
    // > 0 ⇒ the target is a hash-bucketed snapshot (merge rewrites only
    // affected buckets — the 100 TB path; see BucketedSnapshotTable).
    // 0 ⇒ plain whole-snapshot commits (reference-scale parity).
    numBuckets: Int = 0,
    // When set, the stage streams from this CATALOG NAME via
    // `spark.readStream.table` — the reference's DLT source form
    // (`spark.readStream.table("...silver...")`, DimUser.py:10) — with the
    // schema resolved by the catalog. When None, it streams from
    // `silverPath` directly (schema-inference + rescue path).
    silverTable: Option[String] = None)

final class GoldPipeline(goldDir: String, checkpointRoot: String) {

  private var registry = Vector.empty[GoldTable]

  def declare(t: GoldTable): this.type = { registry :+= t; this }

  def tables: Seq[GoldTable] = registry

  def snapshot(name: String) = new SnapshotTable(s"$goldDir/$name")

  def bucketedSnapshot(t: GoldTable) =
    new graft.tables.BucketedSnapshotTable(s"$goldDir/${t.name}", t.numBuckets, t.keys)

  /** Read the live gold table regardless of its storage form. */
  def readTable(spark: SparkSession, name: String): DataFrame = {
    val t = registry.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"gold table $name not declared"))
    if (t.numBuckets > 0) bucketedSnapshot(t).read(spark)
    else snapshot(name).read(spark)
  }

  /** Kahn topo order over `dependsOn` (C9 — DLT resolves the DAG for us;
    * here it is explicit and deterministic). */
  private def topoOrder: Seq[GoldTable] = {
    val byName = registry.map(t => t.name -> t).toMap
    val visited = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String, path: List[String]): Unit = {
      if (path.contains(n)) throw new IllegalStateException(s"gold DAG cycle: ${(n :: path).reverse.mkString(" -> ")}")
      if (!visited.contains(n)) {
        byName(n).dependsOn.foreach(visit(_, n :: path))
        visited += n
      }
    }
    registry.foreach(t => visit(t.name, Nil))
    visited.toSeq.map(byName)
  }

  /** Run one AvailableNow pass over every declared table in DAG order.
    * Per micro-batch: expectations → SCD merge → atomic snapshot commit.
    * Retries: each table gets `maxRetries` fresh attempts (the stream
    * checkpoint makes a retry resume, not reprocess). */
  def runOnce(spark: SparkSession, maxRetries: Int = 2): Unit = {
    topoOrder.foreach { t =>
      var attempt = 0
      var done = false
      while (!done) {
        try { runTable(spark, t); done = true }
        catch {
          case e: Exception if attempt < maxRetries =>
            attempt += 1
            org.apache.log4j.Logger.getLogger(getClass)
              .warn(s"gold ${t.name}: attempt $attempt failed (${e.getMessage}); retrying")
        }
      }
    }
  }

  private def runTable(spark: SparkSession, t: GoldTable): Unit = {
    val cfg = AutoIngest.Config(
      sourceDir = t.silverPath,
      schemaDir = s"$checkpointRoot/${t.name}/_schema",
      checkpointDir = s"$checkpointRoot/${t.name}/_checkpoint",
      rescue = false)
    // S4 API parity: a declared catalog name streams via readStream.table
    // (catalog-resolved schema); otherwise the directory path streams with
    // schema inference + rescue.
    val source = t.silverTable match {
      case Some(name) => spark.readStream.table(name)
      case None       => AutoIngest.readStream(spark, cfg)
    }
    // Expectations are attached to the *streaming* DataFrame (not inside
    // foreachBatch) so their observe() metrics surface through
    // StreamingQueryListener.observedMetrics per micro-batch — the DLT
    // expectations-UI analog (C6).
    val stream = Expectations.expectAllOrDrop(
      source, t.expectations, s"quality_${t.name}")
    if (t.numBuckets > 0) {
      // bucketed target: the merge itself prunes to affected buckets
      // (delete flows included — the schema-evolving bucket read
      // null-fills __DELETED for untouched buckets, no migration commit)
      val target = bucketedSnapshot(t)
      AutoIngest.foreachBatchOnce(stream, cfg.checkpointDir) { (clean, _) =>
        if (t.scdType == 2)
          target.scd2Merge(spark, clean, t.sequenceBy, t.tieBreak, t.applyAsDeletes)
        else
          target.scd1Merge(spark, clean, t.sequenceBy, t.tieBreak, t.applyAsDeletes)
        ()
      }
    } else {
      val target = snapshot(t.name)
      AutoIngest.foreachBatchOnce(stream, cfg.checkpointDir) { (clean, _) =>
        val merged =
          if (t.scdType == 2)
            ScdMerge.scd2Merge(target.readOption(spark), clean, t.keys,
              t.sequenceBy, t.tieBreak, Nil, t.applyAsDeletes)
          else
            ScdMerge.scd1Upsert(target.readOption(spark), clean, t.keys,
              t.sequenceBy, t.tieBreak, t.applyAsDeletes)
        target.write(spark, merged)
      }
    }
  }
}
