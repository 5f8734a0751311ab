package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.AutoIngest

/** The production corpus-ingestion loop: a document stream where each
  * micro-batch is near-dup-rejected against everything kept so far, then
  * the survivors are appended and fingerprinted — composition of
  * [[graft.streaming.AutoIngest]] (S3/C1/C2 file streaming) with
  * [[MinHashIndex]] (incremental LSH index).
  *
  * Per batch, in arrival order:
  *  1. within-batch: any doc whose exact-verified jaccard with a
  *     SMALLER-id doc in the batch is ≥ threshold is dropped
  *     ([[Dedup.minhashNearDupPairs]] — conservative: a doc is dropped
  *     even if its only partner was itself dropped);
  *  2. cross-batch: survivors probe the index ([[MinHashIndex.probe]]) and
  *     are dropped on any hit — probe cost is O(batch), never O(corpus);
  *  3. the kept rows land in `sinkDir/batch_<id>/` (overwrite — a replayed
  *     batch rewrites the same dir, keeping the SINK idempotent) and their
  *     fingerprints are appended to the index.
  *
  * Crash between sink write and index add re-runs the batch: the sink dir
  * is rewritten identically; the index add is re-applied, which duplicates
  * fingerprints for that batch — dup candidates are dedup'd inside probe,
  * so results stay correct (re-adding only costs index space; rebuild the
  * index from the sink to reclaim it).
  */
object StreamingCorpusDedup {

  def run(spark: SparkSession, cfg: AutoIngest.Config, indexRoot: String,
      sinkDir: String, idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5, indexBuckets: Int = 64): Unit = {
    // size indexBuckets to the corpus: dirs-per-add is the fixed cost per
    // batch, verify-read granularity the benefit — 64 suits big corpora,
    // small/test corpora want 8
    val idx = new MinHashIndex(indexRoot, idBuckets = indexBuckets)
    val stream = AutoIngest.readStream(spark, cfg).drop("_rescued_data")
    AutoIngest.foreachBatchOnce(stream, cfg.checkpointDir) { (batch, batchId) =>
      val b = batch.localCheckpoint()
      if (!b.isEmpty) {
        val withinDrop = Dedup.minhashNearDupPairs(b, idCol, textCol, threshold = threshold)
          .select(col("d2").as("__drop_id")).distinct()
        val kept1 = b.join(withinDrop, b(idCol) === col("__drop_id"), "left_anti")
        val kept2 =
          if (!indexExists(spark, indexRoot)) kept1
          else {
            val hit = idx.probe(spark, kept1, idCol, textCol, threshold)
              .select(col("d_new").as("__drop_id")).distinct()
            kept1.join(hit, kept1(idCol) === col("__drop_id"), "left_anti")
          }
        val kept = kept2.localCheckpoint()
        kept.write.mode("overwrite").parquet(s"$sinkDir/batch_$batchId")
        if (!kept.isEmpty) {
          if (indexExists(spark, indexRoot)) idx.add(spark, kept, idCol, textCol)
          else idx.build(spark, kept, idCol, textCol)
        }
      }
    }
  }

  /** All batches' kept documents. */
  def readKept(spark: SparkSession, sinkDir: String) =
    spark.read.parquet(s"$sinkDir/batch_*")

  private def indexExists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(s"$root/bands")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
