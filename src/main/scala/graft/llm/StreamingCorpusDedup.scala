package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.AutoIngest

/** The production corpus-ingestion loop: a document stream where each
  * micro-batch is near-dup-rejected against everything kept so far, then
  * the survivors are appended and fingerprinted — composition of
  * [[graft.streaming.AutoIngest]] (S3/C1/C2 file streaming) with
  * [[MinHashIndex]] (incremental LSH index).
  *
  * Per batch, in arrival order:
  *  1. rejection, as ONE candidate join (r8): the batch's band rows probe
  *     (batch ∪ index) bands in a single LSH join — a doc is dropped when
  *     an exact-verified jaccard ≥ threshold pairs it with a SMALLER-id
  *     batch doc (within-batch dedup; conservative: dropped even if the
  *     partner was itself dropped) or with ANY indexed doc (cross-batch).
  *     Equivalent to the former two-join within-then-probe form — the
  *     index holds only previously-kept docs — at ~half the per-batch
  *     jobs; the batch side broadcasts, so probe cost is O(batch) + one
  *     index-band scan, never a corpus shuffle;
  *  2. the kept rows land in `sinkDir/batch_<id>/` (overwrite — a replayed
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
    val dbgOn = sys.env.contains("GRAFT_DEDUP_TIMING")
    def dbg[T](name: String)(f: => T): T =
      if (!dbgOn) f else {
        val t0 = System.nanoTime(); val r = f
        println(f"[sdedup] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
    AutoIngest.foreachBatchOnce(stream, cfg.checkpointDir) { (batch, batchId) =>
      // No batch checkpoint: the micro-batch is a frozen parquet file list,
      // so each consumer's rescan is a cheap pushdown scan inside a job it
      // already runs — an eager pin here only adds a job to the fixed
      // per-batch cost (measured: job count, not data, dominates a small
      // batch's latency).
      val b = batch
      if (!b.isEmpty) {
        // Fingerprint the batch ONCE: the 96-way minhash aggregation is the
        // loop's dominant CPU cost, and three consumers need it (within-
        // batch dedup, index probe, index append). Survivor subsets are
        // carved out with id semi-joins instead of re-fingerprinting.
        val shEx = dbg("shingles")(Dedup.shingleHashRows(b, idCol, textCol, idx.shingleN)
          .localCheckpoint())
        val banded = dbg("bands")(Dedup.bandRows(shEx, idx.numHashes, idx.bands)
          .localCheckpoint())
        def restrict(df: DataFrame, ids: DataFrame) =
          df.join(ids.select(col(idCol).as("id")), Seq("id"), "left_semi")

        // ONE candidate join for the whole rejection pass (r8): the batch's
        // bands probe (batch ∪ index) bands in a single join instead of a
        // within-batch self-join PLUS an index-probe join. The batch side
        // broadcasts (it is the small side), so the index bands are scanned
        // once map-side — no corpus shuffle, and ~half the per-batch jobs.
        // Semantics unchanged and conservative: a batch doc is doomed when
        //  - an INDEX doc verifies ≥ threshold (src=1, any pair), or
        //  - a SMALLER-id batch doc verifies ≥ threshold (src=0, a.id<b.id
        //    dooms the larger), even if the partner is itself dropped.
        val hasIdx = indexExists(spark, indexRoot)
        val probeSide =
          if (!hasIdx) banded.withColumn("__src", lit(0))
          else banded.withColumn("__src", lit(0))
            .unionByName(idx.readBands(spark).withColumn("__src", lit(1)))
        val cands = dbg("candidate join")(banded.alias("a")
          .join(probeSide.alias("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              (col("b.__src") === 1 || col("a.id") < col("b.id")))
          .select(
            when(col("b.__src") === 1, col("a.id")).otherwise(col("b.id")).as("__doomed"),
            when(col("b.__src") === 1, col("b.id")).otherwise(col("a.id")).as("__other"),
            col("b.__src").as("__src"))
          .dropDuplicates("__doomed", "__other")
          .localCheckpoint()) // reused: old-bucket pruning + verify join
        // exact verify with ONE kernel for both pair kinds: doomed is
        // always a batch doc (sets from the batch's pinned shingles);
        // the partner's sets come from the batch or the bucket-pruned
        // index read (O(candidates) IO) — ids are globally unique, so the
        // unioned set relation is unambiguous
        val batchSets = shEx.groupBy("id")
          .agg(sort_array(collect_list(col("h"))).as("hs"))
        val otherSets =
          if (!hasIdx) batchSets
          else batchSets.unionByName(
            idx.readShingleSets(spark, cands.filter(col("__src") === 1)
              .select(col("__other"))))
        val dropIds = cands
          .join(batchSets.select(col("id").as("__doomed"), col("hs").as("h1")), "__doomed")
          .join(otherSets.select(col("id").as("__other"), col("hs").as("h2")), "__other")
          .withColumn("i", size(array_intersect(col("h1"), col("h2"))).cast("long"))
          .filter(col("i").cast("double") /
            (size(col("h1")) + size(col("h2")) - col("i")).cast("double") >= threshold)
          .select(col("__doomed").as("__drop_id")).distinct()
        val kept2 = b.join(dropIds, b(idCol) === col("__drop_id"), "left_anti")
        // the sink write IS the materialization; read back for the index add
        dbg("sink write")(
          kept2.write.mode("overwrite").parquet(s"$sinkDir/batch_$batchId"))
        val kept = spark.read.parquet(s"$sinkDir/batch_$batchId")
        if (!kept.isEmpty) {
          val mode = if (indexExists(spark, indexRoot)) "append" else "overwrite"
          dbg("index write")(
            idx.writePrecomputed(restrict(shEx, kept), restrict(banded, kept), mode))
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
