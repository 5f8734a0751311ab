package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash band index for INCREMENTAL near-duplicate detection —
  * the production shape of corpus dedup: the existing corpus is fingerprinted
  * ONCE, and each day's new batch probes the index, so probe cost scales with
  * the batch, never the corpus.
  *
  * Layout (all plain parquet):
  * {{{
  *   root/bands/                 (id, band, bucket)   — LSH candidate join side
  *   root/shingles/__b=<k>/      (id, h)              — 8-byte shingle hashes,
  *                                                      hash-bucketed by id
  * }}}
  *
  * No separate set-size sidecar: a shingle bucket holds ALL rows of every id
  * hashed to it, so the probe derives exact old-side set sizes from the
  * buckets it already reads for verification.
  *
  * Scale design: the probe's exact-verify step needs the INDEXED side's
  * shingle hashes only for candidate ids — storing them hash-bucketed by id
  * (64 dirs) lets the probe read just the candidate buckets (directory
  * pruning, same trick as [[graft.tables.BucketedSnapshotTable]]), so verify
  * IO is O(candidates), not O(corpus). The candidate join itself shuffles
  * 8-byte (band, bucket) keys. Like [[Dedup.minhashNearDupPairs]], candidates
  * are exactly verified, so output precision is exact; recall is the band
  * geometry's (1−(1−s⁴)²⁴ at the defaults).
  */
final class MinHashIndex(
    val root: String,
    val shingleN: Int = 3,
    val numHashes: Int = 96,
    val bands: Int = 24,
    val idBuckets: Int = 64) {

  private def idBucket(c: org.apache.spark.sql.Column) = pmod(hash(c), lit(idBuckets))

  /** Fingerprint `df` and write the index (full rebuild). */
  def build(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Unit =
    writeFingerprints(df, idCol, textCol, "overwrite")

  /** Incrementally index a new batch: append its fingerprints alongside the
    * existing ones (parquet append — new files land in the same band dir /
    * shingle bucket dirs, no rewrite of existing data). After `add`, probes
    * see old ∪ new; indexing cost is O(batch). Ids must be new — re-adding
    * an id duplicates its fingerprints. */
  def add(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Unit =
    writeFingerprints(df, idCol, textCol, "append")

  private def writeFingerprints(df: DataFrame, idCol: String, textCol: String,
      mode: String): Unit = {
    val shEx = Dedup.shingleHashRows(df, idCol, textCol, shingleN).localCheckpoint()
    writePrecomputed(shEx, Dedup.bandRows(shEx, numHashes, bands), mode)
  }

  /** [[build]]/[[add]] from PRE-computed shingle-hash and band relations
    * (schemas: (id, h) and (id, band, bucket), fingerprinted with THIS
    * index's shingleN/numHashes/bands) — for callers that already computed
    * them for dedup/probe and would otherwise pay the minhash aggregation
    * a second time. `mode` is "overwrite" (build) or "append" (add). */
  def writePrecomputed(shEx: DataFrame, banded: DataFrame, mode: String): Unit = {
    banded.coalesce(8).write.mode(mode).parquet(s"$root/bands")
    // write-task count: hashing __b into shuffle-partition-many tasks left
    // most tasks writing 1-2 tiny files each, and the per-task commit
    // overhead dominated the build on small batches (measured 3× the write
    // time of an 8-task layout at sf0.1 — the r9 verdict's q124 suspect).
    // Grow with cluster width, cap at idBuckets (a bucket is one file, so
    // parallelism beyond the bucket count buys nothing).
    val sc = shEx.sparkSession.sparkContext
    val writeTasks = math.min(idBuckets, math.max(8, sc.defaultParallelism / 4))
    shEx.withColumn("__b", idBucket(col("id")))
      .repartition(writeTasks, col("__b"))
      .write.mode(mode).partitionBy("__b").parquet(s"$root/shingles")
  }

  /** The indexed (id, band, bucket) relation — for callers that fold the
    * index side into their OWN candidate join (the streaming corpus loop
    * unions it with the batch's bands so within-batch dedup and index
    * probe are ONE join). At the join this side is the big scanned one;
    * the batch side broadcasts, so per-batch cost stays O(batch) + one
    * index scan, no corpus shuffle. */
  def readBands(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$root/bands")

  /** Sorted shingle-hash sets `(id, hs)` for the ids in `candidateOldIds`
    * (a one-column `id` relation): the id set is reduced to its bucket
    * dirs driver-side (≤ idBuckets ints — metadata, not row data) and
    * ONLY those dirs are scanned, so verify IO is O(candidates), never
    * O(corpus). Non-candidate ids sharing a bucket ride along — harmless,
    * the verify join filters them. */
  def readShingleSets(spark: SparkSession, candidateOldIds: DataFrame): DataFrame = {
    val buckets = candidateOldIds
      .select(idBucket(col(candidateOldIds.columns.head)).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (buckets.isEmpty)
      return spark.range(0).select(col("id"),
        array().cast("array<bigint>").as("hs"))
    spark.read.option("basePath", s"$root/shingles")
      .parquet(buckets.map(b => s"$root/shingles/__b=$b").toIndexedSeq: _*)
      .groupBy("id").agg(sort_array(collect_list(col("h"))).as("hs"))
  }

  /** Near-dup pairs between `newDf` and the indexed corpus: (d_new, d_old,
    * jaccard ≥ threshold). Only the candidates' shingle buckets are read. */
  def probe(spark: SparkSession, newDf: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val shNew = Dedup.shingleHashRows(newDf, idCol, textCol, shingleN).localCheckpoint()
    probePrecomputed(spark, shNew, Dedup.bandRows(shNew, numHashes, bands), threshold)
  }

  /** [[probe]] from PRE-computed new-side shingle-hash and band relations
    * (same reuse rationale as [[writePrecomputed]]). */
  def probePrecomputed(spark: SparkSession, shNew: DataFrame, newBands: DataFrame,
      threshold: Double): DataFrame = {
    val oldBands = spark.read.parquet(s"$root/bands")
    val candidates = newBands.alias("a").join(oldBands.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("d_new"), col("b.id").as("d_old"))
      .dropDuplicates("d_new", "d_old")
      .localCheckpoint() // reused for bucket list + verify join

    // candidate old-ids → bucket dirs (driver-side: ≤ idBuckets ints)
    val buckets = candidates.select(idBucket(col("d_old")).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (buckets.isEmpty)
      return candidates.withColumn("jaccard", lit(0.0d)).limit(0)
    val oldSh = spark.read.option("basePath", s"$root/shingles")
      .parquet(buckets.map(b => s"$root/shingles/__b=$b").toIndexedSeq: _*)

    val nNew = shNew.groupBy("id").agg(count(lit(1)).as("n"))
    // exact old-side set sizes from the (pruned) bucket read — a bucket
    // contains every row of each id it holds
    val oldCnt = oldSh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(shNew.select(col("id").as("d_new"), col("h")), "d_new")
      .join(oldSh.select(col("id").as("d_old"), col("h")), Seq("d_old", "h"))
      .groupBy("d_new", "d_old").agg(count(lit(1)).as("i"))
    inter
      .join(nNew.select(col("id").as("d_new"), col("n").as("n1")), "d_new")
      .join(oldCnt.select(col("id").as("d_old"), col("n").as("n2")), "d_old")
      .withColumn("jaccard",
        col("i").cast("double") / (col("n1") + col("n2") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d_new"), col("d_old"), col("jaccard"))
  }
}
