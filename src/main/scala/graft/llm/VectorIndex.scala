package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF vector index: centroid cells materialized as a
  * hive-partitioned parquet layout, so a search touches only the probed
  * cells' directories — the on-disk form of [[Similarity.ivfTopK]].
  *
  * Build: train/seed `nCentroids` spherical centroids, assign every corpus
  * vector to its nearest cell, write `root/data/__cell=<c>/…` plus the
  * k×dim centroid table at `root/centroids` (model parameters, tiny).
  *
  * Search: assign each query to its `nProbe` nearest centroids (one
  * broadcast join against the centroid table), then scan ONLY those cell
  * directories (partition-pruned — at 100 TB the scan is
  * `nProbe/nCentroids` of the corpus, scheduled as that fraction of
  * tasks), brute-force cosine within, per-query top-k.
  *
  * New batches append via [[add]] (assigned to the frozen codebook, same
  * contract as FAISS `add()`); re-[[build]] periodically to retrain the
  * centroids when the distribution drifts.
  */
final class VectorIndex(val root: String) {

  private val CellCol = "__cell"

  /** Build (or overwrite) the index from `corpus`. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, trainIters: Int = 2): Unit = {
    val cents =
      if (trainIters > 0)
        Similarity.kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else corpus
        .select(col(idCol).as("cent_id"), transform(col(vecCol), _.cast("double")).as("cv0"))
        .withColumn("__h", xxhash64(col("cent_id")))
        .orderBy(col("__h")).limit(nCentroids)
        .select(col("cent_id"),
          col("cv0"), sqrt(Similarity.dot(col("cv0"), col("cv0"))).as("cnorm0"))
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$root/centroids")

    writeAssigned(spark, corpus, idCol, vecCol, SaveMode.Overwrite)
  }

  /** Incrementally index a new batch against the EXISTING centroids: new
    * files append into the matching cell dirs, the codebook is untouched.
    * Same contract as FAISS `add()` — cells drift from optimal as the
    * distribution shifts; re-`build` periodically to retrain. Ids must be
    * new. */
  def add(spark: SparkSession, batch: DataFrame, idCol: String, vecCol: String): Unit =
    writeAssigned(spark, batch, idCol, vecCol, SaveMode.Append)

  private def writeAssigned(spark: SparkSession, vectors: DataFrame,
      idCol: String, vecCol: String, mode: SaveMode): Unit = {
    val centsDf = spark.read.parquet(s"$root/centroids")
    val v = vectors.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("vec"))
      .withColumn("vnorm", sqrt(Similarity.dot(col("vec"), col("vec"))))
    val w = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cent_id").asc)
    v.join(broadcast(centsDf))
      .withColumn("ccos",
        Similarity.dot(col("vec"), col("cv0")) / (col("vnorm") * col("cnorm0")))
      .withColumn("crank", row_number().over(w)).filter(col("crank") === 1)
      .select(col("id"), col("vec"), col("vnorm"), col("cent_id").as(CellCol))
      .repartition(col(CellCol))
      .write.mode(mode).partitionBy(CellCol).parquet(s"$root/data")
  }

  /** The (pruned) relation a probe set touches — exposed for plan audits. */
  def cellScan(spark: SparkSession, cells: Seq[Long]): DataFrame =
    spark.read.parquet(s"$root/data").filter(col(CellCol).isin(cells: _*))

  /** Approximate top-k neighbors for `queries` (exact within probed cells). */
  def search(spark: SparkSession, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val centsDf = spark.read.parquet(s"$root/centroids")
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("qv"))
      .withColumn("qnorm", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cent_id").asc)
    val probes = q.join(broadcast(centsDf))
      .withColumn("ccos",
        Similarity.dot(col("qv"), col("cv0")) / (col("qnorm") * col("cnorm0")))
      .withColumn("crank", row_number().over(wq)).filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnorm"), col("cent_id").as(CellCol))

    // probe set: ≤ nCentroids longs of driver-side metadata, never row data
    val cells = probes.select(CellCol).distinct().collect().map(_.getLong(0)).toSeq
    val corpus = cellScan(spark, cells)

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id").asc)
    probes.join(corpus, Seq(CellCol))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos",
        Similarity.dot(col("qv"), col("vec")) / (col("qnorm") * col("vnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .dropDuplicates("query_id", "id")
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("cos"))
  }
}
