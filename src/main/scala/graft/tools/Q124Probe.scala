package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for q124 (MinHashIndex build + probe) — the r9
  * verdict's A/B item: decompose build-side fingerprint compute, the two
  * index writes (bands vs 64-dir shingle buckets), and the probe, so the
  * suspected per-dir write overhead is measured instead of guessed.
  * runMain graft.tools.Q124Probe [sfDir] */
object Q124Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q124] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
    docs.count() // warm
    (1 to 2).foreach { round =>
      println(s"[q124] ── round $round ──")
      val work = java.nio.file.Files.createTempDirectory("mhprobe").toString
      val idx = new graft.llm.MinHashIndex(s"$work/idx")
      val oldDocs = docs.filter($"doc_id" % 2 === 0)
      val newDocs = docs.filter($"doc_id" % 2 === 1)
      val shEx = time("build: shingleHash+ckpt") {
        graft.llm.Dedup.shingleHashRows(oldDocs, "doc_id", "text", 3).localCheckpoint()
      }
      val banded = time("build: bandRows") {
        graft.llm.Dedup.bandRows(shEx, 96, 24).localCheckpoint()
      }
      time("build: write bands")(
        banded.coalesce(8).write.mode("overwrite").parquet(s"$work/idx/bands"))
      time("build: write shingle dirs")(
        shEx.withColumn("__b", pmod(hash(col("id")), lit(64)))
          .repartition(col("__b"))
          .write.mode("overwrite").partitionBy("__b").parquet(s"$work/idx/shingles"))
      time("variant: 8-task shingle write")(
        shEx.withColumn("__b", pmod(hash(col("id")), lit(64)))
          .repartition(8, col("__b"))
          .write.mode("overwrite").partitionBy("__b").parquet(s"$work/idx/shingles8"))
      val n = time("probe (all phases)")(
        idx.probe(spark, newDocs, "doc_id", "text", 0.5).count())
      println(s"[q124] probe pairs=$n")
    }
    spark.stop()
  }
}
