package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: stage-by-stage cardinality probe of prefixJaccardPairs on the
  * ScaleSoak corpus — finds WHERE the super-linear work is (prefix size,
  * candidate pairs, verification expansion) at sf0.1 vs ~sf1. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val threshold = 0.7
    val cpus = Runtime.getRuntime.availableProcessors.toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((tag, path) <- Seq(
        "sf0.1" -> "/root/testdata/sf0.1/documents.parquet",
        "sf1" -> "/tmp/graft_soak/sf1/documents.parquet")) {
      val docs = spark.read.parquet(path)
      val sh = graft.llm.Dedup.shingleHashRows(docs, "doc_id", "text").localCheckpoint()
      val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
      val freq = sh.groupBy("h").agg(count(lit(1)).as("df"))
      val prefix = sh.join(freq, "h")
        .withColumn("r", row_number().over(
          Window.partitionBy("id").orderBy(col("df"), col("h"))))
        .join(counts, "id")
        .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
        .select("id", "h", "r", "n")
        .localCheckpoint()
      val postings = prefix.groupBy("h").agg(count(lit(1)).as("p"))
      val candExpansion = postings.agg(sum(col("p") * (col("p") - 1) / 2))
        .first.get(0).toString
      val cand = prefix.alias("a").join(prefix.alias("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("d1"), col("b.id").as("d2"))
      val candDistinct = cand.distinct().count()
      println(s"[$tag] shingleRows=${sh.count()} prefixRows=${prefix.count()} " +
        s"candExpansion=$candExpansion candDistinct=$candDistinct")
      val hot = postings.orderBy(col("p").desc).limit(5).collect()
        .map(r => r.getLong(1)).mkString(",")
      println(s"[$tag] hottest prefix postings: $hot")
    }
    spark.stop()
  }
}
