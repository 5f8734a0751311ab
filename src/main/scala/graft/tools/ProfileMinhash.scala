package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the MinHash pipeline stages (not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Dedup
    val docs = graft.tables.Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    docs.count() // warm
    val exploded = Dedup.shingleRows(docs, "doc_id", "text", 3)
    if (false) time("shingleRows")(exploded.count())
    val minAggs = (0 until 96).map(s => min(xxhash64(col("shingle"), lit(s))).as(s"m$s"))
    val sig = exploded.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until 96).map(i => col(s"m$i")): _*).as("sig"))
    if (false) time("signature")(sig.count())
    val banded = sig.select(col("id"), explode(Dedup.lshBands(col("sig"), 24, 4)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    if (false) time("banded")(banded.count())
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2")).dropDuplicates("d1", "d2")
    if (false) time("candidates")(cand.count())
    time("full1")(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count())
    time("full2")(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
