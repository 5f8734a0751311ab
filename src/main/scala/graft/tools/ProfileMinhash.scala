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

    time("shingleRows(distinct)")(
      Dedup.shingleRows(docs, "doc_id", "text", 3).count())
    time("shingleRows+checkpoint") {
      Dedup.shingleRows(docs, "doc_id", "text", 3).localCheckpoint().count()
    }
    val shEx = Dedup.shingleRows(docs, "doc_id", "text", 3).localCheckpoint()
    val hashed = shEx.select(col("id"), xxhash64(col("shingle")).as("h"))
    val minAggs = (0 until 96).map { i =>
      min(xxhash64(lit(i.toLong), col("h"))).as(s"m$i")
    }
    val sig = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
    time("signature96(from ckpt)")(sig.count())
    val counts = shEx.groupBy("id").agg(count(lit(1)).as("n"))
    time("counts(from ckpt)")(counts.count())
    time("full1")(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count())
    time("full2")(Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count())
    time("ngramJaccard(exact)")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
