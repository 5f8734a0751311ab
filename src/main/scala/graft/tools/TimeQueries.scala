package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries (args = query names) on
  * SPARK_GRAFT_SF_DIR with the bench session config. Not driver contract. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    args.foreach { name =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"TIME $name run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
