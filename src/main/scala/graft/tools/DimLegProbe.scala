package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: replicate the MV dim-trickle leg's fact-as-of IN-list read
  * against a soak-built 100× bucketed fact and report where the time
  * goes (planning/listing vs scan) — chasing the r13 soak's non-flat
  * mvj/mvs dim-trickle rows. Usage: runMain graft.tools.DimLegProbe <factRoot> */
object DimLegProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = graft.tables.BucketedSnapshotTable.layoutOf(spark, root).get
    val t = new graft.tables.BucketedSnapshotTable(root, l.numBuckets,
      l.keys.getOrElse(Seq("o_orderkey")))
    val v = t.currentVersion(spark).get
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val probeCust = time("head-cust") {
      t.read(spark).select("o_custkey").head.getLong(0)
    }
    val asOf = time("readIndexed-plan") { t.readIndexed(spark, Some(v)) }
    val visible = graft.cdc.ScdMerge.scd1Current(asOf)
    val q = visible.filter(col("o_custkey").isInCollection(Seq(probeCust)))
    time("count-filtered") { println("rows=" + q.count()) }
    time("count-filtered-2nd") { println("rows=" + q.count()) }
    val plan = q.queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l =>
      l.contains("Scan") || l.contains("PushedFilters") || l.contains("Filter"))
      .take(8).mkString("\n"))
    // the explicit per-dir probe path, for contrast
    time("readPrunedPoints") {
      println("rows=" + t.readPrunedPoints(spark, "o_custkey", Seq(probeCust))
        .filter(col("o_custkey") === probeCust).count())
    }
    spark.stop()
  }
}
