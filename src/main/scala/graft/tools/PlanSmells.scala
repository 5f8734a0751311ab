package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep EVERY gate query's physical plan for scale smells —
  * cartesian products, nested-loop joins with a non-broadcast big side,
  * and single-partition exchanges feeding wide plans. Prints offenders
  * only (the audit loop behind the per-operator `.explain` iteration the
  * build process requires; not part of the driver contract). */
object PlanSmells {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    // BNLJ is correct when one side is a guaranteed-tiny broadcast: 1-row
    // scalar subqueries (q112, q157 global-total gate, q145's corpus-stats
    // cross join), broadcast query/centroid sets in the ANN brute-force and
    // IVF-assignment steps (q26/q27/q43/q61/q93), and the 4-row band table
    // in q60 (q139 is the both-sides-large path).
    // q179/q199/q211: contingency cells / PSI bins / category sums cross-
    // join a 1-row global-total aggregate (scalar-broadcast pattern, same
    // as q145/q157)
    // q222: the recall PIN intentionally contains the brute-force baseline
    // (broadcast 100-query side, q26's pattern) to compare LSH against it
    val justified = Set("q112_idle_customers", "q26_embedding_knn", "q27_embedding_dedup",
      "q43_ann_ivf", "q60_range_join", "q61_ann_ivf_kmeans", "q93_vector_index",
      "q145_bm25", "q157_important_stock", "q179_chi_square", "q199_psi",
      "q211_target_encoding", "q222_lsh_multiprobe",
      // q224: 1-row vocabulary-size scalar broadcast (q145's pattern)
      "q224_bigram_loglik")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan.toString
        val hits = smells.filter(plan.contains)
        if (hits.nonEmpty && !justified.contains(name)) {
          flagged += 1; println(s"SMELL $name: ${hits.mkString(", ")}")
        }
      } catch { case e: Throwable => println(s"ERROR $name: ${e.getMessage}") }
    }
    println(s"[plansmells] flagged $flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
