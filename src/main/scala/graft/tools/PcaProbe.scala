package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14 optimization round): phase-level timing of the
  * q312_debias_distributed shape (n=3 vectors, d=4096 → d²=16.7M covariance
  * cells routed through the DISTRIBUTED power iteration). Reports where the
  * wall/CPU goes: cell derivation, covariance build, the per-round matvec,
  * and the de-bias joins. Not driver contract. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"[pca] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f s")
      r
    }
    val d = 4096
    val embs = spark.range(3).select($"id".cast("long").as("vec_id"))
      .select($"vec_id", transform(sequence(lit(0), lit(d - 1)),
        i => ((($"vec_id" + 1) * 31 + i.cast("long") * 17) % 97)
          .cast("double") / 97.0).as("embedding"))
    // warm
    embs.count()

    (1 to 2).foreach { probeRound =>
      println(s"=== round $probeRound ===")
      val n = time("count-n") { embs.select($"vec_id").count() }
      val centered = time("centeredCells+checkpoint") {
        graft.llm.Pca.centeredCells(embs, "vec_id", "embedding").localCheckpoint()
      }
      val cov = graft.llm.Pca.covarianceFromCells(centered, n)
      val covD = time("cov build+checkpoint") {
        cov.select(col("i"), col("j"), col("c").cast("double").as("c")).localCheckpoint()
      }
      time("matvec x5 (DataFrame path)") {
        var v = spark.range(d).select(col("id").cast("int").as("j"),
          round(lit(1.0) / sqrt(lit(d.toDouble)), 9).as("vj")).localCheckpoint()
        import graft.functions.FixedPointFunctions._
        var nrm = 0.0
        for (_ <- 1 to 5) {
          val w = covD.join(broadcast(v), Seq("j"))
            .select(col("i"), quantize_fixed(col("c") * col("vj"), 12).as("t"))
            .groupBy(col("i"))
            .agg(sum_fixed(col("t"), 12).as("wi"))
            .localCheckpoint()
          nrm = math.sqrt(w
            .select(quantize_fixed(col("wi") * col("wi"), 12).as("s"))
            .agg(sum_fixed(col("s"), 12)).head().getDouble(0))
          v = w.select(col("i").as("j"), round(col("wi") / nrm, 9).as("vj"))
            .localCheckpoint()
        }
        println(s"  nrm=$nrm")
      }
      time("full debiasReport") {
        graft.llm.Pca.debiasReport(spark, embs, "vec_id", "embedding", d, iters = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
