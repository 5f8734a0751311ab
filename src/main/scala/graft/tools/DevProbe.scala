package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the minhash pipeline (not part of the
  * library surface; runMain graft.tools.DevProbe <sfDir>). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("PROBE_MAXFIELDS", "100"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("PROBE_OHA_FALLBACK", "128"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"[probe] $name%-28s wall=${(System.nanoTime()-t0)/1e9}%7.2f cpu=${(osBean.getProcessCpuTime-c0)/1e9}%7.2f")
      r
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())
    val shEx = time("shingleHashRows+ckpt") {
      graft.llm.Dedup.shingleHashRows(docs, "doc_id", "text").localCheckpoint()
    }
    println(s"[probe] shingle rows = ${time("shEx count")(shEx.count())}")
    val banded = time("bandRows+ckpt") {
      graft.llm.Dedup.bandRows(shEx, 96, 24).localCheckpoint()
    }
    val candidates = time("candidates join+dedup+ckpt") {
      banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("d1"), col("b.id").as("d2"))
        .dropDuplicates("d1", "d2").localCheckpoint()
    }
    println(s"[probe] candidates = ${candidates.count()}")
    time("verify joins") {
      val counts = shEx.groupBy("id").agg(count(lit(1)).as("n"))
      val inter = candidates
        .join(shEx.select(col("id").as("d1"), col("h")), "d1")
        .join(shEx.select(col("id").as("d2"), col("h")), Seq("d2", "h"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
      inter
        .join(counts.select(col("id").as("d1"), col("n").as("n1")), "d1")
        .join(counts.select(col("id").as("d2"), col("n").as("n2")), "d2")
        .count()
    }
    time("full minhashNearDupPairs") {
      graft.llm.Dedup.minhashNearDupPairs(docs, "doc_id", "text").count()
    }

    // q144 replica with phase timing
    time("q144 replica") {
      import spark.implicits._
      val work = java.nio.file.Files.createTempDirectory("sdedup-probe").toString
      time("  src prep") {
        docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$work/src/f1")
        docs.filter($"doc_id" % 2 === 1).coalesce(1).write.parquet(s"$work/src/f2")
        val t0 = System.currentTimeMillis() - 120000
        for ((d, t) <- Seq(("f1", t0), ("f2", t0 + 60000));
             f <- new java.io.File(s"$work/src/$d").listFiles())
          f.setLastModified(t)
      }
      val cfg = graft.streaming.AutoIngest.Config(s"$work/src/*", s"$work/schema",
        s"$work/ck", maxFilesPerTrigger = Some(1))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      try time("  run") {
        graft.llm.StreamingCorpusDedup.run(spark, cfg, s"$work/idx", s"$work/kept",
          indexBuckets = 8)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      time("  readKept") {
        graft.llm.StreamingCorpusDedup.readKept(spark, s"$work/kept").count()
      }
    }
    spark.stop()
  }
}
