package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Dev probe (r14 optimization round): phase-level timing of the
  * q326_incremental_star_mv shape — fixture writes (plain fact + two
  * bucketed dims), CREATE/bootstrap-REFRESH of the star view, and the three
  * incremental legs — to see which engine path the ~19 s wall actually
  * buys. Not driver contract. */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_MVPROBE_AQE", "true"))
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_MVPROBE_SMJ", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // per-job timing: which of the ~dozens of jobs inside a refresh carry
    // the wall time (enable with SPARK_GRAFT_MVPROBE_JOBS=1)
    if (sys.env.get("SPARK_GRAFT_MVPROBE_JOBS").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val run = si.taskMetrics.executorRunTime / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          if (run > 0.2)
            println(f"[stage] ${si.stageId}%4d run $run%7.2f s cpu $cpu%7.2f s  tasks ${si.numTasks}%3d  ${si.name.take(90)}")
        }
      })
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"[mv] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f s")
      r
    }
    // warm
    try graft.SparkEntry.queries("q1_pricing_summary")(spark, dir).count()
    catch { case _: Throwable => () }

    (1 to 2).foreach { probeRound =>
      println(s"=== round $probeRound ===")
      val work = java.nio.file.Files.createTempDirectory("mvprobe").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_MVPROBE_INNER", "8"))
      try {
        val sqlRun = (q: String) => org.apache.spark.sql.GraftColumnBridge.graftSql(spark, q)
        val fact = new graft.tables.SnapshotTable(s"$work/fact")
        val d1 = new graft.tables.BucketedSnapshotTable(s"$work/orders", 16, Seq("o_orderkey"))
        val d2 = new graft.tables.BucketedSnapshotTable(s"$work/part", 16, Seq("p_partkey"))
        val l0 = Tables.lineitem(spark, dir)
          .select($"l_orderkey".as("o_orderkey"), $"l_linenumber",
            $"l_partkey", $"l_quantity".cast("decimal(18,2)").as("q0"))
          .groupBy($"o_orderkey", $"l_linenumber")
          .agg(min($"l_partkey").as("p_partkey"),
            sum($"q0").cast("decimal(18,2)").as("qty"))
        val k1 = time("heads k1/k2/pk") {
          val k1 = l0.agg(min($"o_orderkey")).as[Long].head()
          val k2 = l0.filter($"o_orderkey" > k1).agg(min($"o_orderkey")).as[Long].head()
          val pk = Tables.lineitem(spark, dir).agg(min($"l_partkey")).as[Long].head()
          (k1, k2, pk)
        }
        time("fact.write v1") { fact.write(spark, l0) }
        time("d1.scd1Merge orders") {
          d1.scd1Merge(spark, Tables.orders(spark, dir)
            .select($"o_orderkey", $"o_orderpriority".as("prio"))
            .withColumn("op_seq", lit(1L)), "op_seq")
        }
        time("d2.scd1Merge part") {
          d2.scd1Merge(spark, Tables.part(spark, dir).select($"p_partkey", $"p_brand")
            .withColumn("op_seq", lit(1L)), "op_seq")
        }
        time("CREATE star view") {
          sqlRun(s"CREATE MATERIALIZED STAR VIEW '$work/mv' FACT '$work/fact' " +
            s"KEYS (o_orderkey, l_linenumber) DIM '$work/orders' ON (o_orderkey) " +
            s"DIM '$work/part' ON (p_partkey) GROUP BY (prio, p_brand) " +
            "AGG (count(*) AS n, sum(qty) AS sq) INTO 32 BUCKETS").collect()
        }
        time("bootstrap REFRESH") {
          sqlRun(s"REFRESH MATERIALIZED STAR VIEW '$work/mv'").collect()
        }
        time("fact.write v2") {
          fact.write(spark, l0.withColumn("qty",
            when($"o_orderkey" === k1._1, $"qty" + 5).otherwise($"qty")
              .cast("decimal(18,2)")))
        }
        time("REFRESH fact leg") {
          sqlRun(s"REFRESH MATERIALIZED STAR VIEW '$work/mv'").collect()
        }
        time("d1 flip merge") {
          d1.scd1Merge(spark, Seq((k1._2, 2L, "9-FLIP")).toDF("o_orderkey", "op_seq", "prio"),
            "op_seq")
        }
        time("REFRESH dim1 leg") {
          sqlRun(s"REFRESH MATERIALIZED STAR VIEW '$work/mv'").collect()
        }
        time("d2 flip merge") {
          d2.scd1Merge(spark, Seq((k1._3, 2L, "BRAND#99")).toDF("p_partkey", "op_seq", "p_brand"),
            "op_seq")
        }
        time("REFRESH dim2 leg") {
          sqlRun(s"REFRESH MATERIALIZED STAR VIEW '$work/mv'").collect()
        }
        time("final read") {
          sqlRun(s"MATERIALIZED VIEW '$work/mv'")
            .select($"prio", $"p_brand", $"n", $"sq".cast("double").as("sq"))
            .orderBy($"prio", $"p_brand").count()
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
