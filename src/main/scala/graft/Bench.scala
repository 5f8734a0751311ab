package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32]; follow the machine if unpinned
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fail fast (one named line) if the driver regenerated testdata with a
    // schema the table adapters don't handle — see round-4 events.ts drift.
    graft.tables.SchemaPreflight.check(spark, sfDir)
    // Warm the session once (codegen/JIT, parquet footers) so the first
    // timed query isn't charged ~5 s of one-time JVM startup cost.
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Process-CPU per query alongside wall: two driver bench rounds were
    // distorted by machine load (343 s loaded vs 193 s quiet in r3) —
    // cpu/wall separates load (wall up, cpu flat) from regression (both
    // up) without a re-run. getProcessCpuTime is cumulative ns across all
    // threads of this JVM, which at local[32] IS the whole engine.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // dev-only: optional comma-separated query filter (driver passes no args)
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    def fmt(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    def jmap(kvs: Iterable[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.map(_._1).sum
    val cpuTotal = results.values.map(_._2).sum
    // Per-query MEDIANS for the 15 heaviest (r12): two driver rounds in a
    // row were distorted by one-off sandbox noise on single samples
    // (q306 5.9x with a byte-identical fixture); the median of 3 runs
    // separates band from regression without cross-machine guesswork.
    // The first-run map stays the round-over-round comparable; medians
    // ride alongside. Disable with SPARK_GRAFT_BENCH_MEDIANS=0.
    val medians: Map[String, Double] =
      if (sys.env.get("SPARK_GRAFT_BENCH_MEDIANS").contains("0")) Map.empty
      else results.toSeq.sortBy(-_._2._1).take(15)
        .filterNot { case (n, _) => errors.contains(n) }
        .map { case (name, (first, _)) =>
          val reruns = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            try { SparkEntry.queries(name)(spark, sfDir).count() }
            catch { case _: Throwable => () }
            (System.nanoTime() - t0) / 1e9
          }
          name -> (first +: reruns).sorted.apply(1)
        }.toMap
    // The driver captures a bounded tail of stdout; a single long line gets its
    // FRONT truncated, cutting the leading "metric" field (BENCH_r01/r02 both
    // came back parsed:null; r04's 69-name errors array pushed metric/value out
    // of the tail window again). Emit the full per-query maps first, then a
    // short summary line LAST whose size is BOUNDED regardless of failures:
    // error COUNT in the short line, the full list only in the long line and
    // the side file.
    val fullJson = s"""{"queries":${jmap(results.view.mapValues(_._1))},"cpu":${jmap(results.view.mapValues(_._2))},"medians":${jmap(medians)},"errors":$errs,"sf":"$sfDir","metric":"total","value":${fmt(total)},"unit":"sec","cpu_sec":${fmt(cpuTotal)}}"""
    println(fullJson)
    // Whole-result side file the driver (or a human) can read untruncated.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullJson + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] side file: ${e.getMessage}") }
    val slowest = results.toSeq.sortBy(-_._2._1).take(15)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpu_sec":${fmt(cpuTotal)},"queries":${jmap(slowest.map(x => x._1 -> x._2._1))},"cpu":${jmap(slowest.map(x => x._1 -> x._2._2))},"medians":${jmap(medians)},"error_count":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
