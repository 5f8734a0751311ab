package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM side of CrossProcessContentionSpec: a SECOND OS process
  * (own SparkSession, own FileSystem object, no shared JVM monitors)
  * racing commits against the parent test JVM on one SnapshotTable root.
  * The in-JVM CommitLockSpec schedules cover thread races; this covers
  * the deployment reality of two drivers on one table, where the only
  * serialization is the `_lock` file protocol itself.
  *
  * args: tableRoot syncDir workerId nCommits mode(append|merge)
  * Protocol: write `$syncDir/ready_<workerId>` once the session is up,
  * busy-wait for `$syncDir/go`, then run the commit loop. Exit 0 on
  * success, 2 on any failure (parent asserts on it).
  */
object ContentionWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, syncDir, workerId, nStr, mode) = args
    val n = nStr.toInt
    try {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("cw-wh").toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      java.nio.file.Files.createFile(java.nio.file.Paths.get(syncDir, s"ready_$workerId"))
      val go = java.nio.file.Paths.get(syncDir, "go")
      val deadline = System.currentTimeMillis() + 60000
      while (!java.nio.file.Files.exists(go)) {
        if (System.currentTimeMillis() > deadline) sys.exit(3)
        Thread.sleep(20)
      }
      mode match {
        case "append" =>
          val t = new SnapshotTable(root)
          for (seq <- 1 to n)
            t.append(spark, Seq((workerId, seq)).toDF("worker", "seq"))
        case "merge" =>
          // B stamps odd op_seq (2i-1); the parent stamps even (2i) — the
          // shared key's last-write-wins outcome is deterministic (max
          // op_seq = parent's final) whatever the cross-process interleaving
          val t = new BucketedSnapshotTable(root, 8, Seq("k"))
          for (i <- 1 to n)
            t.scd1Merge(spark,
              Seq((s"$workerId-$i", 2 * i - 1), ("shared", 2 * i - 1))
                .toDF("k", "op_seq"),
              "op_seq")
        case "read" =>
          // continuous reader while the PARENT appends + compacts: every
          // read must see a COMPLETE committed snapshot — the seed row,
          // a gapless prefix {("A",1..k)} (a hole would be a torn read of
          // a half-committed version or a mid-commit manifest), and a row
          // count that never goes backwards. Loops until the parent drops
          // `done` (and always reads at least once after it appears, so
          // the final state is covered too).
          val t = new SnapshotTable(root)
          val done = java.nio.file.Paths.get(syncDir, "done")
          var lastCount = -1
          var reads = 0
          var sawDone = false
          while (!sawDone) {
            sawDone = java.nio.file.Files.exists(done)
            val rows = t.read(spark).as[(String, Int)].collect()
            require(rows.count(_._1 == "seed") == 1,
              s"torn read: seed missing in ${rows.toSeq}")
            val seqs = rows.filter(_._1 == "A").map(_._2).sorted.toSeq
            require(seqs == (1 to seqs.size), s"torn read: non-prefix seqs $seqs")
            require(rows.length >= lastCount,
              s"row count went backwards: ${rows.length} < $lastCount")
            lastCount = rows.length
            reads += 1
          }
          System.err.println(s"[contention-worker] $reads clean reads")
          require(reads > 0)
      }
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"[contention-worker] FAILED: $e")
        sys.exit(2)
    }
  }
}
