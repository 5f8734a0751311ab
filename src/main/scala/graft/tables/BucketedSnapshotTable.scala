package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.ScdMerge

/** Hash-bucketed snapshot table: the 100 TB form of [[SnapshotTable]].
  *
  * A plain snapshot commit rewrites the whole table on every SCD merge —
  * fine for the reference's 5 small dims (daily job,
  * spotify_dab.job.yml:7-11), wrong at 100 TB where a daily batch touches
  * a fraction of keys. Here rows are hash-partitioned into `numBuckets`
  * buckets by business key, and a merge:
  *
  *   1. computes the batch's affected bucket set (≤ numBuckets ints of
  *      driver-side metadata — same order as Delta's file-listing state);
  *   2. reads ONLY those buckets' current data (directory-pruned scan);
  *   3. runs the [[graft.cdc.ScdMerge]] algebra over that slice;
  *   4. writes the merged buckets as ONE hive-partitioned job under
  *      `_batch_v<N>/__bucket=<b>/`;
  *   5. commits a new manifest mapping touched buckets to the new batch
  *      dir and carrying every untouched bucket over BY REFERENCE.
  *
  * So merge IO is O(affected buckets), never O(table). With 4096 buckets
  * and a batch touching 1% of the key space, 99% of a 100 TB table is
  * untouched bytes referenced by the next manifest, exactly like Delta/
  * Iceberg rewrite-by-file. Reads stay a plain multi-dir parquet scan
  * (vectorized, pushdown intact), and equi-joins/groupBys on the bucket
  * keys see a stable hash layout.
  *
  * Layout:
  * {{{
  *   root/_current                      // one line: live manifest version
  *   root/_manifest_v<N>                // numBuckets + bucket→batchDir map
  *   root/_batch_v<N>/__bucket=<b>/...  // immutable bucket snapshots
  * }}}
  *
  * Commit protocol identical to [[SnapshotTable]]: batches stage under
  * `_staging_*`, then rename + manifest + pointer flip inside the
  * [[CommitLock]] critical section. Merges are optimistic read-modify-
  * write — a merge that loses the commit race recomputes against the
  * fresh state and retries, so racing writers on a shared table all land
  * and none is lost.
  *
  * Reference semantics carried over: SCD1 = FactStream.py:12-21, SCD2 =
  * DimUser.py:20-29 (via [[ScdMerge]]).
  */
final class BucketedSnapshotTable(
    val root: String,
    val numBuckets: Int,
    val keys: Seq[String],
    val statsCols: Seq[String] = Nil,
    /** Lock staleness window (test hook: shrink so paused-writer/steal
      * schedules run in test time; production default [[CommitLock.StaleMs]]). */
    commitStaleMs: Long = CommitLock.StaleMs) {

  require(numBuckets > 0, "numBuckets must be positive")

  val BucketCol = "__bucket"

  /** Deterministic bucket id of a row (Murmur3 over the business keys —
    * consistent with Spark's own `hash`/shuffle hashing). */
  def bucketExpr: Column = pmod(hash(keys.map(col): _*), lit(numBuckets))

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val pointer = new Path(root, "_current")

  /** Test-only fault injection (no-op in production): invoked at named
    * commit-protocol steps ("staged", "renamed", "manifest_file",
    * "mid_flip", "committed") so the crash-recovery property spec can
    * kill a writer between any two steps. */
  private[tables] var onStep: String => Unit = _ => ()

  def currentVersion(spark: SparkSession): Option[Int] = {
    val f = fs(spark)
    // MetaIO rides out a concurrent flip's transient states (missing-file
    // window, checksum-sidecar skew); a genuinely absent pointer falls
    // through to tmp adoption below.
    val direct = MetaIO.readSmall(f, pointer)
    if (direct.isDefined) {
      direct.map(_.trim.toInt)
    } else {
      // Mid-flip crash recovery: the flip is delete(pointer) → rename(tmp,
      // pointer). A missing pointer with a `_current.tmp.v` present means a
      // writer died between the two; its manifest + batch dir are complete
      // (they precede the flip), so the version IS committed — the commit
      // point is the pointer delete. Adopt the highest tmp, self-healing
      // the rename. On success the tmp is consumed, so stale tmps can only
      // be crashed flips.
      val tmps =
        if (!f.exists(new Path(root))) Array.empty[Int]
        else f.listStatus(new Path(root))
          .map(_.getPath.getName)
          .filter(_.startsWith("_current.tmp."))
          .map(_.stripPrefix("_current.tmp.").toInt)
      if (tmps.isEmpty) None
      else {
        val v = tmps.max
        f.rename(new Path(root, s"_current.tmp.$v"), pointer) // best-effort heal
        Some(v)
      }
    }
  }

  def exists(spark: SparkSession): Boolean = currentVersion(spark).isDefined

  /** bucket id → batch dir name (relative to root) for the live version. */
  def manifest(spark: SparkSession): Map[Int, String] =
    currentVersion(spark).map(readManifest(spark, _)).getOrElse(Map.empty)

  private def readManifest(spark: SparkSession, v: Int): Map[Int, String] = {
    val f = fs(spark)
    val in = f.open(new Path(root, s"_manifest_v$v"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // header lines are "name=value" (numBuckets always; keys since r7 —
    // older manifests without it still parse); entries are "bucket\tdir"
    lines.dropWhile(l => l.contains("=") && !l.contains("\t")).map { l =>
      val Array(b, dir) = l.split("\t", 2)
      b.toInt -> dir
    }.toMap
  }

  /** Header fields of the live manifest (numBuckets, keys when present) —
    * lets path-only consumers (the SQL MERGE router) reconstruct and
    * VALIDATE the table identity instead of silently mis-bucketing. */
  def manifestHeader(spark: SparkSession): Map[String, String] =
    currentVersion(spark).map { v =>
      val f = fs(spark)
      val in = f.open(new Path(root, s"_manifest_v$v"))
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      lines.takeWhile(l => l.contains("=") && !l.contains("\t"))
        .map { l => val Array(k, vv) = l.split("=", 2); k -> vv }.toMap
    }.getOrElse(Map.empty)

  private def writeManifest(spark: SparkSession, v: Int, m: Map[Int, String]): Unit = {
    val f = fs(spark)
    val body = (Seq(s"numBuckets=$numBuckets", s"keys=${keys.mkString(",")}") ++
      m.toSeq.sortBy(_._1).map { case (b, d) => s"$b\t$d" }).mkString("\n")
    val out = f.create(new Path(root, s"_manifest_v$v"), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    onStep("manifest_file")
    val tmp = new Path(root, s"_current.tmp.$v")
    val o2 = f.create(tmp, true)
    try o2.write(v.toString.getBytes("UTF-8")) finally o2.close()
    if (f.exists(pointer)) f.delete(pointer, false)
    onStep("mid_flip")
    if (!f.rename(tmp, pointer))
      throw new IllegalStateException(s"BucketedSnapshotTable $root: pointer flip failed")
  }

  /** Read a subset of buckets (directory-pruned: only the named bucket
    * dirs are listed/scanned). `None` = all live buckets. */
  private def readBuckets(spark: SparkSession, wanted: Option[Set[Int]]): Option[DataFrame] = {
    val m = manifest(spark)
    val picked = wanted.map(w => m.filter { case (b, _) => w(b) }).getOrElse(m)
    if (picked.isEmpty) None
    else {
      // group by batch dir so each dir is one relation with basePath set
      // (keeps __bucket as a partition column)
      val parts = picked.groupBy(_._2).map { case (dir, entries) =>
        spark.read
          .option("basePath", s"$root/$dir")
          .parquet(entries.keys.toSeq.sorted.map(b => s"$root/$dir/$BucketCol=$b"): _*)
      }.toSeq
      Some(parts.reduce(_ unionByName _))
    }
  }

  /** Full-table read (all buckets, internal bucket column dropped). */
  def read(spark: SparkSession): DataFrame =
    readBuckets(spark, None)
      .getOrElse(throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
      .drop(BucketCol)

  /** SCD Type 1 merge (last-write-wins upsert, FactStream.py:12-21
    * semantics). Returns the set of bucket ids rewritten. */
  def scd1Merge(spark: SparkSession, updates: DataFrame, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None): Set[Int] =
    merge(spark, updates, (cur, upd) =>
      ScdMerge.scd1Upsert(cur, upd, keys, seqCol, tieBreak, applyAsDeletes))

  /** SCD Type 2 merge (full version history, DimUser.py:20-29 semantics).
    * Returns the set of bucket ids rewritten.
    *
    * `applyAsDeletes` (tombstone semantics — see [[ScdMerge.scd2Merge]]):
    * the FIRST delete-enabled merge on a table written without deletes is
    * a one-time O(table) MIGRATION commit — every bucket is rewritten so
    * the stored schema gains `__DELETED` uniformly (bucket dirs from
    * different commits must agree on schema; a per-bucket drift would
    * break the unioned read). Subsequent merges are O(affected buckets)
    * again. */
  def scd2Merge(spark: SparkSession, updates: DataFrame, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None): Set[Int] = {
    val migrate = applyAsDeletes.isDefined && currentVersion(spark).isDefined &&
      !read(spark).columns.contains(ScdMerge.DeletedCol)
    merge(spark, updates, (cur, upd) =>
      ScdMerge.scd2Merge(cur, upd, keys, seqCol, tieBreak, Nil, applyAsDeletes),
      allBuckets = migrate)
  }

  private def merge(spark: SparkSession, updates: DataFrame,
      algebra: (Option[DataFrame], DataFrame) => DataFrame,
      allBuckets: Boolean = false): Set[Int] = {
    val upd = updates.withColumn(BucketCol, bucketExpr)
    // driver-side metadata: at most numBuckets ints — NOT row data
    val updBuckets = upd.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSet
    val affected =
      if (allBuckets) updBuckets ++ manifest(spark).keys else updBuckets
    if (affected.isEmpty) return Set.empty
    val f = fs(spark)

    // optimistic concurrency with automatic retry: a merge is read-modify-write
    // over the affected buckets, so it stages against the version it read
    // and recomputes from fresh state if another writer committed first —
    // racing merges on a shared table all land, serialized by the commit
    // lock, none lost.
    var attempt = 0
    var done = false
    while (!done) {
      val v0 = currentVersion(spark).getOrElse(0)
      val current = readBuckets(spark, Some(affected))
      val merged = algebra(current, upd)

      val staging = s"_staging_${java.util.UUID.randomUUID().toString.take(12)}"
      // repartition on the bucket id so each bucket dir gets ONE writer task
      // (one file), not shufflePartitions × buckets stragglers — at scale a
      // bucket is exactly one task's output, and the shuffle is the same
      // key-hash the merge already clustered on
      merged.repartition(col(BucketCol)).write.mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(s"$root/$staging")
      onStep("staged")
      // per-batch stats computed on the staging files, then re-pointed at
      // the final dir — keeps the locked critical section metadata-sized
      val stagedStats: Seq[String] =
        if (statsCols.isEmpty) Nil
        else StatsManifest.lines(spark.read.parquet(s"$root/$staging"), statsCols)

      val committed = CommitLock.withLockHandle(f, root, commitStaleMs) { lockH =>
        val cur = currentVersion(spark).getOrElse(0)
        if (cur != v0) { f.delete(new Path(s"$root/$staging"), true); false }
        else {
          val next = cur + 1
          val batchDir = s"_batch_v$next"
          // a crashed writer may have left an orphan _batch_v<next> (it
          // died between rename and pointer flip): unreachable — claiming
          // the version purges it, else our rename would nest into it
          val batchPath = new Path(s"$root/$batchDir")
          if (f.exists(batchPath)) f.delete(batchPath, true)
          if (!f.rename(new Path(s"$root/$staging"), batchPath))
            throw new IllegalStateException(s"BucketedSnapshotTable $root: staging rename failed")
          onStep("renamed")
          if (stagedStats.nonEmpty)
            StatsManifest.writeLines(f, batchStatsPath(batchDir),
              stagedStats.map(_.replace(s"/$staging/", s"/$batchDir/")))
          lockH.check() // paused-holder guard: abort rather than double-flip
          // A bucket whose merged content is EMPTY (every key tombstoned
          // by a delete flow) writes no partition dir — its manifest entry
          // must be REMOVED, not pointed at a missing path.
          val written = f.listStatus(batchPath).map(_.getPath.getName)
            .collect { case n if n.startsWith(s"$BucketCol=") =>
              n.stripPrefix(s"$BucketCol=").toInt }.toSet
          writeManifest(spark, next,
            (manifest(spark) -- affected) ++
              affected.intersect(written).map(_ -> batchDir).toMap)
          onStep("committed")
          true
        }
      }
      if (committed) done = true
      else {
        attempt += 1
        if (attempt > 12) throw new java.util.ConcurrentModificationException(
          s"BucketedSnapshotTable $root: merge lost the commit race 12 times — giving up")
        // jittered backoff so N symmetric racers don't re-stage in lockstep
        // (each loser pays a full re-stage; desynchronizing them lets one
        // winner land per staging window instead of all colliding again)
        Thread.sleep(math.min(50L * attempt, 500L) +
          java.util.concurrent.ThreadLocalRandom.current().nextLong(50))
      }
    }
    affected
  }

  // ── Per-batch file stats (SCD-merge × data-skipping composition) ───────
  //
  // The bucket layout prunes by KEY (which buckets a merge touches / an
  // equi-lookup reads); stats prune by VALUE range (which files a
  // time/range predicate can match). They compose because each immutable
  // batch dir carries its own `_stats` manifest, written once with the
  // batch — buckets carried over by reference keep their old batch's
  // stats. A 100 TB SCD table thus answers "current rows in this date
  // range" scanning only matching files of live buckets, without ever
  // rewriting untouched data or rescanning for stats.

  private def batchStatsPath(batchDir: String) = new Path(s"$root/$batchDir", "_stats")

  /** Range-pruned full-table read: live buckets only, and within them only
    * files whose per-batch stats for `column` intersect [lo,hi] (timestamp
    * bounds in epoch micros, dates in epoch days). Batches written without
    * stats keep all their files — pruning is always a superset guarantee,
    * and the caller still applies the row-level filter. */
  def readPruned(spark: SparkSession, column: String, lo: Double, hi: Double): DataFrame = {
    val m = manifest(spark)
    if (m.isEmpty) throw new IllegalStateException(s"BucketedSnapshotTable $root is empty")
    val f = fs(spark)
    // scheme-insensitive path (input_file_name() records file: URIs while
    // root may be a plain local path)
    def norm(p: String) = new Path(p).toUri.getPath
    val parts = m.groupBy(_._2).flatMap { case (dir, entries) =>
      val liveBucketFiles = entries.keys.toSeq.sorted.map(b => s"$root/$dir/$BucketCol=$b")
      val picked = StatsManifest.readLines(f, batchStatsPath(dir)) match {
        case None => liveBucketFiles // no stats for this batch → keep all
        case Some(lines) =>
          val inRange = StatsManifest.filesInRange(lines, column, lo, hi)
          // stats entries are absolute file paths; keep those under a live
          // bucket dir of THIS batch (stale buckets are skipped; the
          // trailing "/" keeps __bucket=1 from matching __bucket=11)
          val liveDirs = liveBucketFiles.map(d => norm(d) + "/")
          inRange.filter(p => liveDirs.exists(norm(p).startsWith)).sorted
      }
      if (picked.isEmpty) None
      else Some(spark.read.option("basePath", s"$root/$dir").parquet(picked: _*))
    }.toSeq
    if (parts.isEmpty) read(spark).limit(0) // schema-preserving empty relation
    else parts.reduce(_ unionByName _).drop(BucketCol)
  }

  /** Rewrite every bucket into the same batch dir (small-file compaction
    * after many incremental merges). Bucket layout is preserved, so
    * subsequent merges still prune. Staged + locked like merge; aborts
    * with ConcurrentModificationException if a merge lands first (rerun
    * the maintenance job — compaction has no state worth retrying). */
  def compact(spark: SparkSession): Int = {
    val f = fs(spark)
    val v0 = currentVersion(spark).getOrElse(0)
    val next = v0 + 1
    val batchDir = s"_batch_v$next"
    readBuckets(spark, None).foreach { df =>
      val staging = s"_staging_${java.util.UUID.randomUUID().toString.take(12)}"
      df.repartition(col(BucketCol))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(s"$root/$staging")
      val stagedStats: Seq[String] =
        if (statsCols.isEmpty) Nil
        else StatsManifest.lines(spark.read.parquet(s"$root/$staging"), statsCols)
      CommitLock.withLockHandle(f, root, commitStaleMs) { lockH =>
        val cur = currentVersion(spark).getOrElse(0)
        if (cur != v0) {
          f.delete(new Path(s"$root/$staging"), true)
          throw new java.util.ConcurrentModificationException(
            s"BucketedSnapshotTable $root: compact read version $v0 but found $cur — rerun")
        }
        val batchPath = new Path(s"$root/$batchDir")
        if (f.exists(batchPath)) f.delete(batchPath, true) // crashed writer's orphan
        if (!f.rename(new Path(s"$root/$staging"), batchPath))
          throw new IllegalStateException(s"BucketedSnapshotTable $root: staging rename failed")
        if (stagedStats.nonEmpty)
          StatsManifest.writeLines(f, batchStatsPath(batchDir),
            stagedStats.map(_.replace(s"/$staging/", s"/$batchDir/")))
        lockH.check() // paused-holder guard: abort rather than double-flip
        writeManifest(spark, next, manifest(spark).map { case (b, _) => b -> batchDir })
      }
    }
    next
  }

  /** Delete batch dirs no manifest ≤ the live version references… i.e.
    * unreachable from the CURRENT manifest (no time travel kept — callers
    * wanting travel keep old manifests and skip vacuum). Also clears
    * `_staging_*` orphans from crashed writers — do not run vacuum
    * concurrently with active writers (the standard vacuum contract). */
  def vacuum(spark: SparkSession): Unit = {
    val f = fs(spark)
    val live = manifest(spark).values.toSet
    val it = f.listStatus(new Path(root)).iterator
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if ((name.startsWith("_batch_v") && !live.contains(name)) ||
          name.startsWith("_staging_"))
        f.delete(st.getPath, true)
    }
  }
}
