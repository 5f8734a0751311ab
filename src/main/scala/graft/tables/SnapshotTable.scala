package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet table with an atomic current-version pointer — the
  * Delta-less transactional table the SCD sinks need (SURVEY.md §7.2 step 1;
  * no Delta/Iceberg/Hudi jars ship with this build).
  *
  * Layout:
  * {{{
  *   root/_v1/part-*.parquet      // immutable full snapshots
  *   root/_v2/part-*.parquet
  *   root/_tomb_v2/part-*.parquet // key tombstones pending against _v2
  *   root/_current                // one line: the live version number
  * }}}
  *
  * Commit protocol: stage the snapshot fully under `_staging_*`, then — in
  * a short critical section guarded by the `_lock` file (atomic
  * create-if-absent, stale-steal after a timeout) — rename it to `_v(N+1)`
  * and flip `_current` via write-temp + rename. Readers resolve the
  * pointer first, so they only ever see complete snapshots; concurrent
  * writers serialize on the rename+flip only (data writes overlap freely).
  * [[writeIf]] adds read-modify-write conflict DETECTION on top: a merge
  * job that read version N commits with `expected = N` and aborts cleanly
  * if someone else advanced the table meanwhile — optimistic concurrency,
  * the same contract Delta gives MERGE (the reference is one daily job,
  * spotify_dab.job.yml:7-11, but a shared 100 TB table is not).
  *
  * A version may carry a `_files_v<N>` manifest (one absolute file URI per
  * line): then the snapshot's data is EXACTLY those files, which may live
  * in OLDER versions' directories. [[optimizeCompact]] uses this to commit
  * a compaction that rewrites only the small files and re-references the
  * big ones — O(small files) IO, the Delta OPTIMIZE shape — without
  * breaking immutability or time travel.
  *
  * Scale note: snapshots are plain parquet dirs, so a 1000-executor read
  * is an ordinary `FileSourceScanExec` with pushdown/pruning; `write` can
  * be partitioned (`partitionByCols`) so downstream key-equi joins prune.
  */
object SnapshotTable {
  /** Which path the most recent [[SnapshotTable.changes]]/CDF-window diff
    * took on this driver — "pruned" (unique files only), "tombstone-delta"
    * (unique files + the semi-joined rows new tombstones hid), or "full"
    * (two whole snapshots). Observability hook for the scan-set pins;
    * driver-side single-writer, not a synchronization primitive. */
  private[graft] val lastDiffMode =
    new java.util.concurrent.atomic.AtomicReference[String]("")
}

final class SnapshotTable(val root: String,
    commitStaleMs: Long = CommitLock.StaleMs) {

  // (SQL forms of the maintenance entry points — OPTIMIZE / VACUUM /
  // DESCRIBE HISTORY — live in graft.sql.GraftSqlParser, injected by
  // graft.GraftExtensions.)

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val pointer = new Path(root, "_current")

  def currentVersion(spark: SparkSession): Option[Int] = {
    val f = fs(spark)
    // MetaIO rides out a concurrent writer's delete→rename pointer flip
    // (missing-file window + checksum-sidecar skew on local FS)
    MetaIO.readSmall(f, pointer).map(_.trim.toInt).orElse {
      // Mid-flip CRASH recovery (the bucketed table's rule, same protocol):
      // pointer absent but a `_current.tmp.v` present means a writer died
      // between delete(pointer) and rename(tmp, pointer). Its version dir
      // and manifest are complete (they precede the flip), so the version
      // IS committed — without adoption the table would read as v0 and the
      // next writer's claimVersionDir would RECLAIM (delete) live version
      // dirs. Adopt the highest tmp and self-heal the rename.
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

  private def filesPath(v: Int) = new Path(root, s"_files_v$v")

  /** The version's data file URIs when it carries a `_files_v<N>` manifest
    * (a compacted version referencing a mix of its own and older files);
    * None for plain directory-backed versions. */
  private def fileManifest(f: org.apache.hadoop.fs.FileSystem, v: Int): Option[Vector[String]] = {
    val p = filesPath(v)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toVector)
      finally in.close()
    }
  }

  /** Recursive parquet listing via per-directory `listStatus` — NOT
    * `FileSystem.listFiles(recursive)`, whose local implementation stats
    * every file individually (measured ~6 ms/file: a 560-file partitioned
    * version listed in 7 s vs 0.07 s for this walk). One LIST call per
    * directory is also the natural shape for a hive-partitioned tree on
    * an object store. */
  private def walkParquet(f: org.apache.hadoop.fs.FileSystem,
      dir: Path): Vector[org.apache.hadoop.fs.FileStatus] = {
    val buf = Vector.newBuilder[org.apache.hadoop.fs.FileStatus]
    val stack = scala.collection.mutable.Stack(dir)
    while (stack.nonEmpty) {
      f.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) stack.push(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) buf += st
      }
    }
    buf.result()
  }

  /** (uri, bytes) of every data file of version `v` — manifest-resolved
    * when present, else a recursive listing of the version dir (partition
    * subdirs included). */
  private def listDataFiles(f: org.apache.hadoop.fs.FileSystem, v: Int): Vector[(String, Long)] =
    fileManifest(f, v) match {
      case Some(uris) => uris.map(u => u -> f.getFileStatus(new Path(u)).getLen)
      case None =>
        walkParquet(f, new Path(s"$root/_v$v"))
          .map(st => st.getPath.toUri.toString -> st.getLen)
    }

  /** [[listDataFiles]] keeping the listing's own [[FileStatus]] objects —
    * what a path-sensitive consumer (the partition-aware index, whose
    * `k=v` values may contain Spark-escaped characters that do NOT survive
    * a `Path → uri-string → Path` round trip) must use. Manifest versions
    * pay the same one-getFileStatus-per-file the (uri, len) listing
    * already pays. */
  private def listDataFileStatuses(f: org.apache.hadoop.fs.FileSystem,
      v: Int): Vector[org.apache.hadoop.fs.FileStatus] =
    fileManifest(f, v) match {
      case Some(uris) => uris.map(u => f.getFileStatus(new Path(u)))
      case None => walkParquet(f, new Path(s"$root/_v$v"))
    }

  /** The version's snapshot relation, before tombstones: the dir for plain
    * versions, the exact manifest file list for compacted ones. */
  private def snapshotDF(spark: SparkSession, v: Int): DataFrame =
    fileManifest(fs(spark), v) match {
      case Some(uris) => readManifest(spark, uris)
      case None       => spark.read.parquet(s"$root/_v$v")
    }

  /** Read an explicit manifest file list WITHOUT losing hive partition
    * values: a bare `spark.read.parquet(files)` has no `basePath`, so
    * `k=v` directory segments (the only place a partitioned write stores
    * those columns) would silently come back null. Files are therefore
    * grouped by the version dir that physically holds them and each group
    * is read with that dir as `basePath` — Spark then runs its ordinary
    * partition inference per group, typed exactly like a plain directory
    * read. Groups are cast-aligned by name to the first group's schema
    * (guards against per-dir inference drift, e.g. int vs long) and
    * unioned. */
  private def readManifest(spark: SparkSession, uris: Vector[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val byDir = uris.groupBy(versionDirOf).toSeq.sortBy(_._1)
    val parts = byDir.map { case (v, us) =>
      spark.read.option("basePath", s"$root/_v$v").parquet(us: _*)
    }
    // UNION schema across groups (a schema-evolving append mixes old files
    // lacking the new columns with new files carrying them): first-seen
    // type wins, absent columns null-fill — the Delta mergeSchema read.
    val allCols = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.DataType]
    parts.foreach(_.schema.foreach(f =>
      if (!allCols.contains(f.name)) allCols(f.name) = f.dataType))
    parts.map { p =>
      p.select(allCols.toSeq.map { case (n, dt) =>
        if (p.columns.contains(n)) col(n).cast(dt).as(n)
        else lit(null).cast(dt).as(n)
      }: _*)
    }.reduce(_ unionByName _)
  }

  private def versionDirOf(uri: String): Int =
    "_v(\\d+)/".r.findFirstMatchIn(uri).map(_.group(1).toInt).getOrElse(
      throw new IllegalStateException(
        s"SnapshotTable $root: manifest file outside any version dir: $uri"))

  /** Hive partition column names of version `v` (in directory order), from
    * the `k=v` path segments of its data files; empty when the version's
    * files are flat. A manifest version mixes partitioned old files with
    * flat increments, so the first file with segments decides. */
  private def partitionColsOf(f: org.apache.hadoop.fs.FileSystem, v: Int): Seq[String] =
    listDataFiles(f, v).iterator.map { case (uri, _) =>
      val segs = new Path(uri).toUri.getPath.split('/')
      val vIdx = segs.lastIndexWhere(_.matches("_v\\d+"))
      segs.slice(vIdx + 1, segs.length - 1).toSeq
        .filter(_.contains('=')).map(_.takeWhile(_ != '='))
    }.find(_.nonEmpty).getOrElse(Nil)

  /** Hive partition columns of the LIVE version (empty when flat) — lets
    * rewrite DML (SQL UPDATE) carry the table's physical layout forward
    * through a copy-on-write commit. */
  def partitionColumns(spark: SparkSession): Seq[String] =
    currentVersion(spark).map(partitionColsOf(fs(spark), _)).getOrElse(Nil)

  /** Stats-manifest columns of the live version, when it carries one. */
  def statsColumns(spark: SparkSession): Option[Seq[String]] =
    currentVersion(spark).flatMap(v =>
      StatsManifest.readLines(fs(spark), statsPath(v)).map(StatsManifest.statsColumns))

  /** (Re)build the LIVE version's stats manifest over `cols` — one scan of
    * the immutable just-committed snapshot; used by rewrite DML so data
    * skipping survives a copy-on-write commit. */
  def refreshStats(spark: SparkSession, cols: Seq[String]): Unit = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    StatsManifest.write(snapshotDF(spark, v), cols, fs(spark), statsPath(v))
  }

  /** ANALYZE-style Bloom backfill: (re)build the live version's per-file
    * Bloom sidecar over `cols` without rewriting data — the plain-table
    * analog of the bucketed per-batch bloom, after which
    * [[readPrunedBloomLong]]/[[readPrunedBloomString]] prune on a table
    * whose snapshot was written without an index. */
  def refreshBloom(spark: SparkSession, cols: Seq[String],
      fpp: Double = 0.03): Unit = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    BloomIndex.write(snapshotDF(spark, v), cols, fpp, fs(spark), bloomPath(v))
    // ANALYZE-time probe-IO consolidation (one blob per version dir)
    BloomIndex.consolidate(fs(spark), bloomPath(v))
  }

  def read(spark: SparkSession): DataFrame = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    applyTombstones(spark, v, snapshotDF(spark, v))
  }

  def readOption(spark: SparkSession): Option[DataFrame] =
    currentVersion(spark).map(v => applyTombstones(spark, v, snapshotDF(spark, v)))

  /** Time travel: read a specific committed version (any snapshot dir not
    * yet vacuumed), minus that version's own tombstones. The live pointer
    * is untouched. */
  def readVersion(spark: SparkSession, version: Int): DataFrame = {
    val f = fs(spark)
    val p = new Path(s"$root/_v$version")
    val gone = f.exists(new Path(root, s"_gone_v$version"))
    if (gone || (!f.exists(p) && !f.exists(filesPath(version))))
      throw new IllegalArgumentException(
        s"SnapshotTable $root: version $version does not exist (vacuumed or never committed)")
    applyTombstones(spark, version, snapshotDF(spark, version))
  }

  /** Timestamp time travel (Delta `TIMESTAMP AS OF` analog): the newest
    * version committed at or before `tsMillis`, by the commit artifact's
    * filesystem mtime — `_files_v<N>` (written inside the commit critical
    * section) when present, else the `_v<N>` snapshot dir (claimed by the
    * commit rename). Raises if every retained version is newer. */
  def versionAt(spark: SparkSession, tsMillis: Long): Int = {
    val f = fs(spark)
    val byName = f.listStatus(new Path(root)).map(s => s.getPath.getName -> s).toMap
    // manifest-only versions (a versioned delete references the prior
    // files without a _v dir) count like any other
    val versions = byName.keys
      .collect { case n if n.matches("_(v|files_v)\\d+") => n.dropWhile(!_.isDigit).toInt }
      .toSet
      .filterNot(v => byName.contains(s"_gone_v$v"))
    val eligible = versions.filter { v =>
      val art = byName.get(s"_files_v$v").orElse(byName.get(s"_v$v"))
      art.exists(_.getModificationTime <= tsMillis)
    }
    if (eligible.isEmpty) throw new IllegalArgumentException(
      s"SnapshotTable $root: no version committed at or before " +
        s"${java.time.Instant.ofEpochMilli(tsMillis)} (earliest retained is newer)")
    eligible.max
  }

  /** [[readVersion]] at the newest version committed ≤ `tsMillis`. */
  def readTimestamp(spark: SparkSession, tsMillis: Long): DataFrame =
    readVersion(spark, versionAt(spark, tsMillis))

  // ── Row-level deletes via key tombstones (deletion-vector analog) ──────
  //
  // Deleting a handful of rows from a 100 TB snapshot must not rewrite the
  // snapshot: Delta solves this with deletion vectors, we solve it with KEY
  // TOMBSTONES — `deleteKeys` appends the doomed keys as a tiny parquet
  // batch under `_tomb_v<live>` (an O(deleted-rows) write), and every read
  // path anti-joins them out. The tombstone side is a small file relation,
  // so Spark broadcasts the anti join (no shuffle of the big side); once
  // tombstones accumulate, `compact` — whose input is the tombstone-applied
  // `read` — materializes the deletes into a clean next version.

  private def tombPath(v: Int) = new Path(root, s"_tomb_v$v")

  /** Delete rows of the LIVE version matching `keys` (anti-join on all of
    * `keys`' columns, matched by name). Appends a tombstone batch — the
    * snapshot itself is untouched, so the cost is O(|keys|), not O(table).
    * Idempotent: re-deleting the same keys changes nothing. */
  def deleteKeys(spark: SparkSession, keys: DataFrame): Unit = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    keys.dropDuplicates().write.mode(SaveMode.Append).parquet(tombPath(v).toString)
  }

  /** Versioned row delete — commit a NEW version whose data files are the
    * live version's BY REFERENCE (`_files_v`, zero data IO) and whose
    * tombstone set adds `keys`: the delete becomes an EVENT between two
    * versions, so time travel to the prior version still shows the rows
    * and a CDF window spanning the commit reports them as `delete`s
    * through the tombstone-delta diff. (An in-place [[deleteKeys]]
    * retroactively mutates the live version's visibility, which a
    * checkpointed CDF consumer can never observe — use this form wherever
    * downstream mirrors consume the table.) Stats carry verbatim (same
    * files), the Bloom sidecar by copy. O(deleted + accumulated
    * tombstones) IO. Returns the committed version. */
  def deleteKeysVersioned(spark: SparkSession, keys: DataFrame): Int = {
    val f = fs(spark)
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID().toString.take(12)}")
    try keys.dropDuplicates().write.mode(SaveMode.Overwrite).parquet(staging.toString)
    catch { case t: Throwable => f.delete(staging, true); throw t }
    // any failure inside the critical section (stolen lock, rename error)
    // must not leak the staged tombstone batch — nothing else reaps
    // _staging_ dirs at this root outside vacuum
    def cleanupOnFailure[T](body: => T): T =
      try body catch { case t: Throwable => f.delete(staging, true); throw t }
    cleanupOnFailure(withCommitLock(f) { lockH =>
      val cur = currentVersion(spark).getOrElse {
        throw new IllegalStateException(s"SnapshotTable $root has no committed version")
      }
      val next = cur + 1
      lockH.check()
      // claim: a crashed writer's stale artifacts for `next` must not
      // attach to OUR commit
      (Seq(filesPath(next), statsPath(next), bloomPath(next), tombPath(next),
        new Path(s"$root/_v$next"))).foreach(p => if (f.exists(p)) f.delete(p, true))
      StatsManifest.writeLines(f, filesPath(next),
        listDataFiles(f, cur).map(_._1).map(canonical))
      StatsManifest.readLines(f, statsPath(cur)).foreach(ls =>
        StatsManifest.writeLines(f, statsPath(next), ls))
      if (f.exists(bloomPath(cur)))
        org.apache.hadoop.fs.FileUtil.copy(f, bloomPath(cur), f, bloomPath(next),
          false, f.getConf)
      if (f.exists(tombPath(cur)))
        org.apache.hadoop.fs.FileUtil.copy(f, tombPath(cur), f, tombPath(next),
          false, f.getConf)
      f.mkdirs(tombPath(next))
      f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          if (!f.rename(st.getPath, new Path(tombPath(next), st.getPath.getName)))
            throw new IllegalStateException(
              s"SnapshotTable $root: tombstone batch move failed")
        }
      f.delete(staging, true)
      lockH.check()
      commitPointer(spark, next)
      next
    })
  }

  private def applyTombstones(spark: SparkSession, v: Int, df: DataFrame): DataFrame = {
    val p = tombPath(v)
    if (!fs(spark).exists(p)) df
    else {
      val tombs = spark.read.parquet(p.toString)
      df.join(tombs, tombs.columns.toSeq, "left_anti")
    }
  }

  /** Commit `df` as the next full snapshot and atomically advance the
    * pointer. Returns the committed version.
    *
    * `partitionByCols` → hive-style directory partitioning (partition
    * pruning on equality/IN). `clusterBy` → range-repartition + sort
    * within files, so parquet row-group min/max stats become selective on
    * those columns (range-predicate skipping — the poor man's Z-order,
    * right for one dominant filter column at 100 TB). */
  def write(spark: SparkSession, df: DataFrame,
      partitionByCols: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      clusterPartitions: Int = 0): Int =
    writeIf(spark, df, None, partitionByCols, clusterBy, clusterPartitions)

  /** [[write]] with optimistic read-modify-write conflict detection: the
    * commit succeeds only if the table is still at `expected` when the
    * critical section runs. A merge job reads version N, computes the new
    * snapshot, and commits with `expected = Some(N)`; if another writer
    * advanced the table meanwhile, the staged data is discarded and a
    * [[java.util.ConcurrentModificationException]] surfaces so the caller
    * re-reads and retries — lost updates become impossible. `None` skips
    * the check (blind append semantics: writers serialize, all commit). */
  def writeIf(spark: SparkSession, df: DataFrame, expected: Option[Int],
      partitionByCols: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      clusterPartitions: Int = 0): Int = {
    val cols = clusterBy.map(org.apache.spark.sql.functions.col)
    val checked = enforceConstraints(spark, df)
    val prepared =
      if (clusterBy.isEmpty) checked
      else (if (clusterPartitions > 0) checked.repartitionByRange(clusterPartitions, cols: _*)
            else checked.repartitionByRange(cols: _*))
        .sortWithinPartitions(cols: _*)
    // Stage outside the lock — the expensive distributed write runs with NO
    // mutual exclusion (concurrent writers overlap here); only the
    // metadata-sized rename + pointer flip serializes.
    val f = fs(spark)
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID().toString.take(12)}")
    val writer = prepared.write.mode(SaveMode.Overwrite)
    // CHECK-constraint rejection (enforceConstraints fires mid-write) is a
    // routine expected path — never leave the staging dir behind for it
    try (if (partitionByCols.nonEmpty) writer.partitionBy(partitionByCols: _*) else writer)
      .parquet(staging.toString)
    catch { case t: Throwable => f.delete(staging, true); throw t }
    withCommitLock(f) { lockH =>
      val cur = currentVersion(spark).getOrElse(0)
      expected.foreach { e =>
        if (cur != e) {
          f.delete(staging, true)
          throw new java.util.ConcurrentModificationException(
            s"SnapshotTable $root: expected version $e but found $cur — " +
              "another writer committed first; re-read and retry the merge")
        }
      }
      val next = cur + 1
      // paused-holder guard BEFORE the first destructive step: a writer
      // whose lock was stolen mid-pause must not reclaim (and thereby
      // delete) the stealer's committed _v<next> dir
      lockH.check()
      claimVersionDir(f, next, staging)
      lockH.check() // and again right before the irreversible flip
      commitPointer(spark, next)
      next
    }
  }

  /** Rename `staging` to `_v<next>` inside the commit lock. An existing
    * `_v<next>` is an orphan from a writer that crashed before its pointer
    * flip (the pointer proves it was never committed) — reclaim it, along
    * with any txn markers that crashed writer staged for this version
    * (they must not spring to life when OUR flip advances the pointer). */
  private def claimVersionDir(f: org.apache.hadoop.fs.FileSystem, next: Int,
      staging: Path): Unit = {
    val target = new Path(s"$root/_v$next")
    if (f.exists(target)) f.delete(target, true)
    f.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_txn_") && n.endsWith(s"_v$next")) f.delete(st.getPath, false)
    }
    // same for the crashed writer's sidecars: a stale _files_v/_stats_v/
    // _bloom_v/_tomb_v for this version would silently attach to OUR commit
    Seq(filesPath(next), statsPath(next), bloomPath(next), tombPath(next))
      .foreach(p => if (f.exists(p)) f.delete(p, true))
    if (!f.rename(staging, target))
      throw new IllegalStateException(s"SnapshotTable $root: staging rename failed")
  }

  private def withCommitLock[T](f: org.apache.hadoop.fs.FileSystem)
      (body: CommitLock.Handle => T): T =
    CommitLock.withLockHandle(f, root, commitStaleMs)(body)

  private def commitPointer(spark: SparkSession, v: Int): Unit = {
    val f = fs(spark)
    val tmp = new Path(root, s"_current.tmp.$v")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(pointer)) f.delete(pointer, false)
    if (!f.rename(tmp, pointer)) {
      // A reader that observed the pointer missing during our delete→rename
      // window may have ADOPTED our tmp itself (currentVersion's crash-heal
      // path runs without the commit lock) — then our rename fails even
      // though the flip landed. If the pointer now reads v, the commit is
      // in effect: treat it as success instead of failing a landed commit.
      val healed = MetaIO.readSmall(f, pointer).map(_.trim.toInt).contains(v)
      if (!healed)
        throw new IllegalStateException(s"SnapshotTable $root: pointer flip failed")
      if (f.exists(tmp)) f.delete(tmp, false)
    }
  }

  /** Compact the live snapshot into `targetFiles` output files (small-file
    * remediation after many incremental commits) — a new version is
    * committed, so readers are never disturbed and time travel still sees
    * the pre-compaction layout. Rewrites the WHOLE table (and thereby
    * materializes pending tombstones); see [[optimizeCompact]] for the
    * incremental form whose IO is proportional to the small files only. */
  def compact(spark: SparkSession, targetFiles: Int = 1): Int =
    write(spark, read(spark).repartition(targetFiles))

  /** O(increment) append commit: write ONLY `df`'s rows and commit a new
    * version whose `_files_v<N>` manifest is the live file list plus the
    * increment — the 100 TB daily-ingest shape ([[write]]'s full-snapshot
    * rewrite is right for restatements, ruinous for a 10-row late batch).
    * Pending tombstones carry forward (copied, so the prior version's
    * time-travel read keeps its own); the stats manifest gains lines for
    * the new files only. Schema must match the live snapshot (enforced by
    * name: the increment is aligned to the live column order). */
  def append(spark: SparkSession, df: DataFrame): Int =
    appendTxn(spark, df, None)

  /** [[append]] with Delta `mergeSchema` semantics: the increment may ADD
    * columns (older files read them as null) and/or OMIT live columns
    * (the increment's files read them as null) — the manifest read
    * resolves every version to the union schema by name. Partition
    * columns must be present. The stats manifest is carried only when the
    * increment carries every stats column; otherwise the new version
    * drops it (pruned reads fall back to full scans — superset-safe —
    * until the next writeWithStats). */
  def appendEvolving(spark: SparkSession, df: DataFrame): Int =
    appendTxn(spark, df, None, mergeSchema = true)

  /** [[append]] with Delta-style transaction idempotence: `txn = (appId,
    * batchId)` records the high-water batch per application in the commit
    * critical section, and a batch at or below the recorded watermark is a
    * clean NO-OP. Streaming `foreachBatch` is at-least-once on retry;
    * routing its writes through here makes the table end-to-end
    * exactly-once (the streaming sink contract Delta implements with
    * `txnAppId`/`txnVersion`). An empty table bootstraps from the first
    * append. */
  def appendTxn(spark: SparkSession, df: DataFrame, txn: Option[(String, Long)],
      mergeSchema: Boolean = false): Int = {
    // A blind append NEVER logically conflicts (Delta's rule: concurrent
    // appends commute) — a version moving between our pre-lock read and
    // the in-lock re-check only invalidates the PHYSICAL staging (column
    // order / hive partitioning were derived from the old version), so the
    // correct response is re-stage + re-commit, not surfacing the spurious
    // conflict to the caller. Bounded jittered retries; read-modify-write
    // paths ([[writeIf]]) deliberately DON'T retry — their caller must
    // re-derive the payload from the new state. Cross-process contention
    // is pinned by CrossProcessContentionSpec (two JVMs racing appends).
    val MaxAttempts = 16
    var attempt = 1
    while (true) {
      try return appendTxnOnce(spark, df, txn, mergeSchema)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= MaxAttempts) throw e
          Thread.sleep(math.min(50L * attempt, 500L) +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(50))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def appendTxnOnce(
      spark: SparkSession, df: DataFrame, txn: Option[(String, Long)],
      mergeSchema: Boolean = false): Int = {
    val f = fs(spark)
    // fast-path skip outside the lock (authoritative re-check inside)
    if (txn.exists { case (app, batch) => lastTxn(spark, app).exists(_ >= batch) })
      return currentVersion(spark).getOrElse(0)
    val v0 = currentVersion(spark)
    val checked = enforceConstraints(spark, df)
    val aligned = v0 match {
      case Some(v) if !mergeSchema =>
        val liveCols = snapshotDF(spark, v).columns
        require(df.columns.toSet == liveCols.toSet,
          s"append schema mismatch: table has ${liveCols.mkString(",")}, " +
            s"increment has ${df.columns.mkString(",")} " +
            "(use appendEvolving for Delta-mergeSchema semantics)")
        checked.select(liveCols.map(org.apache.spark.sql.functions.col).toSeq: _*)
      case _ => checked // mergeSchema: files keep their own schema; the
                        // manifest read resolves to the union by name
    }
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID().toString.take(12)}")
    // keep the live table's hive partitioning on the increment, so the
    // appended files' partition values live in their paths exactly like
    // the base version's and manifest reads reattach them uniformly
    val partCols = v0.map(partitionColsOf(f, _)).getOrElse(Nil)
    require(partCols.forall(df.columns.contains),
      s"append increment must carry the table's partition columns ${partCols.mkString(",")}")
    val w = aligned.write.mode(SaveMode.Overwrite)
    try (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(staging.toString)
    catch { case t: Throwable => f.delete(staging, true); throw t }
    withCommitLock(f) { lockH =>
      val cur = currentVersion(spark).getOrElse(0)
      val skip = txn.exists { case (app, batch) => lastTxn(spark, app).exists(_ >= batch) }
      if (skip) { f.delete(staging, true); cur }
      else {
        if (cur != v0.getOrElse(0)) {
          f.delete(staging, true)
          throw new java.util.ConcurrentModificationException(
            s"SnapshotTable $root: append read version ${v0.getOrElse(0)} but found $cur — retry")
        }
        val next = cur + 1
        lockH.check() // paused-holder guard before the first destructive step
        claimVersionDir(f, next, staging)
        val prior = v0.map(v => listDataFiles(f, v).map(_._1)).getOrElse(Vector.empty)
        val added = listDataFiles(f, next).map(_._1)
        StatsManifest.writeLines(f, filesPath(next), (prior ++ added).map(canonical))
        v0.foreach { v =>
          StatsManifest.readLines(f, statsPath(v)).foreach { old =>
            // An evolving increment may lack a stats column; a file with
            // no manifest line would be SILENTLY EXCLUDED by pruned reads
            // (keepFiles semantics), so in that case the new version drops
            // its stats manifest — full scans until the next writeWithStats
            // (superset-safe, the readPruned fallback).
            val statsCols = StatsManifest.statsColumns(old)
            if (statsCols.forall(df.columns.contains)) {
              val newLines =
                if (added.isEmpty) Nil
                else StatsManifest.lines(readManifest(spark, added), statsCols)
              StatsManifest.writeLines(f, statsPath(next), old ++ newLines)
            }
          }
          if (f.exists(tombPath(v)))
            org.apache.hadoop.fs.FileUtil.copy(f, tombPath(v), f, tombPath(next),
              false, f.getConf)
        }
        // The txn watermark is part of the atomic commit: the marker names
        // the version it rides on and is written BEFORE the pointer flip,
        // and lastTxn only honors markers whose version is <= the committed
        // pointer. A crash after the marker but before the flip therefore
        // reads as "batch not committed" (the retry re-appends — correct),
        // and a crash after the flip reads as committed (the retry no-ops)
        // — no window where a committed batch is unrecorded.
        txn.foreach { case (app, batch) => recordTxn(f, app, batch, next) }
        lockH.check() // paused-holder guard: abort rather than double-flip
        commitPointer(spark, next)
        txn.foreach { case (app, _) => pruneTxnMarkers(f, app, next) }
        next
      }
    }
  }

  private def txnPrefix(appId: String) =
    "_txn_" + appId.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-' || c == '_') c else '_')

  /** All (version, batch) txn markers recorded for `appId` (committed or
    * not — the caller filters by the live pointer). */
  private def txnMarkers(f: org.apache.hadoop.fs.FileSystem,
      appId: String): Seq[(Int, Long)] = {
    val pre = txnPrefix(appId) + "_v"
    if (!f.exists(new Path(root))) return Nil
    f.listStatus(new Path(root)).toSeq.flatMap { st =>
      val n = st.getPath.getName
      val rest = if (n.startsWith(pre)) n.drop(pre.length) else ""
      if (rest.nonEmpty && rest.forall(_.isDigit)) {
        // a marker can vanish between list and open (another process's
        // pruneTxnMarkers) — a vanished marker is simply not a marker
        MetaIO.readSmall(f, st.getPath, attempts = 4)
          .map(b => rest.toInt -> b.trim.toLong).toSeq
      } else Nil
    }
  }

  /** The highest batch id COMMITTED for `appId`: markers are per-version
    * (`_txn_<app>_v<N>`) and only count once the pointer has reached their
    * version — a marker from a writer that crashed before its flip is
    * correctly invisible. */
  def lastTxn(spark: SparkSession, appId: String): Option[Long] = {
    val cur = currentVersion(spark).getOrElse(return None)
    val committed = txnMarkers(fs(spark), appId).collect { case (v, b) if v <= cur => b }
    if (committed.isEmpty) None else Some(committed.max)
  }

  private def recordTxn(f: org.apache.hadoop.fs.FileSystem, appId: String,
      batch: Long, version: Int): Unit = {
    val tmp = new Path(root, s"_txn.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(batch.toString.getBytes("UTF-8")) finally out.close()
    val p = new Path(root, s"${txnPrefix(appId)}_v$version")
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"SnapshotTable $root: txn record flip failed")
  }

  /** Keep only the newest committed marker per app (the skip check needs
    * just the high-water batch); runs after a successful flip, so a crash
    * here merely leaves harmless extra markers. */
  private def pruneTxnMarkers(f: org.apache.hadoop.fs.FileSystem, appId: String,
      keepV: Int): Unit =
    txnMarkers(f, appId).collect { case (v, _) if v < keepV => v }.foreach { v =>
      f.delete(new Path(root, s"${txnPrefix(appId)}_v$v"), false)
    }

  /** Delta `OPTIMIZE`-shape compaction: bin-pack only the files smaller
    * than `targetBytes` into ~`targetBytes` outputs and commit a new
    * version whose `_files_v<N>` manifest references the rewritten files
    * PLUS the untouched big ones in place — IO is O(small files), never
    * O(table), which is the difference between a nightly maintenance job
    * and an impossible one at 100 TB. The rewrite is a shuffle-free
    * `coalesce` (tasks merge input splits; nothing repartitions).
    * Pending tombstones carry forward unmaterialized (reads keep
    * anti-joining them — key-based, so doubly-applied is a no-op); the
    * stats manifest carries kept files' lines verbatim and rescans only
    * the rewritten output; a Bloom index is NOT carried (point reads fall
    * back to full scans — superset-safe — until `writeIndexed` runs
    * again, the same rebuild Delta needs after OPTIMIZE). Returns the new
    * version, or the current one when fewer than 2 files qualify.
    *
    * `clusterBy`: range-repartition the REWRITTEN subset on these columns
    * (a shuffle of the small files only — the big ones never move), so
    * packed files carry disjoint value ranges and the carried stats
    * manifest stays selective; default is a shuffle-free coalesce. */
  /** Z-ORDER rewrite (`OPTIMIZE … ZORDER BY`): recommit the VISIBLE table
    * range-partitioned and sorted by the interleaved z-value of
    * `zorderBy`, sized to `targetBytes` per file, then refresh the stats
    * manifest over (prior stats ∪ zorder) columns — after which range
    * reads prune on EVERY clustering dimension (each file covers a
    * hyper-rectangle, not a leading-column slab; see [[Zorder]]). A full
    * rewrite commit like compaction — time travel keeps the old layout;
    * SCD tombstone state rows ride along untouched (the rewrite reorders
    * rows, it must not change visibility). */
  def zorderRewrite(spark: SparkSession, zorderBy: Seq[String],
      targetBytes: Long = 128L << 20, bits: Int = 8): Int = {
    val f = fs(spark)
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    val bytes = listDataFiles(f, v).map(_._2).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = read(spark)
    // expected-version commit: a writer landing between the read and the
    // rewrite must surface as ConcurrentModificationException (same
    // contract as optimizeCompact) — an unguarded write would silently
    // revert that writer's rows to version v's content
    val next = writeIf(spark, Zorder.shape(df, zorderBy, nOut, bits), Some(v))
    refreshStats(spark,
      (statsColumns(spark).getOrElse(Nil) ++ zorderBy).distinct)
    next
  }

  def optimizeCompact(spark: SparkSession, targetBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): Int = {
    val f = fs(spark)
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    val files = listDataFiles(f, v)
    val (small, kept) = files.partition(_._2 < targetBytes)
    if (small.size < 2) return v
    val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID().toString.take(12)}")
    // partition-aware read: hive partition values of the small files ride
    // along as ordinary columns and are MATERIALIZED into the packed
    // output (flat files), so no value is lost when their dirs vacuum away
    val smallDf = readManifest(spark, small.map(_._1).map(canonical))
    val packed =
      if (clusterBy.isEmpty) smallDf.coalesce(nOut)
      else {
        val cols = clusterBy.map(org.apache.spark.sql.functions.col)
        smallDf.repartitionByRange(nOut, cols: _*).sortWithinPartitions(cols: _*)
      }
    try packed.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    catch { case t: Throwable => f.delete(staging, true); throw t }
    withCommitLock(f) { lockH =>
      val cur = currentVersion(spark).getOrElse(0)
      if (cur != v) {
        f.delete(staging, true)
        throw new java.util.ConcurrentModificationException(
          s"SnapshotTable $root: compaction read version $v but found $cur — retry")
      }
      val next = v + 1
      lockH.check() // paused-holder guard before the first destructive step
      claimVersionDir(f, next, staging)
      val rewritten = listDataFiles(f, next).map(_._1)
      StatsManifest.writeLines(f, filesPath(next),
        (kept.map(_._1) ++ rewritten).map(canonical))
      // carry stats: kept files keep their manifest lines; only the
      // rewritten output is rescanned (O(small files), like the write)
      StatsManifest.readLines(f, statsPath(v)).foreach { old =>
        val keptSet = kept.map(x => canonical(x._1)).toSet
        val keptLines = old.filter(l => keptSet(canonical(l.split("\t")(0))))
        val newLines =
          if (rewritten.isEmpty) Nil
          else StatsManifest.lines(spark.read.parquet(rewritten: _*),
            StatsManifest.statsColumns(old))
        StatsManifest.writeLines(f, statsPath(next), keptLines ++ newLines)
      }
      if (f.exists(tombPath(v))) // COPY, not move: version v's time-travel
        // read still needs its own tombstones (O(deleted keys) bytes)
        org.apache.hadoop.fs.FileUtil.copy(f, tombPath(v), f, tombPath(next),
          false, f.getConf)
      lockH.check() // paused-holder guard: abort rather than double-flip
      commitPointer(spark, next)
      next
    }
  }

  /** One canonical spelling for a file URI: `input_file_name()` yields
    * `file:///x` while Hadoop listings yield `file:/x` (null vs empty
    * authority — Path does NOT unify them), so manifest comparisons and
    * stored lists rebuild scheme://authority/path explicitly. */
  private def canonical(uri: String): String = {
    val u = new Path(uri).toUri
    val scheme = Option(u.getScheme).map(_ + "://").getOrElse("")
    val auth = Option(u.getAuthority).getOrElse("")
    s"$scheme$auth${u.getPath}"
  }

  // ── File-level min/max stats + data skipping (Delta-style) ─────────────
  //
  // Parquet row-group stats already skip *within* a file, but a 100 TB
  // table's planner cost is dominated by *which files to list/schedule* —
  // Delta/Iceberg solve that with per-file column stats in the commit
  // metadata. Same here: `writeWithStats` records per-file min/max for the
  // requested columns in `_stats_v<N>` (one extra scan of the immutable
  // just-written snapshot, once per commit); `readPruned` turns a range
  // predicate into a file list BEFORE Spark ever lists the directory, so
  // the scan's task count is proportional to matching files, not table
  // size. Values are stored as doubles (timestamps as epoch micros) —
  // numeric/timestamp stats columns only, which is what range predicates
  // at scale filter on. Pair with `clusterBy` on the same column so file
  // ranges are disjoint and pruning is maximally selective.

  // ── CHECK constraints (ALTER TABLE … ADD CONSTRAINT analog) ───────────
  // Stored as "name\tpredicate" lines in _constraints; enforced INLINE in
  // every write path via assert_true inside a filter (one pass, fused into
  // the staging write's plan — no second scan of the batch, and a filter
  // condition cannot be pruned away like a dropped projection could).

  private def constraintsFile = new Path(root, "_constraints")

  /** Active constraints, name → SQL predicate. */
  def constraints(spark: SparkSession): Map[String, String] = {
    val f = fs(spark)
    if (!f.exists(constraintsFile)) Map.empty
    else {
      val in = f.open(constraintsFile)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(n, p) = l.split("\t", 2); n -> p
      }.toMap
    }
  }

  private def writeConstraints(f: org.apache.hadoop.fs.FileSystem,
      cs: Map[String, String]): Unit = {
    val tmp = new Path(root, "_constraints.tmp")
    val out = f.create(tmp, true)
    try out.write(cs.toSeq.sortBy(_._1)
      .map { case (n, p) => s"$n\t$p" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(constraintsFile)) f.delete(constraintsFile, false)
    if (!f.rename(tmp, constraintsFile))
      throw new IllegalStateException(s"SnapshotTable $root: constraints write failed")
  }

  /** Add a CHECK constraint. Delta semantics: the EXISTING snapshot is
    * validated first (one distributed count of violations — rejecting the
    * constraint, not the data, if any row already breaks it), then the
    * constraint persists and every subsequent write/append/merge batch is
    * checked inline. DDL serializes under the commit lock. */
  def addConstraint(spark: SparkSession, name: String, predicate: String): Unit = {
    require(!name.contains("\t") && !name.contains("\n") &&
      !predicate.contains("\t") && !predicate.contains("\n"),
      "constraint name/predicate must not contain tabs or newlines")
    val f = fs(spark)
    withCommitLock(f) { _ =>
      readOption(spark).foreach { df =>
        val bad = df.filter(!org.apache.spark.sql.functions.expr(predicate)).count()
        if (bad > 0) throw new IllegalArgumentException(
          s"CONSTRAINT_VIOLATION: cannot add CHECK $name ($predicate) — " +
            s"$bad existing row(s) violate it")
      }
      writeConstraints(f, constraints(spark) + (name -> predicate))
    }
  }

  /** Drop a CHECK constraint (no-op if absent). */
  def dropConstraint(spark: SparkSession, name: String): Unit = {
    val f = fs(spark)
    withCommitLock(f) { _ =>
      writeConstraints(f, constraints(spark) - name)
    }
  }

  /** Wrap `df` so scanning it raises CONSTRAINT_VIOLATION on the first
    * row breaking any active CHECK — fused into the write that consumes
    * it. NULL predicate results count as violations (CHECK must prove the
    * row, unknown does not pass — Delta's rule for NOT NULL via CHECK). */
  private def enforceConstraints(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{assert_true, coalesce, expr, lit}
    constraints(spark).foldLeft(df) { case (d, (name, pred)) =>
      d.filter(assert_true(coalesce(expr(pred), lit(false)),
        lit(s"CONSTRAINT_VIOLATION: CHECK $name ($pred) failed")).isNull)
    }
  }

  private def statsPath(v: Int) = new Path(root, s"_stats_v$v")

  /** [[write]] + per-file min/max stats manifest over `statsCols` (format
    * and string-truncation rules in [[StatsManifest]]). */
  def writeWithStats(spark: SparkSession, df: DataFrame, statsCols: Seq[String],
      clusterBy: Seq[String] = Nil, clusterPartitions: Int = 0): Int = {
    val v = write(spark, df, Nil, clusterBy, clusterPartitions)
    StatsManifest.write(spark.read.parquet(s"$root/_v$v"), statsCols, fs(spark), statsPath(v))
    v
  }

  private def readFiles(spark: SparkSession,
      prune: Vector[String] => Vector[String]): DataFrame = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    StatsManifest.readLines(fs(spark), statsPath(v)).map(prune) match {
      case None => read(spark) // no manifest -> full scan
      case Some(files) if files.isEmpty =>
        read(spark).limit(0) // schema-preserving empty relation
      case Some(files) =>
        // per-dir basePath grouping (readManifest) keeps any hive
        // partition values even though surviving files span several _v dirs
        applyTombstones(spark, v, readManifest(spark, files))
    }
  }

  /** Range-pruned read: only files whose recorded [min,max] for `column`
    * intersects [lo,hi] are handed to the scan (timestamp columns: pass
    * epoch-micros bounds; date columns epoch days). Falls back to a full
    * read when the live version has no stats manifest. The caller still
    * applies the row-level filter -- stats pruning is a superset
    * guarantee, exactly like partition pruning. */
  def readPruned(spark: SparkSession, column: String, lo: Double, hi: Double): DataFrame =
    readFiles(spark, StatsManifest.filesInRange(_, column, lo, hi))

  /** String-range-pruned read over a string stats column ([lo,hi]
    * inclusive). Truncated maxes prune against their prefix-successor, so
    * pruning stays a superset guarantee. */
  def readPrunedString(spark: SparkSession, column: String, lo: String, hi: String): DataFrame =
    readFiles(spark, StatsManifest.filesInStringRange(_, column, lo, hi))

  /** Point-lookup convenience: [[readPrunedString]] with lo = hi. */
  def readPrunedEq(spark: SparkSession, column: String, value: String): DataFrame =
    readPrunedString(spark, column, value, value)

  // ── Per-file Bloom filter index (point lookups off the clustering order) ─
  //
  // Min/max stats only skip when the layout is clustered on the probed
  // column — and a table has ONE clustering order. For every OTHER
  // high-cardinality column a point lookup still touches all files. The
  // Delta answer is a bloom filter index; same here: `writeIndexed` builds
  // a per-file Bloom filter sidecar (`_bloom_v<N>`, built distributed, only
  // the serialized filters reach the driver), and the bloom-pruned reads
  // schedule O(1 + fpp·files) scan tasks for an equality probe no matter
  // how the table is laid out. Pruning is a superset guarantee (Bloom: no
  // false negatives); the caller still applies the row filter.

  private def bloomPath(v: Int) = new Path(root, s"_bloom_v$v")

  /** [[write]] + min/max stats manifest over `statsCols` + per-file Bloom
    * filter sidecar over `bloomCols`. Cluster by the range-probed column;
    * bloom-index the point-probed ones. */
  def writeIndexed(spark: SparkSession, df: DataFrame,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      bloomFpp: Double = 0.03,
      clusterBy: Seq[String] = Nil, clusterPartitions: Int = 0,
      partitionByCols: Seq[String] = Nil): Int = {
    val v = write(spark, df, partitionByCols, clusterBy, clusterPartitions)
    val snap = spark.read.parquet(s"$root/_v$v")
    if (statsCols.nonEmpty)
      StatsManifest.write(snap, statsCols, fs(spark), statsPath(v))
    if (bloomCols.nonEmpty)
      BloomIndex.write(snap, bloomCols, bloomFpp, fs(spark), bloomPath(v))
    v
  }

  private def readBloomFiles(spark: SparkSession,
      prune: (org.apache.hadoop.fs.FileSystem, Path) => Option[Vector[String]]): DataFrame = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    prune(fs(spark), bloomPath(v)) match {
      case None => read(spark)
      case Some(files) if files.isEmpty => read(spark).limit(0)
      case Some(files) =>
        applyTombstones(spark, v,
          spark.read.option("basePath", s"$root/_v$v").parquet(files: _*))
    }
  }

  /** Bloom-pruned point lookup on an integral column: only files whose
    * filter might contain `value` are scanned. Superset guarantee — apply
    * the row filter after. */
  def readPrunedBloomLong(spark: SparkSession, column: String, value: Long): DataFrame =
    readBloomFiles(spark, BloomIndex.filesMightContainLong(_, _, column, value))

  /** Bloom-pruned point lookup on a string column. */
  def readPrunedBloomString(spark: SparkSession, column: String, value: String): DataFrame =
    readBloomFiles(spark, BloomIndex.filesMightContainString(_, _, column, value))

  /** Pruning-aware read — the general SNAPSHOT relation on the plain
    * format: file listing goes through [[PruningFileIndex]], so any
    * predicate Catalyst pushes into the scan prunes the version's file
    * list through the `_stats_v` range manifest AND the `_bloom_v`
    * point-lookup sidecar at planning time (no dedicated `readPruned*`
    * call). Tombstones anti-join on top as in [[read]] — sound, the
    * tombstone side is its own relation. Hive-partitioned versions (r11)
    * route through the partition-aware index — partition-value rows are
    * reattached from the `k=v` directory segments, so Catalyst's partition
    * pruning composes with the sidecar skipping; a version MIXING
    * partitioned and flat files (an un-partitioned manifest increment)
    * unions the flat increment as its own pruning relation (the partition
    * values live in its file bytes); only a cross-dir type conflict or a
    * flat increment lacking a partition column falls back to the ordinary
    * read. `version` = time travel. */
  def readIndexed(spark: SparkSession, version: Option[Int] = None): DataFrame = {
    val f = fs(spark)
    val v = version.getOrElse(currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version")))
    def fallback = version.map(readVersion(spark, _)).getOrElse(read(spark))
    val gone = f.exists(new Path(root, s"_gone_v$v"))
    if (gone || (!f.exists(new Path(s"$root/_v$v")) && !f.exists(filesPath(v))))
      throw new IllegalArgumentException(
        s"SnapshotTable $root: version $v does not exist (vacuumed or never committed)")
    val partCols = partitionColsOf(f, v)
    if (partCols.nonEmpty)
      return readIndexedPartitioned(spark, f, v, partCols).getOrElse(fallback)
    val files = listDataFiles(f, v)
    if (files.isEmpty) return fallback
    val uris = files.map(_._1)
    // build the statuses from the (uri, len) listing — listDataFiles
    // already paid one metadata call per file; a second getFileStatus
    // round per file would double the planning RPCs on an object store
    // (mtime/block metadata are unused by the parquet split planner)
    val statuses = files.map { case (u, len) =>
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L << 20, 0L, new Path(u))
    }
    // one representative per version dir (files of one write job share a
    // schema); bail to the union-cast read on a type conflict
    val reps = uris.groupBy(versionDirOf).toSeq.sortBy(_._1).map(_._2.head)
    PruningFileIndex.unionSchema(spark, reps) match {
      case None => fallback
      case Some(schema) =>
        val base = PruningFileIndex.relation(spark, statuses, schema, keepFor(f, v))
        applyTombstones(spark, v, base)
    }
  }

  /** Partition-aware pruning relation over a hive-partitioned version:
    * one [[PruningFileIndex]] group per distinct partition-value tuple
    * (typed via the same int/long/double/date/string inference the per-dir
    * basePath read runs), so `WHERE p = …` prunes directories at planning
    * time AND the stats/Bloom keep still skips files inside surviving
    * partitions. A version MIXING partitioned old files with FLAT manifest
    * increments (r11) no longer falls back: the flat files carry the
    * partition columns IN their bytes, so they become their own pruning
    * relation unioned under the partition-grouped one — Catalyst pushes
    * the same predicates into both children (directory pruning on the
    * hive side, parquet/stats skipping on the flat side), and the flat
    * files' DECLARED types become the partition-column types (no
    * inference drift between the two legs). None (→ caller falls back)
    * when a hive data file physically carries a partition column, on a
    * cross-dir type conflict, when a flat increment LACKS a partition
    * column, or when a directory value does not parse as the flat side's
    * declared type. */
  private def readIndexedPartitioned(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem, v: Int,
      partCols: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.types.{DataType, DateType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
    // the listing's OWN FileStatus objects — escaped partition values
    // ("cat 0" → "cat%200") do not survive a Path→string→Path round trip
    val files = listDataFileStatuses(f, v)
    if (files.isEmpty) return None
    val parsed: Vector[(org.apache.hadoop.fs.FileStatus, Option[Seq[String]])] =
      files.map { st =>
        val segs = st.getPath.toUri.getPath.split('/')
        val vIdx = segs.lastIndexWhere(_.matches("_v\\d+"))
        val kvs = segs.slice(vIdx + 1, segs.length - 1).filter(_.contains('='))
          .map { s =>
            val i = s.indexOf('=')
            s.take(i) -> PruningFileIndex.unescapePathName(s.drop(i + 1))
          }.toMap
        st -> (if (partCols.forall(kvs.contains)) Some(partCols.map(kvs)) else None)
      }
    val rows = parsed.collect { case (st, Some(vals)) => (st, vals) }
    val flat = parsed.collect { case (st, None) => st }
    if (rows.isEmpty) return None
    val flatSchema: Option[StructType] =
      if (flat.isEmpty) None
      else {
        val frs = flat.map(_.getPath).groupBy(p => versionDirOf(p.toUri.getPath))
          .toSeq.sortBy(_._1).map(_._2.head.toString)
        PruningFileIndex.unionSchema(spark, frs) match {
          case Some(s) if partCols.forall(s.fieldNames.contains) => Some(s)
          case _ => return None
        }
      }
    val supported = Set[DataType](IntegerType, LongType, DoubleType, DateType, StringType)
    val types: Seq[DataType] = flatSchema match {
      case Some(s) =>
        val ts = partCols.map(c => s(c).dataType)
        if (!ts.forall(supported)) return None
        ts
      case None => partCols.indices.map(i =>
        PruningFileIndex.inferPartitionType(rows.map(_._2(i))))
    }
    val partSchema = StructType(partCols.zip(types).map { case (c, t) =>
      StructField(c, t, nullable = true)
    })
    val groups =
      try rows.groupBy(_._2).toSeq.sortBy(_._1.mkString("/")).map {
        case (vals, fsOfPart) =>
          val row = org.apache.spark.sql.catalyst.InternalRow.fromSeq(
            vals.zip(types).map { case (raw, t) =>
              PruningFileIndex.internalPartitionValue(raw, t)
            })
          row -> fsOfPart.map(_._1)
      } catch { case _: IllegalArgumentException | _: java.time.format.DateTimeParseException =>
        return None // a directory value does not parse as the flat type
      }
    val reps = rows.map(_._1.getPath).groupBy(p => versionDirOf(p.toUri.getPath))
      .toSeq.sortBy(_._1).map(_._2.head.toString)
    PruningFileIndex.unionSchema(spark, reps) match {
      case Some(dataSchema) if !dataSchema.fieldNames.exists(partCols.contains) =>
        val hiveDf = PruningFileIndex.partitionedRelation(
          spark, groups, partSchema, dataSchema, keepFor(f, v))
        val combined = flatSchema match {
          case None => hiveDf
          case Some(fsch) =>
            // the two legs must agree exactly: flat = hive data columns
            // plus the partition columns, same types by name
            val aligned =
              fsch.fieldNames.toSet == (dataSchema.fieldNames.toSet ++ partCols) &&
                dataSchema.fields.forall(d =>
                  fsch.fields.find(_.name == d.name).exists(_.dataType == d.dataType))
            if (!aligned) return None
            hiveDf.unionByName(
              PruningFileIndex.relation(spark, flat, fsch, keepFor(f, v)))
        }
        Some(applyTombstones(spark, v, combined))
      case _ => None
    }
  }

  /** The [[PruningFileIndex]] keep-callback over version `v`'s stats
    * manifest + Bloom sidecar (both whole-version on this format). */
  private def keepFor(f: org.apache.hadoop.fs.FileSystem, v: Int)
      (preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : String => Boolean = {
    val (nB, sB, pS) = BucketedSnapshotTable.extractBounds(
      preds.reduce(org.apache.spark.sql.catalyst.expressions.And))
    if (nB.isEmpty && sB.isEmpty && pS.isEmpty) (_: String) => true
    else PruningFileIndex.dirKeep(f,
      StatsManifest.readLines(f, statsPath(v)), bloomPath(v), nB, sB, pS)
      .getOrElse((_: String) => true)
  }

  /** Metadata-only: of the live version's data files, how many survive
    * read-side skipping under `pred` — (kept, total), the gate-query pin.
    * On a hive-partitioned version, conjuncts referencing ONLY partition
    * columns prune whole directories first (the same verdict the
    * partition-aware file index reaches at planning time), then the
    * stats/Bloom keep runs on the survivors. */
  def pruneStats(spark: SparkSession, pred: org.apache.spark.sql.Column): (Int, Int) = {
    val f = fs(spark)
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    // status-based listing: its decoded paths are what [[partitionKeep]]
    // keys by (escaped partition values break the uri-string round trip)
    val all = listDataFileStatuses(f, v).map(_.getPath.toUri.getPath)
    val expr = org.apache.spark.sql.GraftColumnBridge.catalystExpression(pred)
    val k = keepFor(f, v)(Seq(expr))
    val pk = partitionKeep(spark, f, v, expr)
    (all.count(p => pk(p) && k(p)), all.size)
  }

  /** Partition-directory verdict for [[pruneStats]]: evaluates the
    * partition-only conjuncts of `expr` against each file's `k=v` path
    * values (typed exactly as [[readIndexedPartitioned]] types them).
    * Keep-all whenever the version is flat, any file lacks the segments,
    * no conjunct is partition-only, or evaluation fails — superset
    * guarantee, same contract as the sidecar keep. */
  private def partitionKeep(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
      v: Int, expr: org.apache.spark.sql.catalyst.expressions.Expression)
      : String => Boolean = {
    val keepAll = (_: String) => true
    val partCols = partitionColsOf(f, v)
    if (partCols.isEmpty) return keepAll
    def refs(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] =
      e.collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.name
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
      }
    // both conjunction encodings reach here: SQL text parses to a catalyst
    // And, the Column DSL to UnresolvedFunction("and", …)
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.last.equalsIgnoreCase("and") && f.arguments.size == 2 =>
        conjuncts(f.arguments(0)) ++ conjuncts(f.arguments(1))
      case other => Seq(other)
    }
    val partOnly = conjuncts(expr).filter { c =>
      val r = refs(c); r.nonEmpty && r.forall(partCols.contains)
    }
    if (partOnly.isEmpty) return keepAll
    scala.util.Try {
      val parsed = listDataFileStatuses(f, v).map { st =>
        val norm = st.getPath.toUri.getPath
        val segs = norm.split('/')
        val vIdx = segs.lastIndexWhere(_.matches("_v\\d+"))
        val kvs = segs.slice(vIdx + 1, segs.length - 1).filter(_.contains('='))
          .map { s =>
            val i = s.indexOf('=')
            s.take(i) -> PruningFileIndex.unescapePathName(s.drop(i + 1))
          }.toMap
        norm -> partCols.map(kvs.get)
      }
      // per-file verdicts: hive-pathed files evaluate their tuple; flat
      // increment files keep (their pruning rides the stats/Bloom keep,
      // mirroring the mixed-version union read)
      if (parsed.forall(_._2.exists(_.isEmpty))) keepAll
      else {
        val tuples = parsed.filter(_._2.forall(_.isDefined))
          .map(_._2.map(_.get)).distinct
        val types = partCols.indices.map(i =>
          PruningFileIndex.inferPartitionType(tuples.map(_(i))))
        // a tiny driver-built relation (one row per distinct tuple) lets
        // the session's own analyzer+evaluator decide each verdict — no
        // hand-rolled expression interpreter to drift from SQL semantics
        import org.apache.spark.sql.types.{StructField, StructType, StringType}
        val schema = StructType(StructField("__pk_tuple", StringType, nullable = false) +:
          partCols.zip(types).map { case (c, t) => StructField(c, t, nullable = true) })
        val rows = tuples.map { vals =>
          org.apache.spark.sql.Row.fromSeq(vals.mkString("") +: vals.zip(types).map {
            case (raw, t) => externalPartitionValue(raw, t)
          })
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
        val keptTuples = df.filter(org.apache.spark.sql.GraftColumnBridge.column(
            partOnly.reduce(org.apache.spark.sql.catalyst.expressions.And)))
          .select("__pk_tuple").collect().map(_.getString(0)).toSet
        val byFile = parsed.toMap
        (p: String) => byFile.get(p) match {
          case Some(vals) if vals.forall(_.isDefined) =>
            keptTuples(vals.map(_.get).mkString(""))
          case _ => true
        }
      }
    }.recover { case e =>
      // superset fallback -- but say so: a silent keep-all here would read
      // as "nothing to prune" when the analysis itself failed
      org.slf4j.LoggerFactory.getLogger(classOf[SnapshotTable])
        .warn(s"partitionKeep: falling back to keep-all: $e")
      keepAll
    }.get
  }

  /** A raw `k=v` value as the EXTERNAL (Row-level) representation of
    * `dt` — the driver-built relation's input type. */
  private def externalPartitionValue(raw: String,
      dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case DoubleType  => raw.toDouble
      case DateType    => java.sql.Date.valueOf(raw)
      case _           => raw
    }
  }

  /** Change data feed between two committed versions (Delta CDF analog,
    * computed on demand from the immutable snapshots rather than logged at
    * write time): one row per changed key with `_change_type` ∈
    * {insert, delete, update} — update rows carry the NEW values, delete
    * rows the old ones. Keyed full-outer join, so the shuffle is on the
    * business key both snapshots are already clustered by in the common
    * case. `null_safe` key equality is not needed: keys are business keys
    * and assumed non-null (same contract as the SCD merges). */
  def changes(spark: SparkSession, keys: Seq[String], fromV: Int, toV: Int): DataFrame =
    changes(spark, keys, fromV, toV, withChangedColumns = false)

  /** [[changes]] with COLUMN-LEVEL attribution: update rows additionally
    * carry `_changed_columns` — the sorted comma-joined names of data
    * columns whose values differ (null-safely) between the versions; ""
    * for inserts/deletes (every column changed by definition). The "which
    * field moved" answer a CDC consumer needs for partial downstream
    * refresh, at zero extra shuffle (computed inside the same full-outer
    * join row). */
  def changes(spark: SparkSession, keys: Seq[String], fromV: Int, toV: Int,
      withChangedColumns: Boolean): DataFrame =
    changes(spark, keys, fromV, toV, withChangedColumns, withPreimage = false)

  /** [[changes]] with the Delta CDF row shape: `withPreimage` splits each
    * update into `update_preimage` (old values) + `update_postimage` (new)
    * — what a retracting consumer (incremental materialized aggregate)
    * needs. Same pruned diff underneath. */
  def changes(spark: SparkSession, keys: Seq[String], fromV: Int, toV: Int,
      withChangedColumns: Boolean, withPreimage: Boolean): DataFrame = {
    // Schema evolution across versions: both sides align to the union
    // schema inside [[ChangeFeed.diff]] — a column added in `toV`
    // reports prior rows as updates (absent → value) and deletes carry
    // null for it, the accurate derived-CDF reading of an ADD COLUMN.
    val (a, b) = diffInputs(spark, fromV, toV)
    ChangeFeed.diff(a, b, keys, withChangedColumns, withPreimage)
  }

  /** Diff inputs for [[changes]]/[[consumeChangesVersioned]], FILE-LEVEL
    * pruned when possible: a data file listed by BOTH versions is the same
    * immutable bytes, so its rows cannot differ between them — the keyed
    * diff only needs the rows of files unique to each side. Exact, not
    * approximate: [[ChangeFeed.diff]] emits only changed keys, and under
    * the unique-key contract a key's row lives in exactly one file, so a
    * key whose file is shared contributes no feed row either way. On an
    * append-mostly dim (`_files_v<N>` manifests reference prior files), a
    * mirror window's diff cost is O(appended files), not O(dim) — the
    * plain-format analog of the bucketed manifest pruning. A window whose
    * tombstone set GREW (a delete landed) adds exactly the newly-hidden
    * rows via one broadcast semi-join over the shared files (the
    * tombstone-delta path — the keyed diff stays O(changed)); only a
    * SHRUNK/replaced tombstone set (deletes materialized by maintenance)
    * or a no-shared-files window falls back to the full two-snapshot
    * diff. */
  private def diffInputs(spark: SparkSession, fromV: Int,
      toV: Int): (DataFrame, DataFrame) = {
    val f = fs(spark)
    def full = {
      SnapshotTable.lastDiffMode.set("full")
      (readVersion(spark, fromV), readVersion(spark, toV))
    }
    // tombstones flip row visibility without touching file bytes — BUT
    // [[append]] carries the prior version's tombstone batch forward by
    // file copy and a new deleteKeys only ADDS fresh part files, so the
    // from-side's tombstone files are normally a SUBSET of the to-side's
    // (name+length). Identical sets → the plain pruned diff; a GROWN set →
    // the tombstone-delta diff below (the only changes shared files can
    // contribute are rows the window's NEW tombstones hid); anything else
    // (a compaction materialized deletes and dropped the dir) → full diff.
    def tombSig(v: Int): Set[(String, Long)] =
      if (!f.exists(tombPath(v))) Set.empty
      else f.listStatus(tombPath(v)).filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => (st.getPath.getName, st.getLen)).toSet
    val tFrom = tombSig(fromV)
    val tTo = tombSig(toV)
    if (!tFrom.subsetOf(tTo)) return full
    // cheap existence guards first — a vacuumed or never-committed version
    // must surface readVersion's named error, not a raw listing failure
    def missing(v: Int) = f.exists(new Path(root, s"_gone_v$v")) ||
      (!f.exists(new Path(s"$root/_v$v")) && !f.exists(filesPath(v)))
    if (missing(fromV) || missing(toV)) return full
    val oldFiles = listDataFiles(f, fromV).map(_._1)
    val newFiles = listDataFiles(f, toV).map(_._1)
    val shared = oldFiles.toSet intersect newFiles.toSet
    if (shared.isEmpty) return full
    def side(uris: Vector[String], v: Int): DataFrame = {
      val base =
        if (uris.isEmpty)
          // schema-correct TRULY empty relation (not a limit(0) over the
          // snapshot scan, which would still schedule the shared files)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            snapshotDF(spark, v).schema)
        else readManifest(spark, uris)
      applyTombstones(spark, v, base)
    }
    val fromSide = side(oldFiles.filterNot(shared.contains).toVector, fromV)
    val toSide = side(newFiles.filterNot(shared.contains).toVector, toV)
    val newTombs0 = (tTo -- tFrom).toSeq
    // the delta path BROADCASTS the new tombstone batch — a mass delete
    // (file-size metadata says so, no scan) takes the full diff instead
    if (newTombs0.map(_._2).sum > (64L << 20)) return full
    val newTombFiles = newTombs0.map(_._1).sorted
    if (newTombFiles.isEmpty) {
      SnapshotTable.lastDiffMode.set("pruned")
      (fromSide, toSide)
    } else {
      // TOMBSTONE-DELTA (r10): a shared file's rows are identical bytes on
      // both sides, so the ONLY feed rows it can contribute are the keys
      // the window's new tombstones hid — visible at fromV, gone at toV.
      // Surface exactly those (with their true old values) by one
      // broadcast SEMI-JOIN pass over the shared files against the tiny
      // new-tombstone batch: no shuffle of the dim, and the keyed diff
      // downstream stays O(changed) instead of O(two snapshots) — the
      // pre-r10 cost of any delete-carrying mirror window.
      SnapshotTable.lastDiffMode.set("tombstone-delta")
      val newTombs = spark.read
        .parquet(newTombFiles.map(n => s"${tombPath(toV)}/$n"): _*)
        .dropDuplicates()
      val sharedRel = readManifest(spark, shared.toVector.sorted)
      val hidden = applyTombstones(spark, fromV, sharedRel)
        .join(org.apache.spark.sql.functions.broadcast(newTombs),
          newTombs.columns.toSeq, "left_semi")
      (fromSide.unionByName(hidden, allowMissingColumns = true), toSide)
    }
  }

  /** Incremental CDF consumption for PLAIN roots — parity with
    * [[BucketedSnapshotTable.consumeChangesVersioned]]: one diff covering
    * everything committed since the consumer's checkpoint (over VISIBLE
    * rows — SCD tombstone state filtered, same contract as the bucketed
    * feed), checkpoint advanced only after `fn` returns. Windows between
    * versions that SHARE data files (append-mostly dims, whose
    * `_files_v<N>` manifests reference prior files) diff only the
    * files unique to each side — O(appended data) per window
    * ([[diffInputs]]); full-rewrite or tombstone-carrying windows fall
    * back to the honest two-full-snapshot diff. First call = full
    * bootstrap (every visible row as `insert`). */
  def consumeChangesVersioned(spark: SparkSession, keys: Seq[String],
      checkpointFile: String, withChangedColumns: Boolean = false)
      (fn: (DataFrame, Int, Int) => Unit): Int = {
    import org.apache.spark.sql.functions.lit
    val f = fs(spark)
    val ckPath = new Path(checkpointFile)
    val live = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root is empty"))
    val last = MetaIO.readSmall(f, ckPath).map(_.trim.toInt).getOrElse(0)
    if (live > last) {
      val feed =
        if (last == 0) {
          val base = graft.cdc.ScdMerge.scd1Current(read(spark))
            .withColumn("_change_type", lit("insert"))
          if (withChangedColumns) base.withColumn("_changed_columns", lit(""))
          else base
        } else {
          // file-level pruned on append-mostly dims (see [[diffInputs]]):
          // scd1Current is a row-local visibility filter, so applying it
          // to the pruned sides is exact — shared files' rows carry
          // identical __DELETED flags in both versions
          val (a, b) = diffInputs(spark, last, live)
          ChangeFeed.diff(
            graft.cdc.ScdMerge.scd1Current(a),
            graft.cdc.ScdMerge.scd1Current(b),
            keys, withChangedColumns)
        }
      fn(feed, last, live)
      val out = f.create(ckPath, true)
      try out.write(live.toString.getBytes("UTF-8")) finally out.close()
    }
    math.max(live, last)
  }

  /** EXACTLY-ONCE mirror of a plain root into a bucketed serving copy —
    * the [[BucketedSnapshotTable.applyChangesTo]] loop with a plain
    * SOURCE (reference dims live in plain snapshots; their mirrors want
    * the keyed format). Same guarantees, same machinery: the target's txn
    * ledger is the committed progress marker and heals the checkpoint
    * across crash windows; deletes flow as tombstones; `__cdf_seq` = the
    * source version orders windows. Returns the checkpointed version. */
  def applyChangesTo(spark: SparkSession, keys: Seq[String],
      checkpointFile: String, target: graft.tables.BucketedSnapshotTable,
      consumerId: String): Int = {
    BucketedSnapshotTable.healCheckpoint(fs(spark), checkpointFile,
      target, consumerId)
    consumeChangesVersioned(spark, keys, checkpointFile) { (feed, _, toV) =>
      BucketedSnapshotTable.applyFeed(spark, target, feed, toV, consumerId)
    }
  }

  /** RESTORE (Delta `RESTORE TABLE ... TO VERSION` analog): commit a NEW
    * version whose content is an older version's — history moves forward,
    * so the botched intermediate versions stay inspectable and a restore
    * is itself restorable. Tombstones of the source version apply. */
  def restore(spark: SparkSession, version: Int): Int =
    write(spark, readVersion(spark, version))

  /** DESCRIBE HISTORY analog: one row per retained version — version,
    * rows, files, bytes, whether tombstones are pending against it, and
    * whether it is the live one. Driver-side listing of the version dirs
    * (metadata-only; row counts come from parquet footers via count()). */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = fs(spark)
    val live = currentVersion(spark).getOrElse(0)
    val names = f.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
    val gone = names.filter(_.matches("_gone_v\\d+")).map(_.drop(7).toInt).toSet
    val versions = names
      .collect { case n if n.matches("_(v|files_v)\\d+") => n.dropWhile(!_.isDigit).toInt }
      .distinct.filterNot(gone).sorted
    versions.map { v =>
      val files = listDataFiles(f, v)
      // n_rows = VISIBLE rows of the version (tombstones applied) — what a
      // reader of that version gets, not raw file contents
      val rows = applyTombstones(spark, v, snapshotDF(spark, v)).count()
      (v, rows, files.size.toLong, files.map(_._2).sum, f.exists(tombPath(v)), v == live)
    }.toDF("version", "n_rows", "n_files", "bytes", "has_tombstones", "is_live")
  }

  /** Commit gated on CHECK constraints (Delta `ADD CONSTRAINT` analog):
    * every expression must hold on EVERY row or nothing commits — the
    * violation count comes from one aggregate pass over `df` before any
    * write starts. Returns the committed version. */
  def writeChecked(spark: SparkSession, df: DataFrame,
      constraints: Seq[(String, org.apache.spark.sql.Column)],
      partitionByCols: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{count, lit, when}
    if (constraints.nonEmpty) {
      val aggs = constraints.map { case (name, c) =>
        count(when(!c || c.isNull, 1)).as(name)
      }
      val viol = df.agg(aggs.head, aggs.tail: _*).collect().head
      val bad = constraints.zipWithIndex.collect {
        case ((name, _), i) if viol.getLong(i) > 0 => s"$name (${viol.getLong(i)} rows)"
      }
      if (bad.nonEmpty) throw new IllegalStateException(
        s"SnapshotTable $root: CHECK constraint(s) violated — ${bad.mkString(", ")}; commit aborted")
    }
    write(spark, df, partitionByCols, clusterBy)
  }

  /** Drop snapshot dirs older than the `keep` most recent (time travel
    * window), along with their tombstone/stats/bloom/file-manifest
    * sidecars. Never touches the live version (`keep >= 1` enforced), and
    * never a dir that a RETAINED version's file manifest still references
    * (a compacted version may point into older dirs). */
  def vacuum(spark: SparkSession, keep: Int = 2): Unit = {
    require(keep >= 1, s"vacuum keep must be >= 1 (got $keep): keep=0 would delete the live version")
    val f = fs(spark)
    currentVersion(spark).foreach { cur =>
      val referenced: Set[Int] =
        (math.max(1, cur - keep + 1) to cur).toSet.flatMap { (v: Int) =>
          fileManifest(f, v).getOrElse(Vector.empty).flatMap { uri =>
            "_v(\\d+)/".r.findFirstMatchIn(uri).map(_.group(1).toInt)
          }.toSet
        }
      (1 to cur - keep).foreach { v =>
        val sidecars = Seq(tombPath(v), statsPath(v), bloomPath(v), filesPath(v))
        val dirs = if (referenced(v)) sidecars else new Path(s"$root/_v$v") +: sidecars
        dirs.foreach { p => if (f.exists(p)) f.delete(p, true) }
        // a dir kept only because a retained manifest points into it is no
        // longer a readable VERSION — mark it so history/readVersion skip it
        if (referenced(v) && f.exists(new Path(s"$root/_v$v")))
          f.create(new Path(root, s"_gone_v$v"), true).close()
      }
      // Reap _staging_* orphans from crashed writers (the bucketed table's
      // rule). Age-gated by commitStaleMs so an ACTIVE writer mid-stage is
      // never clobbered — and gated on the MAX mtime across the dir tree,
      // not the root's: Spark writes task files under _staging_*/_temporary
      // without bumping the staging root's mtime, so a root-mtime gate
      // would reap a healthy long-running write mid-job.
      val now = System.currentTimeMillis()
      f.listStatus(new Path(root)).foreach { st =>
        if (st.getPath.getName.startsWith("_staging_")) {
          var newest = st.getModificationTime
          val files = f.listFiles(st.getPath, true)
          while (files.hasNext) newest = math.max(newest, files.next().getModificationTime)
          if (now - newest > commitStaleMs) f.delete(st.getPath, true)
        }
      }
    }
  }
}

