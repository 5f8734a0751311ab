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
  *   root/_manifest_v<N>                // header + bucket→(batchDir, contentV)
  *   root/_batch_v<N>/__bucket=<b>/...  // immutable bucket snapshots
  *   root/_batch_v<N>/_stats            // per-file min/max (when statsCols)
  * }}}
  *
  * Commit protocol identical to [[SnapshotTable]]: batches stage under
  * `_staging_*`, then rename + manifest + pointer flip inside the
  * [[CommitLock]] critical section. Merges are optimistic read-modify-
  * write — a merge that loses the commit race REBASES when the
  * intervening commits left its affected buckets' manifest entries
  * unmoved (disjoint writers each stage once and serialize only on the
  * metadata commit), and otherwise recomputes against the fresh state
  * and retries, so racing writers on a shared table all land and none
  * is lost.
  *
  * Reference semantics carried over: SCD1 = FactStream.py:12-21, SCD2 =
  * DimUser.py:20-29 (via [[ScdMerge]]).
  */
final class BucketedSnapshotTable(
    val root: String,
    val numBuckets: Int,
    val keys: Seq[String],
    val statsCols: Seq[String] = Nil,
    /** Columns carrying a per-batch [[BloomIndex]] sidecar: the point-
      * lookup complement to `statsCols`' min/max ranges. On a 100 TB table
      * clustered by the bucket keys, every OTHER high-cardinality column's
      * [min,max] spans the whole domain in every file — range stats prune
      * nothing for `WHERE order_id = k`. A per-file Bloom filter answers
      * membership regardless of layout, so predicate DML / point reads on
      * non-key columns touch O(1 + fpp·files) files instead of O(table). */
    val bloomCols: Seq[String] = Nil,
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
    readManifest0(spark, currentVersion(spark))

  private def readManifest0(spark: SparkSession, v: Option[Int]): Map[Int, String] =
    v.map(readManifest(spark, _)).getOrElse(Map.empty)

  private def readManifest(spark: SparkSession, v: Int): Map[Int, String] =
    readEntries(spark, v).map { case (b, e) => b -> e.dir }

  import BucketedSnapshotTable.BucketEntry

  private def readEntries(spark: SparkSession, v: Int): Map[Int, BucketEntry] = {
    val f = fs(spark)
    val in = f.open(new Path(root, s"_manifest_v$v"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // header lines are "name=value" (numBuckets always; keys since r7 —
    // older manifests without it still parse); entries are
    // "bucket\tdir[\tcontentV]"
    lines.dropWhile(l => l.contains("=") && !l.contains("\t")).map { l =>
      l.split("\t", 3) match {
        case Array(b, dir, cv) => b.toInt -> BucketEntry(dir, cv.toInt)
        case Array(b, dir) => b.toInt -> BucketEntry(dir,
          dir.stripPrefix("_batch_v").toIntOption.getOrElse(Int.MaxValue))
        case _ => throw new IllegalStateException(
          s"BucketedSnapshotTable $root: corrupt manifest entry '$l' in _manifest_v$v")
      }
    }.toMap
  }

  /** Header fields of the live manifest (numBuckets, keys when present) —
    * lets path-only consumers (the SQL MERGE router) reconstruct and
    * VALIDATE the table identity instead of silently mis-bucketing. */
  def manifestHeader(spark: SparkSession): Map[String, String] =
    currentVersion(spark).map(headerOf(spark, _)).getOrElse(Map.empty)

  private def headerOf(spark: SparkSession, v: Int): Map[String, String] = {
    val f = fs(spark)
    val in = f.open(new Path(root, s"_manifest_v$v"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    lines.takeWhile(l => l.contains("=") && !l.contains("\t"))
      .map { l => val Array(k, vv) = l.split("=", 2); k -> vv }.toMap
  }

  /** Streaming-transaction watermarks recorded in version `v`'s manifest
    * header (`txn:<queryId>=<batchId>`): the highest micro-batch each
    * logical stream has committed — the exactly-once ledger. */
  private def txnsOf(spark: SparkSession, v: Int): Map[String, Long] =
    if (v == 0) Map.empty
    else headerOf(spark, v).collect {
      case (k, b) if k.startsWith("txn:") => k.stripPrefix("txn:") -> b.toLong
    }

  /** The highest batch id the live manifest's exactly-once ledger records
    * for `queryId` (None = never applied) — the committed progress marker
    * a crashed consumer recovers from. */
  def appliedTxn(spark: SparkSession, queryId: String): Option[Long] =
    currentVersion(spark).flatMap(v => txnsOf(spark, v).get(queryId))

  /** The ledger entry for `queryId` as of a SPECIFIC committed version —
    * lets a reader pin a (state version, ledger value) pair atomically
    * instead of racing two head reads against a concurrent commit. */
  private[graft] def appliedTxnAt(spark: SparkSession, queryId: String,
      version: Int): Option[Long] =
    txnsOf(spark, version).get(queryId)

  /** Latest committed version whose ledger entry for `queryId` is at most
    * `value` (absent counts as 0) — the replay-pinned read point for a
    * multi-table consumer recovering from a crash AFTER this table's own
    * commit landed but BEFORE a downstream commit did: the recovery run
    * must re-derive its deltas against this table's pre-crash state, not
    * its current head. O(versions-scanned) manifest-header reads, crash
    * paths only. */
  private[graft] def versionWithTxnAtMost(spark: SparkSession, queryId: String,
      value: Long): Option[Int] = {
    val cur = currentVersion(spark).getOrElse(return None)
    (cur to 1 by -1).find { v =>
      // skip ONLY a manifest that no longer exists (vacuumed); any other
      // IO error must propagate — silently skipping a transiently
      // unreadable version would pin the replay to an OLDER base and
      // corrupt the recomputed deltas (the refresh is retryable)
      try txnsOf(spark, v).getOrElse(queryId, 0L) <= value
      catch { case _: java.io.FileNotFoundException => false }
    }
  }

  private def writeManifest(spark: SparkSession, v: Int, m: Map[Int, BucketEntry],
      txns: Map[String, Long] = Map.empty,
      dirSchemas: Map[String, String] = Map.empty): Unit = {
    val f = fs(spark)
    // indexed-column headers are TABLE properties, not writer properties: a
    // writer constructed without statsCols/bloomCols (a maintenance job, a
    // default-routed merge) must not erase what ANALYZE recorded — inherit
    // the previous header's columns when this instance carries none
    val prev =
      if (v <= 1) Map.empty[String, String]
      else try headerOf(spark, v - 1) catch { case _: java.io.IOException => Map.empty[String, String] }
    val effStats = if (statsCols.nonEmpty) statsCols
      else prev.get("statsCols").toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val effBloom = if (bloomCols.nonEmpty) bloomCols
      else prev.get("bloomCols").toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // keys inherit the same way, and an empty key set OMITS the header
    // entirely: a metadata-only commit over a pre-r7 manifest (no keys
    // header) must not write `keys=`, which layoutOf would read back as
    // Some(Nil) — consumers rely on the None-vs-Some(Nil) distinction to
    // raise the explicit "manifest records no bucket keys" error instead
    // of silently proceeding with empty bucket keys.
    val effKeys = if (keys.nonEmpty) keys
      else prev.get("keys").toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // per-batch-dir FILE schemas (r14): recorded at commit time so
    // planning (readIndexed) never reads a parquet footer per batch dir —
    // O(1) metadata instead of O(dirs) IO on a many-dir table. Lines for
    // dirs this manifest no longer references are dropped (bounded
    // growth); dirs committed before the feature simply lack a line and
    // fall back to one footer read each.
    val liveDirs = m.values.map(_.dir).toSet
    val inherited = prev.collect {
      case (k, ddl) if k.startsWith("schema:") &&
          liveDirs(k.stripPrefix("schema:")) => k.stripPrefix("schema:") -> ddl
    }
    val schemaLines = (inherited ++ dirSchemas.filter(e => liveDirs(e._1)))
      .toSeq.sortBy(_._1).map { case (d, ddl) => s"schema:$d=$ddl" }
    val header = Seq(s"numBuckets=$numBuckets") ++
      (if (effKeys.isEmpty) Nil else Seq(s"keys=${effKeys.mkString(",")}")) ++
      (if (effStats.isEmpty) Nil else Seq(s"statsCols=${effStats.mkString(",")}")) ++
      (if (effBloom.isEmpty) Nil else Seq(s"bloomCols=${effBloom.mkString(",")}")) ++
      txns.toSeq.sortBy(_._1).map { case (q, b) => s"txn:$q=$b" } ++
      schemaLines
    val body = (header ++
      m.toSeq.sortBy(_._1).map { case (b, e) => s"$b\t${e.dir}\t${e.contentV}" }).mkString("\n")
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
    * dirs are listed/scanned). `None` = all live buckets.
    *
    * SCHEMA EVOLUTION across batch dirs (the `appendEvolving`/mergeSchema
    * read semantics): batches written across a schema change resolve to
    * the UNION schema by name — oldest batch's type wins per column,
    * absent columns null-fill — so a merge whose algebra adds or omits
    * columns commits O(affected buckets) like any other, never a uniform
    * whole-table migration. */
  private def readBuckets(spark: SparkSession, wanted: Option[Set[Int]]): Option[DataFrame] =
    fromManifest(spark, manifest(spark), wanted)

  private def fromManifest(spark: SparkSession, m: Map[Int, String],
      wanted: Option[Set[Int]]): Option[DataFrame] = {
    val picked = wanted.map(w => m.filter { case (b, _) => w(b) }).getOrElse(m)
    if (picked.isEmpty) None
    else {
      // group by batch dir so each dir is one relation with basePath set
      // (keeps __bucket as a partition column); deterministic batch order
      // so first-seen column types are stable
      val parts = picked.groupBy(_._2).toSeq
        .sortBy { case (dir, _) => dir.stripPrefix("_batch_v").toIntOption.getOrElse(0) }
        .map { case (dir, entries) =>
          spark.read
            .option("basePath", s"$root/$dir")
            .parquet(entries.keys.toSeq.sorted.map(b => s"$root/$dir/$BucketCol=$b"): _*)
        }
      Some(unionEvolvingParts(parts))
    }
  }

  /** Union per-batch relations to the name-union schema (first-seen type
    * wins, absent columns null-fill) — how batch dirs written across a
    * schema change read as one table. */
  private def unionEvolvingParts(parts: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val allCols = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.DataType]
    parts.foreach(_.schema.foreach(fld =>
      if (!allCols.contains(fld.name)) allCols(fld.name) = fld.dataType))
    parts.map { p =>
      p.select(allCols.toSeq.map { case (n, dt) =>
        if (p.columns.contains(n)) col(n).cast(dt).as(n)
        else lit(null).cast(dt).as(n)
      }: _*)
    }.reduce(_ unionByName _)
  }

  /** Version `v`'s VISIBLE relation schema from ONE representative bucket
    * per batch dir (schema evolution is per write job = per dir, so one
    * bucket carries the dir's schema) — O(dirs) planning instead of the
    * full read's O(buckets) listing. What a streaming source / consumer
    * that only needs the shape should call. */
  private[graft] def versionSchema(spark: SparkSession,
      v: Int): org.apache.spark.sql.types.StructType = {
    val m = readManifest(spark, v)
    val onePerDir: Map[Int, String] =
      m.groupBy(_._2).map { case (dir, entries) => entries.keys.min -> dir }
    fromManifest(spark, onePerDir, None)
      .map(df => ScdMerge.scd1Current(df.drop(BucketCol)).schema)
      .getOrElse(throw new IllegalStateException(
        s"BucketedSnapshotTable $root: version $v is empty"))
  }

  /** Full-table read (all buckets, internal bucket column dropped). */
  def read(spark: SparkSession): DataFrame =
    readBuckets(spark, None)
      .getOrElse(throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
      .drop(BucketCol)

  /** Point lookup by business key — the bucketed format's answer to the
    * plain table's Bloom index: the probed keys hash to their buckets
    * driver-side (metadata only), and ONLY those bucket dirs are scanned
    * before the semi-join. A single-key lookup on a 4096-bucket 100 TB
    * table scans 1/4096th of it regardless of layout or clustering.
    * `keyRows` carries the bucket-key columns, matched by name. */
  def readKeys(spark: SparkSession, keyRows: DataFrame): DataFrame = {
    val probe = keyRows.select(keys.map(col): _*).distinct()
    val wanted = probe.select(bucketExpr.as("__b"))
      .distinct().collect().map(_.getInt(0)).toSet
    readBuckets(spark, Some(wanted)) match {
      case None     => read(spark).limit(0) // schema-preserving empty relation
      case Some(df) => df.drop(BucketCol).join(probe, keys, "left_semi")
    }
  }

  /** [[readKeys]] pinned to manifest `version`: the bucket file list
    * resolves from THAT version's manifest, so a concurrent commit
    * landing between the caller's version capture and this read cannot
    * shift the read forward — what an incremental-view leg needs when it
    * RECORDS the version it joined (reading a newer state than recorded
    * would double-apply that window on the next refresh). */
  def readKeysAt(spark: SparkSession, keyRows: DataFrame, version: Int): DataFrame = {
    val probe = keyRows.select(keys.map(col): _*).distinct()
    val wanted = probe.select(bucketExpr.as("__b"))
      .distinct().collect().map(_.getInt(0)).toSet
    fromManifest(spark, readManifest(spark, version), Some(wanted)) match {
      case None     => readVersion(spark, version).limit(0)
      case Some(df) => df.drop(BucketCol).join(probe, keys, "left_semi")
    }
  }

  /** Time travel: read manifest version `version`. Old manifests persist
    * across commits (metadata-sized), so any version whose batch dirs
    * [[vacuum]] has not yet reaped reads exactly as it was committed;
    * a vacuumed version raises (same contract as the plain table). */
  def readVersion(spark: SparkSession, version: Int): DataFrame = {
    val f = fs(spark)
    if (!f.exists(new Path(root, s"_manifest_v$version")))
      throw new IllegalArgumentException(
        s"BucketedSnapshotTable $root: version $version does not exist")
    val m = readManifest(spark, version)
    m.values.toSet.foreach { (dir: String) =>
      if (!f.exists(new Path(s"$root/$dir")))
        throw new IllegalArgumentException(
          s"BucketedSnapshotTable $root: version $version was vacuumed (missing $dir)")
    }
    fromManifest(spark, m, None)
      .getOrElse(throw new IllegalStateException(
        s"BucketedSnapshotTable $root: version $version is empty"))
      .drop(BucketCol)
  }

  /** Timestamp time travel: the newest version whose `_manifest_v<N>` was
    * committed at or before `tsMillis` (manifest files are written inside
    * the commit critical section and never touched again — their mtime IS
    * the commit time). Raises if every retained version is newer. */
  def versionAt(spark: SparkSession, tsMillis: Long): Int = {
    val f = fs(spark)
    val eligible = f.listStatus(new Path(root))
      .filter(_.getPath.getName.matches("_manifest_v\\d+"))
      .filter(_.getModificationTime <= tsMillis)
      .map(_.getPath.getName.stripPrefix("_manifest_v").toInt)
    if (eligible.isEmpty) throw new IllegalArgumentException(
      s"BucketedSnapshotTable $root: no version committed at or before " +
        s"${java.time.Instant.ofEpochMilli(tsMillis)} (earliest retained is newer)")
    eligible.max
  }

  /** [[readVersion]] at the newest version committed ≤ `tsMillis`. */
  def readTimestamp(spark: SparkSession, tsMillis: Long): DataFrame =
    readVersion(spark, versionAt(spark, tsMillis))

  /** DESCRIBE HISTORY analog: one row per RETAINED (readable) manifest
    * version — version, visible rows, files, bytes, is_live. Versions
    * whose batch dirs vacuum already reaped are skipped. */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = fs(spark)
    val live = currentVersion(spark).getOrElse(0)
    val versions = f.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.matches("_manifest_v\\d+"))
      .map(_.stripPrefix("_manifest_v").toInt).sorted
    versions.toSeq.flatMap { v =>
      val m = readManifest(spark, v)
      val readable = m.values.toSet.forall(d => f.exists(new Path(s"$root/$d")))
      if (!readable) None
      else {
        val files = m.toSeq.flatMap { case (b, dir) =>
          val p = new Path(s"$root/$dir/$BucketCol=$b")
          if (!f.exists(p)) Nil
          else f.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
        }
        val rows = fromManifest(spark, m, None).map(_.count()).getOrElse(0L)
        Some((v, rows, files.size.toLong, files.map(_.getLen).sum, v == live))
      }
    }.toDF("version", "n_rows", "n_files", "bytes", "is_live")
  }

  /** Change data feed between two committed versions, MANIFEST-PRUNED:
    * the two versions' manifests (driver-side metadata, ≤ numBuckets
    * entries each) name which buckets point at different batch dirs — a
    * bucket carried over by reference between `fromV` and `toV` CANNOT
    * contain a change, so only the differing buckets are read and
    * diffed. On a 100 TB table where a day's merges touched 1% of
    * buckets, the CDF job reads ~1% of two versions, never the table.
    *
    * Output contract is [[SnapshotTable.changes]]'s ([[ChangeFeed]]):
    * `_change_type` ∈ {insert, delete, update}, update rows carry new
    * values, delete rows old ones, optional `_changed_columns`
    * attribution. The diff runs over the VISIBLE rows (SCD tombstone
    * state filtered via [[ScdMerge.scd1Current]]), so a key tombstoned
    * by a delete flow between the versions reports `delete` — the event
    * a CDC consumer needs, not the bookkeeping row that encodes it. */
  def changes(spark: SparkSession, fromV: Int, toV: Int,
      withChangedColumns: Boolean = false,
      withPreimage: Boolean = false): DataFrame = {
    require(fromV < toV,
      s"BucketedSnapshotTable $root: changes needs fromV < toV (got $fromV, $toV)")
    val f = fs(spark)
    def checked(v: Int): Map[Int, BucketEntry] = {
      if (!f.exists(new Path(root, s"_manifest_v$v")))
        throw new IllegalArgumentException(
          s"BucketedSnapshotTable $root: version $v does not exist")
      val m = readEntries(spark, v)
      m.values.map(_.dir).toSet.foreach { (dir: String) =>
        if (!f.exists(new Path(s"$root/$dir")))
          throw new IllegalArgumentException(
            s"BucketedSnapshotTable $root: version $v was vacuumed (missing $dir)")
      }
      m
    }
    val eFrom = checked(fromV)
    val eTo = checked(toV)
    // metadata-only pruning on the CONTENT version: a bucket whose content
    // last changed at the same commit in both manifests is byte-identical
    // even if maintenance moved its bytes to a new batch dir in between —
    // so a change-feed window spanning an OPTIMIZE still reads only the
    // buckets a merge actually touched
    val changed = (eFrom.keySet ++ eTo.keySet)
      .filter(b => BucketedSnapshotTable.contentDiffers(eFrom.get(b), eTo.get(b)))
    val mFrom = eFrom.map { case (b, e) => b -> e.dir }
    val mTo = eTo.map { case (b, e) => b -> e.dir }
    // schema donor for an empty side (e.g. fromV before the key range
    // existed, or a fully-deleted toV): footer-only read, no data scan
    lazy val schemaOnly: DataFrame =
      fromManifest(spark, mTo, None).orElse(fromManifest(spark, mFrom, None))
        .map(df => ScdMerge.scd1Current(df.drop(BucketCol)).limit(0))
        .getOrElse(throw new IllegalStateException(
          s"BucketedSnapshotTable $root: versions $fromV and $toV are both empty"))
    def visible(m: Map[Int, String]): DataFrame =
      fromManifest(spark, m, Some(changed))
        .map(df => ScdMerge.scd1Current(df.drop(BucketCol)))
        .getOrElse(schemaOnly)
    ChangeFeed.diff(visible(mFrom), visible(mTo), keys, withChangedColumns,
      withPreimage)
  }

  /** Metadata-only: the buckets whose CONTENT changed between two committed
    * versions — exactly what [[changes]] will read. Exposed for the pruning
    * assertions (spec pins that an OPTIMIZE between the versions does not
    * inflate this set). */
  private[graft] def changedBuckets(spark: SparkSession, fromV: Int, toV: Int): Set[Int] = {
    val eFrom = readEntries(spark, fromV)
    val eTo = readEntries(spark, toV)
    (eFrom.keySet ++ eTo.keySet)
      .filter(b => BucketedSnapshotTable.contentDiffers(eFrom.get(b), eTo.get(b)))
  }

  // ── CHECK constraints (Delta semantics, plain-table parity) ────────────
  //
  // Stored as "name\tpredicate" lines in `_constraints`, validated against
  // the VISIBLE table on add, enforced inline in every merge/DML staging
  // write via assert_true-in-filter (fused into the write plan — no second
  // scan). Tombstone bookkeeping rows (`__DELETED`) are exempt: a CHECK
  // constrains the data a reader can see, not the delete marker that
  // removes it.

  private def constraintsFile = new Path(root, "_constraints")

  /** Active CHECK constraints, name → SQL predicate. */
  def constraints(spark: SparkSession): Map[String, String] = {
    val f = fs(spark)
    MetaIO.readSmall(f, constraintsFile) match {
      case None => Map.empty
      case Some(txt) => txt.linesIterator.filter(_.nonEmpty).map { l =>
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
      throw new IllegalStateException(s"BucketedSnapshotTable $root: constraints write failed")
  }

  /** Add a CHECK constraint: the existing VISIBLE snapshot is validated
    * first (rejecting the constraint, not the data, if any row breaks
    * it), then every subsequent merge/DML batch is checked inline. */
  def addConstraint(spark: SparkSession, name: String, predicate: String): Unit = {
    require(!name.contains("\t") && !name.contains("\n") &&
      !predicate.contains("\t") && !predicate.contains("\n"),
      "constraint name/predicate must not contain tabs or newlines")
    val f = fs(spark)
    CommitLock.withLockHandle(f, root, commitStaleMs) { _ =>
      if (exists(spark)) {
        val bad = ScdMerge.scd1Current(read(spark))
          .filter(!coalesce(expr(predicate), lit(false))).count()
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
    CommitLock.withLockHandle(f, root, commitStaleMs) { _ =>
      writeConstraints(f, constraints(spark) - name)
    }
  }

  /** Inline enforcement on a staging write's content: raises
    * CONSTRAINT_VIOLATION on the first visible row breaking any CHECK.
    * NULL predicate results violate (CHECK must prove the row);
    * `__DELETED` tombstone rows are exempt. */
  private def enforceConstraints(spark: SparkSession, df: DataFrame): DataFrame =
    constraints(spark).foldLeft(df) { case (d, (name, pred)) =>
      val exempt =
        if (d.columns.contains(ScdMerge.DeletedCol))
          coalesce(col(ScdMerge.DeletedCol), lit(false))
        else lit(false)
      d.filter(assert_true(exempt || coalesce(expr(pred), lit(false)),
        lit(s"CONSTRAINT_VIOLATION: CHECK $name ($pred) failed")).isNull)
    }

  /** Incremental CDF consumption (the consumer side of [[changes]]):
    * process every change committed since this consumer's checkpoint in
    * ONE manifest-pruned diff, then advance the checkpoint — the
    * downstream-incremental-refresh loop (feed a materialized aggregate,
    * mirror to a search index, …) without the consumer ever re-scanning
    * the table. `fn` receives the [[ChangeFeed]]-shaped diff (fromV →
    * live); the checkpoint file records the processed version and is
    * written only AFTER `fn` returns, so a crashed consumer re-reads the
    * same window (at-least-once; pair with idempotent apply or a txn
    * ledger downstream for exactly-once). First call = full bootstrap:
    * every live row arrives as `insert`. Returns the version the
    * checkpoint now records. */
  def consumeChanges(spark: SparkSession, checkpointFile: String,
      withChangedColumns: Boolean = false)(fn: DataFrame => Unit): Int =
    consumeChangesVersioned(spark, checkpointFile, withChangedColumns) {
      (feed, _, _) => fn(feed)
    }

  /** [[consumeChanges]] with the window's (fromVersion, toVersion) handed
    * to the consumer — what an exactly-once apply needs to stamp its txn
    * ledger entry (fromVersion = 0 on the bootstrap call). */
  def consumeChangesVersioned(spark: SparkSession, checkpointFile: String,
      withChangedColumns: Boolean = false)(fn: (DataFrame, Int, Int) => Unit): Int = {
    val f = fs(spark)
    val ckPath = new Path(checkpointFile)
    val live = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
    val last = MetaIO.readSmall(f, ckPath).map(_.trim.toInt).getOrElse(0)
    if (live > last) {
      val feed =
        if (last == 0) {
          // bootstrap: the whole visible table as inserts, CDF-shaped
          val base = ScdMerge.scd1Current(read(spark))
            .withColumn("_change_type", lit("insert"))
          if (withChangedColumns) base.withColumn("_changed_columns", lit(""))
          else base
        } else changes(spark, last, live, withChangedColumns)
      fn(feed, last, live)
      val out = f.create(ckPath, true)
      try out.write(live.toString.getBytes("UTF-8")) finally out.close()
    }
    math.max(live, last)
  }

  /** EXACTLY-ONCE incremental mirror into another bucketed table: consume
    * this table's change feed since `checkpointFile` and merge it into
    * `target`, the consumer loop that keeps a downstream copy (different
    * bucket count, different cluster, a serving mirror) in sync without
    * ever re-scanning the source.
    *
    * Exactly-once composition: the merge is stamped into `target`'s
    * transaction ledger as (`cdf:<consumerId>`, toVersion) in the SAME
    * manifest commit that applies it, so the ledger — not the checkpoint
    * file — is the authoritative progress marker. On every call the
    * checkpoint first HEALS from the ledger: a consumer that crashed after
    * the merge landed but before its checkpoint advanced resumes from the
    * version the ledger proves applied, never re-diffing a window the
    * target already absorbed. (Resuming from the stale checkpoint instead
    * would be wrong, not just wasteful: if a key changed in the crashed
    * window and REVERTED before the retry, the wider stale-window diff
    * reports no change for it and the mirror would keep the crashed
    * window's value.) Rows arrive in `target` carrying `__cdf_seq` = the
    * source version that produced them (the merge's ordering column,
    * monotone across windows); deletes flow as tombstones. Read the mirror
    * with SNAPSHOT / [[ScdMerge.scd1Current]], which filter tombstones.
    * Returns the checkpointed source version. */
  def applyChangesTo(spark: SparkSession, checkpointFile: String,
      target: BucketedSnapshotTable, consumerId: String): Int = {
    BucketedSnapshotTable.healCheckpoint(fs(spark), checkpointFile,
      target, consumerId)
    consumeChangesVersioned(spark, checkpointFile) { (feed, _, toV) =>
      BucketedSnapshotTable.applyFeed(spark, target, feed, toV, consumerId)
    }
  }

  /** SCD Type 1 merge (last-write-wins upsert, FactStream.py:12-21
    * semantics). Returns the set of bucket ids rewritten. */
  def scd1Merge(spark: SparkSession, updates: DataFrame, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None,
      txn: Option[(String, Long)] = None): Set[Int] =
    merge(spark, updates, (cur, upd) =>
      ScdMerge.scd1Upsert(cur, upd, keys, seqCol, tieBreak, applyAsDeletes), txn)

  /** SCD Type 2 merge (full version history, DimUser.py:20-29 semantics).
    * Returns the set of bucket ids rewritten.
    *
    * `applyAsDeletes` (tombstone semantics — see [[ScdMerge.scd2Merge]]):
    * a delete-enabled merge on a table written without deletes commits
    * O(affected buckets) like any other — the stored schema gains
    * `__DELETED` only in the rewritten batch dirs, and [[readBuckets]]'s
    * union-schema resolution null-fills it for untouched buckets (the
    * merge algebra coalesces null → false). No migration commit. */
  def scd2Merge(spark: SparkSession, updates: DataFrame, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None,
      txn: Option[(String, Long)] = None): Set[Int] =
    merge(spark, updates, (cur, upd) =>
      ScdMerge.scd2Merge(cur, upd, keys, seqCol, tieBreak, Nil, applyAsDeletes), txn)

  /** Copy-on-write UPDATE (the Delta UPDATE shape on the bucketed format):
    * rewrite ONLY the buckets containing rows matching `pred`, with every
    * SET expression evaluated against the PRE-update row (simultaneous
    * assignment, `SET a = b, b = a` swaps). Returns (buckets rewritten,
    * rows updated).
    *
    * Scale shape: finding the affected buckets is one column-pruned scan
    * of `pred`'s columns + the bucket partition column (the same touched-
    * file discovery Delta's UPDATE runs); the rewrite IO is then O(matched
    * buckets), never O(table). Bucket KEY columns cannot be SET — the row
    * would belong in a different bucket (that is a delete + merge, not an
    * update). */
  def update(spark: SparkSession, pred: Column,
      sets: Seq[(String, Column)]): (Set[Int], Long) = {
    val badKeys = sets.map(_._1).filter(keys.contains)
    require(badKeys.isEmpty,
      s"BucketedSnapshotTable $root: UPDATE may not modify bucket key column(s) " +
        s"${badKeys.mkString(",")} — the row would be mis-bucketed; model a key " +
        "change as delete + merge")
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    rewriteMatching(spark, pred) { df =>
      val unknown = sets.map(_._1).filterNot(df.columns.contains)
      require(unknown.isEmpty,
        s"BucketedSnapshotTable $root: UPDATE SET on unknown column(s) ${unknown.mkString(",")}")
      // ONE projection over the original row: all SET right-hand sides see
      // pre-update values (SQL simultaneous-assignment semantics)
      df.select(df.columns.map { c =>
        sets.collectFirst { case (n, e) if n == c =>
          when(pred, e).otherwise(col(c)).as(c)
        }.getOrElse(col(c))
      }: _*)
    }
  }

  /** Copy-on-write DELETE FROM: rewrite only the buckets containing rows
    * matching `pred`, dropping those rows. Returns (buckets rewritten,
    * rows deleted). A bucket whose every row matches writes no dir and
    * leaves the manifest. NULL predicate results keep the row (SQL DELETE
    * removes only rows where the predicate is TRUE). */
  def delete(spark: SparkSession, pred: Column): (Set[Int], Long) =
    rewriteMatching(spark, pred)(_.filter(!coalesce(pred, lit(false))))

  /** Conservative conjunctive [lo,hi] bounds per column, extracted from a
    * predicate's (unanalyzed) Catalyst expression — the driver-side range
    * analysis feeding [[statsCandidates]]. Only shapes whose bounds are
    * PROVABLY implied by the predicate contribute: `col <cmp> literal`
    * comparisons (either operand order) on numeric/date/timestamp columns
    * (string columns take the [[predStrBounds]] path against prefix stats),
    * conjoined by AND. Anything else (OR, NOT, functions, unanalyzable
    * conjuncts) contributes nothing — an AND-conjunct can only narrow the
    * match set, so ignoring one keeps the candidate set a superset.
    * Literal values quantize exactly as [[StatsManifest]] records them
    * (timestamps → epoch micros, dates → epoch days, numerics → double). */
  private[graft] def predBounds(pred: Column): Map[String, (Double, Double)] =
    predAllBounds(pred)._1

  /** String-column analog of [[predBounds]]: conservative [lo,hi] prefix
    * bounds (None = unbounded side), matched against the b64 prefix stats
    * [[StatsManifest]] records for string columns. */
  private[graft] def predStrBounds(pred: Column): Map[String, (Option[String], Option[String])] =
    predAllBounds(pred)._2

  /** Point-equality sets per column (`c = lit`, `c IN (lits)`, and ORs of
    * those), extracted for the Bloom-sidecar membership probe. Only
    * values representable in an index hash kind (integral → long,
    * string) contribute — anything else drops the column's constraint. */
  private[graft] def predPointSets(pred: Column): Map[String, BucketedSnapshotTable.PointSet] =
    predAllBounds(pred)._3

  private type NumB = Map[String, (Double, Double)]
  private type StrB = Map[String, (Option[String], Option[String])]
  private type PtB  = Map[String, BucketedSnapshotTable.PointSet]

  private def predAllBounds(pred: Column): (NumB, StrB, PtB) =
    BucketedSnapshotTable.extractBounds(
      org.apache.spark.sql.GraftColumnBridge.catalystExpression(pred))

  /** Stats-manifest pre-filter for predicate DML discovery (the bucketed
    * analog of Delta's data-skipping on UPDATE/DELETE): buckets whose every
    * file's recorded [min,max] for some bounded stats column lies outside
    * the predicate's extracted range CANNOT contain a match, so the
    * discovery scan skips them. Returns None when the predicate yields no
    * usable bounds (scan everything, the pre-r9 behavior); a batch dir
    * without a stats manifest keeps all its buckets — pruning is always a
    * superset guarantee, and the row-level filter still applies. */
  private[graft] def statsCandidates(spark: SparkSession, m: Map[Int, String],
      pred: Column): Option[Set[Int]] = {
    val (allN, allS, allP) = predAllBounds(pred)
    val nBounds = allN.filter { case (c, _) => statsCols.contains(c) }
    val sBounds = allS.filter { case (c, _) => statsCols.contains(c) }
    val pSets   = allP.filter { case (c, _) => bloomCols.contains(c) }
    // BUCKET-KEY pruning needs no sidecars at all: when every bucket key
    // carries a point constraint, the candidate buckets are the literal
    // tuples' hash targets (keyBuckets, one footer read for the key
    // types) — `UPDATE … WHERE key = k` discovers O(1) buckets on a bare
    // table, the DML twin of the q315 read path.
    val byKey: Option[Set[Int]] =
      if (keys.isEmpty || !keys.forall(allP.contains)) None
      else m.headOption.flatMap { case (b, dir) =>
        val rep = s"$root/$dir/$BucketCol=$b"
        (try Some(spark.read.parquet(rep).schema)
         catch { case _: Exception => None })
          .flatMap(keyBuckets(_, allP))
      }
    if (nBounds.isEmpty && sBounds.isEmpty && pSets.isEmpty) return byKey
    val f = fs(spark)
    def norm(p: String) = new Path(p).toUri.getPath
    val sidecarCands = Some(m.groupBy(_._2).flatMap { case (dir, entries) =>
      // range pass: files whose every bounded column's recorded [min,max]
      // intersects (a column missing from a file's stats entry keeps the
      // file — superset guarantee); None = no stats manifest for the batch
      val rangePass: Option[Set[String]] =
        if (nBounds.isEmpty && sBounds.isEmpty) None
        else StatsManifest.readLines(f, batchStatsPath(dir)).map { lines =>
          lines.filter { l =>
            val ents = l.split("\t").drop(1)
            nBounds.forall { case (c, (lo, hi)) =>
              ents.find(_.startsWith(s"$c:n:")) match {
                case None => true
                case Some(s) =>
                  val Array(_, _, mn, mx) = s.split(":", 4)
                  !(mx.toDouble < lo || mn.toDouble > hi)
              }
            } && sBounds.forall { case (c, (lo, hi)) =>
              ents.find(_.startsWith(s"$c:s:")) match {
                case None => true
                case Some(s) =>
                  StatsManifest.stringEntryIntersects(s.split(":", 5), lo, hi)
              }
            }
          }.map(l => norm(l.split("\t")(0))).toSet
        }
      // bloom pass: files whose per-file filter might contain at least one
      // point value, for EVERY point-constrained indexed column; None = no
      // bloom index for the batch (or no point constraints)
      val bloomPass: Option[Set[String]] = {
        val perCol = pSets.toSeq.flatMap { case (c, pts) =>
          BloomIndex.filesMightContainAny(f, batchBloomPath(dir), c, pts.longs, pts.strs, pts.dbls)
            .map(_.map(norm).toSet)
        }
        if (perCol.isEmpty) None else Some(perCol.reduce(_ intersect _))
      }
      val pass: Option[Set[String]] = (rangePass, bloomPass) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b)             => a.orElse(b)
      }
      pass match {
        case None => entries.keys // no skipping metadata → keep the batch's buckets
        case Some(passFiles) =>
          entries.keys.filter { b =>
            val d = norm(s"$root/$dir/$BucketCol=$b") + "/"
            passFiles.exists(_.startsWith(d))
          }
      }
    }.toSet)
    // both analyses are supersets of the matching buckets → intersect
    (sidecarCands, byKey) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b)             => a.orElse(b)
    }
  }

  /** Shared copy-on-write loop for [[update]]/[[delete]]: per attempt,
    * discover the buckets holding `pred` matches (one job: per-bucket
    * match counts, ≤ numBuckets rows of driver metadata), rewrite those
    * buckets through `transform`, and commit. Recomputed from fresh state
    * on a lost commit race.
    *
    * Discovery is stats-pruned when the predicate carries range bounds on
    * a stats column ([[statsCandidates]]): on a table whose batches carry
    * per-file stats, `UPDATE … WHERE ts >= <recent>` scans only the
    * buckets whose files can hold such rows — O(recent data), not
    * O(table). The commit-race rebase rule stays the strict
    * `wholeTableRead` one (identical manifests required): a moved entry in
    * a NON-candidate bucket could hold new rows the stats snapshot this
    * attempt read never covered. */
  private def rewriteMatching(spark: SparkSession, pred: Column)
      (transform: DataFrame => DataFrame): (Set[Int], Long) = {
    var matched = 0L
    val touched = commitLoop(spark, wholeTableRead = true) { () =>
      val cand = statsCandidates(spark, manifest(spark), pred)
      readBuckets(spark, cand).flatMap { scanned =>
        val hits = scanned.filter(pred).groupBy(col(BucketCol)).count().collect()
        matched = hits.map(_.getLong(1)).sum
        val affected = hits.map(_.getInt(0)).toSet
        if (affected.isEmpty) None
        else Some((affected, transform(readBuckets(spark, Some(affected)).get)))
      }
    }
    (touched, matched)
  }

  private def merge(spark: SparkSession, updates: DataFrame,
      algebra: (Option[DataFrame], DataFrame) => DataFrame,
      txn: Option[(String, Long)] = None): Set[Int] = {
    // cheap replay short-circuit: a micro-batch the exactly-once ledger
    // already records skips before reading or staging anything (the
    // authoritative check re-runs inside the commit lock)
    if (txnApplied(spark, currentVersion(spark).getOrElse(0), txn)) return Set.empty
    val upd = updates.withColumn(BucketCol, bucketExpr)
    // driver-side metadata: at most numBuckets ints — NOT row data
    val updBuckets = upd.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSet
    if (updBuckets.isEmpty) return Set.empty
    commitLoop(spark, txn = txn) { () =>
      Some((updBuckets, algebra(readBuckets(spark, Some(updBuckets)), upd)))
    }
  }

  private def txnApplied(spark: SparkSession, v: Int,
      txn: Option[(String, Long)]): Boolean =
    txn.exists { case (q, b) => txnsOf(spark, v).get(q).exists(_ >= b) }

  /** The optimistic read-modify-write commit loop shared by merges and
    * copy-on-write DML: `stage` reads CURRENT state and returns (affected
    * buckets, their rewritten content carrying [[BucketCol]]), or None for
    * a no-op. Stages against the version it read; a lost race REBASES the
    * staged batch when the intervening commits left its affected buckets'
    * entries unmoved, else recomputes from fresh state — racing writers on
    * a shared table all land, serialized by the commit lock, none lost.
    * `txn` = (queryId, batchId) exactly-once ledger entry: a batch the
    * manifest header already records is a clean no-op (checked cheaply
    * before staging by [[merge]] and authoritatively inside the lock). */
  private def commitLoop(spark: SparkSession, wholeTableRead: Boolean = false,
      txn: Option[(String, Long)] = None)
      (stage: () => Option[(Set[Int], DataFrame)]): Set[Int] = {
    var attempt = 0
    while (true) {
      val v0 = currentVersion(spark).getOrElse(0)
      // manifest AT v0 (immutable once written): the rebase check below
      // compares the affected buckets' entries against it
      val m0 = if (v0 == 0) Map.empty[Int, BucketEntry] else readEntries(spark, v0)
      val (affected, merged) = stage() match {
        case None => return Set.empty
        case Some(x) => x
      }
      val (staging, effBloomC, stagedStats, stagedSchema) =
        stageBatch(spark, merged, v0)
      lockedCommit(spark, staging, affected, v0, m0, wholeTableRead, txn,
        effBloomC, stagedStats, stagedSchema) match {
        case Some(replayed) => return if (replayed) Set.empty else affected
        case None => ()
      }
      attempt += 1
      if (attempt > 12) throw new java.util.ConcurrentModificationException(
        s"BucketedSnapshotTable $root: merge lost the commit race 12 times — giving up")
      // jittered backoff so N symmetric racers don't re-stage in lockstep
      // (each loser pays a full re-stage; desynchronizing them lets one
      // winner land per staging window instead of all colliding again)
      Thread.sleep(math.min(50L * attempt, 500L) +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(50))
    }
    throw new IllegalStateException("unreachable")
  }

  /** The DATA half of a commit: write `merged` under a fresh `_staging_*`
    * dir (invisible — no manifest references it) and compute its sidecar
    * inputs. Runnable outside, and concurrently with, any lock — two
    * tables' staging writes may overlap. Returns (staging dir name,
    * effective bloom columns, staged stats lines, staged FILE schema DDL
    * — None when the batch wrote no data files). */
  private def stageBatch(spark: SparkSession, merged: DataFrame, v0: Int)
      : (String, Seq[String], Seq[String], Option[String]) = {
    val f = fs(spark)
    val staging = s"_staging_${java.util.UUID.randomUUID().toString.take(12)}"
    // repartition on the bucket id so each bucket dir gets ONE writer task
    // (one file), not shufflePartitions × buckets stragglers — at scale a
    // bucket is exactly one task's output, and the shuffle is the same
    // key-hash the merge already clustered on. CHECK constraints enforce
    // inline in this same plan (no second scan of the batch).
    enforceConstraints(spark, merged)
      .repartition(col(BucketCol)).write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(s"$root/$staging")
    onStep("staged")
    // a batch whose every row was tombstoned away stages NO parquet
    // (only _SUCCESS) — nothing to index, and reading it for stats
    // would fail schema inference
    val stagedHasData = f.listStatus(new Path(s"$root/$staging"))
      .exists(_.getPath.getName.startsWith(s"$BucketCol="))
    // per-batch stats computed on the staging files, then re-pointed at
    // the final dir — keeps the locked critical section metadata-sized.
    // Index columns come from the writer OR the manifest header
    // (effectiveIndexCols): every commit keeps the table's index fresh
    val (effStatsC, effBloomC) = effectiveIndexCols(spark, v0)
    val stagedStats: Seq[String] =
      if (effStatsC.isEmpty || !stagedHasData) Nil
      else StatsManifest.lines(spark.read.parquet(s"$root/$staging"), effStatsC)
    // bloom sidecars land INSIDE the staging dir (underscore-hidden from
    // parquet reads) so the rename carries them; only the manifest's
    // file paths need re-pointing after the flip
    if (effBloomC.nonEmpty && stagedHasData)
      writeBloom(spark, spark.read.parquet(s"$root/$staging"), staging, effBloomC)
    // the staged FILE schema (bucket partition column excluded), recorded
    // in the manifest header at commit so planning skips the footer read
    val stagedSchema =
      if (!stagedHasData) None
      else Some(BucketedSnapshotTable.schemaDdl(merged.schema, BucketCol))
    (staging, effBloomC, stagedStats, stagedSchema)
  }

  /** The LOCKED metadata half of a commit: rename + sidecar repoint +
    * manifest + pointer flip, all metadata-sized. Returns Some(replayed)
    * on success (replayed = the txn ledger already recorded this batch, a
    * clean no-op), None when the staged batch lost the commit race
    * unrebasably (staging deleted — the caller restages from fresh state). */
  private def lockedCommit(spark: SparkSession, staging: String,
      affected: Set[Int], v0: Int, m0: Map[Int, BucketEntry],
      wholeTableRead: Boolean, txn: Option[(String, Long)],
      effBloomC: Seq[String], stagedStats: Seq[String],
      stagedSchema: Option[String] = None): Option[Boolean] = {
    val f = fs(spark)
    var replayed = false
    var committedDir: Option[String] = None
    val committed = CommitLock.withLockHandle(f, root, commitStaleMs) { lockH =>
      val cur = currentVersion(spark).getOrElse(0)
      // authoritative exactly-once check, inside the critical section: a
      // racing restart of the same stream that committed this batch
      // first makes ours a clean no-op
      if (txnApplied(spark, cur, txn)) {
        f.delete(new Path(s"$root/$staging"), true)
        replayed = true
        true
      } else {
      // DISJOINT-WRITER REBASE: losing the version race only invalidates
      // our staged batch if an intervening commit touched one of OUR
      // affected buckets (its manifest entry moved). Otherwise the bytes
      // we staged are still exactly the rewrite of the current state of
      // those buckets — commit on top of the fresh manifest without
      // recomputing. N writers on disjoint key ranges each stage ONCE
      // and serialize only on this metadata-sized critical section,
      // instead of each loser re-reading and re-staging its buckets.
      // A merge's affected set comes from the BATCH (buckets of its
      // keys), so only those entries must be unmoved; predicate DML
      // (`wholeTableRead`) discovered its affected set by scanning the
      // whole table, so ANY moved entry could hide rows its predicate
      // never saw — rebase only when the manifests are identical.
      val mCur = if (cur == v0) m0 else readEntries(spark, cur)
      val rebasable = cur == v0 ||
        (if (wholeTableRead) mCur == m0
         else affected.forall(b => mCur.get(b) == m0.get(b)))
      if (!rebasable) {
        f.delete(new Path(s"$root/$staging"), true); false
      } else {
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
        if (effBloomC.nonEmpty) repointBloom(f, batchDir, staging, None)
        lockH.check() // paused-holder guard: abort rather than double-flip
        // A bucket whose merged content is EMPTY (every key tombstoned
        // by a delete flow) writes no partition dir — its manifest entry
        // must be REMOVED, not pointed at a missing path.
        val written = f.listStatus(batchPath).map(_.getPath.getName)
          .collect { case n if n.startsWith(s"$BucketCol=") =>
            n.stripPrefix(s"$BucketCol=").toInt }.toSet
        writeManifest(spark, next,
          (mCur -- affected) ++
            affected.intersect(written)
              .map(_ -> BucketEntry(batchDir, next)).toMap,
          txnsOf(spark, cur) ++ txn,
          stagedSchema.map(batchDir -> _).toMap)
        onStep("committed")
        committedDir = Some(batchDir)
        true
      }
      }
    }
    if (committed) {
      // post-commit, outside the lock: the fresh batch dir is immutable
      // now — collapse its per-file bloom sidecars into the O(1)-probe
      // blob (the compaction/ANALYZE paths already do; without this,
      // point probes paid O(files) sidecar reads on every batch merged
      // since the last ANALYZE — the r11 soak's growing dim-leg IO)
      if (effBloomC.nonEmpty) committedDir.foreach(d =>
        BloomIndex.consolidate(f, batchBloomPath(d)))
      Some(replayed)
    } else None
  }

  /** TWO-PHASE SCD1 merge for multi-table coordinators (the MV refresh,
    * whose aux and main state commits were the measured ~half of every
    * refresh when run strictly in sequence): this stages everything up to
    * — and including — the staging write and sidecar computation, the
    * expensive DATA half, WITHOUT committing. A coordinator can therefore
    * stage several tables' batches CONCURRENTLY (independent Spark jobs,
    * independent table roots) and then [[commitStagedScd1]] them in its
    * required order with only metadata work (rename + manifest + flip)
    * between the pointer flips.
    *
    * Crash semantics are unchanged by construction: a staged batch is a
    * randomly-named `_staging_*` dir no manifest references — invisible
    * to every reader and reaped by vacuum — so this API changes WHEN the
    * data bytes are written, never when they become visible. The caller's
    * commit ORDER (the MV's aux-strictly-before-main rule that the
    * aux-ahead replay pinning proves) is exactly the order of its
    * commitStagedScd1 calls.
    *
    * Returns None when there is nothing to do (empty update batch, or the
    * exactly-once ledger already records `txn` — same no-ops as
    * [[scd1Merge]]). */
  private[graft] def stageScd1Merge(spark: SparkSession, updates: DataFrame,
      seqCol: String, applyAsDeletes: Option[Column] = None,
      txn: Option[(String, Long)] = None)
      : Option[BucketedSnapshotTable.StagedScd1] = {
    val v0 = currentVersion(spark).getOrElse(0)
    if (txnApplied(spark, v0, txn)) return None
    val upd = updates.withColumn(BucketCol, bucketExpr)
    val updBuckets = upd.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSet
    if (updBuckets.isEmpty) return None
    val m0 = if (v0 == 0) Map.empty[Int, BucketEntry] else readEntries(spark, v0)
    // read the affected buckets AT v0 — the same manifest the rebase check
    // compares against, so read state ≡ rebase base by construction
    val merged = ScdMerge.scd1Upsert(
      fromManifest(spark, m0.map { case (b, e) => b -> e.dir }, Some(updBuckets)),
      upd, keys, seqCol, Nil, applyAsDeletes)
    val (staging, effBloomC, stagedStats, stagedSchema) =
      stageBatch(spark, merged, v0)
    Some(BucketedSnapshotTable.StagedScd1(staging, updBuckets, v0, m0,
      effBloomC, stagedStats, updates, seqCol, applyAsDeletes, txn,
      stagedSchema))
  }

  /** Commit a [[stageScd1Merge]] batch. The metadata-sized happy path; a
    * staged batch that lost the commit race unrebasably (another writer
    * moved one of its buckets — cannot happen under a coordinator that
    * serializes refreshes, kept for safety) falls back to the standard
    * re-staging merge loop. Returns the buckets rewritten. */
  private[graft] def commitStagedScd1(spark: SparkSession,
      h: BucketedSnapshotTable.StagedScd1): Set[Int] =
    lockedCommit(spark, h.staging, h.affected, h.v0, h.m0,
      wholeTableRead = false, h.txn, h.effBloomC, h.stagedStats,
      h.stagedSchema) match {
      case Some(replayed) => if (replayed) Set.empty else h.affected
      case None =>
        scd1Merge(spark, h.updates, h.seqCol, Nil, h.applyAsDeletes, h.txn)
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
  private def batchBloomPath(batchDir: String) = new Path(s"$root/$batchDir", "_bloom")

  /** Build the per-batch Bloom sidecar directory for a freshly staged (or
    * analyzed) snapshot — one extra distributed pass over the immutable
    * files; filter bytes never aggregate at the driver (see
    * [[BloomIndex.write]]). Columns a pre-evolution batch lacks are
    * skipped (their absent entries keep files — superset guarantee). */
  private def writeBloom(spark: SparkSession, snap: DataFrame, dir: String,
      cols: Seq[String] = bloomCols): Unit = {
    val present = cols.filter(snap.columns.contains)
    if (present.nonEmpty)
      BloomIndex.write(snap, present, BucketedSnapshotTable.BloomFpp,
        fs(spark), batchBloomPath(dir))
  }

  /** The index columns THIS commit should sidecar its staged batch with:
    * the writer's own statsCols/bloomCols when constructed with any, else
    * the columns the manifest header RECORDS (what ANALYZE declared) —
    * indexed columns are table metadata, so a maintenance writer or a
    * default-routed merge constructed without them must keep the index
    * FRESH per commit (O(staged batch)) instead of leaving recent batch
    * dirs unindexed until the next hand-run ANALYZE (the r11 soak's
    * stale-dim-leg cost). */
  private def effectiveIndexCols(spark: SparkSession, v: Int): (Seq[String], Seq[String]) = {
    val (hs, hb) =
      if (v < 1 || (statsCols.nonEmpty && bloomCols.nonEmpty)) (Nil, Nil)
      else try {
        val h = headerOf(spark, v)
        def csv(k: String) = h.get(k).toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        (csv("statsCols"), csv("bloomCols"))
      } catch { case _: java.io.IOException => (Nil, Nil) }
    // per-KIND fallback, mirroring writeManifest's header inheritance: a
    // stats-only writer must still bloom-index its batch when the header
    // records bloom columns, and vice versa
    (if (statsCols.nonEmpty) statsCols else hs,
      if (bloomCols.nonEmpty) bloomCols else hb)
  }

  /** Re-point a staged `_bloom/_MANIFEST`'s file paths at the renamed
    * batch dir (the sidecar blobs themselves are path-agnostic — only the
    * manifest's data-file paths matter to the probe), optionally dropping
    * entries outside `keptDirs` (compaction's moved-bucket filter). The
    * `cols=` header line carries through untouched. */
  private def repointBloom(f: org.apache.hadoop.fs.FileSystem, batchDir: String,
      staging: String, keptDirs: Option[Set[String]]): Unit = {
    val mPath = new Path(batchBloomPath(batchDir), "_MANIFEST")
    StatsManifest.readLines(f, mPath).foreach { ls =>
      val out = ls.map(_.replace(s"/$staging/", s"/$batchDir/")).filter { l =>
        !l.contains("\t") || keptDirs.forall(ds => ds.exists(l.contains))
      }
      StatsManifest.writeLines(f, mPath, out)
    }
  }

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
    else unionEvolvingParts(parts).drop(BucketCol)
  }

  /** Bloom-pruned point read on a NON-key column: live buckets only, and
    * within them only the files whose per-batch Bloom filter might contain
    * the key — the read-side complement of the bloom-pruned DML discovery
    * (the bucket layout itself only prunes lookups on the bucket KEYS;
    * this serves `WHERE order_id = k` on a table bucketed by customer).
    * Superset guarantee — apply the row filter after; batches without a
    * bloom sidecar keep all their files. Integral values probe long-hashed
    * filters, strings string-hashed ones. */
  def readPrunedPoint(spark: SparkSession, column: String, value: Any): DataFrame =
    readPrunedPoints(spark, column, Seq(value))

  /** IN-list form of [[readPrunedPoint]]: a file is kept when its filter
    * might contain ANY of the values. */
  def readPrunedPoints(spark: SparkSession, column: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readPrunedPoints needs at least one value")
    val m = manifest(spark)
    if (m.isEmpty) throw new IllegalStateException(s"BucketedSnapshotTable $root is empty")
    val f = fs(spark)
    def norm(p: String) = new Path(p).toUri.getPath
    val longs = values.collect { case l: Long => l; case i: Int => i.toLong }.toSet
    val strs = values.collect { case s: String => s }.toSet
    val dbls = values.collect { case d: Double => d; case fl: Float => fl.toDouble }.toSet
    require(longs.size + strs.size + dbls.size == values.distinct.size,
      s"readPrunedPoints probes long/double/string-hashed filters; got " +
        values.map(_.getClass.getSimpleName).distinct.mkString(","))
    val parts = m.groupBy(_._2).flatMap { case (dir, entries) =>
      val liveBucketDirs = entries.keys.toSeq.sorted.map(b => s"$root/$dir/$BucketCol=$b")
      val picked = BloomIndex.filesMightContainAny(
          f, batchBloomPath(dir), column, longs, strs, dbls) match {
        case None => liveBucketDirs // no index for this batch → keep all
        case Some(files) =>
          val liveDirs = liveBucketDirs.map(d => norm(d) + "/")
          files.filter(p => liveDirs.exists(norm(p).startsWith)).sorted
      }
      if (picked.isEmpty) None
      else Some(spark.read.option("basePath", s"$root/$dir").parquet(picked: _*))
    }.toSeq
    if (parts.isEmpty) read(spark).limit(0) // schema-preserving empty relation
    else unionEvolvingParts(parts).drop(BucketCol)
  }

  /** Pruning-aware read — the general SNAPSHOT relation: a plain parquet
    * scan whose FILE LISTING goes through [[PruningFileIndex]], so ANY
    * predicate Catalyst pushes into the scan (a later `.filter`, a SQL
    * WHERE over `SNAPSHOT '<root>'`, a join's pushed equality) prunes the
    * scheduled files through the per-batch stats AND Bloom sidecars at
    * planning time — the read-side twin of the predicate-DML pre-filter,
    * with no dedicated `readPruned*` call required. Superset guarantee
    * throughout: the row filter still runs on the survivors.
    *
    * Falls back to the union-cast read when batch dirs disagree on a
    * column's TYPE (such evolved tables need per-dir casts a
    * single-schema parquet relation cannot express; add/drop-column
    * evolution stays on the fast path — missing columns null-fill in the
    * reader). `version` = time travel over that manifest. */
  def readIndexed(spark: SparkSession, version: Option[Int] = None): DataFrame = {
    val f = fs(spark)
    version.foreach { x =>
      if (!f.exists(new Path(root, s"_manifest_v$x")))
        throw new IllegalArgumentException(
          s"BucketedSnapshotTable $root: version $x does not exist")
    }
    val v = version.orElse(currentVersion(spark)).getOrElse(
      throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
    val entries = readEntries(spark, v)
    entries.values.map(_.dir).toSet.foreach { (dir: String) =>
      if (!f.exists(new Path(s"$root/$dir")))
        throw new IllegalArgumentException(
          s"BucketedSnapshotTable $root: version $v was vacuumed (missing $dir)")
    }
    def fallback = version.map(readVersion(spark, _)).getOrElse(read(spark))
    if (entries.isEmpty) return fallback // uniform empty-table errors
    val byDir = liveFilesByDir(spark, v, entries)
    // per-dir FILE schemas: from the manifest header when recorded at
    // commit (r14 — zero footer IO at planning), else one footer probe
    // per legacy dir (instrumented; superset of the old behavior)
    val recorded: Map[String, org.apache.spark.sql.types.StructType] =
      headerOf(spark, v).collect {
        case (k, ddl) if k.startsWith("schema:") =>
          k.stripPrefix("schema:") -> BucketedSnapshotTable.parseSchemaDdl(ddl)
      }
    val withSchemas: Seq[(String, Seq[org.apache.hadoop.fs.FileStatus],
        org.apache.spark.sql.types.StructType)] =
      byDir.collect { case (dir, fls) if fls.nonEmpty =>
        (dir, fls, recorded.getOrElse(dir, {
          BucketedSnapshotTable.schemaProbes.incrementAndGet()
          spark.read.parquet(fls.head.getPath.toString).schema
        }))
      }
    if (withSchemas.isEmpty) return fallback // no listable data files
    PruningFileIndex.unionSchemaOf(withSchemas.map(_._3)) match {
      case Some(schema) =>
        PruningFileIndex.relation(spark, withSchemas.flatMap(_._2), schema,
          keepFor(f, byDir, Some(schema)))
      case None =>
        // TYPE-EVOLVED table (a column's type widened between batch dirs):
        // one pruning relation PER TYPE-GROUP of dirs instead of giving up
        // — each group keeps planning-time stats/Bloom/bucket-key file
        // skipping, and the groups union to the name-union schema with
        // exactly the fallback read's semantics (oldest dir's type wins
        // per column, absent columns null-fill; byDir is oldest-first, so
        // group order preserves it). Pre-r13 this fell back to an
        // InMemoryFileIndex over EVERY live file: the 100× soak's MV
        // dim-trickle legs paid an O(files) listing + full fact scan for
        // a fixture whose sequence column was int in old batches and
        // long in new ones.
        import org.apache.spark.sql.types.{DataType, StructField, StructType}
        val groups = scala.collection.mutable.ArrayBuffer.empty[(
          scala.collection.mutable.LinkedHashMap[String, DataType],
          scala.collection.mutable.ArrayBuffer[(String, Seq[org.apache.hadoop.fs.FileStatus])])]
        withSchemas.foreach { case (dir, fls, s) =>
          groups.find { case (acc, _) =>
            s.forall(f2 => acc.get(f2.name).forall(_ == f2.dataType))
          } match {
            case Some((acc, ds)) =>
              s.foreach(f2 =>
                if (!acc.contains(f2.name)) acc(f2.name) = f2.dataType)
              ds += ((dir, fls))
            case None =>
              val acc = scala.collection.mutable.LinkedHashMap
                .empty[String, DataType]
              s.foreach(f2 => acc(f2.name) = f2.dataType)
              groups += ((acc,
                scala.collection.mutable.ArrayBuffer((dir, fls))))
          }
        }
        val parts = groups.toSeq.map { case (acc, ds) =>
          val gSchema = StructType(acc.toSeq.map { case (n, dt) =>
            StructField(n, dt, nullable = true) })
          val gByDir = ds.toSeq
          PruningFileIndex.relation(spark, gByDir.flatMap(_._2), gSchema,
            keepFor(f, gByDir, Some(gSchema)))
        }
        if (parts.isEmpty) fallback else unionEvolvingParts(parts)
    }
  }

  /** (dir, its live buckets' data files) for a manifest's entries, oldest
    * batch first (stable first-seen column types, like the union read).
    * MEMOIZED per (root, version, manifest mtime): the listed file set is
    * immutable once committed, so a hot table's repeated planning pays
    * one listing per commit, not one per call. */
  private def liveFilesByDir(spark: SparkSession, v: Int,
      entries: Map[Int, BucketEntry])
      : Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])] = {
    val f = fs(spark)
    val mtime =
      try f.getFileStatus(new Path(root, s"_manifest_v$v")).getModificationTime
      catch { case _: java.io.IOException => -1L }
    BucketedSnapshotTable.cachedListing((root, v, mtime), () =>
      entries.groupBy(_._2.dir).toSeq
        .sortBy { case (dir, _) => dir.stripPrefix("_batch_v").toIntOption.getOrElse(0) }
        .map { case (dir, es) =>
          dir -> es.keys.toSeq.sorted.flatMap { b =>
            val p = new Path(s"$root/$dir/$BucketCol=$b")
            BucketedSnapshotTable.listingCalls.incrementAndGet()
            if (!f.exists(p)) Nil
            else f.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
          }
        })
  }

  /** The [[PruningFileIndex]] keep-callback over this table's per-batch
    * sidecars AND the bucket layout itself: extract constraints once per
    * planning call, build one dir-level keep predicate per batch dir
    * ([[PruningFileIndex.dirKeep]]), and — when every bucket KEY carries a
    * point constraint — keep only the files of the hash-candidate buckets
    * ([[keyBuckets]]: pure metadata, the read-side SQL twin of
    * [[readKeys]]' O(1/numBuckets) lookup). No extracted constraints (or
    * an unknown file) → keep everything. */
  private def keepFor(f: org.apache.hadoop.fs.FileSystem,
      byDir: Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      (preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : String => Boolean = {
    val (nB, sB, pS) = BucketedSnapshotTable.extractBounds(
      preds.reduce(org.apache.spark.sql.catalyst.expressions.And))
    if (nB.isEmpty && sB.isEmpty && pS.isEmpty) (_: String) => true
    else {
      val perDir: Map[String, Option[String => Boolean]] = byDir.map { case (dir, _) =>
        dir -> PruningFileIndex.dirKeep(f,
          StatsManifest.readLines(f, batchStatsPath(dir)), batchBloomPath(dir),
          nB, sB, pS)
      }.toMap
      val fileDir: Map[String, String] = byDir.flatMap { case (dir, fls) =>
        fls.map(st => st.getPath.toUri.getPath -> dir)
      }.toMap
      val wantedBuckets: Option[Set[Int]] =
        schema.flatMap(sc => keyBuckets(sc, pS))
      val fileBucket: Map[String, Int] = byDir.flatMap { case (_, fls) =>
        fls.flatMap { st =>
          val p = st.getPath.toUri.getPath
          s"$BucketCol=(\\d+)/".r.findFirstMatchIn(p)
            .map(m => p -> m.group(1).toInt)
        }
      }.toMap
      (p: String) => {
        val bucketPass = wantedBuckets.forall(bs =>
          fileBucket.get(p).forall(bs.contains))
        bucketPass && (fileDir.get(p) match {
          case None      => true
          case Some(dir) => perDir(dir).forall(_(p))
        })
      }
    }
  }

  /** Candidate bucket ids when EVERY bucket key carries a point
    * constraint: the driver-side replay of [[bucketExpr]]'s Murmur3 hash
    * over the literal tuples (cross product of the per-key value sets — a
    * superset of the true tuples, so the bucket set is a superset of the
    * buckets matching rows can live in). Values convert to each key
    * column's STORED type with the same coercion-soundness rules the
    * Bloom probe uses: a value provably unable to equal any stored value
    * contributes nothing; a value whose equality class cannot be
    * enumerated driver-side (fractional-or-huge renderings on an integral
    * key, numeric literals on a string key, exotic key types) makes the
    * whole analysis bail to None — skipping is always a superset
    * guarantee. */
  private def keyBuckets(schema: org.apache.spark.sql.types.StructType,
      pS: Map[String, BucketedSnapshotTable.PointSet]): Option[Set[Int]] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    if (keys.isEmpty) return None
    val perKey: Seq[Seq[(Any, DataType)]] = keys.map { k =>
      val dt = schema.find(_.name == k).map(_.dataType).getOrElse(return None)
      val pts = pS.getOrElse(k, return None)
      dt match {
        case LongType =>
          pts.longInterpretation.getOrElse(return None).toSeq.map(v => (v: Any, dt))
        case IntegerType =>
          pts.longInterpretation.getOrElse(return None).toSeq
            .filter(v => v >= Int.MinValue && v <= Int.MaxValue)
            .map(v => (v.toInt: Any, dt))
        case ShortType =>
          pts.longInterpretation.getOrElse(return None).toSeq
            .filter(v => v >= Short.MinValue && v <= Short.MaxValue)
            .map(v => (v.toShort: Any, dt))
        case StringType =>
          // sound only when the string set alone is complete: a numeric
          // literal matches every string RENDERING that casts to it
          // ('05' = 5), which no finite probe set covers
          if (pts.dbls.nonEmpty || pts.longs.nonEmpty) return None
          pts.strs.toSeq.map(v => (v: Any, dt))
        case _ => return None
      }
    }
    if (perKey.exists(_.isEmpty)) return Some(Set.empty) // unsatisfiable
    val tuples = perKey.foldLeft(Seq(Seq.empty[(Any, DataType)])) { (acc, vs) =>
      acc.flatMap(t => vs.map(t :+ _))
    }
    if (tuples.size > 1024) return None // cap the cross-product blowup
    Some(tuples.map { t =>
      val h = Murmur3Hash(t.map { case (v, dt) => Literal.create(v, dt) }, 42)
        .eval(null).asInstanceOf[Int]
      ((h % numBuckets) + numBuckets) % numBuckets
    }.toSet)
  }

  /** Metadata-only (never schedules a scan): of the live version's data
    * files, how many survive read-side skipping under `pred` — the
    * scale-independent pin gate queries `require` on. (kept, total). */
  def pruneStats(spark: SparkSession, pred: Column): (Int, Int) = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
    val entries = readEntries(spark, v)
    val byDir = liveFilesByDir(spark, v, entries)
    val all = byDir.flatMap(_._2).map(_.getPath.toUri.getPath)
    val reps = byDir.flatMap(_._2.headOption).map(_.getPath.toString)
    val schema = PruningFileIndex.unionSchema(spark, reps)
    val k = keepFor(fs(spark), byDir, schema)(Seq(
      org.apache.spark.sql.GraftColumnBridge.catalystExpression(pred)))
    (all.count(k), all.size)
  }

  /** ANALYZE: backfill per-batch file stats for THIS instance's
    * `statsCols` over every batch dir the live manifest reaches, then
    * commit a metadata-only version whose header records the stats
    * columns — after which [[readPruned]] and the predicate-DML stats
    * pre-filter work on data written before stats existed (or with a
    * different column set). One column-pruned scan per batch dir, no data
    * rewrite: the batch dirs are immutable, only their `_stats` sidecars
    * and the manifest header change. Returns the committed version. */
  def analyze(spark: SparkSession, onlyMissing: Boolean = false): Int = {
    require(statsCols.nonEmpty || bloomCols.nonEmpty,
      s"BucketedSnapshotTable $root: analyze needs statsCols or bloomCols — " +
        "construct the table (or run ANALYZE … STATS/BLOOM (…)) with the columns to index")
    val f = fs(spark)
    // The O(table) sidecar build runs OUTSIDE the commit lock: batch dirs
    // are immutable, so sidecars computed unlocked can never be stale, and
    // holding the lock for a full backfill would block every writer for
    // the ANALYZE duration (and invite a stale-lock steal that wastes the
    // whole run) — the locked critical section stays metadata-sized, the
    // invariant every other commit path here keeps.
    val cur0 = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"BucketedSnapshotTable $root is empty"))
    val entries0 = readEntries(spark, cur0)
    buildSidecars(spark, entries0, skipCovered = onlyMissing)
    // maintenance-time probe-IO consolidation: per-file bloom sidecars
    // collapse into one offset-indexed blob per batch dir, so a point
    // probe costs O(dirs) reads instead of O(files); still unlocked —
    // dirs are immutable and the swap is rename-atomic (no-op when
    // already consolidated, so INCREMENTAL re-ANALYZE stays O(new))
    if (bloomCols.nonEmpty)
      entries0.values.map(_.dir).toSet.foreach { (dir: String) =>
        BloomIndex.consolidate(f, batchBloomPath(dir))
      }
    onStep("analyze_built")
    CommitLock.withLockHandle(f, root, commitStaleMs) { lockH =>
      // re-read under the lock: commits that raced the unlocked build keep
      // their (newer) entries; their dirs simply lack sidecars until the
      // next ANALYZE … INCREMENTAL — absent sidecars keep all files, the
      // standing superset guarantee.
      val cur = currentVersion(spark).getOrElse(cur0)
      val entries = readEntries(spark, cur)
      lockH.check()
      // metadata-only commit: same entries, same contentV (no content
      // changed — the CDF must not re-read anything), header now carries
      // statsCols so path-only consumers (SQL DML routing) see them
      writeManifest(spark, cur + 1, entries, txnsOf(spark, cur))
      cur + 1
    }
  }

  /** The ANALYZE work-horse: per batch dir of `entries`, scan its LIVE
    * buckets explicitly (`__bucket=…` children are underscore-prefixed —
    * hidden from a directory-level read) and (re)write the `_stats` /
    * `_bloom` sidecars. `skipCovered` makes re-ANALYZE O(new batches): a
    * dir whose existing sidecars already cover every requested column is
    * skipped (batch dirs are immutable, so existing stats cannot be
    * stale). Sidecar writes are tmp-then-rename, so concurrent probes on
    * live dirs never see a torn manifest. */
  private def buildSidecars(spark: SparkSession, entries: Map[Int, BucketEntry],
      skipCovered: Boolean): Unit = {
    val f = fs(spark)
    entries.groupBy(_._2.dir).foreach { case (dir, es) =>
      val statsCovered = statsCols.isEmpty || (skipCovered &&
        StatsManifest.readLines(f, batchStatsPath(dir)).exists { ls =>
          val have = StatsManifest.statsColumns(ls).toSet
          statsCols.forall(have.contains)
        })
      val bloomCovered = bloomCols.isEmpty || (skipCovered &&
        BloomIndex.indexedColumns(f, batchBloomPath(dir)).exists { have =>
          bloomCols.forall(have.toSet.contains)
        })
      if (!(statsCovered && bloomCovered)) {
        val snap = spark.read.option("basePath", s"$root/$dir")
          .parquet(es.keys.toSeq.sorted.map(b => s"$root/$dir/$BucketCol=$b"): _*)
        // a batch written before a schema evolution may lack a stats
        // column — record the ones it has (missing entries keep files,
        // superset guarantee)
        if (!statsCovered) {
          val present = statsCols.filter(snap.columns.contains)
          if (present.nonEmpty)
            StatsManifest.write(snap, present, f, batchStatsPath(dir))
        }
        if (!bloomCovered) writeBloom(spark, snap, dir)
      }
    }
  }

  /** Rewrite every bucket into the same batch dir (small-file compaction
    * after many incremental merges). Bucket layout is preserved, so
    * subsequent merges still prune.
    *
    * MAINTENANCE NEVER BLOCKS INGESTION: compaction is content-preserving
    * per bucket, so a merge landing while the compaction job ran does not
    * abort it — inside the commit lock, buckets whose manifest entry
    * MOVED since the compaction read simply keep the merge's (newer)
    * entry and their stale compacted output is dropped; only unmoved
    * buckets re-point at the compacted dir. The commit is always
    * consistent: every bucket shows either its compacted bytes (equal
    * content) or the newer merge's bytes. Returns the committed version. */
  def compact(spark: SparkSession, clusterBy: Seq[String] = Nil): Int = {
    val f = fs(spark)
    val v0 = currentVersion(spark).getOrElse(0)
    val m0 = if (v0 == 0) Map.empty[Int, BucketEntry] else readEntries(spark, v0)
    var committed = v0
    readBuckets(spark, None).foreach { df =>
      val staging = s"_staging_${java.util.UUID.randomUUID().toString.take(12)}"
      // clusterBy: sort WITHIN each bucket's file so parquet row-group
      // min/max become selective on those columns (the bucket layout is
      // the file-level index; this is the row-group-level one)
      val shaped = df.repartition(col(BucketCol))
      (if (clusterBy.isEmpty) shaped
       else shaped.sortWithinPartitions(
         (BucketCol +: clusterBy).map(col): _*))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(s"$root/$staging")
      val stagedHasData = f.listStatus(new Path(s"$root/$staging"))
        .exists(_.getPath.getName.startsWith(s"$BucketCol="))
      val (effStatsC, effBloomC) = effectiveIndexCols(spark, v0)
      val stagedStats: Seq[String] =
        if (effStatsC.isEmpty || !stagedHasData) Nil
        else StatsManifest.lines(spark.read.parquet(s"$root/$staging"), effStatsC)
      if (effBloomC.nonEmpty && stagedHasData)
        writeBloom(spark, spark.read.parquet(s"$root/$staging"), staging, effBloomC)
      onStep("compact_staged")
      CommitLock.withLockHandle(f, root, commitStaleMs) { lockH =>
        val cur = currentVersion(spark).getOrElse(0)
        val mCur = if (cur == v0) m0 else readEntries(spark, cur)
        val next = cur + 1
        val batchDir = s"_batch_v$next"
        val batchPath = new Path(s"$root/$batchDir")
        if (f.exists(batchPath)) f.delete(batchPath, true) // crashed writer's orphan
        if (!f.rename(new Path(s"$root/$staging"), batchPath))
          throw new IllegalStateException(s"BucketedSnapshotTable $root: staging rename failed")
        // entries moved by intervening merges win; their compacted output
        // is stale — drop it (not yet referenced, safe under the lock).
        // A bucket DELETED since the read (entry gone) stays deleted.
        val unmoved = m0.keySet.filter(b => mCur.get(b) == m0.get(b))
        m0.keySet.diff(unmoved).foreach { b =>
          f.delete(new Path(batchPath, s"$BucketCol=$b"), true)
        }
        if (stagedStats.nonEmpty) {
          val keptDirs = unmoved.map(b => s"/$batchDir/$BucketCol=$b/")
          StatsManifest.writeLines(f, batchStatsPath(batchDir),
            stagedStats.map(_.replace(s"/$staging/", s"/$batchDir/"))
              .filter(l => keptDirs.exists(l.contains)))
        }
        if (effBloomC.nonEmpty)
          repointBloom(f, batchDir, staging,
            Some(unmoved.map(b => s"/$batchDir/$BucketCol=$b/")))
        lockH.check() // paused-holder guard: abort rather than double-flip
        // compaction is content-preserving: re-pointed buckets KEEP their
        // contentV, so a change-feed window spanning this commit still
        // prunes them as unchanged
        writeManifest(spark, next,
          mCur ++ unmoved.filter(mCur.contains)
            .map(b => b -> BucketEntry(batchDir, mCur(b).contentV)).toMap,
          txnsOf(spark, cur), // the exactly-once ledger survives maintenance
          // compacted files carry the UNION schema (the union read casts
          // to first-seen types before the rewrite)
          Map(batchDir -> BucketedSnapshotTable.schemaDdl(df.schema, BucketCol)))
        committed = next
      }
      // post-commit, outside the lock: the new batch dir is immutable now —
      // collapse its per-file bloom sidecars into the O(1)-probe blob
      if (effBloomC.nonEmpty)
        BloomIndex.consolidate(f, batchBloomPath(s"_batch_v$committed"))
    }
    committed
  }

  /** Delete batch dirs unreachable from the newest `keepVersions`
    * manifests (retention window for [[readVersion]] time travel: KEEP 1
    * = live only, KEEP n keeps the last n versions readable). Manifests
    * themselves persist (metadata-sized) — a reaped version raises the
    * "was vacuumed" travel error. Also clears `_staging_*` orphans from
    * crashed writers — do not run vacuum concurrently with active writers
    * (the standard vacuum contract). */
  def vacuum(spark: SparkSession, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "vacuum must keep at least the live version")
    val f = fs(spark)
    val liveV = currentVersion(spark).getOrElse(return)
    val retained = f.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.matches("_manifest_v\\d+"))
      .map(_.stripPrefix("_manifest_v").toInt)
      .filter(_ <= liveV).sorted.takeRight(keepVersions)
    val reachable = retained.flatMap(v => readManifest(spark, v).values).toSet
    val it = f.listStatus(new Path(root)).iterator
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if ((name.startsWith("_batch_v") && !reachable.contains(name)) ||
          name.startsWith("_staging_"))
        f.delete(st.getPath, true)
    }
    // reaped batch dirs make cached listings for old versions stale — drop
    // them (the unreadable-version guard in readIndexed already rejects
    // vacuumed versions, this keeps the cache from pinning FileStatus
    // objects of deleted files)
    BucketedSnapshotTable.invalidateListings(root)
  }
}

object BucketedSnapshotTable {

  /** A schema's compact DDL for the manifest header, `partitionCol`
    * (the internal bucket column) excluded and nullability normalized to
    * true — planning compares dataTypes only, and the union reads treat
    * every column nullable anyway. */
  private[tables] def schemaDdl(schema: org.apache.spark.sql.types.StructType,
      partitionCol: String): String =
    org.apache.spark.sql.types.StructType(
      schema.fields.toSeq.filterNot(_.name == partitionCol)
        .map(f => org.apache.spark.sql.types.StructField(
          f.name, f.dataType, nullable = true))).toDDL

  private[tables] def parseSchemaDdl(ddl: String)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(ddl)

  /** Driver-side memo of a committed version's live-file listing, keyed
    * (root, version, manifest mtime): a version's file set is immutable
    * once committed, so repeated planning over a hot table costs ONE
    * listing per commit instead of one per planning call (the r13 soak's
    * suspected O(dirs) planning term on many-dir tables). The mtime key
    * self-invalidates if a crashed writer's orphan manifest is rewritten
    * under the same number; VACUUM invalidates its root explicitly. */
  private val listingCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Long), Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])]]()

  /** Instrumentation: FS directory LISTINGS performed by [[liveFilesByDir]]
    * cache misses (spec-pinned: a second planning of the same version
    * performs zero). */
  private[tables] val listingCalls = new java.util.concurrent.atomic.AtomicLong

  /** Instrumentation: parquet FOOTER schema probes performed by
    * [[readIndexed]] for dirs whose manifest lacks a recorded schema
    * (spec-pinned: zero for tables written since schemas were recorded). */
  private[tables] val schemaProbes = new java.util.concurrent.atomic.AtomicLong

  private[tables] def cachedListing(key: (String, Int, Long),
      compute: () => Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])])
      : Seq[(String, Seq[org.apache.hadoop.fs.FileStatus])] = {
    val hit = listingCache.get(key)
    if (hit != null) hit
    else {
      val v = compute()
      if (listingCache.size > 256) listingCache.clear() // crude bound; re-warms in one call
      listingCache.put(key, v)
      v
    }
  }

  private[tables] def invalidateListings(root: String): Unit = {
    val it = listingCache.keySet.iterator
    while (it.hasNext) if (it.next()._1 == root) it.remove()
  }

  /** One manifest entry: the batch dir holding the bucket's bytes, plus
    * the commit version at which the bucket's CONTENT last changed.
    * `contentV` survives content-preserving rewrites (compaction moves a
    * bucket to a new dir but carries its contentV), so the change feed can
    * prune "did this bucket change between v_a and v_b?" on metadata even
    * across an OPTIMIZE boundary — dir comparison alone would report every
    * bucket moved. Manifests written before contentV existed (2-field
    * lines) fall back to the dir's own batch version, which is always ≥
    * the true content version — a conservative over-approximation that
    * reads more buckets, never misses a change. */
  private[tables] final case class BucketEntry(dir: String, contentV: Int)

  /** A fully staged (but uncommitted) SCD1 merge — the handle between the
    * two-phase [[BucketedSnapshotTable.stageScd1Merge]] (data half) and
    * [[BucketedSnapshotTable.commitStagedScd1]] (locked metadata half).
    * Carries the original merge inputs so a lost commit race can fall
    * back to the standard re-staging loop. */
  private[graft] final case class StagedScd1(
      private[tables] val staging: String,
      private[tables] val affected: Set[Int],
      private[tables] val v0: Int,
      private[tables] val m0: Map[Int, BucketEntry],
      private[tables] val effBloomC: Seq[String],
      private[tables] val stagedStats: Seq[String],
      private[tables] val updates: org.apache.spark.sql.DataFrame,
      private[tables] val seqCol: String,
      private[tables] val applyAsDeletes: Option[org.apache.spark.sql.Column],
      private[tables] val txn: Option[(String, Long)],
      private[tables] val stagedSchema: Option[String] = None)

  /** Did a bucket's CONTENT change between two manifest entries? Normally
    * a contentV comparison, with one guard: the legacy 2-field-manifest
    * fallback maps any batch dir whose name does not parse as
    * `_batch_v<N>` to the Int.MaxValue sentinel — two DIFFERENT
    * unparseable dirs would then compare equal and silently drop a
    * changed bucket from the feed. When either side carries the sentinel,
    * the dir string itself must also match (same dir = same immutable
    * bytes — still a sound "unchanged"; different dirs = conservative
    * over-read, the behavior the fallback promises). */
  private[tables] def contentDiffers(a: Option[BucketEntry],
      b: Option[BucketEntry]): Boolean = (a, b) match {
    case (Some(x), Some(y)) if x.contentV == Int.MaxValue || y.contentV == Int.MaxValue =>
      x.contentV != y.contentV || x.dir != y.dir
    case (x, y) => x.map(_.contentV) != y.map(_.contentV)
  }

  /** False-positive probability for per-batch Bloom sidecars: at 1% a
    * point probe over N files schedules ~1 + N/100 scan tasks; sidecar
    * size stays ~1.2 KB per 1k distinct keys per file. */
  val BloomFpp = 0.01

  /** A `column ∈ {values}` point constraint extracted from a predicate —
    * each literal recorded under its OWN kind (provenance preserved, so a
    * numeric-shaped string still prunes string-hashed filters); integral
    * values probe the long-hashed filters, strings the string-hashed
    * ones, doubles (and decimals, via their double rendering) the
    * canonical-bits-hashed "d" kind. Probes convert per filter kind with
    * coercion-aware rules, and a value that cannot be soundly evaluated
    * against a kind keeps the file (see
    * [[BloomIndex.filesMightContainAny]]). */
  private[graft] final case class PointSet(longs: Set[Long], strs: Set[String],
      dbls: Set[Double] = Set.empty) {

    /** The values of this set interpreted as the LONGS they could
      * SQL-equal under coercion, when that set is enumerable: raw longs,
      * exact small integral doubles, integer-shaped strings, and numeric
      * strings whose parsed value is an exact small integral; a
      * non-numeric string or non-integral double can equal no long and
      * contributes nothing. None when some value's long-equality class
      * cannot be enumerated (an integral magnitude at or past 2^53, where
      * several longs share one double rendering). Feeds the conjunction
      * algebra and the bucket-key hash replay. */
    def longInterpretation: Option[Set[Long]] = {
      val MaxExact = 1L << 53
      def fromD(v: Double): Option[Option[Long]] = // outer None = bail
        if (v.isNaN || v.isInfinite || v != math.rint(v)) Some(None)
        else if (math.abs(v) >= MaxExact) None
        else Some(Some(v.toLong))
      val viaD = dbls.toSeq.map(fromD)
      val viaS = strs.toSeq.map { s =>
        BucketedSnapshotTable.integerLiteral(s) match {
          case Some(l) => (Some(Some(l)): Option[Option[Long]])
          case None =>
            try fromD(java.lang.Double.parseDouble(s.trim))
            catch { case _: NumberFormatException => Some(None) }
        }
      }
      if ((viaD ++ viaS).contains(None)) None
      else Some(longs ++ (viaD ++ viaS).flatten.flatten)
    }
  }

  /** A string that is exactly an (optionally signed) integer in Long
    * range — the only strings whose long-kind coercion target is known
    * driver-side. Anything else ('1.0', '1e0', non-numeric) stays
    * string-kind only; the probe keeps such files (superset). */
  private[graft] def integerLiteral(s: String): Option[Long] = {
    val t = s.trim
    if (t.nonEmpty && t.matches("[+-]?\\d+")) t.toLongOption else None
  }

  private type NumB = Map[String, (Double, Double)]
  private type StrB = Map[String, (Option[String], Option[String])]
  private type PtB  = Map[String, PointSet]

  /** Conservative data-skipping constraints extracted from a predicate's
    * Catalyst expression tree: per-column numeric [lo,hi] bounds, string
    * prefix bounds, and point-equality sets — the one driver-side analysis
    * feeding BOTH the predicate-DML discovery pre-filter and the
    * read-side pruning file index. Handles the typed comparison nodes
    * (SQL text / analyzed plans: AttributeReference + foldable literals)
    * and the Column-DSL `UnresolvedFunction` encoding. Anything it cannot
    * prove contributes nothing — skipping is always a superset
    * guarantee. */
  private[graft] def extractBounds(
      e: org.apache.spark.sql.catalyst.expressions.Expression): (NumB, StrB, PtB) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      case _ => None
    }
    def folded(e0: Expression): Option[Any] = {
      val e = e0 match {
        // a Cast(literal, timestamp/date) from the Column API carries no
        // timezone yet (the analyzer normally injects it) — stamp the
        // session zone so the literal folds, matching what analysis does
        case c: Cast if !c.resolved && c.childrenResolved =>
          c.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        case x => x
      }
      // ANSI mode makes a malformed foldable cast THROW on eval (the query
      // itself will raise the same error at constant folding, before any
      // scan) — bounds extraction must stay total and just learn nothing
      if (e.resolved && e.foldable)
        try Option(e.eval(null)) catch { case _: Exception => None }
      else None
    }
    def litD(e: Expression): Option[Double] = folded(e).collect {
      case n: Number => n.doubleValue
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    }
    def litS(e: Expression): Option[String] = folded(e).collect {
      case s: String => s
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    }
    def litL(e: Expression): Option[Long] = folded(e).collect {
      case b: Byte  => b.toLong
      case s: Short => s.toLong
      case i: Int   => i.toLong
      case l: Long  => l
    }
    // fractional literals for the "d" bloom kind: doubles as-is, floats by
    // exact widening, decimals via their double rendering (the same
    // conversion the index build applies to the column, so a stored value
    // equal to the literal always hashes to the same canonical bits)
    def litDbl(e: Expression): Option[Double] = folded(e).collect {
      case d: Double => d
      case f: Float  => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    }
    import BucketedSnapshotTable.PointSet
    val NegInf = Double.NegativeInfinity
    val PosInf = Double.PositiveInfinity
    def mergeN(a: NumB, b: NumB): NumB =
      (a.keySet ++ b.keySet).map { c =>
        val (alo, ahi) = a.getOrElse(c, (NegInf, PosInf))
        val (blo, bhi) = b.getOrElse(c, (NegInf, PosInf))
        c -> (math.max(alo, blo), math.min(ahi, bhi))
      }.toMap
    def mergeS(a: StrB, b: StrB): StrB =
      (a.keySet ++ b.keySet).map { c =>
        val (alo, ahi) = a.getOrElse(c, (None, None))
        val (blo, bhi) = b.getOrElse(c, (None, None))
        val lo = (alo.toSeq ++ blo.toSeq).maxOption
        val hi = (ahi.toSeq ++ bhi.toSeq).minOption
        c -> (lo, hi)
      }.toMap
    // AND on point sets: the column must satisfy both constraints →
    // member-wise intersection (two IN-lists conjoin to their overlap; an
    // empty overlap is unsatisfiable and prunes every indexed file).
    // Intersection is only sound WITHIN a hash kind both sides populate:
    // Spark coerces cast-compatible literals of different kinds to the
    // same value (`c = 1 AND c = '1'` holds on an int column), so
    // intersecting a longs-only side against a strs-only side would
    // collapse a satisfiable conjunction to the empty set — safe alone
    // (empty keeps all files) but WRONG under OR, where mergeOr would
    // union the empty set away and claim {other branch} complete. For a
    // kind only one side populates, that side's values carry through
    // verbatim: the column's value must satisfy both constraints, so
    // either side alone is a sound over-approximation.
    def mergeP(a: PtB, b: PtB): PtB =
      (a.keySet ++ b.keySet).map { c =>
        c -> ((a.get(c), b.get(c)) match {
          case (Some(x), Some(y)) => PointSet.and(x, y)
          case (x, y)             => x.orElse(y).get
        })
      }.toMap
    def merge(a: (NumB, StrB, PtB), b: (NumB, StrB, PtB)): (NumB, StrB, PtB) =
      (mergeN(a._1, b._1), mergeS(a._2, b._2), mergeP(a._3, b._3))
    // OR is sound only for columns BOTH branches constrain (a row can
    // satisfy the other branch without touching this column otherwise):
    // ranges take the hull, point sets the union; single-side columns drop
    def mergeOr(a: (NumB, StrB, PtB), b: (NumB, StrB, PtB)): (NumB, StrB, PtB) = {
      val n = (a._1.keySet intersect b._1.keySet).map { c =>
        val (alo, ahi) = a._1(c); val (blo, bhi) = b._1(c)
        c -> (math.min(alo, blo), math.max(ahi, bhi))
      }.toMap
      val s = (a._2.keySet intersect b._2.keySet).map { c =>
        val (alo, ahi) = a._2(c); val (blo, bhi) = b._2(c)
        val lo = for (x <- alo; y <- blo) yield if (x < y) x else y
        val hi = for (x <- ahi; y <- bhi) yield if (x > y) x else y
        c -> (lo, hi)
      }.filter { case (_, (lo, hi)) => lo.isDefined || hi.isDefined }.toMap
      val p = (a._3.keySet intersect b._3.keySet).map { c =>
        val x = a._3(c); val y = b._3(c)
        c -> PointSet(x.longs ++ y.longs, x.strs ++ y.strs, x.dbls ++ y.dbls)
      }.toMap
      (n, s, p)
    }
    val empty: (NumB, StrB, PtB) = (Map.empty, Map.empty, Map.empty)
    def oneN(c: Option[String], v: Option[Double],
        f: Double => (Double, Double)): NumB =
      (for (cc <- c; vv <- v) yield Map(cc -> f(vv))).getOrElse(Map.empty)
    def oneS(c: Option[String], v: Option[String],
        f: String => (Option[String], Option[String])): StrB =
      (for (cc <- c; vv <- v) yield Map(cc -> f(vv))).getOrElse(Map.empty)
    // a single `c ∈ {values}` point constraint: each literal lands in the
    // set of its OWN kind (provenance preserved — a numeric-shaped string
    // stays a string, so an 's'-kind Bloom probe still prunes on it);
    // cross-kind coercion is handled where it is sound to do so: at probe
    // time per filter kind (BloomIndex.mightMatch) and in the conjunction
    // algebra via the enumerable long interpretation (PointSet.and).
    def onePts(c: Option[String], items: Seq[Expression]): PtB =
      c match {
        case Some(cc) if items.nonEmpty =>
          val vs = items.map(e => (litL(e), litS(e), litDbl(e)))
          if (vs.forall { case (l, s, d) => l.isDefined || s.isDefined || d.isDefined })
            Map(cc -> PointSet(vs.flatMap(_._1).toSet, vs.flatMap(_._2).toSet,
              vs.flatMap(_._3).toSet))
          else Map.empty
        case _ => Map.empty
      }
    // two comparison encodings reach us unanalyzed: SQL text parses to the
    // typed nodes (GreaterThanOrEqual, …); the Column DSL converts to
    // UnresolvedFunction("and" | ">=" | …) calls — handle both
    def cmp(name: String, l: Expression, r: Expression): (NumB, StrB, PtB) = name match {
      case "=" | "==" =>
        (oneN(attr(l), litD(r), v => (v, v)) ++ oneN(attr(r), litD(l), v => (v, v)),
         oneS(attr(l), litS(r), v => (Some(v), Some(v))) ++
           oneS(attr(r), litS(l), v => (Some(v), Some(v))),
         (if (attr(l).isDefined) onePts(attr(l), Seq(r)) else Map.empty[String, PointSet]) ++
           (if (attr(r).isDefined) onePts(attr(r), Seq(l)) else Map.empty[String, PointSet]))
      case ">" | ">=" =>
        (oneN(attr(l), litD(r), v => (v, PosInf)) ++ oneN(attr(r), litD(l), v => (NegInf, v)),
         oneS(attr(l), litS(r), v => (Some(v), None)) ++
           oneS(attr(r), litS(l), v => (None, Some(v))),
         Map.empty)
      case "<" | "<=" =>
        (oneN(attr(l), litD(r), v => (NegInf, v)) ++ oneN(attr(r), litD(l), v => (v, PosInf)),
         oneS(attr(l), litS(r), v => (None, Some(v))) ++
           oneS(attr(r), litS(l), v => (Some(v), None)),
         Map.empty)
      case _ => empty
    }
    // IN-list: the column lies in [min(items), max(items)] — usable only
    // when EVERY item folds (a non-literal item could lie anywhere)
    def inB(l: Expression, items: Seq[Expression]): (NumB, StrB, PtB) =
      attr(l) match {
        case None => empty
        case Some(c) =>
          val ds = items.map(litD)
          val ss = items.map(litS)
          (if (items.nonEmpty && ds.forall(_.isDefined))
             Map(c -> ((ds.flatten.min, ds.flatten.max))) else Map.empty[String, (Double, Double)],
           if (items.nonEmpty && ss.forall(_.isDefined))
             Map(c -> ((Some(ss.flatten.min), Some(ss.flatten.max)))) else Map.empty[String, (Option[String], Option[String])],
           onePts(Some(c), items))
      }
    // `col LIKE 'p%'` / startswith(col, 'p'): the column lies in the
    // inclusive prefix range [p, prefixSuccessor(p)] against the string
    // stats — the successor is EXCLUSIVE semantically, so using it as an
    // inclusive hi only ever keeps an extra boundary file (superset). A
    // pattern with any other wildcard/escape contributes nothing.
    def prefixB(l: Expression, p: String): (NumB, StrB, PtB) =
      attr(l) match {
        case Some(c) if p.nonEmpty =>
          (Map.empty, Map(c -> ((Some(p), StatsManifest.prefixSuccessor(p)))), Map.empty)
        case _ => empty
      }
    def likeB(l: Expression, pattern: Expression): (NumB, StrB, PtB) =
      litS(pattern) match {
        case Some(pat) =>
          val i = pat.indexWhere(ch => ch == '%' || ch == '_' || ch == '\\')
          if (i > 0 && pat.substring(i) == "%") prefixB(l, pat.substring(0, i))
          else empty
        case None => empty
      }
    // the optimizer rewrites IN-lists past spark.sql.optimizer.
    // inSetConversionThreshold (default 10) into InSet with INTERNAL
    // values — without this case an 11-key serving lookup would silently
    // lose every pruning path a 10-key one has. Re-literalize and reuse
    // the IN analysis; NULL never equals and drops.
    def inSetB(l: Expression, hset: Set[Any]): (NumB, StrB, PtB) = {
      def external(v: Any): Any = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case d: org.apache.spark.sql.types.Decimal       => d.toJavaBigDecimal
        case x => x
      }
      try inB(l, hset.toSeq.filter(_ != null).map(v => Literal(external(v))))
      catch { case _: RuntimeException => empty } // unliteralizable value kind
    }
    def walk(e: Expression): (NumB, StrB, PtB) = e match {
      case And(l, r)                => merge(walk(l), walk(r))
      case Or(l, r)                 => mergeOr(walk(l), walk(r))
      case EqualTo(l, r)            => cmp("=", l, r)
      case EqualNullSafe(l, r)      => cmp("=", l, r)
      case GreaterThan(l, r)        => cmp(">", l, r)
      case GreaterThanOrEqual(l, r) => cmp(">=", l, r)
      case LessThan(l, r)           => cmp("<", l, r)
      case LessThanOrEqual(l, r)    => cmp("<=", l, r)
      case In(l, items)             => inB(l, items)
      case InSet(l, hset)           => inSetB(l, hset)
      case StartsWith(l, r)         => litS(r).map(prefixB(l, _)).getOrElse(empty)
      case Like(l, r, '\\')         => likeB(l, r)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        (f.nameParts.last.toLowerCase, f.arguments) match {
          case ("and", Seq(l, r))          => merge(walk(l), walk(r))
          case ("or", Seq(l, r))           => mergeOr(walk(l), walk(r))
          case ("in", l +: items)          => inB(l, items)
          case ("startswith", Seq(l, r))   => litS(r).map(prefixB(l, _)).getOrElse(empty)
          case ("like", Seq(l, r))         => likeB(l, r)
          case (n, Seq(l, r))              => cmp(n, l, r)
          case _                           => empty
        }
      case _ => empty
    }
    walk(e)
  }

  private[graft] object PointSet {
    /** Conjunction of two point constraints on the same column. The LONG
      * kind intersects the sides' enumerable long INTERPRETATIONS (raw
      * longs plus every cross-kind literal's long-equality class), so
      * coerce-equal literals of different kinds (`c = 1 AND c = '1'`)
      * conjoin to their true overlap instead of a false "unsatisfiable",
      * while `c IN (1,'2') AND c IN (2,'1')` still tightens to {1,2}; a
      * side whose interpretation is not enumerable falls back to the
      * carry rule (union — either side alone over-approximates). Strings
      * and doubles intersect when both sides populate the kind, else
      * carry (their cross-kind equality classes are not enumerable: '05'
      * = 5 has unbounded renderings). */
    def and(x: PointSet, y: PointSet): PointSet = {
      val longs = (x.longInterpretation, y.longInterpretation) match {
        case (Some(a), Some(b)) => a intersect b
        case _                  => x.longs ++ y.longs
      }
      PointSet(
        longs,
        if (x.strs.nonEmpty && y.strs.nonEmpty) x.strs intersect y.strs
        else x.strs ++ y.strs,
        if (x.dbls.nonEmpty && y.dbls.nonEmpty) x.dbls intersect y.dbls
        else x.dbls ++ y.dbls)
    }
  }

  /** Merge one CDF window (a [[ChangeFeed]]-shaped relation whose changes
    * were derived at source version `toV`) into `target` with the
    * exactly-once ledger stamp — the shared apply step of every
    * `applyChangesTo` (bucketed OR plain source): deletes flow as
    * tombstones, `__cdf_seq` = the source version orders windows. */
  def applyFeed(spark: SparkSession, target: BucketedSnapshotTable,
      feed: DataFrame, toV: Int, consumerId: String): Unit = {
    val upd = feed
      .withColumn(ScdMerge.DeletedCol, col("_change_type") === "delete")
      .drop("_change_type")
      .withColumn("__cdf_seq", lit(toV.toLong))
    target.scd1Merge(spark, upd, "__cdf_seq", Nil,
      applyAsDeletes = Some(col(ScdMerge.DeletedCol)),
      txn = Some((s"cdf:$consumerId", toV.toLong)))
  }

  /** Advance `checkpointFile` to the target ledger's committed progress
    * when the ledger outran it (the consumer crashed after its merge
    * landed but before the checkpoint advanced) — resuming from the stale
    * checkpoint would not just be wasteful but WRONG on an ABA schedule
    * (a key changed in the crashed window and reverted before the retry
    * diffs as unchanged over the stale window). */
  private[tables] def healCheckpoint(f: org.apache.hadoop.fs.FileSystem,
      checkpointFile: String, target: BucketedSnapshotTable,
      consumerId: String): Unit = {
    val spark = SparkSession.active
    val ckPath = new Path(checkpointFile)
    val applied = target.appliedTxn(spark, s"cdf:$consumerId").getOrElse(0L).toInt
    val ckV = MetaIO.readSmall(f, ckPath).map(_.trim.toInt).getOrElse(0)
    if (applied > ckV) {
      val out = f.create(ckPath, true)
      try out.write(applied.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Identity of a bucketed table as recorded in its manifest header:
    * bucket count, bucket keys (absent on pre-r7 manifests that did not
    * record them), and stats columns (absent when the table carries no
    * per-batch stats). */
  final case class Layout(numBuckets: Int, keys: Option[Seq[String]],
      statsCols: Seq[String], bloomCols: Seq[String] = Nil)

  /** Probe `root` for a bucketed-table layout: Some(layout) when the
    * newest `_manifest_v<N>` exists — the path-only table detection the
    * SQL DML router uses. The header is parsed as key=value pairs; a
    * manifest whose `numBuckets` is missing or non-numeric fails with a
    * descriptive error (truncated/corrupt manifest) instead of a bare
    * NumberFormatException. */
  def layoutOf(spark: SparkSession, root: String): Option[Layout] = {
    val p = new Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return None
    val manifests = f.listStatus(p).map(_.getPath.getName)
      .filter(_.matches("_manifest_v\\d+"))
    if (manifests.isEmpty) return None
    val newest = manifests.maxBy(_.stripPrefix("_manifest_v").toInt)
    val in = f.open(new Path(p, newest))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val header = lines.takeWhile(l => l.contains("=") && !l.contains("\t"))
      .map { l => val Array(k, v) = l.split("=", 2); k.trim -> v.trim }.toMap
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val nb = header.get("numBuckets").flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(throw new IllegalStateException(
        s"BucketedSnapshotTable $root: manifest $newest has no parseable " +
          s"numBuckets header (headers: ${header.keys.toSeq.sorted.mkString(",")}) " +
          "— truncated or corrupt manifest"))
    Some(Layout(nb, header.get("keys").map(csv),
      header.get("statsCols").map(csv).getOrElse(Nil),
      header.get("bloomCols").map(csv).getOrElse(Nil)))
  }
}
