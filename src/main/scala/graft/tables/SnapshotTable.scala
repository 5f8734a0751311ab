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
  * Commit protocol: write `_v(N+1)` fully, then flip `_current` via
  * write-temp + rename. Readers resolve the pointer first, so they only
  * ever see complete snapshots. Single-writer by design — the reference is
  * one daily job (spotify_dab.job.yml:7-11); multi-writer would need a
  * lock service, which Delta itself also requires on object stores.
  *
  * Scale note: snapshots are plain parquet dirs, so a 1000-executor read
  * is an ordinary `FileSourceScanExec` with pushdown/pruning; `write` can
  * be partitioned (`partitionByCols`) so downstream key-equi joins prune.
  */
final class SnapshotTable(val root: String) {

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val pointer = new Path(root, "_current")

  def currentVersion(spark: SparkSession): Option[Int] = {
    val f = fs(spark)
    if (!f.exists(pointer)) None
    else {
      val in = f.open(pointer)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  def exists(spark: SparkSession): Boolean = currentVersion(spark).isDefined

  def read(spark: SparkSession): DataFrame = {
    val v = currentVersion(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root has no committed version"))
    applyTombstones(spark, v, spark.read.parquet(s"$root/_v$v"))
  }

  def readOption(spark: SparkSession): Option[DataFrame] =
    currentVersion(spark).map(v =>
      applyTombstones(spark, v, spark.read.parquet(s"$root/_v$v")))

  /** Time travel: read a specific committed version (any snapshot dir not
    * yet vacuumed), minus that version's own tombstones. The live pointer
    * is untouched. */
  def readVersion(spark: SparkSession, version: Int): DataFrame = {
    val f = fs(spark)
    val p = new Path(s"$root/_v$version")
    if (!f.exists(p)) throw new IllegalArgumentException(
      s"SnapshotTable $root: version $version does not exist (vacuumed or never committed)")
    applyTombstones(spark, version, spark.read.parquet(p.toString))
  }

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
      clusterPartitions: Int = 0): Int = {
    val next = currentVersion(spark).getOrElse(0) + 1
    val target = s"$root/_v$next"
    val cols = clusterBy.map(org.apache.spark.sql.functions.col)
    val prepared =
      if (clusterBy.isEmpty) df
      else (if (clusterPartitions > 0) df.repartitionByRange(clusterPartitions, cols: _*)
            else df.repartitionByRange(cols: _*))
        .sortWithinPartitions(cols: _*)
    val writer = prepared.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) writer.partitionBy(partitionByCols: _*) else writer)
      .parquet(target)
    commitPointer(spark, next)
    next
  }

  private def commitPointer(spark: SparkSession, v: Int): Unit = {
    val f = fs(spark)
    val tmp = new Path(root, s"_current.tmp.$v")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(pointer)) f.delete(pointer, false)
    if (!f.rename(tmp, pointer))
      throw new IllegalStateException(s"SnapshotTable $root: pointer flip failed")
  }

  /** Compact the live snapshot into `targetFiles` output files (small-file
    * remediation after many incremental commits) — a new version is
    * committed, so readers are never disturbed and time travel still sees
    * the pre-compaction layout. */
  def compact(spark: SparkSession, targetFiles: Int = 1): Int =
    write(spark, read(spark).repartition(targetFiles))

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
        applyTombstones(spark, v,
          spark.read.option("basePath", s"$root/_v$v").parquet(files: _*))
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
      clusterBy: Seq[String] = Nil, clusterPartitions: Int = 0): Int = {
    val v = write(spark, df, Nil, clusterBy, clusterPartitions)
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

  /** Change data feed between two committed versions (Delta CDF analog,
    * computed on demand from the immutable snapshots rather than logged at
    * write time): one row per changed key with `_change_type` ∈
    * {insert, delete, update} — update rows carry the NEW values, delete
    * rows the old ones. Keyed full-outer join, so the shuffle is on the
    * business key both snapshots are already clustered by in the common
    * case. `null_safe` key equality is not needed: keys are business keys
    * and assumed non-null (same contract as the SCD merges). */
  def changes(spark: SparkSession, keys: Seq[String], fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    // Schema evolution across versions: align both snapshots to the union
    // schema (new version's order first, then old-only columns), null-
    // filling what a version lacks. A column added in `toV` therefore
    // reports prior rows as updates (absent → value) and deletes carry
    // null for it — the accurate derived-CDF reading of an ADD COLUMN.
    val oldS0 = readVersion(spark, fromV)
    val newS0 = readVersion(spark, toV)
    val allCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      newS0.schema.map(f => f.name -> f.dataType) ++
        oldS0.schema.filterNot(f => newS0.columns.contains(f.name))
          .map(f => f.name -> f.dataType)
    def align(df: DataFrame): DataFrame = df.select(allCols.map { case (n, dt) =>
      if (df.columns.contains(n)) col(n) else lit(null).cast(dt).as(n)
    }: _*)
    val oldS = align(oldS0)
    val newS = align(newS0)
    val dataCols = allCols.map(_._1).filterNot(keys.contains)
    val o = oldS.select(oldS.columns.map(c => col(c).as(s"__o_$c")): _*)
    val n = newS.select(newS.columns.map(c => col(c).as(s"__n_$c")): _*)
    val cond = keys.map(k => o(s"__o_$k") === n(s"__n_$k")).reduce(_ && _)
    val changedData =
      if (dataCols.isEmpty) lit(false)
      else dataCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    o.join(n, cond, "full_outer")
      .withColumn("_change_type",
        when(col(s"__o_${keys.head}").isNull, "insert")
          .when(col(s"__n_${keys.head}").isNull, "delete")
          .when(changedData, "update"))
      .filter(col("_change_type").isNotNull)
      .select(
        (keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
          dataCols.map(c => when(col("_change_type") === "delete", col(s"__o_$c"))
            .otherwise(col(s"__n_$c")).as(c)) :+ col("_change_type")): _*)
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
    val versions = f.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName).filter(_.matches("_v\\d+"))
      .map(_.drop(2).toInt).sorted
    versions.map { v =>
      val dir = new Path(s"$root/_v$v")
      // recursive listing: partitionBy writes lay files under hive-style
      // subdirectories, which a flat listStatus would count as zero
      val it = f.listFiles(dir, true)
      var nFiles = 0L; var nBytes = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) { nFiles += 1; nBytes += st.getLen }
      }
      val rows = spark.read.parquet(dir.toString).count()
      (v, rows, nFiles, nBytes, f.exists(tombPath(v)), v == live)
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
    * window), along with their tombstone/stats/bloom sidecars. Never
    * touches the live version (`keep >= 1` enforced). */
  def vacuum(spark: SparkSession, keep: Int = 2): Unit = {
    require(keep >= 1, s"vacuum keep must be >= 1 (got $keep): keep=0 would delete the live version")
    val f = fs(spark)
    currentVersion(spark).foreach { cur =>
      (1 to cur - keep).foreach { v =>
        Seq(new Path(s"$root/_v$v"), tombPath(v), statsPath(v), bloomPath(v))
          .foreach { p => if (f.exists(p)) f.delete(p, true) }
      }
    }
  }
}
