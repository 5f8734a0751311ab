package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.cdc.ScdMerge
import graft.tables.{BucketedSnapshotTable, SnapshotTable}

/** `readStream` over a graft table's CHANGE FEED — the Delta
  * `readChangeFeed` streaming analog (reference behavior: the DLT
  * pipelines consume upstream tables as streams; here ANY snapshot table
  * becomes a streaming source without a staging topic in between).
  *
  * Offsets ARE committed table versions: `getOffset` reports the live
  * version, each micro-batch covers `(lastVersion, liveVersion]` as one
  * per-version union of the derived change feed, every row stamped with
  * `_commit_version`. Because versions are immutable until VACUUM,
  * `getBatch(a, b)` is REPRODUCIBLE — Spark's checkpointed offset log
  * therefore gives exactly-once delivery through restarts with no
  * source-side state at all (the recovery replay re-derives the identical
  * batch). Retention contract: keep `VACUUM … KEEP` ≥ the consumer's
  * maximum lag, same as Delta CDF retention.
  *
  * Scale shape: the per-window diff is the table's own manifest-pruned /
  * file-pruned CDF — on the bucketed 100 TB format a micro-batch reads
  * only the buckets whose content changed in that window, never the
  * table. The bootstrap batch (no prior offset) emits the CURRENT
  * snapshot as `insert` rows — O(table) exactly once, like Delta's
  * initial snapshot — or, with `startingVersion`, replays history from
  * that version on.
  *
  * Options: `path` (table root; plain or bucketed, auto-detected),
  * `keys` (comma list; required for plain roots, validated against the
  * manifest on bucketed ones), `withColumns` (attribution column),
  * `withPreimage` (update_preimage/update_postimage row shape),
  * `startingVersion` (1 = initial snapshot then every change; n > 1 =
  * changes from version n on, no snapshot), `maxVersionsPerTrigger`
  * (admission control for a consumer that fell far behind: each
  * micro-batch covers at most this many versions instead of one
  * giant catch-up window — under AvailableNow the drain simply takes
  * several batches; the initial-snapshot bootstrap is never split, like
  * Delta's).
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext.sparkSession, parameters)
}

private[graft] object ChangeFeedSource {

  /** Format-erasing view of the two table kinds. */
  private[graft] trait Feedable {
    def currentVersion: Option[Int]
    /** VISIBLE rows of version `v` (SCD tombstone state filtered). */
    def visibleAt(v: Int): DataFrame
    /** The visible relation's SCHEMA only — planning-cheap (O(dirs), not
      * an O(buckets) listing on the bucketed format). */
    def visibleSchema(v: Int): org.apache.spark.sql.types.StructType
    /** Derived change feed over one version window. */
    def feed(fromV: Int, toV: Int, withColumns: Boolean, withPreimage: Boolean): DataFrame
  }

  private[graft] def adapter(spark: SparkSession,
      params: Map[String, String]): Feedable = {
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf source: option 'path' (table root) is required"))
    val askedKeys = params.get("keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    BucketedSnapshotTable.layoutOf(spark, path) match {
      case Some(l) =>
        (askedKeys, l.keys) match {
          case (Some(a), Some(stored)) => require(a == stored,
            s"graft-cdf $path: keys (${a.mkString(",")}) does not match the " +
              s"table's bucket keys (${stored.mkString(",")})")
          case _ => ()
        }
        val keys = l.keys.orElse(askedKeys).getOrElse(
          throw new IllegalArgumentException(
            s"graft-cdf $path: manifest records no bucket keys — give option 'keys'"))
        val bt = new BucketedSnapshotTable(path, l.numBuckets, keys)
        new Feedable {
          def currentVersion: Option[Int] = bt.currentVersion(spark)
          def visibleAt(v: Int): DataFrame =
            ScdMerge.scd1Current(bt.readVersion(spark, v))
          def visibleSchema(v: Int): org.apache.spark.sql.types.StructType =
            bt.versionSchema(spark, v)
          def feed(fromV: Int, toV: Int, wc: Boolean, wp: Boolean): DataFrame =
            bt.changes(spark, fromV, toV, wc, wp)
        }
      case None =>
        val keys = askedKeys.getOrElse(throw new IllegalArgumentException(
          s"graft-cdf $path: plain snapshot roots need option 'keys' — the " +
            "table format does not record business keys"))
        val t = new SnapshotTable(path)
        new Feedable {
          def currentVersion: Option[Int] = t.currentVersion(spark)
          def visibleAt(v: Int): DataFrame =
            ScdMerge.scd1Current(t.readVersion(spark, v))
          def visibleSchema(v: Int): org.apache.spark.sql.types.StructType =
            visibleAt(v).schema // one Spark-listed dir: already cheap
          def feed(fromV: Int, toV: Int, wc: Boolean, wp: Boolean): DataFrame =
            t.changes(spark, keys, fromV, toV, wc, wp)
        }
    }
  }

  /** The stream's fixed schema: the table's VISIBLE columns at stream
    * definition + the feed bookkeeping columns. Fixed-at-definition is the
    * streaming contract — a column added to the source later surfaces on
    * the next stream (re)definition, not mid-query. */
  def feedSchema(spark: SparkSession, params: Map[String, String]): StructType = {
    val a = adapter(spark, params)
    val v = a.currentVersion.getOrElse(throw new IllegalArgumentException(
      s"graft-cdf ${params("path")}: table has no committed version yet — " +
        "create it before defining the stream"))
    val base = a.visibleSchema(v)
    val extra =
      StructField("_change_type", StringType, nullable = true) +:
        (if (params.get("withColumns").exists(_.toBoolean))
          Seq(StructField("_changed_columns", StringType, nullable = true))
        else Nil) :+ StructField("_commit_version", LongType, nullable = false)
    StructType(base.fields.toSeq ++ extra)
  }
}

class ChangeFeedSource(spark: SparkSession, params: Map[String, String])
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val table = ChangeFeedSource.adapter(spark, params)
  private val withColumns = params.get("withColumns").exists(_.toBoolean)
  private val withPreimage = params.get("withPreimage").exists(_.toBoolean)
  private val startingVersion = params.get("startingVersion").map(_.toInt)
  private val maxVersions = params.get("maxVersionsPerTrigger").map(_.toInt).map { m =>
    require(m >= 1, s"graft-cdf: maxVersionsPerTrigger must be >= 1, got $m"); m
  }
  override val schema: StructType = ChangeFeedSource.feedSchema(spark, params)

  /** AvailableNow target: versions committed AFTER the trigger prepared
    * are left for the next run — the AvailableNow contract (same pattern
    * as Spark's FileStreamSource). */
  private var availableNowCap: Option[Int] = None

  private def toV(o: org.apache.spark.sql.connector.read.streaming.Offset): Int =
    o match {
      case l: LongOffset       => l.offset.toInt
      case s: SerializedOffset => s.json.trim.toInt
      case other               => other.json().trim.toInt
    }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    table.currentVersion.map(v => LongOffset(v.toLong)).orNull

  /** Admission control: each micro-batch ends at most `maxVersions` past
    * the previous end (the checkpointed start offset IS the cursor — no
    * extra source state), never past the AvailableNow preparation point.
    * The default-mode bootstrap is never split: its base is live−1, a
    * snapshot at an older version would cost the same as at live. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val liveOpt = table.currentVersion.map(v => availableNowCap.fold(v)(math.min(v, _)))
    liveOpt.map { live =>
      val end = maxVersions match {
        case Some(m) =>
          val base = Option(start).map(toV)
            .getOrElse(startingVersion.map(s => math.max(s - 1, 0)).getOrElse(live - 1))
          math.min(live, base + m)
        case None => live
      }
      LongOffset(end.toLong)
    }.orNull
  }

  /** Uncapped fallback for engines that bypass admission control. */
  override def getOffset: Option[Offset] =
    table.currentVersion.map(v => LongOffset(v.toLong))

  /** Align any window's feed (whose union schema may drift across
    * versions) to the stream's fixed schema: missing columns null-fill,
    * matching ones cast — then tag the plan streaming. */
  private def aligned(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    val out = df.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    org.apache.spark.sql.GraftColumnBridge.streamingDataFrame(out)
  }

  private def snapshotAsInserts(v: Int): DataFrame = {
    val base = table.visibleAt(v).withColumn("_change_type", lit("insert"))
    val attributed =
      if (withColumns) base.withColumn("_changed_columns", lit(""))
      else base
    attributed.withColumn("_commit_version", lit(v.toLong))
  }

  /** One row-stamped diff per version in `(fromExclusive, endV]` — commit
    * granularity survives a multi-version micro-batch, and each window's
    * diff is the table's own pruned CDF. */
  private def perVersion(fromExclusive: Int, endV: Int): Option[DataFrame] = {
    val windows = ((fromExclusive + 1) to endV).map { v =>
      table.feed(v - 1, v, withColumns, withPreimage)
        .withColumn("_commit_version", lit(v.toLong))
    }
    windows.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = toV(end)
    val batch = start.map(toV) match {
      case Some(a) =>
        perVersion(a, endV).getOrElse(snapshotAsInserts(endV).limit(0))
      case None => startingVersion match {
        case None => snapshotAsInserts(endV) // Delta-default initial snapshot
        case Some(s) if s <= 1 =>
          // history from the beginning: version 1's state as inserts, then
          // every later window's feed
          perVersion(1, endV) match {
            case Some(feeds) => snapshotAsInserts(1)
              .unionByName(feeds, allowMissingColumns = true)
            case None => snapshotAsInserts(endV)
          }
        case Some(s) =>
          perVersion(s - 1, endV).getOrElse(snapshotAsInserts(endV).limit(0))
      }
    }
    aligned(batch)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
