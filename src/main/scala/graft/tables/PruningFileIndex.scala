package graft.tables

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Data-skipping [[FileIndex]] over a committed snapshot's immutable file
  * set — the read-side twin of the predicate-DML discovery pre-filter, and
  * the same integration point Delta uses for its data skipping: Catalyst
  * pushes a query's data filters into `listFiles`, so ANY predicate over
  * the relation (a later `.filter`, a SQL WHERE over `SNAPSHOT '<root>'`,
  * a join's pushed-down equality) prunes the scheduled file list through
  * the table's stats/Bloom sidecars automatically — no dedicated
  * `readPruned*` call required. On a 100 TB table the planner lists
  * O(matching files), never O(table).
  *
  * `keep` receives the pushed data filters and returns a predicate over
  * NORMALIZED (scheme-less) file paths; it must be a superset guarantee —
  * the row-level filter still runs on top. With no pushed filters every
  * file is listed (a full scan is a full scan).
  */
private[graft] final class PruningFileIndex(
    files: Seq[FileStatus],
    keep: Seq[Expression] => String => Boolean) extends FileIndex {

  private def norm(p: Path): String = p.toUri.getPath

  override def rootPaths: Seq[Path] = files.map(_.getPath.getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) files
      else {
        val k = keep(dataFilters)
        files.filter(f => k(norm(f.getPath)))
      }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(FileStatusWithMetadata(_, Map.empty))))
  }

  override def inputFiles: Array[String] = files.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
}

private[graft] object PruningFileIndex {

  import BucketedSnapshotTable.PointSet
  private type NumB = Map[String, (Double, Double)]
  private type StrB = Map[String, (Option[String], Option[String])]
  private type PtB  = Map[String, PointSet]

  private def norm(p: String): String = new Path(p).toUri.getPath

  /** Wrap `files` (one immutable committed snapshot, schema `schema`) as a
    * DataFrame whose parquet scan lists files through [[PruningFileIndex]].
    * Plain vectorized parquet relation otherwise — pushdown, column
    * pruning and whole-stage codegen all intact. */
  def relation(spark: SparkSession, files: Seq[FileStatus], schema: StructType,
      keep: Seq[Expression] => String => Boolean): DataFrame = {
    val rel = HadoopFsRelation(
      new PruningFileIndex(files, keep),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, LogicalRelation(rel, false))
  }

  /** Union-by-name schema across representative files (one per immutable
    * write job — files of one job share a schema). First-seen type wins
    * like the manifest union read; None when two representatives DISAGREE
    * on a column's type — such evolved tables need the cast-aligned union
    * read, not a single-schema parquet relation (the caller falls back). */
  def unionSchema(spark: SparkSession, reps: Seq[String]): Option[StructType] = {
    val fields = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.DataType]
    reps.foreach { rep =>
      val s = spark.read.parquet(rep).schema
      for (fld <- s) fields.get(fld.name) match {
        case None => fields(fld.name) = fld.dataType
        case Some(dt) => if (dt != fld.dataType) return None
      }
    }
    Some(StructType(fields.toSeq.map { case (n, dt) =>
      org.apache.spark.sql.types.StructField(n, dt, nullable = true)
    }))
  }

  /** Keep-predicate (over normalized paths) for ONE immutable dir's
    * sidecars under the extracted constraints: range stats verdicts per
    * listed file, Bloom membership per point-constrained column, all
    * conjoined. Files the sidecars do not list are ALWAYS kept, as is
    * everything when no usable metadata exists (None) — superset
    * guarantee, the row filter runs regardless. */
  def dirKeep(f: FileSystem, statsLines: Option[Vector[String]], bloomDir: Path,
      nB: NumB, sB: StrB, pS: PtB): Option[String => Boolean] = {
    val rangeKeep: Option[String => Boolean] =
      if (nB.isEmpty && sB.isEmpty) None
      else statsLines.map { lines =>
        val verdict: Map[String, Boolean] = lines.map { l =>
          val parts = l.split("\t")
          val ents = parts.drop(1)
          val pass = nB.forall { case (c, (lo, hi)) =>
            ents.find(_.startsWith(s"$c:n:")) match {
              case None => true
              case Some(s) =>
                val Array(_, _, mn, mx) = s.split(":", 4)
                !(mx.toDouble < lo || mn.toDouble > hi)
            }
          } && sB.forall { case (c, (lo, hi)) =>
            ents.find(_.startsWith(s"$c:s:")) match {
              case None => true
              case Some(s) => StatsManifest.stringEntryIntersects(s.split(":", 5), lo, hi)
            }
          }
          norm(parts(0)) -> pass
        }.toMap
        p => verdict.getOrElse(p, true)
      }
    val bloomKeep: Option[String => Boolean] = {
      val perCol: Seq[String => Boolean] = pS.toSeq.flatMap { case (c, pts) =>
        for {
          listed <- BloomIndex.indexedFiles(f, bloomDir)
          pass <- BloomIndex.filesMightContainAny(f, bloomDir, c, pts.longs, pts.strs, pts.dbls)
        } yield {
          val listedN = listed.map(norm)
          val passN = pass.map(norm).toSet
          (p: String) => !listedN.contains(p) || passN(p)
        }
      }
      if (perCol.isEmpty) None else Some(p => perCol.forall(_(p)))
    }
    (rangeKeep, bloomKeep) match {
      case (Some(a), Some(b)) => Some(p => a(p) && b(p))
      case (a, b)             => a.orElse(b)
    }
  }
}
