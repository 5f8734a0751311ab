package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.tables.SnapshotTable

/** Maintenance-DDL + DML parser extension — the `injectParser` surface of
  * [[graft.GraftExtensions]] (SURVEY §4 extension point (c); the Delta
  * `OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY` / `MERGE` / `UPDATE` /
  * `DELETE` / time-travel SQL forms, which the reference's maintenance
  * notebooks run as cell SQL). Statements over [[SnapshotTable]] paths:
  *
  * {{{
  *   OPTIMIZE '<table root>' [TARGET <bytes>]
  *   VACUUM '<table root>' [KEEP <n>]
  *   DESCRIBE HISTORY '<table root>'
  *   MERGE INTO '<table root>' USING <view> ON KEYS (k1[, k2…])
  *     SEQUENCE BY <col> [DELETE WHEN <predicate>]
  *   UPDATE '<table root>' SET c = <expr>[, …] WHERE <predicate>
  *   DELETE FROM '<table root>' WHERE <predicate>
  *   SNAPSHOT '<table root>' [VERSION AS OF <n>]
  * }}}
  *
  * MERGE is DLT auto-CDC SCD1 semantics ([[graft.cdc.ScdMerge.scd1Upsert]]
  * — sequence-ordered last-write-wins per key, `DELETE WHEN` rows are
  * tombstones); UPDATE commits a full rewritten snapshot (atomic,
  * copy-on-write — Delta's UPDATE shape); DELETE appends key tombstones
  * (O(matched rows), never a table rewrite); SNAPSHOT is a query (time
  * travel when VERSION AS OF is given). Everything else delegates
  * verbatim to Spark's parser, so the extension is purely additive.
  * Commands execute driver-side through the same table code the
  * programmatic API uses — the parser is syntax, not a second
  * implementation.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'(?:\s+KEEP\s+(\d+))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val Merge =
    """(?is)\s*MERGE\s+INTO\s+'([^']+)'\s+USING\s+([\w.]+)\s+ON\s+KEYS\s*\(([^)]+)\)\s+SEQUENCE\s+BY\s+(\w+)(?:\s+DELETE\s+WHEN\s+(.+?))?\s*;?\s*""".r
  private val Update =
    """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val Snapshot =
    """(?is)\s*SNAPSHOT\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(path, target) =>
      OptimizeSnapshotCommand(path,
        Option(target).map(_.toLong).getOrElse(128L << 20))
    case Vacuum(path, keep) =>
      VacuumSnapshotCommand(path, Option(keep).map(_.toInt).getOrElse(2))
    case History(path) =>
      DescribeHistoryCommand(path)
    case Merge(path, view, keys, seqCol, deleteWhen) =>
      MergeSnapshotCommand(path, view,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq, seqCol,
        Option(deleteWhen).map(_.trim))
    case Update(path, setList, pred) =>
      UpdateSnapshotCommand(path, splitTopLevel(setList).map { a =>
        val Array(c, e) = a.split("=", 2)
        (c.trim, e.trim)
      }, pred.trim)
    case Delete(path, pred) =>
      DeleteSnapshotCommand(path, pred.trim)
    case Restore(path, version) =>
      RestoreSnapshotCommand(path, version.toInt)
    case AddConstraint(path, name, pred) =>
      AlterConstraintCommand(path, name, Some(pred.trim))
    case DropConstraint(path, name) =>
      AlterConstraintCommand(path, name, None)
    case Snapshot(path, version) =>
      // a QUERY, not a command: time-travel read as a logical plan
      val spark = SparkSession.active
      val t = new SnapshotTable(path)
      val df = Option(version).map(v => t.readVersion(spark, v.toInt))
        .getOrElse(t.read(spark))
      df.queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  /** Split on commas at paren/quote depth 0 — `SET a = f(x, y), b = 2`
    * must not split inside the call. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0
    s.zipWithIndex.foreach { case (ch, i) =>
      ch match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

/** `OPTIMIZE '<root>' [TARGET <bytes>]` → [[SnapshotTable.optimizeCompact]];
  * returns the (possibly unchanged) live version. */
case class OptimizeSnapshotCommand(path: String, targetBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(new SnapshotTable(path).optimizeCompact(spark, targetBytes)))
}

/** `VACUUM '<root>' [KEEP <n>]` → [[SnapshotTable.vacuum]]; returns the
  * retained version window. */
case class VacuumSnapshotCommand(path: String, keep: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("kept_versions", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    new SnapshotTable(path).vacuum(spark, keep)
    Seq(Row(keep))
  }
}

/** `MERGE INTO '<root>' USING <view> ON KEYS (…) SEQUENCE BY <col>
  * [DELETE WHEN <pred>]` → [[graft.cdc.ScdMerge.scd1Upsert]] over the
  * live snapshot + atomic snapshot commit. A root carrying a
  * `_manifest_v*` (a [[graft.tables.BucketedSnapshotTable]]) routes to
  * the bucketed merge instead — affected-buckets-only rewrite, with
  * numBuckets read from the manifest header and ON KEYS as the bucket
  * keys (they must match the keys the table was built with).
  * Returns (version, n_rows). */
case class MergeSnapshotCommand(path: String, view: String, keys: Seq[String],
    seqCol: String, deleteWhen: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  /** numBuckets from the newest `_manifest_v<N>` header, when the root is
    * a bucketed table. */
  private def bucketedLayout(spark: SparkSession): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return None
    val manifests = f.listStatus(p).map(_.getPath.getName)
      .filter(_.matches("_manifest_v\\d+"))
    if (manifests.isEmpty) None
    else {
      val newest = manifests.maxBy(_.stripPrefix("_manifest_v").toInt)
      val in = f.open(new org.apache.hadoop.fs.Path(p, newest))
      val head = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next() finally in.close()
      Some(head.stripPrefix("numBuckets=").trim.toInt)
    }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val updates = spark.table(view)
    val del = deleteWhen.map(org.apache.spark.sql.functions.expr)
    bucketedLayout(spark) match {
      case Some(numBuckets) =>
        val bt = new graft.tables.BucketedSnapshotTable(path, numBuckets, keys)
        // keys recorded in the manifest header (since r7) must match ON
        // KEYS — merging with different keys would silently mis-bucket
        bt.manifestHeader(spark).get("keys").foreach { stored =>
          require(stored == keys.mkString(","),
            s"MERGE INTO $path: ON KEYS (${keys.mkString(",")}) does not match " +
              s"the table's bucket keys ($stored)")
        }
        bt.scd1Merge(spark, updates, seqCol, Nil, del)
        Seq(Row(bt.currentVersion(spark).getOrElse(0), bt.read(spark).count()))
      case None =>
        val t = new SnapshotTable(path)
        val merged = graft.cdc.ScdMerge.scd1Upsert(
          t.readOption(spark), updates, keys, seqCol, Nil, del)
        val v = t.write(spark, merged)
        Seq(Row(v, t.read(spark).count()))
    }
  }
}

/** `UPDATE '<root>' SET … WHERE <pred>` → copy-on-write: one atomic new
  * snapshot with matched rows rewritten (the Delta UPDATE shape — readers
  * flip between complete versions, never see a half-updated table). */
case class UpdateSnapshotCommand(path: String, sets: Seq[(String, String)],
    pred: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_updated", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, when => sqlWhen, col}
    val t = new SnapshotTable(path)
    val cur = t.read(spark)
    val p = expr(pred)
    val n = cur.filter(p).count()
    val updated = sets.foldLeft(cur) { case (d, (c, e)) =>
      d.withColumn(c, sqlWhen(p, expr(e)).otherwise(col(c)))
    }
    Seq(Row(t.write(spark, updated), n))
  }
}

/** `DELETE FROM '<root>' WHERE <pred>` → key tombstones for the matched
  * rows ([[SnapshotTable.deleteKeys]]): O(matched) IO, no table rewrite —
  * the deletion-vector analog, already covered by q149's programmatic
  * form. Returns the number of tombstoned rows. */
case class DeleteSnapshotCommand(path: String, pred: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_deleted", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = new SnapshotTable(path)
    val doomed = t.read(spark).filter(org.apache.spark.sql.functions.expr(pred))
    val n = doomed.count()
    if (n > 0) t.deleteKeys(spark, doomed)
    Seq(Row(n))
  }
}

/** `ALTER TABLE '<root>' ADD CONSTRAINT <name> CHECK (<pred>)` /
  * `… DROP CONSTRAINT <name>` → [[SnapshotTable.addConstraint]] (Delta
  * semantics: the existing snapshot is validated first, then every
  * subsequent write is checked inline) / [[SnapshotTable.dropConstraint]]. */
case class AlterConstraintCommand(path: String, name: String,
    predicate: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_constraints", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = new SnapshotTable(path)
    predicate match {
      case Some(p) => t.addConstraint(spark, name, p)
      case None    => t.dropConstraint(spark, name)
    }
    Seq(Row(t.constraints(spark).size))
  }
}

/** `RESTORE '<root>' TO VERSION <n>` → [[SnapshotTable.restore]]: commit
  * a NEW version with the older content — history only moves forward. */
case class RestoreSnapshotCommand(path: String, version: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(new SnapshotTable(path).restore(spark, version)))
}

/** `DESCRIBE HISTORY '<root>'` → [[SnapshotTable.history]] rows. */
case class DescribeHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("has_tombstones", BooleanType, nullable = false)(),
    AttributeReference("is_live", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    new SnapshotTable(path).history(spark).collect().toSeq
}
