package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.tables.SnapshotTable

/** Maintenance-DDL parser extension — the `injectParser` surface of
  * [[graft.GraftExtensions]] (SURVEY §4 extension point (c); the Delta
  * `OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY` SQL forms, which the
  * reference's maintenance notebooks run as cell SQL). Three statements
  * over [[SnapshotTable]] paths:
  *
  * {{{
  *   OPTIMIZE '<table root>' [TARGET <bytes>]
  *   VACUUM '<table root>' [KEEP <n>]
  *   DESCRIBE HISTORY '<table root>'
  * }}}
  *
  * Everything else delegates verbatim to Spark's parser, so the extension
  * is purely additive. Commands execute driver-side through the same
  * table code the programmatic API uses — the parser is syntax, not a
  * second implementation.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'(?:\s+KEEP\s+(\d+))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(path, target) =>
      OptimizeSnapshotCommand(path,
        Option(target).map(_.toLong).getOrElse(128L << 20))
    case Vacuum(path, keep) =>
      VacuumSnapshotCommand(path, Option(keep).map(_.toInt).getOrElse(2))
    case History(path) =>
      DescribeHistoryCommand(path)
    case _ => delegate.parsePlan(sqlText)
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
