package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.CdcStream

/** SQL surface for the replica store's maintenance operations — the
  * reference's users are SQL-first (reference README.md:128-153 drives
  * everything through `spark.sql` load/save statements), so the store
  * procedures the Scala API exposes are also runnable as SQL text:
  *
  * {{{
  * DESCRIBE HISTORY '/path/to/replica'
  * FSCK REPLICA '/path/to/replica'
  * COMPACT REPLICA '/path/to/replica'
  * CLONE REPLICA '/src' TO '/dst' [AT VERSION 3]
  * RESTORE REPLICA '/path' TO VERSION 2
  * REFRESH CLONE '/clone' KEYS (id) ORDER BY (seq)
  * }}}
  *
  * Injected by [[graft.GraftExtensions]] as a DELEGATING parser: any
  * statement not matching a graft procedure parses through Spark's own
  * parser unchanged, so the extension is invisible to ordinary SQL.
  * Each procedure is a [[LeafRunnableCommand]] — `spark.sql(...)` runs
  * it EXACTLY ONCE, eagerly, like Spark's own DDL (never a lazy plan a
  * re-analysis could re-fire), and returns its result rows as a
  * DataFrame. Every command delegates to the same [[CdcStream]] /
  * store entry points as the Scala API — one implementation, two
  * surfaces; `cdc_sql_maintenance` pins the SQL results bit-identical
  * to the API's. Results are metadata-sized (history rows, fsck
  * findings, version numbers) — collecting them to the driver is the
  * command contract, not a data scan.
  */
object GraftSqlCommands {

  private def attrs(fields: (String, DataType, Boolean)*): Seq[Attribute] =
    fields.map { case (n, t, nullable) =>
      AttributeReference(n, t, nullable)()
    }

  val HistoryOutput: Seq[Attribute] = attrs(
    ("version", LongType, false), ("kind", StringType, true),
    ("watermark", LongType, true), ("change_rows", LongType, true),
    ("rows_written", LongType, true), ("buckets_changed", LongType, true),
    ("is_current", BooleanType, false),
    ("clone_provenance", StringType, true))

  val FsckOutput: Seq[Attribute] = attrs(
    ("check", StringType, true), ("severity", StringType, true),
    ("subject", StringType, true), ("detail", StringType, true))

  val VersionOutput: Seq[Attribute] = attrs(
    ("replica", StringType, false), ("version", LongType, false))
}

final case class DescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.HistoryOutput
  override def run(spark: SparkSession): Seq[Row] =
    CdcStream.describeReplicaHistory(spark, path)
      .collect().toSeq
}

final case class FsckReplicaCommand(path: String,
    indexDirs: Seq[String] = Nil) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.FsckOutput
  override def run(spark: SparkSession): Seq[Row] =
    CdcStream.fsckReplica(spark, path, indexDirs).collect().toSeq
}

final case class CompactReplicaCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    CdcStream.compactReplica(spark, path)
    Seq(Row(path, CdcStream.replicaCurrentVersion(path).getOrElse(0L)))
  }
}

final case class CloneReplicaCommand(src: String, dst: String,
    atVersion: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(dst, CdcStream.cloneReplica(src, dst, atVersion)))
}

final case class RestoreReplicaCommand(path: String, toVersion: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    // a store with a recorded change feed REQUIRES the restore to
    // record its rollback diff (followers must replay it); a feed-less
    // store must not grow one — match the store's own mode, consulting
    // retired `_feed` surfaces too
    CdcStream.restoreReplica(spark, path, toVersion,
      recordChanges = CdcStream.replicaHasFeed(path))
    Seq(Row(path, CdcStream.replicaCurrentVersion(path).getOrElse(0L)))
  }
}

final case class RefreshCloneCommand(path: String, keys: Seq[String],
    orderCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(path,
      CdcStream.refreshClone(spark, path, keys, orderCols.map(col))))
}

/** Delegating parser: graft store procedures parse here, everything
  * else falls through to Spark's parser verbatim.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // quoted paths use SQL single-quote syntax; no escaping inside (a
  // path containing a quote cannot be expressed — surfaced as a parse
  // fall-through to Spark, which errors loudly, never silently)
  private val P = "'([^']+)'"
  private val DescribeHistory =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$P\\s*""".r
  private val Fsck = s"""(?is)\\s*FSCK\\s+REPLICA\\s+$P\\s*""".r
  // INDEXES ('<dir>', '<dir>', …): runs the GSI cursor checks too
  private val FsckIdx =
    s"""(?is)\\s*FSCK\\s+REPLICA\\s+$P\\s+INDEXES\\s*\\(([^)]+)\\)\\s*""".r
  private val Compact = s"""(?is)\\s*COMPACT\\s+REPLICA\\s+$P\\s*""".r
  private val Clone =
    s"""(?is)\\s*CLONE\\s+REPLICA\\s+$P\\s+TO\\s+$P(?:\\s+AT\\s+VERSION\\s+(\\d+))?\\s*""".r
  private val Restore =
    s"""(?is)\\s*RESTORE\\s+REPLICA\\s+$P\\s+TO\\s+VERSION\\s+(\\d+)\\s*""".r
  private val Refresh =
    s"""(?is)\\s*REFRESH\\s+CLONE\\s+$P\\s+KEYS\\s*\\(([^)]+)\\)\\s+ORDER\\s+BY\\s*\\(([^)]+)\\)\\s*""".r

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescribeHistory(p) => DescribeHistoryCommand(p)
    case FsckIdx(p, ix) => FsckReplicaCommand(p,
      ix.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
        .filter(_.nonEmpty).toSeq)
    case Fsck(p) => FsckReplicaCommand(p)
    case Compact(p) => CompactReplicaCommand(p)
    case Clone(s, d, v) =>
      CloneReplicaCommand(s, d, Option(v).map(_.toLong))
    case Restore(p, v) => RestoreReplicaCommand(p, v.toLong)
    case Refresh(p, ks, os) => RefreshCloneCommand(p, csv(ks), csv(os))
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
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
