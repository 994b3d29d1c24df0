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
  * ERASE KEYS (id) FROM REPLICA '/path' VALUES (1), (2)
  * ERASE KEYS (id) FROM REPLICA '/path' USING (SELECT id FROM takedown)
  * REBUCKET REPLICA '/path' KEYS (id) TO 24 BUCKETS
  * FREEZE REPLICA '/path' REASON 'failover'
  * UNFREEZE REPLICA '/path'
  * PROMOTE FOLLOWER '/f' OVER '/old' KEYS (id) ORDER BY (seq) FROM VERSION 2 [NODRAIN] [CONDITIONAL]
  * RESTORE CONSISTENT ('/t1', '/t2') AT WATERMARK 123
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

  val FreezeOutput: Seq[Attribute] = attrs(
    ("replica", StringType, false), ("frozen", BooleanType, false),
    ("reason", StringType, true))

  val WatermarkOutput: Seq[Attribute] = attrs(
    ("watermark", LongType, false))
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

/** Compliance erasure (right-to-be-forgotten) as an auditable SQL
  * statement — the op an operator most needs runnable (and loggable)
  * as text:
  *
  * {{{
  * ERASE KEYS (user_id) FROM REPLICA '/path' VALUES (1), (2)
  * ERASE KEYS (user_id) FROM REPLICA '/path' USING (SELECT user_id FROM takedown)
  * }}}
  *
  * The VALUES tail is handed to Spark's OWN parser as
  * `SELECT * FROM VALUES … AS t(cols)` — typed literals (strings,
  * dates, tuples for composite keys) for free, no hand-rolled literal
  * grammar; the USING form runs an arbitrary query and selects the key
  * columns from it (a bulk takedown list is a table, not a literal
  * list). Both reach [[CdcStream.eraseKeys]] — the SAME entry point as
  * the Scala API, so the frozen-store fence, the flat-layout refusal,
  * and the key-type casting behave identically from either surface.
  */
final case class EraseKeysCommand(path: String, cols: Seq[String],
    valuesText: Option[String], usingQuery: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val keys = (valuesText, usingQuery) match {
      case (Some(vs), _) => spark.sql(
        s"SELECT * FROM VALUES $vs AS __erase_keys(${cols.mkString(", ")})")
      case (_, Some(q)) => spark.sql(q).select(cols.map(col): _*)
      case _ => throw new IllegalArgumentException(
        "ERASE KEYS requires a VALUES list or a USING query")
    }
    CdcStream.eraseKeys(spark, path, cols, keys)
    Seq(Row(path, CdcStream.replicaCurrentVersion(path).getOrElse(0L)))
  }
}

/** `REBUCKET REPLICA '/path' KEYS (id) TO 24 BUCKETS` — online
  * resharding from SQL; the KEYS clause is validated against the
  * manifest's recorded routing columns exactly as the Scala API does.
  */
final case class RebucketReplicaCommand(path: String, cols: Seq[String],
    newNumBuckets: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    CdcStream.rebucketReplica(spark, path, cols, newNumBuckets)
    Seq(Row(path, CdcStream.replicaCurrentVersion(path).getOrElse(0L)))
  }
}

/** `FREEZE REPLICA '/path' [REASON '…']` / `UNFREEZE REPLICA '/path'`
  * — the failover fence as SQL. Returns the store's resulting fence
  * state so a runbook can assert it from the statement's own result.
  */
final case class FreezeReplicaCommand(path: String,
    reason: Option[String], freeze: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.FreezeOutput
  override def run(spark: SparkSession): Seq[Row] = {
    if (freeze) CdcStream.freezeReplica(path, reason.getOrElse("frozen via SQL"))
    else CdcStream.unfreezeReplica(path)
    val r = CdcStream.replicaFrozen(path)
    Seq(Row(path, r.isDefined, r.orNull))
  }
}

/** `PROMOTE FOLLOWER '/f' OVER '/old' KEYS (id) ORDER BY (seq) FROM
  * VERSION n [NODRAIN] [CONDITIONAL]` — the failover switchover as one
  * auditable statement: fence the old primary, optionally drain its
  * undelivered feed tail, return the promotion version. NODRAIN is the
  * crash-failover path (old primary unreachable/untrusted);
  * CONDITIONAL applies the drain with the order-conditional fold (the
  * follower is an order-conditional store).
  */
final case class PromoteFollowerCommand(follower: String,
    oldPrimary: String, keys: Seq[String], orderCols: Seq[String],
    fromVersion: Long, drain: Boolean, conditional: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.VersionOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(follower, CdcStream.promoteFollower(spark, follower,
      oldPrimary, keys, orderCols.map(col), fromVersion, drain,
      conditionalApply = conditional)))
}

/** `RESTORE CONSISTENT ('/t1', '/t2') [AT WATERMARK n]` — roll a whole
  * fleet back to one source moment. The Scala API's single
  * `recordChanges` flag is derived from the fleet itself: all tables
  * carry a change feed → record (followers must replay the rollback
  * diff); none do → don't (a feed-less store must not grow one); a
  * MIXED fleet refuses loudly — no single mode is correct for both,
  * so that choice stays with the Scala API's explicit parameter.
  */
final case class RestoreConsistentCommand(tables: Seq[String],
    atWatermark: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlCommands.WatermarkOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val feeds = tables.map(t => t -> CdcStream.replicaHasFeed(t))
    val recordChanges =
      if (feeds.forall(_._2)) true
      else if (!feeds.exists(_._2)) false
      else throw new IllegalStateException(
        "RESTORE CONSISTENT: the fleet mixes feed-recording and " +
          s"feed-less stores (${feeds.map { case (t, f) =>
            s"$t=${if (f) "feed" else "no-feed"}" }.mkString(", ")}) — " +
          "no single recordChanges mode is correct for both; use the " +
          "Scala API restoreConsistentTables with an explicit choice")
    Seq(Row(CdcStream.restoreConsistentTables(spark, tables,
      atWatermark, recordChanges)))
  }
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
  // compliance + topology ops (r15). The ERASE tails are free-form:
  // VALUES re-parses through Spark's own parser (typed literals),
  // USING carries an arbitrary subquery — both validated at run time,
  // never by this regex layer.
  private val EraseValues =
    s"""(?is)\\s*ERASE\\s+KEYS\\s*\\(([^)]+)\\)\\s+FROM\\s+REPLICA\\s+$P\\s+VALUES\\s+(.+)""".r
  private val EraseUsing =
    s"""(?is)\\s*ERASE\\s+KEYS\\s*\\(([^)]+)\\)\\s+FROM\\s+REPLICA\\s+$P\\s+USING\\s+(.+)""".r
  private val Rebucket =
    s"""(?is)\\s*REBUCKET\\s+REPLICA\\s+$P\\s+KEYS\\s*\\(([^)]+)\\)\\s+TO\\s+(\\d+)\\s+BUCKETS\\s*""".r
  private val Freeze =
    s"""(?is)\\s*FREEZE\\s+REPLICA\\s+$P(?:\\s+REASON\\s+$P)?\\s*""".r
  private val Unfreeze =
    s"""(?is)\\s*UNFREEZE\\s+REPLICA\\s+$P\\s*""".r
  private val Promote =
    s"""(?is)\\s*PROMOTE\\s+FOLLOWER\\s+$P\\s+OVER\\s+$P\\s+KEYS\\s*\\(([^)]+)\\)\\s+ORDER\\s+BY\\s*\\(([^)]+)\\)\\s+FROM\\s+VERSION\\s+(\\d+)(\\s+NODRAIN)?(\\s+CONDITIONAL)?\\s*""".r
  private val RestoreConsistent =
    s"""(?is)\\s*RESTORE\\s+CONSISTENT\\s*\\(([^)]+)\\)(?:\\s+AT\\s+WATERMARK\\s+(\\d+))?\\s*""".r

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** `USING (SELECT …)` — the optional outer parens are syntax, not
    * part of the subquery.
    */
  private def stripOuterParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1)
    else t
  }

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
    case EraseValues(ks, p, vs) =>
      EraseKeysCommand(p, csv(ks), Some(vs.trim), None)
    case EraseUsing(ks, p, q) =>
      EraseKeysCommand(p, csv(ks), None, Some(stripOuterParens(q)))
    case Rebucket(p, ks, n) => RebucketReplicaCommand(p, csv(ks), n.toInt)
    case Freeze(p, reason) =>
      FreezeReplicaCommand(p, Option(reason), freeze = true)
    case Unfreeze(p) => FreezeReplicaCommand(p, None, freeze = false)
    case Promote(f, old, ks, os, v, nodrain, cond) =>
      PromoteFollowerCommand(f, old, csv(ks), csv(os), v.toLong,
        drain = nodrain == null, conditional = cond != null)
    case RestoreConsistent(ts, wm) =>
      RestoreConsistentCommand(
        ts.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
          .filter(_.nonEmpty).toSeq,
        Option(wm).map(_.toLong))
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
