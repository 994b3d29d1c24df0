package graft.sources.wal

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc._

/** Multi-partition WAL-tailing CDC source — the analog of the
  * reference's HBase-WAL module (MLSQLHBaseWALDataSource.scala), which
  * proves the envelope/offset machinery generalizes past one table
  * shape:
  *
  *  - the log is REGION-PARTITIONED: `<path>/<region>/<prefix>.%06d`
  *    sub-logs that advance independently;
  *  - the offset is a Kafka-style MAP `{region → packed(fileId,pos)}`
  *    (reference CommonSourceOffset.scala:14-53 mirrors
  *    KafkaSourceOffset the same way) — a slow region never stalls the
  *    others, the scalable shape the single-long binlog offset lacks;
  *  - events are put/delete mutations with HBase-ish rows
  *    (`rowkey` + `family:qualifier` cells), schema-less envelopes
  *    (hbase AbstractEventWriter.java:39 embeds null);
  *  - planInputPartitions emits one partition set PER REGION
  *    (reference HWDS:248 runs one partition per region; we further
  *    chunk large ranges for reader parallelism);
  *  - rotated files moved to `<root>/oldWALs/<region>/` keep serving
  *    with offsets intact — the reference polls live WAL dirs AND the
  *    `oldWALs/` archive the same way (HBaseWALClient.scala:47-151).
  */
class WalDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wal"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalDataSource.schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    require(schema == WalDataSource.schemaFor(opts),
      s"graft-wal has a fixed schema ${WalDataSource.schemaFor(opts).simpleString}")
    new WalTable(opts)
  }
}

object WalDataSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** `envelopeColumns=true` widens the scan with typed routing columns
    * (`region`, `db`, `table`, `op`, `offset`) next to `value` — the
    * plan-pushdown handle ([[WalScanBuilder]]): a `region` equality
    * prunes WHOLE REGIONS off the partition plan (the WAL analog of
    * partition pruning — each region is an independent sub-log), and
    * db/table/op cuts apply in the readers. `offset` is the region-
    * LOCAL packed position (regions number files independently), so it
    * is exposed for inspection/dedup but never accepted as a pushed
    * global range.
    */
  val WideSchema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("region", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("op", StringType),
    StructField("offset", LongType)))

  def schemaFor(options: CaseInsensitiveStringMap): StructType =
    if (Option(options.get("envelopeColumns")).exists(_.toBoolean)) WideSchema
    else Schema

  /** Archive sub-dir for rotated logs — the `oldWALs/` analog
    * (reference HBaseWALClient.scala:47-151 polls BOTH the live
    * `WALs/<regionserver>/` dirs and `oldWALs/`): a rolled file moved to
    * `<root>/oldWALs/<region>/` keeps serving with its offsets intact.
    */
  val ArchiveSubDir = "oldWALs"

  /** The archive root: the reference's `oldWALLogPath` option when
    * given (an absolute directory, possibly outside the WAL root —
    * HBase keeps `oldWALs` beside, not inside, the live dirs), else
    * `<root>/oldWALs`.
    */
  def archiveRoot(root: String, oldWalLogPath: Option[String]): String =
    oldWalLogPath.getOrElse(s"$root/$ArchiveSubDir")

  /** Region sub-dirs under the WAL root (live ∪ archived), sorted for
    * determinism (W2). A region whose files were ALL archived still
    * lists — its records remain addressable.
    */
  def listRegions(dir: String,
      oldWalLogPath: Option[String] = None): Seq[String] = {
    def subDirs(d: String): Seq[String] = {
      val f = new java.io.File(d)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSeq
    }
    (subDirs(dir).filterNot(_ == ArchiveSubDir) ++
      subDirs(archiveRoot(dir, oldWalLogPath))).distinct.sorted
  }

  /** One region's log files across the live dir and the archive,
    * id-sorted; on an id present in both (mid-move race), the LIVE copy
    * wins. The region's manifest stays in the live dir.
    */
  def regionFiles(root: String, region: String, prefix: String,
      oldWalLogPath: Option[String] = None): Seq[(Long, java.io.File)] = {
    val live = ChangelogFiles.listFiles(s"$root/$region", prefix)
    val liveIds = live.map(_._1).toSet
    val archived = ChangelogFiles
      .listFiles(s"${archiveRoot(root, oldWalLogPath)}/$region", prefix)
      .filterNot { case (id, _) => liveIds.contains(id) }
    (live ++ archived).sortBy(_._1)
  }

  /** True when `f` lives under `<archive>/<region>/` — files are
    * only moved there AFTER rotation, so residence in the archive is
    * itself a completeness proof for grouping-mode alignment.
    */
  def isArchived(f: java.io.File,
      oldWalLogPath: Option[String] = None): Boolean =
    oldWalLogPath match {
      case Some(a) =>
        Option(f.getParentFile).flatMap(r => Option(r.getParentFile))
          .exists(_.getCanonicalPath == new java.io.File(a).getCanonicalPath)
      case None =>
        Option(f.getParentFile).flatMap(r => Option(r.getParentFile))
          .exists(_.getName == ArchiveSubDir)
    }

  /** The other location a WAL file can legally be: live ↔ archived.
    * Used to tolerate a file moving between the driver's listing (or
    * partition planning) and the open — the mid-move race. With an
    * external archive the mapping needs both roots.
    */
  def twinPath(path: String, root: Option[String] = None,
      oldWalLogPath: Option[String] = None): String = {
    val f = new java.io.File(path)
    val region = f.getParentFile
    (root, oldWalLogPath) match {
      case (Some(r), Some(a)) if region != null &&
          Option(region.getParentFile).exists(
            _.getCanonicalPath == new java.io.File(a).getCanonicalPath) =>
        // archived → live
        new java.io.File(new java.io.File(r, region.getName), f.getName).getPath
      case (Some(r), Some(a)) if region != null &&
          Option(region.getParentFile).exists(
            _.getCanonicalPath == new java.io.File(r).getCanonicalPath) =>
        // live → archived
        new java.io.File(new java.io.File(a, region.getName), f.getName).getPath
      case _ =>
        val parent = if (region == null) null else region.getParentFile
        if (region == null || parent == null) path
        else if (parent.getName == ArchiveSubDir) // archived → live
          new java.io.File(
            new java.io.File(parent.getParentFile, region.getName), f.getName).getPath
        else // live → archived
          new java.io.File(new java.io.File(
            new java.io.File(parent, ArchiveSubDir), region.getName), f.getName).getPath
    }
  }
}

final class WalTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-wal(${options.get("path")})"
  override def schema(): StructType = WalDataSource.schemaFor(options)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new WalScanBuilder(opts)
}

/** Plan-level pushdown for the wide-schema WAL scan: `region`
  * equality|IN prunes whole regions off the partition plan (each
  * region is an independent sub-log — this is genuine partition
  * pruning, the planner never lists the skipped regions' files), and
  * db/table/op equality|IN cut records in the readers. BATCH scans
  * only — [[WalScan]] drops every plan-derived override on the
  * streaming path (see its doc for the checkpoint rationale). Pushed
  * filters remain in the plan for Spark to re-evaluate; the source's
  * pruning is an optimization, never the correctness boundary.
  */
final class WalScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private val wide =
    Option(options.get("envelopeColumns")).exists(_.toBoolean)
  private var required: StructType = WalDataSource.schemaFor(options)
  private var pushed: Array[Filter] = Array.empty

  private var regionIn: Option[Set[String]] = None
  private var dbIn: Option[Set[String]] = None
  private var tblIn: Option[Set[String]] = None
  private var opIn: Option[Set[String]] = None

  private def strings(vs: Array[Any]): Option[Set[String]] = {
    val ss = vs.collect { case s: String => s }
    if (ss.length == vs.length) Some(ss.toSet) else None
  }
  private def narrow(cur: Option[Set[String]], add: Set[String]): Option[Set[String]] =
    Some(cur.map(_.intersect(add)).getOrElse(add))

  private def accept(f: Filter): Boolean = f match {
    case EqualTo("region", v: String) => regionIn = narrow(regionIn, Set(v)); true
    case In("region", vs) => strings(vs).exists { s => regionIn = narrow(regionIn, s); true }
    case EqualTo("db", v: String) if options.get("databaseNamePattern") == null =>
      dbIn = narrow(dbIn, Set(v)); true
    case In("db", vs) if options.get("databaseNamePattern") == null =>
      strings(vs).exists { s => dbIn = narrow(dbIn, s); true }
    case EqualTo("table", v: String) if options.get("tableNamePattern") == null =>
      tblIn = narrow(tblIn, Set(v)); true
    case In("table", vs) if options.get("tableNamePattern") == null =>
      strings(vs).exists { s => tblIn = narrow(tblIn, s); true }
    case EqualTo("op", v: String) => opIn = narrow(opIn, Set(v)); true
    case In("op", vs) => strings(vs).exists { s => opIn = narrow(opIn, s); true }
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = if (wide) filters.filter(accept) else Array.empty
    filters // every filter stays in the plan as the correctness boundary
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val base = WalSourceConf(options)
    def quoted(s: Set[String]): String =
      s.toSeq.sorted.map(java.util.regex.Pattern.quote).mkString("|")
    val conf = base.copy(
      databaseNamePattern = dbIn.map(quoted).orElse(base.databaseNamePattern),
      tableNamePattern = tblIn.map(quoted).orElse(base.tableNamePattern),
      opFilter = opIn,
      regionFilter = regionIn)
    new WalScan(conf, base, required, pushed)
  }
}

/** `conf` carries the plan-pushed overrides; `optionConf` is the
  * option-only configuration. BATCH scans use `conf` (region pruning +
  * reader-side cuts are pure optimization — Spark re-evaluates every
  * pushed filter above the scan). STREAMING scans use `optionConf`:
  * plan-pushed filters are TRANSPARENT to users, but `latestOffset`
  * advances every region's offsets into the checkpoint regardless —
  * pruning regions off a checkpointed stream's partition plan would
  * silently skip their history if the user later widens the plan
  * filter and resumes. Spark's retained plan filters still cut the
  * streamed rows, so results are identical either way; only explicit
  * OPTION-level patterns (documented as position-intact) narrow a
  * stream at the source. Same conservatism as BinlogScan's stripping
  * of plan-pushed offset bounds in its toMicroBatchStream.
  */
final class WalScan(val conf: WalSourceConf, val optionConf: WalSourceConf,
    required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-wal ${conf.dir}" +
      (if (pushed.nonEmpty) s", PushedFilters: [${pushed.mkString(", ")}]"
       else "")
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WalMicroBatchStream(optionConf, required)
  override def toBatch: Batch = new WalBatch(conf, required)
}

final case class WalSourceConf(
    dir: String,
    prefix: String,
    maxEventsPerTrigger: Option[Long],
    maxRecordsPerPartition: Long,
    failOnDataLoss: Boolean,
    /** Read-path cell grouping (T5): the log carries one record per
      * `family:qualifier` cell and the reader folds consecutive cells
      * of the same (rowkey, op, timestamp) into one mutation — the
      * reference's HBaseWALClient.scala:157-203 fold. With this on,
      * partitions are file-granular (a mutation never spans files, but
      * could span an arbitrary record chunk).
      */
    groupRawCells: Boolean,
    /** Same kernel options as the binlog path: `binlog.field.decode.*`
      * charsets and the session zone for raw temporal cells.
      */
    fieldDecode: Map[String, String],
    sessionTimeZone: String,
    /** Reference `startTime` (MLSQLHBaseWALDataSource / HBaseWALClient):
      * WAL entries whose write time predates this epoch-ms instant are
      * dropped AT THE SOURCE. Offsets stay position-intact — filtered
      * records still advance the position, exactly like the redaction
      * skip path — so checkpoints and manifest counts are unaffected.
      */
    startTimeMs: Option[Long],
    /** Reference `oldWALLogPath`: an EXTERNAL archive root for rotated
      * files (HBase keeps `oldWALs` beside the live dirs, not inside);
      * unset = the in-root `<root>/oldWALs` layout.
      */
    oldWalLogPath: Option[String],
    /** Reference `databaseNamePattern`/`tableNamePattern`
      * (HBaseWALSocketServerInExecutor.scala:131-137, applied
      * :146-153): full-match regexes over each mutation's db/table.
      * An HBase region server's WAL interleaves EVERY table it hosts,
      * so a per-table consumer needs the cut at the source. Applied
      * AFTER cell grouping (a mutation either emits whole or not at
      * all — same layering as `startTime`), and position-intact:
      * filtered mutations still advance offsets, so checkpoints,
      * admission budgets, and manifest counts are unaffected by the
      * filter and the pattern can be changed on an existing
      * checkpoint.
      */
    databaseNamePattern: Option[String],
    tableNamePattern: Option[String],
    /** Plan-pushed constraints ([[WalScanBuilder]]) — never set from
      * options. `regionFilter` prunes whole regions off the partition
      * plan; `opFilter` cuts mutations by op in the readers.
      */
    opFilter: Option[Set[String]] = None,
    regionFilter: Option[Set[String]] = None) extends Serializable

object WalSourceConf {
  def apply(options: CaseInsensitiveStringMap): WalSourceConf = {
    import scala.jdk.CollectionConverters._
    val dir = options.get("path")
    require(dir != null, "option 'path' (WAL root directory) is required")
    WalSourceConf(
      dir = dir,
      prefix = Option(options.get("prefix")).getOrElse(ChangelogFiles.DefaultPrefix),
      maxEventsPerTrigger = Option(options.get("maxEventsPerTrigger")).map(_.toLong),
      maxRecordsPerPartition =
        Option(options.get("maxRecordsPerPartition")).map(_.toLong).getOrElse(100000L),
      failOnDataLoss =
        Option(options.get("failOnDataLoss")).forall(_.toBoolean),
      groupRawCells =
        Option(options.get("groupRawCells")).exists(_.toBoolean),
      fieldDecode = options.asCaseSensitiveMap().asScala.toMap
        .filter(_._1.toLowerCase.startsWith("binlog.field.decode."))
        .map { case (k, v) => "binlog.field.decode." + k.drop(20) -> v },
      sessionTimeZone =
        Option(options.get("sessionTimeZone")).getOrElse("UTC"),
      startTimeMs = Option(options.get("startTime")).map(_.toLong),
      oldWalLogPath = Option(options.get("oldWALLogPath")),
      databaseNamePattern = Option(options.get("databaseNamePattern")),
      tableNamePattern = Option(options.get("tableNamePattern")))
  }
}

/** Kafka-style map offset `{region: packedLong}` with deterministic
  * (sorted-key) JSON — the CommonSourceOffset shape
  * (CommonSourceOffset.scala:24-53 serializes partition maps the same
  * way; W3 deterministic ordering).
  */
final case class WalOffset(regions: Map[String, Long]) extends Offset {
  override def json(): String = {
    val sw = new java.io.StringWriter()
    val g = new JsonFactory().createGenerator(sw)
    g.writeStartObject()
    regions.toSeq.sortBy(_._1).foreach { case (r, off) => g.writeNumberField(r, off) }
    g.writeEndObject()
    g.close()
    sw.toString
  }
}

object WalOffset {
  def parse(json: String): WalOffset = {
    val p = new JsonFactory().createParser(json)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    require(p.nextToken() == JsonToken.START_OBJECT, "wal offset must be a JSON object")
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val r = p.currentName(); p.nextToken(); m += r -> p.getLongValue
    }
    p.close()
    WalOffset(m.toMap)
  }
}

final class WalMicroBatchStream(val conf: WalSourceConf,
    required: StructType = WalDataSource.Schema)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def regionDir(r: String): String = s"${conf.dir}/$r"
  private def files(r: String): Seq[(Long, java.io.File)] =
    WalDataSource.regionFiles(conf.dir, r, conf.prefix, conf.oldWalLogPath)

  override def initialOffset(): Offset =
    WalOffset(WalDataSource.listRegions(conf.dir, conf.oldWalLogPath).map { r =>
      r -> ChangelogFiles.earliestOffsetOf(files(r)).packed
    }.toMap)

  override def getDefaultReadLimit: ReadLimit =
    conf.maxEventsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  /** Cell-grouping batch alignment: an end offset must never split the
    * cells of one (rowkey, op, ts) mutation across micro-batches — the
    * reader folds within a batch only, so a split would emit two
    * partial mutations (and a downstream upsert would apply a partial
    * row image). Snaps the end DOWN to the nearest mutation boundary;
    * at the LIVE tail (no later file, no current manifest entry), the
    * trailing mutation is DEFERRED entirely, because its completeness
    * cannot be known while the writer may still be appending cells — it
    * is served as soon as any later record or file appears, or the
    * manifest declares the file complete (a finished/archived WAL whose
    * writer closed it must not withhold its last mutation forever).
    *
    * Metadata-only per trigger: boundaries come from
    * [[MutationBoundaries]] — the manifest `bounds` field for completed
    * files, an appended-bytes-only incremental parse for the live tail.
    * No record range is ever re-read from the batch start.
    */
  private def mutationAlignedEnd(region: String, from: BinlogOffset,
      end: BinlogOffset): BinlogOffset = {
    if (!conf.groupRawCells || end.pos <= 1) return end
    if (end.packed <= from.packed) return end // idle/caught-up: nothing to align
    val regionDir = this.regionDir(region) // manifest home (live dir)
    val files = this.files(region)
    val f = files.find(_._1 == end.fileId).map(_._2).getOrElse(return end)
    val (n, bounds) = MutationBoundaries.of(regionDir, f)
    val laterFileExists = files.exists(_._1 > end.fileId)
    // completeness proof: a later file (writers never split a mutation
    // across a roll), a manifest entry matching the file's length (the
    // writer recorded it at close — checked in the live dir AND next to
    // the file, in case the archiver moved the manifest along), or
    // residence in the archive itself (files only move there after
    // rotation) — without the last two, a fully-archived region whose
    // live dir was cleaned up would defer its final mutation forever
    val fileComplete = laterFileExists || WalDataSource.isArchived(f, conf.oldWalLogPath) ||
      ChangelogFiles.manifest(regionDir).get(f.getName).exists(_.length == f.length) ||
      ChangelogFiles.manifest(f.getParent).get(f.getName).exists(_.length == f.length)
    val atEof = end.pos > n
    if (atEof && fileComplete) return end
    if (atEof) {
      // live tail: defer the possibly-growing trailing mutation; the
      // caller maxes with `from`, so "no progress" is a clean stall
      return bounds.lastOption
        .map(BinlogOffset(end.fileId, _)).getOrElse(end)
    }
    // mid-file end: complete iff the first excluded record starts a new
    // mutation
    if (MutationBoundaries.contains(bounds, end.pos)) return end
    // snap DOWN to the start of the mutation containing the last
    // included record
    val downPos = MutationBoundaries.largestAtOrBelow(bounds, end.pos - 1)
    if (downPos > 0) {
      val down = BinlogOffset(end.fileId, downPos)
      if (down.packed > from.packed) return down
    }
    // snapping down would make no progress: the mutation is LARGER than
    // the admission budget. Extend UP to its end instead (soft cap
    // overrun bounded by one mutation) — unless it runs to a live EOF,
    // where completeness is unknowable and the defer stands.
    val upPos = MutationBoundaries.smallestAbove(bounds, end.pos)
    if (upPos > 0) BinlogOffset(end.fileId, upPos)
    else if (fileComplete) BinlogOffset(end.fileId, n + 1)
    else BinlogOffset(end.fileId, math.max(downPos, 1L)) // defer at live tail
  }

  /** Per-region independent advance. Under a row cap, the budget is
    * allocated against BACKLOG ([[AdmissionBudget.allocate]]): idle
    * regions consume none of it, a stalled/slow region can neither
    * stall the others nor starve itself, and one active region among N
    * quiet ones gets the full configured rate.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    // one retry on a file vanishing mid-computation (moved to the
    // archive between listing and open): the re-attempt re-lists and
    // finds it at its new home; a second miss is a genuine loss
    try latestOffsetAttempt(start, limit)
    catch { case _: java.io.FileNotFoundException =>
      latestOffsetAttempt(start, limit)
    }

  private def latestOffsetAttempt(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[WalOffset].regions
    // regions discovered now ∪ regions already tracked (a region dir
    // disappearing must not drop its checkpointed offset)
    val regions = (WalDataSource.listRegions(conf.dir, conf.oldWalLogPath) ++ startMap.keys).distinct.sorted
    val regionFs = regions.map(r => r -> files(r)).toMap
    val froms = regions.map { r =>
      r -> startMap.get(r)
        .map(BinlogOffset.unpack)
        .getOrElse(ChangelogFiles.earliestOffsetOf(regionFs(r))) // new region: from its start (HWDS new-region -1 analog)
    }.toMap
    val latests = regions.map { r =>
      r -> ChangelogFiles.latestOffsetOf(regionFs(r))
    }.toMap
    val grants = limit match {
      case l: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        // backlog precomputed ONCE per region: allocate() re-reads its
        // backlog function every refill round
        val backlog = regions.map(r =>
          r -> ChangelogFiles.countBetweenOf(regionFs(r), froms(r), latests(r))).toMap
        Some(AdmissionBudget.allocate(regions, backlog, l.maxRows()))
      case _ => None
    }
    WalOffset(regions.map { r =>
      val from = froms(r)
      val end = grants match {
        case Some(g) =>
          if (g(r) <= 0) from
          else {
            val capped = ChangelogFiles.advanceOf(regionFs(r), from, g(r))
            if (capped < latests(r)) capped else latests(r)
          }
        case None => latests(r)
      }
      r -> math.max(mutationAlignedEnd(r, from, end).packed, from.packed)
    }.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    WalPartitioning.plan(conf,
      start.asInstanceOf[WalOffset], end.asInstanceOf[WalOffset])

  override def createReaderFactory(): PartitionReaderFactory =
    new WalReaderFactory(conf, required)

  override def deserializeOffset(json: String): Offset = WalOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class WalBatch(conf: WalSourceConf,
    required: StructType = WalDataSource.Schema) extends Batch {
  private def full: (WalOffset, WalOffset) = {
    val regions = WalDataSource.listRegions(conf.dir, conf.oldWalLogPath)
    val fs = regions.map(r =>
      r -> WalDataSource.regionFiles(conf.dir, r, conf.prefix, conf.oldWalLogPath)).toMap
    (WalOffset(regions.map(r =>
       r -> ChangelogFiles.earliestOffsetOf(fs(r)).packed).toMap),
     WalOffset(regions.map(r =>
       r -> ChangelogFiles.latestOffsetOf(fs(r)).packed).toMap))
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val (s, e) = full
    WalPartitioning.plan(conf, s, e)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WalReaderFactory(conf, required)
}

object WalPartitioning {
  /** One partition set per region (reference HWDS:248), each region's
    * [start, end) range further chunked by maxRecordsPerPartition.
    */
  def plan(conf: WalSourceConf, start: WalOffset, end: WalOffset): Array[InputPartition] =
    // one retry on a file vanishing mid-plan (archived between listing
    // and stat): the re-attempt re-lists each region
    try planAttempt(conf, start, end)
    catch { case _: java.io.FileNotFoundException => planAttempt(conf, start, end) }

  private def planAttempt(conf: WalSourceConf, start: WalOffset,
      end: WalOffset): Array[InputPartition] = {
    end.regions.toSeq.sortBy(_._1)
      // plan-pushed region pruning: skipped regions' files are never
      // even listed; their offsets still advance (latestOffset never
      // consults the filter), so checkpoints stay filter-independent
      .filter { case (region, _) => conf.regionFilter.forall(_.contains(region)) }
      .flatMap { case (region, endPacked) =>
      val regionDir = s"${conf.dir}/$region" // manifest home (live dir)
      val files = WalDataSource.regionFiles(conf.dir, region, conf.prefix, conf.oldWalLogPath)
      val startOff = start.regions.get(region)
        .map(BinlogOffset.unpack)
        .getOrElse(ChangelogFiles.earliestOffsetOf(files))
      val endOff = BinlogOffset.unpack(endPacked)
      require(endOff.packed >= startOff.packed,
        s"region $region: end $endOff < start $startOff — data may have been missed")
      // per-region data-loss check, mirroring the binlog path: a purged
      // file (manifest entry, no file) at/after the region's start
      // offset with records the reader had not consumed means loss —
      // silently skipping it would drop region records. fileId 0 is the
      // empty-dir sentinel (stream began before the region had files).
      if (conf.failOnDataLoss && startOff.fileId > 0) {
        val existing = files.map(_._1).toSet
        val unreadPurged = ChangelogFiles.manifest(regionDir).exists { case (name, e) =>
          try {
            val id = BinlogOffset.fileIdOf(name)
            !existing.contains(id) &&
              ((id == startOff.fileId && e.count >= startOff.pos) ||
               (id > startOff.fileId && e.count > 0))
          } catch { case _: Exception => false }
        }
        if (unreadPurged) {
          throw new IllegalStateException(
            s"region $region: start offset $startOff points at or before purged " +
              s"WAL data (existing files: ${files.map(_._1).mkString(",")}) — unread " +
              "data was lost (set failOnDataLoss=false to ignore)")
        }
      }
      // grouping mode assumes batch starts are mutation boundaries (the
      // aligned ends guarantee it for checkpoints this source wrote). A
      // mid-mutation start — a user-configured offset, or a checkpoint
      // written with groupRawCells OFF then resumed with it ON — would
      // make the reader emit a partial leading row image; REFUSE it
      // rather than silently corrupt (toggling grouping on an existing
      // checkpoint requires re-aligning the offset first).
      if (conf.groupRawCells && endOff.packed > startOff.packed && startOff.pos > 1) {
        files.find(_._1 == startOff.fileId).foreach { case (_, f) =>
          val (n, bounds) = MutationBoundaries.of(regionDir, f)
          val aligned = startOff.pos > n ||
            MutationBoundaries.contains(bounds, startOff.pos)
          if (!aligned) throw new IllegalStateException(
            s"region $region: start offset $startOff is not a mutation boundary — " +
              "groupRawCells must resume from an aligned checkpoint or a " +
              "boundary/start-of-file startingOffsets (was this checkpoint " +
              "written without groupRawCells?)")
        }
      }
      if (endOff.packed == startOff.packed) Seq.empty
      else {
        // cell-grouping mode must not split a mutation mid-file: chunk
        // at file granularity only (mutations never span files)
        val chunk =
          if (conf.groupRawCells) Long.MaxValue else conf.maxRecordsPerPartition
        for {
          (id, f) <- files
          if id >= startOff.fileId && id <= endOff.fileId
          n = ChangelogFiles.recordCount(f)
          from = if (id == startOff.fileId) startOff.pos else 1L
          until = if (id == endOff.fileId) math.min(endOff.pos, n + 1) else n + 1
          if until > from
          chunkStart <- from until until by chunk
          chunkEnd = if (chunk >= until - chunkStart) until else chunkStart + chunk
        } yield WalInputPartition(region, f.getAbsolutePath, id, chunkStart, chunkEnd)
      }
    }.toArray
  }
}

final case class WalInputPartition(
    region: String, filePath: String, fileId: Long,
    fromPos: Long, untilPos: Long) extends InputPartition

final class WalReaderFactory(conf: WalSourceConf,
    required: StructType = WalDataSource.Schema)
    extends PartitionReaderFactory {

  // column pruning: `value` (envelope serialization — the expensive
  // column) is built only when the pruned schema asks for it
  private val isDefault = required == WalDataSource.Schema

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WalInputPartition]
    new PartitionReader[InternalRow] {
      // the file may have been archived (or restored) between planning
      // and execution — fall back to its twin location before failing
      private val file = {
        val f = new java.io.File(p.filePath)
        if (f.exists()) f
        else {
          val twin = new java.io.File(WalDataSource.twinPath(p.filePath, Some(conf.dir), conf.oldWalLogPath))
          if (twin.exists()) twin else f // let the original error surface
        }
      }
      private val raw = ChangelogFiles.readRange(file, p.fromPos, p.untilPos)
      // startTime filters BEFORE cell grouping: a mutation's cells share
      // one timestamp, so the cut can never split a mutation
      private val cells = raw.filter(r =>
        (r.op == "put" || r.op == "delete") &&
          conf.startTimeMs.forall(r.tsMillis >= _))
      // T5 read-path cell grouping: fold consecutive records that share
      // (rowkey, op, timestamp) into ONE mutation, merging their cells —
      // the reference reassembles mutations from per-cell WAL entries
      // the same way (HBaseWALClient.scala:157-203). The merged record
      // takes the LAST cell's pos, so offsets stay resumable.
      private val grouped: Iterator[ChangelogRecord] =
        if (!conf.groupRawCells) cells
        else new Iterator[ChangelogRecord] {
          private var pending: ChangelogRecord =
            if (cells.hasNext) cells.next() else null
          override def hasNext: Boolean = pending != null
          override def next(): ChangelogRecord = {
            var acc = pending
            pending = null
            while (pending == null && cells.hasNext) {
              val n = cells.next()
              val sameMutation = n.op == acc.op && n.tsMillis == acc.tsMillis &&
                n.row.get("rowkey") == acc.row.get("rowkey")
              if (sameMutation) acc = acc.copy(pos = n.pos, row = acc.row ++ n.row)
              else pending = n
            }
            acc
          }
        }
      // db/table regex cut AFTER grouping: a mutation either emits
      // whole or not at all (filtering raw cells first could fuse two
      // surviving same-key mutations across a filtered-out gap).
      // Position-intact: a filtered mutation's positions were already
      // consumed by the range read, so offsets advance identically
      // with or without the filter.
      private val dbPat =
        conf.databaseNamePattern.map(java.util.regex.Pattern.compile)
      private val tblPat =
        conf.tableNamePattern.map(java.util.regex.Pattern.compile)
      private val it: Iterator[ChangelogRecord] =
        if (dbPat.isEmpty && tblPat.isEmpty && conf.opFilter.isEmpty) grouped
        else grouped.filter { r =>
          dbPat.forall(_.matcher(Option(r.db).getOrElse("")).matches()) &&
            tblPat.forall(_.matcher(Option(r.table).getOrElse("")).matches()) &&
            conf.opFilter.forall(_.contains(r.op))
        }
      private var current: ChangelogRecord = _

      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false

      private def envelopeJson(): UTF8String = {
        // HBase-family envelope: schema is null, row carries
        // rowkey + family:qualifier cells (PutWriter.java:25-39).
        // Raw tagged cells still convert through the kernels (null
        // schema → BIT defaults to LongType), same options as the
        // binlog path.
        val row = TypeKernels.convertRow(current.row, null,
          conf.sessionTimeZone, conf.fieldDecode)
        val ev = CdcEvent(current.op, current.tsMillis, current.db, current.table,
          schemaJson = null, row = row,
          offset = BinlogOffset(p.fileId, current.pos).packed)
        UTF8String.fromString(EnvelopeCodec.write(ev))
      }

      // field→extractor resolution once per reader, not per row: the
      // wide-mode emit path is a flat array loop over pre-bound
      // closures instead of a per-record name match + Seq allocation
      private val fieldGetters: Array[() => Any] =
        required.fields.map[() => Any] { f =>
          f.name match {
            case "value" => () => envelopeJson()
            case "region" => () => UTF8String.fromString(p.region)
            case "db" => () => UTF8String.fromString(current.db)
            case "table" => () => UTF8String.fromString(current.table)
            case "op" => () => UTF8String.fromString(current.op)
            case "offset" => () => BinlogOffset(p.fileId, current.pos).packed
          }
        }

      override def get(): InternalRow =
        if (isDefault) InternalRow(envelopeJson())
        else {
          val vals = new Array[Any](fieldGetters.length)
          var i = 0
          while (i < vals.length) { vals(i) = fieldGetters(i)(); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        }
      override def close(): Unit = raw.close()
    }
  }
}
