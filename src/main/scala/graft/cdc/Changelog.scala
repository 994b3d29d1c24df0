package graft.cdc

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import java.io.{BufferedReader, File, FileInputStream, InputStreamReader, StringWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** One record of the file-backed changelog the deterministic feed
  * replays — the stand-in for a MySQL binlog event (no live DB exists
  * in this environment; SURVEY.md §7 step 2). `pos` is the record's
  * 1-based index within its file, so (fileId, pos) is a
  * [[BinlogOffset]].
  *
  * `row` carries the after-image for insert/update and the before-image
  * for delete — the reference's exact emission semantics
  * (InsertRowsWriter/UpdateRowsWriter emit after-images, update
  * before-images are discarded, DeleteRowsWriter emits the
  * before-image; UpdateRowsWriter.java:54-57, DeleteRowsWriter.java:48-56).
  */
final case class ChangelogRecord(
    pos: Long,
    op: String, // insert | update | delete (binlog) | put (wal)
    db: String,
    table: String,
    tsMillis: Long,
    row: Map[String, EnvelopeValue],
    /** Update before-image, when the log captured one (FIXTURES §1:
      * `binlog_row_image=full`). The source emits it only under its
      * `includeBeforeImage` option.
      */
    before: Option[Map[String, EnvelopeValue]] = None)

object ChangelogRecord {
  private val factory = new JsonFactory()

  /** Raw cells serialize as single-key tagged objects so the changelog
    * can carry pre-conversion values (FIXTURES §2 per-type matrix):
    * `{"$b64":"…"}` bytes, `{"$bits":[0,3]}` BIT set-bits,
    * `{"$dt":ms}` DATETIME, `{"$d":ms}` DATE, `{"$ts":ms}` TIMESTAMP.
    */
  private def writeCell(g: com.fasterxml.jackson.core.JsonGenerator,
      k: String, v: EnvelopeValue): Unit = v match {
    case EnvelopeValue.VNull       => g.writeNullField(k)
    case EnvelopeValue.VString(s)  => g.writeStringField(k, s)
    case EnvelopeValue.VLong(l)    => g.writeNumberField(k, l)
    case EnvelopeValue.VDouble(d)  => g.writeNumberField(k, d)
    case EnvelopeValue.VBool(b)    => g.writeBooleanField(k, b)
    case EnvelopeValue.VDecimal(d) => g.writeNumberField(k, d)
    case EnvelopeValue.VBytes(b64) =>
      g.writeObjectFieldStart(k); g.writeStringField("$b64", b64); g.writeEndObject()
    case EnvelopeValue.VBits(bits) =>
      g.writeObjectFieldStart(k); g.writeArrayFieldStart("$bits")
      bits.foreach(g.writeNumber); g.writeEndArray(); g.writeEndObject()
    case EnvelopeValue.VDatetime(ms) =>
      g.writeObjectFieldStart(k); g.writeNumberField("$dt", ms); g.writeEndObject()
    case EnvelopeValue.VDate(ms) =>
      g.writeObjectFieldStart(k); g.writeNumberField("$d", ms); g.writeEndObject()
    case EnvelopeValue.VTimestamp(ms) =>
      g.writeObjectFieldStart(k); g.writeNumberField("$ts", ms); g.writeEndObject()
  }

  private def writeRow(g: com.fasterxml.jackson.core.JsonGenerator,
      field: String, row: Map[String, EnvelopeValue]): Unit = {
    g.writeObjectFieldStart(field)
    row.foreach { case (k, v) => writeCell(g, k, v) }
    g.writeEndObject()
  }

  def write(r: ChangelogRecord): String = {
    val sw = new StringWriter(192)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    g.writeNumberField("pos", r.pos)
    g.writeStringField("op", r.op)
    g.writeStringField("db", r.db)
    g.writeStringField("table", r.table)
    g.writeNumberField("ts", r.tsMillis)
    writeRow(g, "row", r.row)
    r.before.foreach(b => writeRow(g, "before", b))
    g.writeEndObject()
    g.close()
    sw.toString
  }

  private def parseTaggedCell(p: com.fasterxml.jackson.core.JsonParser): EnvelopeValue = {
    // positioned at START_OBJECT of a tagged raw cell
    var v: EnvelopeValue = null
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val tag = p.currentName()
      p.nextToken()
      v = tag match {
        case "$b64" => EnvelopeValue.VBytes(p.getText)
        case "$bits" =>
          require(p.currentToken() == JsonToken.START_ARRAY, "$bits must be an array")
          val b = mutable.ArrayBuffer.empty[Int]
          while (p.nextToken() != JsonToken.END_ARRAY) b += p.getIntValue
          EnvelopeValue.VBits(b.toSeq)
        case "$dt" => EnvelopeValue.VDatetime(p.getLongValue)
        case "$d"  => EnvelopeValue.VDate(p.getLongValue)
        case "$ts" => EnvelopeValue.VTimestamp(p.getLongValue)
        case t => throw new IllegalArgumentException(s"unknown raw-cell tag $t")
      }
    }
    require(v != null, "empty tagged cell")
    v
  }

  private def parseRow(p: com.fasterxml.jackson.core.JsonParser): Map[String, EnvelopeValue] = {
    val m = mutable.LinkedHashMap.empty[String, EnvelopeValue]
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val col = p.currentName()
      p.nextToken() match {
        case JsonToken.VALUE_NULL         => m += col -> EnvelopeValue.VNull
        case JsonToken.VALUE_STRING       => m += col -> EnvelopeValue.VString(p.getText)
        case JsonToken.VALUE_NUMBER_INT   => m += col -> EnvelopeValue.VLong(p.getLongValue)
        case JsonToken.VALUE_NUMBER_FLOAT => m += col -> EnvelopeValue.VDouble(p.getDoubleValue)
        case JsonToken.VALUE_TRUE         => m += col -> EnvelopeValue.VBool(true)
        case JsonToken.VALUE_FALSE        => m += col -> EnvelopeValue.VBool(false)
        case JsonToken.START_OBJECT       => m += col -> parseTaggedCell(p)
        case t => throw new IllegalArgumentException(s"unsupported cell token $t")
      }
    }
    m.toMap
  }

  def parse(line: String): ChangelogRecord = {
    val p = factory.createParser(line)
    var pos = 0L; var op: String = null; var db: String = null
    var table: String = null; var ts = 0L
    var row: Map[String, EnvelopeValue] = Map.empty
    var before: Option[Map[String, EnvelopeValue]] = None
    require(p.nextToken() == JsonToken.START_OBJECT, "record must be a JSON object")
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "pos"    => pos = p.getLongValue
        case "op"     => op = p.getValueAsString
        case "db"     => db = p.getValueAsString
        case "table"  => table = p.getValueAsString
        case "ts"     => ts = p.getLongValue
        case "row"    => row = parseRow(p)
        case "before" => before = Some(parseRow(p))
        case _ => p.skipChildren()
      }
    }
    p.close()
    ChangelogRecord(pos, op, db, table, ts, row, before)
  }
}

/** Directory layout + index of a file-backed changelog:
  * `<dir>/<prefix>.%06d` newline-delimited record files plus
  * `<dir>/schemas.json` mapping `db.table` → StructType JSON (the
  * stand-in for the reference's JDBC schema probe,
  * BinLogSocketServerInExecutor.scala:264-275) and an optional
  * `<dir>/manifest.json` sidecar with per-file record counts written by
  * the generator.
  *
  * Line accounting rule (ONE rule, used everywhere): one line = one
  * pos, counted as newline bytes. `recordCount` counts newlines;
  * `readRange` assigns pos per line read and silently skips blank
  * lines at emission (a blank line is a no-op record that still
  * consumes its pos) — so a stray blank can never desynchronize
  * offsets from records.
  *
  * Scale: `latestOffset` runs every trigger on the driver, so it must
  * never do I/O proportional to data size. Completed files resolve
  * from the manifest (an O(1) stat + cached map); the active tail file
  * is counted INCREMENTALLY — only bytes appended since the last look
  * are scanned. The cache keys by path with stale-entry replacement,
  * so a long-running stream cannot leak one entry per append.
  */
object ChangelogFiles {
  val DefaultPrefix = "graft-bin"
  val ManifestName = "manifest.json"

  private final case class CountState(len: Long, mtime: Long, count: Long)
  private val countCache = new ConcurrentHashMap[String, CountState]()

  private final case class ManifestState(len: Long, mtime: Long,
      entries: Map[String, (Long, Long)]) // name -> (length, count)
  private val manifestCache = new ConcurrentHashMap[String, ManifestState]()

  def listFiles(dir: String, prefix: String = DefaultPrefix): Seq[(Long, File)] = {
    val d = new File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty[File])
    fs.filter(f => f.isFile && f.getName.startsWith(prefix + "."))
      .map(f => (BinlogOffset.fileIdOf(f.getName), f))
      .sortBy(_._1).toSeq
  }

  /** Raw newline-byte count from byte offset `from` — no UTF-8 decode,
    * no line materialization.
    */
  private def countNewlines(f: File, from: Long): Long = {
    val in = new FileInputStream(f)
    try {
      var skipped = 0L
      while (skipped < from) {
        val s = in.skip(from - skipped)
        if (s <= 0) throw new java.io.IOException(s"cannot skip to $from in $f")
        skipped += s
      }
      val buf = new Array[Byte](64 * 1024)
      var count = 0L
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) { if (buf(i) == '\n') count += 1; i += 1 }
        n = in.read(buf)
      }
      count
    } finally in.close()
  }

  /** Per-file record counts from `manifest.json` (name → (length, count));
    * empty if absent. Cached, reloaded only when the manifest changes.
    */
  def manifest(dir: String): Map[String, (Long, Long)] = {
    val mf = new File(dir, ManifestName)
    if (!mf.exists()) return Map.empty
    val len = mf.length(); val mtime = mf.lastModified()
    val prev = manifestCache.get(dir)
    if (prev != null && prev.len == len && prev.mtime == mtime) return prev.entries
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
    val p = new JsonFactory().createParser(txt)
    val m = mutable.LinkedHashMap.empty[String, (Long, Long)]
    require(p.nextToken() == JsonToken.START_OBJECT)
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      require(p.nextToken() == JsonToken.START_OBJECT)
      var l = -1L; var c = -1L
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val k = p.currentName(); p.nextToken()
        k match {
          case "length" => l = p.getLongValue
          case "count"  => c = p.getLongValue
          case _        => p.skipChildren()
        }
      }
      m += name -> (l, c)
    }
    p.close()
    manifestCache.put(dir, ManifestState(len, mtime, m.toMap))
    m.toMap
  }

  /** Record count of a (possibly still purged) file, from the manifest
    * only — used for the data-loss check on missing files.
    */
  def manifestCount(dir: String, name: String): Option[Long] =
    manifest(dir).get(name).map(_._2)

  /** Write `manifest.json` for a directory of generated files
    * (name → (length, count)) — shared by the fixture generators.
    */
  def writeManifest(dir: File, entries: Iterable[(String, (File, Long))]): Unit = {
    val sw = new java.io.StringWriter()
    val g = new JsonFactory().createGenerator(sw)
    g.writeStartObject()
    entries.foreach { case (name, (f, count)) =>
      g.writeObjectFieldStart(name)
      g.writeNumberField("length", f.length())
      g.writeNumberField("count", count)
      g.writeEndObject()
    }
    g.writeEndObject()
    g.close()
    java.nio.file.Files.write(new File(dir, ManifestName).toPath,
      sw.toString.getBytes(StandardCharsets.UTF_8))
  }

  def recordCount(f: File): Long = {
    val path = f.getAbsolutePath
    val len = f.length(); val mtime = f.lastModified()
    val prev = countCache.get(path)
    if (prev != null && prev.len == len && prev.mtime == mtime) return prev.count
    val fromManifest = manifest(f.getParent).get(f.getName)
      .collect { case (l, c) if l == len => c }
    val count = fromManifest.getOrElse {
      if (prev != null && len > prev.len) prev.count + countNewlines(f, prev.len)
      else countNewlines(f, 0L)
    }
    countCache.put(path, CountState(len, mtime, count))
    count
  }

  /** Offset of the first record (inclusive): (firstFileId, 1); (0, 1)
    * for an empty dir.
    */
  def earliestOffset(dir: String, prefix: String = DefaultPrefix): BinlogOffset = {
    val fs = listFiles(dir, prefix)
    if (fs.isEmpty) BinlogOffset(0, 1) else BinlogOffset(fs.head._1, 1)
  }

  /** Exclusive end offset: one past the last record of the last file. */
  def latestOffset(dir: String, prefix: String = DefaultPrefix): BinlogOffset = {
    val fs = listFiles(dir, prefix)
    if (fs.isEmpty) BinlogOffset(0, 1)
    else {
      val (id, f) = fs.last
      BinlogOffset(id, recordCount(f) + 1)
    }
  }

  /** Advance `start` by at most `maxRecords` records (admission control
    * for maxEventsPerTrigger — the reference has no per-trigger cap,
    * its getOffset always returns latest; SURVEY.md §4 back-pressure row).
    */
  def advance(dir: String, start: BinlogOffset, maxRecords: Long,
      prefix: String = DefaultPrefix): BinlogOffset = {
    require(maxRecords > 0)
    var remaining = maxRecords
    val fs = listFiles(dir, prefix).dropWhile(_._1 < start.fileId)
    var end = start
    for ((id, f) <- fs if remaining > 0) {
      val n = recordCount(f)
      val from = if (id == start.fileId) start.pos else 1L
      val avail = math.max(0L, n - from + 1)
      val take = math.min(avail, remaining)
      remaining -= take
      end = BinlogOffset(id, from + take)
    }
    end
  }

  /** Iterator over changelog records that exposes `close()` so an
    * abandoned/cancelled task can release the file handle early
    * (`PartitionReader.close` calls it); exhaustion also closes.
    */
  final class RecordIterator(f: File, fromPos: Long, untilPos: Long)
      extends Iterator[ChangelogRecord] with AutoCloseable {
    private val r = new BufferedReader(
      new InputStreamReader(new FileInputStream(f), StandardCharsets.UTF_8))
    private var closed = false
    private var line = r.readLine()
    private var idx = 0L
    private var nextRec: ChangelogRecord = advanceTo()

    private def advanceTo(): ChangelogRecord = {
      // one pos per line (same accounting as recordCount's newline
      // count); blank lines consume their pos but emit nothing
      while (line != null) {
        idx += 1
        val cur = line
        line = r.readLine()
        if (cur.nonEmpty && idx >= fromPos && idx < untilPos) {
          return ChangelogRecord.parse(cur)
        }
        if (idx >= untilPos) { close(); return null }
      }
      close(); null
    }
    override def hasNext: Boolean = nextRec != null
    override def next(): ChangelogRecord = {
      val v = nextRec; nextRec = advanceTo(); v
    }
    override def close(): Unit = if (!closed) { closed = true; r.close() }
  }

  /** Read records of one file with `fromPos <= pos < untilPos`. */
  def readRange(f: File, fromPos: Long, untilPos: Long): RecordIterator =
    new RecordIterator(f, fromPos, untilPos)

  /** schemas.json: `{"db.table": "<StructType.json>", …}`. */
  def readSchemas(dir: String): Map[String, String] = {
    val f = new File(dir, "schemas.json")
    if (!f.exists()) return Map.empty
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val p = new JsonFactory().createParser(txt)
    val m = mutable.LinkedHashMap.empty[String, String]
    require(p.nextToken() == JsonToken.START_OBJECT)
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val k = p.currentName(); p.nextToken(); m += k -> p.getValueAsString
    }
    m.toMap
  }
}
