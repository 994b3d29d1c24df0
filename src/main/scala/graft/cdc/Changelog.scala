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
    op: String, // insert | update | delete
    db: String,
    table: String,
    tsMillis: Long,
    row: Map[String, EnvelopeValue])

object ChangelogRecord {
  private val factory = new JsonFactory()

  def write(r: ChangelogRecord): String = {
    val sw = new StringWriter(192)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    g.writeNumberField("pos", r.pos)
    g.writeStringField("op", r.op)
    g.writeStringField("db", r.db)
    g.writeStringField("table", r.table)
    g.writeNumberField("ts", r.tsMillis)
    g.writeObjectFieldStart("row")
    r.row.foreach { case (k, v) =>
      v match {
        case EnvelopeValue.VNull       => g.writeNullField(k)
        case EnvelopeValue.VString(s)  => g.writeStringField(k, s)
        case EnvelopeValue.VLong(l)    => g.writeNumberField(k, l)
        case EnvelopeValue.VDouble(d)  => g.writeNumberField(k, d)
        case EnvelopeValue.VBool(b)    => g.writeBooleanField(k, b)
        case EnvelopeValue.VDecimal(d) => g.writeNumberField(k, d)
      }
    }
    g.writeEndObject()
    g.writeEndObject()
    g.close()
    sw.toString
  }

  def parse(line: String): ChangelogRecord = {
    val p = factory.createParser(line)
    var pos = 0L; var op: String = null; var db: String = null
    var table: String = null; var ts = 0L
    var row: Map[String, EnvelopeValue] = Map.empty
    require(p.nextToken() == JsonToken.START_OBJECT, "record must be a JSON object")
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "pos"   => pos = p.getLongValue
        case "op"    => op = p.getValueAsString
        case "db"    => db = p.getValueAsString
        case "table" => table = p.getValueAsString
        case "ts"    => ts = p.getLongValue
        case "row" =>
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
              case t => throw new IllegalArgumentException(s"unsupported cell token $t")
            }
          }
          row = m.toMap
        case _ => p.skipChildren()
      }
    }
    p.close()
    ChangelogRecord(pos, op, db, table, ts, row)
  }
}

/** Directory layout + index of a file-backed changelog:
  * `<dir>/<prefix>.%06d` newline-delimited record files plus
  * `<dir>/schemas.json` mapping `db.table` → StructType JSON (the
  * stand-in for the reference's JDBC schema probe,
  * BinLogSocketServerInExecutor.scala:264-275).
  *
  * Record counts are cached keyed by (length, mtime) so the per-trigger
  * `latestOffset` is cheap; at production scale this index would be a
  * sidecar manifest, but the contract is the same.
  */
object ChangelogFiles {
  val DefaultPrefix = "graft-bin"

  private val countCache = new ConcurrentHashMap[(String, Long, Long), Long]()

  def listFiles(dir: String, prefix: String = DefaultPrefix): Seq[(Long, File)] = {
    val d = new File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty[File])
    fs.filter(f => f.isFile && f.getName.startsWith(prefix + "."))
      .map(f => (BinlogOffset.fileIdOf(f.getName), f))
      .sortBy(_._1).toSeq
  }

  def recordCount(f: File): Long = {
    val key = (f.getAbsolutePath, f.length(), f.lastModified())
    countCache.computeIfAbsent(key, _ => {
      val r = new BufferedReader(
        new InputStreamReader(new FileInputStream(f), StandardCharsets.UTF_8))
      try Iterator.continually(r.readLine()).takeWhile(_ != null).count(_.nonEmpty).toLong
      finally r.close()
    })
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
      if (remaining > 0 && take == avail && fs.exists(_._1 > id)) {
        // move into next file on the next loop iteration
      }
    }
    end
  }

  /** Read records of one file with `fromPos <= pos < untilPos`. */
  def readRange(f: File, fromPos: Long, untilPos: Long): Iterator[ChangelogRecord] = {
    val r = new BufferedReader(
      new InputStreamReader(new FileInputStream(f), StandardCharsets.UTF_8))
    var line = r.readLine()
    var idx = 0L
    new Iterator[ChangelogRecord] {
      private var nextRec: ChangelogRecord = advanceTo()
      private def advanceTo(): ChangelogRecord = {
        while (line != null) {
          idx += 1
          val cur = line
          line = r.readLine()
          if (cur.nonEmpty && idx >= fromPos && idx < untilPos) {
            return ChangelogRecord.parse(cur)
          }
          if (idx >= untilPos) { r.close(); return null }
        }
        r.close(); null
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): ChangelogRecord = {
        val v = nextRec; nextRec = advanceTo(); v
      }
    }
  }

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
