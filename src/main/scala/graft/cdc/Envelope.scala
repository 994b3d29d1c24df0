package graft.cdc

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import java.io.StringWriter
import scala.collection.mutable

/** One row-change event in the self-describing JSON envelope the
  * stream emits (FIXTURES.md §3; reference AbstractEventWriter.java:16-47
  * writes the same five fields, InsertRowsWriter.java:43-58 the row
  * object). One envelope = ONE changed row — writers in the reference
  * loop `data.getRows()` emitting one JSON string per row.
  *
  * `rows` values are kept as already-JSON-encoded fragments so the
  * codec is schema-agnostic; the embedded `schema` (Spark StructType
  * JSON) tells consumers how to parse them (`from_json` downstream).
  */
final case class CdcEvent(
    eventType: String, // insert | update | delete
    timestamp: Long,   // epoch millis of the source change
    databaseName: String,
    tableName: String,
    schemaJson: String, // StructType.json of the table, or null
    row: Map[String, EnvelopeValue],
    /** Packed (fileId, pos) log coordinate of this event; 0 = unknown
      * (field omitted from JSON). An EXTENSION over the reference's
      * envelope: carrying the log position end-to-end is what makes
      * cross-batch exactly-once dedup possible downstream
      * (OriginalSourceServerInExecutor.scala:165-171 keeps this state
      * server-side; we surface it to the consumer instead).
      */
    offset: Long = 0L,
    /** Update before-image (reference UpdateRowsWriter.java:54-57
      * silently DISCARDS it; SURVEY §1.6 keeps it behind the source's
      * `includeBeforeImage` option). None = not captured/not requested.
      */
    beforeRow: Option[Map[String, EnvelopeValue]] = None,
    /** Transaction id when the source log groups records into
      * transactions (MySQL binlog BEGIN…XID). None = autocommit /
      * non-transactional log; the field is omitted from the JSON.
      */
    txnId: Option[Long] = None)

/** A scalar cell value as it appears in the envelope JSON, plus RAW
  * variants a changelog may carry before type-kernel conversion
  * (FIXTURES.md §2 matrix): raw bytes (CHAR/BINARY), BIT-set bits,
  * and temporal millis. Raw variants never reach the envelope writer —
  * the source converts them via [[TypeKernels.convertCell]] first.
  */
sealed trait EnvelopeValue
object EnvelopeValue {
  case object VNull extends EnvelopeValue
  final case class VString(v: String) extends EnvelopeValue
  final case class VLong(v: Long) extends EnvelopeValue
  final case class VDouble(v: Double) extends EnvelopeValue
  final case class VBool(v: Boolean) extends EnvelopeValue
  final case class VDecimal(v: java.math.BigDecimal) extends EnvelopeValue
  // raw (pre-conversion) cells — base64 bytes, BIT set-bit indices,
  // and DATETIME/DATE/TIMESTAMP epoch millis as the log client
  // decoded them
  final case class VBytes(base64: String) extends EnvelopeValue {
    def bytes: Array[Byte] = java.util.Base64.getDecoder.decode(base64)
  }
  object VBytes {
    def of(b: Array[Byte]): VBytes =
      VBytes(java.util.Base64.getEncoder.encodeToString(b))
  }
  final case class VBits(setBits: Seq[Int]) extends EnvelopeValue
  final case class VDatetime(millis: Long) extends EnvelopeValue
  final case class VDate(millis: Long) extends EnvelopeValue
  final case class VTimestamp(millis: Long) extends EnvelopeValue
}

/** Streaming JSON writer/parser for the envelope. Uses the Jackson
  * core streaming API (ships with Spark) — no databind reflection in
  * the per-event hot path, matching the reference's generator-based
  * writer (AbstractEventWriter.java:16-47).
  */
object EnvelopeCodec {
  private val factory = new JsonFactory()

  /** `{"type":…,"timestamp":…,"databaseName":…,"tableName":…,
    *   "schema":"<StructType.json>","rows":[{…}]}` — one row per event,
    * null columns omitted (reference InsertRowsWriter.java:51).
    */
  private def writeRowObject(g: com.fasterxml.jackson.core.JsonGenerator,
      row: Map[String, EnvelopeValue]): Unit = {
    g.writeStartObject()
    row.foreach { case (k, v) =>
      v match {
        case EnvelopeValue.VNull       => () // omitted, not null-written
        case EnvelopeValue.VString(s)  => g.writeStringField(k, s)
        case EnvelopeValue.VLong(l)    => g.writeNumberField(k, l)
        case EnvelopeValue.VDouble(d)  => g.writeNumberField(k, d)
        case EnvelopeValue.VBool(b)    => g.writeBooleanField(k, b)
        case EnvelopeValue.VDecimal(d) => g.writeNumberField(k, d)
        case raw => throw new IllegalArgumentException(
          s"unconverted raw cell $raw for '$k' — run TypeKernels.convertCell first")
      }
    }
    g.writeEndObject()
  }

  def write(e: CdcEvent): String = {
    val sw = new StringWriter(256)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    g.writeStringField("type", e.eventType)
    g.writeNumberField("timestamp", e.timestamp)
    g.writeStringField("databaseName", e.databaseName)
    g.writeStringField("tableName", e.tableName)
    if (e.schemaJson == null) g.writeNullField("schema")
    else g.writeStringField("schema", e.schemaJson)
    if (e.offset > 0L) g.writeNumberField("offset", e.offset)
    e.txnId.foreach(t => g.writeNumberField("txnId", t))
    g.writeArrayFieldStart("rows")
    writeRowObject(g, e.row)
    g.writeEndArray()
    e.beforeRow.foreach { b =>
      g.writeArrayFieldStart("beforeRows")
      writeRowObject(g, b)
      g.writeEndArray()
    }
    g.writeEndObject()
    g.close()
    sw.toString
  }

  /** Parse an envelope back. Tolerates field reordering; unknown
    * top-level fields are skipped.
    */
  def parse(json: String): CdcEvent = {
    val p = factory.createParser(json)
    var eventType: String = null
    var timestamp: Long = 0L
    var db: String = null
    var table: String = null
    var schema: String = null
    var offset = 0L
    var row: Map[String, EnvelopeValue] = Map.empty
    var beforeRow: Option[Map[String, EnvelopeValue]] = None
    var txnId: Option[Long] = None

    def parseRowArray(): Map[String, EnvelopeValue] = {
      require(p.currentToken() == JsonToken.START_ARRAY, "rows must be an array")
      var m: Map[String, EnvelopeValue] = Map.empty
      while (p.nextToken() != JsonToken.END_ARRAY) {
        require(p.currentToken() == JsonToken.START_OBJECT, "row must be an object")
        val b = mutable.LinkedHashMap.empty[String, EnvelopeValue]
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val col = p.currentName()
          p.nextToken() match {
            case JsonToken.VALUE_NULL   => b += col -> EnvelopeValue.VNull
            case JsonToken.VALUE_STRING => b += col -> EnvelopeValue.VString(p.getText)
            case JsonToken.VALUE_NUMBER_INT => b += col -> EnvelopeValue.VLong(p.getLongValue)
            case JsonToken.VALUE_NUMBER_FLOAT => b += col -> EnvelopeValue.VDouble(p.getDoubleValue)
            case JsonToken.VALUE_TRUE   => b += col -> EnvelopeValue.VBool(true)
            case JsonToken.VALUE_FALSE  => b += col -> EnvelopeValue.VBool(false)
            case t => throw new IllegalArgumentException(s"unsupported cell token $t for $col")
          }
        }
        m = b.toMap
      }
      m
    }

    require(p.nextToken() == JsonToken.START_OBJECT, "envelope must be a JSON object")
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "type"         => eventType = p.getValueAsString
        case "timestamp"    => timestamp = p.getLongValue
        case "databaseName" => db = p.getValueAsString
        case "tableName"    => table = p.getValueAsString
        case "schema"       =>
          schema = if (p.currentToken() == JsonToken.VALUE_NULL) null else p.getValueAsString
        case "offset"       => offset = p.getLongValue
        case "txnId"        => txnId = Some(p.getLongValue)
        case "rows"         => row = parseRowArray()
        case "beforeRows"   => beforeRow = Some(parseRowArray())
        case _ => p.skipChildren()
      }
    }
    p.close()
    CdcEvent(eventType, timestamp, db, table, schema, row, offset, beforeRow, txnId)
  }
}
