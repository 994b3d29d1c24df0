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
    row: Map[String, EnvelopeValue])

/** A scalar cell value as it appears in the envelope JSON. */
sealed trait EnvelopeValue
object EnvelopeValue {
  case object VNull extends EnvelopeValue
  final case class VString(v: String) extends EnvelopeValue
  final case class VLong(v: Long) extends EnvelopeValue
  final case class VDouble(v: Double) extends EnvelopeValue
  final case class VBool(v: Boolean) extends EnvelopeValue
  final case class VDecimal(v: java.math.BigDecimal) extends EnvelopeValue
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
    g.writeArrayFieldStart("rows")
    g.writeStartObject()
    e.row.foreach { case (k, v) =>
      v match {
        case EnvelopeValue.VNull       => () // omitted, not null-written
        case EnvelopeValue.VString(s)  => g.writeStringField(k, s)
        case EnvelopeValue.VLong(l)    => g.writeNumberField(k, l)
        case EnvelopeValue.VDouble(d)  => g.writeNumberField(k, d)
        case EnvelopeValue.VBool(b)    => g.writeBooleanField(k, b)
        case EnvelopeValue.VDecimal(d) => g.writeNumberField(k, d)
      }
    }
    g.writeEndObject()
    g.writeEndArray()
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
    var row: Map[String, EnvelopeValue] = Map.empty

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
        case "rows" =>
          require(p.currentToken() == JsonToken.START_ARRAY, "rows must be an array")
          while (p.nextToken() != JsonToken.END_ARRAY) {
            require(p.currentToken() == JsonToken.START_OBJECT, "row must be an object")
            val m = mutable.LinkedHashMap.empty[String, EnvelopeValue]
            while (p.nextToken() != JsonToken.END_OBJECT) {
              val col = p.currentName()
              p.nextToken() match {
                case JsonToken.VALUE_NULL   => m += col -> EnvelopeValue.VNull
                case JsonToken.VALUE_STRING => m += col -> EnvelopeValue.VString(p.getText)
                case JsonToken.VALUE_NUMBER_INT => m += col -> EnvelopeValue.VLong(p.getLongValue)
                case JsonToken.VALUE_NUMBER_FLOAT => m += col -> EnvelopeValue.VDouble(p.getDoubleValue)
                case JsonToken.VALUE_TRUE   => m += col -> EnvelopeValue.VBool(true)
                case JsonToken.VALUE_FALSE  => m += col -> EnvelopeValue.VBool(false)
                case t => throw new IllegalArgumentException(s"unsupported cell token $t for $col")
              }
            }
            row = m.toMap
          }
        case _ => p.skipChildren()
      }
    }
    p.close()
    CdcEvent(eventType, timestamp, db, table, schema, row)
  }
}
