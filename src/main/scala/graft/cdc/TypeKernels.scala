package graft.cdc

import java.nio.charset.Charset
import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter
import java.util.{BitSet => JBitSet, Date, TimeZone}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.types._

/** Scalar conversion kernels for turning raw change-log cell values
  * into envelope values — the semantics of the reference's
  * MySQLCDCUtils.getWritableObject (MySQLCDCUtils.java:28-84) driven
  * by SchemaTool type tests (SchemaTool.scala:19-41), re-expressed as
  * pure functions with explicit parameters instead of thread-local
  * session state.
  */
object TypeKernels {

  /** CHAR/BINARY columns arrive as byte[]; decode with the per-column
    * charset (`binlog.field.decode.<col>`, wildcard
    * `binlog.field.decode.*`, default UTF-8 — reference
    * SchemaTool.scala:43-50, MySQLCDCUtils.java:35-37).
    */
  def decodeBytes(bytes: Array[Byte], col: String,
      charsetConf: Map[String, String]): String = {
    val cs = charsetConf.getOrElse(s"binlog.field.decode.$col",
      charsetConf.getOrElse("binlog.field.decode.*", "utf-8"))
    new String(bytes, Charset.forName(cs))
  }

  /** MySQL BIT(1) → BooleanType: bit 0 (MySQLCDCUtils.java:39-43). */
  def bitSetToBoolean(bs: JBitSet): Boolean = bs.get(0)

  /** MySQL BIT(n>1) → LongType: little-endian reassembly — bit i of the
    * BitSet is bit i of the long (MySQLCDCUtils.java:45-53).
    */
  def bitSetToLong(bs: JBitSet): Long = {
    var v = 0L
    var i = bs.nextSetBit(0)
    while (i >= 0 && i < 64) {
      v |= (1L << i)
      i = bs.nextSetBit(i + 1)
    }
    v
  }

  /** Dispatch a BitSet by target Spark type (SchemaTool.scala:31-37;
    * anything else throws, MySQLCDCUtils.java:54).
    */
  def convertBitSet(bs: JBitSet, dt: DataType): Any = dt match {
    case BooleanType => bitSetToBoolean(bs)
    case LongType    => bitSetToLong(bs)
    case other => throw new IllegalArgumentException(
      s"cannot serialize BIT column as $other (only BooleanType/LongType)")
  }

  /** Thread-safe cached formatters — a SimpleDateFormat per value would
    * be a hot-path allocation once kernels sit in the feed.
    */
  private val formatters = new ConcurrentHashMap[(String, String), DateTimeFormatter]()
  private def formatter(pattern: String, tz: String): DateTimeFormatter =
    formatters.computeIfAbsent((pattern, tz),
      // SHORT_IDS accepts legacy three-letter IDs ("EST") while still
      // REJECTING misspelled zones (TimeZone.getTimeZone would
      // silently map typos to GMT)
      _ => DateTimeFormatter.ofPattern(pattern)
        .withZone(ZoneId.of(tz, ZoneId.SHORT_IDS)))

  /** TIMESTAMP values: format in the session time zone
    * (MySQLCDCUtils.java:57-61 via Spark JSONOptions.timestampFormat).
    */
  def formatTimestamp(ts: java.sql.Timestamp, sessionTz: String,
      pattern: String = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"): String =
    formatter(pattern, sessionTz).format(Instant.ofEpochMilli(ts.getTime))

  /** MySQL DATETIME is time-zone-less, but log clients decode it in the
    * JVM's local zone; compensate by subtracting the raw zone offset
    * before formatting (MySQLCDCUtils.java:63-69 does the same with
    * joda). `decodedIn` is the zone the client used (the JVM default in
    * the reference).
    */
  def compensateDatetime(d: Date, decodedIn: TimeZone): Date =
    new Date(d.getTime - decodedIn.getRawOffset)

  /** DATE values → `yyyy-MM-dd` in the session zone
    * (MySQLCDCUtils.java:71-81).
    */
  def formatDate(d: Date, sessionTz: String): String =
    formatter("yyyy-MM-dd", sessionTz).format(Instant.ofEpochMilli(d.getTime))

  /** Full cell conversion: raw decoded value + target Spark type →
    * envelope value. Mirrors MySQLCDCUtils.getWritableObject's
    * dispatch order (byte[] first, then BitSet, then temporal, then
    * pass-through).
    */
  def toEnvelopeValue(raw: Any, col: String, dt: DataType,
      sessionTz: String, charsetConf: Map[String, String]): EnvelopeValue = raw match {
    case null => EnvelopeValue.VNull
    case b: Array[Byte] => EnvelopeValue.VString(decodeBytes(b, col, charsetConf))
    case bs: JBitSet => convertBitSet(bs, dt) match {
      case b: Boolean => EnvelopeValue.VBool(b)
      case l: Long    => EnvelopeValue.VLong(l)
    }
    case t: java.sql.Timestamp => EnvelopeValue.VString(formatTimestamp(t, sessionTz))
    case d: java.sql.Date => EnvelopeValue.VString(formatDate(d, sessionTz))
    case d: Date if dt == TimestampType =>
      EnvelopeValue.VString(formatTimestamp(
        new java.sql.Timestamp(compensateDatetime(d, TimeZone.getDefault).getTime), sessionTz))
    case d: Date => EnvelopeValue.VString(formatDate(d, sessionTz))
    case s: String => EnvelopeValue.VString(s)
    case b: Boolean => EnvelopeValue.VBool(b)
    case i: Int => EnvelopeValue.VLong(i.toLong)
    case l: Long => EnvelopeValue.VLong(l)
    case s: Short => EnvelopeValue.VLong(s.toLong)
    case f: Float => EnvelopeValue.VDouble(f.toDouble)
    case d: Double => EnvelopeValue.VDouble(d)
    case d: java.math.BigDecimal => EnvelopeValue.VDecimal(d)
    case d: BigDecimal => EnvelopeValue.VDecimal(d.bigDecimal)
    case other => EnvelopeValue.VString(other.toString)
  }

  /** Convert a changelog cell that may carry a RAW variant
    * ([[EnvelopeValue.VBytes]]/VBits/VDatetime/VDate/VTimestamp) into
    * its envelope form, driven by the table schema's target type and
    * the source's `binlog.field.decode.*` options — the feed-side
    * wiring of the kernels above (reference wires this inside
    * InsertRowsWriter via MySQLCDCUtils; we do it in the partition
    * reader, once per emitted cell).
    */
  def convertCell(v: EnvelopeValue, col: String, dt: DataType,
      sessionTz: String, charsetConf: Map[String, String]): EnvelopeValue = v match {
    case b: EnvelopeValue.VBytes =>
      EnvelopeValue.VString(decodeBytes(b.bytes, col, charsetConf))
    case EnvelopeValue.VBits(bits) =>
      val bs = new JBitSet()
      bits.foreach(bs.set)
      convertBitSet(bs, dt) match {
        case b: Boolean => EnvelopeValue.VBool(b)
        case l: Long    => EnvelopeValue.VLong(l)
      }
    case EnvelopeValue.VDatetime(ms) =>
      // DATETIME is zone-less; the log client decoded it in the JVM
      // default zone — compensate, then format (CDCU:63-69)
      val comp = compensateDatetime(new Date(ms), TimeZone.getDefault)
      EnvelopeValue.VString(formatTimestamp(new java.sql.Timestamp(comp.getTime), sessionTz))
    case EnvelopeValue.VTimestamp(ms) =>
      EnvelopeValue.VString(formatTimestamp(new java.sql.Timestamp(ms), sessionTz))
    case EnvelopeValue.VDate(ms) =>
      EnvelopeValue.VString(formatDate(new Date(ms), sessionTz))
    case converted => converted
  }

  private def isRaw(v: EnvelopeValue): Boolean = v match {
    case _: EnvelopeValue.VBytes | _: EnvelopeValue.VBits |
         _: EnvelopeValue.VDatetime | _: EnvelopeValue.VDate |
         _: EnvelopeValue.VTimestamp => true
    case _ => false
  }

  /** Convert every raw cell of a row; rows with no raw cells return
    * unchanged (zero-allocation fast path — the common case in the
    * feed hot loop). `schema` may be null (e.g. the WAL path embeds
    * none) — raw BIT cells then default to LongType.
    */
  def convertRow(row: Map[String, EnvelopeValue], schema: StructType,
      sessionTz: String, charsetConf: Map[String, String]): Map[String, EnvelopeValue] = {
    if (!row.exists(c => isRaw(c._2))) return row
    val types: Map[String, DataType] =
      if (schema == null) Map.empty
      else schema.fields.map(f => f.name -> f.dataType).toMap
    row.map { case (col, v) =>
      col -> convertCell(v, col, types.getOrElse(col, LongType), sessionTz, charsetConf)
    }
  }
}
