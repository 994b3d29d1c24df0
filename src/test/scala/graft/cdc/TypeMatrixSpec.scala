package graft.cdc

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSuite
import EnvelopeValue._

/** FIXTURES.md §2 golden matrix: raw changelog cells (bytes / BIT /
  * DATETIME / DATE / TIMESTAMP) travel through the REAL source path —
  * partition reader → TypeKernels → envelope — driven by the embedded
  * schema and `binlog.field.decode.*` options. Plus the §1 script_file
  * schema assertions (tinyint(1) → IntegerType) and the before-image /
  * partial-row-image (F4/T2) behaviors.
  */
class TypeMatrixSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  /** script_file-like table schema: tinyint(1) maps to IntegerType
    * (reference tinyInt1isBit=false, BinlogSuite.scala:210-215).
    */
  private val typedSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("has_caret", IntegerType), // tinyint(1)
    StructField("bin", StringType),        // binary, charset-decoded
    StructField("bit1", BooleanType),      // bit(1)
    StructField("bit8", LongType),         // bit(8)
    StructField("born", TimestampType),    // datetime (TZ-compensated)
    StructField("seen", TimestampType),    // timestamp
    StructField("day", DateType)))         // date

  private def writeChangelog(records: Seq[ChangelogRecord]): String = {
    val dir = Files.createTempDirectory("typed-log").toString
    val sw = new java.io.StringWriter()
    val g = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    g.writeStartObject()
    g.writeStringField("graft.typed", typedSchema.json)
    g.writeEndObject()
    g.close()
    Files.write(new File(dir, "schemas.json").toPath,
      sw.toString.getBytes(StandardCharsets.UTF_8))
    val body = records.map(ChangelogRecord.write).mkString("", "\n", "\n")
    Files.write(new File(dir, "graft-bin.000001").toPath,
      body.getBytes(StandardCharsets.UTF_8))
    dir
  }

  private def readEnvelopes(dir: String, opts: Map[String, String] = Map.empty): Seq[CdcEvent] = {
    var r = spark.read.format("graft-binlog").option("path", dir)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load().select("value").as[String].collect().toSeq
      .map(EnvelopeCodec.parse).sortBy(_.offset)
  }

  test("golden per-type conversion matrix through the source") {
    // "héllo" encoded in latin1 — decodes correctly only with the
    // binlog.field.decode.bin=ISO-8859-1 option
    val latin1Bytes = "héllo".getBytes(StandardCharsets.ISO_8859_1)
    val dir = writeChangelog(Seq(ChangelogRecord(1, "insert", "graft", "typed", 1000L, Map(
      "id" -> VLong(2),
      "name" -> VString("jack2"),
      "has_caret" -> VLong(1),
      "bin" -> VBytes.of(latin1Bytes),
      "bit1" -> VBits(Seq(0)),
      "bit8" -> VBits(Seq(0, 3)),       // bits 0+3 → 1 + 8 = 9 little-endian
      "born" -> VDatetime(86400000L),   // 1970-01-02T00:00 as decoded in JVM-local
      "seen" -> VTimestamp(1592451420000L),
      "day" -> VDate(86400000L)))))

    val ev = readEnvelopes(dir,
      Map("binlog.field.decode.bin" -> "ISO-8859-1")).head
    assert(ev.eventType === "insert")
    assert(ev.row("id") === VLong(2))
    assert(ev.row("name") === VString("jack2"))
    // tinyint(1) stays an integer value, and the EMBEDDED schema says integer
    assert(ev.row("has_caret") === VLong(1))
    val embedded = DataType.fromJson(ev.schemaJson).asInstanceOf[StructType]
    assert(embedded("has_caret").dataType === IntegerType)
    // charset-decoded bytes
    assert(ev.row("bin") === VString("héllo"))
    // BIT dispatch by schema type
    assert(ev.row("bit1") === VBool(true))
    assert(ev.row("bit8") === VLong(9L))
    // temporal kernels (UTC session zone; JVM-local compensation for datetime)
    val expectBorn = TypeKernels.formatTimestamp(
      new java.sql.Timestamp(TypeKernels.compensateDatetime(
        new java.util.Date(86400000L), java.util.TimeZone.getDefault).getTime), "UTC")
    assert(ev.row("born") === VString(expectBorn))
    assert(ev.row("seen") === VString("2020-06-18T03:37:00.000Z"))
    assert(ev.row("day") === VString("1970-01-02"))
  }

  test("default charset is utf-8; wildcard binlog.field.decode.* applies") {
    val utf8 = "héllo".getBytes(StandardCharsets.UTF_8)
    val dir = writeChangelog(Seq(ChangelogRecord(1, "insert", "graft", "typed", 1L,
      Map("id" -> VLong(1), "bin" -> VBytes.of(utf8)))))
    assert(readEnvelopes(dir).head.row("bin") === VString("héllo"))
    // wildcard forces latin1 → mojibake (2 chars per é byte pair)
    val wild = readEnvelopes(dir,
      Map("binlog.field.decode.*" -> "ISO-8859-1")).head
    assert(wild.row("bin") === VString(new String(utf8, StandardCharsets.ISO_8859_1)))
  }

  test("partial row images (F4) pass through as column subsets") {
    // binlog_row_image=minimal: update carries only changed columns
    val dir = writeChangelog(Seq(ChangelogRecord(1, "update", "graft", "typed", 2L,
      Map("id" -> VLong(2), "name" -> VString("jack3")))))
    val ev = readEnvelopes(dir).head
    assert(ev.row.keySet === Set("id", "name"))
    // typed expansion yields nulls for the absent columns
    val df = spark.read.format("graft-binlog").option("path", dir).load()
    val parsed = graft.streaming.CdcStream.parsed(df, typedSchema)
    val row = parsed.select("id", "name", "has_caret", "bit8").collect().head
    assert(row.getInt(0) === 2 && row.getString(1) === "jack3")
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("before-image (T2) is emitted only under includeBeforeImage") {
    val rec = ChangelogRecord(1, "update", "graft", "typed", 3L,
      Map("id" -> VLong(2), "name" -> VString("after")),
      before = Some(Map("id" -> VLong(2), "name" -> VString("before"))))
    val dir = writeChangelog(Seq(rec))
    // default: dropped (reference behavior, UpdateRowsWriter.java:54-57)
    assert(readEnvelopes(dir).head.beforeRow === None)
    // opt-in: carried, with kernels applied
    val ev = readEnvelopes(dir, Map("includeBeforeImage" -> "true")).head
    assert(ev.beforeRow === Some(Map("id" -> VLong(2), "name" -> VString("before"))))
    // and it round-trips through the envelope codec
    assert(EnvelopeCodec.parse(EnvelopeCodec.write(ev)) === ev)
  }

  test("changelog record codec round-trips raw cells and before-images") {
    val rec = ChangelogRecord(7, "update", "g", "t", 9L,
      Map("a" -> VBytes.of(Array[Byte](1, 2, 3)), "b" -> VBits(Seq(1, 5)),
        "c" -> VDatetime(123L), "d" -> VDate(456L), "e" -> VTimestamp(789L)),
      before = Some(Map("a" -> VString("x"))))
    assert(ChangelogRecord.parse(ChangelogRecord.write(rec)) === rec)
  }
}
