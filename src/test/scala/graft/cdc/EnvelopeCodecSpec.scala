package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

class EnvelopeCodecSpec extends AnyFunSuite {
  import EnvelopeValue._

  private val schemaJson =
    """{"type":"struct","fields":[{"name":"id","type":"integer","nullable":false,"metadata":{}},{"name":"name","type":"string","nullable":true,"metadata":{}},{"name":"has_caret","type":"integer","nullable":true,"metadata":{}}]}"""

  test("golden envelope shape matches FIXTURES.md §3 field order") {
    val e = CdcEvent("insert", 1592451420000L, "mbcj_test", "script_file",
      schemaJson, scala.collection.immutable.ListMap(
        "id" -> VLong(2), "name" -> VString("jack2"), "has_caret" -> VLong(1)))
    val json = EnvelopeCodec.write(e)
    assert(json.startsWith("""{"type":"insert","timestamp":1592451420000,"databaseName":"mbcj_test","tableName":"script_file","schema":"{\"type\":\"struct\""""))
    assert(json.contains(""""rows":[{"id":2,"name":"jack2","has_caret":1}]"""))
  }

  test("write → parse round-trips all value kinds") {
    val e = CdcEvent("update", 42L, "db", "t", schemaJson, Map(
      "s" -> VString("héllo\n\"quoted\""),
      "l" -> VLong(Long.MaxValue),
      "d" -> VDouble(3.5),
      "b" -> VBool(true),
      "dec" -> VDecimal(new java.math.BigDecimal("12345.6789"))))
    val back = EnvelopeCodec.parse(EnvelopeCodec.write(e))
    assert(back.eventType === "update")
    assert(back.timestamp === 42L)
    assert(back.schemaJson === schemaJson)
    assert(back.row("s") === VString("héllo\n\"quoted\""))
    assert(back.row("l") === VLong(Long.MaxValue))
    assert(back.row("b") === VBool(true))
    // decimals come back as the closest numeric token
    assert(back.row("dec") === VDouble(12345.6789))
  }

  test("null cells are omitted from rows (reference InsertRowsWriter.java:51)") {
    val e = CdcEvent("insert", 1L, "db", "t", null, Map(
      "a" -> VLong(1), "b" -> VNull))
    val json = EnvelopeCodec.write(e)
    assert(json.contains(""""rows":[{"a":1}]"""))
    assert(!json.contains("\"b\""))
    assert(json.contains(""""schema":null"""))
  }

  test("parse tolerates unknown fields and reordering") {
    val json = """{"timestamp":5,"extra":{"x":[1,2]},"type":"delete","databaseName":"d","tableName":"t","schema":null,"rows":[{"k":9}]}"""
    val e = EnvelopeCodec.parse(json)
    assert(e.eventType === "delete")
    assert(e.row === Map("k" -> VLong(9)))
  }

  test("embedded schema is valid Spark StructType JSON") {
    val dt = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
    assert(dt.isInstanceOf[org.apache.spark.sql.types.StructType])
    val st = dt.asInstanceOf[org.apache.spark.sql.types.StructType]
    // tinyint(1) → IntegerType, the reference's golden type-mapping check
    assert(st.fields(2).dataType === org.apache.spark.sql.types.IntegerType)
  }
}
