package graft.cdc

import java.util.{BitSet => JBitSet, TimeZone}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeKernelsSpec extends AnyFunSuite {

  test("BitSet(0) → boolean (MySQL BIT(1))") {
    val bs = new JBitSet(); bs.set(0)
    assert(TypeKernels.bitSetToBoolean(bs) === true)
    assert(TypeKernels.bitSetToBoolean(new JBitSet()) === false)
  }

  test("BitSet → long little-endian reassembly (MySQL BIT(n))") {
    val bs = new JBitSet()
    bs.set(0); bs.set(3); bs.set(7) // 0b10001001 = 137
    assert(TypeKernels.bitSetToLong(bs) === 137L)
    val high = new JBitSet(); high.set(63)
    assert(TypeKernels.bitSetToLong(high) === Long.MinValue) // bit 63
    assert(TypeKernels.bitSetToLong(new JBitSet()) === 0L)
  }

  test("convertBitSet dispatch: bool, long, reject others") {
    val bs = new JBitSet(); bs.set(1)
    assert(TypeKernels.convertBitSet(bs, LongType) === 2L)
    assert(TypeKernels.convertBitSet(bs, BooleanType) === false)
    intercept[IllegalArgumentException](TypeKernels.convertBitSet(bs, StringType))
  }

  test("charset decode honors per-column conf with wildcard fallback") {
    val bytes = "héllo".getBytes("ISO-8859-1")
    assert(TypeKernels.decodeBytes(bytes, "name",
      Map("binlog.field.decode.name" -> "ISO-8859-1")) === "héllo")
    assert(TypeKernels.decodeBytes(bytes, "other",
      Map("binlog.field.decode.*" -> "ISO-8859-1")) === "héllo")
    // default utf-8 mangles latin-1 bytes — asserting the default path runs
    assert(TypeKernels.decodeBytes("plain".getBytes("UTF-8"), "x", Map.empty) === "plain")
  }

  test("DATETIME compensation subtracts the decoding zone's raw offset") {
    val tz = TimeZone.getTimeZone("GMT+08:00")
    val decoded = new java.util.Date(1592451420000L)
    val fixed = TypeKernels.compensateDatetime(decoded, tz)
    assert(decoded.getTime - fixed.getTime === 8L * 3600 * 1000)
  }

  test("timestamp/date formatting respects session time zone") {
    val ts = new java.sql.Timestamp(0L)
    assert(TypeKernels.formatTimestamp(ts, "UTC").startsWith("1970-01-01T00:00:00.000"))
    assert(TypeKernels.formatDate(new java.sql.Date(0L), "UTC") === "1970-01-01")
  }

  test("toEnvelopeValue full dispatch") {
    import EnvelopeValue._
    val conf = Map.empty[String, String]
    assert(TypeKernels.toEnvelopeValue(null, "c", StringType, "UTC", conf) === VNull)
    assert(TypeKernels.toEnvelopeValue("s", "c", StringType, "UTC", conf) === VString("s"))
    assert(TypeKernels.toEnvelopeValue(7, "c", IntegerType, "UTC", conf) === VLong(7))
    assert(TypeKernels.toEnvelopeValue(2.5, "c", DoubleType, "UTC", conf) === VDouble(2.5))
    val bs = new JBitSet(); bs.set(0)
    assert(TypeKernels.toEnvelopeValue(bs, "c", BooleanType, "UTC", conf) === VBool(true))
    assert(TypeKernels.toEnvelopeValue("x".getBytes, "c", StringType, "UTC", conf) === VString("x"))
  }
}
