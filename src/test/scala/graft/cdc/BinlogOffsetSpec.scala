package graft.cdc

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class BinlogOffsetSpec extends AnyFunSuite {

  private val fileIds = Gen.chooseNum(0L, BinlogOffset.MaxFileId)
  private val positions = Gen.chooseNum(0L, BinlogOffset.FilePosRadix - 1)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("pack/unpack round-trips over the full domain") {
    check(Prop.forAllNoShrink(fileIds, positions) { (f, p) =>
      BinlogOffset.unpack(BinlogOffset(f, p).packed) == BinlogOffset(f, p)
    })
  }

  test("packed ordering == lexicographic (fileId, pos) ordering") {
    check(Prop.forAllNoShrink(fileIds, positions, fileIds, positions) { (f1, p1, f2, p2) =>
      val a = BinlogOffset(f1, p1); val b = BinlogOffset(f2, p2)
      val lex = implicitly[Ordering[(Long, Long)]].compare((f1, p1), (f2, p2))
      Integer.signum(a.compare(b)) == Integer.signum(lex)
    })
  }

  test("10^13 boundary: pos = radix-1 packs, pos = radix rejected") {
    val max = BinlogOffset(7, BinlogOffset.FilePosRadix - 1)
    assert(BinlogOffset.unpack(max.packed) === max)
    intercept[IllegalArgumentException](BinlogOffset(7, BinlogOffset.FilePosRadix))
  }

  test("fileId beyond packable range rejected (silent overflow in reference)") {
    intercept[IllegalArgumentException](BinlogOffset(BinlogOffset.MaxFileId + 1, 0))
  }

  test("filename mapping is %06d (reference protocols.scala:15-21)") {
    assert(BinlogOffset(3, 1).filename("mysql-bin") === "mysql-bin.000003")
    assert(BinlogOffset(123456, 1).filename("b") === "b.123456")
    assert(BinlogOffset.fileIdOf("mysql-bin.000042") === 42L)
  }

  test("negative inputs rejected") {
    intercept[IllegalArgumentException](BinlogOffset(-1, 0))
    intercept[IllegalArgumentException](BinlogOffset(0, -1))
    intercept[IllegalArgumentException](BinlogOffset.unpack(-5))
  }
}
