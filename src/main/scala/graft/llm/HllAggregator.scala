package graft.llm

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a HyperLogLog cardinality estimate
  * over a group of pre-hashed values — the mergeable-sketch UDAF the
  * distinct-count family needs at 100 TB, where an exact
  * `count(distinct)` forces a full shuffle of every distinct value and
  * a sketch is a fixed 2^p-register buffer with map-side combine.
  *
  * Standard dense HLL (Flajolet et al.): register index = low p bits
  * of the 64-bit input hash, rho = leading-zero run of the remaining
  * bits + 1, merge = elementwise max (order-free, so the estimate is
  * DETERMINISTIC under any partitioning), finish = harmonic-mean
  * estimator with the small-range linear-counting correction. Callers
  * feed an already-uniform 64-bit hash (e.g. `xxhash64`, or
  * [[TextOps.hash32]] for the md5-derived token hashes); the
  * aggregator does not re-hash.
  *
  * Error: sigma ≈ 1.04/sqrt(2^p); p=12 → 4096 registers ≈ 1.6%.
  */
class HllAggregator(p: Int = 12) extends Aggregator[Long, Array[Byte], Long] {

  require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash & (m - 1)).toInt
    val rest = hash >>> p
    // rho: position of the first 1-bit in the remaining 64-p bits
    val rho = (java.lang.Long.numberOfTrailingZeros(rest | (1L << (64 - p))) + 1)
      .toByte
    if (rho > buf(idx)) buf(idx) = rho
    buf
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Byte]): Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -r(i).toDouble)
      if (r(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}

/** [[HllAggregator]] variant that finishes with the RAW REGISTER
  * array (one rho per register, as longs) instead of the estimate —
  * the auditable surface: the oracle gate re-derives every register
  * from the same hashes in DuckDB (idx = low p bits, rho = trailing
  * zeros + 1, per-register max) and pins the full sketch state
  * bit-exactly, which is far stronger evidence than comparing two
  * floating-point estimates. Same reduce/merge as the estimator, so a
  * green gate covers the distributed partial+final merge path too.
  */
class HllSketchAggregator(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Seq[Long]] {
  private val inner = new HllAggregator(p)
  override def zero: Array[Byte] = inner.zero
  override def reduce(buf: Array[Byte], hash: Long): Array[Byte] =
    inner.reduce(buf, hash)
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    inner.merge(x, y)
  override def finish(r: Array[Byte]): Seq[Long] =
    r.toSeq.map(_.toLong)
  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
