package graft.llm

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import TextOps.{NumHashes, P, perms}

/** Typed `Aggregator` computing a k=16 MinHash signature from a group
  * of hashed shingles — the UDAF surface of the dedup family
  * (SURVEY §2.9: aggregate extension → `Aggregator[IN, BUF, OUT]`).
  *
  * Produces EXACTLY the same signature as the SQL formulation in
  * [[DedupQueries]] (`min((a_i * h + b_i) % P)` per permutation, over
  * `h = shingleHash % P`) — the Dataset-typed API for users who build
  * pipelines over `Dataset[T]` instead of SQL. The buffer is one
  * fixed-size long array per group; merge is elementwise min, so the
  * aggregation is partial+final map-side combinable like any Spark
  * aggregate.
  */
class MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    val h = shingleHash % P
    var i = 0
    while (i < NumHashes) {
      val (a, b) = perms(i)
      val v = (a * h + b) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
