package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level kernels for the CDC offset coordinate system.
  *
  * The reference packs (binlog fileId, position) into one long as
  * `fileId * 10^13 + pos` (reference protocols.scala:24-26, decode
  * :6-13, filename mapping `prefix.%06d` :15-21). These are expressed
  * as Catalyst column expressions (codegen'd builtins, no UDF) so they
  * run inside WholeStageCodegen at any scale; the pure-Scala twin used
  * by the streaming source lives in [[graft.cdc.BinlogOffset]].
  */
object CdcColumns {
  /** 10^13 — positions must stay below this (guarded in the Scala twin). */
  val FilePosRadix: Long = 10000000000000L

  def packOffset(fileId: Column, pos: Column): Column =
    fileId.cast("long") * lit(FilePosRadix) + pos.cast("long")

  /** Integer division via exact decimal arithmetic — plain `/` would be
    * double division, which loses integer precision past 2^53. */
  def offsetFileId(offset: Column): Column =
    floor(offset.cast("decimal(38,0)") / lit(FilePosRadix)).cast("long")

  def offsetPos(offset: Column): Column =
    offset.cast("long") % lit(FilePosRadix)

  /** Binlog filename for a fileId: `<prefix>.%06d`. */
  def offsetFilename(prefix: String, fileId: Column): Column =
    format_string(s"$prefix.%06d", fileId)
}
