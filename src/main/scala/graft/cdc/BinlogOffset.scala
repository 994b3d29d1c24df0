package graft.cdc

/** The CDC stream's coordinate system: (fileId, pos) packed into one
  * long as `fileId * 10^13 + pos`.
  *
  * Same packing as the reference (protocols.scala:24-26 packs via
  * string concatenation with %013d; :6-13 decodes by splitting the
  * last 13 digits; :15-21 maps fileId ⇄ `<prefix>.%06d` filenames) —
  * but done arithmetically, with the `pos < 10^13` constraint the
  * reference leaves implicit made an explicit guard (it silently
  * corrupts offsets past that boundary).
  */
final case class BinlogOffset(fileId: Long, pos: Long) extends Ordered[BinlogOffset] {
  require(fileId >= 0, s"fileId must be >= 0, got $fileId")
  require(pos >= 0 && pos < BinlogOffset.FilePosRadix,
    s"pos must be in [0, 10^13), got $pos")
  require(fileId <= BinlogOffset.MaxFileId,
    s"fileId must be <= ${BinlogOffset.MaxFileId} to pack into a long, got $fileId")

  def packed: Long = fileId * BinlogOffset.FilePosRadix + pos

  def filename(prefix: String): String = f"$prefix.$fileId%06d"

  override def compare(that: BinlogOffset): Int =
    java.lang.Long.compare(packed, that.packed)
}

object BinlogOffset {
  /** 10^13 — positions occupy the low 13 decimal digits. */
  val FilePosRadix: Long = 10000000000000L

  /** Largest fileId for which EVERY pos < 10^13 still packs into a
    * signed long (Long.MaxValue/radix itself overflows for high pos).
    */
  val MaxFileId: Long = Long.MaxValue / FilePosRadix - 1 // 922336

  def unpack(packed: Long): BinlogOffset = {
    require(packed >= 0, s"packed offset must be >= 0, got $packed")
    BinlogOffset(packed / FilePosRadix, packed % FilePosRadix)
  }

  /** fileId from a `<prefix>.<%06d>` binlog filename. */
  def fileIdOf(filename: String): Long = {
    val dot = filename.lastIndexOf('.')
    require(dot >= 0 && dot < filename.length - 1, s"not a binlog filename: $filename")
    filename.substring(dot + 1).toLong
  }
}
