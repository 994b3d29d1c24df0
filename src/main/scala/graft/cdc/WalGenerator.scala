package graft.cdc

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}

/** Deterministic multi-region WAL fixture generator: shards the
  * `events` fixture into `<outDir>/<region>/` sub-changelogs of HBase
  * put/delete mutations (region = user_id hash bucket — the analog of
  * an HBase region split by rowkey). Rows use the HBase envelope shape:
  * `rowkey` + `family:qualifier` string cells (PutWriter.java:25-39).
  *
  * Like [[ChangelogGenerator]], this is a driver-side fixture WRITER
  * (test scale); the reading path is what is built for scale.
  */
object WalGenerator {

  /** `cellPerRecord=true` writes the RAW-cell log shape: one record per
    * `family:qualifier` cell (rowkey repeated), cells of one mutation
    * consecutive and never split across a file roll — the wire form the
    * reference's read-path fold reassembles (HBaseWALClient.scala:157-203).
    * The reader groups them back with `groupRawCells=true`.
    */
  def generate(events: DataFrame, outDir: String, numRegions: Int,
      recordsPerFile: Long,
      prefix: String = ChangelogFiles.DefaultPrefix,
      cellPerRecord: Boolean = false): Unit = {
    require(numRegions > 0)
    val root = new File(outDir)
    root.mkdirs()

    final class RegionWriter(val region: String) {
      val dir = new File(root, region)
      dir.mkdirs()
      var fileId = 1L
      var posInFile = 0L
      var out: BufferedWriter = _
      val counts = scala.collection.mutable
        .LinkedHashMap.empty[String, (File, Long, Map[String, Long])]
      // per-file mutation-start positions (raw-cell mode): recorded at
      // write time so grouping-mode batch alignment on completed files
      // is manifest-metadata-only (no read-path scan). A bound is
      // recorded only when the (op, rowkey, ts) KEY differs from the
      // previous mutation's — the read-path fold (and the scan-path
      // boundary index) merge adjacent same-key mutations, so a
      // per-mutation bound would be a phantom the scanner never derives
      val fileBounds = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
      var bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
      var lastKey: (String, String, Long) = null
      var current: File = _
      def roll(): Unit = {
        if (out != null) {
          out.close()
          counts += current.getName ->
            (current, posInFile, Map(s"wal.$region" -> posInFile))
          if (cellPerRecord) fileBounds += current.getName -> bounds.toSeq
          bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        lastKey = null // first record of a file is always a boundary
        current = new File(dir, f"$prefix.$fileId%06d")
        out = new BufferedWriter(new OutputStreamWriter(
          new FileOutputStream(current), StandardCharsets.UTF_8))
      }
      roll()
      private def emit(op: String, ts: Long, row: Map[String, EnvelopeValue]): Unit = {
        posInFile += 1
        out.write(ChangelogRecord.write(
          ChangelogRecord(posInFile, op, "wal", region, ts, row)))
        out.write("\n")
      }
      def write(r: Row): Unit = {
        val et = r.getString(2)
        val op = if (et == "error") "delete" else "put"
        val rowkey = EnvelopeValue.VString(r.getLong(1).toString)
        val cells = Seq[(String, EnvelopeValue)](
          "d:event_id" -> EnvelopeValue.VString(r.getLong(0).toString),
          "d:event_type" -> EnvelopeValue.VString(et),
          "d:value" -> EnvelopeValue.VString(r.getDouble(3).toString))
        if (!cellPerRecord) {
          if (posInFile >= recordsPerFile) { fileId += 1; roll(); posInFile = 0 }
          emit(op, r.getLong(4), (("rowkey" -> rowkey) +: cells).toMap)
        } else {
          // roll BEFORE the mutation: its cells must stay in one file
          if (posInFile > 0 && posInFile + cells.size > recordsPerFile) {
            fileId += 1; roll(); posInFile = 0
          }
          val key = (op, rowkey.v, r.getLong(4))
          if (key != lastKey) bounds += posInFile + 1 // first cell of a NEW key
          lastKey = key
          cells.foreach { case (q, v) =>
            emit(op, r.getLong(4), Map("rowkey" -> rowkey, q -> v))
          }
        }
      }
      def close(): Unit = {
        out.close()
        counts += current.getName ->
          (current, posInFile, Map(s"wal.$region" -> posInFile))
        if (cellPerRecord) fileBounds += current.getName -> bounds.toSeq
        ChangelogFiles.writeManifest(dir, counts, fileBounds.toMap)
      }
    }

    val writers = (0 until numRegions)
      .map(i => i -> new RegionWriter(f"region-$i%03d")).toMap

    val it = events
      .selectExpr("event_id", "user_id", "event_type", "value", "unix_millis(ts) AS ts_ms")
      .orderBy("ts_ms", "event_id")
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      writers((r.getLong(1) % numRegions).toInt).write(r)
    }
    writers.values.foreach(_.close())
  }
}
