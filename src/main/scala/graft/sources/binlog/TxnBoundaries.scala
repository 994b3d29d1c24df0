package graft.sources.binlog

import java.io.File
import java.util.concurrent.ConcurrentHashMap

import graft.cdc.{BinlogOffset, ChangelogFiles, ChangelogRecord}
import graft.sources.wal.MutationBoundaries.{largestAtOrBelow, smallestAbove}

/** Driver-side transaction-commit index for txn-aligned batch planning:
  * for each changelog file, the ascending positions whose record is the
  * LAST record of a committed transaction (the XID positions of a MySQL
  * binlog).
  *
  * The per-trigger contract matches the rest of the offset machinery
  * (SCALING.md: "offset spaces are metadata, not data"):
  *
  *  - COMPLETED files (manifest entry current, `txnEnds` present —
  *    written by the transactional generator at roll/close) resolve
  *    with zero content I/O;
  *  - the LIVE tail is parsed INCREMENTALLY — only bytes appended since
  *    the last look, through a fixed 64 KB buffer. A commit is proven
  *    only by evidence: a TAGGED record p ends its transaction when the
  *    record at p+1 carries a different txn id, while an UNTAGGED
  *    record is autocommit — its own commit, boundary immediate. The
  *    last tagged record seen in a live tail is never assumed
  *    committed; its boundary materializes when its successor (or the
  *    manifest entry) lands.
  *
  * Position accounting matches the read path: one pos per newline,
  * blank lines consume a pos but carry no record.
  */
object TxnBoundaries {

  /** `consumed` = byte position just past the last complete line;
    * `lines` = pos of that line; `lastRec` = (pos, txn) of the last
    * non-blank record (None when state came from the manifest — if the
    * file then grows, it is rescanned once to re-establish it).
    */
  private final case class State(consumed: Long, mtime: Long, lines: Long,
      lastRec: Option[(Long, Option[Long])], ends: Vector[Long])

  private val cache = new ConcurrentHashMap[String, State]()

  /** (record-line count, ascending txn-commit positions) over the
    * complete lines of `f`. `dir` is the manifest's directory.
    */
  def of(dir: String, f: File): (Long, IndexedSeq[Long]) = {
    val path = f.getAbsolutePath
    val len = f.length(); val mtime = f.lastModified()
    // the manifest is AUTHORITATIVE whenever current — checked before
    // any cache hit, because it can arrive AFTER the file was content-
    // scanned (writer closes the file, then publishes) and is the only
    // evidence that the file's final transaction committed. manifest()
    // is itself mtime-cached, so this is a map lookup per call.
    ChangelogFiles.manifest(dir).get(f.getName) match {
      case Some(e) if e.length == len && e.txnEnds.nonEmpty =>
        val st = State(len, mtime, e.count, None, e.txnEnds.toVector)
        cache.put(path, st)
        return (st.lines, st.ends)
      case _ => ()
    }
    val prev0 = cache.get(path)
    if (prev0 != null && prev0.consumed == len && prev0.mtime == mtime)
      return (prev0.lines, prev0.ends)
    val prev =
      if (prev0 == null) null
      else if (len < prev0.consumed) null // truncation: rescan
      else if (len == prev0.consumed) null // same length, new mtime: rewrite suspected
      else if (prev0.lastRec.isEmpty && prev0.lines > 0) null // manifest-loaded, grew
      else prev0
    val from = if (prev == null) 0L else prev.consumed
    val st = scan(f, from, len, mtime,
      if (prev == null) 0L else prev.lines,
      if (prev == null) None else prev.lastRec,
      if (prev == null) Vector.empty else prev.ends)
    cache.put(path, st)
    (st.lines, st.ends)
  }

  private def scan(f: File, from: Long, until: Long, mtime: Long,
      lines0: Long, lastRec0: Option[(Long, Option[Long])],
      ends0: Vector[Long]): State = {
    var lines = lines0
    var lastRec = lastRec0
    var ends = ends0
    val consumed = ChangelogFiles.forEachCompleteLine(f, from, until) { line =>
      lines += 1
      if (line.nonEmpty) {
        val r = ChangelogRecord.parse(line)
        // a txn-id change proves the previous tagged txn committed …
        lastRec.foreach { case (p, t) =>
          if (t.nonEmpty && t != r.txn) ends = ends :+ p
        }
        // … while an autocommit record is its own commit, immediately
        if (r.txn.isEmpty) ends = ends :+ lines
        lastRec = Some((lines, r.txn))
      }
    }
    State(consumed, mtime, lines, lastRec, ends)
  }

  /** Snap a candidate exclusive end offset to a transaction boundary so
    * a micro-batch never splits a committed transaction:
    *
    *  1. snap DOWN to the greatest commit at or below `candidate`
    *     (strictly after `start`);
    *  2. if the admission cap landed mid-way through the FIRST pending
    *     transaction, snap UP to its commit instead — a transaction
    *     larger than `maxEventsPerTrigger` must still be delivered
    *     whole (progress beats cap precision, the same "every granted
    *     key gets at least 1" rule the admission allocator uses) —
    *     bounded by `latest`;
    *  3. if the log tail is mid-transaction (no commit evidence yet),
    *     stay at `start`: uncommitted data is not served.
    *
    * A non-tail file with no recorded commits still ends at a boundary
    * by the rotate-at-commit contract (files roll only between
    * transactions), so its last record is usable as one.
    */
  def snap(dir: String, prefix: String, start: BinlogOffset,
      candidate: BinlogOffset, latest: BinlogOffset): BinlogOffset = {
    if (candidate.packed <= start.packed) return start
    val files = ChangelogFiles.listFiles(dir, prefix)
    if (files.isEmpty) return start
    val tailId = files.last._1
    val byId = files.toMap

    def fileEnds(id: Long): (Long, IndexedSeq[Long]) = byId.get(id) match {
      case Some(f) => of(dir, f)
      case None    => (0L, Vector.empty)
    }

    // 1. snap down: walk files from the candidate's back to the start's
    var id = candidate.fileId
    while (id >= start.fileId && id >= files.head._1) {
      if (byId.contains(id)) {
        val (n, ends) = fileEnds(id)
        val hi = if (id == candidate.fileId) candidate.pos - 1 else n
        val p = largestAtOrBelow(ends, hi)
        val best =
          if (p >= 0) p
          // rotate-at-commit: a completed (non-tail) file's last record
          // is a boundary even when no commit was recorded in-file
          else if (id < tailId && hi >= n && n > 0) n
          else -1L
        if (best >= 0) {
          val snapped = BinlogOffset(id, best + 1)
          if (snapped.packed > start.packed) return snapped
          // a boundary at/below start means nothing new committed in
          // this file below the candidate — keep looking back? No:
          // anything further back is below start too.
          id = start.fileId - 1 // exit loop into snap-up
        } else id -= 1
      } else id -= 1
    }

    // 2. snap up: the first pending txn overflows the cap — deliver it
    // whole. Find the smallest boundary after the candidate, up to
    // `latest`.
    id = math.max(candidate.fileId, start.fileId)
    while (id <= latest.fileId) {
      if (byId.contains(id)) {
        val (n, ends) = fileEnds(id)
        val floor = if (id == candidate.fileId) candidate.pos - 1 else 0L
        val q = smallestAbove(ends, floor)
        val best =
          if (q >= 0) q
          else if (id < tailId && n > floor && n > 0) n // rotate-at-commit
          else -1L
        if (best >= 0) {
          val snapped = BinlogOffset(id, best + 1)
          if (snapped.packed > start.packed &&
              snapped.packed <= latest.packed) return snapped
        }
      }
      id += 1
    }

    // 3. tail is mid-transaction: serve nothing new
    start
  }
}
