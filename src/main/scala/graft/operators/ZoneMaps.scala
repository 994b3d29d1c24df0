package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level zone maps: min/max data skipping over a parquet dataset.
  *
  * The write side of data skipping already exists in this engine —
  * `q32_zorder` demonstrates that z-ordered (or range-partitioned)
  * writes give every file a tight min/max bounding box. This is the
  * READ side: the per-file min/max statistics parquet already records
  * in its footers ARE the zone map, so a range predicate can drop
  * whole files before Spark plans a single task. Spark's row-group
  * pushdown skips row groups *after* scheduling a task per file; zone
  * pruning removes the files from the plan entirely — at 100 TB the
  * difference between "schedule 800k tasks that each read a footer and
  * exit" and "schedule the 2k tasks that can match".
  *
  * Scale shape: the footer read is O(files) driver-side METADATA I/O
  * (the same class of work as Delta/Iceberg reading their stats
  * manifests; a production deployment would persist these rows as a
  * table and maintain them incrementally on write — the build is one
  * footer pass either way, never a data scan). Pruning is a driver
  * filter over |files| stat rows; the surviving files form an ordinary
  * parquet scan with full filter/projection pushdown unchanged.
  *
  * Semantics: pruning must never change results — a file is dropped
  * only when its [min, max] provably misses the predicate range, files
  * with absent/invalid stats are conservatively kept, and the caller
  * re-applies the exact predicate to the surviving rows (zone bounds
  * admit false-positive files, never false-negative rows).
  */
object ZoneMaps {

  /** One file's zone: row count and the column's [min, max] over all of
    * its row groups; None when any row group lacks usable stats (the
    * conservative "must read" marker).
    */
  final case class FileZone(path: String, rows: Long,
      min: Option[Long], max: Option[Long])

  /** Bounded driver-side cache of per-dir zones. Replica bucket dirs
    * are IMMUTABLE once committed (merges write fresh version dirs),
    * so (dir, column) zones never go stale — repeated range scans of
    * the same store version pay the O(files) footer pass once, not per
    * query. Cleared wholesale past the bound (simplicity over LRU: the
    * entries are tiny and re-derivable).
    */
  private val zoneCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[FileZone]]()
  private val ZoneCacheBound = 65536

  /** [[fileZonesLong]] through the immutable-dir cache — the form the
    * replica read path uses (raw q54-style scans over REWRITABLE dirs
    * should call the uncached one).
    *
    * Staleness guard: the immutability argument holds for a committed
    * version dir's LIFETIME, but a store deleted and recreated at the
    * same path within one driver restarts version numbering, so a hit
    * is trusted only if its first recorded file still exists (one
    * `isFile` stat — cheap next to the footer pass it saves). A
    * recreated dir therefore recomputes instead of either failing the
    * scan on vanished files or silently pruning against the old
    * store's bounds.
    */
  def fileZonesLongCached(dir: String, column: String): Seq[FileZone] = {
    if (zoneCache.size() > ZoneCacheBound) zoneCache.clear()
    val key = (dir, column)
    val hit = zoneCache.get(key)
    if (hit != null &&
        hit.headOption.forall(z => new java.io.File(z.path).isFile)) hit
    else {
      val fresh = fileZonesLong(dir, column)
      zoneCache.put(key, fresh)
      fresh
    }
  }

  /** Per-file zones for a physically-INT64 column (bigint / timestamp
    * micros), read from parquet footers only — no Spark job, no data
    * pages touched.
    */
  def fileZonesLong(dir: String, column: String): Seq[FileZone] = {
    import scala.jdk.CollectionConverters._
    val conf = new Configuration()
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq
    files.map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(f.getPath), conf))
      try {
        var lo = Option.empty[Long]
        var hi = Option.empty[Long]
        var rows = 0L
        var usable = true
        reader.getFooter.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          block.getColumns.asScala
            .find(_.getPath.toDotString == column) match {
            case Some(cc) =>
              val st = cc.getStatistics
              if (st == null || !st.hasNonNullValue) usable = false
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  lo = Some(lo.fold(mn.longValue)(math.min(_, mn.longValue)))
                  hi = Some(hi.fold(mx.longValue)(math.max(_, mx.longValue)))
                case _ => usable = false
              }
            case None => usable = false
          }
        }
        FileZone(f.getPath, rows,
          if (usable) lo else None, if (usable) hi else None)
      } finally reader.close()
    }
  }

  /** Can this zone hold a value in [lo, hi] (inclusive)? A stat-less
    * zone can — dropping it would risk wrong results.
    */
  def overlaps(z: FileZone, lo: Long, hi: Long): Boolean =
    (z.min, z.max) match {
      case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
      case _ => true
    }

  /** Zones that can hold a value in [lo, hi] (inclusive); stat-less
    * zones survive — dropping them would risk wrong results.
    */
  def overlapping(zones: Seq[FileZone], lo: Long, hi: Long): Seq[FileZone] =
    zones.filter(overlaps(_, lo, hi))

  /** Zone-pruned scan of `dir` for `column ∈ [lo, hi]`: returns the
    * DataFrame over only the surviving files plus (kept, total) file
    * counts for observability. The caller MUST still apply the exact
    * predicate — zones prune files, never rows.
    */
  def prunedRead(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val zones = fileZonesLong(dir, column)
    val keep = overlapping(zones, lo, hi)
    val df =
      if (keep.isEmpty)
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep.map(_.path): _*)
    (df, keep.size, zones.size)
  }
}
