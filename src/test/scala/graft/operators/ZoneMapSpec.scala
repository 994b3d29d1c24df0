package graft.operators

import graft.SparkSuite
import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Zone-map data skipping: pruning must actually drop files (the scale
  * claim) while never changing the query result (the semantics claim),
  * and the gap-fill grid must be dense with exact staleness.
  */
class ZoneMapSpec extends SparkSuite {

  private val Us = 1000000L
  private def us(iso: String): Long =
    java.time.Instant.parse(iso).getEpochSecond * Us

  test("zone-map pruning skips files and preserves the result") {
    val zdir = EventQueries.zonemapEventsDir(spark, sfDir)
    val zones = ZoneMaps.fileZonesLong(zdir, "ts")
    assert(zones.nonEmpty)
    // the range-partitioned write records usable INT64 stats everywhere
    assert(zones.forall(z => z.min.isDefined && z.max.isDefined))

    val lo = us("2024-01-10T00:00:00Z")
    val hi = us("2024-01-13T00:00:00Z") - 1L
    val (pruned, kept, total) = ZoneMaps.prunedRead(spark, zdir, "ts", lo, hi)
    assert(total == zones.size)
    assert(kept >= 1, "the queried window holds data")
    assert(kept < total, s"expected file skipping: kept=$kept of $total")

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ts") >= timestamp_micros(lit(lo)) &&
        col("ts") <= timestamp_micros(lit(hi)))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("event_id")), lit(0L)).as("s"))
      .collect()(0)
    assert(agg(pruned) == agg(spark.read.parquet(zdir)),
      "pruned scan must equal the full scan under the same predicate")
  }

  test("a window outside every zone reads zero files and zero rows") {
    val zdir = EventQueries.zonemapEventsDir(spark, sfDir)
    val (df, kept, _) = ZoneMaps.prunedRead(spark, zdir, "ts",
      us("2030-01-01T00:00:00Z"), us("2030-02-01T00:00:00Z"))
    assert(kept == 0)
    assert(df.count() == 0L)
  }

  test("q55 gapfill: dense grid, zero-filled gaps, exact staleness") {
    val rows = EventQueries.defs("q55_gapfill")(spark, sfDir).collect()
    val ev = graft.Tables(spark, sfDir).events
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
    val nTypes = ev.select("event_type").distinct().count()
    val bounds = ev.agg(min(col("hour")), max(col("hour"))).collect()(0)
    val nHours = java.time.Duration.between(
      bounds.getTimestamp(0).toInstant, bounds.getTimestamp(1).toInstant)
      .toHours + 1
    assert(rows.length.toLong == nTypes * nHours, "grid is dense")
    // gaps materialize as zero rows, and some carry positive staleness
    assert(rows.exists(r => r.getLong(2) == 0L))
    assert(rows.exists(r => r.getLong(2) == 0L && !r.isNullAt(4) &&
      r.getLong(4) > 0L))
    // an active hour is never stale; staleness only counts back to the
    // previous active hour
    assert(rows.filter(_.getLong(2) > 0L)
      .forall(r => !r.isNullAt(4) && r.getLong(4) == 0L))
    // rows before a type's first activity have undefined staleness
    rows.filter(_.isNullAt(4)).foreach(r => assert(r.getLong(2) == 0L))
  }
}
