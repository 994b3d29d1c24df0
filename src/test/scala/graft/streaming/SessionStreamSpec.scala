package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Streaming sessionization ([[SessionStream]]) equals the batch
  * operator once the watermark passes: same rows, append-final,
  * sessions merged across micro-batch boundaries.
  */
class SessionStreamSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

  /** Write `df` as ONE parquet file named `name` under `dst` with a
    * strictly increasing mod time — the file source processes oldest
    * first, so chunk order is deterministic.
    */
  private def addChunk(dst: java.nio.file.Path,
      df: org.apache.spark.sql.DataFrame, name: String, order: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("session-chunk")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val target = dst.resolve(s"$name.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(part), target)
    java.nio.file.Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + order * 60000L))
  }

  test("streamed sessions equal batch sessionization; merges span micro-batches") {
    val fixture = graft.Tables(spark, sfDir).events.select(cols.map(col): _*)
    val (tMin, tMax) = fixture.agg(min($"ts"), max($"ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    val tMid = new java.sql.Timestamp((tMin.getTime + tMax.getTime) / 2)
    // the sparse fixture has no session spanning tMid, so inject one
    // deterministically: user −2's three events sit 10 min apart
    // around the boundary — events 1,2 land in chunk 1, event 3 in
    // chunk 2, and they MUST merge into one session
    def at(deltaMin: Long) =
      new java.sql.Timestamp(tMid.getTime + deltaMin * 60000L)
    val spanUser = Seq(
        (-10L, at(-15), -2L, "click", 1.0),
        (-11L, at(-5), -2L, "click", 2.0),
        (-12L, at(5), -2L, "click", 3.0))
      .toDF(cols: _*)
    val ev = fixture.unionByName(spanUser)
    // time-ordered chunks: batch 2's events are never older than batch
    // 1's watermark (max₁ − 1h < mid ≤ ts₂), so nothing is dropped; a
    // far-future sentinel then pushes the watermark past every real
    // session so append mode finalizes them all
    val src = java.nio.file.Files.createTempDirectory("session-src")
    addChunk(src, ev.filter($"ts" < tMid), "c1", 1)
    addChunk(src, ev.filter($"ts" >= tMid), "c2", 2)
    val sentinel = Seq((-1L,
        new java.sql.Timestamp(tMax.getTime + 3 * 3600 * 1000L),
        -1L, "click", 0.0))
      .toDF(cols: _*)
    addChunk(src, sentinel, "c3", 3)

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = SessionStream.sessionizeStream(stream)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = SessionStream.sessionize(ev)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    // every real session emitted exactly once and final; the
    // sentinel's own session stays open in state and never appears
    assert(got == expected, s"got ${got.size} vs expected ${expected.size}")
    assert(!got.exists(_._1 == -1L))
    // the injected user's three events arrived in different
    // micro-batches yet merged into exactly ONE session of 3 events
    val merged = got.filter(_._1 == -2L)
    assert(merged.size == 1 && merged.head._3 == 3L,
      s"cross-batch session did not merge: $merged")
  }

  test("events later than the watermark are dropped, never emitted twice") {
    val fixture = graft.Tables(spark, sfDir).events.select(cols.map(col): _*)
    val (tMin, tMax) = fixture.agg(min($"ts"), max($"ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    val src = java.nio.file.Files.createTempDirectory("session-late")
    addChunk(src, fixture, "c1", 1)
    // the sentinel advances the watermark past every fixture event …
    val sentinel = Seq((-1L,
        new java.sql.Timestamp(tMax.getTime + 3 * 3600 * 1000L),
        -1L, "click", 0.0)).toDF(cols: _*)
    addChunk(src, sentinel, "c2", 2)
    // … so this user-−3 event at tMin is LATE: state for its window is
    // gone and the sessionizer must drop it (bounded staleness), not
    // re-open and re-emit a duplicate session row
    val late = Seq((-20L, tMin, -3L, "click", 9.0)).toDF(cols: _*)
    addChunk(src, late, "c3", 3)

    val stream = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = SessionStream.sessionizeStream(stream)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions_late")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = SessionStream.sessionize(fixture)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(!got.exists(_._1 == -3L))
  }
}
