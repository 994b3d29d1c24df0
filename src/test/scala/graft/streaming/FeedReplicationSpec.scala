package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Change-feed replication: a FOLLOWER replica built only from the
  * primary's change feed (never its data files) converges to the
  * primary's state — incrementally version-by-version, or batching a
  * multi-version catch-up range into ONE merge (the order columns make
  * cross-version nets fold last-writer-wins), and a GC'd feed gap
  * refuses loudly instead of silently skipping changes.
  */
class FeedReplicationSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("feed-repl").toString

  private def batch(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("id", "v", "seq", "op")

  private def state(dir: String): Seq[(Long, String)] =
    CdcStream.readReplica(spark, dir).get
      .select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  private def applyNet(follower: String, net: org.apache.spark.sql.DataFrame): Unit =
    CdcStream.applyBatchToReplica(follower,
      net.drop("_commit_version", "_commit_watermark"),
      Seq("id"), Seq(col("seq")))

  test("follower replays the feed incrementally and in one catch-up batch") {
    val primary = freshDir()
    def commit(rows: Seq[(Long, String, Long, String)]): Unit =
      CdcStream.applyBatchToReplica(primary, batch(rows), Seq("id"),
        Seq(col("seq")), recordChanges = true)
    commit(Seq((1L, "a1", 1L, "update"), (2L, "b1", 1L, "update")))
    commit(Seq((1L, "a2", 2L, "update"), (3L, "c2", 2L, "update")))

    // incremental follower: one apply per version, state matches after
    // each step
    val inc = freshDir()
    applyNet(inc, CdcStream.readReplicaChanges(spark, primary, 0L, Some(1L)).get)
    assert(state(inc) == Seq((1L, "a1"), (2L, "b1")))
    applyNet(inc, CdcStream.readReplicaChanges(spark, primary, 1L, Some(2L)).get)
    assert(state(inc) == state(primary))

    // more primary commits, including a delete that must flow through
    commit(Seq((2L, "x", 3L, "delete"), (4L, "d3", 3L, "update")))
    commit(Seq((4L, "d4", 4L, "update")))

    // catch-up follower: versions (2, 4] land in ONE merge — the order
    // columns fold the cross-version nets last-writer-wins, so a
    // lagging follower pays one commit, not one per missed version
    applyNet(inc, CdcStream.readReplicaChanges(spark, primary, 2L).get)
    assert(state(inc) == state(primary))
    assert(state(inc) == Seq((1L, "a2"), (3L, "c2"), (4L, "d4")))
  }

  test("streaming follower: the change-feed source drives continuous replication") {
    val primary = freshDir()
    val follower = freshDir()
    val ck = java.nio.file.Files.createTempDirectory("feed-repl-ck").toString
    def commit(rows: Seq[(Long, String, Long, String)]): Unit =
      CdcStream.applyBatchToReplica(primary, batch(rows), Seq("id"),
        Seq(col("seq")), recordChanges = true)
    commit(Seq((1L, "a1", 1L, "update"), (2L, "b1", 1L, "update")))
    commit(Seq((2L, "x", 2L, "delete"), (3L, "c2", 2L, "update")))
    // the follower's apply is the foreachBatch body; a micro-batch may
    // span several primary versions (first start serves v1..v2 at
    // once) — the order columns fold cross-version nets correctly, and
    // a checkpoint replay re-applies idempotent content
    def stream() = spark.readStream.format("graft-replica")
      .option("path", primary).option("readChangeFeed", "true").load()
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        CdcStream.applyBatchToReplica(follower,
          b.drop("_commit_version", "_commit_watermark"),
          Seq("id"), Seq(col("seq")))
        ()
      }.start()
    val q = stream()
    try q.processAllAvailable() finally q.stop()
    assert(state(follower) == state(primary))
    // new primary commits after a restart: only the delta flows
    commit(Seq((1L, "a3", 3L, "update"), (4L, "d3", 3L, "update")))
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()
    assert(state(follower) == state(primary))
    assert(state(follower) == Seq((1L, "a3"), (3L, "c2"), (4L, "d3")))
  }

  test("a GC'd feed gap refuses the range read instead of skipping versions") {
    val primary = freshDir()
    def commit(rows: Seq[(Long, String, Long, String)]): Unit =
      CdcStream.applyBatchToReplica(primary, batch(rows), Seq("id"),
        Seq(col("seq")), recordChanges = true)
    // every batch touches the SAME key, so each commit's rewrite drops
    // the references to the previous version and the commit-time GC
    // (one version of reader grace) retires v1 at the third commit
    commit(Seq((1L, "a1", 1L, "update")))
    commit(Seq((1L, "a2", 2L, "update")))
    commit(Seq((1L, "a3", 3L, "update")))
    val vs = CdcStream.replicaVersions(primary)
    assert(!vs.contains(1L), s"fixture: commit-time GC must retire v1, kept $vs")
    // a consumer positioned before the retained window must FAIL —
    // silently resuming from a gap would lose the dropped changes
    intercept[IllegalStateException] {
      CdcStream.readReplicaChanges(spark, primary, 0L).get.count()
    }
    // the documented recovery: restart from a snapshot position (the
    // retained tail reads fine)
    val tail = CdcStream.readReplicaChanges(spark, primary, vs.min - 1).get
    assert(tail.count() >= 0L)
  }
}
