package graft.sql

import graft.SparkSuite
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._

/** SQL procedure surface ([[GraftSqlParser]], injected by
  * `GraftExtensions`): every store maintenance operation runs as SQL
  * text through the SAME CdcStream entry points as the Scala API, and
  * every other statement falls through to Spark's parser untouched.
  */
class GraftSqlSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sql").toString

  private def batch(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("id", "v", "seq", "op")

  private def commit(dir: String, rows: (Long, String, Long, String)*): Unit =
    CdcStream.applyBatchToReplica(dir, batch(rows: _*), Seq("id"),
      Seq(col("seq")), recordChanges = true)

  private def state(dir: String): Set[(Long, String)] =
    CdcStream.readReplica(spark, dir).get
      .select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("COMPACT REPLICA folds deferred deltas; content unchanged; " +
      "version row returned") {
    val dir = freshDir()
    (1 to 3).foreach(i => CdcStream.applyBatchToReplica(dir,
      batch((i.toLong, s"v$i", i.toLong, "update")), Seq("id"),
      Seq(col("seq")), deferMerge = true))
    val before = state(dir)
    val out = spark.sql(s"COMPACT REPLICA '$dir'").collect()
    assert(out.length == 1 && out(0).getString(0) == dir)
    assert(out(0).getLong(1) == CdcStream.replicaCurrentVersion(dir).get)
    assert(state(dir) == before, "compaction must be content-identical")
  }

  test("CLONE REPLICA ... TO ... [AT VERSION n] branches the store; " +
      "RESTORE REPLICA rolls it back") {
    val src = freshDir()
    commit(src, (1L, "a1", 1L, "update"), (2L, "b1", 1L, "update"))
    commit(src, (1L, "a2", 2L, "update"), (3L, "c2", 2L, "update"))
    val dst = s"${freshDir()}/clone"
    val v = spark.sql(s"CLONE REPLICA '$src' TO '$dst'").collect()(0)
    assert(v.getString(0) == dst)
    assert(state(dst) == state(src))
    // time-travel clone of v1
    val dst1 = s"${freshDir()}/clone1"
    spark.sql(s"CLONE REPLICA '$src' TO '$dst1' AT VERSION 1").collect()
    assert(state(dst1) == Set((1L, "a1"), (2L, "b1")))
    // metadata-only rollback through SQL
    val r = spark.sql(s"RESTORE REPLICA '$src' TO VERSION 1").collect()(0)
    assert(r.getString(0) == src)
    assert(state(src) == Set((1L, "a1"), (2L, "b1")))
  }

  test("REFRESH CLONE ... KEYS (...) ORDER BY (...) catches an " +
      "undiverged clone up from the source's feed") {
    val src = freshDir()
    commit(src, (1L, "a1", 1L, "update"), (2L, "b1", 1L, "update"))
    val dst = s"${freshDir()}/clone"
    spark.sql(s"CLONE REPLICA '$src' TO '$dst'").collect()
    commit(src, (1L, "a2", 2L, "update"), (3L, "c2", 2L, "update"))
    val out = spark.sql(
      s"REFRESH CLONE '$dst' KEYS (id) ORDER BY (seq)").collect()(0)
    assert(out.getString(0) == dst)
    assert(state(dst) == state(src),
      "refreshed clone must equal its source")
  }

  test("DESCRIBE HISTORY and FSCK REPLICA return the API's rows; " +
      "ordinary SQL falls through to Spark's parser") {
    val dir = freshDir()
    commit(dir, (1L, "a1", 1L, "update"))
    commit(dir, (1L, "a2", 2L, "update"))
    val hist = spark.sql(s"describe history '$dir'") // case-insensitive
    assert(hist.orderBy($"version").collect().toSeq ==
      CdcStream.describeReplicaHistory(spark, dir)
        .orderBy($"version").collect().toSeq)
    val fsck = spark.sql(s"FSCK REPLICA '$dir'")
    assert(fsck.collect().toSeq ==
      CdcStream.fsckReplica(spark, dir).collect().toSeq)
    // fall-through: plain SQL parses and runs as before
    assert(spark.sql("SELECT 1 + 1 AS x").collect()(0).getInt(0) == 2)
    // and a malformed statement still errors through Spark's parser
    intercept[Exception](spark.sql("SELECT FROM WHERE"))
  }

  test("ERASE KEYS ... VALUES scrubs the keys; version row returned; " +
      "USING form takes a subquery") {
    val dir = freshDir()
    commit(dir, (1L, "a1", 1L, "update"), (2L, "b1", 1L, "update"),
      (3L, "c1", 1L, "update"))
    val out = spark.sql(
      s"ERASE KEYS (id) FROM REPLICA '$dir' VALUES (1)").collect()
    assert(out.length == 1 && out(0).getString(0) == dir)
    assert(out(0).getLong(1) == CdcStream.replicaCurrentVersion(dir).get)
    assert(state(dir) == Set((2L, "b1"), (3L, "c1")))
    // USING: the takedown list is a query, not a literal list
    Seq(2L).toDF("id").createOrReplaceTempView("__takedown")
    spark.sql(s"ERASE KEYS (id) FROM REPLICA '$dir' USING " +
      "(SELECT id FROM __takedown)").collect()
    assert(state(dir) == Set((3L, "c1")))
  }

  test("FREEZE REPLICA fences ERASE from SQL exactly as from Scala; " +
      "UNFREEZE lifts the fence") {
    val dir = freshDir()
    commit(dir, (1L, "a1", 1L, "update"))
    val fr = spark.sql(
      s"FREEZE REPLICA '$dir' REASON 'drill'").collect()(0)
    assert(fr.getString(0) == dir && fr.getBoolean(1) &&
      fr.getString(2) == "drill")
    val viaSql = intercept[IllegalStateException](spark.sql(
      s"ERASE KEYS (id) FROM REPLICA '$dir' VALUES (1)").collect())
    val viaApi = intercept[IllegalStateException](CdcStream.eraseKeys(
      spark, dir, Seq("id"), Seq(1L).toDF("id")))
    assert(viaSql.getMessage == viaApi.getMessage,
      "the fence must refuse identically from either surface")
    assert(viaSql.getMessage.contains("FROZEN"))
    val uf = spark.sql(s"UNFREEZE REPLICA '$dir'").collect()(0)
    assert(!uf.getBoolean(1) && uf.isNullAt(2))
    spark.sql(s"ERASE KEYS (id) FROM REPLICA '$dir' VALUES (1)").collect()
    // the store's only key is gone: committed-but-empty reads as None
    assert(CdcStream.readReplica(spark, dir)
      .map(_.count()).getOrElse(0L) == 0L)
  }

  test("REBUCKET REPLICA reshards online from SQL: content identical, " +
      "key-pruned reads route through the new layout") {
    val dir = freshDir()
    commit(dir, (1L, "a1", 1L, "update"), (2L, "b1", 1L, "update"))
    val before = state(dir)
    val out = spark.sql(
      s"REBUCKET REPLICA '$dir' KEYS (id) TO 5 BUCKETS").collect()(0)
    assert(out.getString(0) == dir)
    assert(state(dir) == before)
    val pruned = CdcStream.readReplicaForKeys(spark, dir, Seq("id"),
      Seq(1L).toDF("id")).get.select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == Set((1L, "a1")),
      "a routed lookup must survive the reshard")
    // a wrong KEYS clause refuses exactly as the Scala API does
    intercept[IllegalArgumentException](spark.sql(
      s"REBUCKET REPLICA '$dir' KEYS (v) TO 7 BUCKETS").collect())
  }

  test("PROMOTE FOLLOWER ... FROM VERSION n drains the undelivered " +
      "feed tail and fences the old primary; NODRAIN skips the drain") {
    val old = freshDir(); val nu = freshDir()
    commit(old, (1L, "a1", 1L, "update"), (2L, "b1", 1L, "update")) // v1
    // follower replicates v1 only
    CdcStream.readReplicaChanges(spark, old, 0L, Some(1L)).foreach { net =>
      CdcStream.applyBatchToReplica(nu,
        net.drop("_commit_version", "_commit_watermark"), Seq("id"),
        Seq(col("seq")), recordChanges = true)
    }
    commit(old, (1L, "a2", 2L, "update"), (3L, "c2", 2L, "update")) // v2: undelivered
    val out = spark.sql(s"PROMOTE FOLLOWER '$nu' OVER '$old' " +
      "KEYS (id) ORDER BY (seq) FROM VERSION 1").collect()(0)
    assert(out.getString(0) == nu)
    assert(state(nu) == state(old),
      "the drain must deliver the old primary's feed tail")
    assert(CdcStream.replicaFrozen(old).isDefined,
      "promotion must fence the demoted primary")
    // NODRAIN: the crash-failover path promotes the follower as-is
    val old2 = freshDir(); val nu2 = freshDir()
    commit(old2, (1L, "x1", 1L, "update"))
    commit(old2, (1L, "x2", 2L, "update"))
    spark.sql(s"PROMOTE FOLLOWER '$nu2' OVER '$old2' " +
      "KEYS (id) ORDER BY (seq) FROM VERSION 0 NODRAIN").collect()
    assert(CdcStream.readReplica(spark, nu2).isEmpty ||
      state(nu2).isEmpty, "NODRAIN must not replay the feed")
    assert(CdcStream.replicaFrozen(old2).isDefined)
  }

  test("RESTORE CONSISTENT rolls the fleet to the laggard's watermark " +
      "from SQL; a mixed feed/feed-less fleet refuses loudly") {
    def wmCommit(dir: String, wm: Long, rows: (Long, String, Long, String)*) =
      CdcStream.applyBatchToReplica(dir, batch(rows: _*), Seq("id"),
        Seq(col("seq")), watermark = Some(wm))
    val t1 = freshDir(); val t2 = freshDir()
    wmCommit(t1, 100L, (1L, "a1", 1L, "update"))
    wmCommit(t1, 200L, (1L, "a2", 2L, "update"))
    wmCommit(t2, 100L, (9L, "z1", 1L, "update"))
    wmCommit(t2, 150L, (9L, "z2", 2L, "update"))
    val out = spark.sql(
      s"RESTORE CONSISTENT ('$t1', '$t2')").collect()(0)
    assert(out.getLong(0) == 150L,
      "the laggard's newest watermark pins the point")
    assert(state(t1) == Set((1L, "a1")), "t1 must roll back past wm 150")
    assert(state(t2) == Set((9L, "z2")), "t2 serves wm 150 as-is")
    // AT WATERMARK pins an explicit point
    spark.sql(s"RESTORE CONSISTENT ('$t2') AT WATERMARK 100").collect()
    assert(state(t2) == Set((9L, "z1")))
    // mixed fleet: one store records a feed, the other doesn't — no
    // single recordChanges mode fits both; the statement refuses
    val t3 = freshDir()
    CdcStream.applyBatchToReplica(t3, batch((5L, "m1", 1L, "update")),
      Seq("id"), Seq(col("seq")), watermark = Some(100L),
      recordChanges = true)
    val e = intercept[IllegalStateException](spark.sql(
      s"RESTORE CONSISTENT ('$t1', '$t3')").collect())
    assert(e.getMessage.contains("mixes"))
  }

  test("FSCK REPLICA ... INDEXES runs the GSI cursor checks: an index " +
      "lagging past a content commit is reported from SQL") {
    val p = freshDir(); val ix = freshDir()
    graft.streaming.SecondaryIndex.applyBatchWithIndex(spark, p, ix,
      Seq((1L, "oslo", 1L, "update")).toDF("id", "city", "seq", "op"),
      Seq("id"), Seq("seq"), org.apache.spark.sql.functions.col("city"),
      "city")
    // the primary advances WITHOUT index maintenance → the index lags
    commit(p, (2L, "lima", 2L, "update"))
    val viaSql = spark.sql(s"FSCK REPLICA '$p' INDEXES ('$ix')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val viaApi = CdcStream.fsckReplica(spark, p, Seq(ix))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.exists(_._1 == "index_lag"),
      s"the lagging index must be reported: $viaSql")
  }
}
