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
