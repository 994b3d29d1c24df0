package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.cdc._
import graft.sources.binlog.TxnBoundaries

/** Transaction-aligned batching (MySQL binlog BEGIN…XID semantics):
  * the txn-boundary index, commit-evidence rules under live append,
  * and the end-to-end guarantee that no micro-batch ever splits a
  * committed transaction.
  */
class TxnAlignmentSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  private def rec(pos: Long, txn: Option[Long]): String =
    ChangelogRecord.write(ChangelogRecord(pos, "insert", "graft", "events",
      1000L + pos, Map("event_id" -> EnvelopeValue.VLong(pos)), txn = txn))

  private def append(f: File, lines: String*): Unit =
    Files.write(f.toPath, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("incremental tail scan proves commits only by successor evidence") {
    val dir = Files.createTempDirectory("txn-bounds").toString
    val f = new File(dir, "graft-bin.000001")
    // txn 0 = records 1..3, txn 1 = records 4..6 — written incrementally
    append(f, rec(1, Some(0)), rec(2, Some(0)))
    assert(TxnBoundaries.of(dir, f) === ((2L, Vector.empty[Long])))
    append(f, rec(3, Some(0)), rec(4, Some(1)))
    // record 4 (txn 1) proves record 3 committed txn 0; txn 1 itself
    // has no successor yet — not committed
    assert(TxnBoundaries.of(dir, f) === ((4L, Vector(3L))))
    append(f, rec(5, Some(1)), rec(6, Some(1)))
    assert(TxnBoundaries.of(dir, f) === ((6L, Vector(3L))))
    append(f, rec(7, Some(2)))
    assert(TxnBoundaries.of(dir, f) === ((7L, Vector(3L, 6L))))
  }

  test("autocommit records (no txn id) are each their own boundary") {
    val dir = Files.createTempDirectory("txn-auto").toString
    val f = new File(dir, "graft-bin.000001")
    append(f, rec(1, None), rec(2, None), rec(3, Some(5)))
    // records 1 and 2 are autocommit; record 3's txn is still open
    assert(TxnBoundaries.of(dir, f) === ((3L, Vector(1L, 2L))))
  }

  private def txnLogDir(txnSize: Long): String = {
    val d = Files.createTempDirectory("txn-log").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 303, txnSize = txnSize) // not a txn multiple: rolls defer
    d
  }

  /** Stream the log collecting (txnId, batchId) pairs. */
  private def streamBatches(dir: String, maxPerTrigger: Long): DataFrame = {
    val out = Files.createTempDirectory("txn-out").toString + "/rows"
    val q = spark.readStream.format("graft-binlog")
      .option("path", dir)
      .option("offsetsByTable", "false")
      .option("txnAligned", "true")
      .option("maxEventsPerTrigger", maxPerTrigger.toString)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.select(col("value"), lit(id).as("batch_id"))
          .write.mode("append").parquet(out)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out).select(
      get_json_object($"value", "$.txnId").cast("long").as("txn_id"),
      $"batch_id")
  }

  test("no micro-batch splits a transaction (snap-down path)") {
    val rows = streamBatches(txnLogDir(7), maxPerTrigger = 100)
    val perTxn = rows.groupBy("txn_id")
      .agg(countDistinct($"batch_id").as("n_batches"), count(lit(1)).as("n"))
      .collect()
    assert(perTxn.nonEmpty)
    assert(perTxn.forall(_.getLong(1) === 1L), "a txn spanned two batches")
    // all 1000 events served; full txns have 7 records, the tail txn 1000%7
    assert(perTxn.map(_.getLong(2)).sum === 1000L)
    assert(perTxn.map(_.getLong(2)).forall(n => n == 7L || n == 1000L % 7))
    // the cap actually forced multiple batches (alignment was exercised)
    assert(rows.select("batch_id").distinct().count() > 5)
  }

  test("a transaction larger than the cap is still delivered whole (snap-up)") {
    val rows = streamBatches(txnLogDir(13), maxPerTrigger = 5)
    val perTxn = rows.groupBy("txn_id")
      .agg(countDistinct($"batch_id").as("n_batches"), count(lit(1)).as("n"))
      .collect()
    assert(perTxn.forall(_.getLong(1) === 1L))
    assert(perTxn.map(_.getLong(2)).sum === 1000L)
  }

  test("txnAligned on a non-transactional log degrades to plain capping") {
    val d = Files.createTempDirectory("txn-plain").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d, recordsPerFile = 301)
    val rows = streamBatches(d, maxPerTrigger = 150)
    assert(rows.count() === 1000L)
    assert(rows.select("txn_id").where($"txn_id".isNotNull).count() === 0L)
    // autocommit: every record its own txn, so batches cap exactly
    val sizes = rows.groupBy("batch_id").count().select("count")
      .as[Long].collect()
    assert(sizes.sum === 1000L)
    assert(sizes.forall(_ <= 150L))
  }

  test("txnAligned requires the global offset space") {
    val d = txnLogDir(7)
    val err = intercept[Exception] {
      spark.read.format("graft-binlog")
        .option("path", d).option("txnAligned", "true").load().count()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("offsetsByTable=false")))
  }

  test("checkpoint restart stays txn-atomic; unproven tail commits wait") {
    // full txn log (K=7, deferred rolls => file 1 has 308 = 7*44
    // records), served WITHOUT its manifest so commit evidence must
    // come from the content rules alone
    val src = txnLogDir(7)
    val growDir = Files.createTempDirectory("txn-grow").toString
    java.nio.file.Files.copy(new File(src, "schemas.json").toPath,
      new File(growDir, "schemas.json").toPath)
    val srcFiles = ChangelogFiles.listFiles(src)
    def copyFile(id: Long): Unit = {
      val f = srcFiles.find(_._1 == id).get._2
      java.nio.file.Files.copy(f.toPath, new File(growDir, f.getName).toPath)
    }
    copyFile(1)

    val ck = Files.createTempDirectory("txn-ck").toString
    val out = Files.createTempDirectory("txn-restart-out").toString + "/rows"
    def run(): Long = {
      val q = spark.readStream.format("graft-binlog")
        .option("path", growDir)
        .option("offsetsByTable", "false")
        .option("txnAligned", "true")
        .option("maxEventsPerTrigger", "100")
        .load().writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.select(col("value"), lit(id).as("batch_id"))
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).count()
    }
    // tail file, no manifest: txn 43's commit (records 302..308) has no
    // successor evidence yet — its records are NOT served
    assert(run() === 301L)

    // the log grows: file 1 is no longer the tail, so rotate-at-commit
    // proves its last record committed; a fresh query on the same
    // checkpoint serves everything except the NEW tail's final txn
    // (1000 = 7*142 + 6: the 6-record txn 142 still lacks evidence)
    srcFiles.map(_._1).filter(_ > 1).foreach(copyFile)
    assert(run() === 994L)

    // the writer publishes its manifest (close/roll records txnEnds):
    // the tail commit is now proven and the last txn is served
    java.nio.file.Files.copy(
      new File(src, ChangelogFiles.ManifestName).toPath,
      new File(growDir, ChangelogFiles.ManifestName).toPath)
    assert(run() === 1000L)
    val rows = spark.read.parquet(out).select(
      get_json_object($"value", "$.txnId").cast("long").as("txn_id"),
      get_json_object($"value", "$.rows[0].event_id").cast("long").as("event_id"),
      $"batch_id")
    assert(rows.select("event_id").distinct().count() === 1000L)
    val split = rows.groupBy("txn_id")
      .agg(countDistinct($"batch_id").as("nb")).filter($"nb" > 1).count()
    assert(split === 0L, "a txn spanned batches across the restart")
  }

  test("manifest txnEnds serve completed files with zero content I/O") {
    val d = txnLogDir(7)
    val files = ChangelogFiles.listFiles(d)
    assert(files.size > 1, "fixture should roll at least once")
    val man = ChangelogFiles.manifest(d)
    files.foreach { case (_, f) =>
      val e = man(f.getName)
      assert(e.txnEnds.nonEmpty)
      // rotate-at-commit: every completed file ends at a boundary
      assert(e.txnEnds.last === e.count)
      // boundary spacing is the txn size (except the log's tail txn)
      val (n, ends) = TxnBoundaries.of(d, f)
      assert(n === e.count && ends === e.txnEnds.toVector)
    }
  }
}
