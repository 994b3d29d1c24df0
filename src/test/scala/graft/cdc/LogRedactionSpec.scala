package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, Tables}
import graft.streaming.CdcStream

/** In-place log redaction: byte-length preservation (offset/count/sync
  * stability), exact emission difference (only the erased keys
  * vanish), streaming-checkpoint validity across a redaction, and
  * idempotence.
  */
class LogRedactionSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  private val rowSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def freshLog(): String = {
    val d = Files.createTempDirectory("graft-redact").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 300)
    d
  }

  private def typedBatch(dir: String) =
    CdcStream.parsed(
      spark.read.format("graft-binlog").option("path", dir).load(),
      rowSchema)

  test("redaction preserves every byte length, count, and offset") {
    val dir = freshLog()
    val files = ChangelogFiles.listFiles(dir)
    val lensBefore = files.map { case (_, f) => f.getName -> f.length() }.toMap
    val latestBefore = ChangelogFiles.latestOffset(dir)
    val tablesBefore = ChangelogFiles.totalsByTable(dir)

    val n = LogRedaction.redactKeys(dir, "user_id", Set(7L, 11L))
    assert(n > 0)
    val filesAfter = ChangelogFiles.listFiles(dir)
    assert(filesAfter.map { case (_, f) => f.getName -> f.length() }.toMap
      === lensBefore, "redaction changed a file's byte length")
    assert(ChangelogFiles.latestOffset(dir) === latestBefore)
    assert(ChangelogFiles.totalsByTable(dir) === tablesBefore,
      "per-table record counts must survive redaction")
  }

  test("the source emits exactly the non-erased rows afterwards") {
    val dir = freshLog()
    val before = typedBatch(dir).select($"event_id", $"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val erased = Set(3L, 19L)
    LogRedaction.redactKeys(dir, "user_id", erased)
    val after = typedBatch(dir).select($"event_id", $"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before.filterNot { case (_, u) => erased(u) })
    assert(before.exists { case (_, u) => erased(u) },
      "fixture must actually contain the erased users")
    // idempotent: nothing left to redact
    assert(LogRedaction.redactKeys(dir, "user_id", erased) === 0L)
  }

  test("a streaming checkpoint taken before redaction stays valid after") {
    val full = freshLog()
    val grow = Files.createTempDirectory("redact-grow").toString
    val srcFiles = ChangelogFiles.listFiles(full)
    def copyFile(id: Long): Unit = {
      val f = srcFiles.find(_._1 == id).get._2
      Files.copy(f.toPath,
        new java.io.File(grow, f.getName).toPath)
    }
    Files.copy(new java.io.File(full, "schemas.json").toPath,
      new java.io.File(grow, "schemas.json").toPath)
    copyFile(1); copyFile(2)
    // foreachBatch → parquet: the sink shape that actually recovers
    // from a checkpoint (memory sink cannot)
    val ck = Files.createTempDirectory("ck").toString
    val outDir = Files.createTempDirectory("redact-out").toString + "/rows"
    def run(): Long = {
      val q = spark.readStream.format("graft-binlog").option("path", grow)
        .load().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(outDir).count()
    }
    assert(run() === 600L)
    // redact INSIDE the consumed range, then rotate in two more files;
    // the restarted query resumes from the old checkpoint (positions
    // unchanged by redaction) and serves exactly the new files' rows
    assert(LogRedaction.redactKeys(grow, "user_id", Set(5L, 7L, 11L)) > 0)
    copyFile(3); copyFile(4)
    assert(run() === 1000L)
  }
}
