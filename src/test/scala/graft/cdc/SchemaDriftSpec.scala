package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, Tables}
import graft.queries.SourceQueries
import graft.streaming.CdcStream

/** Mid-stream schema drift (ALTER TABLE ADD COLUMN) through the binlog
  * source: later records carry a new `score` column, schemas.json
  * publishes the widened schema, and readers surface pre-DDL records
  * as NULL under it (SURVEY §1.3's dynamic-schema contract).
  */
class SchemaDriftSpec extends SparkSuite {

  private lazy val cut: Long = SourceQueries.driftCutMs(spark, sfDir)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-drift").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 300, driftFromMs = cut)
    d
  }

  test("schemas.json publishes the widened (post-DDL) schema") {
    val st = DataType.fromJson(ChangelogFiles.readSchemas(dir)("graft.events"))
      .asInstanceOf[StructType]
    assert(st.fieldNames.toSeq ===
      Seq("event_id", "user_id", "event_type", "value", "props", "score"))
    assert(st("score").dataType === LongType)
  }

  test("records carry the new column exactly from the cut onward") {
    val f = ChangelogFiles.listFiles(dir)
    val recs = f.flatMap(x => ChangelogFiles.readRange(x._2, 1, Long.MaxValue))
    assert(recs.nonEmpty)
    recs.foreach { r =>
      if (r.tsMillis >= cut) {
        assert(r.row.contains("score"), s"post-cut record at ts=${r.tsMillis}")
        val eid = r.row("event_id").asInstanceOf[EnvelopeValue.VLong].v
        assert(r.row("score") === EnvelopeValue.VLong(eid % 1000L))
      } else assert(!r.row.contains("score"),
        s"pre-cut record at ts=${r.tsMillis} must not carry score")
    }
    assert(recs.exists(_.tsMillis < cut) && recs.exists(_.tsMillis >= cut))
  }

  test("typed expansion widens pre-DDL records with NULL score") {
    val df = spark.read.format("graft-binlog").option("path", dir).load()
    val wide = StructType(SourceQueries.eventsRowSchema.fields :+
      StructField("score", LongType))
    val parsed = CdcStream.parsed(df, wide)
      .select(col("ts_ms"), col("event_id"), col("score"))
    val pre = parsed.filter(col("ts_ms") < cut)
    val post = parsed.filter(col("ts_ms") >= cut)
    assert(pre.count() > 0 && post.count() > 0)
    assert(pre.filter(col("score").isNotNull).count() === 0)
    assert(post.filter(col("score").isNull).count() === 0)
    assert(post.filter(col("score") =!=
      pmod(col("event_id"), lit(1000L))).count() === 0)
  }
}
