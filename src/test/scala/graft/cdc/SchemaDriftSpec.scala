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

  test("streaming: registry re-read per batch serves post-DDL batches widened") {
    import java.io.File
    // phase 1: a live log of only pre-DDL events, 5-column registry
    val streamDir = Files.createTempDirectory("graft-drift-stream").toString
    val ev = Tables(spark, sfDir).events
    val pre = ev.filter(unix_millis(col("ts")) < cut)
    val post = ev.filter(unix_millis(col("ts")) >= cut)
    ChangelogGenerator.generate(pre, streamDir, recordsPerFile = 300)
    val q = spark.readStream.format("graft-binlog").option("path", streamDir)
      .load().writeStream.format("memory").queryName("drift_stream")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val phase1 = spark.table("drift_stream").count()
      assert(phase1 === pre.count())
      // every served envelope embeds the 5-column registry schema
      val s1 = spark.table("drift_stream")
        .select(get_json_object(col("value"), "$.schema").as("sj"))
        .distinct().collect().map(_.getString(0))
      assert(s1.nonEmpty && s1.forall(j => !DataType.fromJson(j)
        .asInstanceOf[StructType].fieldNames.contains("score")))

      // the DDL lands: post-cut events arrive as NEW log files (every
      // record carrying score) and schemas.json flips to the widened
      // schema — the next trigger must serve under the NEW registry
      val tmp = Files.createTempDirectory("graft-drift-post").toString
      ChangelogGenerator.generate(post, tmp, recordsPerFile = 300,
        driftFromMs = 0L)
      val maxId = ChangelogFiles.listFiles(streamDir).map(_._1).max
      ChangelogFiles.listFiles(tmp).foreach { case (id, f) =>
        val name = f"${ChangelogFiles.DefaultPrefix}.${maxId + id}%06d"
        java.nio.file.Files.copy(f.toPath,
          new File(streamDir, name).toPath)
      }
      java.nio.file.Files.copy(new File(tmp, "schemas.json").toPath,
        new File(streamDir, "schemas.json").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val entries = ChangelogFiles.listFiles(streamDir).map { case (_, f) =>
        val c = ChangelogFiles.recordCount(f)
        f.getName -> ((f, c, Map("graft.events" -> c)))
      }
      ChangelogFiles.writeManifest(new File(streamDir), entries)

      q.processAllAvailable()
      val all = spark.table("drift_stream")
      assert(all.count() === ev.count())
      // post-DDL batches embed the widened registry schema and carry score
      val wide = StructType(SourceQueries.eventsRowSchema.fields :+
        StructField("score", LongType))
      val typed = CdcStream.parsed(all, wide)
      assert(typed.filter(col("ts_ms") >= cut && col("score").isNull)
        .count() === 0)
      assert(typed.filter(col("ts_ms") < cut && col("score").isNotNull)
        .count() === 0)
      val s2 = all.select(get_json_object(col("value"), "$.schema").as("sj"),
          get_json_object(col("value"), "$.timestamp").cast("long").as("ts_ms"))
        .filter(col("ts_ms") >= cut)
        .select("sj").distinct().collect().map(_.getString(0))
      assert(s2.nonEmpty && s2.forall(j => DataType.fromJson(j)
        .asInstanceOf[StructType].fieldNames.contains("score")))
    } finally q.stop()
  }

  test("the DDL record surfaces in order, only under includeDdl") {
    val d = Files.createTempDirectory("graft-ddl").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 300, driftFromMs = cut, ddlAtDrift = true)
    // default read: the DDL record consumes its position silently
    val plain = spark.read.format("graft-binlog").option("path", d).load()
    assert(plain.filter(
      get_json_object(col("value"), "$.type") === "ddl").count() === 0)
    assert(plain.count() === 1000L)
    // opted in: exactly one ddl envelope, carrying the statement and
    // the POST-DDL registry schema, ordered at the drift boundary
    val df = spark.read.format("graft-binlog").option("path", d)
      .option("includeDdl", "true").load()
      .select(
        get_json_object(col("value"), "$.type").as("op"),
        get_json_object(col("value"), "$.offset").cast("long").as("off"),
        get_json_object(col("value"), "$.rows[0].sql").as("sql"),
        get_json_object(col("value"), "$.schema").as("schemaJson"),
        get_json_object(col("value"), "$.timestamp").cast("long").as("ts_ms"))
    assert(df.count() === 1001L)
    val ddl = df.filter(col("op") === "ddl").collect()
    assert(ddl.length === 1)
    val row = ddl.head
    assert(row.getAs[String]("sql")
      === "ALTER TABLE graft.events ADD COLUMN score BIGINT")
    assert(DataType.fromJson(row.getAs[String]("schemaJson"))
      .asInstanceOf[StructType].fieldNames.contains("score"))
    // log order: every pre-cut row sits before it, every post-cut after
    val off = row.getAs[Long]("off")
    assert(df.filter(col("ts_ms") < cut && col("off") >= off).count() === 0)
    assert(df.filter(col("op") =!= "ddl" && col("ts_ms") >= cut &&
      col("off") <= off).count() === 0)
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
