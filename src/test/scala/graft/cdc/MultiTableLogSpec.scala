package graft.cdc

import java.nio.file.Files

import graft.{SparkSuite, Tables}

/** Generator-side contract of the interleaved multi-table log
  * (`tableByEventType`): registry entries per routed table, per-file
  * PER-TABLE manifest counts (what map offsets advance on), and
  * record-level routing.
  */
class MultiTableLogSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-multitable").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 300, tableByEventType = true)
    d
  }

  test("schemas.json registers every routed table") {
    val schemas = ChangelogFiles.readSchemas(dir)
    assert(schemas.keySet === Set("graft.click", "graft.error",
      "graft.purchase", "graft.signup", "graft.view"))
  }

  test("manifest per-table counts match the records in each file") {
    val files = ChangelogFiles.listFiles(dir)
    val manifest = ChangelogFiles.manifest(dir)
    assert(files.nonEmpty)
    files.foreach { case (_, f) =>
      val recs = ChangelogFiles.readRange(f, 1, Long.MaxValue).toSeq
      val byTable = recs.groupBy(r => s"${r.db}.${r.table}")
        .map { case (k, v) => k -> v.size.toLong }
      assert(manifest(f.getName).tables === byTable, f.getName)
    }
    // per-table totals across files equal the per-type event counts
    val totals = files
      .flatMap(f => ChangelogFiles.manifest(dir)(f._2.getName).tables)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = Tables(spark, sfDir).events.groupBy("event_type").count()
      .collect().map(r => s"graft.${r.getString(0)}" -> r.getLong(1)).toMap
    assert(totals === want)
  }

  test("records route to the table named by their event type") {
    val f = ChangelogFiles.listFiles(dir).head._2
    ChangelogFiles.readRange(f, 1, Long.MaxValue).foreach { r =>
      val et = r.row("event_type").asInstanceOf[EnvelopeValue.VString].v
      assert(r.table === et)
      assert(r.db === "graft")
    }
  }
}
