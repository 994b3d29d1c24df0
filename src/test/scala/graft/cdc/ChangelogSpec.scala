package graft.cdc

import java.nio.file.Files

import graft.{SparkSuite, Tables}

class ChangelogSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-changelog").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d, recordsPerFile = 300)
    d
  }

  test("generator writes %06d-named files + schemas.json") {
    val files = ChangelogFiles.listFiles(dir)
    assert(files.map(_._1) === Seq(1L, 2L, 3L, 4L)) // 1000 events / 300 per file
    assert(files.map(f => ChangelogFiles.recordCount(f._2)).sum === 1000L)
    val schemas = ChangelogFiles.readSchemas(dir)
    assert(schemas.keySet === Set("graft.events"))
    val st = org.apache.spark.sql.types.DataType.fromJson(schemas("graft.events"))
    assert(st.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      .contains("event_id"))
  }

  test("earliest/latest offsets bracket the log") {
    assert(ChangelogFiles.earliestOffset(dir) === BinlogOffset(1, 1))
    assert(ChangelogFiles.latestOffset(dir) === BinlogOffset(4, 101))
  }

  test("advance walks across file boundaries and clamps at the end") {
    val start = ChangelogFiles.earliestOffset(dir)
    assert(ChangelogFiles.advance(dir, start, 10) === BinlogOffset(1, 11))
    assert(ChangelogFiles.advance(dir, start, 300) === BinlogOffset(1, 301))
    assert(ChangelogFiles.advance(dir, start, 301) === BinlogOffset(2, 2))
    assert(ChangelogFiles.advance(dir, BinlogOffset(1, 250), 100) === BinlogOffset(2, 50))
    assert(ChangelogFiles.advance(dir, start, 100000) === BinlogOffset(4, 101))
  }

  test("readRange honors [from, until) and record order") {
    val f = ChangelogFiles.listFiles(dir).head._2
    val recs = ChangelogFiles.readRange(f, 5, 8).toSeq
    assert(recs.map(_.pos) === Seq(5L, 6L, 7L))
    val all = ChangelogFiles.readRange(f, 1, Long.MaxValue).toSeq
    assert(all.size === 300)
    assert(all.map(_.pos) === (1L to 300L))
    // log order is (ts, event_id)
    assert(all.map(_.tsMillis) === all.map(_.tsMillis).sorted)
  }

  test("record codec round-trips") {
    val f = ChangelogFiles.listFiles(dir).head._2
    val rec = ChangelogFiles.readRange(f, 1, 2).next()
    val back = ChangelogRecord.parse(ChangelogRecord.write(rec))
    assert(back === rec)
    assert(Set("insert", "update", "delete").contains(rec.op))
    assert(rec.row.keySet === Set("event_id", "user_id", "event_type", "value", "props"))
  }

  test("manifest sidecar carries exact per-file lengths and counts") {
    val m = ChangelogFiles.manifest(dir)
    val files = ChangelogFiles.listFiles(dir)
    assert(m.keySet === files.map(_._2.getName).toSet)
    files.foreach { case (_, f) =>
      val e = m(f.getName)
      assert(e.length === f.length())
      assert(e.count === ChangelogFiles.recordCount(f))
      // per-table counts sum to the file count (single-table fixture)
      assert(e.tables === Map("graft.events" -> e.count))
    }
    assert(ChangelogFiles.manifestCount(dir, files.head._2.getName) === Some(300L))
    assert(ChangelogFiles.manifestCount(dir, "graft-bin.999999") === None)
  }

  test("recordCount counts incrementally on append and tolerates blank lines") {
    val d = Files.createTempDirectory("graft-count").toString
    val f = new java.io.File(d, "graft-bin.000001")
    def append(s: String): Unit = {
      val w = new java.io.FileWriter(f, true); w.write(s); w.close()
      // mtime granularity can be 1s; force a visible change
      f.setLastModified(f.lastModified() + 1000)
    }
    append("{\"pos\":1,\"op\":\"insert\",\"db\":\"g\",\"table\":\"t\",\"ts\":1,\"row\":{}}\n")
    assert(ChangelogFiles.recordCount(f) === 1L)
    // blank line consumes a pos in BOTH counting and reading
    append("\n")
    assert(ChangelogFiles.recordCount(f) === 2L)
    append("{\"pos\":3,\"op\":\"insert\",\"db\":\"g\",\"table\":\"t\",\"ts\":3,\"row\":{}}\n")
    assert(ChangelogFiles.recordCount(f) === 3L)
    val recs = ChangelogFiles.readRange(f, 1, 4).toSeq
    assert(recs.map(_.pos) === Seq(1L, 3L)) // blank pos 2 emits nothing
  }

  test("tableCounts: incremental scan stops at the last complete line (concurrent append)") {
    val d = Files.createTempDirectory("graft-tcount").toString
    val f = new java.io.File(d, "graft-bin.000001")
    def rec(table: String, pos: Long): String =
      s"""{"pos":$pos,"op":"insert","db":"g","table":"$table","ts":$pos,"row":{}}"""
    def append(s: String): Unit = {
      val w = new java.io.FileWriter(f, true); w.write(s); w.close()
    }
    append(rec("a", 1) + "\n")
    assert(ChangelogFiles.tableCounts(f) === Map("g.a" -> 1L))
    // a writer mid-append: the partial trailing line must NOT count...
    append(rec("b", 2)) // no newline yet
    assert(ChangelogFiles.tableCounts(f) === Map("g.a" -> 1L))
    // ...and completing it later must count it exactly once
    append("\n" + rec("b", 3) + "\n")
    assert(ChangelogFiles.tableCounts(f) === Map("g.a" -> 1L, "g.b" -> 2L))
    // totals aggregate the same view across the directory
    assert(ChangelogFiles.totalsByTable(d) === Map("g.a" -> 1L, "g.b" -> 2L))
    // and a global offset converts to per-table consumed counts
    assert(ChangelogFiles.tableCountsBefore(d, BinlogOffset(1, 3)) ===
      Map("g.a" -> 1L, "g.b" -> 1L))
  }

  test("readRange never parses an unterminated (torn) trailing line") {
    val d = Files.createTempDirectory("graft-torn").toString
    val f = new java.io.File(d, "graft-bin.000001")
    def rec(pos: Long): String =
      s"""{"pos":$pos,"op":"insert","db":"g","table":"t","ts":$pos,"row":{}}"""
    def append(s: String): Unit = {
      val w = new java.io.FileWriter(f, true); w.write(s); w.close()
    }
    append(rec(1) + "\n")
    append(rec(2).take(20)) // a writer mid-append: truncated JSON, no newline
    val it = ChangelogFiles.readRange(f, 1, Long.MaxValue)
    try assert(it.toSeq.map(_.pos) === Seq(1L)) finally it.close()
    // completing the line makes it visible — exactly once, correct pos
    append(rec(2).drop(20) + "\n")
    val it2 = ChangelogFiles.readRange(f, 1, Long.MaxValue)
    try assert(it2.toSeq.map(_.pos) === Seq(1L, 2L)) finally it2.close()
  }

  test("readRange close() releases the reader before exhaustion") {
    val f = ChangelogFiles.listFiles(dir).head._2
    val it = ChangelogFiles.readRange(f, 1, 100)
    assert(it.hasNext)
    it.close()   // must not throw; double-close safe
    it.close()
  }

  test("AdmissionBudget: idle keys never dilute active ones; shares roll over") {
    // one active table among three idle ones gets the WHOLE budget
    assert(AdmissionBudget.allocate(Seq("a", "b", "c", "d"),
      Map("a" -> 0L, "b" -> 100L, "c" -> 0L, "d" -> 0L), 40L) ===
      Map("a" -> 0L, "b" -> 40L, "c" -> 0L, "d" -> 0L))
    // a small backlog's unused share rolls over to the big one
    assert(AdmissionBudget.allocate(Seq("a", "b"),
      Map("a" -> 3L, "b" -> 100L), 40L) === Map("a" -> 3L, "b" -> 37L))
    // even split when everyone has deep backlog
    assert(AdmissionBudget.allocate(Seq("a", "b"),
      Map("a" -> 100L, "b" -> 100L), 40L) === Map("a" -> 20L, "b" -> 20L))
    // grants never exceed the budget or any backlog
    assert(AdmissionBudget.allocate(Seq("a", "b"),
      Map("a" -> 5L, "b" -> 7L), 100L) === Map("a" -> 5L, "b" -> 7L))
    // over-subscribed (budget < #backlogged keys): earliest keys win,
    // each granted key still progresses by >= 1
    assert(AdmissionBudget.allocate(Seq("a", "b", "c"),
      Map("a" -> 9L, "b" -> 9L, "c" -> 9L), 2L) ===
      Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
    // zero budget / no keys are clean no-ops
    assert(AdmissionBudget.allocate(Seq("a"), Map("a" -> 9L), 0L) === Map("a" -> 0L))
    assert(AdmissionBudget.allocate(Nil, Map.empty[String, Long], 10L) === Map.empty)
  }

  test("countBetween sums record counts across files from metadata") {
    assert(ChangelogFiles.countBetween(dir,
      BinlogOffset(1, 1), ChangelogFiles.latestOffset(dir)) === 1000L)
    assert(ChangelogFiles.countBetween(dir,
      BinlogOffset(1, 251), BinlogOffset(2, 51)) === 100L)
    assert(ChangelogFiles.countBetween(dir,
      BinlogOffset(2, 1), BinlogOffset(2, 1)) === 0L)
  }

  test("listFiles serves a SETTLED dir from cache yet sees every " +
      "structural change and every tail append") {
    val d = Files.createTempDirectory("graft-dirlist").toString
    ChangelogGenerator.generate(Tables(spark, sfDir).events, d,
      recordsPerFile = 500) // 1000 events -> 2 files
    // age the dir past the mtime-granularity guard: the steady-state
    // shape of a long-lived log (files exist, none created just now)
    def age(): Unit = java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(d),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    age()
    val first = ChangelogFiles.listFiles(d)
    assert(first.map(_._1) === Seq(1L, 2L))
    // an unchanged settled dir is a pure cache hit (same instance —
    // no enumeration, no per-file stats)
    assert(ChangelogFiles.listFiles(d) eq first)
    // appends to the live tail do NOT invalidate the listing (the dir
    // mtime is untouched) and MUST still advance the offset — the
    // listing is files-identity, recordCount is content
    val before = ChangelogFiles.latestOffset(d)
    val tail = first.last._2
    val out = new java.io.FileOutputStream(tail, true)
    try out.write(
      (ChangelogRecord.write(ChangelogRecord(0L, "insert", "graft",
        "events", 1L, Map("event_id" -> EnvelopeValue.VString("x")))) + "\n")
        .getBytes("UTF-8"))
    finally out.close()
    assert(ChangelogFiles.listFiles(d) eq first)
    val after = ChangelogFiles.latestOffset(d)
    assert(after.pos === before.pos + 1, s"$before -> $after")
    // a NEW file bumps the dir mtime: the next listing sees it even
    // from the settled state
    val f3 = new java.io.File(d, "graft-bin.000003")
    java.nio.file.Files.copy(first.head._2.toPath, f3.toPath)
    assert(ChangelogFiles.listFiles(d).map(_._1) === Seq(1L, 2L, 3L))
    // deletion is a structural change too
    assert(f3.delete())
    assert(ChangelogFiles.listFiles(d).map(_._1) === Seq(1L, 2L))
  }
}
