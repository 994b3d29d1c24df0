package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.cdc._
import graft.sources.wal.{WalDataSource, WalOffset}

/** End-to-end tests of the multi-region graft-wal source: map offsets,
  * independent region progression, per-region partitions, put/delete
  * envelope family, checkpoint recovery of the map offset.
  */
class WalSourceSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  private val NumRegions = 4

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-wal").toString
    WalGenerator.generate(Tables(spark, sfDir).events, d, NumRegions, recordsPerFile = 100)
    d
  }

  test("wal offset JSON round-trips with deterministic key order") {
    val o = WalOffset(Map("region-002" -> 5L, "region-000" -> 9L))
    assert(o.json() === """{"region-000":9,"region-002":5}""")
    assert(WalOffset.parse(o.json()) === o)
  }

  test("batch read covers all regions; envelopes are put/delete HBase rows") {
    val df = spark.read.format("graft-wal").option("path", dir).load()
    val values = df.select("value").as[String].collect()
    assert(values.length === 1000)
    val evs = values.map(EnvelopeCodec.parse)
    assert(evs.forall(e => e.eventType == "put" || e.eventType == "delete"))
    assert(evs.forall(_.schemaJson == null)) // HBase envelopes embed no schema
    assert(evs.forall(_.row.contains("rowkey")))
    assert(evs.forall(_.row.keys.exists(_.startsWith("d:"))))
    assert(evs.map(_.tableName).toSet === (0 until NumRegions).map(i => f"region-$i%03d").toSet)
    // delete mutations are exactly the error events
    val nDeletes = Tables(spark, sfDir).events.filter($"event_type" === "error").count()
    assert(evs.count(_.eventType == "delete") === nDeletes)
  }

  test("startTime drops older entries at the source, offsets intact") {
    val all = spark.read.format("graft-wal").option("path", dir).load()
      .select("value").as[String].collect().map(EnvelopeCodec.parse)
    // cut at the median event time: strictly between min and max
    val ts = all.map(_.timestamp).sorted
    val cut = ts(ts.length / 2)
    val kept = spark.read.format("graft-wal").option("path", dir)
      .option("startTime", cut.toString)
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    assert(kept.nonEmpty && kept.length < all.length)
    assert(kept.forall(_.timestamp >= cut))
    assert(kept.length === all.count(_.timestamp >= cut))
    // the filter is source-side, not offset-side: surviving records
    // keep the exact offsets they had in the unfiltered read
    val unfilteredOffsets = all.filter(_.timestamp >= cut).map(_.offset).sorted
    assert(kept.map(_.offset).sorted.toSeq === unfilteredOffsets.toSeq)
    // a streaming read under the same option sees the same record set
    val ck = Files.createTempDirectory("ck").toString
    val q = spark.readStream.format("graft-wal").option("path", dir)
      .option("startTime", cut.toString)
      .load().writeStream.format("memory").queryName("wal_start_time")
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("wal_start_time").count() === kept.length.toLong)
  }

  test("db/table regex filters cut at the source with offsets intact") {
    val all = spark.read.format("graft-wal").option("path", dir).load()
      .select("value").as[String].collect().map(EnvelopeCodec.parse)
    // table == region in the fixture: keep two of four regions
    val kept = spark.read.format("graft-wal").option("path", dir)
      .option("databaseNamePattern", "wal")
      .option("tableNamePattern", "region-00[01]")
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    val expected = all.filter(e =>
      e.tableName == "region-000" || e.tableName == "region-001")
    assert(kept.nonEmpty && kept.length < all.length)
    assert(kept.length === expected.length)
    // position-intact: surviving mutations keep the exact offsets they
    // had unfiltered
    assert(kept.map(_.offset).sorted.toSeq ===
      expected.map(_.offset).sorted.toSeq)
    // a non-matching db pattern empties the read (fixture db is "wal")
    assert(spark.read.format("graft-wal").option("path", dir)
      .option("databaseNamePattern", "otherdb").load().count() === 0L)
    // streaming under the filter: same record set, and the CHECKPOINT
    // advances through filtered regions exactly like the unfiltered
    // stream — the filter never holds an offset back
    val ck = Files.createTempDirectory("ck").toString
    val q = spark.readStream.format("graft-wal").option("path", dir)
      .option("tableNamePattern", "region-00[01]")
      .load().writeStream.format("memory").queryName("wal_tbl_filter")
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("wal_tbl_filter").count() === expected.length.toLong)
    val lastBatch = new java.io.File(s"$ck/offsets").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    val offLine = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$ck/offsets/$lastBatch")).toArray.last.toString
    val committed = WalOffset.parse(offLine).regions
    val unfiltered = WalDataSource.listRegions(dir).map(r =>
      r -> ChangelogFiles.latestOffset(s"$dir/$r").packed).toMap
    assert(committed === unfiltered,
      "filtered regions must advance their offsets like any other")
  }

  test("plan-level region/op pushdown prunes regions and stays exact") {
    val df = spark.read.format("graft-wal").option("path", dir)
      .option("envelopeColumns", "true").load()
    assert(df.columns.toSeq ===
      Seq("value", "region", "db", "table", "op", "offset"))
    val all = df.collect()
    assert(all.length === 1000)
    // region equality: the filter is pushed (plan advertises it) and
    // prunes whole regions off the partition plan
    val q = df.filter($"region" === "region-002" && $"op" === "delete")
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"))
    val expect = all.filter(r =>
      r.getString(1) == "region-002" && r.getString(4) == "delete")
    assert(q.count() === expect.length.toLong)
    // partition-plan pruning is observable at the planner level
    val optsMap = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir, "envelopeColumns", "true"))
    val base = graft.sources.wal.WalSourceConf(optsMap)
    val fullParts = new graft.sources.wal.WalBatch(base)
      .planInputPartitions().length
    val pruned = new graft.sources.wal.WalBatch(
      base.copy(regionFilter = Some(Set("region-002"))))
      .planInputPartitions().length
    assert(pruned < fullParts,
      s"region-pruned plan ($pruned) must shrink vs full ($fullParts)")
    // wide columns agree with the envelopes
    all.take(50).foreach { r =>
      val ev = EnvelopeCodec.parse(r.getString(0))
      assert(r.getString(2) === ev.databaseName)
      assert(r.getString(3) === ev.tableName)
      assert(r.getString(4) === ev.eventType)
      assert(r.getLong(5) === ev.offset)
    }
  }

  test("cell grouping composes with table filters: whole mutations only") {
    val d2 = Files.createTempDirectory("graft-wal-cellfilter").toString
    WalGenerator.generate(Tables(spark, sfDir).events, d2, NumRegions,
      recordsPerFile = 100, cellPerRecord = true)
    val grouped = spark.read.format("graft-wal").option("path", d2)
      .option("groupRawCells", "true")
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    val filtered = spark.read.format("graft-wal").option("path", d2)
      .option("groupRawCells", "true")
      .option("tableNamePattern", "region-00[01]")
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    val expected = grouped.filter(e =>
      e.tableName == "region-000" || e.tableName == "region-001")
    // the filter applies AFTER grouping: every surviving mutation is
    // byte-identical to its unfiltered twin (same cells, same offset)
    assert(filtered.map(e => (e.offset, e.row)).sortBy(_._1).toSeq ===
      expected.map(e => (e.offset, e.row)).sortBy(_._1).toSeq)
  }

  test("in-place redaction erases rowkeys from every region with offsets intact") {
    // private copy: redaction mutates the files
    val d2 = Files.createTempDirectory("graft-wal-redact").toString
    WalGenerator.generate(Tables(spark, sfDir).events, d2, NumRegions,
      recordsPerFile = 100)
    def rowkeys(): Seq[String] = {
      val df = spark.read.format("graft-wal").option("path", d2).load()
      df.select("value").as[String].collect().toSeq
        .map(v => EnvelopeCodec.parse(v).row("rowkey") match {
          case EnvelopeValue.VString(s) => s
          case other => other.toString
        })
    }
    val before = rowkeys()
    val erase = Set("3", "19", "42")
    assert(before.exists(erase), "fixture must contain the erased rowkeys")
    val offBefore = WalDataSource.listRegions(d2).map(r =>
      r -> ChangelogFiles.latestOffset(s"$d2/$r").packed).toMap
    val n = WalDataSource.listRegions(d2).map { r =>
      LogRedaction.redact(s"$d2/$r") { rec =>
        rec.row.get("rowkey").exists {
          case EnvelopeValue.VString(s) => erase(s)
          case _ => false
        }
      }
    }.sum
    assert(n === before.count(erase))
    val after = rowkeys()
    assert(after.sorted === before.filterNot(erase).sorted)
    // region offsets (line positions) unchanged by redaction
    val offAfter = WalDataSource.listRegions(d2).map(r =>
      r -> ChangelogFiles.latestOffset(s"$d2/$r").packed).toMap
    assert(offAfter === offBefore)
  }

  test("streaming with per-trigger cap: all rows arrive, batches are bounded") {
    val q = spark.readStream.format("graft-wal")
      .option("path", dir).option("maxEventsPerTrigger", "200")
      .load().writeStream.format("memory").queryName("wal_all")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("wal_all").count() === 1000L)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.forall(_ <= 200L), s"batch sizes: ${sizes.mkString(",")}")
  }

  test("regions advance independently: appending to ONE region moves only its offset") {
    // copy the fixture so we can grow one region
    val grow = Files.createTempDirectory("wal-grow").toString
    for (r <- WalDataSource.listRegions(dir)) {
      val src = new java.io.File(dir, r); val dst = new java.io.File(grow, r)
      dst.mkdirs()
      for (f <- src.listFiles()) {
        java.nio.file.Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
      }
    }
    val ck = Files.createTempDirectory("ck-region").toString
    val out = Files.createTempDirectory("wal-out").toString + "/rows"
    def run(): Long = {
      val q = spark.readStream.format("graft-wal").option("path", grow)
        .load().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).count()
    }
    assert(run() === 1000L)

    // grow region-000 with 50 extra put records in a NEW log file
    val r0 = new java.io.File(grow, "region-000")
    val lastId = ChangelogFiles.listFiles(r0.toString).last._1
    val extra = new java.io.File(r0, f"graft-bin.${lastId + 1}%06d")
    val w = new java.io.FileWriter(extra)
    for (i <- 1 to 50) {
      w.write(ChangelogRecord.write(ChangelogRecord(i, "put", "wal", "region-000",
        9999990000L + i, Map(
          "rowkey" -> EnvelopeValue.VString(s"x$i"),
          "d:event_id" -> EnvelopeValue.VString(s"${900000 + i}")))))
      w.write("\n")
    }
    w.close()

    // restart on the same checkpoint: exactly the 50 new records arrive
    assert(run() === 1050L)
    val evs = spark.read.parquet(out).select("value").as[String].collect()
      .map(EnvelopeCodec.parse)
    assert(evs.length === 1050)
    // no duplicates: (table, offset) unique
    assert(evs.map(e => (e.tableName, e.offset)).distinct.length === 1050)
    // the 50 new ones (rowkey x*) are all in region-000
    val added = evs.filter(_.row.get("rowkey").exists {
      case EnvelopeValue.VString(s) => s.startsWith("x")
      case _ => false
    })
    assert(added.length === 50)
    assert(added.forall(_.tableName == "region-000"))
  }

  test("failOnDataLoss: a purged region file with unread records fails the plan") {
    import graft.sources.wal.{WalPartitioning, WalSourceConf}
    import scala.jdk.CollectionConverters._
    // clone one region, then purge its head file but keep the manifest
    val cloned = java.nio.file.Files.createTempDirectory("wal-pruned").toString
    val region = WalDataSource.listRegions(dir).head
    val rd = new java.io.File(cloned, region); rd.mkdirs()
    val srcFiles = ChangelogFiles.listFiles(s"$dir/$region")
    srcFiles.filter(_._1 >= 2).foreach { case (_, f) =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(rd, f.getName).toPath)
    }
    java.nio.file.Files.copy(
      new java.io.File(s"$dir/$region", ChangelogFiles.ManifestName).toPath,
      new java.io.File(rd, ChangelogFiles.ManifestName).toPath)

    def confWith(opts: Map[String, String]) = WalSourceConf(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        (Map("path" -> cloned) ++ opts).asJava))
    val latest = WalOffset(Map(region ->
      ChangelogFiles.latestOffset(s"$cloned/$region").packed))

    // reader mid-way through the purged file: loss must surface
    val midPurged = WalOffset(Map(region -> BinlogOffset(1, 50).packed))
    intercept[IllegalStateException] {
      WalPartitioning.plan(confWith(Map.empty), midPurged, latest)
    }
    // same offsets with failOnDataLoss=false: skip silently, plan the rest
    assert(WalPartitioning.plan(
      confWith(Map("failOnDataLoss" -> "false")), midPurged, latest).nonEmpty)
    // a reader that fully consumed the purged file is not a loss
    val consumed = WalOffset(Map(region ->
      BinlogOffset(1, ChangelogFiles.manifestCount(rd.toString,
        srcFiles.head._2.getName).get + 1).packed))
    assert(WalPartitioning.plan(confWith(Map.empty), consumed, latest).nonEmpty)
  }

  test("T5: raw per-cell log groups into the same mutations as the pre-grouped log") {
    val rawDir = java.nio.file.Files.createTempDirectory("wal-raw").toString
    WalGenerator.generate(Tables(spark, sfDir).events, rawDir, NumRegions,
      recordsPerFile = 100, cellPerRecord = true)
    def mutations(dir: String, opts: Map[String, String]) = {
      var r = spark.read.format("graft-wal").option("path", dir)
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load().select("value").as[String].collect()
        .map(EnvelopeCodec.parse)
        .map(e => (e.tableName, e.eventType, e.timestamp,
          e.row.toSeq.sortBy(_._1).toList))
    }
    val grouped = mutations(rawDir, Map("groupRawCells" -> "true"))
    val expected = mutations(dir, Map.empty)
    assert(grouped.length === expected.length)
    assert(grouped.toSet === expected.toSet)
    // ungrouped raw read sees 3 cells per event
    assert(mutations(rawDir, Map.empty).length === expected.length * 3)
  }

  test("T5: grouping splits on row change, op change, and timestamp change") {
    val d = java.nio.file.Files.createTempDirectory("wal-bounds").toString
    val rd = new java.io.File(d, "region-b"); rd.mkdirs()
    def cell(pos: Long, op: String, rk: String, ts: Long,
        q: String, v: String): String =
      ChangelogRecord.write(ChangelogRecord(pos, op, "wal", "region-b", ts,
        Map("rowkey" -> EnvelopeValue.VString(rk),
          q -> EnvelopeValue.VString(v)))) + "\n"
    java.nio.file.Files.write(new java.io.File(rd, "graft-bin.000001").toPath,
      Seq(
        cell(1, "put", "r1", 10, "d:a", "1"),
        cell(2, "put", "r1", 10, "d:b", "2"), // same mutation as pos 1
        cell(3, "put", "r1", 11, "d:a", "3"), // ts change → new mutation
        cell(4, "delete", "r1", 11, "d:a", "3"), // op change → new
        cell(5, "put", "r2", 11, "d:a", "4")  // row change → new
      ).mkString.getBytes("UTF-8"))

    val out = spark.read.format("graft-wal").option("path", d)
      .option("groupRawCells", "true")
      .load().select("value").as[String].collect()
      .map(EnvelopeCodec.parse).sortBy(_.offset)
    assert(out.length === 4)
    def cellsOf(i: Int) = out(i).row.keySet.filter(_ != "rowkey")
    assert(cellsOf(0) === Set("d:a", "d:b")) // two cells folded
    assert(out(0).offset === BinlogOffset(1, 2).packed) // last cell's pos
    assert(out(1).eventType === "put" && out(2).eventType === "delete")
    assert(cellsOf(3) === Set("d:a"))
  }

  test("T5: streaming raw-cell log never splits a mutation across micro-batches") {
    val d = java.nio.file.Files.createTempDirectory("wal-align").toString
    val rd = new java.io.File(d, "region-s"); rd.mkdirs()
    val f = new java.io.File(rd, "graft-bin.000001")
    def cells(startPos: Long, rk: String, ts: Long): String =
      (0 until 3).map { i =>
        ChangelogRecord.write(ChangelogRecord(startPos + i, "put", "wal",
          "region-s", ts, Map("rowkey" -> EnvelopeValue.VString(rk),
            s"d:q$i" -> EnvelopeValue.VString(i.toString)))) + "\n"
      }.mkString
    def append(s: String): Unit = {
      val w = new java.io.FileWriter(f, true); w.write(s); w.close()
    }
    append(cells(1, "a", 1) + cells(4, "b", 2))

    val seen = scala.collection.mutable.ArrayBuffer.empty[CdcEvent]
    val q = spark.readStream.format("graft-wal").option("path", d)
      .option("groupRawCells", "true")
      .option("maxEventsPerTrigger", "4") // cap lands mid-mutation
      .load().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("value").collect().foreach(r =>
          seen.synchronized { seen += EnvelopeCodec.parse(r.getString(0)) }); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      // mutation "a" arrives WHOLE; "b" sits at the live tail where its
      // completeness is unknowable, so it is deferred, not split
      seen.synchronized {
        assert(seen.map(e => e.row("rowkey")) ===
          Seq(EnvelopeValue.VString("a")))
        assert(seen.head.row.keySet.count(_ != "rowkey") === 3)
      }
      // a later mutation proves "b" is complete — it is served whole
      append(cells(7, "c", 3))
      q.processAllAvailable()
      seen.synchronized {
        assert(seen.map(e => e.row("rowkey")) ===
          Seq(EnvelopeValue.VString("a"), EnvelopeValue.VString("b")))
        assert(seen.forall(_.row.keySet.count(_ != "rowkey") === 3))
      }
    } finally q.stop()
  }

  test("T5: a mutation larger than the admission cap aligns UP — no livelock") {
    val d = java.nio.file.Files.createTempDirectory("wal-align-up").toString
    val rd = new java.io.File(d, "region-u"); rd.mkdirs()
    val f = new java.io.File(rd, "graft-bin.000001")
    def cells(startPos: Long, rk: String, ts: Long): String =
      (0 until 3).map { i =>
        ChangelogRecord.write(ChangelogRecord(startPos + i, "put", "wal",
          "region-u", ts, Map("rowkey" -> EnvelopeValue.VString(rk),
            s"d:q$i" -> EnvelopeValue.VString(i.toString)))) + "\n"
      }.mkString
    def append(s: String): Unit = {
      val w = new java.io.FileWriter(f, true); w.write(s); w.close()
    }
    append(cells(1, "a", 1) + cells(4, "b", 2))

    val seen = scala.collection.mutable.ArrayBuffer.empty[CdcEvent]
    val q = spark.readStream.format("graft-wal").option("path", d)
      .option("groupRawCells", "true")
      .option("maxEventsPerTrigger", "2") // cap SMALLER than one mutation
      .load().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("value").collect().foreach(r =>
          seen.synchronized { seen += EnvelopeCodec.parse(r.getString(0)) }); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      // the 3-cell mutation exceeds the 2-row budget: the end extends to
      // the mutation boundary (soft overrun) instead of stalling forever
      seen.synchronized {
        assert(seen.map(e => e.row("rowkey")) ===
          Seq(EnvelopeValue.VString("a")))
      }
      append(cells(7, "c", 3))
      q.processAllAvailable()
      seen.synchronized {
        assert(seen.map(e => e.row("rowkey")) ===
          Seq(EnvelopeValue.VString("a"), EnvelopeValue.VString("b")))
        assert(seen.forall(_.row.keySet.count(_ != "rowkey") === 3))
      }
    } finally q.stop()
  }

  test("T5: a finished WAL (manifest-complete) serves its trailing mutation") {
    // the live-tail defer must NOT apply to a file whose manifest entry
    // matches its length — the writer closed it, so the last mutation is
    // provably complete. Regression: a finite raw-cell fixture streamed
    // with grouping used to withhold every region's final mutation.
    val rawDir = java.nio.file.Files.createTempDirectory("wal-fin").toString
    WalGenerator.generate(Tables(spark, sfDir).events, rawDir, NumRegions,
      recordsPerFile = 100, cellPerRecord = true)
    val q = spark.readStream.format("graft-wal").option("path", rawDir)
      .option("groupRawCells", "true")
      .option("maxEventsPerTrigger", "97") // caps land mid-mutation
      .load().writeStream.format("memory").queryName("wal_finished")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // every mutation arrives — including each region's last
    assert(spark.table("wal_finished").count() === 1000L)
  }

  test("T5: grouping refuses a mid-mutation start offset instead of splitting") {
    import graft.sources.wal.{WalPartitioning, WalSourceConf}
    import scala.jdk.CollectionConverters._
    val d = java.nio.file.Files.createTempDirectory("wal-midstart").toString
    val rd = new java.io.File(d, "region-m"); rd.mkdirs()
    def cell(pos: Long, rk: String, ts: Long, q: String): String =
      ChangelogRecord.write(ChangelogRecord(pos, "put", "wal", "region-m", ts,
        Map("rowkey" -> EnvelopeValue.VString(rk),
          q -> EnvelopeValue.VString("v")))) + "\n"
    java.nio.file.Files.write(new java.io.File(rd, "graft-bin.000001").toPath,
      (Seq(cell(1, "a", 1, "d:x"), cell(2, "a", 1, "d:y"), cell(3, "a", 1, "d:z")) ++
        Seq(cell(4, "b", 2, "d:x"), cell(5, "b", 2, "d:y"))).mkString.getBytes("UTF-8"))
    val conf = WalSourceConf(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> d, "groupRawCells" -> "true").asJava))
    val end = WalOffset(Map("region-m" -> BinlogOffset(1, 6).packed))
    // pos 2 splits mutation "a": refused with a clear message
    val ex = intercept[IllegalStateException] {
      WalPartitioning.plan(conf,
        WalOffset(Map("region-m" -> BinlogOffset(1, 2).packed)), end)
    }
    assert(ex.getMessage.contains("not a mutation boundary"))
    // pos 4 is a boundary (mutation "b" starts): plans fine
    assert(WalPartitioning.plan(conf,
      WalOffset(Map("region-m" -> BinlogOffset(1, 4).packed)), end).nonEmpty)
    // without grouping the same mid-mutation start is a plain record
    // offset — allowed
    val rawConf = WalSourceConf(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> d).asJava))
    assert(WalPartitioning.plan(rawConf,
      WalOffset(Map("region-m" -> BinlogOffset(1, 2).packed)), end).nonEmpty)
  }

  test("manifest bounds: written at roll time, read back, and alignment uses them") {
    val rawDir = java.nio.file.Files.createTempDirectory("wal-bnds").toString
    WalGenerator.generate(Tables(spark, sfDir).events, rawDir, NumRegions,
      recordsPerFile = 100, cellPerRecord = true)
    val region = WalDataSource.listRegions(rawDir).head
    val rd = s"$rawDir/$region"
    val files = ChangelogFiles.listFiles(rd)
    val m = ChangelogFiles.manifest(rd)
    assert(files.nonEmpty && m.nonEmpty)
    for ((_, f) <- files) {
      val e = m(f.getName)
      assert(e.bounds.nonEmpty, s"${f.getName}: no bounds in manifest")
      assert(e.bounds.head === 1L)
      assert(e.bounds === e.bounds.sorted)
      assert(e.bounds.last <= e.count)
      // the boundary index resolves completed files from the manifest…
      val (n, bounds) = graft.sources.wal.MutationBoundaries.of(rd, f)
      assert(n === e.count)
      assert(bounds === e.bounds.toVector)
      // …and the manifest bounds agree with a from-scratch content
      // parse (copy to a manifest-less dir to force the scan path)
      val scanDir = java.nio.file.Files.createTempDirectory("wal-bnds-scan")
      val copied = new java.io.File(scanDir.toFile, f.getName)
      java.nio.file.Files.copy(f.toPath, copied.toPath)
      val (n2, scanned) =
        graft.sources.wal.MutationBoundaries.of(scanDir.toString, copied)
      assert(n2 === e.count)
      assert(scanned === e.bounds.toVector)
    }
  }

  test("oldWALs archive: rotated files keep serving with offsets intact") {
    val root = java.nio.file.Files.createTempDirectory("wal-archive").toString
    val rd = new java.io.File(root, "region-a"); rd.mkdirs()
    def rec(pos: Long, id: Long) = ChangelogRecord.write(
      ChangelogRecord(pos, "put", "wal", "region-a", 1000 + id,
        Map("rowkey" -> EnvelopeValue.VString(s"r$id"),
          "d:v" -> EnvelopeValue.VString(id.toString)))) + "\n"
    def writeFile(fid: Long, recs: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(rd, f"graft-bin.$fid%06d").toPath,
        recs.mkString.getBytes("UTF-8"))
    writeFile(1, (1L to 3L).map(i => rec(i, i)))
    writeFile(2, (1L to 2L).map(i => rec(i, 3 + i)))

    val ck = java.nio.file.Files.createTempDirectory("ck-arch").toString
    val out = java.nio.file.Files.createTempDirectory("arch-out").toString + "/rows"
    def run(): Seq[(String, Long)] = {
      val q = spark.readStream.format("graft-wal").option("path", root)
        .load().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).select("value").as[String].collect().toSeq
        .map(EnvelopeCodec.parse)
        .map(e => (e.row("rowkey").asInstanceOf[EnvelopeValue.VString].v,
          e.offset))
    }
    assert(run().map(_._1).sorted === (1L to 5L).map(i => s"r$i").sorted)

    // rotate BOTH consumed files into the archive, append a new live one
    val arch = new java.io.File(root, s"${WalDataSource.ArchiveSubDir}/region-a")
    arch.mkdirs()
    for (fid <- Seq(1L, 2L)) {
      val name = f"graft-bin.$fid%06d"
      java.nio.file.Files.move(new java.io.File(rd, name).toPath,
        new java.io.File(arch, name).toPath)
    }
    writeFile(3, (1L to 2L).map(i => rec(i, 5 + i)))

    // the same checkpoint resumes cleanly: only the new records arrive,
    // offsets keep ascending across the archive boundary
    val all = run()
    assert(all.map(_._1).sorted === (1L to 7L).map(i => s"r$i").sorted)
    assert(all.map(_._2).distinct.length === 7) // no offset collisions

    // a FRESH read of the mixed live/archived layout serves everything:
    // archived records keep their original (fileId, pos) offsets
    val batch = spark.read.format("graft-wal").option("path", root)
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    assert(batch.length === 7)
    assert(batch.map(_.offset).toSet === all.map(_._2).toSet)
    assert(batch.map(_.offset).min === BinlogOffset(1, 1).packed)

    // a region living ONLY in the archive still lists and serves
    for (f <- rd.listFiles()) f.delete()
    rd.delete()
    assert(WalDataSource.listRegions(root) === Seq("region-a"))
    val archOnly = spark.read.format("graft-wal").option("path", root)
      .load().count()
    assert(archOnly === 5L)
  }

  test("generator bounds merge adjacent same-key mutations like the read fold") {
    import graft.SparkSuite.spark.implicits._
    // two events with the SAME (user_id, event_type, ts): the reader's
    // fold merges them into one mutation, so the manifest must NOT
    // record a phantom boundary between them
    val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1000))
    val ev = Seq(
      (1L, 7L, "click", 0.5, null.asInstanceOf[String], ts),
      (2L, 7L, "click", 0.7, null.asInstanceOf[String], ts), // same key
      (3L, 7L, "error", 0.9, null.asInstanceOf[String], ts)) // error → delete: op change
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
    val d = java.nio.file.Files.createTempDirectory("wal-samekey").toString
    WalGenerator.generate(ev, d, numRegions = 1, recordsPerFile = 100,
      cellPerRecord = true)
    val rd = s"$d/region-000"
    val f = ChangelogFiles.listFiles(rd).head._2
    val manifestBounds = ChangelogFiles.manifest(rd)(f.getName).bounds
    // content scan (manifest-less copy) must agree exactly
    val scanDir = java.nio.file.Files.createTempDirectory("wal-samekey-scan")
    val copied = new java.io.File(scanDir.toFile, f.getName)
    java.nio.file.Files.copy(f.toPath, copied.toPath)
    val (_, scanned) =
      graft.sources.wal.MutationBoundaries.of(scanDir.toString, copied)
    assert(manifestBounds.toVector === scanned)
    // 9 cells, 2 mutations after the same-key merge: bounds 1 and 7
    assert(scanned === Vector(1L, 7L))
    // and the grouped read serves 2 mutations
    val out = spark.read.format("graft-wal").option("path", d)
      .option("groupRawCells", "true").load().count()
    assert(out === 2L)
  }

  test("twinPath maps live and archived locations onto each other") {
    import graft.sources.wal.WalDataSource.{twinPath, ArchiveSubDir}
    assert(twinPath("/w/region-1/graft-bin.000001") ===
      s"/w/$ArchiveSubDir/region-1/graft-bin.000001")
    assert(twinPath(s"/w/$ArchiveSubDir/region-1/graft-bin.000001") ===
      "/w/region-1/graft-bin.000001")
    // external archive (the reference's oldWALLogPath): both directions
    assert(twinPath("/w/region-1/graft-bin.000001",
      Some("/w"), Some("/arch")) === "/arch/region-1/graft-bin.000001")
    assert(twinPath("/arch/region-1/graft-bin.000001",
      Some("/w"), Some("/arch")) === "/w/region-1/graft-bin.000001")
  }

  test("oldWALLogPath: an external archive root serves rotated files " +
      "with offsets intact") {
    val root = Files.createTempDirectory("wal-ext").toString
    val arch = Files.createTempDirectory("wal-ext-arch").toString
    WalGenerator.generate(Tables(spark, sfDir).events.limit(60), root,
      numRegions = 2, recordsPerFile = 10)
    val before = spark.read.format("graft-wal").option("path", root)
      .option("oldWALLogPath", arch)
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    // rotate one region's FIRST file into the EXTERNAL archive
    val region = WalDataSource.listRegions(root).head
    val f = ChangelogFiles.listFiles(s"$root/$region").head._2
    val dest = new java.io.File(s"$arch/$region")
    dest.mkdirs()
    java.nio.file.Files.move(f.toPath,
      new java.io.File(dest, f.getName).toPath)
    val after = spark.read.format("graft-wal").option("path", root)
      .option("oldWALLogPath", arch)
      .load().select("value").as[String].collect().map(EnvelopeCodec.parse)
    assert(after.length === before.length)
    assert(after.map(_.offset).sorted.toSeq ===
      before.map(_.offset).sorted.toSeq)
    // without the option the moved file is invisible (the in-root
    // archive layout knows nothing of the external dir)
    val blind = spark.read.format("graft-wal").option("path", root)
      .load().count()
    assert(blind < before.length.toLong)
  }

  test("plan-pushed filters apply to BATCH scans only: the streaming " +
      "path keeps the option-level conf") {
    import graft.sources.wal.{WalScan, WalScanBuilder, WalMicroBatchStream}
    import org.apache.spark.sql.sources.EqualTo
    import scala.jdk.CollectionConverters._
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> dir, "envelopeColumns" -> "true",
        "tableNamePattern" -> "events").asJava)
    val b = new WalScanBuilder(opts)
    val pushed = b.pushFilters(Array(
      EqualTo("region", "region-001"), EqualTo("op", "put"),
      EqualTo("db", "graft")))
    // every filter stays in the plan as the correctness boundary
    assert(pushed.length == 3)
    val scan = b.build().asInstanceOf[WalScan]
    // batch conf carries the plan-derived cuts (pure optimization —
    // Spark re-evaluates the retained filters above the scan)
    assert(scan.conf.regionFilter.contains(Set("region-001")))
    assert(scan.conf.opFilter.contains(Set("put")))
    assert(scan.conf.databaseNamePattern.nonEmpty)
    // streaming conf drops ALL plan-derived overrides: latestOffset
    // advances every region into the checkpoint, so pruning regions
    // off a checkpointed stream's plan would silently skip their
    // history if the user later widens the (transparent) plan filter
    // and resumes — only explicit option-level patterns narrow a
    // stream at the source
    val ms = scan.toMicroBatchStream(freshTmp())
      .asInstanceOf[WalMicroBatchStream]
    assert(ms.conf.regionFilter.isEmpty, "plan region filter must not reach streaming")
    assert(ms.conf.opFilter.isEmpty, "plan op filter must not reach streaming")
    assert(ms.conf.databaseNamePattern.isEmpty, "plan db filter must not reach streaming")
    assert(ms.conf.tableNamePattern.contains("events"),
      "option-level pattern must survive on the streaming path")
  }

  private def freshTmp(): String =
    Files.createTempDirectory("wal-scan").toString

  test("plan emits at least one partition per non-empty region") {
    import graft.sources.wal.{WalPartitioning, WalSourceConf, WalInputPartition}
    import scala.jdk.CollectionConverters._
    val conf = WalSourceConf(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> dir).asJava))
    val regions = WalDataSource.listRegions(dir)
    val start = WalOffset(regions.map(r =>
      r -> ChangelogFiles.earliestOffset(s"$dir/$r").packed).toMap)
    val end = WalOffset(regions.map(r =>
      r -> ChangelogFiles.latestOffset(s"$dir/$r").packed).toMap)
    val parts = WalPartitioning.plan(conf, start, end)
      .map(_.asInstanceOf[WalInputPartition])
    assert(parts.map(_.region).distinct.sorted === regions)
  }
}
