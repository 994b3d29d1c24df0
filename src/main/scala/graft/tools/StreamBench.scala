package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}


import graft.Tables
import graft.cdc.ChangelogGenerator
import graft.streaming.CdcStream

/** Streaming micro-batch latency bench — the apples-to-apples
  * comparison against the ONLY quantitative numbers the reference
  * publishes: the user-reported streaming-progress log in its README
  * (README.md:276-285 — triggerExecution 337 ms, addBatch 207 ms,
  * getBatch 3 ms, getOffset 15 ms, queryPlanning 10 ms, walCommit
  * 63 ms for a 1-row micro-batch on a local run).
  *
  * Two scenarios, both REAL `readStream` queries over the graft-binlog
  * DSv2 source draining a pre-generated changelog in many small
  * micro-batches (`maxEventsPerTrigger` slices the backlog, so every
  * batch pays full offset-resolution + planning + commit overhead,
  * exactly what the reference's trigger loop pays per batch):
  *
  *  - `memory`: envelopes → memory sink (pure source + harness cost);
  *  - `merge`:  envelopes → parsed rows → bucket-scoped versioned
  *    MERGE replica (`foreachBatch` upsert — the reference's
  *    delta-plus consumer shape, its addBatch analog).
  *
  * Prints ONE JSON line: per-scenario batch count and MEDIAN / p95 of
  * Spark's own per-batch `durationMs` phases (triggerExecution,
  * addBatch, latestOffset, getBatch, queryPlanning, walCommit,
  * commitOffsets — medians over steady-state batches, the first batch
  * excluded as warmup).
  *
  *   sbt -batch "runMain graft.tools.StreamBench [sfDir]"
  */
object StreamBench {

  private def pct(xs: Seq[Long], p: Double): Long =
    if (xs.isEmpty) -1L
    else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val work = java.nio.file.Files.createTempDirectory("stream-bench")
    val logDir = work.resolve("log").toString
    // ~1k events in small files: 40+ micro-batches of ~25 events each
    ChangelogGenerator.generate(
      Tables(spark, sfDir).events.limit(1000), logDir, recordsPerFile = 100)

    // progress retention must cover every micro-batch of the drain
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "500")
    def run(name: String)(sink: DataFrame => Unit): Map[String, Seq[Long]] = {
      val q = spark.readStream.format("graft-binlog")
        .option("path", logDir)
        .option("maxEventsPerTrigger", "25")
        .load()
      val query = q.writeStream
        .foreachBatch { (b: DataFrame, _: Long) => sink(b) }
        .option("checkpointLocation",
          work.resolve(s"ck-$name").toString)
        .start()
      try query.processAllAvailable() finally query.stop()
      val all = query.recentProgress.toSeq.map { p =>
        scala.jdk.CollectionConverters.MapHasAsScala(p.durationMs).asScala
          .map { case (k, v) => k -> v.longValue() }.toMap +
          ("numInputRows" -> p.numInputRows)
      }
      // steady state: drop the first (warmup/planning-cache) batch
      // and empty tail batches
      val steady = all.drop(1).filter(_.getOrElse("numInputRows", 0L) > 0)
      steady.flatMap(_.keys).distinct
        .map(k => k -> steady.flatMap(_.get(k))).toMap
    }

    val envSchema = graft.queries.EventQueries.envelopeSchema
    val rowSc = envSchema.fields.find(_.name == "rows").get.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    def mergeSink(replica: String, defer: Boolean,
        conditional: Boolean = false)(b: DataFrame): Unit = {
      val batch = CdcStream.parsed(b, rowSc)
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("op"))
      CdcStream.applyBatchToReplica(replica, batch, Seq("user_id"),
        Seq(col("ts_ms"), col("event_id")), deferMerge = defer,
        conditionalOrder = conditional)
    }
    val scenarios = Seq(
      "memory" -> run("memory") { b => b.count(); () },
      "merge" -> run("merge")(
        mergeSink(work.resolve("replica").toString, defer = false)),
      // merge-on-read: per-batch cost is one delta append, no base
      // read/rewrite — the streaming-upsert latency path; compaction
      // folds the deltas out-of-band
      "merge_defer" -> run("merge_defer")(
        mergeSink(work.resolve("replica-mor").toString, defer = true)),
      // order-conditional + deferred (r9 composition): the same delta
      // append with order columns recorded — the out-of-order-safe
      // streaming-upsert path; the order compare is deferred to reads
      "merge_defer_cond" -> run("merge_defer_cond")(
        mergeSink(work.resolve("replica-mor-cond").toString, defer = true,
          conditional = true)))

    val phases = Seq("triggerExecution", "addBatch", "latestOffset",
      "getBatch", "queryPlanning", "walCommit", "commitOffsets")
    def r(v: Long): String = v.toString
    val body = scenarios.map { case (name, m) =>
      val n = m.get("triggerExecution").map(_.size).getOrElse(0)
      val fields = phases.flatMap { p =>
        m.get(p).map(xs =>
          s""""${p}_p50_ms":${r(pct(xs, 0.5))},"${p}_p95_ms":${r(pct(xs, 0.95))}""")
      }.mkString(",")
      s""""$name":{"batches":$n,$fields}"""
    }.mkString(",")
    // same host-telemetry stamp as BENCH_FULL.json: trigger-latency
    // swings on unchanged source code (r13→r14 p50 186→235 ms) need
    // the loadavg/iowait context to interpret from the artifact alone
    val env = graft.Bench.envJson()
    val line =
      s"""{"metric":"stream_batch_latency","sf":"$sfDir",$body,"env":$env}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMBENCH.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[streambench] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
