package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage time attribution for SparkEntry queries — the artifact a
  * future round reads to localize a regression WITHOUT re-deriving the
  * plan. For each named query (comma-separated; one warmup, then one
  * timed run) a job+stage listener records every job's wall time and
  * call site plus every stage's duration, task count, shuffle
  * read/write bytes and spill totals.
  *
  *   runMain graft.tools.ProfileQuery <q1,q2,...> [sfDir] [jsonOut]
  *
  * With a jsonOut argument the profile also lands as JSON (the
  * committed `PROFILE.json` covers the bench's five slowest queries).
  * Reading it: the top stage rows ARE the query's cost centers; a
  * regression that moves `total_sec` but not the stage mix is harness
  * noise, one that inflates a single stage names its operator.
  */
object ProfileQuery {

  private final case class StageRow(id: Int, name: String, ms: Double,
      tasks: Int, shuffleReadMb: Double, shuffleWriteMb: Double,
      spillMb: Double)
  private final case class JobRow(id: Int, ms: Double, site: String)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val jsonOut = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // opt-in AQE initial fan-out, to profile under the same
    // data-scaled parallelism DataScaleBench runs the 30×/100×
    // decades with (unset → the bench's fixed shuffle.partitions)
    sys.env.get("SPARK_GRAFT_INITIAL_PARTS").foreach(n => builder
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    sys.env.get("SPARK_GRAFT_ADVISORY_MB").foreach(n => builder
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${n}m"))
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    // stageId → owning job's call site: AQE-submitted stages all carry
    // the opaque "withThreadLocalCaptured" name, so the job site is
    // the only human-readable attribution
    val stageSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // SQL executionId → call-site description: AQE jobs' own call site
    // is the opaque CompletableFuture lambda, but the SQL execution
    // start event carries the user-level site ("parquet at X.scala:N")
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execSite.put(s.executionId,
            s.description.linesIterator.nextOption().getOrElse("?").take(140))
          ()
        case _ => ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val raw =
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
            .take(140).replace('\n', ' ')
        val site =
          if (!raw.contains("withThreadLocalCaptured")) raw
          else Option(j.properties.getProperty("spark.sql.execution.id"))
            .flatMap(id => Option(execSite.get(id.toLong))).getOrElse(raw)
        j.stageIds.foreach(id => stageSite.put(id, site))
        starts.put(j.jobId, (System.nanoTime(), site))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
        if (recording)
          jobs.add(JobRow(j.jobId, (System.nanoTime() - t0) / 1e6, site))
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        if (recording) {
          val i = s.stageInfo
          val m = i.taskMetrics
          val ms = (for {a <- i.completionTime; b <- i.submissionTime}
            yield (a - b).toDouble).getOrElse(0.0)
          val raw = i.name.take(140).replace('\n', ' ')
          val label =
            if (raw.contains("withThreadLocalCaptured"))
              stageSite.getOrDefault(i.stageId, raw)
            else raw
          stages.add(StageRow(i.stageId, label, ms, i.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6))
        }
        ()
      }
    })

    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val profiles = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup absorbs codegen + artifact builds; the timed run is the
      // steady-state shape the bench medians measure
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name warmup failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      // listener events deliver on an async bus thread: drain before
      // AND after the timed run so warmup stragglers stay out of the
      // recording window and the run's tail stages are not dropped
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      jobs.clear(); stages.clear(); recording = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val totalSec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      recording = false
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_.id)
      val ss = stages.asScala.toSeq.sortBy(-_.ms)
      println(f"=== $name: $totalSec%.2f s, ${js.size} jobs, ${ss.size} stages")
      ss.take(8).foreach { s =>
        println(f"  STAGE ${s.id}%4d ${s.ms}%8.1f ms ${s.tasks}%4d tasks " +
          f"shufR ${s.shuffleReadMb}%7.1f MB shufW ${s.shuffleWriteMb}%7.1f MB " +
          f"spill ${s.spillMb}%6.1f MB  ${s.name}")
      }
      // Locale.ROOT: comma-decimal default locales would corrupt the
      // JSON artifact
      def num(fmt: String, v: Double): String =
        fmt.formatLocal(java.util.Locale.ROOT, v)
      val jJson = js.map(j =>
        s"""{"id":${j.id},"ms":${num("%.1f", j.ms)},"site":"${esc(j.site)}"}""")
        .mkString("[", ",", "]")
      val sJson = ss.map(s =>
        s"""{"id":${s.id},"ms":${num("%.1f", s.ms)},"tasks":${s.tasks},""" +
          s""""shuffle_read_mb":${num("%.2f", s.shuffleReadMb)},""" +
          s""""shuffle_write_mb":${num("%.2f", s.shuffleWriteMb)},""" +
          s""""spill_mb":${num("%.2f", s.spillMb)},"name":"${esc(s.name)}"}""")
        .mkString("[", ",", "]")
      s""""$name":{"total_sec":${num("%.3f", totalSec)},""" +
        s""""n_jobs":${js.size},"jobs":$jJson,"stages":$sJson}"""
    }
    val line = s"""{"metric":"profile","sf_dir":"$sfDir",""" +
      s""""queries":{${profiles.mkString(",")}}}"""
    jsonOut.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
      println(s"wrote $p")
    }
    spark.stop()
  }
}
