package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev aid: run one SparkEntry query with a job listener and print each
  * job's wall time + call site — `runMain graft.tools.ProfileQuery
  * <queryName> [sfDir]`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
            .take(140).replace('\n', ' ')))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e3 / 1e3}%8.1f ms  $site")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warmup then timed
    fn(spark, sfDir).count(); spark.catalog.clearCache()
    println("=== timed run ===")
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
