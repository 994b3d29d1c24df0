package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  *   runMain graft.tools.PlanDump <q1,q2,...> <outDir> <suffix> [sfDir]
  *
  * Writes `<outDir>/<name>_<suffix>.txt` per query. The session mirrors
  * the bench's configuration (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so the dumped plan is the shape
  * the bench actually times. Queries whose definition runs side effects
  * (streaming gates, store mutations) dump the plan of the final
  * read-back DataFrame they return — the timed action's plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // extra session confs for WHAT-IF dumps (e.g. the production
    // big⋈big shape via spark.sql.autoBroadcastJoinThreshold=-1):
    // semicolon-separated k=v pairs, applied last so they win
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(p, plan)
      println(s"[plandump] wrote $p (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
