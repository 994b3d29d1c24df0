package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: only run queries whose name starts with the
    // given prefix, OR — when the arg contains commas — exactly the
    // named queries (local iteration + the sf0.1 sample harness; the
    // driver passes 2 args).
    val (sfDir, outDir, prefix) = args match {
      case Array(sf, out)    => (sf, out, "")
      case Array(sf, out, p) => (sf, out, p)
    }
    val wanted: String => Boolean =
      if (prefix.contains(",")) {
        val names = prefix.split(",").map(_.trim).filter(_.nonEmpty).toSet
        names.contains _
      } else _.startsWith(prefix)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query cache hygiene: persisted index tables (LSH bands,
      // IVF assignments) must not accumulate across the session
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the COMPLETE suite name set (not just oracle-keyed queries), so
    // record-merging tools can prune stale entries against the real
    // suite instead of the oracle map — a rows-only query (no oracle
    // SQL) must survive a later subset run's merge
    val allNames = SparkEntry.queries.keys.toSeq.sorted
      .map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/suite_queries.json"), allNames)
    spark.stop()
  }
}
