package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.llm.TextOps
import graft.streaming.SketchStream

/** Standalone streaming smoke driver: a REAL Structured Streaming
  * query (`readStream` over the documents parquet → `foreachBatch`)
  * maintaining the streaming top-k state, then the merged top-k read
  * back. Exists so streaming-path changes can be verified end-to-end
  * without re-running the whole test suite:
  *
  *   sbt -batch "runMain graft.tools.StreamSmoke [sfDir]"
  *
  * Prints one line per top-k row and a final `rows=N` — N == 0 or a
  * thrown error is a failure.
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("stream-smoke")
    val dir = work.resolve("topk").toString
    // the file stream source wants a DIRECTORY; stage the fixture file
    // into one (link, not copy — the fixture stays read-only)
    val in = java.nio.file.Files.createDirectory(work.resolve("in"))
    java.nio.file.Files.createSymbolicLink(in.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val docs = spark.readStream
      .schema(Tables(spark, sfDir).documents.schema)
      .parquet(in.toString)
    val q = docs.select(explode(TextOps.tokens(col("text"))).as("term"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        SketchStream.maintainTopK(dir, b, id)
      }
      .option("checkpointLocation", work.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = SketchStream.readTopK(spark, dir, 10).collect()
    rows.foreach(r => println(s"${r.getString(0)}\t${r.getLong(1)}"))
    println(s"rows=${rows.length}")
    spark.stop()
  }
}
