package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Exactly-once and merge-equivalence behavior of the streaming
  * Count-Min sketch ([[SketchStream]]).
  */
class SketchStreamSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("cms-stream").toString

  private def terms = graft.Tables(spark, sfDir).documents
    .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))

  private def sketchRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"r", $"bucket", $"c").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("two streamed batches merge to the one-shot sketch; replay is a no-op") {
    val dir = freshDir()
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 2 === 0), 0L)
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 2 === 1), 1L)
    val streamed = sketchRows(SketchStream.readSketch(spark, dir))
    // CMS mergeability: cell-wise sum over batches == one-shot build
    val oneShot = sketchRows(SketchStream.sketchOf(terms))
    assert(streamed == oneShot)
    // replaying batch 0 (marker present) changes nothing
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 2 === 0), 0L)
    assert(sketchRows(SketchStream.readSketch(spark, dir)) == oneShot)
  }

  test("a crashed half-written batch is excluded, then rewritten cleanly") {
    val dir = freshDir()
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 2 === 0), 0L)
    // simulate a crash: batch 1 files exist but the marker never landed
    SketchStream.sketchOf(terms.filter($"doc_id" % 2 === 1))
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    val partial = sketchRows(SketchStream.readSketch(spark, dir))
    assert(partial == sketchRows(
      SketchStream.sketchOf(terms.filter($"doc_id" % 2 === 0))))
    // the replayed batch overwrites its own partition and publishes
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 2 === 1), 1L)
    assert(sketchRows(SketchStream.readSketch(spark, dir)) ==
      sketchRows(SketchStream.sketchOf(terms)))
  }

  test("estimates from the streamed sketch equal the batch operator's") {
    val dir = freshDir()
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 3 === 0), 0L)
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 3 === 1), 1L)
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 3 === 2), 2L)
    val batch = graft.llm.SketchQueries.defs("llm_heavy_hitters")(spark, sfDir)
      .select($"term", $"cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = SketchStream.estimate(spark, dir,
        terms.select($"term").distinct().filter($"term".isin(
          batch.keys.toSeq: _*)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == batch)
  }
}
