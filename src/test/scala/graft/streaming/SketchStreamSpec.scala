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

  test("compaction folds batch tables; sketch stays bit-identical; no double count") {
    val dir = freshDir()
    (0L to 4L).foreach { b =>
      SketchStream.maintainCms(dir, terms.filter($"doc_id" % 5 === b), b)
    }
    val before = sketchRows(SketchStream.readSketch(spark, dir))
    SketchStream.compactCms(spark, dir, maxDirs = 3)
    def batchDirs() = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("batch="))
    assert(BatchDirState.liveBatchIds(dir).length === 1)
    assert(sketchRows(SketchStream.readSketch(spark, dir)) == before)
    // crash window: sources folded (tombstone live) but GC incomplete —
    // re-create a folded source dir; the reader must still exclude it
    SketchStream.sketchOf(terms.filter($"doc_id" % 5 === 0))
      .write.parquet(s"$dir/batch=0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/batch=0", "_complete"),
      Array.emptyByteArray)
    assert(sketchRows(SketchStream.readSketch(spark, dir)) == before)
    // a NEW stream batch (id above all previous) appends normally
    SketchStream.maintainCms(dir, terms.filter($"doc_id" % 5 === 0), 5L)
    assert(batchDirs() >= 2)
    val after = sketchRows(SketchStream.readSketch(spark, dir))
    assert(after != before) // the new batch counted exactly once
    val expect = sketchRows(SketchStream.sketchOf(
      terms.unionAll(terms.filter($"doc_id" % 5 === 0))))
    assert(after == expect)
  }

  test("KMV compaction folds to one bottom-k table, estimates unchanged") {
    val dir = freshDir()
    val st = graft.Tables(spark, sfDir).documents
      .select($"source", explode(TextOps.tokens($"text")).as("term"))
    (0L to 3L).foreach { b =>
      SketchStream.maintainKmv(dir, st.filter(TextOps.hash32($"term") % 4 === b), b)
    }
    val before = SketchStream.estimateDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    SketchStream.compactKmv(spark, dir, maxDirs = 2)
    assert(BatchDirState.liveBatchIds(dir).length === 1)
    assert(SketchStream.estimateDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === before)
  }

  test("streaming top-k: recalls the exact global heavy hitters, never underestimates") {
    val dir = freshDir()
    (0L to 2L).foreach { b =>
      SketchStream.maintainTopK(dir, terms.filter($"doc_id" % 3 === b), b)
    }
    val topk = SketchStream.readTopK(spark, dir, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = terms.groupBy($"term").count()
      .orderBy($"count".desc, $"term").limit(10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // recall: every exact top-10 term surfaces in the streamed top-20
    exact.foreach { case (t, c) =>
      assert(topk.contains(t), s"true heavy hitter '$t' missing from top-k")
      assert(topk(t) >= c, s"'$t': CMS estimate ${topk(t)} < exact $c")
    }
  }

  test("streaming top-k: replaying a batch is a no-op") {
    val dir = freshDir()
    SketchStream.maintainTopK(dir, terms.filter($"doc_id" % 2 === 0), 0L)
    SketchStream.maintainTopK(dir, terms.filter($"doc_id" % 2 === 1), 1L)
    val before = SketchStream.readTopK(spark, dir, 15).collect().toSeq
    SketchStream.maintainTopK(dir, terms.filter($"doc_id" % 2 === 0), 0L)
    assert(SketchStream.readTopK(spark, dir, 15).collect().toSeq == before)
  }

  test("kmv: streamed batches merge to the one-shot sketch; replay no-op") {
    val dir = freshDir()
    val st = graft.Tables(spark, sfDir).documents
      .select($"doc_id", $"source",
        explode(TextOps.tokens($"text")).as("term"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"source", $"h").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    SketchStream.maintainKmv(dir, st.filter($"doc_id" % 2 === 0), 0L)
    SketchStream.maintainKmv(dir, st.filter($"doc_id" % 2 === 1), 1L)
    val streamed = rows(SketchStream.readKmv(spark, dir))
    // KMV mergeability: bottom-k of the sketch union == one-shot build
    assert(streamed == rows(SketchStream.kmvOf(st)))
    // replay of a committed batch changes nothing
    SketchStream.maintainKmv(dir, st.filter($"doc_id" % 2 === 0), 0L)
    assert(rows(SketchStream.readKmv(spark, dir)) == streamed)
    // a crashed half-written batch is excluded, then rewritten cleanly
    SketchStream.kmvOf(st.limit(0))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    assert(rows(SketchStream.readKmv(spark, dir)) == streamed)
    SketchStream.maintainKmv(dir, st.limit(0), 2L)
    assert(rows(SketchStream.readKmv(spark, dir)) == streamed)
  }

  test("kmv: the distinct estimate matches a driver replay of the estimator") {
    val dir = freshDir()
    val st = graft.Tables(spark, sfDir).documents
      .select($"doc_id", $"source",
        explode(TextOps.tokens($"text")).as("term"))
    SketchStream.maintainKmv(dir, st.filter($"doc_id" % 3 === 0), 0L)
    SketchStream.maintainKmv(dir, st.filter($"doc_id" % 3 =!= 0), 1L)
    val K = graft.llm.SketchQueries.KmvK
    val hs = st.select($"source", TextOps.hash32($"term").as("h")).distinct()
      .as[(String, Long)].collect().groupBy(_._1)
    val est = SketchStream.estimateDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.map(_._1).toSet == hs.keySet)
    est.foreach { case (src, nSketch, dEst) =>
      val sorted = hs(src).map(_._2).sorted
      val exact = sorted.length.toLong
      if (exact < K) {
        assert(nSketch == exact && dEst == exact, src)
      } else {
        assert(nSketch == K.toLong, src)
        val hK = sorted(K - 1)
        assert(dEst == (K - 1).toLong * 4294967296L / hK, src)
        // the estimator must be in the right ballpark of the truth
        assert(dEst > exact / 3 && dEst < exact * 3,
          s"$src: est $dEst vs exact $exact")
      }
    }
  }

  test("quantile: streamed batches merge to the one-shot sample; " +
      "estimates match the batch operator; replay and compaction no-ops") {
    val dir = freshDir()
    val rows = graft.Tables(spark, sfDir).documents
      .select($"source", $"doc_id", length($"text").cast("long").as("v"))
    (0L to 2L).foreach { b =>
      SketchStream.maintainQuantile(dir, rows.filter($"doc_id" % 3 === b), b)
    }
    def sample() = SketchStream.readQuantile(spark, dir)
      .select($"source", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val streamed = sample()
    // union-then-truncate law: streamed == one-shot bottom-K
    val oneShot = SketchStream.quantileOf(rows)
      .select($"source", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(streamed == oneShot)
    // decile estimates equal the batch operator's est_v column
    val est = SketchStream.quantileEstimates(spark, dir)
      .select($"source", $"decile", $"est_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val batchEst = graft.SparkEntry.queries("llm_quantile_sketch")(spark, sfDir)
      .select($"source", $"decile", $"est_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(est == batchEst)
    // replay + compaction leave the sample bit-identical
    SketchStream.maintainQuantile(dir, rows.filter($"doc_id" % 3 === 0), 0L)
    assert(sample() == streamed)
    SketchStream.compactQuantile(spark, dir, maxDirs = 2)
    assert(sample() == streamed)
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
