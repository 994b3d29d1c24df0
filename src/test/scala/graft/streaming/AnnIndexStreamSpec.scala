package graft.streaming

import graft.{SparkSuite, Tables}
import graft.llm.SimilarityQueries
import org.apache.spark.sql.functions._

/** Streaming IVF index maintenance: the streamed, cell-partitioned
  * index must be bit-identical to a batch build, replay must be a
  * no-op, and the probe read path must prune to the probed cells.
  */
class AnnIndexStreamSpec extends SparkSuite {

  private def centroids =
    SimilarityQueries.sampleCentroids(spark, sfDir,
      SimilarityQueries.NumCentroids)

  private def embs = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding"))

  test("two streamed batches equal one batch build; replay is a no-op") {
    val dir = graft.llm.IndexArtifacts.tempDir("ann-index")
    val cents = centroids
    val b0 = embs.filter(col("vec_id") % 2 === 0)
    val b1 = embs.filter(col("vec_id") % 2 === 1)
    AnnIndexStream.maintainIvfIndex(dir, b0, 0L, cents)
    AnnIndexStream.maintainIvfIndex(dir, b1, 1L, cents)
    val streamed = AnnIndexStream.readIndex(spark, dir)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val batchBuilt = AnnIndexStream.assignCells(embs, cents)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(streamed == batchBuilt)
    // replaying an applied batch changes nothing
    AnnIndexStream.maintainIvfIndex(dir, b0, 0L, cents)
    assert(AnnIndexStream.readIndex(spark, dir).count() == streamed.size)
  }

  test("a crashed half-written batch is rewritten, not double-counted") {
    val dir = graft.llm.IndexArtifacts.tempDir("ann-crash")
    val cents = centroids
    AnnIndexStream.maintainIvfIndex(dir, embs.filter(col("vec_id") % 2 === 0), 0L, cents)
    // simulate a crash: batch dir exists with data but NO _complete marker
    val partial = new java.io.File(s"$dir/batch=1")
    AnnIndexStream.assignCells(embs.filter(col("vec_id") % 2 === 1), cents)
      .limit(3).write.mode("overwrite").partitionBy("cell")
      .parquet(partial.getPath)
    // readIndex must not serve the incomplete batch
    val before = AnnIndexStream.readIndex(spark, dir).count()
    assert(before == embs.filter(col("vec_id") % 2 === 0).count())
    // the replayed batch overwrites the partial files and publishes
    AnnIndexStream.maintainIvfIndex(dir, embs.filter(col("vec_id") % 2 === 1), 1L, cents)
    assert(AnnIndexStream.readIndex(spark, dir).count() == embs.count())
  }

  test("probe equals the batch IVF operator and prunes to probed cells") {
    val dir = graft.llm.IndexArtifacts.tempDir("ann-probe")
    val cents = centroids
    AnnIndexStream.maintainIvfIndex(dir, embs, 0L, cents)
    val probed = AnnIndexStream.probe(spark, dir,
      embs.filter(col("vec_id") < SimilarityQueries.NumQueries),
      cents, nprobe = 1, topK = SimilarityQueries.IvfTopK)
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3),
        math.rint(r.getDouble(4) * 1e12))).toSet
    val expected = SimilarityQueries.defs("llm_embed_ivf")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"),
        math.rint(r.getAs[Double]("cos_sim") * 1e12))).toSet
    assert(got == expected)
    // the serving scan is partition-pruned to the probed cells
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell"))
    assert(scanLine.isDefined, plan.take(2000))
  }

  test("compaction folds batch dirs; probes identical; cell pruning kept") {
    val dir = graft.llm.IndexArtifacts.tempDir("ann-compact")
    val cents = centroids
    (0L to 3L).foreach { b =>
      AnnIndexStream.maintainIvfIndex(dir,
        embs.filter(col("vec_id") % 4 === b), b, cents)
    }
    def probeRows() = AnnIndexStream.probe(spark, dir,
      embs.filter(col("vec_id") < SimilarityQueries.NumQueries),
      cents, nprobe = 1, topK = SimilarityQueries.IvfTopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSeq
    val before = probeRows()
    AnnIndexStream.compactIndex(spark, dir, maxDirs = 2)
    assert(BatchDirState.liveBatchIds(dir).length === 1)
    assert(probeRows() === before)
    // the folded dir keeps the cell=... partition layout (probe pruning)
    val foldId = BatchDirState.liveBatchIds(dir).head
    val cellDirs = Option(
      new java.io.File(s"$dir/batch=$foldId").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("cell="))
    assert(cellDirs > 0)
    // a later micro-batch (fresh id) still applies exactly once
    AnnIndexStream.maintainIvfIndex(dir, embs.limit(0), 4L, cents)
    assert(AnnIndexStream.readIndex(spark, dir).count() === embs.count())
  }
}
