package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.SimilarityQueries

/** Streaming IVF index maintenance — the similarity-search twin of the
  * CDC replica store: micro-batches of `(vec_id, embedding)` append to
  * a cell-partitioned parquet index, and queries probe only their
  * nearest cells' partitions.
  *
  * Layout: `indexDir/batch=<id>/cell=<k>/part-*.parquet`, with a
  * `_complete` marker written LAST per batch — a replayed or crashed
  * batch either skips (marker present) or rewrites its own partition
  * (mode overwrite), so the index is exactly-once under micro-batch
  * replay, the same contract as the CDC replica.
  *
  * Scale shape: assignment is a zero-shuffle projection against
  * broadcast centroid literals (the k·dim doubles live on the driver,
  * exactly like k-means state between iterations); each batch writes
  * only its own rows; serving reads prune STATICALLY to the probed
  * cells (the bounded query set × nprobe cell ids become an `isin`
  * partition filter), so a top-k probe reads |probed cells| / 2^p of
  * the index regardless of corpus size.
  */
object AnnIndexStream {

  /** Nearest-centroid cell per vector — the same `e·c − ||c||²/2`
    * argmax (lowest-index tie-break) as the batch IVF operator, so a
    * streamed index is bit-identical to a batch-built one.
    */
  def assignCells(batch: DataFrame,
      centroids: Seq[Array[Float]]): DataFrame = {
    val k = centroids.size
    val scored = batch.select(
      (col("vec_id") +: col("embedding") +:
        centroids.zipWithIndex.map { case (c, i) =>
          SimilarityQueries.centroidScore(c).as(s"cs$i")
        }): _*)
    scored.select(col("vec_id"), col("embedding"),
      SimilarityQueries.cellFromScores(k).as("cell"))
  }

  /** Apply one micro-batch to the index. Idempotent per batchId. */
  def maintainIvfIndex(indexDir: String, batch: DataFrame, batchId: Long,
      centroids: Seq[Array[Float]]): Unit = {
    new java.io.File(indexDir).mkdirs()
    val partDir = s"$indexDir/batch=$batchId"
    val marker = java.nio.file.Paths.get(partDir, "_complete")
    if (java.nio.file.Files.exists(marker)) return
    // no marker ⇒ first attempt or crashed mid-write: overwrite the
    // batch's OWN partition only, then publish the marker last
    assignCells(batch, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(partDir)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    ()
  }

  /** Scan of all LIVE batches: `(batch, vec_id, embedding, cell)`.
    * Partition-value filtering keeps crashed half-written batch dirs
    * out without reading them, and batches folded by [[compactIndex]]
    * are excluded by their fold's tombstone.
    */
  def readIndex(s: SparkSession, indexDir: String): DataFrame =
    BatchDirState.readLive(s, indexDir)

  /** Fold accumulated batch dirs into one (cell partitioning kept, so
    * probe-side pruning is unchanged) once more than `maxDirs` exist —
    * the small-file maintenance of a long-lived index stream, under
    * [[BatchDirState]]'s tombstone protocol (crash at any point
    * neither loses nor double-serves a vector).
    */
  def compactIndex(s: SparkSession, indexDir: String,
      maxDirs: Int = 8): Unit =
    BatchDirState.compact(s, indexDir, maxDirs)(identity) { (df, out) =>
      df.write.partitionBy("cell").parquet(out)
    }

  /** Top-k cosine neighbors for a bounded query set, reading ONLY the
    * probed cells' partitions: per query the `nprobe` best cells rank
    * by the same centroid score, the probed cell ids collect to a
    * bounded `isin` partition filter, and the candidate join is keyed
    * on the cell — the serving-path read of the streamed index.
    */
  def probe(s: SparkSession, indexDir: String, queries: DataFrame,
      centroids: Seq[Array[Float]], nprobe: Int, topK: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val k = centroids.size
    def dot(a: Column, b: Column) = call_function("vector_dot", a, b)
    val ranked = sort_array(array((0 until k).map(i =>
      struct(col(s"cs$i").as("s"), lit(-i).as("ni"))): _*), asc = false)
    val q = queries.select(
        (col("vec_id") +: col("embedding") +:
          centroids.zipWithIndex.map { case (c, i) =>
            SimilarityQueries.centroidScore(c).as(s"cs$i")
          }): _*)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
        explode(transform(slice(ranked, 1, nprobe), x => -x("ni")))
          .as("qcell"))
    // bounded driver-side collect: |queries| × nprobe ints — the cell
    // list IS the static partition filter
    val cells = q.select(col("qcell")).distinct().collect().map(_.getInt(0))
    val idx = readIndex(s, indexDir)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    idx.join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim",
        dot(col("qe"), col("embedding")) / (col("qn") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("cell"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }
}
