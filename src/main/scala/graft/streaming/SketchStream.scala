package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.SketchQueries

/** Streaming Count-Min sketch maintenance — the frequency-stats twin
  * of the CDC replica / streaming IVF index: each micro-batch of terms
  * folds into its own D×W counter table, and the live sketch is the
  * SUM of all committed batch tables (Count-Min merge = cell-wise add,
  * which is why the sketch streams for free while an exact
  * `groupBy(term)` would need ever-growing state).
  *
  * Layout: `sketchDir/batch=<id>/part-*.parquet` (rows `(r, bucket,
  * c)`), with a `_complete` marker written LAST per batch — a replayed
  * or crashed batch either skips (marker present) or rewrites its own
  * partition, the same exactly-once contract as [[AnnIndexStream]] and
  * the replica store.
  *
  * Scale shape: per batch ONE partial+final aggregate with at most
  * D×W output rows (a constant — 1024 cells here — at any batch
  * size); the merge read is a sum over |batches| constant-size
  * tables; estimation joins the bounded term set against the merged
  * sketch. Nothing grows with the corpus but the number of batch
  * dirs — folding those into one table is a versioned-pointer
  * maintenance job (the replica's compaction protocol), not a naive
  * rewrite-then-delete, which could double-count under a crash.
  */
object SketchStream {

  /** One micro-batch's counter table: `(r, bucket, c)` over a `term`
    * column — the same md5-derived coordinates as the batch operator
    * (`llm_heavy_hitters`), so streamed and batch-built sketches are
    * bit-identical.
    */
  def sketchOf(batch: DataFrame): DataFrame =
    batch.select(explode(SketchQueries.cmsCoords(col("term"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Apply one micro-batch of terms to the sketch. Idempotent per
    * batchId.
    */
  def maintainCms(sketchDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    new java.io.File(sketchDir).mkdirs()
    val partDir = s"$sketchDir/batch=$batchId"
    val marker = java.nio.file.Paths.get(partDir, "_complete")
    if (java.nio.file.Files.exists(marker)) return
    sketchOf(batch).write.mode("overwrite").parquet(partDir)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    ()
  }

  /** The live merged sketch: cell-wise sum over all LIVE batch tables
    * (crashed half-written dirs are excluded by the marker, folded
    * ones by their fold's tombstone).
    */
  def readSketch(s: SparkSession, sketchDir: String): DataFrame =
    BatchDirState.readLive(s, sketchDir)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** Fold accumulated CMS batch tables into one D×W table once more
    * than `maxDirs` exist — CMS merge IS the cell-wise sum, so the fold
    * is the same aggregate the read path applies, persisted once.
    * Tombstone protocol: crash at any point neither loses nor
    * double-counts a cell.
    */
  def compactCms(s: SparkSession, sketchDir: String,
      maxDirs: Int = 8): Unit =
    BatchDirState.compact(s, sketchDir, maxDirs) { df =>
      df.groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))
    } { (df, out) => df.write.parquet(out) }

  /** Point-estimate a bounded term set against the merged sketch:
    * `min` over each term's D counters (the CMS estimator; one-sided
    * error, never an underestimate).
    */
  def estimate(s: SparkSession, sketchDir: String,
      terms: DataFrame): DataFrame =
    terms.select(col("term"),
      explode(SketchQueries.cmsCoords(col("term"))).as("rb"))
      .select(col("term"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(readSketch(s, sketchDir)), Seq("r", "bucket"))
      .groupBy(col("term"))
      .agg(min(col("c")).as("cms_est"))

  // -------------------------------------------------- KMV (bottom-k) twin
  // The distinct-vocabulary sketch next to CMS's frequency sketch:
  // bottom-k minimum hash values per source. KMV merge = bottom-k of
  // the UNION of sketches (proved in SketchSpec), so each micro-batch
  // contributes its own ≤ |sources|·K-row table and the live sketch is
  // a rank window over the committed batches — constant-size state at
  // any corpus size, same `_complete`-marker-last replay contract as
  // the CMS path.

  /** One micro-batch's bottom-k table `(source, h)` over `(source,
    * term)` rows — the same md5-derived hash as the batch operator
    * (`llm_kmv_overlap`), so streamed and batch-built sketches are
    * bit-identical.
    */
  def kmvOf(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h").asc)
    batch.select(col("source"), graft.llm.TextOps.hash32(col("term")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SketchQueries.KmvK)
      .select(col("source"), col("h"))
  }

  /** Apply one micro-batch of `(source, term)` rows to the KMV sketch.
    * Idempotent per batchId.
    */
  def maintainKmv(sketchDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    new java.io.File(sketchDir).mkdirs()
    val partDir = s"$sketchDir/batch=$batchId"
    val marker = java.nio.file.Paths.get(partDir, "_complete")
    if (java.nio.file.Files.exists(marker)) return
    kmvOf(batch).write.mode("overwrite").parquet(partDir)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    ()
  }

  /** Bottom-k per source over a union of batch sketches — both the
    * read-path merge and the compaction fold (KMV mergeability).
    */
  private def kmvMerge(union: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h").asc)
    union.select(col("source"), col("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SketchQueries.KmvK)
      .select(col("source"), col("h"))
  }

  /** The live merged KMV sketch: bottom-k per source over the union of
    * all LIVE batch sketches (KMV mergeability; crashed dirs are
    * excluded by the marker, folded ones by their fold's tombstone).
    */
  def readKmv(s: SparkSession, sketchDir: String): DataFrame =
    kmvMerge(BatchDirState.readLive(s, sketchDir))

  /** Fold accumulated KMV batch sketches into one |sources|·K table —
    * the fold is the same bottom-k merge the read path applies.
    */
  def compactKmv(s: SparkSession, sketchDir: String,
      maxDirs: Int = 8): Unit =
    BatchDirState.compact(s, sketchDir, maxDirs)(kmvMerge) {
      (df, out) => df.write.parquet(out)
    }

  // ---------------------------------------- streaming top-k twin
  // A CMS answers POINT queries; it cannot enumerate the heavy terms.
  // The streaming top-k therefore pairs the CMS with a bounded
  // CANDIDATE set: each micro-batch contributes its batch-local exact
  // top-M terms, and the live top-k is the CMS estimate over the
  // union of all candidates. A term in the true global top-k is
  // locally heavy in at least one batch unless its mass is spread
  // thinner than rank M in every batch — M > k is the guard knob (the
  // SpaceSaving trade made mergeable). State: M rows per batch plus
  // the constant-size CMS — nothing grows with the term universe.

  /** Batch-local candidate budget (M). */
  val TopKCandidatesPerBatch = 64

  /** One micro-batch's candidate table: its exact top-M terms.
    * `orderBy.limit` is TakeOrdered — per-partition top-M then a
    * driver-side merge of M-row heaps, never a global sort.
    */
  def topkCandidatesOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(TopKCandidatesPerBatch)
      .select(col("term"))

  /** Apply one micro-batch of terms to the top-k state (CMS counters +
    * candidate set). Idempotent per batchId: both sub-states carry the
    * marker-last contract, and a replay rewrites its own partitions.
    */
  def maintainTopK(sketchDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    maintainCms(s"$sketchDir/cms", batch, batchId)
    val candDir = s"$sketchDir/cand"
    new java.io.File(candDir).mkdirs()
    val partDir = s"$candDir/batch=$batchId"
    val marker = java.nio.file.Paths.get(partDir, "_complete")
    if (java.nio.file.Files.exists(marker)) return
    topkCandidatesOf(batch).write.mode("overwrite").parquet(partDir)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    ()
  }

  /** The live top-k: CMS-estimate every candidate seen so far, keep
    * the k largest. The candidate union is ≤ M·|batches| rows
    * (deduplicated), the sketch join is a broadcast of a constant-size
    * table, and the final top-k is again TakeOrdered.
    */
  def readTopK(s: SparkSession, sketchDir: String, k: Int): DataFrame = {
    val cands = BatchDirState.readLive(s, s"$sketchDir/cand")
      .select(col("term")).distinct()
    estimate(s, s"$sketchDir/cms", cands)
      .orderBy(col("cms_est").desc, col("term").asc)
      .limit(k)
  }

  /** Fold both top-k sub-states: the CMS counters cell-wise and the
    * candidate union deduplicated.
    */
  def compactTopK(s: SparkSession, sketchDir: String,
      maxDirs: Int = 8): Unit = {
    compactCms(s, s"$sketchDir/cms", maxDirs)
    BatchDirState.compact(s, s"$sketchDir/cand", maxDirs)(
      _.select(col("term")).distinct()) {
      (df, out) => df.write.parquet(out)
    }
  }

  /** Per-source distinct-vocabulary estimate from the merged sketch:
    * the KMV cardinality estimator `(K−1)·2^32 / h_K` once the sketch
    * is full; below K distinct hashes the sketch IS the set and the
    * count is exact. All-integer arithmetic, deterministic.
    */
  def estimateDistinct(s: SparkSession, sketchDir: String): DataFrame =
    readKmv(s, sketchDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("h_k"))
      .select(col("source"), col("n_sketch"),
        when(col("n_sketch") < SketchQueries.KmvK, col("n_sketch"))
          .otherwise(expr(
            s"(${SketchQueries.KmvK} - 1) * 4294967296L div h_k"))
          .as("distinct_est"))

  // ------------------------------- streaming quantile-sketch twin
  // The batch quantile sketch (`llm_quantile_sketch`) keeps each
  // group's bottom-QskK rows by a deterministic row hash — a uniform
  // sample that merges by union-then-truncate, the same law as KMV.
  // So the streaming twin is mechanical: each micro-batch contributes
  // its batch-local bottom-K, the live sample is the bottom-K of the
  // union, and quantile estimates read off the merged sample by exact
  // rank arithmetic. State: |groups|·K rows per batch dir, compacting
  // to |groups|·K total — never value-distribution-sized.

  /** One micro-batch's sample contribution: per group, its bottom-K
    * rows by the md5-derived row hash. `rows` carries
    * (source, doc_id, v).
    */
  def quantileOf(batch: DataFrame): DataFrame = {
    val h = graft.llm.TextOps.hash32(
      concat(lit("qsk:"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h").asc, col("doc_id").asc)
    batch.select(col("source"), col("doc_id"), col("v"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SketchQueries.QskK)
      .select(col("source"), col("doc_id"), col("v"), col("h"))
  }

  /** Marker-last batch append (same replay contract as the CMS/KMV
    * twins: a re-served batch id is a no-op).
    */
  def maintainQuantile(sketchDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    new java.io.File(sketchDir).mkdirs()
    val partDir = s"$sketchDir/batch=$batchId"
    val marker = java.nio.file.Paths.get(partDir, "_complete")
    if (java.nio.file.Files.exists(marker)) return
    quantileOf(batch).write.mode("overwrite").parquet(partDir)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    ()
  }

  /** Union-then-truncate: bottom-K per group over the union of batch
    * samples — the merge law shared by the read path and compaction.
    */
  private def quantileMerge(union: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h").asc, col("doc_id").asc)
    union.select(col("source"), col("doc_id"), col("v"), col("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SketchQueries.QskK)
      .select(col("source"), col("doc_id"), col("v"), col("h"))
  }

  /** The live merged sample. */
  def readQuantile(s: SparkSession, sketchDir: String): DataFrame =
    quantileMerge(BatchDirState.readLive(s, sketchDir))

  /** Fold batch samples into one |groups|·K table. */
  def compactQuantile(s: SparkSession, sketchDir: String,
      maxDirs: Int = 8): Unit =
    BatchDirState.compact(s, sketchDir, maxDirs)(quantileMerge) {
      (df, out) => df.write.parquet(out)
    }

  /** Decile estimates off the merged sample — percentile_disc
    * semantics (value at rank ceil(q·n/10), 1-based), the same exact
    * integer rank arithmetic as the batch operator.
    */
  def quantileEstimates(s: SparkSession, sketchDir: String): DataFrame = {
    val samp = readQuantile(s, sketchDir)
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("v").asc, col("doc_id").asc)
    val ranked = samp.withColumn("rn", row_number().over(wv).cast("long"))
    val pos = samp.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(col("source"),
        explode(sequence(lit(1L), lit(9L))).as("decile"), col("n"))
      .withColumn("pos", expr("(decile * n + 9) div 10"))
      .select(col("source"), col("decile"), col("pos"))
    ranked.join(broadcast(pos), Seq("source"))
      .filter(col("rn") === col("pos"))
      .select(col("source"), col("decile"), col("v").as("est_v"))
  }
}
