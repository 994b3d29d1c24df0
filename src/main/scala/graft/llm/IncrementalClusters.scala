package graft.llm

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.CdcStream
import TextOps._

/** Incremental near-dup cluster maintenance — the streaming twin of the
  * batch label pipeline ([[DedupQueries]]): a micro-batch of NEW
  * documents updates the cluster labels without recomputing the graph.
  *
  * State under `stateDir` (the LSH index as persisted tables — the
  * continuous-ingestion shape of the batch pipeline's artifacts):
  *
  *  - `shingles/`, `bands/`: APPEND-ONLY parquet — each batch adds only
  *    its own docs' rows;
  *  - `labels/`: the `(doc_id, label)` table, upserted through the
  *    bucket-scoped versioned replica store
  *    ([[CdcStream.applyBatchToReplica]]) — label changes are a MERGE,
  *    so only touched buckets rewrite and the flip is atomic.
  *
  * Per batch: new docs' bands join the persisted band index (plus the
  * batch's own bands) for candidates touching a new doc — pairs wholly
  * inside the old corpus were found by earlier batches, so coverage
  * over the union corpus is complete. Exact-Jaccard verification uses
  * the persisted shingle table. Label propagation then runs ONLY over
  * the affected subgraph: new verified edges plus, for every existing
  * component they touch, its members' star edges `(member, label)` —
  * the representative already encodes old connectivity, so merged
  * components relabel correctly without replaying their original edges.
  * Untouched components are never read, let alone recomputed: per-batch
  * cost scales with the batch's neighborhood, not the corpus.
  */
object IncrementalClusters {

  private def tbl(stateDir: String, name: String): String = s"$stateDir/$name"

  private def readOrEmpty(s: SparkSession, path: String,
      schemaOf: DataFrame): DataFrame =
    if (Files.exists(Paths.get(path))) s.read.parquet(path)
    else schemaOf.limit(0)

  /** Current labels: `(doc_id, label)` for every doc in a near-dup
    * cluster (same contract as the batch pipeline). Empty before the
    * first batch.
    */
  def labels(s: SparkSession, stateDir: String): DataFrame = {
    import s.implicits._
    CdcStream.readReplica(s, tbl(stateDir, "labels"))
      .map(_.select($"doc_id", $"label"))
      .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "label"))
  }

  /** Apply one micro-batch of new documents `(doc_id, text)` —
    * `foreachBatch` body. IDEMPOTENT under micro-batch replay: docs
    * whose ids are already in the shingle index are filtered out before
    * anything is computed or appended, so a batch redelivered after a
    * crash (appends done, checkpoint commit lost) is a no-op rather
    * than a permanent duplication of index rows. (Re-ingesting a
    * CHANGED doc under an existing id is a different operation — the
    * old shingles would have to be retired first.)
    */
  def update(s: SparkSession, stateDir: String, docs: DataFrame): Unit = {
    import s.implicits._
    Seq("shingles", "bands").foreach(recoverSwap(stateDir, _))
    val incoming = docs.select($"doc_id", hashedShingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    val oldShPath = tbl(stateDir, "shingles")
    val deduped =
      if (!Files.exists(Paths.get(oldShPath))) incoming
      else incoming.join(s.read.parquet(oldShPath).select($"doc_id"),
        Seq("doc_id"), "left_anti")
    // per-batch artifacts are deleted before returning: a long-lived
    // stream must not grow temp disk with every trigger; emptiness
    // gates read the written FOOTERS (no extra job)
    val (newSh, nNew, dropSh) =
      IndexArtifacts.materializeCounted(s, deduped, "inc-shingles")
    try {
      if (nNew == 0L) return
      updateWith(s, stateDir, newSh)
    } finally dropSh()
  }

  private def updateWith(s: SparkSession, stateDir: String,
      newSh: DataFrame): Unit = {
    import s.implicits._
    // NOT materialized: bands are a narrow projection of the already-
    // materialized shingle table — both consumers (candidate join,
    // state append) recompute them from that scan for less than a
    // write+read round-trip at any batch size
    val newBands = DedupQueries.minhashBands(newSh)

    val oldSh = readOrEmpty(s, tbl(stateDir, "shingles"), newSh)
    val oldBands = readOrEmpty(s, tbl(stateDir, "bands"), newBands)
    val allBands = oldBands.unionByName(newBands)

    // candidates with at least one NEW endpoint: new × (old ∪ new) band
    // equi-join, normalized to doc_a < doc_b
    val cand = newBands.as("bx").join(allBands.as("by"),
        col("bx.band") === col("by.band") && col("bx.bh") === col("by.bh") &&
          col("bx.doc_id") =!= col("by.doc_id"))
      .select(least(col("bx.doc_id"), col("by.doc_id")).as("doc_a"),
        greatest(col("bx.doc_id"), col("by.doc_id")).as("doc_b"))
      .distinct()
    val allSh = oldSh.unionByName(newSh)
    graft.functions.GraftFunctions.register(s)
    val (pairs, nPairs, dropPairs) = IndexArtifacts.materializeCounted(s, cand
      .join(allSh.select($"doc_id".as("doc_a"), $"sh".as("sa")), "doc_a")
      .join(allSh.select($"doc_id".as("doc_b"), $"sh".as("sb")), "doc_b")
      .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
      .filter(($"nc".cast("double") /
        (size($"sa") + size($"sb") - $"nc").cast("double")) >= 0.3)
      .select($"doc_a", $"doc_b"), "inc-pairs")
    try updateLabelsAndIndex(s, stateDir, newSh, newBands, pairs, nPairs)
    finally dropPairs()
  }

  private def updateLabelsAndIndex(s: SparkSession, stateDir: String,
      newSh: DataFrame, newBands: DataFrame, pairs: DataFrame,
      nPairs: Long): Unit = {
    import s.implicits._
    if (nPairs > 0L) {
      val newEdges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      val newSym = newEdges
        .unionByName(newEdges.select($"dst".as("src"), $"src".as("dst")))
      // FIRST batch (no label store yet): there are no old components
      // to preserve — skip the star-edge machinery and its broadcast
      // jobs entirely
      val adj = if (!Files.exists(Paths.get(tbl(stateDir, "labels")))) newSym
      else {
        val oldLabels = labels(s, stateDir)
        // components the new edges touch: every member contributes a
        // star edge to its representative, so old connectivity is
        // preserved without the original pair edges
        val endpoints = pairs
          .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
        val touched = oldLabels.join(broadcast(endpoints), "doc_id")
          .select($"label").distinct()
        val affected = oldLabels.join(broadcast(touched), "label")
          .select($"doc_id", $"label")
        val star = affected.filter($"doc_id" =!= $"label")
          .select($"doc_id".as("src"), $"label".as("dst"))
        newSym
          .unionByName(star)
          .unionByName(star.select($"dst".as("src"), $"src".as("dst")))
      }
      val (propagated, release) = DedupQueries.propagateMinLabels(adj)
      // MERGE the label changes: only affected docs' buckets rewrite
      CdcStream.applyBatchToReplica(tbl(stateDir, "labels"),
        propagated.select($"doc_id", $"label", lit("update").as("op")),
        idCols = Seq("doc_id"), orderCols = Seq(col("label")))
      release()
    }

    // index appends LAST: a crash before this point replays the batch
    // against the old index (the labels upsert is idempotent), and a
    // replay after a completed append is screened out by the
    // already-indexed-ids filter in update(). BANDS append first: the
    // shingle table is the replay screen, so a crash between the two
    // appends re-runs the batch and at worst duplicates band rows
    // (harmless — candidates are distinct()); the reverse order would
    // silently lose the bands of screened-out docs.
    newBands.write.mode("append").parquet(tbl(stateDir, "bands"))
    newSh.write.mode("append").parquet(tbl(stateDir, "shingles"))
  }

  // --------------------------------------------------- state compaction

  /** Compact the append-only index tables when they have accumulated
    * more than `maxFiles` part files — the small-file maintenance every
    * streaming index needs: a long-lived stream appends one file set
    * per trigger, and at 100 TB an uncompacted index turns every
    * candidate join's scan into a file-listing storm. Content-identical
    * rewrite (consumers treat both tables as sets), sized at ~one
    * partition per 128 MB.
    *
    * Must run from the same single-writer maintenance loop as
    * [[update]] (no concurrent reader exists there). Crash-safe by
    * two-phase swap: the compacted copy lands in `<name>.next` (parquet
    * `_SUCCESS` marks it complete), the live dir moves to
    * `<name>.trash`, the copy moves in, the trash is deleted; a crash
    * at any point is healed by [[recoverSwap]] on the next update or
    * compaction.
    */
  def compactState(s: SparkSession, stateDir: String, maxFiles: Int = 8): Unit = {
    Seq("shingles", "bands").foreach { name =>
      recoverSwap(stateDir, name)
      val dir = new File(tbl(stateDir, name))
      if (dir.exists()) {
        val parts = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        if (parts.length > maxFiles) {
          val bytes = parts.map(_.length()).sum
          val target = math.max(1, (bytes / (128L << 20)).toInt)
          val next = new File(tbl(stateDir, name + ".next"))
          s.read.parquet(dir.toString).coalesce(target)
            .write.mode("overwrite").parquet(next.toString)
          val trash = new File(tbl(stateDir, name + ".trash"))
          Files.move(dir.toPath, trash.toPath)
          Files.move(next.toPath, dir.toPath)
          deleteRec(trash)
        }
      }
    }
  }

  /** Heal an interrupted [[compactState]] swap: a completed `.next`
    * (parquet `_SUCCESS` present) with no live dir moves in; stale
    * `.next`/`.trash` leftovers are deleted (the live dir, when
    * present, is always authoritative).
    */
  private def recoverSwap(stateDir: String, name: String): Unit = {
    val cur = new File(tbl(stateDir, name))
    val next = new File(tbl(stateDir, name + ".next"))
    val trash = new File(tbl(stateDir, name + ".trash"))
    if (!cur.exists() && new File(next, "_SUCCESS").exists())
      Files.move(next.toPath, cur.toPath)
    if (cur.exists() && next.exists()) deleteRec(next)
    if (trash.exists()) deleteRec(trash)
  }

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
    ()
  }
}
