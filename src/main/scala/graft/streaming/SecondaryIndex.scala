package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global secondary index over the replica store — the DynamoDB-GSI /
  * HBase-secondary-index / Phoenix-index analog the reference's
  * downstream consumers build by hand (a second Delta table keyed by
  * the queried column; reference README.md:61-67 is the primary-path
  * half of that deployment).
  *
  * The index is ITSELF a replica: rows `(idxCol, primary key…)`,
  * hash-routed by `bucketCols = [idxCol]` alone, so every entry for
  * one indexed value lives in ONE bucket and an equality lookup prunes
  * to it exactly ([[CdcStream.readReplicaForKeys]] derives routing
  * from the manifest's recorded bucketCols). The full key keeps the
  * primary key columns, so entries merge/delete per (value, key) pair
  * through the SAME versioned MERGE as any replica — crash-safety,
  * time travel, compaction, erasure all inherit.
  *
  * Maintenance is DELTA-SIZED, never a primary scan: each batch's
  * per-key net is joined against the primary's CURRENT state for
  * exactly the touched keys (the key-pruned read — O(batch keys))
  * to learn each key's OLD indexed value; the index batch is then
  *   - a DELETE of `(old value, key)` wherever the key's indexed value
  *     moved or the key died (without it the index would accrete stale
  *     pointers — the classic hand-rolled-GSI bug), and
  *   - an UPSERT of `(new value, key)` for every surviving key.
  * Both apply as one merge on the index replica. The index and
  * primary commit as two separate versioned commits, INDEX FIRST —
  * the recoverable order: a crash between them leaves the index ahead
  * by at most one batch, and the replay (which recomputes the same
  * delete/upsert sets from the still-unmerged primary) converges it.
  * A lookup verifies hits against the primary — the standard
  * global-index read-repair contract — which also filters the crash
  * window's forward entries.
  *
  * Scale shape: maintenance cost is O(net keys) reads + a delta-sized
  * index merge; a value lookup is one index bucket read + a key-pruned
  * primary read — never O(table) on either side.
  */
object SecondaryIndex {

  /** Apply one CDC micro-batch to the primary replica AND keep the
    * value index synchronized. `idxExpr` derives the indexed value
    * from a row's stored columns (must be deterministic); `idxName`
    * is the index key column; `orderColNames` must name stored batch
    * columns (they order the index merge exactly like the primary's).
    */
  /** @param deferIndexMerge apply the index's own merge as a
    *   MERGE-ON-READ deferred commit (`CdcStream.applyBatchToReplica
    *   (deferMerge)`): the index batch is delta-sized by construction,
    *   so appending it as per-bucket delta files — one write job, no
    *   index-bucket rewrite — is the natural shape; lookups fold the
    *   deltas, and index compaction runs at whatever cadence the store
    *   owner picks. `deferPrimaryMerge` defers the primary's merge the
    *   same way — safe because the old-value read resolves against the
    *   pre-commit FOLD (key-pruned reads fold pending deltas), so
    *   stale-pointer detection sees exactly the state an eager merge
    *   would have stored.
    */
  /** One secondary index's definition for the multi-index apply:
    * where it lives, the indexed expression over batch/primary
    * columns, its stored column name, optional covering projection,
    * and whether its merges defer.
    */
  final case class IndexSpec(
      dir: String,
      expr: Column,
      name: String,
      includeCols: Seq[String] = Nil,
      defer: Boolean = false)

  def applyBatchWithIndex(
      spark: SparkSession,
      primaryDir: String,
      indexDir: String,
      batch: DataFrame,
      idCols: Seq[String],
      orderColNames: Seq[String],
      idxExpr: Column,
      idxName: String,
      opCol: String = "op",
      deferIndexMerge: Boolean = false,
      numBuckets: Int = CdcStream.DefaultReplicaBuckets,
      watermark: Option[Long] = None,
      recordChanges: Boolean = false,
      deferPrimaryMerge: Boolean = false,
      includeCols: Seq[String] = Nil): Unit =
    applyBatchWithIndexes(spark, primaryDir,
      Seq(IndexSpec(indexDir, idxExpr, idxName, includeCols,
        deferIndexMerge)),
      batch, idCols, orderColNames, opCol, numBuckets, watermark,
      recordChanges, deferPrimaryMerge)

  /** N-index maintenance — the real deployment shape (a store rarely
    * stops at one GSI). ONE key-pruned old-value read serves every
    * index (the touched keys' current rows are materialized once, each
    * index derives its old value from them), and ALL index commits
    * land before the primary's: a crash anywhere in the sequence
    * leaves some prefix of the indexes ahead by one batch, and the
    * replay — whose old-value read still sees the unmerged primary —
    * recomputes identical delete/upsert sets for every index, so
    * already-committed indexes re-apply idempotent content and the
    * rest catch up. (Primary-first would be unrecoverable for every
    * index at once; see the ordering note below.)
    */
  def applyBatchWithIndexes(
      spark: SparkSession,
      primaryDir: String,
      specs: Seq[IndexSpec],
      batch: DataFrame,
      idCols: Seq[String],
      orderColNames: Seq[String],
      opCol: String = "op",
      numBuckets: Int = CdcStream.DefaultReplicaBuckets,
      watermark: Option[Long] = None,
      recordChanges: Boolean = false,
      deferPrimaryMerge: Boolean = false): Unit = {
    require(specs.nonEmpty, "applyBatchWithIndexes: at least one index")
    require(specs.map(_.dir).distinct.size == specs.size,
      "applyBatchWithIndexes: index dirs must be distinct")
    val orderCols = orderColNames.map(col)
    // materialize the per-key net ONCE: the old-value read, the primary
    // merge, and every index batch derive from it — each would
    // otherwise recompute the whole batch window per action
    val (net, dropNet) = graft.llm.IndexArtifacts.materializeOwned(spark,
      CdcStream.lastOpPerKey(batch, idCols, orderCols), "gsi-net")
    // OLD rows for exactly the touched keys (key-pruned read, O(batch
    // keys)) — read BEFORE the primary merge overwrites them, and
    // materialized once so N indexes don't re-run the pruned read
    val oldMat: Option[(DataFrame, () => Unit)] =
      CdcStream.readReplicaForKeys(spark, primaryDir, idCols,
          net.select(idCols.map(col): _*).distinct())
        .map { o =>
          if (specs.size > 1)
            graft.llm.IndexArtifacts.materializeOwned(spark, o, "gsi-old")
          else (o, () => ())
        }
    try {
      specs.foreach { sp =>
        val oldIdx = oldMat.map { case (o, _) =>
          o.select(idCols.map(col) :+ sp.expr.as("__old_idx"): _*)
        }
        // INDEXES COMMIT FIRST. A crash between any two commits then
        // leaves a prefix of indexes AHEAD by one batch — the replay
        // recomputes the SAME dels/ups from the still-unmerged primary
        // and each index re-apply converges (idempotent content).
        // Committing the primary first would be the unrecoverable
        // order: the replay's old-value read would run against the
        // already-merged primary, see old == new, compute an EMPTY
        // stale-delete set, and the pre-batch (old value, key) entries
        // would accrete forever — read-repair hides them from
        // [[lookupByIndex]], but [[lookupCovered]] would serve them.
        // Forward entries in the crash window are the benign
        // direction: the verified lookup drops them (no primary row to
        // confirm against) and the replay erases the window.
        CdcStream.applyBatchToReplica(sp.dir,
          indexDelta(net, oldIdx, sp, idCols, orderColNames, opCol),
          idCols = sp.name +: idCols, orderCols = orderCols, opCol = opCol,
          bucketCols = Some(Seq(sp.name)), deferMerge = sp.defer)
      }
      // the net IS the batch's last-op-per-key — merging it is
      // equivalent to merging the batch (and its inner net pass is a
      // window over delta-sized rows). The primary may defer too: the
      // old-value read above already resolved against the pre-commit
      // fold, and the NEXT batch's old-value read folds this commit's
      // delta like any reader.
      CdcStream.applyBatchToReplica(primaryDir, net, idCols, orderCols, opCol,
        numBuckets = numBuckets, watermark = watermark,
        recordChanges = recordChanges, deferMerge = deferPrimaryMerge)
    } finally {
      oldMat.foreach(_._2())
      dropNet()
    }
  }

  /** One index's delete/upsert batch for a per-key net: a DELETE of
    * `(old value, key)` wherever the key's indexed value moved or the
    * key died (stale-pointer removal), an UPSERT of `(new value, key)`
    * for every surviving key. `oldIdx` carries the touched keys' OLD
    * indexed values (absent = nothing stored, e.g. a fresh store).
    * includeCols makes the index COVERING (the DynamoDB projected-
    * attributes shape): the listed batch columns are stored in the
    * index entry, so [[lookupCovered]] answers from the index alone.
    */
  private def indexDelta(net: DataFrame, oldIdx: Option[DataFrame],
      sp: IndexSpec, idCols: Seq[String], orderColNames: Seq[String],
      opCol: String): DataFrame = {
    val n = net.withColumn("__new_idx",
      when(col(opCol) =!= "delete", sp.expr))
    val j = oldIdx match {
      case Some(o) => n.join(o, idCols, "left")
      case None => n.withColumn("__old_idx", lit(null).cast(
        n.select(sp.expr).schema.head.dataType))
    }
    val carry = (idCols ++ orderColNames ++ sp.includeCols).distinct
    val dels = j.filter(col("__old_idx").isNotNull &&
        (col("__new_idx").isNull || col("__new_idx") =!= col("__old_idx")))
      .select((col("__old_idx").as(sp.name) +: carry.map(col)) :+
        lit("delete").as(opCol): _*)
    val ups = j.filter(col("__new_idx").isNotNull)
      .select((col("__new_idx").as(sp.name) +: carry.map(col)) :+
        lit("update").as(opCol): _*)
    dels.unionByName(ups)
  }

  /** FEED-DRIVEN index maintenance: catch index(es) up by replaying
    * ONE committed feed version of the primary through the incremental
    * delete/upsert derivation — at DELTA cost, never a primary scan.
    * The sanctioned cheap recovery after [[CdcStream.restoreReplica]]
    * on an indexed primary: a restore's feed entry IS a delta batch
    * (the divergence-sized rollback diff), so replaying it converges
    * the existing index to the rolled-back state for the price of the
    * diff — where [[buildIndex]] pays a full primary scan.
    *
    * The OLD indexed values resolve against the primary AT
    * `version - 1` (the key-pruned time-travel read): the state the
    * feed version's net was applied over. Works for any recorded
    * version whose predecessor is still readable — i.e. an index
    * follower may lag and replay versions in order. Refuses when the
    * version recorded no changes or the predecessor was GC'd (rebuild
    * via [[buildIndex]] instead).
    */
  def maintainIndexesFromFeed(
      spark: SparkSession,
      primaryDir: String,
      specs: Seq[IndexSpec],
      version: Long,
      idCols: Seq[String],
      orderColNames: Seq[String],
      opCol: String = "op"): Unit = {
    require(specs.nonEmpty, "maintainIndexesFromFeed: at least one index")
    // BOTH refusal checks are pure metadata — run them before any
    // Spark job or materialization is paid for a call that rejects
    if (!new java.io.File(primaryDir, f"v$version%09d/changes").isDirectory)
      throw new IllegalStateException(
        s"maintainIndexesFromFeed: version $version of $primaryDir " +
          "recorded no changes — rebuild via buildIndex instead")
    // predecessor dir gone = the old values are unknowable — refuse
    // rather than accrete stale pointers forever
    if (version > 1 &&
        !CdcStream.replicaVersions(primaryDir).contains(version - 1))
      throw new IllegalStateException(
        s"maintainIndexesFromFeed: version ${version - 1} of " +
          s"$primaryDir was GC'd — the old indexed values are " +
          "unknowable; rebuild via buildIndex")
    val feed = CdcStream.readReplicaChanges(spark, primaryDir,
        version - 1, Some(version)).getOrElse(
      throw new IllegalStateException(
        s"maintainIndexesFromFeed: version $version of $primaryDir " +
          "recorded no changes — rebuild via buildIndex instead"))
    val orderCols = orderColNames.map(col)
    val (net, dropNet) = graft.llm.IndexArtifacts.materializeOwned(spark,
      feed.drop("_commit_version", "_commit_watermark"), "gsi-feed-net")
    try {
      val keys = net.select(idCols.map(col): _*).distinct()
      val oldMat: Option[(DataFrame, () => Unit)] =
        CdcStream.readReplicaForKeysAt(spark, primaryDir, version - 1,
            idCols, keys)
          .map { o =>
            if (specs.size > 1)
              graft.llm.IndexArtifacts.materializeOwned(spark, o, "gsi-feed-old")
            else (o, () => ())
          }
      try specs.foreach { sp =>
        val oldIdx = oldMat.map { case (o, _) =>
          o.select(idCols.map(col) :+ sp.expr.as("__old_idx"): _*)
        }
        CdcStream.applyBatchToReplica(sp.dir,
          indexDelta(net, oldIdx, sp, idCols, orderColNames, opCol),
          idCols = sp.name +: idCols, orderCols = orderCols, opCol = opCol,
          bucketCols = Some(Seq(sp.name)), deferMerge = sp.defer)
      } finally oldMat.foreach(_._2())
    } finally dropNet()
  }

  /** BOOTSTRAP an index over an EXISTING primary — CREATE INDEX. One
    * pass over the primary's CURRENT state (fold included: pending
    * merge-on-read deltas resolve like any read) writes every live
    * key's entry into a FRESH index store with exactly the incremental
    * maintenance's entry shape — same key columns (`name +: idCols`),
    * same value-only bucket routing, same covering projection — so
    * [[applyBatchWithIndexes]] composes from the next batch on and
    * every lookup path works unchanged.
    *
    * Also the sanctioned recovery after [[CdcStream.restoreReplica]]
    * on an indexed primary: a restore rolls the primary back
    * metadata-only, leaving any index stale by design — rebuild into a
    * fresh dir and swap it in.
    *
    * Cost is one primary scan + one value-routed write — O(store),
    * inherent to index creation, with no driver materialization.
    * Refuses a dir that already holds a store: an in-place rebuild
    * racing readers has no safe ordering; build fresh and swap.
    *
    * QUIESCENCE is VERIFIED, not assumed: the primary's version is
    * pinned before the snapshot read and re-checked after the index
    * commit. A batch applied to the primary between the snapshot and
    * the first post-bootstrap [[applyBatchWithIndexes]] would be
    * PERMANENTLY missing from the index (neither the bootstrap nor
    * later incremental maintenance would ever emit its entries), so a
    * moved version throws — delete the fresh dir and rebuild, or
    * fence the primary ([[CdcStream.freezeReplica]]) for the build's
    * duration. Returns the pinned primary version: incremental
    * maintenance must resume from exactly that version's state.
    */
  def buildIndex(
      spark: SparkSession,
      primaryDir: String,
      spec: IndexSpec,
      idCols: Seq[String],
      orderColNames: Seq[String],
      opCol: String = "op",
      numBuckets: Int = CdcStream.DefaultReplicaBuckets): Long = {
    require(CdcStream.replicaVersions(spec.dir).isEmpty,
      s"buildIndex: ${spec.dir} already holds a store — rebuild into a " +
        "fresh dir and swap (an in-place rebuild racing readers has no " +
        "safe ordering)")
    // pin the POINTER's version, not the max version dir: a crashed
    // writer's unpublished orphan can sit above CURRENT and is not
    // state — pinning it would skew both the quiescence check and the
    // resume-from version
    val pinned = CdcStream.replicaCurrentVersion(primaryDir)
      .getOrElse(throw new IllegalStateException(
        s"buildIndex: primary $primaryDir has no committed version"))
    val state = CdcStream.readReplica(spark, primaryDir).getOrElse(
      throw new IllegalStateException(
        s"buildIndex: primary $primaryDir has no committed version"))
    val carry = (idCols ++ orderColNames ++ spec.includeCols).distinct
    val entries = state
      .select((spec.expr.as(spec.name) +: carry.map(col)) :+
        lit("update").as(opCol): _*)
      .filter(col(spec.name).isNotNull)
    // eager merge for the bootstrap: one base write per bucket beats a
    // delta the first read would immediately fold
    CdcStream.applyBatchToReplica(spec.dir, entries,
      idCols = spec.name +: idCols, orderCols = orderColNames.map(col),
      opCol = opCol, numBuckets = numBuckets,
      bucketCols = Some(Seq(spec.name)))
    val after = CdcStream.replicaCurrentVersion(primaryDir)
    if (!after.contains(pinned)) throw new IllegalStateException(
      s"buildIndex: primary $primaryDir advanced from v$pinned to " +
        s"v${after.getOrElse(-1L)} during the bootstrap — the batch(es) " +
        "committed mid-build are missing from the index; delete " +
        s"${spec.dir} and rebuild (or freeze the primary for the build)")
    pinned
  }

  /** Equality lookup THROUGH the index: `values` carries one column
    * named `idxName`; the index read prunes to the values' buckets,
    * the hit keys drive a key-pruned primary read, and the result is
    * verified against the primary's CURRENT indexed value (read
    * repair: the index-ahead crash window's forward entries have no
    * primary row to confirm against and drop). The window's other
    * face is a transient UNDER-return — a moved key's old-value entry
    * is already deleted while the primary still holds the old row —
    * closed by the batch replay; only the batch in flight at the
    * crash is affected. Cost: O(hit buckets + hit keys), never
    * O(table).
    */
  def lookupByIndex(
      spark: SparkSession,
      primaryDir: String,
      indexDir: String,
      idCols: Seq[String],
      idxExpr: Column,
      idxName: String,
      values: DataFrame): DataFrame = {
    val entries = CdcStream.readReplicaForKeys(spark, indexDir,
      Seq(idxName), values)
    entries match {
      case Some(e) =>
        val keys = e.select(idCols.map(col): _*).distinct()
        CdcStream.readReplicaForKeys(spark, primaryDir, idCols, keys) match {
          case Some(rows) =>
            rows.withColumn(idxName, idxExpr)
              .join(broadcast(values.select(col(idxName))), Seq(idxName),
                "left_semi")
          case None => emptyLike(spark, e, idCols, idxName)
        }
      case None =>
        CdcStream.readReplica(spark, primaryDir) match {
          case Some(rows) => rows.withColumn(idxName, idxExpr).limit(0)
          case None => values.limit(0)
        }
    }
  }

  private def emptyLike(spark: SparkSession, e: DataFrame,
      idCols: Seq[String], idxName: String): DataFrame =
    e.select((idxName +: idCols).map(col): _*).limit(0)

  /** COVERED equality lookup: answer entirely from the index — one
    * bucket read, the primary untouched (the DynamoDB projected-
    * attributes read). Valid when the index was maintained with
    * `includeCols` carrying every column the caller needs. Trade
    * against [[lookupByIndex]]: no read-repair — under the
    * synchronized-maintenance contract (sink marker after both
    * commits; index commits first; replays converge) the index is
    * exact, but a reader racing the crash window between the two
    * commits can observe one batch of FORWARD entries (rows the
    * primary has not committed yet) that the verified lookup would
    * have dropped. Nothing is ever permanently stale: the replay
    * closes the window.
    */
  def lookupCovered(
      spark: SparkSession,
      indexDir: String,
      idxName: String,
      values: DataFrame): DataFrame =
    CdcStream.readReplicaForKeys(spark, indexDir, Seq(idxName), values)
      .getOrElse(values.limit(0))
}
