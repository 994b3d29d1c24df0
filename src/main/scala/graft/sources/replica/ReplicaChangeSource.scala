package graft.sources.replica

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.streaming.CdcStream

/** `readStream.format("graft-replica").option("readChangeFeed","true")`
  * — the CDC-OUT half of the replica store: a streaming CHANGE FEED of
  * the per-key nets each committed version applied (op included,
  * `_commit_version` / `_commit_watermark` stamped), so a downstream
  * consumer follows the replica the way the replica follows the source.
  *
  * Offsets are replica VERSION numbers — checkpointable, dense, and
  * O(1) to compare. `getOffset` is a directory listing (no data read);
  * `getBatch(from, to)` serves exactly versions `(from, to]` through
  * [[CdcStream.readReplicaChanges]], which THROWS on a GC'd gap rather
  * than silently skipping commits. `startingVersion` replays history
  * from a given version (default: everything still on disk).
  *
  * Scale: each micro-batch is delta-sized (the committed nets, never
  * the replica), and planning cost is O(versions in range) directory
  * metadata.
  */
class ReplicaChangeSource(
    sqlContext: SQLContext,
    path: String,
    startingVersion: Long) extends Source {

  private def spark = sqlContext.sparkSession

  override val schema: StructType = ReplicaChangeSource.changeSchema(
    sqlContext, path)

  override def getOffset: Option[Offset] = {
    val vs = CdcStream.replicaVersions(path)
    if (vs.isEmpty || vs.max <= startingVersion) None
    else Some(LongOffset(vs.max))
  }

  private def ver(o: Offset): Long = o.json().toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val df = CdcStream.readReplicaChanges(spark, path, from, Some(ver(end)))
      .map(align).getOrElse(emptyChanges)
    GraftColumnBridge.asStreamingDataFrame(df)
  }

  /** Project a versions-range read onto the feed's declared schema:
    * fixed column order, evolution gaps null-filled.
    */
  private def align(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  private def emptyChanges: DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      schema)

  override def stop(): Unit = ()
}

object ReplicaChangeSource {
  /** The feed's schema at query start: the union schema of the changes
    * already on disk. A feed can only be subscribed to once the replica
    * has at least one change-recording commit — before that there is
    * nothing to infer from (same contract as file sources over an empty
    * dir without a user schema).
    */
  def changeSchema(sqlContext: SQLContext, path: String): StructType =
    // strict=false: schema inference only inspects the changes already
    // on disk — it replays nothing, so an erasure in history is not a
    // divergence hazard here (getBatch stays strict)
    CdcStream.readReplicaChanges(sqlContext.sparkSession, path,
        strict = false)
      .map(_.schema)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-replica change feed: no recorded changes at $path — the " +
          "writer must merge with changeFeed/recordChanges enabled before " +
          "a feed can be subscribed"))
}
