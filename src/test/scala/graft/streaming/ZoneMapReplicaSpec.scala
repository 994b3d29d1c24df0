package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Zone-map range reads over the replica store
  * ([[CdcStream.readReplicaRange]]): parquet footer min/max stats drop
  * bucket files that provably miss a range predicate — the
  * non-key-predicate twin of hash-routed key pruning — plus the
  * merge-on-read safety rule (delta-carrying buckets never file-prune)
  * and the `graft-replica` relation's range-filter wiring.
  */
class ZoneMapReplicaSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("zonemap").toString

  test("range read prunes files on a value-clustered store and returns " +
      "exactly the in-range live rows") {
    val dir = freshDir()
    // the secondary-index layout: routed by `band` alone, so each
    // band's rows live in ONE bucket and bucket files carry tight
    // min/max ranges — the store shape zone maps exist for
    val rows = for (band <- 0L until 16L; id <- 0L until 8L)
      yield (band, band * 100 + id, 1L, "update")
    CdcStream.applyBatchToReplica(dir,
      rows.toDF("band", "id", "seq", "op"),
      idCols = Seq("band", "id"), orderCols = Seq(col("seq")),
      numBuckets = 16, bucketCols = Some(Seq("band")))
    val (df, kept, total) =
      CdcStream.readReplicaRange(spark, dir, "band", 3L, 5L).get
    // 16 bands hash onto ≤16 buckets (collisions allowed): one file
    // per OCCUPIED bucket
    assert(total >= 8, s"expected most buckets occupied, saw $total files")
    assert(kept < total,
      s"zone maps must skip out-of-range files: kept=$kept total=$total")
    val got = df.select($"band", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.collect { case (b, i, _, _) if b >= 3 && b <= 5 =>
      (b, i) }.toSet
    assert(got == want)
    // an impossible range keeps nothing and returns nothing
    val (miss, keptMiss, _) =
      CdcStream.readReplicaRange(spark, dir, "band", 99L, 120L).get
    assert(keptMiss == 0 && miss.count() == 0)
  }

  test("delta-carrying buckets are never file-pruned: a pruned base row " +
      "cannot flip a conditional fold winner") {
    val dir = freshDir()
    // key 1's STORED row: order 10, band 9 (outside the probed range)
    CdcStream.applyBatchToReplica(dir,
      Seq((1L, 9L, 10L, "update"), (2L, 4L, 10L, "update"))
        .toDF("id", "band", "seq", "op"),
      idCols = Seq("id"), orderCols = Seq(col("seq")),
      conditionalOrder = true)
    // a LATE (losing) deferred delta moves key 1 to band 4 — in range,
    // but order 5 < 10 so the stored row must keep winning. If the
    // range read pruned the base file (band 9 misses [3,5]) the delta
    // row would wrongly win and key 1 would leak into the result.
    CdcStream.applyBatchToReplica(dir,
      Seq((1L, 4L, 5L, "update")).toDF("id", "band", "seq", "op"),
      idCols = Seq("id"), orderCols = Seq(col("seq")),
      conditionalOrder = true, deferMerge = true)
    val (df, _, _) =
      CdcStream.readReplicaRange(spark, dir, "band", 3L, 5L).get
    val got = df.select($"id", $"band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 4L)),
      s"fold-winner suppression: key 1's losing delta leaked: $got")
  }

  test("graft-replica relation: a range filter takes the zone-pruned " +
      "path and results stay exact") {
    val dir = freshDir()
    val rows = for (band <- 0L until 16L; id <- 0L until 4L)
      yield (band, band * 10 + id, 1L, "update")
    CdcStream.applyBatchToReplica(dir,
      rows.toDF("band", "id", "seq", "op"),
      idCols = Seq("band", "id"), orderCols = Seq(col("seq")),
      numBuckets = 16, bucketCols = Some(Seq("band")))
    val rel = new graft.sources.replica.ReplicaRelation(
      spark.sqlContext, dir, None, None, Nil)
    val df = spark.sqlContext.baseRelationToDataFrame(rel)
    val got = df.filter($"band" >= 3L && $"band" <= 5L)
      .select($"id").as[Long].collect().toSet
    assert(got == rows.collect { case (b, i, _, _) if b >= 3 && b <= 5 => i }
      .toSet)
    assert(rel.lastScanZonePruned,
      "range filter must take the zone-pruned path")
    // unbounded side works too (no finite enumeration exists for it)
    assert(df.filter($"band" >= 14L).count() ==
      rows.count { case (b, _, _, _) => b >= 14 })
    assert(rel.lastScanZonePruned)
    // unfiltered scan: ordinary full read
    assert(df.count() == rows.size)
    assert(!rel.lastScanZonePruned)
  }
}
