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

  test("two-column bounds intersect: strictly fewer files than either " +
      "column alone, results unchanged") {
    val dir = freshDir()
    // clustered on BOTH axes: routed by band (one bucket per band) and,
    // within each band, ts rises with the band's rank — so the band
    // bound drops off-band buckets and the ts bound independently
    // drops each surviving bucket whose ts range provably misses.
    // Hash collisions would blur the per-file ranges and make the
    // strictness assertion layout-dependent, so the 8 band VALUES are
    // chosen (deterministically, with the engine's own routing
    // function) to land in 8 DISTINCT buckets.
    import org.apache.spark.sql.functions.{hash, pmod, lit}
    val nb = 16
    val bands: Seq[Long] = spark.range(0, 200)
      .select($"id", pmod(hash($"id"), lit(nb)).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .foldLeft((Seq.empty[Long], Set.empty[Int])) {
        case ((acc, seen), (v, b)) =>
          if (acc.size < 8 && !seen(b)) (acc :+ v, seen + b) else (acc, seen)
      }._1.sorted
    // rank i gets ts in [i*1000, i*1000+5]
    val rows = for ((band, i) <- bands.zipWithIndex; id <- 0L until 6L)
      yield (band, band * 100 + id, i * 1000L + id, 1L, "update")
    CdcStream.applyBatchToReplica(dir,
      rows.toDF("band", "id", "ts", "seq", "op"),
      idCols = Seq("band", "id"), orderCols = Seq(col("seq")),
      numBuckets = nb, bucketCols = Some(Seq("band")))
    // band bound covers ranks 2..5 (4 files); ts bound covers ranks
    // 0..3 (4 files); the intersection is ranks 2..3 (2 files)
    val (bLo, bHi) = (bands(2), bands(5))
    val both = CdcStream.readReplicaRangeMulti(spark, dir,
      Seq(("band", bLo, bHi), ("ts", 0L, 3500L))).get
    val bandOnly = CdcStream.readReplicaRangeMulti(spark, dir,
      Seq(("band", bLo, bHi))).get
    val tsOnly = CdcStream.readReplicaRangeMulti(spark, dir,
      Seq(("ts", 0L, 3500L))).get
    assert(both._2 < bandOnly._2 && both._2 < tsOnly._2,
      s"intersection must be strictly tighter: both=${both._2} " +
        s"band=${bandOnly._2} ts=${tsOnly._2}")
    val got = both._1.select($"band", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.collect {
      case (b, i, t, _, _) if b >= bLo && b <= bHi && t <= 3500 => (b, i) }
      .toSet
    assert(got == want)
    // the relation path composes the same way
    val rel = new graft.sources.replica.ReplicaRelation(
      spark.sqlContext, dir, None, None, Nil)
    val df = spark.sqlContext.baseRelationToDataFrame(rel)
    val gotRel = df.filter($"band" >= bLo && $"band" <= bHi && $"ts" <= 3500L)
      .select($"band", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRel == want)
    assert(rel.lastScanZonePruned)
  }

  test("version-pinned reads zone-prune: version dirs are immutable, " +
      "so historical pruning is as safe as current") {
    val dir = freshDir()
    val rows = for (band <- 0L until 8L; id <- 0L until 4L)
      yield (band, band * 10 + id, 1L, "update")
    CdcStream.applyBatchToReplica(dir,
      rows.toDF("band", "id", "seq", "op"),
      idCols = Seq("band", "id"), orderCols = Seq(col("seq")),
      numBuckets = 8, bucketCols = Some(Seq("band")),
      watermark = Some(100L))
    // v2 rewrites band 3's rows out of the probed range — the pinned
    // v1 read must still see them, and must still prune
    CdcStream.applyBatchToReplica(dir,
      Seq((3L, 30L, 2L, "delete")).toDF("band", "id", "seq", "op"),
      idCols = Seq("band", "id"), orderCols = Seq(col("seq")),
      numBuckets = 8, bucketCols = Some(Seq("band")),
      watermark = Some(200L))
    val (v1df, v1kept, v1total) = CdcStream.readReplicaRangeMulti(spark, dir,
      Seq(("band", 3L, 4L)), atVersion = Some(1L)).get
    assert(v1kept < v1total,
      s"the pinned read must prune: kept=$v1kept total=$v1total")
    val got1 = v1df.select($"band", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == rows.collect {
      case (b, i, _, _) if b >= 3 && b <= 4 => (b, i) }.toSet,
      "v1 must serve its own (pre-delete) state")
    // current read reflects the delete
    val (curDf, _, _) = CdcStream.readReplicaRangeMulti(spark, dir,
      Seq(("band", 3L, 4L))).get
    assert(!curDf.select($"id").as[Long].collect().contains(30L))
    // the relation path: version=1 pinned scan zone-prunes too
    val rel = new graft.sources.replica.ReplicaRelation(
      spark.sqlContext, dir, Some(1L), None, Nil)
    val df = spark.sqlContext.baseRelationToDataFrame(rel)
    assert(df.filter($"band" >= 3L && $"band" <= 4L)
      .select($"id").as[Long].collect().toSet
      == got1.map(_._2))
    assert(rel.lastScanZonePruned,
      "a version-pinned range scan must take the zone path")
    // asOfWatermark resolves to its version and prunes identically
    val relWm = new graft.sources.replica.ReplicaRelation(
      spark.sqlContext, dir, None, Some(150L), Nil)
    val dfWm = spark.sqlContext.baseRelationToDataFrame(relWm)
    assert(dfWm.filter($"band" >= 3L && $"band" <= 4L)
      .select($"id").as[Long].collect().toSet == got1.map(_._2))
    assert(relWm.lastScanZonePruned)
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
