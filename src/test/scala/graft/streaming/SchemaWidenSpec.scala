package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-additive schema evolution through the MERGE sink: safe type
  * WIDENING (int→long, float→double) on non-routing columns — the
  * other Delta-supported evolution a year-long CDC stream eventually
  * hits. The manifest records the widened type, untouched narrow
  * bucket files upcast in place at read time (Spark 4's parquet
  * readers serve int32 under a requested int64 schema), and everything
  * off the ladder — routing columns, narrowing, type replacement,
  * widening through a deferred commit — refuses with a named recovery.
  */
class SchemaWidenSpec extends SparkSuite {

  import graft.SparkSuite.spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("widen").toString

  private val ids = Seq("id")
  private val ord = Seq(col("seq"))

  private def intBatch(rows: (Long, Int, Long)*) =
    rows.toSeq.toDF("id", "v", "seq")
      .select($"id", $"v".cast(IntegerType).as("v"), $"seq",
        lit("update").as("op"))

  private def longBatch(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("id", "v", "seq")
      .select($"id", $"v", $"seq", lit("update").as("op"))

  private def state(dir: String): Set[(Long, Long)] =
    CdcStream.readReplica(spark, dir).get
      .select($"id", $"v".cast(LongType)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("eager merge widens int→long: manifest records the wide type, " +
      "untouched narrow buckets upcast at read time, values past " +
      "int range round-trip") {
    val dir = freshDir()
    // enough keys that batch 2 leaves some of batch 1's buckets
    // UNTOUCHED — those files keep int32 physically and must upcast
    val b1 = (1L to 40L).map(i => (i, i.toInt * 10, 1L))
    CdcStream.applyBatchToReplica(dir, intBatch(b1: _*), ids, ord)
    // batch 2: ONE key, long values beyond int range
    CdcStream.applyBatchToReplica(dir,
      longBatch((1L, 5_000_000_000L, 2L)), ids, ord)
    val df = CdcStream.readReplica(spark, dir).get
    assert(df.schema("v").dataType == LongType,
      s"read schema must be the widened type, got ${df.schema("v")}")
    val want = b1.map { case (i, v, _) => (i, v.toLong) }.toMap +
      (1L -> 5_000_000_000L)
    assert(state(dir) == want.toSet)
    // key-pruned reads serve both narrow-file and wide-file keys
    val got = CdcStream.readReplicaForKeys(spark, dir, ids,
      Seq(1L, 7L).toDF("id")).get
      .select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 5_000_000_000L), (7L, 70L)))
  }

  test("float→double widens on the same ladder") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir,
      Seq((1L, 1.5f, 1L)).toDF("id", "v", "seq")
        .withColumn("op", lit("update")), ids, ord)
    CdcStream.applyBatchToReplica(dir,
      Seq((2L, 2.25, 2L)).toDF("id", "v", "seq")
        .withColumn("op", lit("update")), ids, ord)
    val df = CdcStream.readReplica(spark, dir).get
    assert(df.schema("v").dataType == DoubleType)
    assert(df.select($"id", $"v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      == Set((1L, 1.5), (2L, 2.25)))
  }

  test("a batch NARROWER than the store upcasts before hashing: int " +
      "keys on a long-keyed store land in the right bucket") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir,
      longBatch((1L, 10L, 1L), (2L, 20L, 1L)), ids, ord)
    // id arrives as INT — hash(5: int) != hash(5L: long), so without
    // the type-faithful upcast this update would write a SECOND home
    // for key 2 and the pruned read would keep serving the stale row
    val narrow = Seq((2, 99L, 2L)).toDF("id", "v", "seq")
      .select($"id".cast(IntegerType).as("id"), $"v", $"seq",
        lit("update").as("op"))
    CdcStream.applyBatchToReplica(dir, narrow, ids, ord)
    assert(state(dir) == Set((1L, 10L), (2L, 99L)))
    val got = CdcStream.readReplicaForKeys(spark, dir, ids,
      Seq(2L).toDF("id")).get.select($"v").as[Long].collect().toSeq
    assert(got == Seq(99L), s"pruned read must see the update: $got")
  }

  test("widening refuses through a deferred commit with the eager-merge " +
      "recovery named") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir, intBatch((1L, 10, 1L)), ids, ord)
    val e = intercept[IllegalArgumentException](
      CdcStream.applyBatchToReplica(dir,
        longBatch((1L, 5_000_000_000L, 2L)), ids, ord, deferMerge = true))
    assert(e.getMessage.contains("eager merge"),
      s"the refusal must name the recovery: ${e.getMessage}")
    // the named recovery works, and a deferred commit AFTER the eager
    // widen is served (the delta's narrow columns upcast at fold time)
    CdcStream.applyBatchToReplica(dir,
      longBatch((1L, 5_000_000_000L, 2L)), ids, ord)
    CdcStream.applyBatchToReplica(dir, intBatch((2L, 30, 3L)), ids, ord,
      deferMerge = true)
    assert(state(dir) == Set((1L, 5_000_000_000L), (2L, 30L)))
  }

  test("widening a ROUTING column refuses: the bucket hash is " +
      "type-sensitive; migration is a clone-rewrite") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir,
      Seq((1, "a", 1L)).toDF("id", "v", "seq")
        .select($"id".cast(IntegerType).as("id"), $"v", $"seq",
          lit("update").as("op")), ids, ord)
    val e = intercept[IllegalArgumentException](
      CdcStream.applyBatchToReplica(dir,
        Seq((1L, "b", 2L)).toDF("id", "v", "seq")
          .withColumn("op", lit("update")), ids, ord))
    assert(e.getMessage.contains("ROUTING") &&
      e.getMessage.contains("cloneReplica"),
      s"named refusal expected: ${e.getMessage}")
  }

  test("type REPLACEMENT (int→string) refuses — only the widening " +
      "ladder is admissible") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir, intBatch((1L, 10, 1L)), ids, ord)
    val e = intercept[IllegalArgumentException](
      CdcStream.applyBatchToReplica(dir,
        Seq((1L, "ten", 2L)).toDF("id", "v", "seq")
          .withColumn("op", lit("update")), ids, ord))
    assert(e.getMessage.contains("WIDENING") ||
      e.getMessage.contains("widening"), e.getMessage)
  }

  test("RENAME is not detectable through the sink — documented " +
      "contract: a rename-shaped batch is an additive ADD (the old " +
      "column keeps stored values, null for rewritten keys); the " +
      "migration for a true rename is clone-transform") {
    val dir = freshDir()
    CdcStream.applyBatchToReplica(dir,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "seq")
        .withColumn("op", lit("update")), ids, ord)
    // "rename v → w": the sink cannot distinguish this from dropping
    // v in a partial-image batch while adding a new column w
    CdcStream.applyBatchToReplica(dir,
      Seq((1L, "a2", 2L)).toDF("id", "w", "seq")
        .withColumn("op", lit("update")), ids, ord)
    val df = CdcStream.readReplica(spark, dir).get
    assert(df.columns.toSet == Set("id", "v", "w", "seq"),
      "both columns live: rename degenerates to additive add")
    val rows = df.select($"id", $"v", $"w").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSet
    assert(rows == Set(
      (1L, None, Some("a2")), // rewritten under the 'renamed' shape
      (2L, Some("b"), None))) // untouched: old column intact, new null
  }

  test("GSI on a widened column: index maintenance refuses (the value " +
      "IS the index's routing column) and the named recovery — " +
      "rebuild via buildIndex — serves wide-type lookups") {
    val primary = freshDir(); val ix = freshDir()
    def batch(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("id", "band", "seq").withColumn("op", lit("update"))
    val b1 = Seq((1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("id", "band", "seq")
      .select($"id", $"band".cast(IntegerType).as("band"), $"seq",
        lit("update").as("op"))
    SecondaryIndex.applyBatchWithIndex(spark, primary, ix, b1,
      ids, Seq("seq"), col("band"), "band")
    // batch 2 widens `band` long: the PRIMARY admits it (non-routing
    // there), but the INDEX routes BY band — its maintenance refuses
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.applyBatchWithIndex(spark, primary, ix,
        batch((1L, 5_000_000_000L, 2L)), ids, Seq("seq"),
        col("band"), "band"))
    assert(e.getMessage.contains("ROUTING"), e.getMessage)
    // named recovery: apply to the primary alone, rebuild the index
    // from the primary's state into a fresh dir
    CdcStream.applyBatchToReplica(primary,
      batch((1L, 5_000_000_000L, 2L)), ids, ord.map(_ => col("seq")))
    val ix2 = freshDir() + "/rebuilt"
    SecondaryIndex.buildIndex(spark, primary,
      SecondaryIndex.IndexSpec(ix2, col("band"), "band"),
      ids, Seq("seq"))
    val got = SecondaryIndex.lookupByIndex(spark, primary, ix2, ids,
      col("band"), "band", Seq(5_000_000_000L).toDF("band"))
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"wide-value lookup through the rebuilt " +
      s"index: $got")
  }
}
