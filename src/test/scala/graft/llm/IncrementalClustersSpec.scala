package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental near-dup cluster maintenance: batch-2 near-dups of
  * batch-1 docs join their cluster WITHOUT recomputing the graph, two
  * existing components merge through a bridge doc, and feeding the
  * fixture corpus in chunks reproduces the batch pipeline's labels
  * exactly.
  */
class IncrementalClustersSpec extends SparkSuite {
  private lazy val sp = spark
  import sp.implicits._

  // Deterministic merge fixture (fixed md5-derived hashes, so band
  // collisions are stable): P and Q share NOTHING (no candidate, J=0);
  // the bridge R = P's block-B + Q's block-C has band collisions with
  // BOTH and Jaccard 0.459 to each.
  private def words(p: String, n: Int) = (0 until n).map(i => s"${p}4w$i")
  private val textP = (words("a", 5) ++ words("b", 35)).mkString(" ")
  private val textQ = (words("c", 35) ++ words("d", 5)).mkString(" ")
  private val textR = (words("b", 35) ++ words("c", 35)).mkString(" ")

  test("streaming: batch-2 near-dups join batch-1 clusters; bridges merge components") {
    val state = Files.createTempDirectory("inc-clusters").toString
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalClusters.update(spark, state, batch)
      }
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // batch 1: two independent 2-doc families + one unique doc
      mem.addData((10L, textP), (11L, textP), (20L, textQ), (21L, textQ),
        (30L, "totally unrelated words that match nothing else at all"))
      q.processAllAvailable()
      val l1 = IncrementalClusters.labels(spark, state)
        .as[(Long, Long)].collect().toMap
      assert(l1 === Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))

      // batch 2: the bridge — near-dup of BOTH families. Its edges touch
      // two existing components; star edges relabel every member to the
      // global min without replaying batch-1's pairs
      mem.addData((40L, textR))
      q.processAllAvailable()
      val l2 = IncrementalClusters.labels(spark, state)
        .as[(Long, Long)].collect().toMap
      assert(l2 === Map(10L -> 10L, 11L -> 10L, 20L -> 10L, 21L -> 10L,
        40L -> 10L))
    } finally q.stop()
  }

  test("chunked incremental ingestion reproduces the batch pipeline's labels") {
    val state = Files.createTempDirectory("inc-equiv").toString
    val docs = graft.Tables(spark, sfDir).documents.select($"doc_id", $"text")
    // three uneven chunks; planted near-dup pairs are scattered across
    // doc ids, so many pairs straddle a chunk boundary (new-vs-old path)
    for ((lo, hi) <- Seq((0L, 150L), (150L, 380L), (380L, 10000L))) {
      IncrementalClusters.update(spark, state,
        docs.filter($"doc_id" >= lo && $"doc_id" < hi))
    }
    val inc = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet
    val batch = DedupQueries.defs("llm_dedup_clusters")(spark, sfDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    assert(inc === batch)
  }

  test("replayed micro-batches are no-ops (idempotent index appends)") {
    val state = Files.createTempDirectory("inc-replay").toString
    val batch = Seq((1L, textP), (2L, textP)).toDF("doc_id", "text")
    IncrementalClusters.update(spark, state, batch)
    val shinglesOnce = spark.read.parquet(s"$state/shingles").count()
    val labelsOnce = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet
    // crash-replay: the same batch is redelivered — nothing changes
    IncrementalClusters.update(spark, state, batch)
    assert(spark.read.parquet(s"$state/shingles").count() === shinglesOnce)
    assert(spark.read.parquet(s"$state/bands").count() ===
      shinglesOnce * TextOps.Bands)
    assert(IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet === labelsOnce)
  }

  test("compactState collapses small files without changing content") {
    val state = Files.createTempDirectory("inc-compact").toString
    // several tiny batches => several part-file sets per table
    (0 until 4).foreach { i =>
      IncrementalClusters.update(spark, state,
        Seq((i * 10L, textP), (i * 10L + 1, textP)).toDF("doc_id", "text"))
    }
    def parts(name: String): Int =
      Option(new java.io.File(s"$state/$name").listFiles())
        .getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val shBefore = spark.read.parquet(s"$state/shingles")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bandsBefore = spark.read.parquet(s"$state/bands").count()
    val labelsBefore = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(parts("shingles") > 3 && parts("bands") > 3)

    IncrementalClusters.compactState(spark, state, maxFiles = 3)
    assert(parts("shingles") <= 3 && parts("bands") <= 3)
    assert(spark.read.parquet(s"$state/shingles")
      .select("doc_id").as[Long].collect().sorted.toSeq === shBefore)
    assert(spark.read.parquet(s"$state/bands").count() === bandsBefore)
    assert(IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet === labelsBefore)

    // the compacted index keeps serving: a near-dup of an indexed doc
    // still lands in its cluster, and replay screening still works
    IncrementalClusters.update(spark, state,
      Seq((100L, textP)).toDF("doc_id", "text"))
    val labels = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    assert(labels(100L) === labels(0L))
  }

  test("an interrupted compaction swap heals on the next update") {
    val state = Files.createTempDirectory("inc-heal").toString
    IncrementalClusters.update(spark, state,
      Seq((1L, textP), (2L, textP)).toDF("doc_id", "text"))
    // simulate a crash AFTER the compacted copy completed and the live
    // dir moved away, BEFORE the copy moved in: worst-case window
    val cur = java.nio.file.Paths.get(s"$state/shingles")
    val next = java.nio.file.Paths.get(s"$state/shingles.next")
    val rows = spark.read.parquet(cur.toString)
    rows.coalesce(1).write.parquet(next.toString)
    val trash = java.nio.file.Paths.get(s"$state/shingles.trash")
    java.nio.file.Files.move(cur, trash)
    // next update heals: the completed .next moves in, trash clears
    IncrementalClusters.update(spark, state,
      Seq((3L, textP)).toDF("doc_id", "text"))
    assert(!java.nio.file.Files.exists(next) &&
      !java.nio.file.Files.exists(trash))
    val labels = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    assert(labels(3L) === labels(1L))
  }

  test("update with no matching docs leaves labels untouched") {
    val state = Files.createTempDirectory("inc-noop").toString
    IncrementalClusters.update(spark, state,
      Seq((1L, textP), (2L, textP)).toDF("doc_id", "text"))
    val before = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(before === Set((1L, 1L), (2L, 1L)))
    // a batch with nothing similar (and one shingle-less doc)
    IncrementalClusters.update(spark, state,
      Seq((5L, "absolutely different content everywhere"), (6L, "x"))
        .toDF("doc_id", "text"))
    val after = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(after === before)
  }

  test("retire: removing a bridge splits its component; leftovers relabel") {
    val state = Files.createTempDirectory("inc-retire-split").toString
    // one component {10,11} -P- {40 bridge} -Q- {20,21}
    IncrementalClusters.update(spark, state,
      Seq((10L, textP), (11L, textP), (20L, textQ), (21L, textQ),
        (40L, textR)).toDF("doc_id", "text"))
    assert(IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toMap.values.toSet === Set(10L))
    IncrementalClusters.retire(spark, state, Seq(40L).toDF("doc_id"))
    val split = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    assert(split === Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // the index itself forgot the doc: no shingles, bands, or edges
    assert(spark.read.parquet(s"$state/shingles")
      .filter($"doc_id" === 40L).count() === 0L)
    assert(spark.read.parquet(s"$state/bands")
      .filter($"doc_id" === 40L).count() === 0L)
    assert(spark.read.parquet(s"$state/edges")
      .filter($"doc_a" === 40L || $"doc_b" === 40L).count() === 0L)
  }

  test("retire: a member whose last edge goes drops out of the label store") {
    val state = Files.createTempDirectory("inc-retire-drop").toString
    IncrementalClusters.update(spark, state,
      Seq((1L, textP), (2L, textP)).toDF("doc_id", "text"))
    IncrementalClusters.retire(spark, state, Seq(1L).toDF("doc_id"))
    // doc 2 lost its only near-dup: no cluster membership remains
    assert(IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().isEmpty)
    // retire is idempotent (crash-replay of the maintenance batch)
    IncrementalClusters.retire(spark, state, Seq(1L).toDF("doc_id"))
    assert(IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().isEmpty)
  }

  test("retire then re-ingest: a changed doc re-enters under the same id") {
    val state = Files.createTempDirectory("inc-retire-reingest").toString
    IncrementalClusters.update(spark, state,
      Seq((1L, textP), (2L, textP), (20L, textQ), (21L, textQ))
        .toDF("doc_id", "text"))
    // doc 2's content changes from P-like to Q-like
    IncrementalClusters.retire(spark, state, Seq(2L).toDF("doc_id"))
    IncrementalClusters.update(spark, state,
      Seq((2L, textQ)).toDF("doc_id", "text"))
    val labels = IncrementalClusters.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    // 1 lost its pair; 2 now clusters with the Q family under min id 2
    assert(labels === Map(2L -> 2L, 20L -> 2L, 21L -> 2L))
  }
}
