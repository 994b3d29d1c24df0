package graft.llm

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized index tables for the LLM-pipeline operators.
  *
  * Two ownership models, both replacing bare `persist()` so that a
  * library consumer calling any `defs` entry outside Bench/Verify never
  * inherits dangling CacheManager entries:
  *
  *  - [[materialize]]: per-invocation index tables (LSH band tables,
  *    IVF assignments, candidate-pair sets) consumed by multiple plan
  *    branches of ONE query. Eagerly written to parquet exactly once
  *    and re-read by every consumer branch — the same recompute
  *    avoidance as `persist()` with zero session-cache footprint, and
  *    at 100 TB the honest shape anyway: a billion-row band table
  *    belongs in files, not pinned to executor memory.
  *  - [[cached]]: build-once pipeline ARTIFACTS keyed by (tag, corpus
  *    dir) — the near-dup cluster-label table. A real pipeline
  *    materializes cluster labels once and joins them everywhere;
  *    recomputing connected components per consuming query is
  *    thrown-away compute at any scale. Build times are recorded so
  *    Bench can report them alongside per-query timings (nothing is
  *    hidden from the benchmark by the reuse).
  *
  * All files live under one JVM-lifetime temp root removed by a
  * shutdown hook.
  */
object IndexArtifacts {

  private lazy val tempRoot: Path = {
    val p = Files.createTempDirectory("graft-index-artifacts")
    sys.addShutdownHook(deleteRecursively(p.toFile))
    p
  }

  private val counter = new AtomicLong()

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** Write `df` once as a parquet index table owned by this call and
    * return a fresh scan of it. Each invocation pays its own build —
    * no cross-invocation reuse, no CacheManager entry.
    */
  def materialize(s: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val p = tempRoot.resolve(s"$tag-${counter.incrementAndGet()}").toString
    df.write.parquet(p)
    s.read.parquet(p)
  }

  // artifact key -> parquet path, and tag -> cumulative build seconds
  private val keyed = new ConcurrentHashMap[String, String]()
  private val built = new ConcurrentHashMap[String, Double]()

  /** Build-once artifact keyed by (tag, canonical corpus dir): the
    * first caller runs `build` (which must write parquet to the path it
    * is given and release any caches it took); every later caller for
    * the same corpus reads the existing files. `computeIfAbsent`
    * serializes concurrent first-builds of the same key.
    */
  def cached(s: SparkSession, dir: String, tag: String)(
      build: String => Unit): DataFrame = {
    val key = tag + ":" + new java.io.File(dir).getCanonicalPath
    val path = keyed.computeIfAbsent(key, _ => {
      val out = tempRoot.resolve(s"$tag-${counter.incrementAndGet()}").toString
      val t0 = System.nanoTime()
      build(out)
      built.merge(tag, (System.nanoTime() - t0) / 1e9, (a, b) => a + b)
      out
    })
    s.read.parquet(path)
  }

  /** Seconds spent building keyed artifacts, per tag — surfaced by
    * Bench so artifact reuse never hides build cost from the report.
    */
  def buildSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    built.asScala.toMap
  }
}
