package graft.llm

import graft.SparkSuite

/** Regression: a keyed-artifact build that resolves a NESTED artifact
  * (the cluster-label build resolving the band index) must not die with
  * ConcurrentHashMap's "Recursive update" — the failure mode that a
  * query-order change exposed in Verify.
  */
class IndexArtifactsSpec extends SparkSuite {

  test("cachedPath allows a nested cachedPath during build") {
    val dir = java.nio.file.Files.createTempDirectory("ia-spec").toString
    var innerPath: String = null
    val outer = IndexArtifacts.cachedPath(dir, "ia-spec-outer") { out =>
      innerPath = IndexArtifacts.cachedPath(dir, "ia-spec-inner") { in =>
        new java.io.File(in).mkdirs()
        ()
      }
      new java.io.File(out).mkdirs()
      ()
    }
    assert(innerPath != null && innerPath != outer)
    // build-once: a second resolve returns the same paths, no rebuild
    assert(IndexArtifacts.cachedPath(dir, "ia-spec-outer")(_ =>
      fail("outer artifact rebuilt")) === outer)
    assert(IndexArtifacts.cachedPath(dir, "ia-spec-inner")(_ =>
      fail("inner artifact rebuilt")) === innerPath)
  }

  test("concurrent first-builds of one key build exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("ia-spec2").toString
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            IndexArtifacts.cachedPath(dir, "ia-spec-conc") { out =>
              builds.incrementAndGet()
              new java.io.File(out).mkdirs()
              ()
            }
        })
      }
      assert(tasks.map(_.get()).distinct.size === 1)
      assert(builds.get() === 1)
    } finally pool.shutdown()
  }
}
