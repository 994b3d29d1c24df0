package graft.queries

import graft.{SparkEntry, SparkSuite}
import graft.operators.BucketedTables

/** Re-registration behavior of the pre-bucketed join tables: a session
  * that finds the shared data files already built (warm JVM cache) but
  * the catalog entries missing must re-register with DDL over the
  * existing files — never rerun the bucketed write, which would race
  * any live session scanning those files.
  */
class BucketedTablesSpec extends SparkSuite {

  private def dataFiles(loc: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(loc)).map(f => f.getPath -> f.lastModified()).toMap
  }

  private def tableLocation(table: String): String =
    spark.sql(s"DESC FORMATTED $table")
      .filter("col_name = 'Location'").collect()(0).getString(1)
      .stripPrefix("file:")

  test("a catalog-registration gap re-registers over existing files without a rewrite") {
    val (ln, on) = BucketedTables.ensure(spark, sfDir)
    val (lLoc, oLoc) = (tableLocation(ln), tableLocation(on))
    val before = dataFiles(lLoc) ++ dataFiles(oLoc)
    assert(before.nonEmpty)
    // simulate the warm-cache/new-session state: files on disk, no
    // catalog entries (DROP on an external table keeps the files)
    spark.sql(s"DROP TABLE $ln")
    spark.sql(s"DROP TABLE $on")
    val (ln2, on2) = BucketedTables.ensure(spark, sfDir)
    assert((ln2, on2) == (ln, on))
    assert(dataFiles(lLoc) ++ dataFiles(oLoc) == before,
      "re-registration must not touch the shared data files")
    // the DDL-registered tables carry the bucket spec: the co-located
    // join still plans with zero join-side exchange
    val p = SparkEntry.queries("q25_bucketed_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(2000))
    assert("Bucketed: true".r.findAllIn(p).size == 2, p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2000))
  }
}
