package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit behavior of the set-similarity length-filter optimizer rule
  * ([[JaccardLengthFilter]], injected by `graft.GraftExtensions`).
  */
class JaccardLengthFilterSpec extends SparkSuite {

  private def docs = {
    import graft.SparkSuite.spark.implicits._
    // sorted distinct shingle arrays with deliberately skewed sizes:
    // (1,2) are true near-dups; 3 is a tiny subset of 4 (high
    // containment, low jaccard); 5 shares nothing
    Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L, 4L, 6L)),
      (3L, Seq(1L, 2L)),
      (4L, (1L to 40L).toSeq),
      (5L, Seq(100L, 101L))).toDF("doc_id", "sh")
  }

  private def jaccardPairs(threshold: Double) = {
    val d = docs
    d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sh").as("sa"), col("y.sh").as("sb"))
      .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
      .filter((col("nc").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("nc")).cast("double")) >= threshold)
      .select(col("doc_a"), col("doc_b"))
  }

  import graft.SparkSuite.spark.implicits._

  test("the optimizer prepends size bounds to union-shaped jaccard thresholds") {
    val q = jaccardPairs(0.5)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("0.5 * cast(size("), opt.take(2000))
    // the bound appears BEFORE the intersect predicate in the conjunction
    val cond = opt.linesIterator
      .find(_.contains("sorted_intersect_count")).getOrElse("")
    assert(cond.indexOf("* cast(size(") < cond.indexOf("sorted_intersect_count"),
      cond.take(800))
  }

  test("the rewritten predicate returns exactly the brute-force pairs") {
    val got = jaccardPairs(0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Map(1L -> Set(1L, 2L, 3L, 4L, 5L), 2L -> Set(1L, 2L, 3L, 4L, 6L),
      3L -> Set(1L, 2L), 4L -> (1L to 40L).toSet, 5L -> Set(100L, 101L))
    val expected = (for {
      a <- raw.keys; b <- raw.keys if a < b
      j = raw(a).intersect(raw(b)).size.toDouble / raw(a).union(raw(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(got == expected)
    assert(got == Set((1L, 2L))) // (3,4) is high-containment but low-jaccard
  }

  test("containment-shaped predicates are left alone (no sound bound exists)") {
    val d = docs
    val q = d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sh").as("sa"), col("y.sh").as("sb"))
      .withColumn("nc", expr("sorted_intersect_count(sa, sb)"))
      .filter((col("nc").cast("double") / size(col("sa")).cast("double")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("* cast(size("), opt.take(2000))
    // (3,4): containment 1.0 — must survive, exactly what a (wrongly
    // applied) jaccard size bound would have pruned
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((3L, 4L)))
  }
}
