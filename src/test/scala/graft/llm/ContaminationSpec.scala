package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Behavior tests for the span-contamination operator family — the
  * properties the DuckDB hash-compare cannot express.
  */
class ContaminationSpec extends SparkSuite {

  test("decontaminate: eval docs are excluded and hit counts are bounded") {
    import graft.SparkSuite.spark.implicits._
    val out = ContaminationQueries.defs("llm_decontaminate")(spark, sfDir)
    val rows = out.collect()
    // every eval doc (the md5 1-in-10 subset) is absent from the report
    val evalIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id")
      .withColumn("h",
        TextOps.hash32(concat(lit("eval:"), $"doc_id".cast("string"))))
      .filter($"h" % ContaminationQueries.EvalMod === 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(evalIds.nonEmpty)
    assert(rows.forall(r => !evalIds.contains(r.getAs[Long]("doc_id"))))
    // hits never exceed the doc's gram count; flag agrees with count
    assert(rows.forall(r =>
      r.getAs[Long]("n_hits") <= r.getAs[Int]("n_grams")))
    assert(rows.forall(r =>
      r.getAs[Boolean]("contaminated") == (r.getAs[Long]("n_hits") > 0)))
    // the fixture's near-dup families straddle the eval split, so some
    // contamination must be detected
    assert(rows.exists(_.getAs[Boolean]("contaminated")))
  }

  test("span-dedup: near-dup cluster members carry duplicated spans") {
    import graft.SparkSuite.spark.implicits._
    val out = ContaminationQueries.defs("llm_span_dedup")(spark, sfDir)
    val byId = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup")).toMap
    // docs the whole-document pipeline clusters as near-dups share
    // 8-gram spans — the span signal must fire on every one of them
    val clustered = DedupQueries.defs("llm_dedup_clusters")(spark, sfDir)
      .select($"doc_id").as[Long].collect()
    assert(clustered.nonEmpty)
    assert(clustered.forall(id => byId.getOrElse(id, 0L) > 0))
    // dup_frac is a valid fraction
    val fracs = out.select($"dup_frac").as[Double].collect()
    assert(fracs.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("dup-spans: run geometry is consistent and near-dup docs carry runs") {
    import graft.SparkSuite.spark.implicits._
    import ContaminationQueries.{DupSpanN, MinDupSpan}
    val rows = ContaminationQueries.defs("llm_dup_spans")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val span = r.getAs[Int]("max_dup_span")
      val nPos = r.getAs[Int]("n_pos")
      val frac = r.getAs[Double]("dup_pos_frac")
      // a non-zero span covers at least one full gram and fits the doc
      assert(span == 0 || (span >= DupSpanN && span <= nPos + DupSpanN - 1))
      assert(frac >= 0.0 && frac <= 1.0)
      // the three trim signals agree by construction
      assert(r.getAs[Boolean]("would_trim") == (span >= MinDupSpan))
      assert((r.getAs[Long]("n_long_runs") > 0) == (span >= MinDupSpan))
    }
    // whole-document near-dups are near-verbatim copies — the span
    // detector must see contiguous duplicated text on every one
    val clustered = DedupQueries.defs("llm_dedup_clusters")(spark, sfDir)
      .select($"doc_id").as[Long].collect()
    val spanById = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("max_dup_span")).toMap
    assert(clustered.nonEmpty)
    assert(clustered.forall(id => spanById.getOrElse(id, 0) > 0))
    // and the fixture contains at least one trim-worthy block
    assert(rows.exists(_.getAs[Boolean]("would_trim")))
  }

  test("doc-repetition: fractions are consistent and a synthetic loop doc maxes out") {
    import graft.SparkSuite.spark.implicits._
    val rows = ContaminationQueries.defs("llm_doc_repetition")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    assert(rows.forall { r =>
      val n = r.getAs[Int]("n_bigrams"); val d = r.getAs[Int]("n_distinct")
      val top = r.getAs[Int]("top_count")
      d <= n && top <= n - d + 1 &&
        math.abs(r.getAs[Double]("dup_frac") - (n - d).toDouble / n) == 0.0
    })
    // a degenerate "word word word ..." doc: one distinct bigram, top_frac 1
    val loop = Seq((1L, ("word " * 50).trim)).toDF("doc_id", "text")
    val t = TextOps.tokens($"text")
    val bg = transform(sequence(lit(1), size(t) - 1),
      i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
    val m = loop.select(size(array_distinct(bg)).as("nd"), size(bg).as("n"))
      .collect().head
    assert(m.getAs[Int]("nd") == 1 && m.getAs[Int]("n") == 49)
  }

  test("domain-mix: integer shares are exact and temperature flattens the mix") {
    val rows = TextAnalysisQueries.defs("llm_domain_mix")(spark, sfDir)
      .collect()
    assert(rows.length > 1)
    // floor-division shares: each ≤ true proportion, total ≤ 1e6
    assert(rows.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    assert(rows.map(_.getAs[Long]("temp_share_ppm")).sum <= 1000000L)
    // sqrt temperature upsamples the smallest source relative to the
    // largest: boost(smallest) > boost(largest)
    val bySize = rows.sortBy(_.getAs[Long]("total_tokens"))
    assert(bySize.head.getAs[Double]("boost") >
      bySize.last.getAs[Double]("boost"))
  }
}
